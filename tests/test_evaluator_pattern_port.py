"""Port of the reference's pattern-expression evaluator battery
(crates/varpulis-runtime/tests/evaluator_pattern_tests.rs,
eval_pattern_expr subset): expressions over Kleene CAPTURE arrays —
len/sum/avg/min/max/variance/first/last and filter/map/flatten method
chains — driven through the `.window(n).pattern(alias: events => …)`
lambda surface (our eval_pattern_expr analog; the lambda lowers to
Catalyst higher-order functions, sase_patterns.vpl).

The reference's empty-array semantics are pinned exactly: avg([]) = 0.0
and variance([]) = 0.0 (explicit zero folds), min/max of [] = null (the
INFINITY fold yields None). The narrow-typed `eval_binary_op` helper
(Ge only Int/Int | Float/Float etc.) is an internal of the reference's
pattern evaluator, NOT a language guarantee — our lambdas run Catalyst's
numeric coercion; the cross-type comparison behavior users see is pinned
by the sase_coverage port instead."""

import pytest

from varpulis_spark.sources.event_file import load_evt
from varpulis_spark.stream import Stream
from varpulis_spark.vpl.compiler import run_program


@pytest.fixture(scope="module")
def spark():
    from varpulis_spark.engine import get_spark

    return get_spark("evaluator-pattern-port")


EVT = "".join(f"@{i*100} Tick {{ v: {i}.0 }}\n" for i in range(1, 7))


def flag(spark, lam, evt=EVT, window=6):
    src = (
        f"stream S = Tick\n    .window({window})\n"
        f"    .pattern(flag: {lam})\n    .emit(flag: flag)\n"
    )
    res = run_program(src, Stream(load_evt(spark, evt), ts_col="ts",
                                  order_col="event_id"))
    return [r.flag for r in res["S"].collect()]


# -- array fns over captures (rs:482-612) ------------------------------------


def test_capture_len(spark):
    assert flag(spark, "events => events.len() == 6") == [True]


def test_capture_sum(spark):
    # 1+2+...+6 = 21
    assert flag(spark, "events => events.map(e => e.v).sum() == 21.0") == [True]


def test_capture_avg(spark):
    assert flag(spark, "events => events.map(e => e.v).avg() == 3.5") == [True]


def test_capture_min_max(spark):
    assert flag(spark, "events => events.map(e => e.v).min() == 1.0") == [True]
    assert flag(spark, "events => events.map(e => e.v).max() == 6.0") == [True]


def test_capture_variance(spark):
    # population variance of [2,4,4,4,5,5,7,9] = 4.0 (rs:588-603)
    evt = "".join(
        f"@{i*100} Tick {{ v: {v}.0 }}\n"
        for i, v in enumerate([2, 4, 4, 4, 5, 5, 7, 9], 1)
    )
    assert flag(
        spark, "events => events.map(e => e.v).variance() == 4.0",
        evt=evt, window=8,
    ) == [True]


def test_capture_first_last(spark):
    assert flag(spark, "events => events.map(e => e.v).first() == 1.0") == [True]
    assert flag(spark, "events => events.map(e => e.v).last() == 6.0") == [True]


def test_avg_empty_is_zero(spark):
    # avg over a filtered-to-empty capture = 0.0, not null (rs fn_avg_empty)
    assert flag(
        spark,
        "events => events.map(e => e.v).filter(x => x > 100.0).avg() == 0.0",
    ) == [True]


def test_min_empty_is_null(spark):
    # min of [] = None (INFINITY fold, rs fn_min_empty) — null propagates
    # through the comparison so the window does NOT flag
    got = flag(
        spark,
        "events => events.map(e => e.v).filter(x => x > 100.0).min() == 0.0",
    )
    assert got in ([], [None], [False])


def test_variance_empty_is_zero(spark):
    assert flag(
        spark,
        "events => events.map(e => e.v).filter(x => x > 100.0).variance() == 0.0",
    ) == [True]


# -- method chains: filter / map / flatten (rs:706-800) -----------------------


def test_method_filter(spark):
    assert flag(
        spark, "events => events.filter(e => e.v > 4.0).len() == 2"
    ) == [True]


def test_method_map_then_filter(spark):
    # map to doubled values, filter > 8 → {10, 12}
    assert flag(
        spark,
        "events => events.map(e => e.v * 2.0).filter(x => x > 8.0).len() == 2",
    ) == [True]


def test_method_chain_sum_of_filtered(spark):
    # v > 3 → 4+5+6 = 15
    assert flag(
        spark,
        "events => events.map(e => e.v).filter(x => x > 3.0).sum() == 15.0",
    ) == [True]


def test_sliding_pairs_rising(spark):
    # every adjacent pair rises in the monotone feed
    assert flag(
        spark,
        "events => events.map(e => e.v).sliding_pairs()"
        ".filter((a, b) => b > a).len() == 5",
    ) == [True]
