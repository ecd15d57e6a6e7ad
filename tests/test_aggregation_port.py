"""Port of the reference's aggregation coverage battery
(crates/varpulis-runtime/tests/aggregation_coverage_tests.rs): every
AggregateFunc's observable semantics — edge cases (single event, missing
fields, nulls, NaN), EMA periods, and ExprAggregate arithmetic — driven
through `Stream.aggregate` over in-memory frames.

The Rust suite's apply_shared / apply_refs / apply_columnar triplets test
the SAME semantics through three memory layouts that have no analog here
(Spark owns the layout); each semantic case is ported once.

The r8 port caught a real divergence: Spark PROPAGATES NaN through
sum/avg (and F.max ranks NaN above every real double) where the
reference filters NaN from every numeric aggregate — fixed with a
type-preserving `f = f` guard in aggregates.py.
"""

import math

import pytest

from varpulis_spark.operators import aggregates as A
from varpulis_spark.stream import Stream

NAN = float("nan")


@pytest.fixture(scope="module")
def spark():
    from varpulis_spark.engine import get_spark

    return get_spark("agg-port-tests")


def agg_one(spark, values, spec_fn, field="value"):
    """Apply one aggregate over a single-group frame of float values
    (None entries model missing fields); returns the scalar."""
    import pandas as pd

    rows = pd.DataFrame(
        {
            "event_type": ["Test"] * len(values),
            field: pd.array(values, dtype="Float64"),
            "ts": pd.to_datetime(range(1, len(values) + 1), unit="s", utc=True),
            "event_id": range(len(values)),
        }
    )
    df = spark.createDataFrame(rows)
    out = Stream(df, ts_col="ts", order_col="event_id").aggregate(r=spec_fn)
    (row,) = out.df.collect()
    return row.r


# -- Count (rs:48-73) ---------------------------------------------------------


def test_count_multiple_events(spark):
    assert agg_one(spark, [1.0, 2.0, 3.0, 4.0, 5.0], A.count()) == 5


def test_count_ignores_missing_values(spark):
    # count() counts EVENTS, not field presence
    assert agg_one(spark, [10.0, None], A.count()) == 2


def test_count_single_event(spark):
    assert agg_one(spark, [42.0], A.count()) == 1


# -- Sum (rs:77-110) ----------------------------------------------------------


def test_sum_numeric_values(spark):
    assert agg_one(spark, [10.0, 20.0, 30.0], A.sum("value")) == 60.0


def test_sum_mixed_types_missing_field(spark):
    # events without the field contribute nothing (rs:91-100)
    assert agg_one(spark, [10.0, None, 30.0], A.sum("value")) == 40.0


def test_sum_single_event(spark):
    assert agg_one(spark, [42.0], A.sum("value")) == 42.0


# -- Avg (rs:114-147) ---------------------------------------------------------


def test_avg_numeric_values(spark):
    assert agg_one(spark, [10.0, 20.0, 30.0], A.avg("value")) == 20.0


def test_avg_with_missing_fields(spark):
    # only present values divide (rs:130-138)
    assert agg_one(spark, [10.0, None, 30.0], A.avg("value")) == 20.0


def test_avg_single_event(spark):
    assert agg_one(spark, [7.0], A.avg("value")) == 7.0


# -- Min / Max (rs:151-226) ---------------------------------------------------


def test_min_numeric_values(spark):
    assert agg_one(spark, [30.0, 10.0, 20.0], A.min("value")) == 10.0


def test_min_with_negative_values(spark):
    assert agg_one(spark, [-5.0, 3.0, -10.0], A.min("value")) == -10.0


def test_min_all_same_value(spark):
    assert agg_one(spark, [4.0, 4.0, 4.0], A.min("value")) == 4.0


def test_max_numeric_values(spark):
    assert agg_one(spark, [30.0, 10.0, 20.0], A.max("value")) == 30.0


def test_max_with_negative_values(spark):
    assert agg_one(spark, [-5.0, -3.0, -10.0], A.max("value")) == -3.0


# -- StdDev (rs:230-276) ------------------------------------------------------


def test_stddev_single_value_is_null(spark):
    # fewer than 2 values => null (rs:232-236)
    assert agg_one(spark, [42.0], A.stddev("value")) is None


def test_stddev_two_values(spark):
    got = agg_one(spark, [10.0, 20.0], A.stddev("value"))
    assert abs(got - 7.0710678) < 0.001


def test_stddev_identical_values(spark):
    assert agg_one(spark, [5.0, 5.0, 5.0], A.stddev("value")) == 0.0


def test_stddev_with_missing_fields(spark):
    got = agg_one(spark, [10.0, None, 20.0], A.stddev("value"))
    assert abs(got - 7.0710678) < 0.001


# -- First / Last (rs:280-352) ------------------------------------------------


def test_first_multiple_events(spark):
    assert agg_one(spark, [10.0, 20.0, 30.0], A.first("value")) == 10.0


def test_last_multiple_events(spark):
    assert agg_one(spark, [10.0, 20.0, 30.0], A.last("value")) == 30.0


# -- CountDistinct (rs:356-420) -----------------------------------------------


def test_count_distinct_all_unique(spark):
    assert agg_one(spark, [1.0, 2.0, 3.0], A.count_distinct("value")) == 3


def test_count_distinct_with_duplicates(spark):
    assert agg_one(spark, [1.0, 2.0, 1.0, 2.0, 3.0], A.count_distinct("value")) == 3


def test_count_distinct_missing_fields_excluded(spark):
    # events missing the field don't count a distinct value (rs:398-407)
    assert agg_one(spark, [1.0, None, 1.0], A.count_distinct("value")) == 1


def test_count_distinct_all_same(spark):
    assert agg_one(spark, [9.0, 9.0, 9.0], A.count_distinct("value")) == 1


# -- EMA (rs:424-486) ---------------------------------------------------------


def test_ema_single_event(spark):
    assert agg_one(spark, [10.0], A.ema("value", 3)) == 10.0


def test_ema_period_zero_clamps_to_one(spark):
    # Ema::new(0) clamps period to 1 (rs:444-447)
    assert agg_one(spark, [10.0, 20.0, 30.0], A.ema("value", 0)) == 30.0


def test_ema_period_one_replaces_fully(spark):
    # k = 2/(1+1) = 1 => EMA equals the last value (rs:450-456)
    assert agg_one(spark, [10.0, 20.0, 30.0], A.ema("value", 1)) == 30.0


def test_ema_period_three(spark):
    # seed 10; k = 0.5: 10 -> 15 -> 22.5
    got = agg_one(spark, [10.0, 20.0, 30.0], A.ema("value", 3))
    assert abs(got - 22.5) < 1e-9


def test_ema_with_missing_fields(spark):
    # missing values are skipped, not zero-filled
    got = agg_one(spark, [10.0, None, 30.0], A.ema("value", 3))
    assert abs(got - 20.0) < 1e-9  # 10 then 0.5*30 + 0.5*10


# -- NaN handling (rs:1091-1152) ----------------------------------------------


def test_sum_with_nan_values(spark):
    assert agg_one(spark, [NAN, 10.0, NAN, 20.0], A.sum("value")) == 30.0


def test_avg_with_nan_values(spark):
    assert agg_one(spark, [NAN, 10.0, 20.0], A.avg("value")) == 15.0


def test_min_with_nan_filters_correctly(spark):
    assert agg_one(spark, [NAN, 50.0, 10.0], A.min("value")) == 10.0


def test_max_with_nan_filters_correctly(spark):
    # Spark's raw F.max ranks NaN above every double — the engine filters
    assert agg_one(spark, [NAN, 50.0, 10.0], A.max("value")) == 50.0


def test_sum_all_nan_returns_zero(spark):
    # Sum filters NaN then folds the EMPTY slice to Float(0.0)
    # (aggregation.rs apply_refs + simd sum_f64) — not null like min/max
    assert agg_one(spark, [NAN, NAN], A.sum("value")) == 0.0


def test_sum_integer_type_preserved(spark):
    # the all-NaN zero fallback is float-only; integer sums keep Long
    import pandas as pd

    rows = pd.DataFrame(
        {
            "event_type": ["T", "T"],
            "n": pd.array([2, 3], dtype="Int64"),
            "ts": pd.to_datetime([1, 2], unit="s", utc=True),
            "event_id": [0, 1],
        }
    )
    out = Stream(spark.createDataFrame(rows), ts_col="ts", order_col="event_id").aggregate(
        r=A.sum("n")
    )
    assert dict(out.df.dtypes)["r"] == "bigint"
    assert out.df.collect()[0].r == 5


def test_min_all_nan_returns_null(spark):
    assert agg_one(spark, [NAN, NAN], A.min("value")) is None


def test_max_all_nan_returns_null(spark):
    assert agg_one(spark, [NAN, NAN], A.max("value")) is None


def test_ema_with_nan_skips(spark):
    got = agg_one(spark, [10.0, NAN, 30.0], A.ema("value", 3))
    assert abs(got - 20.0) < 1e-9


# -- ExprAggregate (rs:700-900) -----------------------------------------------


def test_expr_last_minus_ema(spark):
    got = agg_one(spark, [10.0, 20.0, 30.0], A.last("value") - A.ema("value", 1))
    assert got == 0.0


def test_expr_sum_plus_count(spark):
    assert agg_one(spark, [10.0, 20.0], A.sum("value") + A.count()) == 32.0


def test_expr_max_minus_min(spark):
    assert agg_one(spark, [5.0, 15.0, 10.0], A.max("value") - A.min("value")) == 10.0


def test_expr_count_mul_count(spark):
    assert agg_one(spark, [1.0, 2.0, 3.0], A.count() * A.count()) == 9


def test_expr_count_div_count(spark):
    assert agg_one(spark, [1.0, 2.0], A.count() / A.count()) == 1.0


def test_expr_float_div_by_zero_is_null_or_inf(spark):
    # reference: division by zero aggregate -> Null; Spark doubles yield
    # null through try-less division only for 0/0 via NaN... the engine
    # follows SQL semantics: x / 0.0 (double) = null in ANSI-off Spark
    got = agg_one(spark, [10.0], A.sum("value") / (A.sum("value") - A.sum("value")))
    assert got is None or (isinstance(got, float) and not math.isfinite(got))


def test_expr_scalar_operand(spark):
    assert agg_one(spark, [10.0, 20.0], A.sum("value") * 2) == 60.0
    assert agg_one(spark, [10.0, 20.0], 2 * A.sum("value")) == 60.0
