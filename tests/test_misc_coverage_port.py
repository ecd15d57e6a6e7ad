"""Port of the reference's misc coverage battery
(crates/varpulis-runtime/tests/misc_coverage_tests.rs, the
observable-semantics subset).

That file is mostly INTERNAL-structure tests over Rust execution-engine
plumbing that Spark owns outright — ported here only where a semantic
contract is observable through this engine's own surfaces:

- Module 1 watermark.rs → our LateRouter carries the same watermark
  definition (max event ts − out_of_order, never receding); the
  per-source min rule itself is Spark's built-in multi-source watermark.
- Module 9 hamlet/optimizer.rs → operators/hamlet_optimizer.py is a
  faithful benefit-model port; the decision cases map 1:1.
- Modules 10-11 zdd propagation/NFA → operators/zdd.py holds the arena;
  set-count semantics map; the NFA-over-ZDD event loop is realized by
  operators/greta.py + sase.py whose end-to-end counts are oracle-pinned
  (greta_trend_* queries).

NOT ported (shape-chasing, no analog by design — Spark supplies the
layer): Module 2 worker_pool (BackpressureError Display/Clone/Eq — Spark
task scheduling), Module 3 columnar buffers (Tungsten/Arrow own columnar
layout), Module 4 JoinBuffer internals (stats/gc-interval of a hand-rolled
join buffer; join SEMANTICS are oracle-pinned via windowed_join_*),
Module 5 SequenceTracker internals (ActiveCorrelation step bookkeeping;
the observable match_all-last-step-keeps-matching semantics are pinned in
test_vpl_lang.py::test_sequence_source_match_all), Modules 6-8 hamlet
graph/graphlet/snapshot pools (graphlet linking and snapshot merge are
subsumed by the batch DP in greta.py, whose counts the oracle checks).
"""

import pytest


@pytest.fixture(scope="module")
def spark():
    from varpulis_spark.engine import get_spark

    return get_spark("misc-coverage-port")


# -- Module 1: watermark semantics via LateRouter (rs:18-127) -----------------


def _batch(spark, ts_seconds):
    import pyspark.sql.functions as F

    return spark.createDataFrame(
        [(float(s),) for s in ts_seconds], "sec double"
    ).select(F.timestamp_seconds(F.col("sec")).alias("ts"))


def test_watermark_uninitialized_passes_everything(spark):
    """Before any event is observed the watermark is None and nothing is
    late (rs:83-96 — an uninitialized source doesn't block)."""
    from varpulis_spark.streaming import LateRouter

    r = LateRouter(out_of_order="0s", allowed_lateness="0s")
    on_time, late = r.split(_batch(spark, [100, 200]))
    assert on_time.count() == 2 and late.count() == 0
    assert r.wm_us == 200_000_000


def test_watermark_advance_does_not_recede(spark):
    """A batch whose max ts is EARLIER than the current watermark must not
    pull the watermark backwards (rs:52-69, 114-126)."""
    from varpulis_spark.streaming import LateRouter

    r = LateRouter(out_of_order="0s")
    r.split(_batch(spark, [1000]))
    wm1 = r.wm_us
    r.split(_batch(spark, [500]))  # late batch
    assert r.wm_us == wm1, "watermark never recedes"


def test_watermark_out_of_order_allowance(spark):
    """watermark = max ts − out_of_order (PerSourceWatermarkTracker
    definition, watermark.rs:13-140)."""
    from varpulis_spark.streaming import LateRouter

    r = LateRouter(out_of_order="10s")
    r.split(_batch(spark, [1000]))
    assert r.wm_us == (1000 - 10) * 1_000_000


def test_watermark_late_events_split_from_on_time(spark):
    """Events older than (watermark − allowed_lateness) route to the late
    side; the on-time half is untouched."""
    from varpulis_spark.streaming import LateRouter

    r = LateRouter(out_of_order="0s", allowed_lateness="5s")
    r.split(_batch(spark, [1000]))
    on_time, late = r.split(_batch(spark, [990, 996, 1001]))
    assert late.count() == 1  # 990 < 1000-5
    assert on_time.count() == 2


def test_watermark_empty_batch_keeps_watermark(spark):
    """An empty micro-batch must not disturb the watermark (rs:72-80
    no-op advance analog)."""
    from varpulis_spark.streaming import LateRouter

    r = LateRouter(out_of_order="0s")
    r.split(_batch(spark, [1000]))
    wm1 = r.wm_us
    r.split(_batch(spark, []))
    assert r.wm_us == wm1


# -- Module 9: hamlet optimizer decisions (rs:904-1004) -----------------------


def test_kleene_stats_single_query_should_not_share():
    from varpulis_spark.operators.hamlet_optimizer import KleeneStats

    stats = KleeneStats(num_queries=1)
    assert not stats.should_share()


def test_kleene_stats_many_snapshots_negative_benefit():
    from varpulis_spark.operators.hamlet_optimizer import KleeneStats

    stats = KleeneStats(num_queries=2)
    for _ in range(100):
        stats.update(1, 100)  # tiny graphlets, many snapshots
    assert stats.sharing_benefit() < 0.0
    assert not stats.should_share()


def test_optimizer_unregistered_is_non_shared():
    from varpulis_spark.operators.hamlet_optimizer import (
        NON_SHARED,
        HamletOptimizer,
    )

    assert HamletOptimizer().decision(0) == NON_SHARED


def test_optimizer_force_decision():
    from varpulis_spark.operators.hamlet_optimizer import (
        SHARED,
        SPLIT,
        HamletOptimizer,
    )

    opt = HamletOptimizer()
    opt.register_kleene(0, 2)
    assert opt.decision(0) == SHARED
    opt.force_decision(0, SPLIT)
    assert opt.decision(0) == SPLIT


def test_optimizer_reset_stats():
    from varpulis_spark.operators.hamlet_optimizer import (
        HamletOptimizer,
        OptimizerConfig,
    )

    opt = HamletOptimizer(
        OptimizerConfig(reevaluate_interval=100, adaptive=False)
    )
    opt.register_kleene(0, 3)
    for _ in range(5):
        opt.report_graphlet(0, 50, 1)
    st = opt.stats[0]
    assert st.total_events > 0
    opt.reset_stats()
    st = opt.stats[0]
    assert st.total_events == 0
    assert st.num_graphlets == 0 and st.num_snapshots == 0


def test_optimizer_all_stats():
    from varpulis_spark.operators.hamlet_optimizer import HamletOptimizer

    opt = HamletOptimizer()
    opt.register_kleene(0, 2)
    opt.register_kleene(1, 3)
    assert len(opt.stats) == 2


def test_optimizer_reevaluate_split_decision():
    from varpulis_spark.operators.hamlet_optimizer import (
        NON_SHARED,
        SHARED,
        SPLIT,
        HamletOptimizer,
        OptimizerConfig,
    )

    opt = HamletOptimizer(
        OptimizerConfig(
            reevaluate_interval=5,
            adaptive=True,
            switch_threshold=1.0,
            min_graphlet_size=1,
            min_queries=2,
        )
    )
    opt.register_kleene(0, 2)
    assert opt.decision(0) == SHARED
    for _ in range(10):
        opt.report_graphlet(0, 1, 1000)  # tiny graphlet, many snapshots
    # with stats this lopsided the shared decision cannot survive: the
    # first reevaluation emits SPLIT, the next settles it as NON_SHARED
    # (hysteresis: SPLIT is the transition marker, not a steady state)
    assert opt.decision(0) in (SPLIT, NON_SHARED)


# -- Modules 10-11: ZDD set-count semantics (rs:1011-1229) ---------------------


def test_zdd_empty_counts_zero():
    from varpulis_spark.operators.zdd import ZddArena

    a = ZddArena()
    assert a.count(a.empty()) == 0
    assert a.node_count(a.empty()) == 0


def test_zdd_base_is_the_empty_set_family():
    from varpulis_spark.operators.zdd import ZddArena

    a = ZddArena()
    assert a.count(a.base()) == 1  # { ∅ }
    assert a.contains(a.base(), [])


def test_zdd_singleton_counts_one():
    from varpulis_spark.operators.zdd import ZddArena

    a = ZddArena()
    s42 = a._mk(42, a.empty(), a.base())  # {{42}}
    assert a.count(s42) == 1
    assert a.contains(s42, [42])
    assert not a.contains(s42, [99])
    assert list(a.iter_sets(s42)) == [(42,)]


def test_zdd_count_is_memo_stable():
    """Counting twice (memoized) returns the same result — the
    traversal-clear case (rs:1089-1097)."""
    from varpulis_spark.operators.zdd import ZddArena

    a = ZddArena()
    f = a.product_with_optional(a.base(), 1)
    f = a.product_with_optional(f, 2)
    assert a.count(f) == 4  # {}, {1}, {2}, {1,2}
    assert a.count(f) == 4


def test_zdd_union_count_after_reset_equivalent():
    """The propagator-reset analog (rs:1057-1065): a fresh arena counts
    zero until sets are registered again."""
    from varpulis_spark.operators.zdd import ZddArena

    a = ZddArena()
    f = a._mk(1, a.empty(), a.base())
    assert a.count(f) == 1
    fresh = ZddArena()
    assert fresh.count(fresh.empty()) == 0


def test_kleene_capture_three_step_count():
    """The NfaZdd three-step observable (rs:1213-1229): after capturing
    A,B,C through a Kleene closure, the closure counts its combinations
    (the engine-level SEQ(A,B,C) single-match count is oracle-pinned via
    greta_trend_* / seq_* queries)."""
    from varpulis_spark.operators.zdd import KleeneCapture

    cap = KleeneCapture()
    for ev in ("A", "B", "C"):
        cap.extend_simple(ev)
    assert cap.event_count() == 3
    # combination_count counts ALL subsets incl. ∅ (the ZDD base) — the
    # Kleene `+` lowering drops the empty combo at enumeration time
    # (pinned in test_zdd.py); non-empty combos = 2^3 - 1
    assert cap.combination_count() == 8
    assert sum(1 for c in cap.iter_combinations() if c) == 7
    assert not cap.is_empty()


def test_kleene_capture_empty_is_empty():
    from varpulis_spark.operators.zdd import KleeneCapture

    cap = KleeneCapture()
    assert cap.is_empty()
    assert cap.combination_count() == 1  # only ∅
    assert cap.event_count() == 0
