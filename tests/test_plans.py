"""Physical-plan audits: the properties that matter at 100 TB must hold in
the optimized plan, not just in intent — pushed filters, pruned scans,
broadcast dimension joins, partial aggregation, no Python in join-compiled
patterns (SURVEY §4)."""

import pytest
from pyspark.sql import functions as F

import __spark_entry__ as E
from varpulis_spark import Stream
from varpulis_spark.operators import aggregates as A


def plan_of(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_filter_pushdown_reaches_scan(spark, sf_dir):
    df = E.queries()["high_value_filter"](spark, sf_dir)
    plan = plan_of(df)
    assert "PushedFilters" in plan and "GreaterThan(value,150" in plan


def test_column_pruning(spark, sf_dir):
    df = Stream.events(spark, sf_dir).select("user_id", "value").df
    plan = plan_of(df)
    assert "props" not in plan  # untouched wide column never read


def test_enrich_broadcasts_dimension(spark, sf_dir):
    df = E.queries()["enrich_orders"](spark, sf_dir)
    plan = plan_of(df)
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_aggregation_is_partial(spark, sf_dir):
    df = E.queries()["pricing_summary"](spark, sf_dir)
    plan = plan_of(df)
    # map-side partial + final HashAggregate pair
    assert plan.count("HashAggregate") >= 2


def test_windowed_join_is_equi_join(spark, sf_dir):
    df = E.queries()["windowed_join_10m"](spark, sf_dir)
    plan = plan_of(df)
    # the time band must ride an equi-join, never a cartesian product
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan


def test_three_way_join_is_equi_join_chain(spark, sf_dir):
    """Both chained joins stay equi-joins with the bands as residual
    predicates — a cartesian anywhere in the chain would be quadratic at
    scale."""
    df = E.queries()["windowed_join_3way"](spark, sf_dir)
    plan = plan_of(df)
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan


def test_event_type_prefilter_pushed_for_patterns(spark, sf_dir):
    from varpulis_spark.operators.sase import Pattern, step

    p = Pattern(
        steps=[step("A", "a"), step("B", "bs", kleene="+")],
        emit={"a_id": ("a", "event_id")},
    )  # Kleene → NFA path, but the isin prefilter still pushes to the scan
    df = Stream.events(spark, sf_dir).partition_by("user_id").pattern(p).df
    plan = plan_of(df)
    assert "In(event_type" in plan


def test_late_split(spark):
    """Arrival order (event_id) 0..5 with ts (seconds): 0, 600, 610, 5,
    580, 620. Watermark trails max-prior-ts by 60s: event 3 (ts=5 vs
    wm=610-60) is late; event 4 (ts=580 vs wm=550) is on time."""
    from datetime import datetime, timedelta

    t0 = datetime(2024, 1, 1)
    secs = [0, 600, 610, 5, 580, 620]
    df = spark.createDataFrame(
        [(i, t0 + timedelta(seconds=s)) for i, s in enumerate(secs)],
        "event_id long, ts timestamp",
    )
    s = Stream(df, ts_col="ts", order_col="event_id")
    on_time, late = s.late_split("60s")
    assert sorted(r.event_id for r in late.collect()) == [3]
    assert sorted(r.event_id for r in on_time.collect()) == [0, 1, 2, 4, 5]
    # allowed_lateness widens the acceptance band
    on_time2, late2 = s.late_split("60s", allowed_lateness="10m")
    assert late2.count() == 0


def test_lag_single_shuffle(spark, sf_dir):
    """prev/lag: one hash exchange on the partition key feeding one window
    sort — no extra shuffles, no Python."""
    df = E.queries()["lag_delta"](spark, sf_dir)
    plan = plan_of(df)
    assert plan.count("Exchange hashpartitioning") == 1
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan


def test_trend_multi_single_pass(spark, sf_dir):
    """Hamlet multi-query: ONE scan of events and ONE keyed exchange feed
    all 10 queries — and since r4's closed-form lowering the whole plan is
    JVM-side (conditional aggregation + struct explode, no Python stage)."""
    df = E.queries()["trend_multi"](spark, sf_dir)
    plan = plan_of(df)
    assert plan.count("Scan parquet") == 1
    assert plan.count("Exchange hashpartitioning") == 1
    assert "FlatMapGroupsInPandas" not in plan
    assert "ArrowEvalPython" not in plan


def test_lang_distribution_single_tokenization(spark, sf_dir):
    """The 4 per-language scores must derive from ONE materialized token
    array — CollapseProject must not re-inline the split into each score
    (VERDICT r3 #2: a 4x token-split recompute)."""
    df = E.queries()["lang_distribution"](spark, sf_dir)
    plan = plan_of(df)
    assert plan.count("split(") == 1, plan


def test_unpartitioned_pattern_and_trend_warn(spark, sf_dir):
    """The single-universe fallback is the one user-triggerable scale
    killer — it must announce itself (VERDICT r3 task 6)."""
    import warnings

    from varpulis_spark.operators.greta import trend_aggregate
    from varpulis_spark.operators.sase import Pattern, apply_pattern_batch, step

    ev = Stream.events(spark, sf_dir)
    pat = Pattern(steps=[step("signup", "a"), step("purchase", "b")])
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        apply_pattern_batch(ev, pat)
        assert any("unpartitioned pattern" in str(x.message) for x in w)
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        # within forces the DP path — that is the single-universe hazard
        trend_aggregate(ev, event_type="purchase", within="1h")
        assert any("unpartitioned trend" in str(x.message) for x in w)
    # the partitioned paths stay silent
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        trend_aggregate(ev.partition_by("user_id"), event_type="purchase")
        # predicate-free unkeyed lowering is a plain JVM aggregation
        # (distributed partial agg) — no hazard, no warning
        trend_aggregate(ev, event_type="purchase")
        assert not any("unpartitioned" in str(x.message) for x in w)


def test_minhash_exchanges_carry_no_text(spark, sf_dir):
    """Near-dup pipeline: document text reaches only the signature UDF;
    every exchange carries ids/buckets/signatures."""
    from varpulis_spark.operators import dedup as D
    from varpulis_spark.engine import load_table

    docs = load_table(spark, sf_dir, "documents")
    df = D.minhash_near_dup_pairs(docs, threshold=0.4)
    explained = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    import re

    for m in re.finditer(r"\(\d+\) Exchange\n((?:.+\n)+?)\n", explained):
        section = m.group(1)
        if "RoundRobinPartitioning" in section:
            # spread()'s pre-UDF fan-out: only exists when the local input
            # arrives as fewer splits than cores — a no-op on a real
            # cluster (dedup.spread docstring), so it may carry text here
            continue
        assert "text#" not in section and "__t#" not in section, section
    D.release_caches()


def test_near_dup_verify_plan_shapes(spark, sf_dir):
    """Banding false-positives dwarf surviving pairs near the threshold,
    so signatures must never ride a per-candidate shuffle.

    minhash (r8): verification is BUCKET-LOCAL — signatures join the
    capped bucket membership once and agreement runs in a mapInPandas
    kernel, so the plan must show ArrowEvalPython (the verify kernel) and
    NO per-pair signature join (the pre-r8 shape shuffled ~2 KB of sigs
    per raw candidate — ~170 GB at sf10).

    minshingle (r11): verification is BLOCK-LOCAL too — shingle arrays
    join ONCE onto the pairable block memberships (broadcast when the
    exact cached size fits VERIFY_BROADCAST_MAX_BYTES; above it the
    NARROW membership side is the hash build — arrays are never sorted),
    and exact Jaccard runs in a mapInPandas kernel. The pre-r11 shape
    (candidates → join both arrays back) shipped ~46 GB of sorted array
    payload through two SMJs at sf10."""
    from varpulis_spark.operators import dedup as D
    from varpulis_spark.engine import load_table

    docs = load_table(spark, sf_dir, "documents")
    mh_plan = plan_of(D.minhash_near_dup_pairs(docs, threshold=0.4))
    assert "MapInPandas" in mh_plan or "mapInPandas" in mh_plan, mh_plan
    assert "zip_with" not in mh_plan  # no per-pair JVM array comparison

    ms_plan = plan_of(D.ngram_minshingle_pairs(docs))
    # one array join (broadcast at this size), verify kernel in Python —
    # r12: mapInARROW, not mapInPandas (pandas conversion materialized one
    # Python int per shingle hash, ~120 s at sf10 before any verification)
    assert ms_plan.count("BroadcastHashJoin") == 1, ms_plan
    assert "MapInArrow" in ms_plan or "mapInArrow" in ms_plan, ms_plan
    assert "MapInPandas" not in ms_plan, ms_plan
    # arrays never ride a sort-merge join or a per-pair verify join
    assert "SortMergeJoin" not in ms_plan, ms_plan
    assert "array_intersect" not in ms_plan  # verify left the JVM plan
    D.release_caches()


def test_no_red_flags_in_any_driver_plan(spark, sf_dir):
    """Sweep EVERY driver query's physical plan: no cartesian/nested-loop
    joins (quadratic at scale) and no row-at-a-time Python UDFs
    (BatchEvalPython — the non-Arrow slow path). `embedding_near_dup` is
    whitelisted for its row×block-id replication crossJoin (a broadcast of
    an n_blocks-row frame — the block-matrix shape, not row×row);
    `embedding_near_dup_capped` is the same cosine_pairs kernel over a
    fixed 4,000-row slice, so it carries the identical whitelisted shape."""
    allowed_cartesian = {"embedding_near_dup", "embedding_near_dup_capped"}
    flags = []
    for name, fn in E.queries().items():
        plan = plan_of(fn(spark, sf_dir))
        if name not in allowed_cartesian and (
            "CartesianProduct" in plan or "BroadcastNestedLoopJoin" in plan
        ):
            flags.append((name, "cartesian"))
        if "BatchEvalPython" in plan:
            flags.append((name, "row-at-a-time PythonUDF"))
    assert not flags, flags
