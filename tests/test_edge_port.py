"""Port of the reference's edge-case battery (crates/varpulis-runtime/
tests/edge_{negation,kleene,window,pipeline,hamlet}_tests.rs): negation
partition-awareness and position variants, Kleene edge shapes, count-window
boundaries, pipeline compositions, and trend-aggregation edges — each
program text verbatim, assertions mirrored (sharpened to exact counts where
the reference's replay semantics make the answer deterministic)."""

import pytest

from varpulis_spark.sources.event_file import load_evt
from varpulis_spark.stream import Stream
from varpulis_spark.vpl.compiler import run_program


@pytest.fixture(scope="module")
def spark():
    from varpulis_spark.engine import get_spark

    return get_spark("edge-port-tests")


def run(spark, program: str, events: str, stream_name: str | None = None):
    stream = Stream(load_evt(spark, events), ts_col="ts",
                    order_col="event_id")
    res = run_program(program, stream)
    if stream_name is None:
        (stream_name,) = res
    return res[stream_name].collect()


# -- edge_negation_tests.rs ---------------------------------------------------


def test_negation_wrong_partition_key(spark):
    rows = run(spark, """
stream NegPartition = Login as a
    -> Purchase where user_id == a.user_id as b
    .not(Cancellation where user_id == a.user_id)
    .emit(status: "purchased", user: a.user_id)
""", """
Login { user_id: "alice" }
Cancellation { user_id: "bob" }
Purchase { user_id: "alice", amount: 50.0 }
""")
    assert len(rows) == 1  # bob's cancellation must not cancel alice


def test_negation_multiple_cancel_events(spark):
    rows = run(spark, """
stream NegMultiple = Order as a
    -> Payment where order_id == a.id as b
    .not(Cancel where order_id == a.id)
    .emit(status: "paid")
""", """
Order { id: 1 }
Cancel { order_id: 1 }
Cancel { order_id: 1 }
Payment { order_id: 1 }
""")
    assert len(rows) == 0  # first Cancel suffices to block


def test_negation_after_match_no_retraction(spark):
    rows = run(spark, """
stream NegAfterMatch = Order as a
    -> Payment where order_id == a.id as b
    .not(Cancel where order_id == a.id)
    .emit(status: "paid")
""", """
Order { id: 1 }
Payment { order_id: 1 }
Cancel { order_id: 1 }
""")
    assert len(rows) == 1  # Cancel after completion does not retract


def test_negation_preserves_other_partitions(spark):
    rows = run(spark, """
stream NegPartitions = Request as a
    -> Response where req_id == a.id as b
    .not(Timeout where req_id == a.id)
    .emit(status: "responded", req: a.id)
""", """
Request { id: 1 }
Request { id: 2 }
Timeout { req_id: 1 }
Response { req_id: 2 }
Response { req_id: 1 }
""")
    assert [r.req for r in rows] == [2]  # only request 2 survives


def test_negation_at_sequence_end(spark):
    rows = run(spark, """
stream NegEnd = A as a
    -> B as b
    .not(Poison)
    .emit(status: "clean")
""", """
A { id: 1 }
Poison { toxin: "x" }
B { id: 2 }
""")
    assert len(rows) == 0  # uncorrelated Poison inside the span cancels


def test_negation_no_cancel_event_allows_match(spark):
    rows = run(spark, """
stream NegClean = Start as a
    -> End where session_id == a.id as b
    .not(Error where session_id == a.id)
    .emit(status: "success", session: a.id)
""", """
Start { id: 42 }
End { session_id: 42 }
""")
    assert len(rows) == 1


# -- edge_kleene_tests.rs -----------------------------------------------------

KLEENE_ABC = """
stream KleeneTest = A as a
    -> all B as b
    -> C as c
    .emit(status: "matched")
"""


def test_kleene_plus_zero_matching(spark):
    rows = run(spark, KLEENE_ABC, "A { id: 1 }\nC { id: 2 }\n")
    assert len(rows) == 0  # Kleene+ needs >=1 B


def test_kleene_plus_single_match(spark):
    rows = run(spark, KLEENE_ABC, "A { id: 1 }\nB { value: 10 }\nC { id: 2 }\n")
    assert len(rows) == 1


def test_kleene_plus_many_matches(spark):
    events = "A { id: 1 }\n" + "".join(
        f"B {{ value: {i} }}\n" for i in range(1, 16)) + "C { id: 2 }\n"
    rows = run(spark, KLEENE_ABC, events)
    assert rows  # 15 Bs produce at least one match (combination caps apply)


def test_kleene_with_predicate_filter(spark):
    rows = run(spark, """
stream FilteredKleene = A as a
    -> all B where value > 50 as b
    -> C as c
    .emit(status: "filtered")
""", """
A { id: 1 }
B { value: 30 }
B { value: 80 }
B { value: 20 }
B { value: 90 }
C { id: 2 }
""")
    assert rows


def test_kleene_interleaved_unrelated_events(spark):
    rows = run(spark, """
stream KleeneIgnoreOthers = A as a
    -> all B as b
    -> C as c
    .emit(status: "matched")
""", """
A { id: 1 }
X { noise: 1 }
B { value: 10 }
Y { noise: 2 }
B { value: 20 }
Z { noise: 3 }
C { id: 2 }
""")
    assert rows  # skip-till-any ignores unrelated types


def test_kleene_rapid_burst(spark):
    events = "A { id: 1 }\n" + "".join(
        f"B {{ n: {i} }}\n" for i in range(1, 101)) + "C { id: 2 }\n"
    rows = run(spark, """
stream BurstKleene = A as a
    -> all B as b
    -> C as c
    .emit(status: "burst")
""", events)
    assert rows  # 100-B burst stays within the safety caps and matches


def test_kleene_reset_after_match(spark):
    rows = run(spark, """
stream KleeneReset = A as a
    -> all B as b
    -> C as c
    .emit(status: "matched")
""", """
A { id: 1 }
B { value: 10 }
B { value: 20 }
C { id: 1 }
A { id: 2 }
B { value: 30 }
C { id: 2 }
""")
    assert len(rows) >= 2  # both complete sequences match


def test_kleene_mixed_types_no_false_match(spark):
    rows = run(spark, """
stream KleeneTypes = A as a
    -> all B as b
    -> C as c
    .emit(status: "correct")
""", """
A { id: 1 }
D { value: 10 }
D { value: 20 }
C { id: 2 }
""")
    assert len(rows) == 0  # D events don't satisfy the B closure


def test_kleene_within_timeout(spark):
    rows = run(spark, """
stream TimedKleene = A as a
    -> all B as b
    .within(1s)
    .emit(status: "timed")
""", """
BATCH 0
A { id: 1 }
B { value: 10 }
B { value: 20 }
""")
    assert rows


def test_kleene_within_expired(spark):
    rows = run(spark, """
stream TimedKleene = A as a
    -> all B as b
    .within(1s)
    .emit(status: "timed")
""", """
BATCH 0
A { id: 1 }
BATCH 5000
B { value: 10 }
""")
    assert len(rows) == 0  # strict within: B at +5s misses the 1s deadline


def test_kleene_simple_two_step(spark):
    rows = run(spark, """
stream SimpleKleene = A as a
    -> all B as b
    .emit(status: "accumulated")
""", """
A { id: 1 }
B { value: 10 }
B { value: 20 }
B { value: 30 }
""")
    assert rows  # trailing Kleene emits accumulated matches


def test_kleene_with_emit_fields(spark):
    rows = run(spark, """
stream KleeneEmit = Start as s
    -> all Tick as t
    -> End as e
    .emit(start_id: s.id, end_id: e.id)
""", """
Start { id: 1 }
Tick { price: 100.0 }
Tick { price: 101.0 }
End { id: 99 }
""")
    assert rows
    for r in rows:
        assert r.start_id == 1 and r.end_id == 99


def test_kleene_multiple_closures(spark):
    rows = run(spark, """
stream DoubleKleene = A as a
    -> all B as b
    -> D as d
    .emit(status: "double_kleene")
""", """
A { id: 1 }
B { v: 1 }
B { v: 2 }
B { v: 3 }
D { id: 2 }
""")
    assert rows


# -- edge_window_tests.rs -----------------------------------------------------


def test_count_window_exact_fill(spark):
    rows = run(spark, """
stream CountExact = Reading
    .window(3)
    .aggregate(total: sum(value))
    .emit(sum: total)
""", """
Reading { value: 10.0 }
Reading { value: 20.0 }
Reading { value: 30.0 }
""")
    assert len(rows) == 1 and abs(rows[0].sum - 60.0) < 1e-3


def test_count_window_fewer_events(spark):
    rows = run(spark, """
stream CountFewer = Reading
    .window(10)
    .aggregate(total: sum(value))
    .emit(sum: total)
""", "".join(f"Reading {{ value: {v}.0 }}\n" for v in (10, 20, 30, 40, 50)))
    assert len(rows) == 0  # incomplete window emits nothing


def test_count_window_overflow(spark):
    rows = run(spark, """
stream CountOverflow = Reading
    .window(3)
    .aggregate(total: sum(value))
    .emit(sum: total)
""", "".join(f"Reading {{ value: {v}.0 }}\n" for v in range(1, 8)))
    sums = sorted(r.sum for r in rows)
    assert sums == [6.0, 15.0]  # 2 complete windows, 1 pending


def test_aggregate_having_filters_all(spark):
    rows = run(spark, """
stream HavingFilter = Sale
    .window(3)
    .aggregate(total: sum(amount))
    .having(total > 1000000.0)
    .emit(sum: total)
""", """
Sale { amount: 100.0 }
Sale { amount: 200.0 }
Sale { amount: 300.0 }
""")
    assert len(rows) == 0


def test_aggregate_having_passes(spark):
    rows = run(spark, """
stream HavingPass = Sale
    .window(3)
    .aggregate(total: sum(amount))
    .having(total > 50.0)
    .emit(sum: total)
""", """
Sale { amount: 10.0 }
Sale { amount: 20.0 }
Sale { amount: 30.0 }
""")
    assert len(rows) == 1 and abs(rows[0].sum - 60.0) < 1e-3


def test_aggregate_multiple_functions(spark):
    rows = run(spark, """
stream MultiAgg = Metric
    .window(4)
    .aggregate(
        cnt: count(value),
        total: sum(value),
        average: avg(value),
        minimum: min(value),
        maximum: max(value)
    )
    .emit(
        cnt: cnt,
        total: total,
        average: average,
        minimum: minimum,
        maximum: maximum
    )
""", "".join(f"Metric {{ value: {v}.0 }}\n" for v in (10, 20, 30, 40)))
    (r,) = rows
    assert r.cnt == 4 and abs(r.total - 100.0) < 1e-3
    assert abs(r.average - 25.0) < 1e-3
    assert abs(r.minimum - 10.0) < 1e-3 and abs(r.maximum - 40.0) < 1e-3


def test_empty_partition_no_output(spark):
    rows = run(spark, """
stream PartitionEmpty = Reading
    .where(zone == "critical")
    .window(3)
    .aggregate(total: sum(value))
    .emit(sum: total)
""", """
Reading { zone: "normal", value: 10.0 }
Reading { zone: "normal", value: 20.0 }
Reading { zone: "normal", value: 30.0 }
""")
    assert len(rows) == 0


def test_window_with_where_before(spark):
    rows = run(spark, """
stream FilterThenWindow = Reading
    .where(value > 50.0)
    .window(2)
    .aggregate(total: sum(value))
    .emit(sum: total)
""", "".join(f"Reading {{ value: {v}.0 }}\n" for v in (30, 80, 40, 90, 20)))
    assert len(rows) == 1 and abs(rows[0].sum - 170.0) < 1e-3


def test_session_window_basic(spark):
    rows = run(spark, """
stream SessionTest = Activity
    .window(session: 30s)
    .aggregate(cnt: count(action))
    .emit(count: cnt)
""", """
BATCH 0
Activity { action: "click", user: "alice" }
BATCH 5000
Activity { action: "scroll", user: "alice" }
BATCH 10000
Activity { action: "click", user: "alice" }
""")
    assert len(rows) == 1 and rows[0]["count"] == 3  # one 30s-gap session


# -- edge_pipeline_tests.rs ---------------------------------------------------


def test_sequence_then_emit_with_expressions(spark):
    rows = run(spark, """
stream DiffCalc = Start as a
    -> End as b
    .emit(diff: b.value - a.value, status: "computed")
""", """
Start { value: 100.0 }
End { value: 250.0 }
""")
    assert len(rows) == 1 and abs(rows[0].diff - 150.0) < 1e-3


def test_where_then_distinct(spark):
    rows = run(spark, """
stream FilterDistinct = Reading
    .where(value > 50.0)
    .distinct(sensor_id)
    .emit(sensor: sensor_id, value: value)
""", """
Reading { sensor_id: "S1", value: 80.0 }
Reading { sensor_id: "S2", value: 30.0 }
Reading { sensor_id: "S1", value: 90.0 }
Reading { sensor_id: "S3", value: 70.0 }
Reading { sensor_id: "S3", value: 60.0 }
""")
    assert sorted(r.sensor for r in rows) == ["S1", "S3"]


def test_select_then_aggregate(spark):
    rows = run(spark, """
stream SelectAggregate = Metric
    .select(norm: value / 100.0)
    .window(3)
    .aggregate(average: avg(norm))
    .emit(avg_norm: average)
""", """
Metric { value: 100.0 }
Metric { value: 200.0 }
Metric { value: 300.0 }
""")
    assert len(rows) == 1 and abs(rows[0].avg_norm - 2.0) < 1e-3


def test_within_basic_timeout(spark):
    rows = run(spark, """
stream WithinMatch = Request as req
    -> Response as resp
    .within(5s)
    .emit(status: "fast", req_id: req.id)
""", """
BATCH 0
Request { id: 1 }
BATCH 1000
Response { req_id: 1 }
""")
    assert len(rows) == 1 and rows[0].req_id == 1


def test_within_expired(spark):
    rows = run(spark, """
stream WithinExpired = Request as req
    -> Response as resp
    .within(5s)
    .emit(status: "fast")
""", """
BATCH 0
Request { id: 1 }
BATCH 10000
Response { req_id: 1 }
""")
    assert len(rows) == 0  # strict within: +10s misses the 5s deadline


def test_sequence_four_steps(spark):
    rows = run(spark, """
stream FourStep = Init as a
    -> Validate as b
    -> Process as c
    -> Complete as d
    .emit(status: "done", init_id: a.id)
""", """
Init { id: 42 }
Validate { ok: true }
Process { result: "success" }
Complete { final: true }
""")
    assert len(rows) == 1
    assert rows[0].status == "done" and rows[0].init_id == 42


def test_multiple_streams_independent(spark):
    stream = Stream(load_evt(spark, """
Reading { temperature: 35.0 }
Reading { temperature: 5.0 }
Reading { temperature: 20.0 }
"""), ts_col="ts", order_col="event_id")
    res = run_program("""
stream HighTemp = Reading
    .where(temperature > 30.0)
    .emit(alert: "hot", temp: temperature)

stream LowTemp = Reading
    .where(temperature < 10.0)
    .emit(alert: "cold", temp: temperature)
""", stream)
    hot = res["HighTemp"].collect()
    cold = res["LowTemp"].collect()
    assert [r.alert for r in hot] == ["hot"] and hot[0].temp == 35.0
    assert [r.alert for r in cold] == ["cold"] and cold[0].temp == 5.0


def test_emit_with_user_function(spark):
    rows = run(spark, """
fn double(x: float) -> float:
    x * 2.0

stream DoubleEmit = Measurement
    .emit(result: double(value), original: value)
""", "Measurement { value: 42.0 }\n")
    assert len(rows) == 1
    assert abs(rows[0].result - 84.0) < 1e-3 and rows[0].original == 42.0


# -- edge_hamlet_tests.rs -----------------------------------------------------

TREND_COUNT = """
stream TrendCount = StockTick as first
    -> all StockTick as rising
    .within(60s)
    .trend_aggregate(count: count_trends())
    .emit(trends: count)
"""


def test_trend_aggregate_correct_count(spark):
    events = "".join(
        f'StockTick {{ symbol: "AAPL", price: {p}.0 }}\n'
        for p in (100, 110, 120, 130, 140))
    rows = run(spark, TREND_COUNT, events)
    assert rows
    for r in rows:
        assert r.trends is not None


def test_trend_aggregate_sum_and_count(spark):
    rows = run(spark, """
stream DualTrend = StockTick as first
    -> all StockTick as rising
    .within(60s)
    .trend_aggregate(
        cnt: count_trends(),
        total: sum_trends(price)
    )
    .emit(count: cnt, sum: total)
""", "".join(f'StockTick {{ symbol: "AAPL", price: {p}.0 }}\n'
             for p in (100, 110, 120)))
    assert rows
    for r in rows:
        assert r["count"] is not None and r.sum is not None


def test_trend_aggregate_partition_isolation(spark):
    rows = run(spark, """
stream PartitionedTrend = StockTick as first
    -> all StockTick as rising
    .within(60s)
    .partition_by(symbol)
    .trend_aggregate(count: count_trends())
    .emit(sym: symbol, trends: count)
""", """
StockTick { symbol: "AAPL", price: 100.0 }
StockTick { symbol: "GOOG", price: 2800.0 }
StockTick { symbol: "AAPL", price: 110.0 }
StockTick { symbol: "GOOG", price: 2850.0 }
""")
    assert {r.sym for r in rows} <= {"AAPL", "GOOG"}
    assert len(rows) >= 1  # partitions aggregate independently


def test_trend_aggregate_single_event(spark):
    rows = run(spark, TREND_COUNT,
               'StockTick { symbol: "AAPL", price: 100.0 }\n')
    assert len(rows) <= 1


def test_trend_aggregate_many_events(spark):
    events = "".join(
        f'StockTick {{ symbol: "AAPL", price: {100.0 + i * 5.0:.1f} }}\n'
        for i in range(25))
    rows = run(spark, TREND_COUNT, events)
    assert rows


def test_trend_aggregate_with_emit_fields(spark):
    rows = run(spark, """
stream EmitFields = StockTick as first
    -> all StockTick as rising
    .within(60s)
    .trend_aggregate(
        cnt: count_trends(),
        total: sum_trends(price)
    )
    .emit(event_count: cnt, price_total: total)
""", "".join(f'StockTick {{ symbol: "AAPL", price: {p}.0 }}\n'
             for p in (100, 110, 120, 130)))
    assert rows
    assert {"event_count", "price_total"} <= set(rows[0].asDict())
