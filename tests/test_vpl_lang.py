"""VPL language coverage: user functions, event decls, per-step ops,
merge/join/sequence/timer sources, named patterns, and reference scenario
programs run unmodified.

Expected values mirror the reference's integration tests
(crates/varpulis-runtime/tests/integration_scenarios.rs) where one exists
for the program shape; the scenario-file assertions are derived from the
.evt fixtures under the reference's documented semantics.
"""

import pytest
from pyspark.sql import functions as F

from varpulis_spark.sources.event_file import load_evt
from varpulis_spark.stream import Stream
from varpulis_spark.vpl.compiler import run_program
from varpulis_spark.vpl.parser import parse_full

SCEN = "/root/reference/tests/scenarios"


@pytest.fixture(scope="module")
def spark():
    from varpulis_spark.engine import get_spark

    return get_spark("vpl-lang-tests")


def run_inline(spark, program: str, events: str):
    stream = Stream(load_evt(spark, events), ts_col="ts", order_col="event_id")
    return run_program(program, stream)


def run_scenario(spark, vpl_name: str, evt_name: str | None = None):
    with open(f"{SCEN}/{vpl_name}.vpl") as f:
        src = f.read()
    evt = f"{SCEN}/{evt_name or vpl_name}.evt"
    stream = Stream(load_evt(spark, evt), ts_col="ts", order_col="event_id")
    return run_program(src, stream)


# ---------------------------------------------------------------------------
# user functions (integration_scenarios.rs:695-775)
# ---------------------------------------------------------------------------


def test_user_function_in_where(spark):
    res = run_inline(spark, """
fn is_high(value: float, threshold: float) -> bool:
    value > threshold

fn double(x: float) -> float:
    x * 2.0

stream HighValues = Measurement
    .where(is_high(value, double(threshold)))
    .emit(status: "high", val: value)
""", """
Measurement { value: 100.0, threshold: 30.0 }
Measurement { value: 50.0, threshold: 30.0 }
Measurement { value: 150.0, threshold: 100.0 }
""")
    rows = res["HighValues"].collect()
    assert len(rows) == 1 and rows[0].val == 100.0


def test_nested_function_calls(spark):
    res = run_inline(spark, """
fn add_margin(x: float, pct: float) -> float:
    x * (1.0 + pct / 100.0)

stream MarginCheck = Price
    .where(current > add_margin(base, margin_pct))
    .emit(status: "above_margin")
""", """
Price { current: 110.0, base: 100.0, margin_pct: 5.0 }
Price { current: 104.0, base: 100.0, margin_pct: 5.0 }
""")
    assert res["MarginCheck"].count() == 1


def test_builtin_abs_in_where(spark):
    res = run_inline(spark, """
stream AbsCheck = Reading
    .where(abs(delta) > 10.0)
    .emit(status: "large_delta", d: delta)
""", """
Reading { delta: 5.0 }
Reading { delta: -15.0 }
Reading { delta: 8.0 }
Reading { delta: 25.0 }
""")
    assert res["AbsCheck"].count() == 2


def test_emit_with_function_call_and_arithmetic(spark):
    res = run_inline(spark, """
fn calculate_tax(amount: float, rate: float) -> float:
    amount * rate / 100.0

stream TaxCalculation = Sale
    .emit(sale_id: id, amount: amount, tax: calculate_tax(amount, tax_rate))

stream PriceWithDiscount = Product
    .emit(product_id: id, final_price: price * (1.0 - discount / 100.0))

stream AbsoluteValues = Measurement
    .emit(sensor_id: id, abs_value: abs(reading))
""", """
Sale { id: "S1", amount: 100.0, tax_rate: 20.0 }
Product { id: "P1", price: 100.0, discount: 25.0 }
Measurement { id: "M1", reading: -42.5 }
""")
    assert res["TaxCalculation"].collect()[0].tax == pytest.approx(20.0)
    assert res["PriceWithDiscount"].collect()[0].final_price == pytest.approx(75.0)
    assert res["AbsoluteValues"].collect()[0].abs_value == pytest.approx(42.5)


# ---------------------------------------------------------------------------
# global negation in chains (integration_scenarios.rs:783-858)
# ---------------------------------------------------------------------------

_NEG_PROGRAM = """
stream OrderPayment = Order as order
    -> Payment where order_id == order.id as payment
    .not(Cancellation where order_id == order.id)
    .emit(status: "paid", order_id: order.id)
"""


def test_sequence_negation_cancels_match(spark):
    res = run_inline(spark, _NEG_PROGRAM, """
Order { id: 1 }
BATCH 10
Cancellation { order_id: 1 }
BATCH 20
Payment { order_id: 1 }
""")
    assert res["OrderPayment"].count() == 0


def test_sequence_negation_allows_non_matching(spark):
    res = run_inline(spark, _NEG_PROGRAM, """
Order { id: 1 }
BATCH 10
Cancellation { order_id: 2 }
BATCH 20
Payment { order_id: 1 }
""")
    assert res["OrderPayment"].count() == 1


def test_sequence_without_negation(spark):
    res = run_inline(spark, """
stream OrderPayment = Order as order
    -> Payment where order_id == order.id as payment
    .emit(status: "paid", order_id: order.id)
""", """
Order { id: 1 }
BATCH 10
Cancellation { order_id: 1 }
BATCH 20
Payment { order_id: 1 }
""")
    assert res["OrderPayment"].count() == 1


# ---------------------------------------------------------------------------
# merge sources (integration_scenarios.rs:952-1019,1080-1120)
# ---------------------------------------------------------------------------


def test_merge_inline_stream_decls(spark):
    res = run_inline(spark, """
stream BuildingMetrics = merge(
    stream S1 = SensorEvent .where(sensor_id == "S1"),
    stream S2 = SensorEvent .where(sensor_id == "S2"),
    stream S3 = SensorEvent .where(sensor_id == "S3")
)
    .emit(sensor: sensor_id, temp: temperature)
""", """
SensorEvent { sensor_id: "S1", temperature: 22.5 }
SensorEvent { sensor_id: "S2", temperature: 23.0 }
SensorEvent { sensor_id: "S4", temperature: 24.0 }
SensorEvent { sensor_id: "S3", temperature: 21.5 }
""")
    rows = res["BuildingMetrics"].collect()
    assert len(rows) == 3
    assert {r.sensor for r in rows} == {"S1", "S2", "S3"}


def test_merge_named_streams(spark):
    res = run_inline(spark, """
stream Errors = LogEvent
    .where(level == "error")

stream Warnings = LogEvent
    .where(level == "warn")

stream Alerts = merge(Errors, Warnings)
""", """
LogEvent { level: "info", msg: "a" }
LogEvent { level: "error", msg: "b" }
LogEvent { level: "warn", msg: "c" }
LogEvent { level: "error", msg: "d" }
""")
    assert res["Alerts"].count() == 3


# ---------------------------------------------------------------------------
# join source (financial_markets.vpl:142, hvac_demo.vpl:110)
# ---------------------------------------------------------------------------


def test_join_source_on_window_select(spark):
    res = run_inline(spark, """
stream Temps = Reading
    .where(kind == "temp")
    .emit(zone: zone, temp: value)

stream Hums = Reading
    .where(kind == "hum")
    .emit(zone: zone, hum: value)

stream Comfort = join(Temps, Hums)
    .on(Temps.zone == Hums.zone)
    .window(1m)
    .select(zone: Temps.zone, temperature: Temps.temp, humidity: Hums.hum,
            score: 100.0 - abs(Temps.temp - 22.0) * 5.0)
""", """
Reading { zone: "Z1", kind: "temp", value: 24.0 }
Reading { zone: "Z1", kind: "hum", value: 50.0 }
Reading { zone: "Z2", kind: "temp", value: 20.0 }
""")
    rows = res["Comfort"].collect()
    assert len(rows) == 1
    assert rows[0].zone == "Z1" and rows[0].humidity == 50.0
    assert rows[0].score == pytest.approx(90.0)


# ---------------------------------------------------------------------------
# sequence() source (ast.rs:187,204-224; runtime/src/sequence.rs)
# ---------------------------------------------------------------------------


def test_sequence_source_match_all(spark):
    res = run_inline(spark, """
stream Seq = sequence(match_all: true, timeout: 5m,
                      first: Req, second: Resp where id == first.id)
    .emit(req_id: first.id, resp_id: second.id)
""", """
Req { id: 1 }
BATCH 100
Resp { id: 1 }
BATCH 200
Resp { id: 1 }
""")
    # match_all: every viable completion (skip-till-any)
    assert res["Seq"].count() == 2


def test_sequence_source_single_match(spark):
    res = run_inline(spark, """
stream Seq = sequence(match_all: false, timeout: 5m,
                      first: Req, second: Resp where id == first.id)
    .emit(req_id: first.id, resp_id: second.id)
""", """
Req { id: 1 }
BATCH 100
Resp { id: 1 }
BATCH 200
Resp { id: 1 }
""")
    # single-run semantics: only the first completion fires (skip-till-next)
    assert res["Seq"].count() == 1


# ---------------------------------------------------------------------------
# named pattern declarations (ast.rs:106-112; reusable_patterns.vpl)
# ---------------------------------------------------------------------------


def test_named_pattern_seq_within_partition(spark):
    res = run_inline(spark, """
pattern LoginThenTx = SEQ(
    Login as login,
    Transaction where user_id == login.user_id as tx
) within 10m partition by user_id

stream Alerts = LoginThenTx
    .emit(user: login.user_id, amount: tx.amount)
""", """
Login { user_id: "u1" }
BATCH 1000
Transaction { user_id: "u1", amount: 50.0 }
BATCH 2000
Login { user_id: "u2" }
Transaction { user_id: "u3", amount: 10.0 }
""")
    rows = res["Alerts"].collect()
    assert len(rows) == 1
    assert rows[0].user == "u1" and rows[0].amount == 50.0


def test_named_pattern_kleene_breakout(spark):
    """pipeline.vpl:24 Breakout shape: Kleene + len(closure) emit."""
    res = run_inline(spark, """
pattern Breakout = SEQ(
    Tick as first,
    Tick+ where price > first.price as rising,
    Tick where price > first.price * 1.1 as last
) within 120s partition by symbol

stream Signals = Breakout
    .emit(symbol: last.symbol, start_price: first.price,
          end_price: last.price, tick_count: len(rising))
""", """
Tick { symbol: "ACME", price: 100.0 }
BATCH 1000
Tick { symbol: "ACME", price: 105.0 }
BATCH 2000
Tick { symbol: "ACME", price: 115.0 }
""")
    rows = res["Signals"].collect()
    # first=100 -> rising=[105] -> last=115 (>110)
    assert len(rows) == 1
    assert rows[0].start_price == 100.0 and rows[0].end_price == 115.0
    assert rows[0].tick_count == 1


def test_named_pattern_or(spark):
    res = run_inline(spark, """
pattern AuthEvent = Login OR Logout

stream Auths = AuthEvent
    .emit(u: user_id)
""", """
Login { user_id: "a" }
Logout { user_id: "a" }
Other { user_id: "b" }
Login { user_id: "c" }
""")
    assert res["Auths"].count() == 3


# ---------------------------------------------------------------------------
# event decls, vars, timer, .process
# ---------------------------------------------------------------------------


def test_event_decl_casts_columns(spark):
    """Declared field types are applied to the frame (int payload read as
    long becomes double per the event decl)."""
    res = run_inline(spark, """
event Reading:
    value: float
    count: int

stream Out = Reading
    .emit(v: value, c: count)
""", """
Reading { value: 5, count: 2 }
""")
    df = res["Out"]
    types = dict(df.dtypes)
    assert types["v"] == "double" and types["c"] == "bigint"


def test_var_substitution(spark):
    res = run_inline(spark, """
var threshold: float = 50.0
const factor = 2.0

stream Big = Reading
    .where(value > threshold * factor)
    .emit(v: value)
""", """
Reading { value: 150.0 }
Reading { value: 99.0 }
""")
    rows = res["Big"].collect()
    assert len(rows) == 1 and rows[0].v == 150.0


def test_timer_source(spark):
    res = run_inline(spark, """
stream Ticks = timer(10s)
""", """
Dummy { x: 1 }
@30s Dummy { x: 2 }
""")
    # event-time range [0s, 30s] at 10s cadence -> 4 ticks
    assert res["Ticks"].count() == 4


def test_process_imperative_fn(spark):
    res = run_scenario(spark, "emit_process")
    rows = res["Pixels"].collect()
    got = sorted((r.x, r.y, r.color) for r in rows)
    assert got == [(0, 0, 0), (0, 1, 3), (1, 0, 1), (1, 1, 4), (2, 0, 2), (2, 1, 5)]
    assert all(r.event_type == "Pixel" for r in rows)


# ---------------------------------------------------------------------------
# expression extensions: coalesce / if-then-else / in / list
# ---------------------------------------------------------------------------


def test_expression_extensions(spark):
    res = run_inline(spark, """
stream Out = Reading
    .emit(v: value ?? 0.0,
          grade: if value > 10.0 then "high" else "low",
          tagged: kind in ["a", "b"])
""", """
Reading { kind: "a", value: 15.0 }
Reading { kind: "c" }
""")
    rows = sorted(res["Out"].collect(), key=lambda r: r.v)
    assert rows[0].v == 0.0 and rows[0].grade == "low" and rows[0].tagged is False
    assert rows[1].v == 15.0 and rows[1].grade == "high" and rows[1].tagged is True


# ---------------------------------------------------------------------------
# reference scenario files run unmodified
# ---------------------------------------------------------------------------


def test_electrical_consumption_scenario(spark):
    res = run_scenario(spark, "electrical_consumption")
    # 5 readings exceed 150% of baseline in the fixture
    ab = res["AbnormalFloorConsumption"].collect()
    assert len(ab) == 5
    by_floor = {(r.site_id, r.building_id, r.floor_id, r.consumption): r for r in ab}
    spike = by_floor[("SITE-A", "B1", "F2", 200.0)]
    assert spike.percent_over == pytest.approx((200.0 - 90.0) / 90.0 * 100.0)
    assert spike.severity == "warning"

    # all events fall in one 5m window; 3 buildings / 2 sites
    bc = {r.building_id: r for r in res["BuildingConsumption"].collect()}
    assert set(bc) == {"B1", "B2", "C1"}
    assert bc["B1"].total_consumption == pytest.approx(1358.0)
    assert bc["B1"].floor_count == 11
    assert bc["B2"].total_consumption == pytest.approx(675.0)
    assert {r.site_id for r in res["SiteConsumption"].collect()} == {"SITE-A", "SITE-B"}

    # only B2 exceeds 130% of its baseline total
    an = res["BuildingAnomaly"].collect()
    assert len(an) == 1 and an[0].building_id == "B2" and an[0].severity == "critical"

    # same-floor consumption doubling within 10m (all pairs, skip-till-any)
    assert res["ConsumptionSpike"].count() == 9


def test_order_payment_scenario(spark):
    res = run_scenario(spark, "order_payment", "order_payment_sequence")
    m = {r.order_id: r for r in res["OrderPaymentMatch"].collect()}
    assert set(m) == {1, 2, 3}
    assert m[1].fee == pytest.approx(15000.0 * 0.02)
    assert m[1].status == "payment_received"
    # Order events carry no `amount` field -> priority predicate is null
    assert res["PriorityOrders"].count() == 0
    # the matching Payment itself triggers the global negation
    # (sase.rs:2204: negation check precedes run advancement)
    assert res["UnpaidOrders"].count() == 0


def test_watermark_scenarios(spark):
    res = run_scenario(spark, "watermark_basic")
    assert res["Watermarked"].count() == 5
    with open(f"{SCEN}/watermark_lateness.vpl") as f:
        src = f.read()
    s = Stream(
        load_evt(spark, """
@0s OrderEvent { amount: 10.0 }
@30s OrderEvent { amount: 20.0 }
@90s OrderEvent { amount: 5.0 }
"""),
        ts_col="ts", order_col="event_id",
    )
    rows = run_program(src, s)["Combined"].collect()
    # lateness is a replay no-op; two 1m windows aggregate normally
    assert sorted(r.total_amount for r in rows) == [5.0, 30.0]


def test_checkpoint_count_window_scenario(spark):
    with open(f"{SCEN}/checkpoint_count_window.vpl") as f:
        src = f.read()
    p1 = open(f"{SCEN}/checkpoint_count_window_phase1.evt").read()
    p2 = open(f"{SCEN}/checkpoint_count_window_phase2.evt").read()
    # phase 1 alone: 3 events < window(5) -> no complete window
    s1 = Stream(load_evt(spark, p1), ts_col="ts", order_col="event_id")
    assert run_program(src, s1)["WindowedSum"].count() == 0
    # phases replayed together (the checkpoint-restore contract): one full
    # window, sum = 10+20+30+40+50
    s12 = Stream(load_evt(spark, p1 + "\n" + p2), ts_col="ts", order_col="event_id")
    rows = run_program(src, s12)["WindowedSum"].collect()
    assert len(rows) == 1 and rows[0].sum == 150 and rows[0].n == 5


def test_checkpoint_variables_scenario(spark):
    res = run_scenario(spark, "checkpoint_variables", "checkpoint_passthrough")
    assert res["Incrementer"].count() >= 1


def test_count_distinct_sugar(spark):
    res = run_inline(spark, """
stream SensorStats = SensorEvent
    .window(1m)
    .aggregate(sensor_count: count(distinct(sensor_id)), total_count: count(sensor_id))
    .emit(unique_sensors: sensor_count, total: total_count)
""", """
SensorEvent { sensor_id: "S1", temperature: 20.0 }
SensorEvent { sensor_id: "S1", temperature: 21.0 }
SensorEvent { sensor_id: "S2", temperature: 22.0 }
SensorEvent { sensor_id: "S3", temperature: 23.0 }
SensorEvent { sensor_id: "S1", temperature: 24.0 }
""")
    rows = res["SensorStats"].collect()
    assert len(rows) == 1
    assert rows[0].unique_sensors == 3 and rows[0].total == 5


def test_parse_full_shapes():
    prog = parse_full("""
fn f(x: float) -> float:
    x * 2.0

event E extends Base:
    a: float
    b: str

var v: int = 3

pattern P = SEQ(A as a, B+ where x == a.x as b) within 1h partition by x

stream S = merge(A, B where y > 1)
    .emit(z: y)
""")
    assert len(prog.fns) == 1 and prog.fns[0].name == "f"
    assert prog.events[0].base == "Base" and len(prog.events[0].fields) == 2
    assert prog.vars[0].name == "v"
    assert prog.patterns[0].partition_by == "x"
    assert prog.streams[0].source is not None


# ---------------------------------------------------------------------------
# .enrich / .score / .trend_aggregate / .forecast ops (ast.rs:324-330)
# ---------------------------------------------------------------------------

TICKS = """
StockTick { symbol: "A", price: 10.0 }
StockTick { symbol: "A", price: 12.0 }
StockTick { symbol: "A", price: 11.0 }
StockTick { symbol: "A", price: 13.0 }
StockTick { symbol: "B", price: 5.0 }
StockTick { symbol: "B", price: 6.0 }
StockTick { symbol: "B", price: 7.0 }
"""


def test_enrich_op_with_bound_table(spark):
    dim = spark.createDataFrame(
        [("A", "Alpha Corp", "tech"), ("B", "Beta Inc", "retail")],
        ["sym", "name", "sector"],
    )
    stream = Stream(load_evt(spark, TICKS), ts_col="ts", order_col="event_id")
    res = run_program("""
connector RefData = database(url: "postgres://x/catalog")

stream Enriched = StockTick as t
    .enrich(RefData, key: t.symbol, fields: [name, sector], cache_ttl: 1h)
    .emit(symbol: t.symbol, price: t.price, company: name, sector: sector)
""", stream, tables={"RefData": (dim, "sym")})
    rows = sorted(
        (r.symbol, r.price, r.company, r.sector) for r in res["Enriched"].collect()
    )
    assert len(rows) == 7
    assert rows[0] == ("A", 10.0, "Alpha Corp", "tech")
    assert rows[-1] == ("B", 7.0, "Beta Inc", "retail")


def test_enrich_op_fallback(spark):
    dim = spark.createDataFrame([("A", "Alpha")], ["sym", "name"])
    stream = Stream(load_evt(spark, TICKS), ts_col="ts", order_col="event_id")
    res = run_program("""
connector RefData = database(url: "x")

stream E = StockTick as t
    .enrich(RefData, key: t.symbol, fields: [name], fallback: "unknown")
    .emit(symbol: t.symbol, company: name)
""", stream, tables={"RefData": (dim, "sym")})
    got = {(r.symbol, r.company) for r in res["E"].collect()}
    assert ("B", "unknown") in got and ("A", "Alpha") in got


def test_enrich_op_unbound_connector_raises(spark):
    stream = Stream(load_evt(spark, TICKS), ts_col="ts", order_col="event_id")
    with pytest.raises(ValueError, match="not bound"):
        run_program("""
stream E = StockTick as t .enrich(Nope, key: t.symbol, fields: [x])
""", stream)


def test_score_op_linear_fallback(spark):
    stream = Stream(load_evt(spark, TICKS), ts_col="ts", order_col="event_id")
    res = run_program("""
stream Scored = StockTick as t
    .score(model: "linear:0.1,0.0", inputs: [price], outputs: [risk])
    .emit(symbol: t.symbol, price: t.price, risk: risk)
""", stream)
    rows = res["Scored"].collect()
    assert len(rows) == 7 and all(r.risk is not None for r in rows)
    # linear fallback is monotone in the input
    by_price = sorted(rows, key=lambda r: r.price)
    risks = [r.risk for r in by_price]
    assert risks == sorted(risks)


def test_trend_aggregate_relational_closed_form(spark):
    """No predicate → every ordered subset is a trend: 2^n − 1 per key."""
    stream = Stream(load_evt(spark, TICKS), ts_col="ts", order_col="event_id")
    res = run_program("""
stream Trends = StockTick as t
    .partition_by(symbol)
    .trend_aggregate(trends: count_trends(), events: count_events(t))
""", stream)
    got = {(r.symbol, r.trends, r.events) for r in res["Trends"].collect()}
    assert got == {("A", 15.0, 32.0), ("B", 7.0, 12.0)}


def test_trend_aggregate_pattern_rising(spark):
    """`first -> all T where price > first.price` compiles to the GRETA DP
    with the predicate as the edge relation (greta.rs predecessor edges);
    verified against the Python-API result on the same input."""
    stream = Stream(load_evt(spark, TICKS), ts_col="ts", order_col="event_id")
    res = run_program("""
stream Rising = StockTick as first
    -> all StockTick where price > first.price as rising
    .partition_by(symbol)
    .trend_aggregate(trends: count_trends())
    .emit(symbol: first.symbol, trends: trends)
""", stream)
    got = {(r.symbol, r.trends) for r in res["Rising"].collect()}

    api = (
        Stream(load_evt(spark, TICKS), ts_col="ts", order_col="event_id")
        .partition_by("symbol")
        .trend_aggregate(
            adjacent_vec=lambda cols, i: cols["price"][:i] < cols["price"][i]
        )
    )
    want = {(r.symbol, r.trend_count) for r in api.df.collect()}
    assert got == want
    # sanity: B is monotone rising (3 events) -> all 7 subsets are trends
    assert ("B", 7.0) in got


def test_forecast_op_pattern(spark):
    evts = "\n".join(
        ['Login { user: "u1" }', 'Purchase { user: "u1" }'] * 20
    )
    stream = Stream(load_evt(spark, evts), ts_col="ts", order_col="event_id")
    res = run_program("""
stream F = Login as a
    -> Purchase as b
    .partition_by(user)
    .forecast(confidence: 0.0, warmup: 10, mode: "fast")
    .where(forecast_probability >= 0.0)
    .emit(user: user, p: forecast_probability, stability: forecast_confidence)
""", stream)
    rows = res["F"].collect()
    assert rows and all(0.0 <= r.p <= 1.0 for r in rows)
    # alternating Login/Purchase: after warmup a Login always opens a run
    # and the PST has learned Purchase follows -> probabilities are high
    late = sorted(r.p for r in rows)[len(rows) // 2 :]
    assert min(late) > 0.5


def test_forecast_vpl_infers_first_cols_pruning(spark):
    """The compiler statically collects which run-start fields the
    post-forecast where/emit reference and passes them as `first_cols`
    (column pruning can't cross mapInPandas). An emit referencing `a.user`
    and a bare `user` must keep exactly that capture; the full-width
    capture (e.g. __first_props on the events table) must not ride along."""
    evts = "\n".join(
        ['Login { user: "u1", region: "eu" }', 'Purchase { user: "u1" }'] * 20
    )
    stream = Stream(load_evt(spark, evts), ts_col="ts", order_col="event_id")
    res = run_program("""
stream F = Login as a
    -> Purchase as b
    .partition_by(user)
    .forecast(confidence: 0.0, warmup: 10, mode: "fast")
    .emit(who: a.user, p: forecast_probability)
""", stream)
    rows = res["F"].collect()
    assert rows and all(r.who == "u1" for r in rows)
    # the emit projection is exactly (who, p) + the ride-along event time;
    # no un-referenced __first_* capture leaks through
    assert set(res["F"].columns) == {"who", "p", "ts"}


def test_forecast_vpl_first_cols_exact_set(spark, monkeypatch):
    """Pin the statically inferred capture set itself: `a.user` (first
    alias) and bare `region` (input field) must be collected; `props`
    and the rest of the row must not ship through the Arrow boundary."""
    import varpulis_spark.operators.forecast as fmod

    seen = {}
    real = fmod.forecast

    def spy(*a, **kw):
        seen["first_cols"] = kw.get("first_cols")
        return real(*a, **kw)

    monkeypatch.setattr(fmod, "forecast", spy)
    evts = "\n".join(
        ['Login { user: "u1", region: "eu" }', 'Purchase { user: "u1" }'] * 20
    )
    stream = Stream(load_evt(spark, evts), ts_col="ts", order_col="event_id")
    run_program("""
stream F = Login as a
    -> Purchase as b
    .partition_by(user)
    .forecast(confidence: 0.0, warmup: 10, mode: "fast")
    .where(region == "eu")
    .emit(who: a.user, p: forecast_probability)
""", stream)
    assert seen["first_cols"] == ["region", "user"]


# ---------------------------------------------------------------------------
# ADVICE r2 regressions: sub-second precision, process schema probe
# ---------------------------------------------------------------------------


def test_join_window_subsecond_precision(spark):
    """A 500ms join window must keep a pair 400ms apart straddling a whole
    second (a cast-to-seconds bound read it as 1s and dropped it) and drop
    a pair 700ms apart inside the same second (read as 0s and kept)."""
    res = run_inline(spark, """
stream A = Tick .where(side == "a") .emit(k: k, av: v)
stream B = Tick .where(side == "b") .emit(k: k, bv: v)

stream J = join(A, B)
    .on(A.k == B.k)
    .window(500ms)
    .select(k: A.k, av: A.av, bv: B.bv)
""", """
@900ms Tick { k: "x", side: "a", v: 1.0 }
@1300ms Tick { k: "x", side: "b", v: 2.0 }
@100ms Tick { k: "y", side: "a", v: 3.0 }
@800ms Tick { k: "y", side: "b", v: 4.0 }
""")
    rows = {(r.k, r.av, r.bv) for r in res["J"].collect()}
    assert ("x", 1.0, 2.0) in rows      # 400ms apart, crosses the boundary
    assert ("y", 3.0, 4.0) not in rows  # 700ms apart, same second


def test_process_probe_with_event_field_range(spark):
    """The .process schema probe runs with typed sentinels for event
    fields — a for-range bound taken from an event field must not crash
    compilation (the empty-scope probe crashed with int(None))."""
    res = run_inline(spark, """
fn explode_qty(q: int, v: float):
    for i in 0..q:
        emit Part(idx: i, share: v / q)

stream Parts = Order
    .process(explode_qty(qty, total))
""", """
Order { qty: 3, total: 30.0 }
Order { qty: 2, total: 10.0 }
""")
    rows = sorted((r.idx, r.share) for r in res["Parts"].collect())
    assert rows == [(0, 5.0), (0, 10.0), (1, 5.0), (1, 10.0), (2, 10.0)]
    assert isinstance(rows[0][0], int)  # inferred long, not string


# ---------------------------------------------------------------------------
# expression tail: lambdas/array methods, slices, maps, ranges, bitwise/**
# (ast.rs:473-610; evaluator.rs:1376-1545) — all lowered to Catalyst HOFs
# ---------------------------------------------------------------------------


def test_lambda_filter_map_in_emit(spark):
    res = run_inline(spark, """
stream T = Reading
    .emit(
        big: [1, 2, 3, 4, 5].filter(x => x > 2),
        doubled: [1, 2, 3].map(x => x * 2.0),
        nested: [[1, 2], [3]].flatten(),
        n: [9, 9, 9].len(),
        total: [1.5, 2.5].sum()
    )
""", """
Reading { v: 1.0 }
""")
    r = res["T"].collect()[0]
    assert r.big == [3, 4, 5]
    assert r.doubled == [2.0, 4.0, 6.0]
    assert r.nested == [1, 2, 3]
    assert r.n == 3 and r.total == 4.0


def test_lambda_references_event_field(spark):
    res = run_inline(spark, """
stream T = Reading
    .emit(above: [1, 2, 3, 4].filter(x => x > v), v: v)
""", """
Reading { v: 2 }
Reading { v: 3 }
""")
    rows = sorted((r.v, tuple(r.above)) for r in res["T"].collect())
    assert rows == [(2, (3, 4)), (3, (4,))]


def test_slice_index_range(spark):
    res = run_inline(spark, """
stream T = Reading
    .emit(
        first_two: [10, 20, 30][0:2],
        tail: [10, 20, 30][1:],
        third: [10, 20, 30][2],
        seq: 1..4,
        seq_inc: 1..=3
    )
""", """
Reading { v: 1.0 }
""")
    r = res["T"].collect()[0]
    assert r.first_two == [10, 20]
    assert r.tail == [20, 30]
    assert r.third == 30
    assert r.seq == [1, 2, 3] and r.seq_inc == [1, 2, 3]


def test_empty_range_is_empty(spark):
    """`a..a` (exclusive) is []: Spark's sequence() would default to step
    -1 and yield a descending 2-element array without the guard (ADVICE
    r3) — and `x in a..a` must be false, matching the Python evaluator."""
    res = run_inline(spark, """
stream T = Reading
    .emit(e: 5..5, rev_guard: 3..1, hit: 2 in 2..2, ok: 2 in 2..=2)
""", """
Reading { v: 1.0 }
""")
    r = res["T"].collect()[0]
    assert r.e == []
    assert r.rev_guard == []
    assert r.hit is False
    assert r.ok is True


def test_map_literal_and_lookup(spark):
    res = run_inline(spark, """
stream T = Reading
    .emit(grade: {low: "ok", high: "alert"}["high"],
          m: {a: 1, b: 2}["b"])
""", """
Reading { v: 1.0 }
""")
    r = res["T"].collect()[0]
    assert r.grade == "alert" and r.m == 2


def test_bitwise_power_xor(spark):
    res = run_inline(spark, """
stream T = Reading
    .emit(
        band: 12 & 10,
        bor: 12 | 3,
        bxor: 12 ^ 10,
        shl: 1 << 4,
        shr: 32 >> 2,
        pw: 2 ** 10,
        lx: (v > 0.0) xor (v > 5.0)
    )
""", """
Reading { v: 1.0 }
""")
    r = res["T"].collect()[0]
    assert (r.band, r.bor, r.bxor, r.shl, r.shr) == (8, 15, 6, 16, 8)
    assert r.pw == 1024.0
    assert r.lx is True


def test_sliding_pairs(spark):
    res = run_inline(spark, """
stream T = Reading
    .emit(deltas: [1.0, 4.0, 9.0].sliding_pairs().map((a, b) => b - a))
""", """
Reading { v: 1.0 }
""")
    assert res["T"].collect()[0].deltas == [3.0, 5.0]


def test_reference_trend_aggregation_program(spark):
    """The reference's apama-comparison 13_trend_aggregation.vpl runs
    UNMODIFIED: mode 1 (SASE+ detection) and mode 2/3 (Hamlet trend
    aggregation with shared Kleene sub-patterns)."""
    with open(
        "/root/reference/benchmarks/apama-comparison/varpulis/13_trend_aggregation.vpl"
    ) as f:
        src = f.read()
    evts = []
    import random

    rng = random.Random(5)
    for i in range(40):
        sym = rng.choice(["AAPL", "MSFT"])
        exch = "NYSE" if sym == "AAPL" else "NASDAQ"
        evts.append(
            f'@{i}s StockTick {{ symbol: "{sym}", exchange: "{exch}", '
            f"price: {50 + rng.randrange(50)}.0 }}"
        )
    stream = Stream(load_evt(spark, "\n".join(evts)), ts_col="ts", order_col="event_id")
    res = run_program(src, stream)
    assert set(res) == {"RisingPriceDetected", "RisingTrendCount", "TrendsBySymbol",
                        "TrendsByExchange"}
    # detection mode yields concrete matches with captured fields
    det = res["RisingPriceDetected"].collect()
    assert det and {"symbol", "start_price", "end_price"} <= set(det[0].asDict())
    # aggregation modes yield per-key trend counts > 0
    for name in ("TrendsBySymbol", "TrendsByExchange"):
        rows = res[name].collect()
        assert rows and all(r["count"] > 0 for r in rows)


def test_reference_forecast_fraud_program(spark):
    """examples/forecast_fraud.vpl (6 PST forecast patterns + merge fan-in,
    13 streams) compiles and runs UNMODIFIED: declared-but-unfed event
    fields surface as typed nulls, forecast emits resolve first-step alias
    fields / forecast_* outputs, merge unions the forecast streams.
    (Forecast rows are empty at this corpus size — the program's warmup
    is 500-1500 events by design.)"""
    import random

    with open("/root/reference/examples/forecast_fraud.vpl") as f:
        src = f.read()
    rng = random.Random(3)
    evts, i = [], 0
    for cyc in range(40):
        u, ip = f"u{cyc % 4}", f"ip{cyc % 3}"
        evts.append(f'@{i}s Login {{ user_id: "{u}", ip_address: "{ip}", country: "FR", device_fingerprint: "d1" }}'); i += 1
        evts.append(f'@{i}s PasswordChange {{ user_id: "{u}", method: "recovery" }}'); i += 1
        evts.append(f'@{i}s Transaction {{ user_id: "{u}", amount: {6000 + rng.randrange(9000)}.0, category: "wire_transfer", destination: "intl", merchant: "m1" }}'); i += 1
        if cyc % 3 == 0:
            evts.append(f'@{i}s LoginFailed {{ user_id: "{u}", ip_address: "{ip}", reason: "pw" }}'); i += 1
            evts.append(f'@{i}s CardAdded {{ user_id: "{u}", issuer_country: "FR", card_type: "visa" }}'); i += 1
            evts.append(f'@{i}s AccountInfoUpdate {{ user_id: "{u}", field_changed: "email" }}'); i += 1
    stream = Stream(load_evt(spark, "\n".join(evts)), ts_col="ts", order_col="event_id")
    res = run_program(src, stream)
    assert {"AccountTakeoverForecast", "CredentialStuffingForecast",
            "CardTestingForecast", "MoneyMuleForecast", "SimSwapForecast",
            "CrossBorderForecast", "AllFraudForecasts"} <= set(res)
    assert res["Logins"].count() == 40
    assert res["Transactions"].count() == 40
    for name in ("AccountTakeoverForecast", "AllFraudForecasts"):
        assert res[name].count() >= 0  # runs; empty below warmup


def test_forecast_emit_first_alias_fields(spark):
    """Forecast emits can project the first step's captured fields and
    forecast_time (expected completion delay)."""
    evts = "\n".join(
        f'@{i}s {"Login" if i % 2 == 0 else "Purchase"} {{ user: "u1", origin: "web{i % 2}" }}'
        for i in range(40)
    )
    stream = Stream(load_evt(spark, evts), ts_col="ts", order_col="event_id")
    res = run_program("""
stream F = Login as a
    -> Purchase as b
    .partition_by(user)
    .forecast(confidence: 0.0, warmup: 10, mode: "fast")
    .emit(user: user, origin: a.origin, p: forecast_probability,
          eta_us: forecast_time, missing: b.origin)
""", stream)
    rows = res["F"].collect()
    assert rows
    for r in rows:
        assert r.origin == "web0"      # first-step capture (Login events)
        assert r.eta_us is not None and r.eta_us >= 0
        assert r.missing is None       # later alias unbound at forecast time


def test_all_reference_examples_run(spark):
    """EVERY program in the reference's examples/ directory compiles and
    executes unmodified (13 programs, ~150 streams): enrichment, PST
    forecasting, Hamlet trend aggregation, SASE chains with mid-chain
    per-edge within, window-lambda patterns, let-bound functions,
    multi-upstream patterns, dynamic-null field reads."""
    import glob

    from varpulis_spark.enrichment import StaticProvider

    empty = spark.createDataFrame(
        [], "event_id long, ts timestamp, event_type string, value double"
    )
    stream = Stream(empty, ts_col="ts", order_col="event_id")
    prov = StaticProvider({})
    tables = {
        n: prov
        for n in ["WeatherAPI", "ProductDB", "UserCache", "ThreatIntel",
                  "GeoIP", "AssetDB", "DeviceRegistry"]
    }
    failures = []
    for p in sorted(glob.glob("/root/reference/examples/*.vpl")):
        try:
            res = run_program(open(p).read(), stream, tables=tables)
            for df in res.values():
                df.count()
        except Exception as e:  # noqa: BLE001
            failures.append(f"{p.split('/')[-1]}: {e}")
    assert not failures, failures


def test_mid_chain_within_edge_gap(spark):
    """`A -> B .within(5m) -> C .within(5m)`: each edge is bounded
    separately (CompressorShortCycle, hvac_demo.vpl) — a pair exceeding
    its edge gap breaks the match even if the whole span would fit a
    global within."""
    prog = """
stream ShortCycle = Status where mode == "on" as start_run
    -> Status where unit == start_run.unit and mode == "off" as stop
    .within(5m)
    -> Status where unit == start_run.unit and mode == "on" as restart
    .within(5m)
    .emit(unit: start_run.unit, t0: start_run.ts)
"""
    # unit u1: on -> off(+3m) -> on(+3m): both edges within 5m -> match
    # unit u2: on -> off(+7m) -> on(+1m): first edge too wide -> no match
    # unit u3: on -> off(+2m) -> on(+8m): second edge too wide -> no match
    evts = """
@0s Status { unit: "u1", mode: "on" }
@180s Status { unit: "u1", mode: "off" }
@360s Status { unit: "u1", mode: "on" }
@0s Status { unit: "u2", mode: "on" }
@420s Status { unit: "u2", mode: "off" }
@480s Status { unit: "u2", mode: "on" }
@0s Status { unit: "u3", mode: "on" }
@120s Status { unit: "u3", mode: "off" }
@600s Status { unit: "u3", mode: "on" }
"""
    stream = Stream(load_evt(spark, evts), ts_col="ts", order_col="event_id")
    res = run_program(prog, stream)
    units = {r.unit for r in res["ShortCycle"].collect()}
    assert units == {"u1"}


def test_watermark_windowed_scenario(spark):
    """watermark_windowed.vpl + .evt (watermark_tests.rs:80-108): 3 events
    in the first 5s tumbling window, the @8s event advances the watermark
    past the boundary and lands in the second window."""
    res = run_scenario(spark, "watermark_windowed")
    counts = sorted(r.event_count for r in res["Windowed"].collect())
    assert counts == [1, 3]


def test_checkpoint_session_window_scenario(spark):
    """checkpoint_session_window.vpl + phase1/phase2
    (checkpoint_tests.rs:365-425): the session restored across the restart
    closes on the 6s-gap event with the 3 pre-restart events intact
    (n=3, sum=300); the closing event opens its own session. Replay
    model: phases re-run together — state re-derivation IS the
    checkpoint-restore contract here."""
    with open(f"{SCEN}/checkpoint_session_window.vpl") as f:
        src = f.read()
    p1 = open(f"{SCEN}/checkpoint_session_window_phase1.evt").read()
    p2 = open(f"{SCEN}/checkpoint_session_window_phase2.evt").read()
    s12 = Stream(load_evt(spark, p1 + "\n" + p2), ts_col="ts", order_col="event_id")
    rows = sorted(
        ((r.n, r.sum) for r in run_program(src, s12)["SessionAgg"].collect())
    )
    assert rows[-1] == (3, 300.0)  # restored session: 3 events, sum 300
    assert rows[0][0] == 1  # the gap event opened its own session


def test_top_level_let_assignment_semantics(spark):
    """Top-level `let` is immutable, `:=` reassigns mutable vars or
    implicitly creates one, and assigning an immutable is a LOAD error
    (variable_tests.rs:28,63,102,120)."""
    res = run_inline(spark, """
var counter: int = 0
counter := 1
counter := 2
counter := 3
implicit := 42
let fixed = 7

stream Out = Reading
    .emit(c: counter, i: implicit, f: fixed)
""", """
Reading { value: 1.0 }
""")
    (r,) = res["Out"].collect()
    assert (r.c, r.i, r.f) == (3, 42, 7)

    with pytest.raises(ValueError, match="immutable"):
        run_inline(spark, """
let fixed = 7
fixed := 100

stream Out = Reading
    .emit(f: fixed)
""", "Reading { value: 1.0 }\n")


def test_checkpoint_passthrough_scenario(spark):
    """checkpoint_passthrough.vpl (checkpoint_tests.rs:116-136): 5 events
    in, 5 passthrough outputs — the metrics-counter fixture."""
    res = run_scenario(spark, "checkpoint_passthrough")
    rows = res["PassThrough"].collect()
    assert len(rows) == 5
    assert sorted(r.value for r in rows) == [1, 2, 3, 4, 5]




def test_cross_context_emit_routing_is_noop(spark):
    """`emit(context: analytics, ...)` (docs/language/syntax.md
    "Cross-Context Emit") routes output to another execution context in
    the reference; contexts are Spark partitions here, so the key is
    accepted and dropped — unless a real column shadows the name."""
    res = run_inline(spark, """
context ingestion
context analytics

stream Processed = RawEvents
    .context(ingestion)
    .where(priority > 5)
    .emit(context: analytics, data: data)
""", """
RawEvents { priority: 7, data: "x" }
RawEvents { priority: 1, data: "y" }
""")
    rows = res["Processed"].collect()
    assert len(rows) == 1 and rows[0].data == "x"
    assert "context" not in res["Processed"].columns

    # a real column named `context` still projects normally
    res = run_inline(spark, """
stream Out = Reading
    .emit(context: context, v: value)
""", """
Reading { context: "prod", value: 1.0 }
""")
    (r,) = res["Out"].collect()
    assert r.context == "prod" and r.v == 1.0


def test_cross_context_emit_on_pattern_stream(spark):
    """The routing key is also dropped on pattern-stream emits."""
    res = run_inline(spark, """
context analytics

stream Funnel = Login as a
    -> Purchase where user_id == a.user_id as b
    .emit(context: analytics, user: a.user_id)
""", """
Login { user_id: "u1" }
Purchase { user_id: "u1" }
""")
    rows = res["Funnel"].collect()
    assert len(rows) == 1 and rows[0].user == "u1"
    assert "context" not in res["Funnel"].columns


def test_parser_truncation_and_garbage_fail_cleanly():
    """Malformed programs must raise SyntaxError/ValueError, never
    IndexError or a hang: truncated trailing `context` decl (next() past
    eof) and unbalanced parens inside a skipped decl (eof spin) were
    found by mutation fuzzing; a seeded 500-mutation sweep keeps the
    property pinned."""
    import random

    for src in [
        "context",                    # decl cut at eof
        "connector X = kafka (a: 1",  # unbalanced connector config
        "stream S = ",                # stream cut mid-decl
        "fn f(",                      # fn cut mid-params
    ]:
        with pytest.raises((SyntaxError, ValueError)):
            parse_full(src)
    # an unbalanced SKIPPED decl at eof parses to an empty program
    # (contexts are skipped decls) rather than crashing
    assert parse_full("context c (").streams == []

    base = open(
        "/root/reference/examples/mandelbrot/mandelbrot.vpl"
    ).read()
    rng = random.Random(42)
    toks = list("():=.,{}[]<>+-*/%\n\t ") + [
        "fn", "stream", "emit", "while", "if", "return", "var", "let",
        "->", "..", ":=",
    ]
    for _ in range(500):
        src = base
        mode = rng.randrange(4)
        if mode == 0:
            p = rng.randrange(len(src))
            src = src[:p] + rng.choice(toks) + src[p:]
        elif mode == 1:
            a = rng.randrange(len(src))
            src = src[:a] + src[min(len(src), a + rng.randrange(1, 60)):]
        elif mode == 2:
            lines = src.split("\n")
            j = rng.randrange(len(lines))
            lines[j] = " " * rng.randrange(12) + lines[j].lstrip()
            src = "\n".join(lines)
        else:
            src = src[: rng.randrange(1, len(src))]
        try:
            parse_full(src)
        except (SyntaxError, ValueError):
            pass  # clean parse failures are the property
