"""Port of five reference runtime test suites (crates/varpulis-runtime/
tests/{join,partition,watermark,variable,nested_query}_tests.rs): program
texts verbatim, assertions mirrored and sharpened to exact values where
replay semantics make the answer deterministic (the reference often only
asserts events_processed or count > 0).

The r8 port caught three real bugs on first contact:
- `emit(event_type: "X", ...)` crashed (Python kwarg collision) instead
  of lowering to a data column like the reference (pipeline.rs:528);
- a join-source resolver stayed live past `.select`, mis-qualifying the
  select's output names in the following `.emit`;
- joining AGGREGATED streams failed outright: count-window aggregate
  output has no event-time column but the join added a ts band.
"""

import pytest

from varpulis_spark.sources.event_file import load_evt
from varpulis_spark.stream import Stream
from varpulis_spark.vpl.compiler import run_program
from varpulis_spark.vpl.parser import parse_full

SCENARIOS = "/root/reference/tests/scenarios"


@pytest.fixture(scope="module")
def spark():
    from varpulis_spark.engine import get_spark

    return get_spark("runtime-port-tests")


def run(spark, program: str, events: str) -> dict:
    res = run_program(
        program, Stream(load_evt(spark, events), ts_col="ts", order_col="event_id")
    )
    return {k: [r.asDict() for r in df.collect()] for k, df in res.items()}


# -- join_tests.rs ------------------------------------------------------------


JOIN_MACD = """
event EMA12Event:
    symbol: str
    ema_12: float

event EMA26Event:
    symbol: str
    ema_26: float

stream EMA12 = EMA12Event
stream EMA26 = EMA26Event

stream MACD = join(EMA12, EMA26)
    .on(EMA12.symbol == EMA26.symbol)
    .window(1m)
    .select(
        symbol: EMA12.symbol,
        macd_line: EMA12.ema_12 - EMA26.ema_26
    )
    .emit(
        event_type: "MACDResult",
        symbol: symbol,
        macd_line: macd_line
    )
"""


def test_join_two_streams_correlates_by_key(spark):
    """join_tests.rs:17 — EMA12 − EMA26 = 45000 − 44500 = 500."""
    out = run(spark, JOIN_MACD, """
EMA12Event { symbol: "BTC/USD", ema_12: 45000.0 }
EMA26Event { symbol: "BTC/USD", ema_26: 44500.0 }
""")
    (row,) = out["MACD"]
    assert row["symbol"] == "BTC/USD"
    assert abs(row["macd_line"] - 500.0) < 0.001


def test_join_buffer_window_expiration(spark):
    """join_tests.rs:101 — both events inside the 100ms window join
    (total 30); a B event 150ms past A falls outside and does not."""
    prog = """
event StreamA:
    key: str
    value: float

event StreamB:
    key: str
    value: float

stream A = StreamA
stream B = StreamB

stream Joined = join(A, B)
    .on(A.key == B.key)
    .window(100ms)
    .select(
        key: A.key,
        total: A.value + B.value
    )
    .emit(
        event_type: "JoinedResult",
        key: key,
        total: total
    )
"""
    out = run(spark, prog, """
@0ms StreamA { key: "test", value: 10.0 }
@50ms StreamB { key: "test", value: 20.0 }
""")
    (row,) = out["Joined"]
    assert abs(row["total"] - 30.0) < 0.001

    # sharpened: outside the window -> no correlation
    out = run(spark, prog, """
@0ms StreamA { key: "test", value: 10.0 }
@150ms StreamB { key: "test", value: 20.0 }
""")
    assert out["Joined"] == []


def test_join_multi_stream_all_fields_accessible(spark):
    """join_tests.rs:169 — fields from both joined streams project."""
    out = run(spark, """
event PriceEvent:
    symbol: str
    price: float

event VolumeEvent:
    symbol: str
    volume: int

stream Prices = PriceEvent
stream Volumes = VolumeEvent

stream Combined = join(Prices, Volumes)
    .on(Prices.symbol == Volumes.symbol)
    .window(1m)
    .select(
        symbol: Prices.symbol,
        price: Prices.price,
        volume: Volumes.volume
    )
    .emit(
        event_type: "CombinedResult",
        symbol: symbol,
        price: price,
        volume: volume
    )
""", """
PriceEvent { symbol: "ETH/USD", price: 3000.0 }
VolumeEvent { symbol: "ETH/USD", volume: 1000 }
""")
    (row,) = out["Combined"]
    assert row["symbol"] == "ETH/USD"
    assert abs(row["price"] - 3000.0) < 0.001
    assert row["volume"] == 1000


def test_join_no_match_returns_empty(spark):
    """join_tests.rs:244 — mismatched keys produce no output."""
    out = run(spark, """
event EventA:
    key: str
    value: float

event EventB:
    key: str
    value: float

stream A = EventA
stream B = EventB

stream Joined = join(A, B)
    .on(A.key == B.key)
    .window(1m)
    .select(key: A.key)
    .emit(event_type: "JoinedResult", key: key)
""", """
EventA { key: "foo", value: 10.0 }
EventB { key: "bar", value: 20.0 }
""")
    assert out["Joined"] == []


def test_aggregate_comparison_join(spark):
    """join_tests.rs:293 (STREAM-03) — joining two count-window aggregated
    streams. 15 events: FastAvg (window 3) emits 5 rows, SlowAvg (window
    5) emits 3 → 15 combined pairs, every one carrying both averages."""
    out = run(spark, """
event Sensor:
    sensor_id: str
    value: float

stream FastAvg = Sensor
    .partition_by(sensor_id)
    .window(3)
    .aggregate(
        sensor_id: last(sensor_id),
        fast_avg: avg(value)
    )

stream SlowAvg = Sensor
    .partition_by(sensor_id)
    .window(5)
    .aggregate(
        sensor_id: last(sensor_id),
        slow_avg: avg(value)
    )

stream Combined = join(FastAvg, SlowAvg)
    .on(FastAvg.sensor_id == SlowAvg.sensor_id)
    .window(1m)
    .select(
        sensor_id: FastAvg.sensor_id,
        fast: FastAvg.fast_avg,
        slow: SlowAvg.slow_avg
    )
    .emit(
        event_type: "Combined",
        sensor_id: sensor_id,
        fast_avg: fast,
        slow_avg: slow
    )
""", "\n".join(
        f'Sensor {{ sensor_id: "temp_1", value: {100.0 + i * 5.0} }}'
        for i in range(15)
    ))
    rows = out["Combined"]
    assert len(rows) == 15  # 5 fast windows x 3 slow windows
    assert all(
        r["sensor_id"] == "temp_1" and "fast_avg" in r and "slow_avg" in r
        for r in rows
    )
    # window averages are deterministic: fast windows avg 105..165 step 15
    assert sorted({r["fast_avg"] for r in rows}) == [105.0, 120.0, 135.0, 150.0, 165.0]
    assert sorted({r["slow_avg"] for r in rows}) == [110.0, 135.0, 160.0]


def test_macd_example_produces_signals(spark):
    """join_tests.rs:382 — the financial_markets.vpl MACD shape end to
    end: 30 closes, EMA windows 12 and 26 → MACD rows exist with both
    fields, and every macd_line is finite."""
    out = run(spark, """
event OHLCV:
    symbol: str
    close: float
    timeframe: str

stream EMA12 = OHLCV
    .where(timeframe == "1m")
    .partition_by(symbol)
    .window(12)
    .aggregate(
        symbol: last(symbol),
        ema_12: ema(close, 12)
    )

stream EMA26 = OHLCV
    .where(timeframe == "1m")
    .partition_by(symbol)
    .window(26)
    .aggregate(
        symbol: last(symbol),
        ema_26: ema(close, 26)
    )

stream MACD = join(EMA12, EMA26)
    .on(EMA12.symbol == EMA26.symbol)
    .window(1m)
    .select(
        symbol: EMA12.symbol,
        macd_line: EMA12.ema_12 - EMA26.ema_26
    )
    .emit(
        event_type: "MACD",
        symbol: symbol,
        macd_line: macd_line
    )
""", "\n".join(
        f'OHLCV {{ symbol: "BTC/USD", close: {45000.0 + i * 10.0}, timeframe: "1m" }}'
        for i in range(30)
    ))
    rows = out["MACD"]
    # 2 full EMA12 windows (24 events) x 1 full EMA26 window
    assert len(rows) == 2
    assert all(r["symbol"] == "BTC/USD" for r in rows)
    assert all(isinstance(r["macd_line"], float) for r in rows)


# -- partition_tests.rs -------------------------------------------------------


def test_partition_by_tumbling_window_separate_state(spark):
    """partition_tests.rs:9 — 5m tumbling windows keep per-symbol state:
    BTC and ETH averages never bleed into each other."""
    out = run(spark, """
event PriceEvent:
    symbol: str
    price: float

stream Prices = PriceEvent
    .partition_by(symbol)
    .window(5m)
    .aggregate(
        symbol: last(symbol),
        avg_price: avg(price),
        count: count()
    )
    .emit(
        event_type: "PriceAverage",
        symbol: symbol,
        avg_price: avg_price,
        count: count
    )
""", "\n".join(
        [f'@{i * 10}s PriceEvent {{ symbol: "BTC", price: {45000.0 + i * 100.0} }}'
         for i in range(3)]
        + [f'@{i * 10}s PriceEvent {{ symbol: "ETH", price: {3000.0 + i * 50.0} }}'
           for i in range(3)]
        + ['@6m PriceEvent { symbol: "BTC", price: 46000.0 }',
           '@6m PriceEvent { symbol: "ETH", price: 3200.0 }']
    ))
    by_sym = {}
    for r in out["Prices"]:
        by_sym.setdefault(r["symbol"], []).append(r)
    # first 5m window per symbol: exact independent averages
    btc = min(by_sym["BTC"], key=lambda r: r["ts"])
    eth = min(by_sym["ETH"], key=lambda r: r["ts"])
    assert btc["count"] == 3 and abs(btc["avg_price"] - 45100.0) < 0.01
    assert eth["count"] == 3 and abs(eth["avg_price"] - 3050.0) < 0.01


def test_partition_by_sliding_window_separate_state(spark):
    """partition_tests.rs:104 — 10m/2m sliding windows per sensor: each
    key's averages stay inside its own value band."""
    out = run(spark, """
event SensorReading:
    sensor_id: str
    value: float

stream Sensors = SensorReading
    .partition_by(sensor_id)
    .window(10m, sliding: 2m)
    .aggregate(
        sensor_id: last(sensor_id),
        avg_value: avg(value)
    )
    .emit(
        event_type: "SensorAverage",
        sensor_id: sensor_id,
        avg_value: avg_value
    )
""", "\n".join(
        f'@{i * 3}m SensorReading {{ sensor_id: "sensor_{s}", value: {base + i}.0 }}'
        for s, base in (("A", 20), ("B", 50)) for i in range(5)
    ))
    rows = out["Sensors"]
    a = [r["avg_value"] for r in rows if r["sensor_id"] == "sensor_A"]
    b = [r["avg_value"] for r in rows if r["sensor_id"] == "sensor_B"]
    assert len(a) > 0 and len(b) > 0
    assert all(20.0 <= v <= 24.0 for v in a)
    assert all(50.0 <= v <= 54.0 for v in b)


def test_partition_aggregate_independent_per_key(spark):
    """partition_tests.rs:173 — count-window(3) totals per customer:
    customer_A = 600, customer_B = 150, exactly one window each."""
    out = run(spark, """
event OrderEvent:
    customer_id: str
    amount: float

stream OrderTotals = OrderEvent
    .partition_by(customer_id)
    .window(3)
    .aggregate(
        customer_id: last(customer_id),
        total: sum(amount),
        order_count: count()
    )
    .emit(
        event_type: "CustomerTotal",
        customer_id: customer_id,
        total: total,
        order_count: order_count
    )
""", "\n".join(
        [f'OrderEvent {{ customer_id: "customer_A", amount: {a} }}'
         for a in (100.0, 200.0, 300.0)]
        + [f'OrderEvent {{ customer_id: "customer_B", amount: {a} }}'
           for a in (50.0, 75.0, 25.0)]
    ))
    got = {r["customer_id"]: (r["total"], r["order_count"]) for r in out["OrderTotals"]}
    assert abs(got["customer_A"][0] - 600.0) < 0.01 and got["customer_A"][1] == 3
    assert abs(got["customer_B"][0] - 150.0) < 0.01 and got["customer_B"][1] == 3


def test_macd_signal_partitioned_by_symbol(spark):
    """partition_tests.rs:248 — ema(close, 9) over count-window(9) per
    symbol: both symbols emit signals independently."""
    out = run(spark, """
event OHLCV:
    symbol: str
    close: float
    timeframe: str

stream MACDSignal = OHLCV
    .where(timeframe == "1m")
    .partition_by(symbol)
    .window(9)
    .aggregate(
        symbol: last(symbol),
        signal_line: ema(close, 9)
    )
    .emit(
        event_type: "MACDSignal",
        symbol: symbol,
        signal_line: signal_line
    )
""", "\n".join(
        f'OHLCV {{ symbol: "{sym}", close: {base + i * step}, timeframe: "1m" }}'
        for sym, base, step in (("BTC/USD", 45000.0, 100.0), ("ETH/USD", 3000.0, 50.0))
        for i in range(10)
    ))
    rows = out["MACDSignal"]
    btc = [r for r in rows if r["symbol"] == "BTC/USD"]
    eth = [r for r in rows if r["symbol"] == "ETH/USD"]
    assert len(btc) > 0, "Should have BTC signals"
    assert len(eth) > 0, "Should have ETH signals"
    # partition isolation: signal lines live in their symbol's price band
    assert all(44000 < r["signal_line"] < 47000 for r in btc)
    assert all(2900 < r["signal_line"] < 3600 for r in eth)


# -- watermark_tests.rs -------------------------------------------------------


def test_watermark_syntax_parses():
    """watermark_tests.rs:32 — watermark_windowed.vpl parses."""
    with open(f"{SCENARIOS}/watermark_windowed.vpl") as f:
        parse_full(f.read())


def test_allowed_lateness_syntax_parses():
    """watermark_tests.rs:45 + :58 — watermark_lateness.vpl (combined
    .watermark + .allowed_lateness) parses."""
    with open(f"{SCENARIOS}/watermark_lateness.vpl") as f:
        parse_full(f.read())


def test_watermark_enables_tracking(spark):
    """watermark_tests.rs:65 — watermark_basic.vpl loads and processes."""
    with open(f"{SCENARIOS}/watermark_basic.vpl") as f:
        prog = f.read()
    out = run(spark, prog, "SensorEvent { value: 42 }\n")
    assert out  # loaded + processed without error


def test_watermark_advance_triggers_window(spark):
    """watermark_tests.rs:82 — events inside the first window plus one
    past the boundary: the closed window's aggregate is emitted."""
    with open(f"{SCENARIOS}/watermark_windowed.vpl") as f:
        prog = f.read()
    out = run(spark, prog, "\n".join(
        [f"@{i}s SensorEvent {{ value: {i} }}" for i in range(3)]
        + ["@8s SensorEvent { value: 99 }"]
    ))
    rows = [r for rows in out.values() for r in rows]
    assert len(rows) > 0  # windows closed and emitted, no crash


def test_per_source_watermark_with_engine(spark):
    """watermark_tests.rs:112 — checkpoint_passthrough.vpl under
    out-of-order arrivals processes all 5 events."""
    with open(f"{SCENARIOS}/checkpoint_passthrough.vpl") as f:
        prog = f.read()
    out = run(spark, prog, "\n".join(
        f"@{i}s TestEvent {{ value: {i} }}" for i in range(5)
    ))
    (rows,) = [v for k, v in out.items()]
    assert len(rows) == 5


# -- variable_tests.rs --------------------------------------------------------


def _probe_vars(spark, decls: str, probes: dict[str, str]) -> dict:
    """Run a program of variable declarations and read the variables back
    through an emit projection (the engine.get_variable analog)."""
    emit_args = ", ".join(f"{k}: {expr}" for k, expr in probes.items())
    out = run(spark, f"""{decls}

stream Out = Probe
    .emit({emit_args})
""", "Probe { x: 1 }\n")
    (row,) = out["Out"]
    return row


def test_var_declaration(spark):
    """variable_tests.rs:10."""
    row = _probe_vars(spark, "var threshold: float = 10.0", {"t": "threshold"})
    assert row["t"] == 10.0


def test_let_declaration(spark):
    """variable_tests.rs:28."""
    row = _probe_vars(spark, "let max_count: int = 100", {"m": "max_count"})
    assert row["m"] == 100


def test_assignment_to_mutable_var(spark):
    """variable_tests.rs:45."""
    row = _probe_vars(spark, "var counter: int = 0\ncounter := 5", {"c": "counter"})
    assert row["c"] == 5


def test_assignment_to_immutable_var_fails(spark):
    """variable_tests.rs:63 — load-time error mentioning 'immutable'."""
    with pytest.raises(ValueError, match="immutable"):
        run(spark, """
let constant: int = 42
constant := 100

stream Out = Probe
    .emit(c: constant)
""", "Probe { x: 1 }\n")


def test_assignment_with_expression(spark):
    """variable_tests.rs:83 — base := base * multiplier + 5 = 35."""
    row = _probe_vars(
        spark,
        "var base: int = 10\nvar multiplier: int = 3\nbase := base * multiplier + 5",
        {"b": "base"},
    )
    assert row["b"] == 35


def test_implicit_mutable_on_first_assignment(spark):
    """variable_tests.rs:102 — := on an unknown name creates it."""
    row = _probe_vars(spark, "new_var := 42", {"n": "new_var"})
    assert row["n"] == 42


def test_multiple_assignments(spark):
    """variable_tests.rs:120 — last assignment wins."""
    row = _probe_vars(
        spark, "var counter: int = 0\ncounter := 1\ncounter := 2\ncounter := 3",
        {"c": "counter"},
    )
    assert row["c"] == 3


def test_var_with_float_expression(spark):
    """variable_tests.rs:140 — area = pi * r * r ≈ 78.54."""
    row = _probe_vars(
        spark,
        "var pi: float = 3.14159\nvar radius: float = 5.0\n"
        "var area: float = pi * radius * radius",
        {"a": "area"},
    )
    assert abs(row["a"] - 78.53975) < 0.001


def test_var_with_string(spark):
    """variable_tests.rs:167."""
    row = _probe_vars(spark, 'var message: str = "hello"', {"m": "message"})
    assert row["m"] == "hello"


def test_var_with_bool(spark):
    """variable_tests.rs:184."""
    row = _probe_vars(spark, "var enabled: bool = true\nenabled := false",
                      {"e": "enabled"})
    assert row["e"] is False


def test_variables_api(spark):
    """variable_tests.rs:202 — all three variables visible."""
    row = _probe_vars(spark, "var a: int = 1\nvar b: int = 2\nlet c: int = 3",
                      {"a": "a", "b": "b", "c": "c"})
    assert (row["a"], row["b"], row["c"]) == (1, 2, 3)


# -- nested_query_tests.rs ----------------------------------------------------


def test_basic_stream_reference(spark):
    """nested_query_tests.rs:22 — stream B references stream A; the
    non-IBM tick is filtered."""
    out = run(spark, """
stream Ticks = Tick

stream FilteredTicks = Ticks
    .where(symbol == "IBM")
    .emit(symbol: symbol, price: price)
""", """
Tick { symbol: "IBM", price: 150.0 }
Tick { symbol: "AAPL", price: 175.0 }
""")
    assert len(out["Ticks"]) == 2
    (row,) = out["FilteredTicks"]
    assert row["symbol"] == "IBM" and row["price"] == 150.0


def test_three_stage_pipeline(spark):
    """nested_query_tests.rs:71 — Raw → Filtered → window(3) aggregate:
    one full window, count 3, avg 160."""
    out = run(spark, """
stream RawTicks = Tick

stream FilteredTicks = RawTicks
    .where(price > 100.0)

stream AggregatedTicks = FilteredTicks
    .window(3)
    .aggregate(count: count(), avg_price: avg(price))
""", "\n".join(
        f'Tick {{ symbol: "IBM", price: {p} }}' for p in (150.0, 160.0, 170.0)
    ))
    (row,) = out["AggregatedTicks"]
    assert row["count"] == 3 and abs(row["avg_price"] - 160.0) < 0.01


def test_nested_with_output_event(spark):
    """nested_query_tests.rs:107 — nested stream emits an alert with the
    literal and source fields."""
    out = run(spark, """
stream Ticks = Tick

stream HighPriceTicks = Ticks
    .where(price > 200.0)
    .emit(
        alert_type: "HighPrice",
        severity: "warning",
        message: "High price detected",
        symbol: symbol,
        price: price
    )
""", 'Tick { symbol: "NVDA", price: 250.0 }\n')
    (row,) = out["HighPriceTicks"]
    assert row["alert_type"] == "HighPrice" and row["severity"] == "warning"
    assert row["symbol"] == "NVDA" and row["price"] == 250.0


def test_parallel_derived_streams(spark):
    """nested_query_tests.rs:146 — two filters off one source."""
    out = run(spark, """
stream Ticks = Tick

stream HighTicks = Ticks
    .where(price > 150.0)

stream LowTicks = Ticks
    .where(price < 50.0)
""", "\n".join(f"Tick {{ price: {p} }}" for p in (25.0, 100.0, 200.0)))
    assert [r["price"] for r in out["HighTicks"]] == [200.0]
    assert [r["price"] for r in out["LowTicks"]] == [25.0]


def test_diamond_dependency(spark):
    """nested_query_tests.rs:175 — two branches from one source; `type`
    as a payload field name."""
    out = run(spark, """
stream Source = Event

stream Branch1 = Source
    .where(type == "a")

stream Branch2 = Source
    .where(type == "b")
""", """
Event { type: "a" }
Event { type: "b" }
""")
    assert len(out["Source"]) == 2
    assert [r["type"] for r in out["Branch1"]] == ["a"]
    assert [r["type"] for r in out["Branch2"]] == ["b"]


def test_deep_nesting(spark):
    """nested_query_tests.rs:211 — 5-stage pipeline, level 5 passes all."""
    out = run(spark, """
stream L1 = Event
stream L2 = L1.where(level >= 1)
stream L3 = L2.where(level >= 2)
stream L4 = L3.where(level >= 3)
stream L5 = L4.where(level >= 4)
""", "Event { level: 5 }\n")
    assert len(out["L5"]) == 1 and out["L5"][0]["level"] == 5


def test_nested_with_aggregation_window(spark):
    """nested_query_tests.rs:237 — window(5) over filtered big trades:
    amounts 2100..2500 → total 11500, avg 2300, count 5."""
    out = run(spark, """
stream Trades = Trade

stream BigTrades = Trades
    .where(amount > 1000.0)

stream BigTradeStats = BigTrades
    .window(5)
    .aggregate(
        total: sum(amount),
        avg_amount: avg(amount),
        count: count()
    )
""", "\n".join(
        f'Trade {{ amount: {2000.0 + i * 100.0}, symbol: "BTC" }}'
        for i in range(1, 6)
    ))
    (row,) = out["BigTradeStats"]
    assert abs(row["total"] - 11500.0) < 0.01
    assert abs(row["avg_amount"] - 2300.0) < 0.01
    assert row["count"] == 5


def test_nested_with_partition(spark):
    """nested_query_tests.rs:277 — partitioned count-window(10) with only
    2/1 events per key: no full window closes (count windows emit on
    completion, window.rs), while the upstream filter passes all 3."""
    out = run(spark, """
stream Orders = Order

stream HighValueOrders = Orders
    .where(total > 500.0)

stream OrdersByCustomer = HighValueOrders
    .partition_by(customer_id)
    .window(10)
    .aggregate(order_count: count(), total_spent: sum(total))
""", """
Order { customer_id: "C1", total: 600.0 }
Order { customer_id: "C1", total: 700.0 }
Order { customer_id: "C2", total: 550.0 }
""")
    assert len(out["HighValueOrders"]) == 3
    assert out["OrdersByCustomer"] == []


def test_stream_from_event_type_vs_stream(spark):
    """nested_query_tests.rs:314 — event-type source vs stream source."""
    out = run(spark, """
stream DirectStream = SensorReading

stream DerivedStream = DirectStream
    .where(value > 0.0)
""", 'SensorReading { sensor_id: "S1", value: 42.0 }\n')
    assert len(out["DirectStream"]) == 1
    assert len(out["DerivedStream"]) == 1


def test_chained_transforms(spark):
    """nested_query_tests.rs:349 — where → select with an expression:
    quality_score = 0.95 * 100 = 95."""
    out = run(spark, """
stream Raw = Measurement

stream Filtered = Raw
    .where(quality > 0.5)

stream Enriched = Filtered
    .select(
        sensor: sensor_id,
        reading: value,
        quality_score: quality * 100.0
    )
""", 'Measurement { sensor_id: "TEMP01", value: 23.5, quality: 0.95 }\n')
    (row,) = out["Enriched"]
    assert row["sensor"] == "TEMP01" and row["reading"] == 23.5
    assert abs(row["quality_score"] - 95.0) < 0.001


# -- timer_tests.rs -----------------------------------------------------------


def test_timer_stream_parsing_and_registration(spark):
    """timer_tests.rs:11 — timer(1s) parses, registers, and ticks carry
    the Timer_<stream> event type; replay synthesizes ticks over the
    driving stream's event-time span."""
    out = run(spark, """
stream heartbeat = timer(1s)
    .emit(type: "heartbeat", etype: event_type)
""", "\n".join(f"@{i}s Dummy {{ x: 1 }}" for i in range(5)))
    rows = out["heartbeat"]
    assert len(rows) == 5  # one tick per second over the 0..4s span
    assert all(r["type"] == "heartbeat" for r in rows)
    assert all(r["etype"] == "Timer_heartbeat" for r in rows)


def test_timer_with_initial_delay(spark):
    """timer_tests.rs:34 — timer(5s, initial_delay: 2s): first tick at
    +2s, then every 5s."""
    out = run(spark, """
stream delayed = timer(5s, initial_delay: 2s)
    .emit(type: "delayed")
""", "\n".join(f"@{i}s Dummy {{ x: 1 }}" for i in range(13)))
    rows = sorted(out["delayed"], key=lambda r: r["ts"])
    # span 0..12s, delay 2s, interval 5s -> ticks at 2, 7, 12
    assert [int(r["ts"].timestamp() % 100) for r in rows] == [2, 7, 12]


# -- context_tests.rs (contexts = Spark partitions here; .context() is a
#    routing no-op, so these pin that programs behave IDENTICALLY with
#    and without context declarations) -----------------------------------------


def test_single_context_basic(spark):
    """context_tests.rs:93 — context + .context() routing, exact output."""
    out = run(spark, """
context ingest

stream HighTemp = SensorReading
    .context(ingest)
    .where(temperature > 100.0)
    .emit(sensor: sensor_id, temp: temperature)
""", 'SensorReading { sensor_id: "S1", temperature: 105.5 }\n'
     'SensorReading { sensor_id: "S2", temperature: 95.0 }\n'
     'SensorReading { sensor_id: "S3", temperature: 110.0 }')
    rows = sorted(out["HighTemp"], key=lambda r: r["sensor"])
    assert [(r["sensor"], r["temp"]) for r in rows] == [("S1", 105.5), ("S3", 110.0)]


def test_two_context_pipeline(spark):
    """context_tests.rs:131 — stream chaining across contexts."""
    out = run(spark, """
context ingest
context analytics

stream Filtered = SensorReading
    .context(ingest)
    .where(temperature > 50.0)
    .emit(sensor: sensor_id, temp: temperature)

stream Analysis = Filtered
    .context(analytics)
    .where(temp > 100.0)
    .emit(alert_sensor: sensor, alert_temp: temp)
""", 'SensorReading { sensor_id: "S1", temperature: 105.5 }\n'
     'SensorReading { sensor_id: "S2", temperature: 75.0 }\n'
     'SensorReading { sensor_id: "S3", temperature: 30.0 }')
    assert len(out["Filtered"]) == 2
    (row,) = out["Analysis"]
    assert row["alert_sensor"] == "S1"


def test_three_context_chain(spark):
    """context_tests.rs:182 — 3-stage context chain narrows to S1."""
    out = run(spark, """
context ingest
context compute
context alert

stream Raw = SensorReading
    .context(ingest)
    .where(temperature > 0.0)
    .emit(sensor: sensor_id, temp: temperature)

stream Computed = Raw
    .context(compute)
    .where(temp > 50.0)
    .emit(device: sensor, value: temp)

stream Alert = Computed
    .context(alert)
    .where(value > 100.0)
    .emit(critical_device: device, critical_value: value)
""", 'SensorReading { sensor_id: "S1", temperature: 150.0 }\n'
     'SensorReading { sensor_id: "S2", temperature: 75.0 }')
    (row,) = out["Alert"]
    assert row["critical_device"] == "S1" and row["critical_value"] == 150.0


def test_context_isolation(spark):
    """context_tests.rs:232 — per-context streams see only their types."""
    out = run(spark, """
context ctx1
context ctx2

stream StreamA = EventA
    .context(ctx1)
    .where(value > 10)
    .emit(result: value)

stream StreamB = EventB
    .context(ctx2)
    .where(score > 5)
    .emit(output: score)
""", "EventA { value: 20 }\nEventB { score: 8 }\n"
     "EventA { value: 5 }\nEventB { score: 3 }")
    assert [r["result"] for r in out["StreamA"]] == [20]
    assert [r["output"] for r in out["StreamB"]] == [8]


def test_context_with_window_aggregate(spark):
    """context_tests.rs:310 — count-window(3) aggregate inside a context."""
    out = run(spark, """
context compute

stream AvgTemp = SensorReading
    .context(compute)
    .window(3)
    .aggregate(avg_temp: avg(temperature), count: count())
    .emit(average: avg_temp, total: count)
""", "\n".join(
        f"SensorReading {{ temperature: {t} }}" for t in (100.0, 200.0, 300.0)
    ))
    (row,) = out["AvgTemp"]
    assert abs(row["average"] - 200.0) < 0.01 and row["total"] == 3


def test_session_window_basic(spark):
    """context_tests.rs:615 — session(5s): events at 0/1/2s form one
    session, the 8s event another. Divergence (documented): batch replay
    flushes ALL sessions at end-of-input, so the still-open session 2
    also emits — the reference's push engine reported only the closed
    one."""
    out = run(spark, """
stream SessionAvg = SensorReading
    .window(session: 5s)
    .aggregate(avg_temp: avg(temperature), count: count())
    .emit(average: avg_temp, total: count)
""", "@0s SensorReading { temperature: 100.0 }\n"
     "@1s SensorReading { temperature: 200.0 }\n"
     "@2s SensorReading { temperature: 300.0 }\n"
     "@8s SensorReading { temperature: 400.0 }")
    rows = sorted(out["SessionAvg"], key=lambda r: r["total"], reverse=True)
    assert len(rows) == 2
    assert rows[0]["total"] == 3 and abs(rows[0]["average"] - 200.0) < 0.01
    assert rows[1]["total"] == 1 and abs(rows[1]["average"] - 400.0) < 0.01
