"""Port of the reference's integration-scenario battery
(crates/varpulis-runtime/tests/integration_scenarios.rs): program +
events in, output events verified — sequences, correlation, negation,
user/builtin functions in .where and .emit, merge streams, Apama-style
inline patterns, and `.to()` connector routing.

The r8 port caught two real gaps:
- `run_program(sinks=...)` NEVER fired: the `.to(Name)` positional arg
  parses as a PatternStep but the dispatch only read Ref.parts — plus
  file/console connectors now auto-bind (FileSink writes the reference's
  JSONL format);
- the Apama inline-pattern op (`.pattern(chain: A -> B and not C)`)
  did not parse at all — grammar + lowering added.
"""

import json

import pytest

from varpulis_spark.sources.event_file import load_evt
from varpulis_spark.stream import Stream
from varpulis_spark.vpl.compiler import run_program


@pytest.fixture(scope="module")
def spark():
    from varpulis_spark.engine import get_spark

    return get_spark("integration-port-tests")


def run(spark, program: str, events: str, **kw) -> dict:
    res = run_program(
        program,
        Stream(load_evt(spark, events), ts_col="ts", order_col="event_id"),
        **kw,
    )
    return {k: [r.asDict() for r in df.collect()] for k, df in res.items()}


# -- order-payment sequences (rs:48-132) ---------------------------------------

ORDER_PAYMENT = """
stream OrderPaymentMatch = Order as order
    -> Payment where order_id == order.id as payment
    .emit(status: "matched", order_id: order.id)
"""


def test_order_payment_sequence_match(spark):
    out = run(spark, ORDER_PAYMENT,
              "Order { id: 1 }\nPayment { order_id: 1, amount: 100.0 }")
    (row,) = out["OrderPaymentMatch"]
    assert row["status"] == "matched" and row["order_id"] == 1


def test_order_payment_no_match_wrong_id(spark):
    out = run(spark, ORDER_PAYMENT,
              "Order { id: 1 }\nPayment { order_id: 999, amount: 100.0 }")
    assert out["OrderPaymentMatch"] == []


def test_order_payment_multiple_orders_one_payment(spark):
    out = run(spark, ORDER_PAYMENT,
              "Order { id: 1 }\nOrder { id: 2 }\nPayment { order_id: 1, amount: 100.0 }")
    assert [r["order_id"] for r in out["OrderPaymentMatch"]] == [1]


def test_order_payment_wrong_sequence(spark):
    out = run(spark, ORDER_PAYMENT,
              "Payment { order_id: 1, amount: 100.0 }\nOrder { id: 1 }")
    assert out["OrderPaymentMatch"] == []


# -- three-step sequences (rs:139-189) ------------------------------------------

THREE_STEP = "stream ThreeStep = A -> B -> C\n    .emit(status: \"complete\")\n"


def test_three_step_sequence(spark):
    out = run(spark, THREE_STEP, "A {}\nB {}\nC {}")
    assert len(out["ThreeStep"]) == 1


def test_three_step_incomplete(spark):
    out = run(spark, THREE_STEP, "A {}\nB {}")
    assert out["ThreeStep"] == []


def test_three_step_wrong_order(spark):
    out = run(spark, THREE_STEP, "A {}\nC {}\nB {}")
    assert out["ThreeStep"] == []


def test_correlation_by_field(spark):
    out = run(spark, """
stream RequestResponse = Request as req
    -> Response where request_id == req.id as resp
    .emit(status: "correlated", request_id: req.id)
""", 'Request { id: "abc123", user: "alice" }\n'
      'Response { request_id: "abc123", result: "success" }')
    (row,) = out["RequestResponse"]
    assert row["request_id"] == "abc123"


# -- single events, field types (rs:253-344) -------------------------------------


def test_event_with_array_field(spark):
    out = run(spark, 'stream Test = ComplexEvent as e\n    .emit(status: "received")\n',
              'ComplexEvent { id: 1, tags: ["a", "b", "c"], metadata: "test" }')
    assert len(out["Test"]) == 1


def test_single_event_triggers_alert(spark):
    out = run(spark, 'stream OrderAlert = Order as o\n    .emit(status: "order_received", id: o.id)\n',
              "Order { id: 42 }")
    assert out["OrderAlert"][0]["id"] == 42


def test_sequence_with_boolean_field(spark):
    out = run(spark, """
stream CriticalFlow = Start as s
    -> End where completed == true
    .emit(status: "flow_complete")
""", "Start { id: 1 }\nEnd { completed: true }")
    assert len(out["CriticalFlow"]) == 1


def test_sequence_with_string_match(spark):
    out = run(spark, """
stream ErrorAck = Error as e
    -> Ack where error_id == e.id
    .emit(status: "acknowledged", error_id: e.id)
""", 'Error { id: "err001", message: "Connection failed" }\nAck { error_id: "err001" }')
    assert out["ErrorAck"][0]["error_id"] == "err001"


def test_rapid_event_injection(spark):
    """rs:483 — 100 events, 100 outputs (the channel-stays-open class)."""
    out = run(spark, "stream Counter = Tick as t\n    .emit(count: t.n)\n",
              "\n".join(f"Tick {{ n: {i} }}" for i in range(100)))
    assert sorted(r["count"] for r in out["Counter"]) == list(range(100))


# -- electrical consumption scenarios (rs:570-692) --------------------------------


def test_electrical_abnormal_floor_consumption(spark):
    out = run(spark, """
stream AbnormalFloor = FloorConsumption as fc
    .where(consumption_kwh > baseline_kwh * 1.5)
    .emit(
        alert_type: "abnormal",
        floor_id: fc.floor_id,
        consumption: fc.consumption_kwh
    )
""", 'FloorConsumption { site_id: "S1", building_id: "B1", floor_id: "F1", consumption_kwh: 100.0, baseline_kwh: 95.0 }\n'
     'FloorConsumption { site_id: "S1", building_id: "B1", floor_id: "F2", consumption_kwh: 200.0, baseline_kwh: 90.0 }')
    (row,) = out["AbnormalFloor"]
    assert row["alert_type"] == "abnormal" and row["floor_id"] == "F2"


def test_electrical_consumption_spike_detection(spark):
    out = run(spark, """
stream Spike = FloorConsumption as current
    -> FloorConsumption as next
    .emit(alert_type: "spike", current_floor: current.floor_id)
""", 'FloorConsumption { floor_id: "F1", consumption_kwh: 100.0, baseline_kwh: 95.0 }\n'
     'FloorConsumption { floor_id: "F1", consumption_kwh: 250.0, baseline_kwh: 95.0 }')
    assert len(out["Spike"]) == 1
    assert out["Spike"][0]["alert_type"] == "spike"


def test_electrical_threshold_detection(spark):
    out = run(spark, """
stream OverThreshold = Reading
    .where(value > baseline * 1.5)
    .emit(status: "over", reading_value: value)
""", "Reading { value: 200.0, baseline: 100.0 }\nReading { value: 120.0, baseline: 100.0 }")
    assert [r["reading_value"] for r in out["OverThreshold"]] == [200.0]


# -- functions in where/emit (rs:695-947) -----------------------------------------


def test_user_function_in_where_clause(spark):
    out = run(spark, """
fn is_high(value: float, threshold: float) -> bool:
    value > threshold

fn double(x: float) -> float:
    x * 2.0

stream HighValues = Measurement
    .where(is_high(value, double(threshold)))
    .emit(status: "high", val: value)
""", "Measurement { value: 100.0, threshold: 30.0 }\n"
     "Measurement { value: 50.0, threshold: 30.0 }\n"
     "Measurement { value: 150.0, threshold: 100.0 }")
    assert [r["val"] for r in out["HighValues"]] == [100.0]


def test_builtin_functions_in_where(spark):
    out = run(spark, """
stream AbsCheck = Reading
    .where(abs(delta) > 10.0)
    .emit(status: "large_delta", d: delta)
""", "\n".join(f"Reading {{ delta: {d} }}" for d in (5.0, -15.0, 8.0, 25.0)))
    assert sorted(r["d"] for r in out["AbsCheck"]) == [-15.0, 25.0]


def test_nested_function_calls(spark):
    out = run(spark, """
fn add_margin(x: float, pct: float) -> float:
    x * (1.0 + pct / 100.0)

stream MarginCheck = Price
    .where(current > add_margin(base, margin_pct))
    .emit(status: "above_margin")
""", "Price { current: 110.0, base: 100.0, margin_pct: 5.0 }\n"
     "Price { current: 104.0, base: 100.0, margin_pct: 5.0 }")
    assert len(out["MarginCheck"]) == 1


def test_emit_with_function_call(spark):
    out = run(spark, """
fn calculate_tax(amount: float, rate: float) -> float:
    amount * rate / 100.0

stream TaxCalculation = Sale
    .emit(sale_id: id, amount: amount, tax: calculate_tax(amount, tax_rate))
""", 'Sale { id: "S1", amount: 100.0, tax_rate: 20.0 }')
    (row,) = out["TaxCalculation"]
    assert abs(row["tax"] - 20.0) < 0.001


def test_emit_with_builtin_function(spark):
    out = run(spark, """
stream AbsoluteValues = Measurement
    .emit(sensor_id: id, abs_value: abs(reading))
""", 'Measurement { id: "M1", reading: -42.5 }')
    assert abs(out["AbsoluteValues"][0]["abs_value"] - 42.5) < 0.001


def test_emit_with_arithmetic_expression(spark):
    out = run(spark, """
stream PriceWithDiscount = Product
    .emit(product_id: id, final_price: price * (1.0 - discount / 100.0))
""", 'Product { id: "P1", price: 100.0, discount: 25.0 }')
    assert abs(out["PriceWithDiscount"][0]["final_price"] - 75.0) < 0.001


# -- negation (rs:783-853) --------------------------------------------------------

NEGATED = """
stream OrderPayment = Order as order
    -> Payment where order_id == order.id as payment
    .not(Cancellation where order_id == order.id)
    .emit(status: "paid", order_id: order.id)
"""


def test_sequence_negation_cancels_match(spark):
    out = run(spark, NEGATED,
              "Order { id: 1 }\nCancellation { order_id: 1 }\nPayment { order_id: 1 }")
    assert out["OrderPayment"] == []


def test_sequence_negation_allows_non_matching(spark):
    out = run(spark, NEGATED,
              "Order { id: 1 }\nCancellation { order_id: 2 }\nPayment { order_id: 1 }")
    assert len(out["OrderPayment"]) == 1


def test_sequence_without_negation(spark):
    out = run(spark, """
stream OrderPayment = Order as order
    -> Payment where order_id == order.id as payment
    .emit(status: "paid", order_id: order.id)
""", "Order { id: 1 }\nCancellation { order_id: 1 }\nPayment { order_id: 1 }")
    assert len(out["OrderPayment"]) == 1


# -- merge streams (rs:954-1128) ----------------------------------------------------


def test_merge_stream_basic(spark):
    out = run(spark, """
stream BuildingMetrics = merge(
    stream S1 = SensorEvent .where(sensor_id == "S1"),
    stream S2 = SensorEvent .where(sensor_id == "S2"),
    stream S3 = SensorEvent .where(sensor_id == "S3")
)
.emit(sensor: sensor_id, temp: temperature)
""", 'SensorEvent { sensor_id: "S1", temperature: 22.5 }\n'
     'SensorEvent { sensor_id: "S2", temperature: 23.0 }\n'
     'SensorEvent { sensor_id: "S4", temperature: 24.0 }\n'
     'SensorEvent { sensor_id: "S3", temperature: 21.5 }')
    rows = out["BuildingMetrics"]
    assert len(rows) == 3
    assert {r["sensor"] for r in rows} == {"S1", "S2", "S3"}


def test_merge_with_window_and_aggregation(spark):
    out = run(spark, """
stream BuildingMetrics = merge(
    stream S1 = SensorEvent .where(sensor_id == "S1"),
    stream S2 = SensorEvent .where(sensor_id == "S2")
)
.window(1m)
.aggregate(
    avg_temp: avg(temperature),
    min_temp: min(temperature),
    max_temp: max(temperature)
)
.emit(average: avg_temp, minimum: min_temp, maximum: max_temp)
""", 'SensorEvent { sensor_id: "S1", temperature: 20.0 }\n'
     'SensorEvent { sensor_id: "S2", temperature: 25.0 }\n'
     'SensorEvent { sensor_id: "S1", temperature: 22.0 }\n'
     'SensorEvent { sensor_id: "S2", temperature: 23.0 }')
    (row,) = out["BuildingMetrics"]  # all 4 land in one 1m window
    assert row["average"] == 22.5 and row["minimum"] == 20.0 and row["maximum"] == 25.0


def test_count_distinct_aggregation(spark):
    out = run(spark, """
stream SensorStats = SensorEvent
    .window(1m)
    .aggregate(
        sensor_count: count(distinct(sensor_id)),
        total_count: count(sensor_id)
    )
    .emit(unique_sensors: sensor_count, total: total_count)
""", "\n".join(
        f'SensorEvent {{ sensor_id: "S{s}", temperature: 2{i}.0 }}'
        for i, s in enumerate(("1", "1", "2", "3", "1"))
    ))
    (row,) = out["SensorStats"]
    assert row["unique_sensors"] == 3 and row["total"] == 5


def test_pattern_simple_count(spark):
    out = run(spark, """
stream HighVolumeAlert = Trade
    .window(1m)
    .pattern(high_activity: events => events.len() > 3)
    .emit(alert_type: "high_activity", count: "detected")
""", "\n".join(
        f'Trade {{ symbol: "AAPL", price: 15{i}.0, amount: {i + 1}000 }}'
        for i in range(4)
    ))
    (row,) = out["HighVolumeAlert"]  # 4 > 3 events in the window
    assert row["alert_type"] == "high_activity"


# -- Apama-style inline patterns (rs:1134-1244) ---------------------------------------


def test_apama_followed_by_pattern(spark):
    out = run(spark, """
stream NewsStockCorrelation = NewsItem
    .pattern(news_stock: NewsItem -> StockTick)
    .emit(alert_type: "news_stock_correlation")
""", 'NewsItem { subject: "ACME", headline: "Q4 Results" }\n'
     'StockTick { symbol: "ACME", price: 150.0 }')
    (row,) = out["NewsStockCorrelation"]
    assert row["alert_type"] == "news_stock_correlation"


def test_apama_and_pattern(spark):
    """A and B in ANY order — EventB arriving first still matches."""
    out = run(spark, """
stream BothRequired = EventA
    .pattern(both: EventA and EventB)
    .emit(alert_type: "both_events")
""", "EventB { id: 1 }\nEventA { id: 2 }")
    assert len(out["BothRequired"]) == 1


def test_apama_or_pattern(spark):
    out = run(spark, """
stream EitherOne = EventA
    .pattern(either: EventA or EventB)
    .emit(alert_type: "either_event")
""", "EventB { id: 1 }")
    assert len(out["EitherOne"]) == 1


def test_apama_complex_pattern(spark):
    prog = """
stream ComplexPattern = EventA
    .pattern(complex: (EventA -> EventB) and not EventC)
    .emit(alert_type: "complex_match")
"""
    out = run(spark, prog, "EventA { id: 1 }\nEventB { id: 2 }")
    assert len(out["ComplexPattern"]) == 1
    # sharpened: an intervening EventC vetoes the match
    out = run(spark, prog, "EventA { id: 1 }\nEventC { id: 9 }\nEventB { id: 2 }")
    assert out["ComplexPattern"] == []


def test_apama_chained_followed_by(spark):
    prog = """
stream ChainPattern = EventA
    .pattern(chain: EventA -> EventB -> EventC -> EventD)
    .emit(alert_type: "chain_complete")
"""
    out = run(spark, prog, "EventA { step: 1 }\nEventB { step: 2 }\n"
                           "EventC { step: 3 }\nEventD { step: 4 }")
    assert len(out["ChainPattern"]) == 1
    # sharpened: missing the final step yields nothing
    out = run(spark, prog, "EventA { step: 1 }\nEventB { step: 2 }\nEventC { step: 3 }")
    assert out["ChainPattern"] == []


# -- .to() connector routing (rs:1288-1562) --------------------------------------------


def _file_sink_program(path: str, body: str) -> str:
    return f'connector FileOut = file(path: "{path}")\n\n{body}'


def test_to_file_connector_basic(spark, tmp_path):
    path = str(tmp_path / "output.jsonl")
    out = run(spark, _file_sink_program(path, """
stream HighTemp = SensorReading
    .where(temperature > 30.0)
    .emit(status: "hot", temp: temperature)
    .to(FileOut)
"""), "\n".join(
        f'SensorReading {{ temperature: {t}, zone: "{z}" }}'
        for t, z in ((25.0, "A"), (35.0, "B"), (40.0, "C"), (28.0, "D"))
    ))
    assert len(out["HighTemp"]) == 2
    with open(path) as f:
        lines = [json.loads(line) for line in f if line.strip()]
    assert len(lines) == 2
    assert all(row["status"] == "hot" for row in lines)
    assert sorted(row["temp"] for row in lines) == [35.0, 40.0]


def test_to_connector_not_found(spark):
    """An undeclared connector in .to() must not crash — events still flow."""
    out = run(spark, """
stream Output = SensorReading
    .where(temperature > 30.0)
    .emit(status: "hot")
    .to(NonExistentConnector)
""", "SensorReading { temperature: 35.0 }")
    assert len(out["Output"]) == 1 and out["Output"][0]["status"] == "hot"


def test_to_console_connector(spark, capsys):
    out = run(spark, """
connector ConsoleOut = console()

stream Alerts = SensorReading
    .where(temperature > 30.0)
    .emit(status: "alert", temp: temperature)
    .to(ConsoleOut)
""", 'SensorReading { temperature: 35.0, zone: "A" }\n'
     'SensorReading { temperature: 40.0, zone: "B" }')
    assert len(out["Alerts"]) == 2
    assert capsys.readouterr().out.count("[SINK]") == 2


def test_to_file_connector_with_sequence(spark, tmp_path):
    path = str(tmp_path / "seq_output.jsonl")
    out = run(spark, _file_sink_program(path, """
stream OrderPayment = Order as order
    -> Payment where order_id == order.id as payment
    .emit(status: "matched", order_id: order.id)
    .to(FileOut)
"""), "Order { id: 1 }\nPayment { order_id: 1, amount: 100.0 }\n"
      "Order { id: 2 }\nPayment { order_id: 2, amount: 200.0 }")
    assert len(out["OrderPayment"]) == 2
    with open(path) as f:
        lines = [json.loads(line) for line in f if line.strip()]
    assert len(lines) == 2 and all(r["status"] == "matched" for r in lines)


def test_to_multiple_connectors(spark, tmp_path):
    p1, p2 = str(tmp_path / "out1.jsonl"), str(tmp_path / "out2.jsonl")
    out = run(spark, f"""
connector File1 = file(path: "{p1}")
connector File2 = file(path: "{p2}")

stream Output = SensorReading
    .where(temperature > 30.0)
    .emit(status: "hot", temp: temperature)
    .to(File1)
    .to(File2)
""", "SensorReading { temperature: 35.0 }\nSensorReading { temperature: 40.0 }")
    assert len(out["Output"]) == 2
    for p in (p1, p2):
        with open(p) as f:
            assert len([line for line in f if line.strip()]) == 2


def test_to_does_not_consume_events(spark, tmp_path):
    path = str(tmp_path / "passthrough.jsonl")
    out = run(spark, _file_sink_program(path, """
stream Output = SensorReading
    .emit(value: temperature)
    .to(FileOut)
"""), "\n".join(f"SensorReading {{ temperature: {t} }}" for t in (10.0, 20.0, 30.0)))
    assert len(out["Output"]) == 3
    with open(path) as f:
        assert len([line for line in f if line.strip()]) == 3


def test_to_with_filter_only_matching_events(spark, tmp_path):
    path = str(tmp_path / "filtered.jsonl")
    out = run(spark, _file_sink_program(path, """
stream CriticalOnly = SensorReading
    .where(temperature > 50.0)
    .emit(severity: "critical", temp: temperature)
    .to(FileOut)
"""), "\n".join(
        f"SensorReading {{ temperature: {t} }}"
        for t in (25.0, 55.0, 30.0, 60.0, 45.0)
    ))
    assert len(out["CriticalOnly"]) == 2
    with open(path) as f:
        lines = [json.loads(line) for line in f if line.strip()]
    assert sorted(r["temp"] for r in lines) == [55.0, 60.0]
    assert all(r["severity"] == "critical" for r in lines)
