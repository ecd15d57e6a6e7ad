"""Port of the reference's extended pipeline battery
(crates/varpulis-runtime/tests/engine_pipeline_extended_tests.rs, 60
cases): merge sources (plain + per-branch filters), timer event routing,
var/let declarations + top-level assignment, select aliases, emit
expressions (fn call, conditional, simple-emit literal fallback), having
all-pass/all-block, five-level derived chains, reload report shapes,
negation + match_all + complex-where sequences, pattern/connector
declaration stores, and the unsupported-op diagnostics.

Duplicates of cases already ported verbatim in test_engine_coverage_port
/ test_engine_final_port (log levels, print, distinct/limit sync,
count/sliding windows, partitioned aggregates, first-shorthand) are not
re-ported — the sync path IS our only path, so the sync_* variants
collapse onto the async ones. Engine-API shape cases (get_timers
internals, is_stateless, has_contexts, process_batch_shared channel
plumbing, benchmark constructor) are documented skips; their observable
halves (timer event routing, context no-op transparency) are ported.

Note on `.order_by`: the reference REJECTS it at load
(engine_pipeline_extended order_by_returns_error); we support it as a
documented extension (SURVEY §2 #24), so that case asserts our validate
treats it as known while `.collect` stays E090-rejected."""

import pytest

from varpulis_spark.sources.event_file import load_evt
from varpulis_spark.stream import Stream
from varpulis_spark.vpl.compiler import run_program
from varpulis_spark.vpl.parser import parse_full


@pytest.fixture(scope="module")
def spark():
    from varpulis_spark.engine import get_spark

    return get_spark("pipeline-extended-port")


def run(spark, program: str, events: str, stream_name: str | None = None):
    res = run_program(
        program,
        Stream(load_evt(spark, events), ts_col="ts", order_col="event_id"),
    )
    if stream_name is None:
        rows = []
        for n in res:
            rows.extend(r.asDict() for r in res[n].collect())
        return rows
    return [r.asDict() for r in res[stream_name].collect()]


# -- merge sources (rs:63-101) ---------------------------------------------------


def test_merge_stream_combines_multiple_sources(spark):
    out = run(spark, """
stream Combined = merge(
    stream Temps = TempReading,
    stream Press = PressureReading
)
    .emit(kind: event_type)
""", """
TempReading { value: 25.0 }
PressureReading { value: 1013.0 }
TempReading { value: 30.0 }
""")
    assert len(out) == 3


def test_merge_stream_with_per_branch_filters(spark):
    out = run(spark, """
stream Alerts = merge(
    stream Hot = TempReading where value > 100.0,
    stream LowPress = PressureReading where value < 900.0
)
    .emit(val: value)
""", """
TempReading { value: 150.0 }
TempReading { value: 50.0 }
PressureReading { value: 800.0 }
PressureReading { value: 950.0 }
""")
    assert len(out) == 2
    assert sorted(r["val"] for r in out) == [150.0, 800.0]


# -- timer events route through the stream (rs:107-145) ----------------------------


def test_timer_stream_processes_timer_events(spark):
    """A Timer_<stream> event routed into the engine produces the stream's
    emit (the timer task's observable half; the interval registration is
    pinned in test_engine_final_port)."""
    out = run(spark, """
stream Heartbeat = timer(1s)
    .emit(msg: "tick")
""", "Timer_Heartbeat { }\n")
    assert len(out) == 1
    assert out[0]["msg"] == "tick"


# -- config block with values (rs:151-167) -------------------------------------------


def test_config_block_stores_values(spark):
    prog = parse_full("""
config mqtt {
    broker: "tcp://localhost:1883",
    topic: "sensor/data"
}
""")
    (cfg,) = prog.configs
    assert cfg.name == "mqtt"
    assert len(cfg.items) == 2


# -- var/let + top-level assignment (rs:173-224) --------------------------------------


def test_var_decl_and_assignment_updates_value(spark):
    out = run(spark, """
var counter: int = 0
counter := 42

stream S = Tick
    .emit(c: counter)
""", "Tick { x: 1 }\n")
    assert len(out) == 1 and out[0]["c"] == 42


def test_let_decl_rejects_reassignment(spark):
    from varpulis_spark.vpl.validate import validate

    res = validate(parse_full("""
let threshold: int = 10
threshold := 20
"""))
    assert any(d.code == "E040" for d in res.errors)
    assert any("immutable" in d.format() for d in res.errors)


def test_var_decl_float_and_string(spark):
    out = run(spark, """
var ratio: float = 3.125
var label: str = "sensor"

stream S = Tick
    .emit(r: ratio, l: label)
""", "Tick { x: 1 }\n")
    assert out[0]["r"] == 3.125 and out[0]["l"] == "sensor"


# -- select with bare field + alias + constant (rs:231-244) -----------------------------


def test_select_field_only_and_alias(spark):
    out = run(spark, """
stream S = Data
    .select(x, doubled: x * 2, name: "constant")
    .emit(x: x, doubled: doubled, name: name)
""", "Data { x: 7, y: 100 }\n")
    assert len(out) == 1
    r = out[0]
    assert r["x"] == 7 and r["doubled"] == 14 and r["name"] == "constant"


# -- emit expression varieties (rs:251-280, 1046-1080) ------------------------------------


def test_emit_expr_with_function_call(spark):
    out = run(spark, """
fn negate(x: int) -> int:
    return x * -1

stream S = Tick
    .emit(neg: negate(x), orig: x)
""", "Tick { x: 5 }\n")
    assert len(out) == 1
    assert out[0]["neg"] == -5 and out[0]["orig"] == 5


def test_emit_expr_with_conditional(spark):
    out = run(spark, """
stream S = Tick
    .emit(label: if x > 5 then "high" else "low")
""", "@0 Tick { x: 10 }\n@100 Tick { x: 2 }\n")
    assert sorted(r["label"] for r in out) == ["high", "low"]


def test_emit_simple_fields_only(spark):
    out = run(spark, """
stream S = Reading
    .emit(sensor: sensor_id, val: value)
""", 'Reading { sensor_id: "S1", value: 42.0 }\n')
    assert out[0]["sensor"] == "S1"


def test_emit_missing_field_uses_literal(spark):
    """Simple-Emit path: an ident naming no event field emits the ident's
    NAME as a string (pipeline.rs:533-542)."""
    out = run(spark, """
stream S = Tick
    .emit(status: "active", missing: nonexistent_field)
""", "Tick { x: 1 }\n")
    assert len(out) == 1
    assert out[0]["status"] == "active"
    assert out[0]["missing"] == "nonexistent_field"


# -- having extremes (rs:355-394) -----------------------------------------------------


def test_having_blocks_all_when_condition_never_true(spark):
    out = run(spark, """
stream S = Tick
    .window(2)
    .aggregate(c: count())
    .having(c > 100)
    .emit(c: c)
""", "".join(f"Tick {{ x: {i} }}\n" for i in range(6)))
    assert out == []


def test_having_passes_all_when_condition_always_true(spark):
    out = run(spark, """
stream S = Tick
    .window(2)
    .aggregate(c: count())
    .having(c > 0)
    .emit(c: c)
""", "".join(f"Tick {{ x: {i} }}\n" for i in range(6)))
    assert len(out) == 3  # 6 events / window(2)


# -- passthrough + deep chains (rs:547-586) ---------------------------------------------


def test_passthrough_stream_no_ops(spark):
    out = run(spark, "stream S = Tick\n", "Tick { x: 1 }\nTick { x: 2 }\n")
    assert len(out) == 2  # routed through unchanged, no panic


def test_chain_depth_five_levels(spark):
    out = run(spark, """
stream L1 = Raw
    .where(x > 0)

stream L2 = L1
    .where(x > 10)

stream L3 = L2
    .where(x > 20)

stream L4 = L3
    .where(x > 30)

stream L5 = L4
    .emit(val: x)
""", "Raw { x: 50 }\nRaw { x: 25 }\nRaw { x: 5 }\n", stream_name="L5")
    assert len(out) == 1 and out[0]["val"] == 50


# -- reload report shapes (rs:593-692, 1365-1381) -----------------------------------------


def test_reload_source_change_resets_state(spark):
    from varpulis_spark.api import _reload_report

    rep = _reload_report(
        parse_full("stream S = Alpha\n    .emit(val: x)\n"),
        parse_full("stream S = Beta\n    .emit(val: x)\n"),
    )
    assert "S" in rep["streams_updated"]
    assert "S" in rep["state_reset"]


def test_reload_adds_new_function(spark):
    v2 = """
fn double(n: int) -> int:
    return n * 2

stream S = Tick
    .emit(val: double(x))
"""
    out = run(spark, v2, "Tick { x: 21 }\n")
    assert out[0]["val"] == 42  # the reloaded program's fn is live


def test_reload_adds_new_variable_resets_nothing(spark):
    from varpulis_spark.api import _reload_report

    v1 = "stream S = Tick\n    .emit(val: x)\n"
    v2 = "var new_var: int = 100\n" + v1
    rep = _reload_report(parse_full(v1), parse_full(v2))
    # adding a global does not touch stream state
    assert rep["state_preserved"] == ["S"]
    assert rep["state_reset"] == []


def test_reload_identical_preserves_state_list(spark):
    from varpulis_spark.api import _reload_report

    src = """
stream A = Tick
    .where(x > 0)
    .emit(val: x)

stream B = Tock
    .emit(val: y)
"""
    rep = _reload_report(parse_full(src), parse_full(src))
    assert rep["streams_added"] == []
    assert rep["streams_removed"] == []
    assert rep["streams_updated"] == []
    assert len(rep["state_preserved"]) == 2


def test_reload_updates_connector_declarations(spark):
    v2 = parse_full("""
connector out = mqtt(url: "tcp://host2:1883", topic: "data")
connector extra = mqtt(url: "tcp://host3:1883", topic: "extra")

stream S = Tick
    .emit(val: x)
""")
    assert {c.name for c in v2.connectors} == {"out", "extra"}


# -- sequences: negation / match_all / complex where (rs:699-784) ---------------------------


def test_sequence_not_followed_by_blocks_when_negation_occurs(spark):
    out = run(spark, """
stream S = Order as order
    -> Shipment where order_id == order.id as ship
    .not(Cancellation where order_id == order.id)
    .within(60s)
    .emit(status: "shipped")
""", """
@1000 Order { id: 1 }
@2000 Cancellation { order_id: 1 }
@3000 Shipment { order_id: 1 }
""")
    assert out == [], "cancellation inside the span suppresses the match"


def test_sequence_not_followed_by_matches_without_negation(spark):
    out = run(spark, """
stream S = Order as order
    -> Shipment where order_id == order.id as ship
    .not(Cancellation where order_id == order.id)
    .within(60s)
    .emit(status: "shipped")
""", "@1000 Order { id: 1 }\n@3000 Shipment { order_id: 1 }\n")
    assert len(out) == 1 and out[0]["status"] == "shipped"


def test_sequence_match_all_in_followed_by(spark):
    out = run(spark, """
stream S = Start as start
    -> all Tick as tick
    .within(10s)
    .emit(matched: "yes")
""", "@1000 Start { }\n@2000 Tick { v: 1 }\n@3000 Tick { v: 2 }\n")
    assert len(out) >= 1, "match_all produces matches for the Ticks"


def test_followed_by_with_complex_where(spark):
    out = run(spark, """
stream S = Order as order
    -> Payment where amount >= order.total and status == "approved" as pay
    .within(30s)
    .emit(paid: pay.amount)
""", """
@1000 Order { total: 100.0 }
@2000 Payment { amount: 100.0, status: "pending" }
@3000 Payment { amount: 100.0, status: "approved" }
""")
    assert len(out) == 1
    assert out[0]["paid"] == 100.0


def test_sequence_decl_source_syntax(spark):
    out = run(spark, """
stream S = A as a -> B as b -> C as c
    .emit(result: "done")
""", "@100 A { }\n@200 B { }\n@300 C { }\n")
    assert len(out) == 1 and out[0]["result"] == "done"


# -- unsupported-op diagnostics (rs:791-819) --------------------------------------------


def test_collect_returns_error(spark):
    from varpulis_spark.vpl.validate import validate

    res = validate(parse_full("stream S = Tick\n    .collect()\n"))
    msgs = [d.format() for d in res.errors]
    assert any("collect" in m for m in msgs)


def test_order_by_is_supported_extension(spark):
    """The reference rejects .order_by at load; we implement it (SURVEY §2
    #24 documented extension) — it must compile and order."""
    out = run(spark, """
stream S = Tick
    .order_by(x)
    .emit(val: x)
""", "Tick { x: 3 }\nTick { x: 1 }\nTick { x: 2 }\n")
    assert [r["val"] for r in out] == [1, 2, 3]


# -- declaration stores (rs:1006-1040) -----------------------------------------------


def test_pattern_declaration_lookup_with_within(spark):
    prog = parse_full("pattern RapidOrders = SEQ(Order, Payment) WITHIN 5s\n")
    assert [p.name for p in prog.patterns] == ["RapidOrders"]


def test_multiple_connector_declarations(spark):
    prog = parse_full("""
connector mqtt_in = mqtt(url: "tcp://localhost:1883", topic: "input")
connector mqtt_out = mqtt(url: "tcp://localhost:1883", topic: "output")
""")
    assert {c.name for c in prog.connectors} == {"mqtt_in", "mqtt_out"}
    from varpulis_spark.registry import connector_configs

    cfgs = connector_configs(prog)
    assert len(cfgs) == 2
    assert cfgs["mqtt_in"]["broker"] == "tcp://localhost:1883"


# -- context transparency (rs:1140-1154) ------------------------------------------------


def test_context_declaration_is_transparent(spark):
    out = run(spark, """
context fast_lane

stream S = Tick
    .context(fast_lane)
    .emit(val: x)
""", "Tick { x: 1 }\n")
    assert len(out) == 1 and out[0]["val"] == 1


# -- derived stream as sequence source (rs:1161-1179) -------------------------------------


def test_derived_stream_source_in_sequence(spark):
    out = run(spark, """
stream HighTemp = TempReading
    .where(temp > 100.0)

stream Alert = HighTemp as ht
    -> Ack as ack
    .within(30s)
    .emit(msg: "acknowledged")
""", "@1000 TempReading { temp: 150.0 }\n@2000 Ack { }\n",
        stream_name="Alert")
    assert len(out) == 1 and out[0]["msg"] == "acknowledged"


# -- event declarations don't create streams (rs:1219-1237) -------------------------------


def test_event_declaration_does_not_create_stream(spark):
    prog = parse_full("""
event SensorReading:
    temp: float
    humidity: float

stream S = SensorReading
    .where(temp > 30.0)
    .emit(temp: temp)
""")
    assert [d.name for d in prog.streams] == ["S"]
    assert [e.name for e in prog.events] == ["SensorReading"]


# -- sync first/last aggregate (rs:1244-1266) ---------------------------------------------


def test_sync_aggregate_first_last(spark):
    out = run(spark, """
stream S = Reading
    .window(3)
    .aggregate(f: first(value), l: last(value))
    .emit(f: f, l: l)
""", "@0 Reading { value: 5.0 }\n@100 Reading { value: 15.0 }\n"
       "@200 Reading { value: 25.0 }\n")
    assert len(out) == 1
    assert out[0]["f"] == 5.0 and out[0]["l"] == 25.0


# -- process emits through sync path (rs:1323-1342) ----------------------------------------


def test_sync_process_with_emit(spark):
    out = run(spark, """
fn tag():
    emit Tagged(mark: value + 1)

stream S = Tick
    .process(tag())
""", "Tick { value: 10 }\n")
    assert len(out) == 1 and out[0]["mark"] == 11
