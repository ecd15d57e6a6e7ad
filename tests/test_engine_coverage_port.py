"""Port of the reference's engine/pipeline/compiler coverage battery
(crates/varpulis-runtime/tests/engine_coverage_tests.rs, 63 cases):
distinct/limit boundaries, partitioned + sliding + session count windows,
multi-fn aggregates (count/min/max/avg/stddev/ema/last/first/
count_distinct and binary expressions over them), having, sequences
(2/3-step, wrong-order, within-timeout, derived-source), process-fn
emits and loops, emit expression evaluation, string ops in where,
watermark/allowed_lateness surfaces, multi-stream routing, and the
declaration stores (var/fn/connector/config).

Engine-API shape cases with no analog in a Spark engine are adapted or
noted rather than mechanically copied:
- `engine_metrics_after_processing` / `engine_metrics_tracking` /
  `process_batch_sync_produces_output` / `benchmark_mode_no_output`:
  Rust Engine constructor + metrics-struct surfaces; the observable
  counters are already pinned through the REST control plane
  (tests/test_api.py metrics cases), and batch-sync == our only mode.
- `variable_persists_across_events` / `engine_variable_get_set`:
  set_variable-at-runtime has no REST surface (variables re-derive from
  source on replay, pinned in test_checkpoint_port); the observable part
  — declared initial value visible to streams — is ported.
- `load_with_source_detects_errors` / `validation_catches_duplicate_
  stream_via_parser`: ported against vpl.validate's E010/E002 codes.
"""

import pytest

from varpulis_spark.sources.event_file import load_evt
from varpulis_spark.stream import Stream
from varpulis_spark.vpl.compiler import run_program
from varpulis_spark.vpl.parser import parse_full


@pytest.fixture(scope="module")
def spark():
    from varpulis_spark.engine import get_spark

    return get_spark("engine-coverage-port")


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


# -- distinct with LRU boundary (rs:59-92) -----------------------------------


def test_distinct_deduplicates_by_field(spark):
    out = run(spark, """
stream S = Reading
    .distinct(sensor_id)
    .emit(id: sensor_id, val: value)
""", """
Reading { sensor_id: "S1", value: 10.0 }
Reading { sensor_id: "S2", value: 20.0 }
Reading { sensor_id: "S1", value: 30.0 }
Reading { sensor_id: "S3", value: 40.0 }
Reading { sensor_id: "S2", value: 50.0 }
""")
    assert len(out) == 3, "should deduplicate to 3 unique sensors"
    assert sorted(r["id"] for r in out) == ["S1", "S2", "S3"]


def test_distinct_deduplicates_by_expression(spark):
    out = run(spark, """
stream S = Tick
    .distinct(x)
    .emit(val: x)
""", "Tick { x: 1 }\nTick { x: 1 }\nTick { x: 2 }\n")
    assert len(out) == 2


# -- limit exact boundary (rs:98-129) -----------------------------------------


def test_limit_stops_at_boundary(spark):
    events = "".join(f"Tick {{ x: {i} }}\n" for i in range(1, 6))
    out = run(spark, """
stream S = Tick
    .limit(3)
    .emit(val: x)
""", events)
    assert len(out) == 3


def test_limit_one_event(spark):
    out = run(spark, """
stream S = Tick
    .limit(1)
    .emit(val: x)
""", "Tick { x: 1 }\nTick { x: 2 }\n")
    assert len(out) == 1


# -- partitioned count-window aggregation (rs:135-156) ------------------------


def test_partitioned_count_window_aggregation(spark):
    out = run(spark, """
stream S = Reading
    .partition_by(region)
    .window(2)
    .aggregate(total: sum(value), cnt: count())
    .emit(region: region, total: total, cnt: cnt)
""", """
Reading { region: "east", value: 10.0 }
Reading { region: "west", value: 20.0 }
Reading { region: "east", value: 30.0 }
Reading { region: "west", value: 40.0 }
""")
    assert len(out) == 2, "each partition fills its window of 2"
    got = {r["region"]: r["total"] for r in out}
    assert got == {"east": 40.0, "west": 60.0}


# -- process expressions with emit side effects (rs:162-175) -------------------


def test_process_with_multiple_emits(spark):
    out = run(spark, """
fn expand():
    emit Low(val: value * 0.9)
    emit High(val: value * 1.1)

stream S = Reading
    .process(expand())
""", "Reading { value: 100.0 }\n")
    assert len(out) == 2
    assert sorted(r["val"] for r in out) == pytest.approx([90.0, 110.0])


# -- variable declarations (rs:181-194, 255-271 adapted) -----------------------


def test_variable_initial_value_visible_to_streams(spark):
    out = run(spark, """
var counter: int = 0
var threshold: float = 10.0

stream S = Tick
    .emit(c: counter, t: threshold)
""", "Tick { x: 1 }\n")
    assert len(out) == 1
    assert out[0]["c"] == 0 and out[0]["t"] == 10.0


# -- function lookups (rs:232-249 adapted to the program store) ----------------


def test_program_function_lookups(spark):
    prog = parse_full("""
fn gen():
    return 42

stream S = A as a
    -> B as b
""")
    names = {f.name for f in prog.fns}
    assert "gen" in names
    assert "nonexistent" not in names
    assert names, "function_names should be non-empty"


# -- empty program loads (rs:277-288) ------------------------------------------


def test_empty_program_loads(spark):
    res = run_program("", Stream(load_evt(spark, "Tick { x: 1 }\n"),
                                 ts_col="ts", order_col="event_id"))
    assert res == {}


# -- select projection (rs:294-307) --------------------------------------------


def test_select_projection(spark):
    out = run(spark, """
stream S = Reading
    .emit(sensor: sensor_id, v: value)
""", 'Reading { sensor_id: "S1", value: 42.0, extra: "noise" }\n')
    assert len(out) == 1
    assert out[0]["sensor"] == "S1" and out[0]["v"] == 42.0


# -- having after aggregate (rs:313-336) ----------------------------------------


def test_having_filters_aggregate_results(spark):
    out = run(spark, """
stream S = Reading
    .window(3)
    .aggregate(total: sum(value))
    .having(total > 50.0)
    .emit(total: total)
""", """
Reading { value: 10.0 }
Reading { value: 20.0 }
Reading { value: 5.0 }
Reading { value: 30.0 }
Reading { value: 40.0 }
Reading { value: 50.0 }
""")
    assert len(out) == 1, "35 filtered out, 120 passes"
    assert out[0]["total"] == 120.0


# -- multiple independent streams (rs:342-360) ----------------------------------


def test_multiple_independent_streams(spark):
    out = run(spark, """
stream HighTemp = TempReading
    .where(temp > 100.0)
    .emit(kind: "high", val: temp)

stream LowPressure = PressureReading
    .where(pressure < 50.0)
    .emit(kind: "low", val: pressure)
""", """
TempReading { temp: 150.0 }
PressureReading { pressure: 30.0 }
TempReading { temp: 80.0 }
""")
    assert len(out) == 2, "one high temp + one low pressure"


# -- sequence with alias capture (rs:366-380) ------------------------------------


def test_sequence_with_event_filters(spark):
    out = run(spark, """
stream S = Login as a
    -> Purchase as b
    .emit(user: a.user, item: b.item)
""", 'Login { user: "bob" }\n@100 Purchase { item: "laptop" }\n')
    assert len(out) == 1
    assert out[0]["user"] == "bob" and out[0]["item"] == "laptop"


# -- aggregate batteries (rs:386-472) ---------------------------------------------


def test_aggregate_multiple_functions(spark):
    out = run(spark, """
stream S = Reading
    .window(4)
    .aggregate(cnt: count(), mn: min(value), mx: max(value), av: avg(value))
    .emit(cnt: cnt, mn: mn, mx: mx, av: av)
""", """
Reading { value: 10.0 }
Reading { value: 20.0 }
Reading { value: 30.0 }
Reading { value: 40.0 }
""")
    assert len(out) == 1
    r = out[0]
    assert r["mn"] == pytest.approx(10.0) and r["mx"] == pytest.approx(40.0)
    assert r["av"] == pytest.approx(25.0) and r["cnt"] == 4


def test_aggregate_last_function(spark):
    out = run(spark, """
stream S = Reading
    .window(3)
    .aggregate(latest: last(value), first_val: first(value))
    .emit(latest: latest, first_val: first_val)
""", """
Reading { value: 10.0 }
@100 Reading { value: 20.0 }
@200 Reading { value: 30.0 }
""")
    assert len(out) == 1
    assert out[0]["latest"] == pytest.approx(30.0)
    assert out[0]["first_val"] == pytest.approx(10.0)


def test_aggregate_count_distinct(spark):
    out = run(spark, """
stream S = Reading
    .window(5)
    .aggregate(unique: count_distinct(region))
    .emit(unique: unique)
""", """
Reading { region: "east", value: 10.0 }
Reading { region: "west", value: 20.0 }
Reading { region: "east", value: 30.0 }
Reading { region: "south", value: 40.0 }
Reading { region: "west", value: 50.0 }
""")
    assert len(out) == 1
    assert int(out[0]["unique"]) == 3


# -- sequences: 3-step, wrong order (rs:478-512) -----------------------------------


def test_three_step_sequence(spark):
    out = run(spark, """
stream S = A as a -> B as b -> C as c
    .emit(val_a: a.x, val_b: b.x, val_c: c.x)
""", "A { x: 1 }\n@100 B { x: 2 }\n@200 C { x: 3 }\n")
    assert len(out) == 1
    assert (out[0]["val_a"], out[0]["val_b"], out[0]["val_c"]) == (1, 2, 3)


def test_sequence_wrong_order_no_match(spark):
    out = run(spark, """
stream S = A -> B -> C
""", "C { x: 3 }\n@100 B { x: 2 }\n@200 A { x: 1 }\n")
    assert out == []


# -- batch processing produces output (rs:518-541, our only mode) ------------------


def test_batch_processing_produces_output(spark):
    out = run(spark, """
stream S = Tick
    .emit(val: x)
""", "Tick { x: 1 }\nTick { x: 2 }\nTick { x: 3 }\n")
    assert len(out) == 3


# -- tumbling count window fills (rs:547-567) ----------------------------------------


def test_count_window_multiple_fills(spark):
    out = run(spark, """
stream S = Reading
    .window(2)
    .aggregate(total: sum(value))
    .emit(total: total)
""", """
Reading { value: 10.0 }
Reading { value: 20.0 }
Reading { value: 30.0 }
Reading { value: 40.0 }
""")
    assert len(out) == 2
    assert sorted(r["total"] for r in out) == [30.0, 70.0]


# -- derived stream as sequence source (rs:573-589) ----------------------------------


def test_derived_stream_filters_in_sequence(spark):
    out = run(spark, """
stream HighTemp = TempReading
    .where(temp > 100.0)

stream S = HighTemp as h
    -> Alert as a
    .emit(temp: h.temp, msg: a.message)
""", 'TempReading { temp: 150.0 }\n@100 Alert { message: "warning" }\n',
        stream_name="S")
    assert len(out) == 1
    assert out[0]["temp"] == 150.0 and out[0]["msg"] == "warning"


# -- where: complex boolean / field-vs-field / strings (rs:595-614, 813-830,
#    1286-1304) ----------------------------------------------------------------------


def test_where_complex_boolean(spark):
    out = run(spark, """
stream S = Reading
    .where(value > 10.0 and value < 100.0 and region == "east")
    .emit(val: value)
""", """
Reading { value: 50.0, region: "east" }
Reading { value: 50.0, region: "west" }
Reading { value: 5.0, region: "east" }
""")
    assert len(out) == 1 and out[0]["val"] == 50.0


def test_where_accesses_event_fields(spark):
    out = run(spark, """
stream S = Reading
    .where(value > threshold)
    .emit(val: value)
""", """
Reading { value: 100.0, threshold: 50.0 }
Reading { value: 30.0, threshold: 50.0 }
""")
    assert len(out) == 1 and out[0]["val"] == 100.0


def test_where_with_string_operations(spark):
    out = run(spark, """
stream S = Log
    .where(contains(message, "ERROR"))
    .emit(msg: message)
""", """
Log { message: "INFO: all good" }
Log { message: "ERROR: something failed" }
Log { message: "WARN: be careful" }
""")
    assert len(out) == 1
    assert out[0]["msg"] == "ERROR: something failed"


# -- log / print pass-through (rs:621-631, 724-734) -----------------------------------


def test_log_operation_does_not_filter(spark):
    out = run(spark, """
stream S = Tick
    .log(level: "info", message: "got event")
    .emit(val: x)
""", "Tick { x: 42 }\n")
    assert len(out) == 1 and out[0]["val"] == 42


def test_print_operation_passes_through(spark):
    out = run(spark, """
stream S = Tick
    .print()
    .emit(val: x)
""", "Tick { x: 1 }\n")
    assert len(out) == 1


# -- emit computed expressions (rs:637-657, 1262-1280) --------------------------------


def test_emit_computed_expressions(spark):
    out = run(spark, """
stream S = Reading
    .emit(
        doubled: value * 2.0,
        label: "sensor-" + sensor_id,
        is_high: value > 50.0
    )
""", 'Reading { value: 75.0, sensor_id: "A1" }\n')
    assert len(out) == 1
    r = out[0]
    assert r["doubled"] == pytest.approx(150.0)
    assert r["label"] == "sensor-A1" and r["is_high"] is True


def test_emit_with_computed_fields_int_arith(spark):
    out = run(spark, """
stream S = Reading
    .emit(
        orig: value,
        doubled: value * 2,
        label: "sensor",
        gt50: value > 50
    )
""", "Reading { value: 30 }\n")
    assert len(out) == 1
    r = out[0]
    assert r["orig"] == 30 and r["doubled"] == 60
    assert r["label"] == "sensor" and r["gt50"] is False


# -- connector / config declaration stores (rs:663-674, 899-913) ----------------------


def test_connector_declaration_stored(spark):
    prog = parse_full(
        'connector mqtt_in = mqtt(topic: "sensors", client_id: "test")\n'
    )
    names = {c.name for c in prog.connectors}
    assert names == {"mqtt_in"}
    assert prog.connectors[0].kind == "mqtt"


def test_config_block_stored(spark):
    prog = parse_full("""
config MyConfig {
    batch_size: 1000,
    timeout: "30s"
}
""")
    assert {c.name for c in prog.configs} == {"MyConfig"}


# -- routing: unmatched types produce nothing (rs:680-698, 880-893) -------------------


def test_multiple_streams_route_different_types(spark):
    out = run(spark, """
stream HighTemp = TempReading
    .where(value > 0.0)
    .emit(val: value)

stream LowPress = PressureReading
    .where(value > 0.0)
    .emit(val: value)
""", """
TempReading { value: 10.0 }
PressureReading { value: 20.0 }
OtherEvent { value: 30.0 }
""")
    assert len(out) == 2, "only matched types produce output"


def test_unmatched_event_no_output(spark):
    out = run(spark, """
stream S = SpecificType
    .emit(val: x)
""", "OtherType { x: 1 }\n")
    assert out == []


# -- validation surfaces (rs:704-718, 943-956) ----------------------------------------


def test_validation_flags_having_without_aggregate(spark):
    from varpulis_spark.vpl.validate import validate

    res = validate(parse_full("stream S = A\n    .having(x > 0)\n"))
    assert any(d.code == "E010" for d in res.errors)


def test_validation_catches_duplicate_stream(spark):
    from varpulis_spark.vpl.validate import validate

    res = validate(parse_full("stream S = A\nstream S = B\n"))
    assert any(d.code == "E002" for d in res.errors)


# -- ema / stddev aggregates (rs:763-806, 1220-1233) ----------------------------------


def test_aggregate_ema(spark):
    out = run(spark, """
stream S = Reading
    .window(5)
    .aggregate(ema_val: ema(value, 3))
    .emit(ema: ema_val)
""", """
Reading { value: 10.0 }
@100 Reading { value: 20.0 }
@200 Reading { value: 30.0 }
@300 Reading { value: 40.0 }
@400 Reading { value: 50.0 }
""")
    assert len(out) == 1
    assert out[0]["ema"] is not None


def test_aggregate_ema_with_float_period(spark):
    out = run(spark, """
stream S = Reading
    .window(5)
    .aggregate(e: ema(value, 0.3))
    .emit(e: e)
""", "".join(f"@{i*100} Reading {{ value: {i*10}.0 }}\n" for i in range(1, 7)))
    assert len(out) == 1
    assert isinstance(out[0]["e"], float)


def test_aggregate_stddev(spark):
    out = run(spark, """
stream S = Reading
    .window(4)
    .aggregate(sd: stddev(value))
    .emit(sd: sd)
""", """
Reading { value: 10.0 }
Reading { value: 20.0 }
Reading { value: 30.0 }
Reading { value: 40.0 }
""")
    assert len(out) == 1
    assert out[0]["sd"] > 0.0


# -- sequence timeout / basic two-step (rs:836-873) -----------------------------------


def test_sequence_with_timeout_no_match(spark):
    out = run(spark, """
stream S = A as a
    -> B as b
    .within(1s)
""", "A { x: 1 }\n")
    assert out == []


def test_two_step_sequence_basic(spark):
    out = run(spark, """
stream S = A as a
    -> B as b
    .emit(ax: a.x, bx: b.x)
""", "A { x: 10 }\n@100 B { x: 20 }\n")
    assert len(out) == 1
    assert out[0]["ax"] == 10 and out[0]["bx"] == 20


# -- aggregate binary expression (rs:919-937) -----------------------------------------


def test_aggregate_binary_expression(spark):
    out = run(spark, """
stream S = Reading
    .window(3)
    .aggregate(range: max(value) - min(value))
    .emit(range: range)
""", """
Reading { value: 10.0 }
Reading { value: 50.0 }
Reading { value: 30.0 }
""")
    assert len(out) == 1
    assert out[0]["range"] == pytest.approx(40.0)


# -- wide events (rs:962-978) ----------------------------------------------------------


def test_event_with_many_fields(spark):
    out = run(spark, """
stream S = Data
    .where(f1 > 0)
    .emit(f1: f1, f2: f2, f3: f3, f4: f4, f5: f5)
""", "Data { f1: 1, f2: 2, f3: 3, f4: 4, f5: 5 }\n")
    assert len(out) == 1 and out[0]["f5"] == 5


# -- session / sliding / tumbling count windows (rs:984-1048) ---------------------------


def test_session_window_gap_splits_sessions(spark):
    out = run(spark, """
stream S = Reading
    .window(session: 5s)
    .aggregate(c: count(), s: sum(value))
""", """
Reading { value: 10.0 }
@1000 Reading { value: 10.0 }
@2000 Reading { value: 10.0 }
@20000 Reading { value: 10.0 }
""")
    assert sorted(int(r["c"]) for r in out) == [1, 3]


def test_sliding_count_window_emits_full_windows(spark):
    out = run(spark, """
stream S = Reading
    .window(3, sliding: 1)
    .aggregate(c: count(), a: avg(value))
""", "".join(f"@{i*100} Reading {{ value: {i}.0 }}\n" for i in range(1, 7)))
    assert len(out) >= 1
    assert all(int(r["c"]) == 3 for r in out)


def test_tumbling_count_window_three_fills(spark):
    out = run(spark, """
stream S = Reading
    .window(3)
    .aggregate(c: count())
""", "".join(f"Reading {{ value: {i} }}\n" for i in range(1, 10)))
    assert len(out) == 3
    assert all(int(r["c"]) == 3 for r in out)


# -- partitioned aggregate multi-key (rs:1054-1085) --------------------------------------


def test_partitioned_aggregate_multi_key(spark):
    events = []
    vals = [("east", 10.0), ("west", 20.0), ("east", 30.0),
            ("west", 40.0), ("east", 50.0), ("west", 60.0)]
    for i, (region, v) in enumerate(vals):
        events.append(f'@{i*100} Reading {{ region: "{region}", value: {v} }}')
    out = run(spark, """
stream S = Reading
    .partition_by(region)
    .window(3)
    .aggregate(c: count(), s: sum(value))
""", "\n".join(events) + "\n")
    assert len(out) == 2
    got = {r["region"]: r["s"] for r in out} if "region" in out[0] else None
    if got is not None:
        assert got == {"east": 90.0, "west": 120.0}


# -- distinct by expression keeps first (rs:1091-1122) -----------------------------------


def test_distinct_by_expression_keeps_first(spark):
    out = run(spark, """
stream S = Reading
    .distinct(region)
    .emit(region: region, value: value)
""", """
Reading { region: "east", value: 1 }
@100 Reading { region: "east", value: 2 }
@200 Reading { region: "west", value: 3 }
@300 Reading { region: "east", value: 4 }
@400 Reading { region: "west", value: 5 }
""")
    assert len(out) == 2
    got = {r["region"]: r["value"] for r in out}
    assert got == {"east": 1, "west": 3}, "first occurrence survives"


def test_limit_exact_boundary(spark):
    events = "".join(f"Reading {{ value: {i} }}\n" for i in range(1, 11))
    out = run(spark, """
stream S = Reading
    .limit(3)
    .emit(val: value)
""", events)
    assert len(out) == 3


# -- process with function + let (rs:1146-1163) -------------------------------------------


def test_process_with_function(spark):
    out = run(spark, """
fn transform():
    let v = value * 2
    emit Result(doubled: v)

stream S = Reading
    .process(transform())
""", "Reading { value: 5 }\n@100 Reading { value: 10 }\n")
    assert sorted(r["doubled"] for r in out) == [10, 20]


# -- two streams over the same event type (rs:1170-1188) ----------------------------------


def test_multiple_streams_same_event(spark):
    out = run(spark, """
stream High = Reading
    .where(value > 50)
    .emit(level: "high", val: value)

stream Low = Reading
    .where(value <= 50)
    .emit(level: "low", val: value)
""", """
Reading { value: 30 }
Reading { value: 80 }
Reading { value: 50 }
""")
    assert len(out) == 3
    levels = sorted(r["level"] for r in out)
    assert levels == ["high", "low", "low"]


# -- min/max/last over a filled window (rs:1195-1213) --------------------------------------


def test_aggregate_min_max_last(spark):
    out = run(spark, """
stream S = Reading
    .window(5)
    .aggregate(mn: min(value), mx: max(value), lt: last(value))
""", "".join(
        f"@{i*100} Reading {{ value: {v} }}\n"
        for i, v in enumerate([10.0, 20.0, 5.0, 30.0, 15.0, 1.0])
    ))
    assert len(out) == 1, "one full window of 5; the 6th event stays pending"
    r = out[0]
    assert r["mn"] == pytest.approx(5.0) and r["mx"] == pytest.approx(30.0)
    assert r["lt"] == pytest.approx(15.0)


# -- having clause over count windows (rs:1239-1255) ----------------------------------------


def test_having_clause_filters_aggregate(spark):
    out = run(spark, """
stream S = Reading
    .window(3)
    .aggregate(c: count(), s: sum(value))
    .having(s > 50)
""", "".join(
        f"Reading {{ value: {v} }}\n"
        for v in [10.0, 20.0, 30.0, 1.0, 2.0, 3.0]
    ))
    assert len(out) == 1
    assert out[0]["s"] == pytest.approx(60.0)


# -- watermark surfaces (rs:1340-1357, 1439-1451) -------------------------------------------


def test_watermark_with_ignored_kwargs_passes_through(spark):
    # the reference reads only `out_of_order:`; value/delay kwargs are
    # ignored and events flow through (engine/mod.rs:811-825)
    out = run(spark, """
stream S = Reading
    .watermark(value: timestamp, delay: 2s)
    .emit(val: value)
""", """
Reading { value: 1, timestamp: 1000 }
Reading { value: 2, timestamp: 2000 }
""")
    assert len(out) == 2


def test_allowed_lateness_setting(spark):
    out = run(spark, """
stream S = Reading
    .watermark(out_of_order: 1s)
    .allowed_lateness(5s)
    .emit(val: value)
""", "Reading { value: 1, timestamp: 1000 }\n")
    assert len(out) == 1


# -- sequence with within + cross-alias filter (rs:1364-1383) --------------------------------


def test_sequence_with_within_and_filter(spark):
    out = run(spark, """
stream S = Login as login
    -> Purchase as purchase
    .within(10s)
    .where(login.user_id == purchase.user_id)
""", """
@1000 Login { user_id: "alice" }
@3000 Purchase { user_id: "alice", amount: 99.99 }
""")
    assert len(out) == 1


# -- reload swaps filter predicate (rs:1390-1432, batch-replay analog) -----------------------


def test_engine_reload_with_new_program(spark):
    v1 = """
stream S = Reading
    .where(value > 10)
    .emit(val: value)
"""
    v2 = """
stream S = Reading
    .where(value > 50)
    .emit(val: value)
"""
    out1 = run(spark, v1, "Reading { value: 30 }\n")
    out2 = run(spark, v2, "Reading { value: 30 }\nReading { value: 60 }\n")
    assert len(out1) + len(out2) == 2


# -- trivial pass-throughs (rs:1458-1506) ------------------------------------------------


def test_score_without_model_plain_stream(spark):
    out = run(spark, """
stream S = Reading
    .emit(val: value)
""", "Reading { value: 42 }\n")
    assert len(out) == 1 and out[0]["val"] == 42


def test_process_empty_event(spark):
    out = run(spark, """
stream S = Trigger
    .emit(x: 1)
""", "Trigger { }\n")
    assert len(out) == 1 and out[0]["x"] == 1


def test_sequence_three_steps_within(spark):
    out = run(spark, """
stream S = A as a
    -> B as b
    -> C as c
    .within(10s)
""", "@1000 A { }\n@2000 B { }\n@3000 C { }\n")
    assert len(out) == 1


# -- variable mutation inside a function body (rs:1512-1528) ---------------------------------


def test_variable_mutation_in_function(spark):
    out = run(spark, """
fn gen():
    var counter = 0
    for i in 0..3:
        counter := counter + 1
    emit R(n: counter)

stream S = Trigger
    .process(gen())
""", "Trigger { }\n")
    assert len(out) == 1 and out[0]["n"] == 3
