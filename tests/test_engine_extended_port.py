"""Port of the reference's extended engine battery
(crates/varpulis-runtime/tests/engine_extended_tests.rs, the semantic
subset): distinct/limit edges, partitioned count/sliding windows,
multi-aggregate windows with having, select projections, derived-stream
chains and sequences, emit expressions, log/print pass-through,
process-fn fan-out, reload report shapes, and declaration accessibility.

Engine-API introspection cases with no analog here are NOT ported:
add_filter closures / new_shared / benchmark constructors /
is_stateless / partition_key / has_session_windows / event_counters are
Rust-engine planning hints Spark owns (Catalyst decides physical
strategy), and set_variable-at-runtime has no REST surface (variables
re-derive from source on replay, pinned in test_checkpoint_port)."""

import json

import pytest

from varpulis_spark.sources.event_file import load_evt
from varpulis_spark.stream import Stream
from varpulis_spark.vpl.compiler import run_program
from varpulis_spark.vpl.parser import parse_full


@pytest.fixture(scope="module")
def spark():
    from varpulis_spark.engine import get_spark

    return get_spark("engine-extended-port")


def run(spark, program: str, events: str, stream_name: str | None = None):
    res = run_program(
        program,
        Stream(load_evt(spark, events), ts_col="ts", order_col="event_id"),
    )
    if stream_name is None:
        names = list(res)
        rows = []
        for n in names:
            rows.extend(r.asDict() for r in res[n].collect())
        return rows
    return [r.asDict() for r in res[stream_name].collect()]


# -- 1. distinct (rs:57-108) ----------------------------------------------------


def test_distinct_whole_event_dedup(spark):
    out = run(spark, """
stream S = Tick
    .distinct()
    .emit(x: x, y: y)
""", """
Tick { x: 1, y: 2 }
Tick { x: 1, y: 2 }
Tick { x: 1, y: 3 }
""")
    assert len(out) == 2, "second duplicate should be dropped"


def test_distinct_field_keeps_first_of_each(spark):
    out = run(spark, """
stream S = Tick
    .distinct(id)
    .emit(id: id)
""", """
Tick { id: 1 }
Tick { id: 1 }
Tick { id: 2 }
""")
    assert sorted(r["id"] for r in out) == [1, 2]


# -- 2. limit edges (rs:117-161) --------------------------------------------------


def test_limit_zero_blocks_all(spark):
    out = run(spark, """
stream S = Tick
    .limit(0)
    .emit(val: x)
""", "Tick { x: 1 }\nTick { x: 2 }\n")
    assert out == []


def test_limit_larger_than_input(spark):
    events = "".join(f"Tick {{ x: {i} }}\n" for i in range(1, 6))
    out = run(spark, """
stream S = Tick
    .limit(100)
    .emit(val: x)
""", events)
    assert len(out) == 5


def test_first_shorthand_is_limit_one(spark):
    events = "".join(f"@{i*100} Tick {{ x: {i} }}\n" for i in range(1, 6))
    out = run(spark, """
stream S = Tick
    .first()
    .emit(val: x)
""", events)
    assert len(out) == 1 and out[0]["val"] == 1


# -- 3-4. partitioned + sliding count windows (rs:165-215, 1239-1270) ------------


def test_partition_by_count_window_aggregate(spark):
    out = run(spark, """
stream S = Reading
    .partition_by(sensor)
    .window(2)
    .aggregate(total: sum(value))
    .emit(sensor: sensor, total: total)
""", """
Reading { sensor: "A", value: 10.0 }
@100 Reading { sensor: "B", value: 20.0 }
@200 Reading { sensor: "A", value: 30.0 }
@300 Reading { sensor: "B", value: 40.0 }
""")
    assert len(out) == 2
    assert {(r["sensor"], r["total"]) for r in out} == {("A", 40.0), ("B", 60.0)}


def test_sliding_count_window_produces_multiple_outputs(spark):
    events = "".join(
        f"@{i*100} Reading {{ value: {i * 10}.0 }}\n" for i in range(1, 6)
    )
    out = run(spark, """
stream S = Reading
    .window(3, sliding: 1)
    .aggregate(total: sum(value))
    .emit(total: total)
""", events)
    assert len(out) >= 3, f"sliding count window: got {len(out)} outputs"


def test_partitioned_sliding_count_window(spark):
    events = []
    for i in range(6):
        sensor = "A" if i % 2 == 0 else "B"
        events.append(f'@{i*100} Reading {{ sensor: "{sensor}", value: {i}.0 }}')
    out = run(spark, """
stream S = Reading
    .partition_by(sensor)
    .window(2, sliding: 1)
    .aggregate(c: count())
    .emit(sensor: sensor, c: c)
""", "\n".join(events) + "\n")
    # each sensor has 3 events → windows fire per partition
    assert len(out) >= 4


# -- 9. distinct + limit interaction (rs:506-529) ---------------------------------


def test_distinct_and_limit_compose(spark):
    out = run(spark, """
stream S = Tick
    .distinct(id)
    .limit(2)
    .emit(id: id)
""", """
Tick { id: 1 }
@100 Tick { id: 1 }
@200 Tick { id: 2 }
@300 Tick { id: 3 }
@400 Tick { id: 4 }
""")
    assert sorted(r["id"] for r in out) == [1, 2], \
        "dedup first, then limit 2 → exactly the first two distinct ids"


# -- 10. sequences (rs:533-589) -----------------------------------------------------


def test_sequence_with_within_cross_ref(spark):
    out = run(spark, """
stream S = Order as order
    -> Payment where amount == order.total as pay
    .within(10s)
    .emit(order_id: order.id, paid: pay.amount)
""", """
Order { id: 100, total: 50.0 }
@1000 Payment { amount: 50.0 }
""")
    assert len(out) == 1
    assert out[0]["order_id"] == 100 and out[0]["paid"] == 50.0


def test_sequence_three_step_chain(spark):
    out = run(spark, """
stream Pipeline = Start as s
    -> Middle as m
    -> End as e
    .within(30s)
    .emit(label: "complete")
""", """
Start { x: 1 }
@1000 Middle { x: 2 }
@2000 End { x: 3 }
""")
    assert len(out) == 1 and out[0]["label"] == "complete"


def test_sequence_no_match_when_out_of_order(spark):
    out = run(spark, """
stream S = A -> B -> C
    .emit(ok: "yes")
""", """
C { x: 1 }
@100 B { x: 2 }
@200 A { x: 3 }
""")
    assert out == []


# -- 11. edge cases (rs:591-655) -----------------------------------------------------


def test_processing_event_with_no_matching_stream(spark):
    out = run(spark, """
stream S = Alpha
    .emit(val: x)
""", "Beta { x: 1 }\nGamma { x: 2 }\n")
    assert out == []


def test_program_with_only_event_decls(spark):
    res = run_program("""
event Sensor:
    temp: float
    humidity: float
""", Stream(load_evt(spark, "Sensor { temp: 25.0, humidity: 60.0 }\n"),
            ts_col="ts", order_col="event_id"))
    assert res == {}, "event-only program produces no streams"


def test_multiple_streams_consuming_same_event_type(spark):
    evt = (
        "Temp { value: 150.0 }\n"
        "@100 Temp { value: -10.0 }\n"
        "@200 Temp { value: 50.0 }\n"
    )
    res = run_program("""
stream Hot = Temp
    .where(value > 100.0)
    .emit(kind: "hot", v: value)

stream Cold = Temp
    .where(value < 0.0)
    .emit(kind: "cold", v: value)

stream Warm = Temp
    .where(value >= 0.0 and value <= 100.0)
    .emit(kind: "warm", v: value)
""", Stream(load_evt(spark, evt), ts_col="ts", order_col="event_id"))
    kinds = []
    for n in ("Hot", "Cold", "Warm"):
        kinds.extend(r.kind for r in res[n].collect())
    assert sorted(kinds) == ["cold", "hot", "warm"]


# -- 16. window + aggregate combos (rs:852-930) --------------------------------------


def test_count_window_with_multiple_aggregates(spark):
    events = "".join(
        f"@{i*100} Sensor {{ value: {v}.0 }}\n"
        for i, v in enumerate([10, 20, 30, 40])
    )
    out = run(spark, """
stream S = Sensor
    .window(4)
    .aggregate(cnt: count(), s: sum(value), mn: min(value), mx: max(value), av: avg(value))
    .emit(cnt: cnt, s: s, mn: mn, mx: mx, av: av)
""", events)
    (row,) = out
    assert row["cnt"] == 4 and abs(row["av"] - 25.0) < 1e-3
    assert abs(row["mn"] - 10.0) < 1e-3 and abs(row["mx"] - 40.0) < 1e-3


def test_window_with_having_filter(spark):
    events = "".join(
        f"@{i*100} Sensor {{ value: {v}.0 }}\n"
        for i, v in enumerate([10, 20, 30, 50, 60, 40])
    )
    out = run(spark, """
stream S = Sensor
    .window(3)
    .aggregate(total: sum(value))
    .having(total > 100.0)
    .emit(total: total)
""", events)
    assert len(out) == 1 and abs(out[0]["total"] - 150.0) < 1e-3


def test_partitioned_aggregate_with_having(spark):
    evt = (
        'Sale { region: "west", amount: 100.0 }\n'
        '@100 Sale { region: "east", amount: 5.0 }\n'
        '@200 Sale { region: "west", amount: 200.0 }\n'
        '@300 Sale { region: "east", amount: 10.0 }\n'
    )
    out = run(spark, """
stream S = Sale
    .partition_by(region)
    .window(2)
    .aggregate(total: sum(amount))
    .having(total > 50.0)
    .emit(region: region, total: total)
""", evt)
    assert len(out) == 1
    assert out[0]["region"] == "west" and abs(out[0]["total"] - 300.0) < 1e-3


# -- 17. select projection (rs:908-927) -----------------------------------------------


def test_select_projects_specific_fields(spark):
    out = run(spark, """
stream S = Data
    .select(a: x, doubled: x * 2)
    .emit(a: a, doubled: doubled)
""", 'Data { x: 5, y: 100, z: "noise" }\n')
    (row,) = out
    assert row["a"] == 5 and row["doubled"] == 10


# -- 18. derived streams (rs:929-952, 1105-1133) --------------------------------------


def test_derived_stream_in_sequence(spark):
    evt = "Reading { temp: 200.0 }\n@1000 Ack { ok: 1 }\n"
    res = run_program("""
stream HighTemp = Reading
    .where(temp > 100.0)
    .emit(temp: temp)

stream Alert = HighTemp as ht
    -> Ack as ack
    .emit(msg: "alert acknowledged")
""", Stream(load_evt(spark, evt), ts_col="ts", order_col="event_id"))
    rows = res["Alert"].collect()
    assert len(rows) == 1 and rows[0].msg == "alert acknowledged"


def test_chain_depth_three_levels(spark):
    evt = "Raw { val: 10 }\n@100 Raw { val: -3 }\n"
    res = run_program("""
stream L1 = Raw
    .where(val > 0)
    .emit(val: val)

stream L2 = L1
    .where(val > 5)
    .emit(val: val)

stream L3 = L2
    .emit(val: val)
""", Stream(load_evt(spark, evt), ts_col="ts", order_col="event_id"))
    rows = res["L3"].collect()
    assert len(rows) == 1 and rows[0].val == 10


# -- 21-22. emit expressions + log/print pass-through (rs:1013-1055) -------------------


def test_emit_with_arithmetic_expression(spark):
    out = run(spark, """
stream S = Tick
    .emit(doubled: x * 2, sum: x + y, label: "computed")
""", "Tick { x: 5, y: 3 }\n")
    (row,) = out
    assert row["doubled"] == 10 and row["sum"] == 8
    assert row["label"] == "computed"


def test_log_and_print_do_not_filter(spark):
    out = run(spark, """
stream S = Tick
    .log(level: "debug", message: "test")
    .print()
    .emit(val: x)
""", "Tick { x: 1 }\n")
    assert len(out) == 1 and out[0]["val"] == 1


# -- 25. filter alias + map error (rs:1200-1237) ---------------------------------------


def test_filter_alias_behaves_like_where(spark):
    events = "".join(f"@{i*100} Tick {{ x: {i} }}\n" for i in range(1, 11))
    out = run(spark, """
stream S = Tick
    .filter(x > 5)
    .emit(val: x)
""", events)
    assert sorted(r["val"] for r in out) == [6, 7, 8, 9, 10]


def test_map_operation_is_rejected(spark):
    """rs:1218-1237: `.map()` is a load-time error (E090 here)."""
    from varpulis_spark.vpl.validate import validate

    prog = parse_full("""
stream S = Tick
    .map(x * 2)
    .emit(val: x)
""")
    v = validate(prog)
    assert any(d.code == "E090" for d in v.errors)


# -- 26. fn declarations + process fan-out (rs:1279-1326) ------------------------------


def test_function_declaration_accessible(spark):
    prog = parse_full("""
fn double(x: int) -> int:
    return x * 2

fn triple(x: int) -> int:
    return x * 3

stream S = Tick
    .emit(val: double(x))
""")
    names = {f.name for f in prog.fns}
    assert names == {"double", "triple"}
    out = run(spark, """
fn double(x: int) -> int:
    return x * 2

stream S = Tick
    .emit(val: double(x))
""", "Tick { x: 21 }\n")
    assert out[0]["val"] == 42


def test_process_function_multiple_emits(spark):
    out = run(spark, """
fn fan_out(v: int):
    emit Out(i: 1, v: v)
    emit Out(i: 2, v: v)
    emit Out(i: 3, v: v)

stream S = Tick
    .process(fan_out(x))
""", "Tick { x: 7 }\n")
    assert len(out) == 3
    assert sorted(r["i"] for r in out) == [1, 2, 3]
    assert all(r["v"] == 7 for r in out)


# -- 27. variables accessible (rs:1328-1347) -------------------------------------------


def test_variables_map_accessible(spark):
    prog = parse_full("""
var x: int = 10
var y: str = "hello"

stream S = Tick
    .emit(val: v)
""")
    decls = {v.name: v for v in prog.vars}
    assert set(decls) == {"x", "y"}


# -- 7. reload report shapes through the REST plane (rs:269-423) -----------------------


def test_reload_empty_report_for_identical_program(spark, request):
    from varpulis_spark.api import PipelineServer

    srv = PipelineServer(spark)
    request.addfinalizer(srv.stop)
    src = "stream S = Tick\n    .emit(val: x)\n"
    st, r = srv.handle("POST", "/api/v1/pipelines",
                       json.dumps({"name": "ident", "source": src}).encode(), {})
    pid = r["id"]
    st, rep = srv.handle("POST", f"/api/v1/pipelines/{pid}/reload",
                         json.dumps({"source": src}).encode(), {})
    assert st == 200
    assert rep["streams_added"] == [] and rep["streams_removed"] == []
    assert rep["streams_updated"] == [] and rep["state_preserved"] == ["S"]


def test_global_var_readable_in_fn_body(spark):
    """r9: a declared global `var` is READABLE inside .process fn bodies
    (it initialized to None and `counter := counter + 1` crashed).
    Writes stay local to the invocation — a distributed engine cannot
    sequence global mutation across executors (documented divergence
    from the single-process reference's engine-global set_variable)."""
    out = run(spark, """
var counter: int = 10

fn tick():
    counter := counter + 1
    emit Out(n: counter, doubled: counter * 2)

stream S = Tick
    .process(tick())
""", "Tick { x: 1 }\n@100 Tick { x: 2 }\n")
    assert [r["n"] for r in out] == [11, 11]
    assert all(r["doubled"] == 22 for r in out)
