"""Port of the reference's deep pipeline battery
(crates/varpulis-runtime/tests/pipeline_deep_tests.rs, semantic subset):
select projections (constants, timestamp preservation, chaining with
where), distinct by expression / whole event, limit edges, having,
emit expressions (if/then/else, arithmetic, missing-field fallback),
log/print pass-through, cross-call state accumulation (limit/distinct
through the per-event REST path), pattern-analyzer source forms, and
multi-derived-stream fan-out.

Sync/async twins in the reference exercise the SAME semantics through
two engine entry points; each is ported once (Spark has one entry)."""

import json

import pytest

from varpulis_spark.sources.event_file import load_evt
from varpulis_spark.stream import Stream
from varpulis_spark.vpl.compiler import run_program


@pytest.fixture(scope="module")
def spark():
    from varpulis_spark.engine import get_spark

    return get_spark("pipeline-deep-port")


def run(spark, program: str, events: str, stream_name: str | None = None):
    res = run_program(
        program,
        Stream(load_evt(spark, events), ts_col="ts", order_col="event_id"),
    )
    if stream_name is None:
        (stream_name,) = res
    return [r.asDict() for r in res[stream_name].collect()]


# -- 1. select (rs:57-128) --------------------------------------------------------


def test_select_projects_only_named_fields(spark):
    out = run(spark, """
stream S = Data
    .select(a: x, b: y * 2)
    .emit(a: a, b: b)
""", "Data { x: 10, y: 5, z: 999 }\n")
    (row,) = out
    assert row["a"] == 10 and row["b"] == 10
    assert "z" not in row, "select must drop unnamed fields"


def test_select_with_string_constant(spark):
    out = run(spark, """
stream S = Data
    .select(label: "fixed", val: x + 1)
    .emit(label: label, val: val)
""", "Data { x: 4 }\n")
    (row,) = out
    assert row["label"] == "fixed" and row["val"] == 5


def test_select_preserves_timestamp(spark):
    res = run_program("""
stream S = Data
    .select(val: x)
    .emit(val: val)
""", Stream(load_evt(spark, "@1000 Data { x: 42 }\n"), ts_col="ts",
            order_col="event_id"))
    (row,) = res["S"].collect()
    assert row.ts is not None, "emit output keeps the envelope timestamp"


# -- 3. distinct (rs:131-200) --------------------------------------------------------


def test_distinct_by_expression_deduplicates(spark):
    events = "\n".join(
        f'@{i*100} Tick {{ id: {i}, category: "{c}" }}'
        for i, c in enumerate(["A", "A", "B", "B", "C"], 1)
    ) + "\n"
    out = run(spark, """
stream S = Tick
    .distinct(category)
    .emit(id: id, category: category)
""", events)
    assert len(out) == 3, "one event per unique category"
    assert sorted(r["category"] for r in out) == ["A", "B", "C"]


def test_distinct_sync_with_expression(spark):
    events = "\n".join(
        f'@{i*100} Tick {{ region: "{r}" }}'
        for i, r in enumerate(["US", "EU", "US", "EU", "AP"], 1)
    ) + "\n"
    out = run(spark, """
stream S = Tick
    .distinct(region)
    .emit(region: region)
""", events)
    assert sorted(r["region"] for r in out) == ["AP", "EU", "US"]


# -- 8. having (rs:267-306) -----------------------------------------------------------


def test_having_filters_low_count_results(spark):
    events = "\n".join(
        f'@{i*100} Click {{ page: "{p}" }}'
        for i, p in enumerate(["home", "home", "home", "about"], 1)
    ) + "\n"
    out = run(spark, """
stream S = Click
    .partition_by(page)
    .window(3)
    .aggregate(n: count())
    .having(n >= 3)
    .emit(page: page, n: n)
""", events)
    assert len(out) == 1 and out[0]["page"] == "home" and out[0]["n"] == 3


# -- 11-12. print/log with expressions (rs:399-485) ----------------------------------


def test_print_with_expressions_passthrough(spark):
    out = run(spark, """
stream S = Tick
    .print(x, x * 2)
    .emit(val: x)
""", "Tick { x: 3 }\n")
    assert len(out) == 1 and out[0]["val"] == 3


def test_log_all_levels_passthrough(spark):
    src_lines = ["stream S = Tick"]
    for lvl in ("debug", "info", "warn", "error"):
        src_lines.append(f'    .log(level: "{lvl}", message: "m")')
    src_lines.append("    .emit(val: x)")
    out = run(spark, "\n".join(src_lines) + "\n", "Tick { x: 1 }\n")
    assert len(out) == 1, "log at every level passes events through"


# -- 13-15. emit expressions (rs:488-562) ---------------------------------------------


def test_emit_expr_arithmetic(spark):
    out = run(spark, """
stream S = Tick
    .emit(sum: x + y, product: x * y)
""", "Tick { x: 3, y: 4 }\n")
    (row,) = out
    assert row["sum"] == 7 and row["product"] == 12


def test_emit_expr_with_if_then_else(spark):
    out = run(spark, """
stream S = Tick
    .emit(x: x, label: if x > 10 then "big" else "small")
""", "Tick { x: 20 }\n@100 Tick { x: 5 }\n")
    got = {r["x"]: r["label"] for r in out}
    assert got == {20: "big", 5: "small"}


def test_emit_expr_computed_negation(spark):
    out = run(spark, """
stream S = Tick
    .emit(neg: x * -1, abs_y: if y < 0 then y * -1 else y)
""", "Tick { x: 5, y: -3 }\n")
    (row,) = out
    assert row["neg"] == -5 and row["abs_y"] == 3


# -- 16. early termination (rs:565-598) -----------------------------------------------


def test_pipeline_stops_early_when_where_filters_all(spark):
    out = run(spark, """
stream S = Tick
    .where(x > 100)
    .emit(val: x)
""", "Tick { x: 1 }\n@100 Tick { x: 2 }\n")
    assert out == []


# -- 20-21. state accumulates across per-event calls (rs:660-737) --------------------
# The reference feeds events one process() call at a time; our per-event
# path is the REST control plane — limit/distinct state must persist
# across SEPARATE injections.


def _rest_pipeline(spark, request, src, name):
    from varpulis_spark.api import PipelineServer

    srv = PipelineServer(spark)
    request.addfinalizer(srv.stop)
    st, r = srv.handle("POST", "/api/v1/pipelines",
                       json.dumps({"name": name, "source": src}).encode(), {})
    assert st == 200, r
    pid = r["id"]

    def inject(etype, fields):
        st, r = srv.handle("POST", f"/api/v1/pipelines/{pid}/events",
                           json.dumps({"event_type": etype,
                                       "fields": fields}).encode(), {})
        assert st == 200, r
        return r["output_events"]

    return inject


def test_limit_accumulates_across_process_calls(spark, request):
    inject = _rest_pipeline(spark, request, """
event Tick:
    x: int

stream S = Tick
    .limit(3)
    .emit(val: x)
""", "limit-acc")
    total = 0
    for i in range(1, 6):
        total += len(inject("Tick", {"x": i}))
    assert total == 3, "limit(3) caps TOTAL output across injections"


def test_distinct_remembers_across_process_calls(spark, request):
    inject = _rest_pipeline(spark, request, """
event Tick:
    id: int

stream S = Tick
    .distinct(id)
    .emit(id: id)
""", "distinct-acc")
    total = 0
    for i in (1, 2, 1, 3):
        total += len(inject("Tick", {"id": i}))
    assert total == 3, "id=1 from injection 1 must stay remembered"


# -- 22-23. chained ops (rs:740-783) ---------------------------------------------------


def test_select_then_where_filters_on_projected_field(spark):
    events = "".join(
        f"@{i*100} Data {{ x: {x} }}\n" for i, x in enumerate([3, 7, 10], 1)
    )
    out = run(spark, """
stream S = Data
    .select(doubled: x * 2)
    .where(doubled > 10)
    .emit(doubled: doubled)
""", events)
    assert sorted(r["doubled"] for r in out) == [14, 20]


def test_complex_chain_where_select_limit_emit(spark):
    events = "".join(
        f"@{(i+6)*100} Data {{ x: {x} }}\n" for i, x in enumerate(range(-5, 11))
    )
    out = run(spark, """
stream S = Data
    .where(x > 0)
    .select(doubled: x * 2)
    .limit(3)
    .emit(doubled: doubled)
""", events)
    assert sorted(r["doubled"] for r in out) == [2, 4, 6], \
        "first 3 positive x events in arrival order"


# -- 24-26. pattern analyzer source forms (rs:785-830) ---------------------------------


def test_pattern_analyzer_ident_source(spark):
    out = run(spark, """
stream S = A as a -> B as b -> C as c
    .within(10s)
    .emit(result: "matched")
""", "A { x: 1 }\n@100 B { x: 2 }\n@200 C { x: 3 }\n")
    assert len(out) == 1 and out[0]["result"] == "matched"


def test_pattern_analyzer_all_with_alias_source(spark):
    # `all T as x` = Kleene at position 0
    out = run(spark, """
stream S = all SensorReading as readings
    .within(60s)
    .emit(matched: "yes", n: count(readings))
""", "SensorReading { v: 1 }\n@100 SensorReading { v: 2 }\n")
    assert out, "Kleene-at-source must compile and match"
    # count(kleene_alias) = closure size (r9: only len() lowered before)
    assert max(r["n"] for r in out) == 2


def test_pattern_analyzer_kleene_in_followed_by(spark):
    out = run(spark, """
stream S = Start as start
    -> all Tick as ticks
    .within(10s)
    .emit(result: "done")
""", "Start { x: 0 }\n@100 Tick { x: 1 }\n@200 Tick { x: 2 }\n")
    assert out, "Start -> all Tick must compile and match"


# -- 28-31. where combinators + multi-derived (rs:980-1126) -----------------------------


def test_where_expr_with_and_or(spark):
    events = "".join(
        f"@{i*100} Tick {{ x: {x}, y: {y} }}\n"
        for i, (x, y) in enumerate([(5, 5), (15, 5), (5, 25), (15, 25)], 1)
    )
    out = run(spark, """
stream S = Tick
    .where((x > 10 and y < 10) or y > 20)
    .emit(x: x, y: y)
""", events)
    got = sorted((r["x"], r["y"]) for r in out)
    assert got == [(5, 25), (15, 5), (15, 25)]


def test_aggregate_min_max(spark):
    events = "".join(
        f"@{i*100} Sensor {{ value: {v}.0 }}\n"
        for i, v in enumerate([30, 10, 20], 1)
    )
    out = run(spark, """
stream S = Sensor
    .window(3)
    .aggregate(mn: min(value), mx: max(value))
    .emit(mn: mn, mx: mx)
""", events)
    (row,) = out
    assert row["mn"] == 10.0 and row["mx"] == 30.0


def test_aggregate_count_only(spark):
    events = "".join(f"@{i*100} Tick {{ x: {i} }}\n" for i in range(1, 5))
    out = run(spark, """
stream S = Tick
    .window(2)
    .aggregate(n: count())
    .emit(n: n)
""", events)
    assert [r["n"] for r in out] == [2, 2]


def test_multiple_derived_from_same_parent(spark):
    evt = "Base { v: 5 }\n@100 Base { v: 50 }\n"
    res = run_program("""
stream Parent = Base
    .emit(v: v)

stream SmallOnly = Parent
    .where(v < 10)
    .emit(v: v)

stream BigOnly = Parent
    .where(v >= 10)
    .emit(v: v)
""", Stream(load_evt(spark, evt), ts_col="ts", order_col="event_id"))
    assert [r.v for r in res["SmallOnly"].collect()] == [5]
    assert [r.v for r in res["BigOnly"].collect()] == [50]


def test_select_multiple_events_preserves_event_type(spark):
    res = run_program("""
stream S = Data
    .select(val: x)
    .emit(val: val)
""", Stream(load_evt(spark, "Data { x: 1 }\n@100 Data { x: 2 }\n"),
            ts_col="ts", order_col="event_id"))
    rows = res["S"].collect()
    assert len(rows) == 2
    assert all(r.event_type == "S" for r in rows), \
        "emitted events carry the stream's type"


def test_distinct_large_batch_no_crash(spark):
    events = "".join(
        f"@{i} Tick {{ id: {i % 50} }}\n" for i in range(500)
    )
    out = run(spark, """
stream S = Tick
    .distinct(id)
    .emit(id: id)
""", events)
    assert len(out) == 50
