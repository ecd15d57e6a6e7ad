"""Compile-time declaration loops (parser/src/expand.rs) + VPL imports
(varpulis-cli/src/main.rs:2991) + the hard parse error for unknown
top-level constructs (replacing the round-6 silent skip)."""

import pytest

from varpulis_spark.vpl.expand import expand_declaration_loops
from varpulis_spark.vpl.parser import parse_full


# ---------------------------------------------------------------------------
# text-level expansion semantics (expand.rs test parity)
# ---------------------------------------------------------------------------


def test_simple_expansion():
    out = expand_declaration_loops("for i in 0..3:\n    context c{i}\n")
    assert out.strip() == "context c0\ncontext c1\ncontext c2"


def test_nested_expansion():
    out = expand_declaration_loops(
        "for r in 0..2:\n    for c in 0..2:\n        context t{r}{c}\n"
    )
    for tile in ("t00", "t01", "t10", "t11"):
        assert f"context {tile}" in out
    assert out.count("context") == 4


def test_inclusive_range():
    out = expand_declaration_loops("for i in 0..=2:\n    context c{i}\n")
    assert out.count("context") == 3


def test_empty_range():
    out = expand_declaration_loops("for i in 0..0:\n    context c{i}\n")
    assert "context" not in out


def test_no_expansion_inside_fn():
    src = "fn foo():\n    for i in 0..3:\n        let x = {i}\n"
    assert "for i in 0..3:" in expand_declaration_loops(src)


def test_expression_substitution():
    out = expand_declaration_loops(
        "for i in 0..2:\n    stream S{i} = E{i}\n        .process(f({i} * 10))\n"
    )
    assert ".process(f(0 * 10))" in out
    assert ".process(f(1 * 10))" in out


def test_preserves_non_loop_lines():
    src = (
        'connector X = mqtt (host: "localhost")\n\n'
        "for i in 0..2:\n    context c{i}\n\nfn foo():\n    return 1\n"
    )
    out = expand_declaration_loops(src)
    assert "connector X" in out and "fn foo():" in out
    assert "context c0" in out and "context c1" in out


def test_iteration_cap():
    with pytest.raises(SyntaxError, match="range too large"):
        expand_declaration_loops("for i in 0..20000:\n    context c{i}\n")


# ---------------------------------------------------------------------------
# end-to-end: loop-generated streams actually run
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def spark():
    from varpulis_spark.engine import get_spark

    return get_spark("expand-tests")


EVENTS = """
Reading { sensor: 0, value: 10.0 }
Reading { sensor: 1, value: 20.0 }
Reading { sensor: 2, value: 30.0 }
Reading { sensor: 1, value: 25.0 }
"""


def _run(spark, program, events=EVENTS, **kw):
    from varpulis_spark.sources.event_file import load_evt
    from varpulis_spark.stream import Stream
    from varpulis_spark.vpl.compiler import run_program

    stream = Stream(load_evt(spark, events), ts_col="ts", order_col="event_id")
    return run_program(program, stream, **kw)


def test_loop_generated_streams_run(spark):
    res = _run(spark, """
for s in 0..3:
    stream Sensor{s} = Reading
        .where(sensor == {s})
        .emit(sensor_id: {s}, v: value)
""")
    assert set(res) == {"Sensor0", "Sensor1", "Sensor2"}
    assert res["Sensor0"].count() == 1
    assert res["Sensor1"].count() == 2
    assert [r.v for r in res["Sensor2"].collect()] == [30.0]


def test_unknown_top_level_construct_raises():
    with pytest.raises(SyntaxError, match="unsupported top-level construct"):
        parse_full("stream A = E\n    .emit(x: 1)\n\nwibble Q9 = zorp(1)\n")


# ---------------------------------------------------------------------------
# imports (main.rs resolve_imports)
# ---------------------------------------------------------------------------


def test_import_two_file_program(spark, tmp_path):
    (tmp_path / "lib.vpl").write_text(
        "fn hot(v: float) -> bool:\n    v > 15.0\n"
        "\nstream LibHot = Reading\n    .where(hot(value))\n    .emit(v: value)\n"
    )
    main = 'import "lib.vpl"\n\nstream Main = Reading\n    .where(hot(value * 2.0))\n    .emit(v: value)\n'
    res = _run(spark, main, base_path=str(tmp_path))
    assert set(res) == {"LibHot", "Main"}
    assert res["LibHot"].count() == 3  # 20, 30, 25
    assert res["Main"].count() == 4  # all values*2 > 15


def test_import_cycle_is_safe(tmp_path):
    (tmp_path / "a.vpl").write_text('import "b.vpl"\nevent A:\n    x: int\n')
    (tmp_path / "b.vpl").write_text('import "a.vpl"\nevent B:\n    y: int\n')
    prog = parse_full('import "a.vpl"', base_path=str(tmp_path))
    assert {e.name for e in prog.events} == {"A", "B"}


def test_import_missing_file_raises(tmp_path):
    with pytest.raises(SyntaxError, match="failed to read VPL import"):
        parse_full('import "nope.vpl"', base_path=str(tmp_path))
