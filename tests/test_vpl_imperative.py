"""Imperative VPL fn bodies (Stmt, core/src/ast.rs:38-106): while / if-elif-
else / let / var / `:=` / break / continue / return, indentation-delimited
blocks, `for x in <iterable>` and inclusive `..=` ranges, and `config`
declarations.

The headline fixture is the reference's mandelbrot demo
(examples/mandelbrot/mandelbrot.vpl, pinned by
crates/varpulis-runtime/tests/mandelbrot_tests.rs): a statement-bodied
`mandelbrot()` escape-time fn called from a `compute_tile()` generator that
emits one Pixel event per coordinate. We run a scaled-down tile end-to-end
through the Spark `.process` path and compare every iteration count against
an independent Python escape-time loop.
"""

import pytest

from varpulis_spark.sources.event_file import load_evt
from varpulis_spark.stream import Stream
from varpulis_spark.vpl.compiler import run_program
from varpulis_spark.vpl.parser import (
    ConfigDecl,
    FnDecl,
    IfStmt,
    LetStmt,
    WhileStmt,
    parse_full,
)


@pytest.fixture(scope="module")
def spark():
    from varpulis_spark.engine import get_spark

    return get_spark("vpl-imperative-tests")


def run_inline(spark, program: str, events: str):
    stream = Stream(load_evt(spark, events), ts_col="ts", order_col="event_id")
    return run_program(program, stream)


MANDELBROT_FNS = """
fn mandelbrot(cx: float, cy: float, max_iter: int) -> int:
    var zr = 0.0
    var zi = 0.0
    var i = 0
    while i < max_iter:
        let r2 = zr * zr
        let i2 = zi * zi
        if r2 + i2 > 4.0:
            return i
        zi := 2.0 * zr * zi + cy
        zr := r2 - i2 + cx
        i := i + 1
    return max_iter

fn compute_tile(x_off: int, y_off: int, size: int, max_iter: int):
    for px in 0..size:
        for py in 0..size:
            let cx = -2.0 + (x_off + px) * 3.0 / 1000.0
            let cy = -1.5 + (y_off + py) * 3.0 / 1000.0
            let iters = mandelbrot(cx, cy, max_iter)
            emit Pixel(x: x_off + px, y: y_off + py, iterations: iters, diverged: iters < max_iter)
"""


def py_mandelbrot(cx: float, cy: float, max_iter: int) -> int:
    zr = zi = 0.0
    for i in range(max_iter):
        r2, i2 = zr * zr, zi * zi
        if r2 + i2 > 4.0:
            return i
        zi = 2.0 * zr * zi + cy
        zr = r2 - i2 + cx
    return max_iter


def test_mandelbrot_tile_end_to_end(spark):
    """Scaled-down mandelbrot.vpl: one timer-driven tile through .process;
    every emitted pixel's iteration count matches the escape-time loop."""
    res = run_inline(
        spark,
        MANDELBROT_FNS
        + """
stream Tile = timer(10s)
    .process(compute_tile(400, 480, 6, 64))
""",
        "Dummy { x: 1 }\n",
    )
    rows = res["Tile"].collect()
    assert len(rows) == 36
    seen = set()
    for r in rows:
        assert r.event_type == "Pixel"
        cx = -2.0 + r.x * 3.0 / 1000.0
        cy = -1.5 + r.y * 3.0 / 1000.0
        want = py_mandelbrot(cx, cy, 64)
        assert r.iterations == want
        assert r.diverged == (want < 64)
        seen.add((r.x, r.y))
    assert seen == {(x, y) for x in range(400, 406) for y in range(480, 486)}


def test_mandelbrot_reference_program_parses_whole(spark):
    """The unmodified 16-tile reference program parses: 16 streams, both
    fns statement-bodied, contexts skipped, connector captured."""
    with open("/root/reference/examples/mandelbrot/mandelbrot.vpl") as f:
        prog = parse_full(f.read())
    assert len(prog.streams) == 16
    fns = {f.name: f for f in prog.fns}
    assert isinstance(fns["mandelbrot"].body, list)  # imperative
    assert any(isinstance(s, WhileStmt) for s in fns["mandelbrot"].body)
    assert isinstance(fns["compute_tile"].body, list)


def test_all_reference_examples_parse():
    """Every .vpl under the reference's examples/ parses (the parser raises
    on unknown constructs rather than skipping, so a pass means full
    construct coverage for the demo corpus)."""
    import glob

    paths = sorted(glob.glob("/root/reference/examples/**/*.vpl", recursive=True))
    assert len(paths) >= 20
    for p in paths:
        with open(p) as f:
            parse_full(f.read())


def test_imperative_fn_in_expression_position(spark):
    """A statement-bodied fn used inside .emit (mandelbrot_server.vpl shape:
    `let iters = mandelbrot(...)` — the return value flows as a scalar)."""
    res = run_inline(
        spark,
        """
fn collatz_len(n0: int) -> int:
    var n = n0
    var steps = 0
    while n > 1:
        if n % 2 == 0:
            n := n / 2
        else:
            n := 3 * n + 1
        steps := steps + 1
    return steps

stream Out = Seed
    .emit(n: n, steps: collatz_len(n))
""",
        """
Seed { n: 6 }
Seed { n: 27 }
Seed { n: 1 }
""",
    )
    rows = {r.n: r.steps for r in res["Out"].collect()}
    assert rows == {6: 8, 27: 111, 1: 0}


def test_break_continue_and_inclusive_range(spark):
    res = run_inline(
        spark,
        """
fn gen():
    var total = 0
    for i in 1..=5:
        if i == 3:
            continue
        if i == 5:
            break
        total := total + i
    emit Sum(total: total)

stream Out = timer(10s)
    .process(gen())
""",
        "Dummy { x: 1 }\n",
    )
    rows = res["Out"].collect()
    # 1 + 2 + 4 (3 skipped, loop broken at 5)
    assert [r.total for r in rows] == [7]


def test_for_over_list_expression(spark):
    res = run_inline(
        spark,
        """
fn fanout(vals):
    for v in vals:
        emit Item(v: v * 10)

stream Out = timer(10s)
    .process(fanout([1, 2, 3]))
""",
        "Dummy { x: 1 }\n",
    )
    assert sorted(r.v for r in res["Out"].collect()) == [10, 20, 30]


def test_elif_chain():
    """if/elif/else at equal indentation attaches to one IfStmt."""
    prog = parse_full(
        """
fn grade(x: int) -> str:
    if x > 90:
        return "a"
    elif x > 80:
        return "b"
    elif x > 70:
        return "c"
    else:
        return "d"
"""
    )
    (fn,) = prog.fns
    (st,) = fn.body
    assert isinstance(st, IfStmt)
    assert len(st.branches) == 3 and st.orelse is not None


def test_let_prelude_body_still_collapses_to_expression():
    """Pure `let` + final expression bodies stay expressions (inlinable
    into Catalyst Columns), not interpreted statement lists."""
    prog = parse_full(
        """
fn scaled(v: float) -> float:
    let k = 2.5
    v * k
"""
    )
    (fn,) = prog.fns
    assert not isinstance(fn.body, list)  # collapsed, Column-compilable


def test_non_terminating_while_hits_step_budget():
    from varpulis_spark.vpl.compiler import ProgramEnv, _exec_stmts

    prog = parse_full(
        """
fn spin():
    var i = 0
    while i < 1:
        i := i * 1
"""
    )
    env = ProgramEnv.__new__(ProgramEnv)
    env.fns = {f.name: f for f in prog.fns}
    env.vars, env.events, env.patterns, env.configs = {}, {}, {}, {}
    with pytest.raises(ValueError, match="step budget"):
        _exec_stmts(prog.fns[0].body, {}, env, [], budget=[10_000])


def test_config_block_parses_and_binds():
    prog = parse_full(
        """
config mqtt_broker {
    host: "localhost",
    port: 1883,
}

stream S = Reading
    .emit(v: value)
"""
    )
    (cfg,) = prog.configs
    assert isinstance(cfg, ConfigDecl)
    assert cfg.name == "mqtt_broker"
    assert set(cfg.items) == {"host", "port"}


def test_unknown_top_level_still_raises():
    with pytest.raises(SyntaxError, match="unsupported top-level"):
        parse_full("frobnicate Foo = bar\n")


def test_nested_fn_call_emits_land_in_caller_collector(spark):
    """Emits inside a callee invoked from expression position are collected
    by the active .process sink (env._emit_sink plumbing)."""
    res = run_inline(
        spark,
        """
fn side_emit(v: int) -> int:
    emit Trace(v: v)
    return v * 2

fn body(n: int):
    let d = side_emit(n)
    emit Main(doubled: d)

stream Out = timer(10s)
    .process(body(21))
""",
        "Dummy { x: 1 }\n",
    )
    rows = res["Out"].collect()
    by_type = {}
    for r in rows:
        by_type.setdefault(r.event_type, []).append(r)
    assert [r.v for r in by_type["Trace"]] == [21]
    assert [r.doubled for r in by_type["Main"]] == [42]
