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


def test_nullary_imperative_fn_in_expression_position(spark):
    """A zero-parameter statement-bodied fn in expression position: the
    pandas UDF gets a dummy length-carrier column (PySpark rejects 0-arg
    series UDFs, and zip(*[]) would yield an empty batch)."""
    res = run_inline(
        spark,
        """
fn magic() -> int:
    var total = 0
    for i in 1..=4:
        total := total + i
    return total

stream Out = Seed
    .emit(n: n, m: magic())
""",
        """
Seed { n: 1 }
Seed { n: 2 }
Seed { n: 3 }
""",
    )
    rows = {r.n: r.m for r in res["Out"].collect()}
    assert rows == {1: 10, 2: 10, 3: 10}


def test_int_mod_exact_above_2_53(spark):
    """Int % Int is exact i64 truncated remainder, not f64 fmod: for
    |operands| >= 2^53 fmod loses low bits ((2^60+7) % 10 is 3, fmod says
    6). Covers interpreter and compiled paths plus negative dividends
    (evaluator.rs:1093-1103 sign-of-dividend semantics)."""
    from varpulis_spark.vpl.compiler import vpl_mod
    from varpulis_spark.vpl.pycompile import compile_fns
    from varpulis_spark.vpl.parser import parse_full

    assert vpl_mod(2**60 + 7, 10) == 3
    assert vpl_mod(-(2**60 + 7), 10) == -3
    assert vpl_mod(2**60 + 7, -10) == 3
    assert vpl_mod(7, 3) == 1 and vpl_mod(-7, 3) == -1
    assert vpl_mod(5, 0) is None
    assert vpl_mod(7.5, 2.0) == 1.5  # float path stays fmod

    prog = parse_full(
        """
fn big_mod(a: int, b: int) -> int:
    return a % b
"""
    )
    compiled = compile_fns({f.name: f for f in prog.fns}, {})
    assert compiled["big_mod"](2**60 + 7, 10, [], [10_000]) == 3


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


def test_pycompile_equivalence_and_engagement():
    """The compile-to-Python fast path (vpl/pycompile.py) must engage for
    the mandelbrot fns and produce a bit-identical emit stream and return
    values vs the AST interpreter across a randomized input sweep."""
    import random

    from varpulis_spark.vpl.compiler import ProgramEnv, _FnReturn, _exec_stmts
    from varpulis_spark.vpl.pycompile import compile_body, compile_fns

    prog = parse_full(
        MANDELBROT_FNS
        + """
fn mixer(a: int, b: float) -> float:
    var acc = 0.0
    let xs = [a, a + 1, a + 2]
    for x in xs:
        if x % 2 == 0:
            continue
        acc := acc + x * b
    let first = xs[0] ?? -1
    let missing = xs[9] ?? -1
    for k in 1..=3:
        acc := acc + k
    emit Mix(acc: acc, first: first, missing: missing)
    return acc + len(xs) + sum(map(xs, v => v * 2))
"""
    )
    fns = {f.name: f for f in prog.fns}
    compiled = compile_fns(fns, {})
    assert compiled is not None  # fast path engages for the demo corpus

    env = ProgramEnv.__new__(ProgramEnv)
    env.fns, env.vars, env.events, env.patterns, env.configs = fns, {}, {}, {}, {}
    env._emit_sink = None

    def interp(name, args):
        inner = dict(zip([p for p, _t in fns[name].params], args))
        out: list = []
        try:
            _exec_stmts(fns[name].body, inner, env, out)
            return None, out
        except _FnReturn as r:
            return r.value, out

    rng = random.Random(7)
    for _ in range(100):
        cx, cy = rng.uniform(-2, 1), rng.uniform(-1.5, 1.5)
        want, _ = interp("mandelbrot", [cx, cy, 96])
        got_out: list = []
        got = compiled["mandelbrot"](cx, cy, 96, got_out, [10_000_000])
        assert got == want
    for _ in range(50):
        a, b = rng.randint(-5, 5), rng.uniform(-2, 2)
        want, want_emits = interp("mixer", [a, b])
        got_out = []
        got = compiled["mixer"](a, b, got_out, [10_000_000])
        assert got == want and got_out == want_emits

    # scope-dict form (the .process entry): same emits as the interpreter
    body = compile_body(fns["compute_tile"].body, fns, {})
    assert body is not None
    scope = {"x_off": 496, "y_off": 496, "size": 5, "max_iter": 64}
    want_out: list = []
    try:
        _exec_stmts(fns["compute_tile"].body, dict(scope), env, want_out)
    except _FnReturn:
        pass
    got_out = []
    body(scope, got_out, [10_000_000])
    assert got_out == want_out


def test_pycompile_budget_still_guards_while_loops():
    from varpulis_spark.vpl.pycompile import compile_fns

    prog = parse_full(
        """
fn spin() -> int:
    var i = 0
    while i < 1:
        i := i * 1
    return i
"""
    )
    compiled = compile_fns({f.name: f for f in prog.fns}, {})
    assert compiled is not None
    with pytest.raises(ValueError, match="step budget"):
        compiled["spin"]([], [10_000])


def test_unmodified_mandelbrot_demo_runs_on_spark(spark):
    """The reference's showcase demo (examples/mandelbrot/mandelbrot.vpl)
    runs UNMODIFIED: 16 timer-driven tile streams, each emitting 62,500
    Pixel events through the compiled .process path on executors. We drive
    two tiles end-to-end (1 timer event each) and spot-check pixels against
    the escape-time loop; this also proves the exec-generated closures
    survive cloudpickle into Python workers."""
    with open("/root/reference/examples/mandelbrot/mandelbrot.vpl") as f:
        src = f.read()
    res = run_inline(spark, src, "Dummy { x: 1 }\n")
    assert len(res) == 16
    for tile, x0, y0 in [("Tile00", 0, 0), ("Tile12", 500, 250)]:
        rows = res[tile].collect()
        assert len(rows) == 62_500
        xs = {r.x for r in rows}
        ys = {r.y for r in rows}
        assert min(xs) == x0 and max(xs) == x0 + 249
        assert min(ys) == y0 and max(ys) == y0 + 249
        for r in rows[:: 2500]:  # 25 spot checks
            cx = -2.0 + r.x * 3.0 / 1000.0
            cy = -1.5 + r.y * 3.0 / 1000.0
            assert r.iterations == py_mandelbrot(cx, cy, 256)


def test_mandelbrot_parallel_pixel_rows(spark):
    """web/mandelbrot_parallel.vpl (nested top-level declaration loops +
    string accumulation via to_string/concat) runs unmodified; PixelRow
    assertions mirror mandelbrot_tests.rs:338-369: count == tile size,
    comma-separated data, one event per row, per-tile event routing."""
    with open(
        "/root/reference/examples/mandelbrot/web/mandelbrot_parallel.vpl"
    ) as f:
        src = f.read()
    res = run_inline(
        spark, src, "ComputeTile00 { }\nComputeTile31 { }\n"
    )
    assert len(res) == 16
    t00 = res["Tile00"].collect()
    assert len(t00) == 250  # one PixelRow per row
    for r in t00[::50]:
        assert r.x_start == 0 and r["count"] == 250
        vals = r.data.split(",")
        assert len(vals) == 250
        cy = -1.5 + r.y * 3.0 / 1000.0
        for px in (0, 100, 249):
            cx = -2.0 + px * 3.0 / 1000.0
            assert int(vals[px]) == py_mandelbrot(cx, cy, 256)
    t31 = res["Tile31"].collect()
    assert len(t31) == 250
    assert {r.x_start for r in t31} == {250}  # col 1 → x offset 250
    assert min(r.y for r in t31) == 750  # row 3 → y offset 750
    # un-triggered tiles emit nothing (event routing by ComputeTileXX type)
    assert res["Tile22"].count() == 0


def test_builtin_parity_in_imperative_bodies(spark):
    """Reference builtins callable from statement bodies
    (evaluator.rs:470-793): to_string Display parity, collection ops
    returning modified copies, type introspection."""
    res = run_inline(
        spark,
        """
fn probe():
    let xs = [3, 1, 2]
    emit Out(
        s_int: to_string(42),
        s_float: to_string(2.0),
        s_frac: to_string(2.5),
        s_bool: to_string(true),
        srt: to_string(sort(xs)),
        rev: to_string(reverse(xs)),
        pushed: to_string(push(xs, 9)),
        popped: to_string(pop(xs)),
        f: first(xs),
        l: last(xs),
        mean: avg(xs),
        t_arr: type_of(xs),
        t_f: type_of(1.5),
        isn: is_null(xs[99]),
        up: uppercase("ab")
    )

stream Out = timer(10s)
    .process(probe())
""",
        "Dummy { x: 1 }\n",
    )
    (r,) = res["Out"].collect()
    assert r.s_int == "42" and r.s_float == "2" and r.s_frac == "2.5"
    assert r.s_bool == "true"
    assert r.srt == "[1, 2, 3]" and r.rev == "[2, 1, 3]"
    assert r.pushed == "[3, 1, 2, 9]" and r.popped == "[3, 1]"
    assert r.f == 3 and r.l == 2 and r.mean == 2.0
    assert r.t_arr == "array" and r.t_f == "float"
    assert r.isn is True and r.up == "AB"


def test_reference_arithmetic_semantics(spark):
    """Value arithmetic parity (evaluator.rs:1056-1110): Int/Int is
    truncating division (toward zero, not Python floor), division/modulo
    by zero is null, % is truncated remainder (sign of dividend), and
    Int**Int stays Int. Compiled and interpreted paths agree."""
    res = run_inline(
        spark,
        """
fn arith(a: int, b: int):
    emit R(
        q: a / b,
        nq: (0 - a) / b,
        r: (0 - 7) % b,
        z: a / 0,
        zm: a % 0,
        p: 2 ** 10,
        np: 2 ** (0 - 1)
    )

stream Out = timer(10s)
    .process(arith(7, 2))
""",
        "Dummy { x: 1 }\n",
    )
    (r,) = res["Out"].collect()
    assert r.q == 3  # 7/2 truncates (Python // would also give 3)
    assert r.nq == -3  # -7/2 truncates toward zero (Python // gives -4)
    assert r.r == -1  # truncated remainder keeps the dividend's sign
    assert r.z is None and r.zm is None  # /0 and %0 are null
    assert r.p == 1024 and r.np == 0  # Int**Int stays Int


def test_mandelbrot_server_event_driven_args(spark):
    """mandelbrot_server.vpl: .process args computed FROM EVENT FIELDS
    (tile_id % 32, tile_id / 32) — integer division must truncate or the
    tile offsets go fractional."""
    with open(
        "/root/reference/examples/mandelbrot/mandelbrot_server.vpl"
    ) as f:
        src = f.read()
    res = run_inline(
        spark, src, "ComputeTile { tile_id: 33 }\n"
    )  # row 1, col 1 → offsets (31, 31)
    rows = res["Tile"].collect()
    assert len(rows) == 31 * 31
    assert min(r.x for r in rows) == 31 and min(r.y for r in rows) == 31
    assert max(r.x for r in rows) == 61 and max(r.y for r in rows) == 61
    r0 = next(r for r in rows if r.x == 40 and r.y == 45)
    assert r0.iterations == py_mandelbrot(
        -2.0 + 40 * 3.0 / 1000.0, -1.5 + 45 * 3.0 / 1000.0, 256
    )


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
