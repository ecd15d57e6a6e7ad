"""Property test: the compile-to-Python backend (vpl/pycompile.py) is
observationally identical to the statement interpreter on randomized
imperative fn bodies — same return value, same emit stream, same
exceptions absent. Hypothesis builds statement ASTs directly (the parser
has its own tests); loops are for-ranges with break/continue so every
generated program terminates."""

import pytest

try:
    from hypothesis import given, settings
    from hypothesis import strategies as st
except ImportError:  # pragma: no cover
    pytest.skip("hypothesis not installed", allow_module_level=True)

from varpulis_spark.vpl.compiler import ProgramEnv, _FnReturn, _exec_stmts
from varpulis_spark.vpl.parser import (
    AssignStmt,
    Bin,
    BreakStmt,
    ContinueStmt,
    EmitStmt,
    FnDecl,
    ForStmt,
    IfStmt,
    LetStmt,
    Lit,
    Ref,
    ReturnStmt,
    WhileStmt,
)
from varpulis_spark.vpl.pycompile import compile_fns

NAMES = ["a", "b", "c", "x", "y"]

lit = st.one_of(
    st.integers(-20, 20).map(Lit),
    st.sampled_from([0.5, -1.5, 2.0]).map(Lit),
)
ref = st.sampled_from(NAMES).map(lambda n: Ref([n]))
ARITH = ["+", "-", "*", "/", "%"]
CMP = ["==", "!=", "<", "<=", ">", ">="]


def exprs(depth: int):
    if depth <= 0:
        return st.one_of(lit, ref)
    sub = exprs(depth - 1)
    return st.one_of(
        lit,
        ref,
        st.builds(Bin, st.sampled_from(ARITH), sub, sub),
    )


def conds(depth: int):
    return st.builds(Bin, st.sampled_from(CMP), exprs(depth), exprs(depth))


def stmts(depth: int, in_loop: bool):
    base = st.one_of(
        st.builds(LetStmt, st.sampled_from(NAMES), exprs(2),
                  st.booleans()),
        st.builds(AssignStmt, st.sampled_from(NAMES), exprs(2)),
        st.builds(
            EmitStmt,
            st.just("R"),
            st.dictionaries(st.sampled_from(["u", "v"]), exprs(1),
                            min_size=1, max_size=2),
        ),
    )
    opts = [base]
    if in_loop:
        opts += [st.just(BreakStmt()), st.just(ContinueStmt())]
    if depth > 0:
        body = st.lists(stmts(depth - 1, in_loop), min_size=1, max_size=3)
        opts.append(
            st.builds(
                IfStmt,
                st.lists(st.tuples(conds(1), body), min_size=1, max_size=2),
                st.one_of(st.none(), body),
            )
        )
        loop_body = st.lists(stmts(depth - 1, True), min_size=1, max_size=3)
        opts.append(
            st.builds(
                lambda var, lo, hi, b, inc: ForStmt(var, Lit(lo), Lit(hi), b,
                                                    inclusive=inc),
                st.sampled_from(NAMES),
                st.integers(-2, 2),
                st.integers(-2, 6),
                loop_body,
                st.booleans(),
            )
        )
        # while with a structurally-bounded counter. The increment comes
        # FIRST so a generated `continue`/`break` in the body can't skip
        # it, and the counter name `w` is reserved (not in NAMES) so inner
        # assignments can't reset it — every generated loop terminates.
        opts.append(
            st.builds(
                lambda k, b: WhileStmt(
                    Bin("<", Ref(["w"]), Lit(k)),
                    [AssignStmt("w", Bin("+", Ref(["w"]), Lit(1)))] + b,
                ),
                st.integers(0, 5),
                st.lists(stmts(depth - 1, True), min_size=0, max_size=2),
            )
        )
    return st.one_of(*opts)


bodies = st.lists(stmts(2, False), min_size=1, max_size=6).map(
    # the while counter starts defined; the final return exercises the
    # value channel too
    lambda body: [LetStmt("w", Lit(0), True)] + body + [ReturnStmt(Ref(["a"]))]
)


def interp(fn, args, out: list):
    """(outcome, value) where outcome is 'ok' or the exception type name —
    None from /0 or unbound reads flowing into arithmetic raises TypeError
    in BOTH backends (the documented divergence from the reference's
    null-propagating Value ops), so errors are comparable outcomes, and
    the emit prefix up to the error must still match."""
    env = ProgramEnv.__new__(ProgramEnv)
    env.fns = {fn.name: fn}
    env.vars, env.events, env.patterns, env.configs = {}, {}, {}, {}
    env._emit_sink = None
    scope = dict(zip([p for p, _t in fn.params], args))
    try:
        _exec_stmts(fn.body, scope, env, out)
        return "ok", None
    except _FnReturn as r:
        return "ok", r.value
    except Exception as e:  # noqa: BLE001
        return type(e).__name__, None


@settings(max_examples=300, deadline=None)
@given(body=bodies, a=st.integers(-5, 5), b=st.integers(-5, 5))
def test_compiled_equals_interpreted(body, a, b):
    fn = FnDecl("f", [("a", "int"), ("b", "int")], "int", body)
    compiled = compile_fns({"f": fn}, {})
    assert compiled is not None, "generated AST must be translatable"
    want_out: list = []
    want = interp(fn, [a, b], want_out)
    got_out: list = []
    try:
        got = ("ok", compiled["f"](a, b, got_out, [10_000_000]))
    except Exception as e:  # noqa: BLE001
        got = (type(e).__name__, None)
    assert got == want
    assert got_out == want_out
