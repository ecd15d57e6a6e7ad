"""Compile statement-bodied VPL fns to plain Python functions.

The reference compiles VPL to native Rust, so its imperative fn bodies
(mandelbrot.vpl's escape-time loop, core/src/ast.rs:38-106) run at machine
speed. Our fallback statement interpreter (`compiler._exec_stmts`) re-walks
the AST per statement — correct, but ~100x slower on arithmetic-heavy
loops. This module closes that gap by translating the statement AST to
Python source once (per fn, driver-side) and `exec`-ing it; the generated
functions are ordinary picklable-by-reference module-level closures built
from a source string, so cloudpickle ships them to executors intact.

Semantics contract: compiled output must be indistinguishable from the
interpreter (tests/test_vpl_imperative.py pins equivalence on the demo
corpus). The interpreter's quirks are preserved deliberately:

- unbound name reads yield None (`scope.get`), never NameError — every
  assigned local is pre-initialized to None;
- `and`/`or`/`xor` evaluate BOTH operands eagerly and return bool
  (`_PY_OPS`), so they compile to `bool(a) & bool(b)` etc., not Python's
  short-circuit forms;
- indexing out of range yields None (helper `__index`);
- `for x in <expr>` iterates `expr or []`;
- `while` loops carry the shared step budget so a non-terminating
  condition raises instead of hanging an executor.

Anything the translator doesn't cover (lambdas outside the array HOF
methods, `?.`, user fns that `break` across their own boundary) returns
None from `compile_fns`, and callers keep the interpreter path.
"""

from __future__ import annotations

import itertools

from varpulis_spark.vpl.parser import (
    AssignStmt,
    Bin,
    BreakStmt,
    Call,
    ContinueStmt,
    Dur,
    EmitStmt,
    ExprStmt,
    ForStmt,
    If,
    IfStmt,
    Index,
    Lambda,
    LetStmt,
    Lit,
    ListLit,
    MapLit,
    Range,
    Ref,
    ReturnStmt,
    Slice,
    Un,
    WhileStmt,
)

# one-arg / lambda array methods the interpreter special-cases
# (evaluator.rs:1376-1545); everything else named like a builtin goes
# through _PY_FNS
_HOF_NAMES = {"filter", "map", "flatten", "sum", "len", "count", "size",
              "sliding_pairs"}


class _Unsupported(Exception):
    """Raised during codegen on a node the translator doesn't cover —
    callers fall back to the interpreter."""


def _index_or_none(obj, idx):
    try:
        return obj[idx]
    except (IndexError, KeyError):
        return None


def _slice(obj, lo, hi):
    lo = int(lo) if lo is not None else None
    hi = int(hi) if hi is not None else None
    return obj[lo:hi]


def _coalesce(a, b):
    return b if a is None else a


def _hof(name, recv, lam=None):
    if not isinstance(recv, list):
        # len/count/size apply to strings and maps too (evaluator.rs len);
        # the other HOF methods are list-only
        if name in ("len", "count", "size") and recv is not None:
            return len(recv)
        raise ValueError(f"{name}() receiver is not a list: {recv!r}")
    if name == "filter":
        return [x for x in recv if lam(x)]
    if name == "map":
        return [lam(x) for x in recv]
    if name == "flatten":
        return [y for x in recv for y in (x if isinstance(x, list) else [x])]
    if name == "sum":
        return sum(recv)
    if name in ("len", "count", "size"):
        return len(recv)
    if name == "sliding_pairs":
        return [[a, b] for a, b in zip(recv, recv[1:])]
    raise ValueError(name)


class _Codegen:
    def __init__(self, fns: dict, consts: dict):
        self.fns = fns          # name -> FnDecl
        self.consts = consts    # var/const name -> python scalar
        self.lines: list[str] = []
        self._tmp = itertools.count()

    # -- expressions ------------------------------------------------------

    def expr(self, e, bound: set[str]) -> str:
        """Python source for an expression. `bound` = names that are
        locals of the generated function (params + assigned)."""
        if isinstance(e, Lit):
            return repr(e.value)
        if isinstance(e, Dur):
            from varpulis_spark.functions import duration_ns

            return repr(duration_ns(e.text))
        if isinstance(e, Ref):
            name = e.parts[-1] if len(e.parts) > 1 else e.parts[0]
            if name in bound:
                return f"_u_{name}"
            if name in self.consts:
                return f"__consts[{name!r}]"
            return "None"  # interpreter: scope.get -> None
        if isinstance(e, Un):
            v = self.expr(e.operand, bound)
            return f"(not {v})" if e.op == "not" else f"(-{v})"
        if isinstance(e, If):
            c = self.expr(e.cond, bound)
            t = self.expr(e.then, bound)
            o = self.expr(e.other, bound)
            return f"({t} if {c} else {o})"
        if isinstance(e, ListLit):
            return "[" + ", ".join(self.expr(x, bound) for x in e.items) + "]"
        if isinstance(e, MapLit):
            kv = ", ".join(
                f"{self.expr(k, bound)}: {self.expr(v, bound)}" for k, v in e.items
            )
            return "{" + kv + "}"
        if isinstance(e, Index):
            return f"__index({self.expr(e.obj, bound)}, {self.expr(e.index, bound)})"
        if isinstance(e, Slice):
            lo = self.expr(e.lo, bound) if e.lo is not None else "None"
            hi = self.expr(e.hi, bound) if e.hi is not None else "None"
            return f"__slice({self.expr(e.obj, bound)}, {lo}, {hi})"
        if isinstance(e, Range):
            lo, hi = self.expr(e.lo, bound), self.expr(e.hi, bound)
            step = " + 1" if e.inclusive else ""
            return f"list(range(int({lo}), int({hi}){step}))"
        if isinstance(e, Bin):
            a, b = self.expr(e.left, bound), self.expr(e.right, bound)
            if e.op in ("and", "or", "xor"):
                # eager two-sided evaluation, bool result (_PY_OPS parity)
                py = {"and": "&", "or": "|", "xor": "^"}[e.op]
                return f"(bool({a}) {py} bool({b}))"
            if e.op == "??":
                return f"__coalesce({a}, {b})"
            if e.op == "in":
                return f"({a} in {b})"
            if e.op == "/":
                return f"__div({a}, {b})"  # Int/Int truncates, /0 is null
            if e.op == "%":
                return f"__mod({a}, {b})"  # truncated remainder
            if e.op == "**":
                return f"__pow({a}, {b})"  # Int**Int stays Int
            if e.op in ("==", "!=", "<", "<=", ">", ">=", "+", "-", "*",
                        "&", "|", "^", "<<", ">>"):
                return f"({a} {e.op} {b})"
            raise _Unsupported(f"operator {e.op}")
        if isinstance(e, Call):
            return self._call(e, bound)
        raise _Unsupported(type(e).__name__)

    def _call(self, e: Call, bound: set[str]) -> str:
        if e.args and e.name in _HOF_NAMES:
            recv = self.expr(e.args[0], bound)
            lam = e.args[1] if len(e.args) > 1 and isinstance(e.args[1], Lambda) else None
            if lam is not None:
                ps = lam.params
                if len(ps) >= 2:
                    # tuple-destructuring binding (sliding_pairs consumers)
                    inner = bound | set(ps)
                    body = self.expr(lam.body, inner)
                    unpack = ", ".join(f"_u_{p}" for p in ps)
                    lam_src = (f"(lambda __item: (lambda {unpack}: {body})"
                               f"(*__item))")
                else:
                    inner = bound | {ps[0]}
                    body = self.expr(lam.body, inner)
                    lam_src = f"(lambda _u_{ps[0]}: {body})"
                return f"__hof({e.name!r}, {recv}, {lam_src})"
            if len(e.args) == 1:
                return f"__hof({e.name!r}, {recv})"
            raise _Unsupported(f"HOF {e.name} arity")
        if e.name in self.fns:
            args = ", ".join(self.expr(a, bound) for a in e.args)
            sep = ", " if args else ""
            return f"_f_{e.name}({args}{sep}__emit, __steps)"
        from varpulis_spark.vpl.compiler import _PY_FNS

        if e.name in _PY_FNS:
            args = ", ".join(self.expr(a, bound) for a in e.args)
            return f"__py[{e.name!r}]({args})"
        raise _Unsupported(f"call {e.name}")

    # -- statements -------------------------------------------------------

    def stmts(self, body: list, bound: set[str], indent: str, in_loop: bool):
        for st in body:
            self.stmt(st, bound, indent, in_loop)

    def stmt(self, st, bound: set[str], indent: str, in_loop: bool):
        add = self.lines.append
        if isinstance(st, (LetStmt, AssignStmt)):
            add(f"{indent}_u_{st.name} = {self.expr(st.value, bound)}")
        elif isinstance(st, IfStmt):
            kw = "if"
            for cond, b in st.branches:
                add(f"{indent}{kw} {self.expr(cond, bound)}:")
                self.stmts(b, bound, indent + "    ", in_loop)
                kw = "elif"
            if st.orelse is not None:
                add(f"{indent}else:")
                self.stmts(st.orelse, bound, indent + "    ", in_loop)
        elif isinstance(st, WhileStmt):
            add(f"{indent}while {self.expr(st.cond, bound)}:")
            add(f"{indent}    __steps[0] -= 1")
            add(f"{indent}    if __steps[0] <= 0:")
            add(f"{indent}        raise ValueError('fn body exceeded the "
                f"interpreter step budget — non-terminating while loop?')")
            self.stmts(st.body, bound, indent + "    ", True)
        elif isinstance(st, ForStmt):
            if st.iter_expr is not None:
                it = f"({self.expr(st.iter_expr, bound)} or [])"
            else:
                lo = self.expr(st.start, bound)
                hi = self.expr(st.stop, bound)
                inc = " + 1" if st.inclusive else ""
                it = f"range(int({lo}), int({hi}){inc})"
            add(f"{indent}for _u_{st.var} in {it}:")
            self.stmts(st.body, bound, indent + "    ", True)
        elif isinstance(st, EmitStmt):
            kv = ", ".join(
                f"{k!r}: {self.expr(v, bound)}" for k, v in st.fields.items()
            )
            add(f"{indent}__emit.append(({st.event_type!r}, {{{kv}}}))")
        elif isinstance(st, ReturnStmt):
            v = self.expr(st.value, bound) if st.value is not None else "None"
            add(f"{indent}return {v}")
        elif isinstance(st, BreakStmt):
            if not in_loop:
                raise _Unsupported("break outside loop (cross-fn unwind)")
            add(f"{indent}break")
        elif isinstance(st, ContinueStmt):
            if not in_loop:
                raise _Unsupported("continue outside loop (cross-fn unwind)")
            add(f"{indent}continue")
        elif isinstance(st, ExprStmt):
            add(f"{indent}{self.expr(st.value, bound)}")
        else:
            raise _Unsupported(type(st).__name__)


def _assigned_names(body: list) -> set[str]:
    out: set[str] = set()
    for st in body:
        if isinstance(st, (LetStmt, AssignStmt)):
            out.add(st.name)
        elif isinstance(st, IfStmt):
            for _c, b in st.branches:
                out |= _assigned_names(b)
            if st.orelse is not None:
                out |= _assigned_names(st.orelse)
        elif isinstance(st, (WhileStmt,)):
            out |= _assigned_names(st.body)
        elif isinstance(st, ForStmt):
            out.add(st.var)
            out |= _assigned_names(st.body)
    return out


def compile_fns(fns: dict, consts: dict) -> dict | None:
    """Compile every statement-bodied FnDecl in `fns` (expression-bodied
    ones too, so calls stay in compiled code) into one module namespace.

    Returns {name: callable(*args, emit_list, steps_box) -> value} or None
    if ANY fn uses an untranslatable construct (all-or-nothing: a compiled
    fn calling an interpreted one would split the emit/budget plumbing).
    """
    gen_lines: list[str] = []
    for name, fn in fns.items():
        cg = _Codegen(fns, consts)
        params = [p for p, _t in fn.params]
        sig = "".join(f"_u_{p}, " for p in params)
        gen_lines.append(f"def _f_{name}({sig}__emit, __steps):")
        try:
            if isinstance(fn.body, list):
                local = _assigned_names(fn.body)
                bound = set(params) | local
                for loc in sorted(local - set(params)):
                    gen_lines.append(f"    _u_{loc} = None")
                cg.stmts(fn.body, bound, "    ", in_loop=False)
                gen_lines.extend(cg.lines)
                gen_lines.append("    return None")
            else:
                gen_lines.append(f"    return {cg.expr(fn.body, set(params))}")
        except _Unsupported:
            return None
        gen_lines.append("")
    src = "\n".join(gen_lines)
    from varpulis_spark.vpl.compiler import _PY_FNS
    from varpulis_spark.vpl.compiler import vpl_div as _vpl_div
    from varpulis_spark.vpl.compiler import vpl_mod as _vpl_mod
    from varpulis_spark.vpl.compiler import vpl_pow as _vpl_pow

    ns = {
        "__index": _index_or_none,
        "__slice": _slice,
        "__coalesce": _coalesce,
        "__hof": _hof,
        "__py": _PY_FNS,
        "__div": _vpl_div,
        "__mod": _vpl_mod,
        "__pow": _vpl_pow,
        "__consts": dict(consts),
    }
    try:
        exec(compile(src, "<vpl-pycompile>", "exec"), ns)
    except SyntaxError:
        return None
    return {name: ns[f"_f_{name}"] for name in fns}


def compile_body(stmts: list, fns: dict, consts: dict):
    """Compile a `.process` entry body that reads free names from a per-event
    scope dict (event fields + bound call args). Returns
    callable(scope: dict, emit_list, steps_box) or None.

    Free reads resolve through scope.get (missing -> None), assignments are
    local to the invocation — identical to `_exec_stmts` on a throwaway
    scope copy, except that writes are not visible in the caller's scope
    (the .process runner never reads the scope back, only the emit list).
    """
    compiled_fns = compile_fns(fns, consts)
    if compiled_fns is None:
        return None
    cg = _Codegen(fns, consts)
    local = _assigned_names(stmts)
    free = _free_reads(stmts) - local - set(consts)
    lines = ["def __body(__scope, __emit, __steps):"]
    for name in sorted(free):
        lines.append(f"    _u_{name} = __scope.get({name!r})")
    for name in sorted(local):
        if name in consts:
            # an ASSIGNED global var starts from its declared value (read
            # through the scope so event fields still shadow it); the
            # write stays local to the invocation, like every other
            # assignment here (r9: this initialized to None and
            # `counter := counter + 1` crashed on None + 1)
            lines.append(f"    _u_{name} = __scope.get({name!r}, {consts[name]!r})")
        else:
            lines.append(f"    _u_{name} = None")
    try:
        cg.stmts(stmts, free | local, "    ", in_loop=False)
    except _Unsupported:
        return None
    lines.extend(cg.lines)
    src = "\n".join(lines)
    from varpulis_spark.vpl.compiler import _PY_FNS
    from varpulis_spark.vpl.compiler import vpl_div as _vpl_div
    from varpulis_spark.vpl.compiler import vpl_mod as _vpl_mod
    from varpulis_spark.vpl.compiler import vpl_pow as _vpl_pow

    ns = {
        "__index": _index_or_none,
        "__slice": _slice,
        "__coalesce": _coalesce,
        "__hof": _hof,
        "__py": _PY_FNS,
        "__div": _vpl_div,
        "__mod": _vpl_mod,
        "__pow": _vpl_pow,
        "__consts": dict(consts),
    }
    for name, f in compiled_fns.items():
        ns[f"_f_{name}"] = f
    try:
        exec(compile(src, "<vpl-pycompile>", "exec"), ns)
    except SyntaxError:
        return None
    return ns["__body"]


def _free_reads(node) -> set[str]:
    """Every single-part Ref name read anywhere in a statement/expression
    tree (over-approximation is fine: extras just read scope.get -> None,
    matching the interpreter)."""
    out: set[str] = set()

    def walk(n):
        if isinstance(n, Ref):
            out.add(n.parts[-1] if len(n.parts) > 1 else n.parts[0])
        elif isinstance(n, (Lit, Dur)):
            pass
        elif isinstance(n, Bin):
            walk(n.left), walk(n.right)
        elif isinstance(n, Un):
            walk(n.operand)
        elif isinstance(n, If):
            walk(n.cond), walk(n.then), walk(n.other)
        elif isinstance(n, ListLit):
            for x in n.items:
                walk(x)
        elif isinstance(n, MapLit):
            for k, v in n.items:
                walk(k), walk(v)
        elif isinstance(n, Index):
            walk(n.obj), walk(n.index)
        elif isinstance(n, Slice):
            walk(n.obj)
            if n.lo is not None:
                walk(n.lo)
            if n.hi is not None:
                walk(n.hi)
        elif isinstance(n, Range):
            walk(n.lo), walk(n.hi)
        elif isinstance(n, Call):
            for a in n.args:
                walk(a)
        elif isinstance(n, Lambda):
            walk(n.body)
        elif isinstance(n, (LetStmt, AssignStmt)):
            walk(n.value)
        elif isinstance(n, IfStmt):
            for c, b in n.branches:
                walk(c)
                for s in b:
                    walk(s)
            for s in n.orelse or []:
                walk(s)
        elif isinstance(n, WhileStmt):
            walk(n.cond)
            for s in n.body:
                walk(s)
        elif isinstance(n, ForStmt):
            if n.iter_expr is not None:
                walk(n.iter_expr)
            else:
                walk(n.start), walk(n.stop)
            for s in n.body:
                walk(s)
        elif isinstance(n, EmitStmt):
            for v in n.fields.values():
                walk(v)
        elif isinstance(n, ReturnStmt):
            if n.value is not None:
                walk(n.value)
        elif isinstance(n, ExprStmt):
            walk(n.value)
        elif isinstance(n, (BreakStmt, ContinueStmt)):
            pass

    for s in node if isinstance(node, list) else [node]:
        walk(s)
    return out
