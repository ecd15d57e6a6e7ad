"""Compile parsed VPL declarations onto the Stream API.

Expression lowering has three backends, matching the two pattern execution
paths plus plain relational ops:
- `to_column`  → Spark Column (where/select/emit outside patterns)
- `to_python`  → (event, bindings) closure for the NFA
- `to_sql`     → alias-qualified SQL for the pattern join compiler

Reference-parity notes:
- `.not(E where c)` is the reference's global negation
  (GlobalNegation sase.rs:1842-1849): compiled as a negation guard between
  every pair of adjacent positive steps (the union of those open intervals
  is the match span).
- a `.where` AFTER a pattern chain referencing step aliases is merged into
  the final step's predicate — the reference's filter-pushdown-into-NFA
  (engine/compiler.rs:146-156).
- when every post-first step correlates on the same field
  (`f == first.f`), the compiler auto-partitions on `f` (the reference
  SASEXT `partition by`), turning one NFA universe into per-key parallelism
  and enabling the Catalyst join path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from varpulis_spark.operators import aggregates as A
from varpulis_spark.operators.sase import Pattern, Step
from varpulis_spark.stream import Stream
from varpulis_spark.vpl.parser import (
    Bin,
    Call,
    Dur,
    Lit,
    OpCall,
    PatternStep,
    Ref,
    StreamDecl,
    Un,
)

_AGG_FNS = {
    "count": A.count, "sum": A.sum, "avg": A.avg, "min": A.min, "max": A.max,
    "stddev": A.stddev, "variance": A.variance, "first": A.first,
    "last": A.last, "count_distinct": A.count_distinct, "median": A.median,
    "ema": A.ema,
}

_SCALAR_FNS = {
    "abs": F.abs, "sqrt": F.sqrt, "floor": F.floor, "ceil": F.ceil,
    "round": F.round, "lower": F.lower, "upper": F.upper, "trim": F.trim,
    "len": F.length, "exp": F.exp, "log": F.log, "log10": F.log10,
}

_PY_OPS = {
    "==": lambda a, b: a == b, "!=": lambda a, b: a != b,
    "<": lambda a, b: a < b, "<=": lambda a, b: a <= b,
    ">": lambda a, b: a > b, ">=": lambda a, b: a >= b,
    "+": lambda a, b: a + b, "-": lambda a, b: a - b,
    "*": lambda a, b: a * b, "/": lambda a, b: a / b, "%": lambda a, b: a % b,
    "and": lambda a, b: bool(a) and bool(b), "or": lambda a, b: bool(a) or bool(b),
}


# -- backends ---------------------------------------------------------------


def to_column(e) -> Column:
    if isinstance(e, Lit):
        return F.lit(e.value)
    if isinstance(e, Dur):
        from varpulis_spark.functions import duration_ns

        return F.lit(duration_ns(e.text))
    if isinstance(e, Ref):
        return F.col(".".join(e.parts))
    if isinstance(e, Un):
        c = to_column(e.operand)
        return ~c if e.op == "not" else -c
    if isinstance(e, Bin):
        left, right = to_column(e.left), to_column(e.right)
        if e.op == "and":
            return left & right
        if e.op == "or":
            return left | right
        return _PY_OPS[e.op](left, right) if e.op in ("+", "-", "*", "/", "%") else {
            "==": left == right, "!=": left != right, "<": left < right,
            "<=": left <= right, ">": left > right, ">=": left >= right,
        }[e.op]
    if isinstance(e, Call) and e.name in _SCALAR_FNS:
        return _SCALAR_FNS[e.name](*[to_column(a) for a in e.args])
    raise ValueError(f"cannot lower to Column: {e}")


def to_python(e, aliases: set[str]):
    """(event, bindings) predicate closure for the NFA path."""
    if isinstance(e, Lit):
        v = e.value
        return lambda ev, b: v
    if isinstance(e, Dur):
        from varpulis_spark.functions import duration_ns

        v = duration_ns(e.text)
        return lambda ev, b: v
    if isinstance(e, Ref):
        if len(e.parts) == 2 and e.parts[0] in aliases:
            a, f = e.parts
            return lambda ev, b: (
                b[a][-1].get(f) if isinstance(b[a], list) else b[a].get(f)
            )
        f = ".".join(e.parts)
        return lambda ev, b: ev.get(f)
    if isinstance(e, Un):
        inner = to_python(e.operand, aliases)
        if e.op == "not":
            return lambda ev, b: not inner(ev, b)
        return lambda ev, b: -inner(ev, b)
    if isinstance(e, Bin):
        lf, rf = to_python(e.left, aliases), to_python(e.right, aliases)
        op = _PY_OPS[e.op]
        return lambda ev, b: op(lf(ev, b), rf(ev, b))
    raise ValueError(f"cannot lower to python: {e}")


def to_sql(e, self_alias: str, aliases: set[str]) -> str:
    if isinstance(e, Lit):
        if e.value is None:
            return "NULL"
        if isinstance(e.value, bool):
            return "TRUE" if e.value else "FALSE"
        if isinstance(e.value, str):
            return "'" + e.value.replace("'", "''") + "'"
        return repr(e.value)
    if isinstance(e, Ref):
        if len(e.parts) == 2 and e.parts[0] in aliases:
            return f"{e.parts[0]}.{e.parts[1]}"
        return f"{self_alias}.{'.'.join(e.parts)}"
    if isinstance(e, Un):
        inner = to_sql(e.operand, self_alias, aliases)
        return f"(NOT {inner})" if e.op == "not" else f"(-{inner})"
    if isinstance(e, Bin):
        op = {"==": "=", "and": "AND", "or": "OR"}.get(e.op, e.op)
        return f"({to_sql(e.left, self_alias, aliases)} {op} {to_sql(e.right, self_alias, aliases)})"
    raise ValueError(f"cannot lower to SQL: {e}")


# -- pattern compilation ------------------------------------------------------


def _and_exprs(a, b):
    return b if a is None else (a if b is None else Bin("and", a, b))


def _auto_partition_key(
    steps: list[PatternStep], neg_steps: list[PatternStep] | None = None
) -> str | None:
    """`f == first.f` on every later step → partition by f (SASEXT).

    Global negations (check_global_negations, sase.rs:3000-3034) veto runs in
    ALL partitions regardless of the negated event's own key — so
    auto-partitioning is only sound when every negation predicate ITSELF
    correlates on the same field (then a negated event with a different key
    could never veto anyway)."""
    if len(steps) < 2:
        return None
    first_alias = steps[0].alias
    if not first_alias:
        return None

    def correlated_field(expr) -> set[str]:
        # Only equalities REQUIRED by the predicate count: walk pure `and`
        # conjunctions, stop at `or`/`not` subtrees — an equality inside a
        # disjunctive branch is optional, and partitioning on it would drop
        # matches from the other branch.
        found = set()

        def walk(e):
            if isinstance(e, Bin):
                if e.op == "==":
                    l, r = e.left, e.right
                    for x, y in ((l, r), (r, l)):
                        if (
                            isinstance(x, Ref) and len(x.parts) == 1
                            and isinstance(y, Ref) and len(y.parts) == 2
                            and y.parts[0] == first_alias and y.parts[1] == x.parts[0]
                        ):
                            found.add(x.parts[0])
                elif e.op == "and":
                    walk(e.left)
                    walk(e.right)
                # `or` / `not` / arithmetic: stop — nothing below is required

        walk(expr)
        return found

    common: set[str] | None = None
    for s in steps[1:]:
        if s.where is None:
            return None
        fields = correlated_field(s.where)
        common = fields if common is None else (common & fields)
        if not common:
            return None
    for ns in neg_steps or []:
        if ns.where is None:
            return None  # unkeyed negation vetoes across all partitions
        common &= correlated_field(ns.where)
        if not common:
            return None
    return sorted(common)[0] if common else None


def compile_pattern_decl(decl: StreamDecl, stream: Stream) -> Stream:
    aliases = {s.alias for s in decl.steps if s.alias}
    sase_steps: list[Step] = []
    auto_alias = 0
    for s in decl.steps:
        alias = s.alias or f"_s{auto_alias}"
        auto_alias += 1
        aliases.add(alias)
        sase_steps.append(
            Step(
                s.event_type,
                alias,
                where=to_python(s.where, aliases) if s.where else None,
                where_sql=to_sql(s.where, alias, aliases) if s.where else None,
                kleene="+" if s.kleene else None,
            )
        )

    within = None
    emit: dict[str, tuple[str, str]] = {}
    lit_cols: dict[str, object] = {}
    negs: list[Step] = []
    post_wheres = []
    for op in decl.ops:
        if op.name == "within":
            within = op.args[0].text if isinstance(op.args[0], Dur) else op.args[0].value
        elif op.name == "not":
            ps: PatternStep = op.args[0]
            negs.append(
                Step(
                    ps.event_type,
                    ps.alias or "_not",
                    where=to_python(ps.where, aliases) if ps.where else None,
                    where_sql=to_sql(ps.where, ps.alias or "_not", aliases) if ps.where else None,
                    negated=True,
                )
            )
        elif op.name == "emit":
            for k, v in op.kwargs.items():
                if isinstance(v, Ref) and len(v.parts) == 2 and v.parts[0] in aliases:
                    emit[k] = (v.parts[0], v.parts[1])
                elif isinstance(v, Lit):
                    lit_cols[k] = v.value
                else:
                    raise ValueError(f"emit value not supported in patterns: {v}")
        elif op.name == "where":
            post_wheres.append(op.args[0])
        else:
            raise ValueError(f"op .{op.name} not supported after a pattern chain")

    # merge post-pattern wheres into the final step (pushdown, compiler.rs:146)
    for w in post_wheres:
        last = sase_steps[-1]
        py = to_python(w, aliases)
        old_py = last.where
        last.where = (lambda old, new: (lambda ev, b: (old is None or old(ev, b)) and new(ev, b)))(old_py, py)
        sql = to_sql(w, last.alias, aliases)
        last.where_sql = f"({last.where_sql} AND {sql})" if last.where_sql else sql

    # global negation → guards between every adjacent positive pair
    steps_final: list[Step] = []
    for i, s in enumerate(sase_steps):
        steps_final.append(s)
        if i < len(sase_steps) - 1:
            steps_final.extend(negs)

    neg_asts = [op.args[0] for op in decl.ops if op.name == "not"]
    key = _auto_partition_key(decl.steps, neg_steps=neg_asts)
    p = Pattern(steps=steps_final, within=within, emit=emit,
                partition_by=[key] if key else None)
    df = stream.pattern(p).df
    for k, v in lit_cols.items():
        df = df.withColumn(k, F.lit(v))
    return Stream(df, ts_col=stream.ts_col)


def _agg_expr(v):
    """Aggregate expression: fn(field) calls plus arithmetic over them —
    `ema(price, 12) - ema(price, 26)` (ExprAggregate aggregation.rs:494)."""
    if isinstance(v, Call):
        fn = _AGG_FNS[v.name]
        fargs = []
        for a in v.args:
            if isinstance(a, Ref):
                fargs.append(".".join(a.parts))
            elif isinstance(a, Lit):
                fargs.append(a.value)
            else:
                raise ValueError(f"aggregate arg not supported: {a}")
        return fn(*fargs)
    if isinstance(v, Lit):
        return v.value
    if isinstance(v, Bin) and v.op in ("+", "-", "*", "/"):
        return _PY_OPS[v.op](_agg_expr(v.left), _agg_expr(v.right))
    raise ValueError(f"aggregate expression not supported: {v}")


# -- relational compilation -----------------------------------------------------


def compile_relational_decl(decl: StreamDecl, stream: Stream) -> Stream:
    return _apply_relational_ops(decl, stream, typed=True)


def _apply_relational_ops(decl: StreamDecl, stream: Stream, typed: bool) -> Stream:
    s0 = decl.steps[0]
    out = stream.of_type(s0.event_type) if typed else stream
    if s0.where is not None:
        out = out.where(to_column(s0.where))
    windowed = None
    for op in decl.ops:
        if op.name in ("where", "filter"):
            out = out.where(to_column(op.args[0]))
        elif op.name == "select":
            cols = [".".join(a.parts) for a in op.args if isinstance(a, Ref)]
            named = {k: to_column(v) for k, v in op.kwargs.items()}
            out = out.select(*cols, **named)
        elif op.name == "emit":
            named = {k: to_column(v) for k, v in op.kwargs.items()}
            etype = None
            if op.args and isinstance(op.args[0], Lit):
                etype = op.args[0].value
            out = out.emit(etype, **named)
        elif op.name == "partition_by":
            out = out.partition_by(*[".".join(a.parts) for a in op.args])
        elif op.name == "window":
            size = None
            if op.args:
                a = op.args[0]
                size = a.text if isinstance(a, Dur) else a.value
            sliding = op.kwargs.get("sliding")
            sliding = sliding.text if isinstance(sliding, Dur) else (
                sliding.value if isinstance(sliding, Lit) else None
            )
            session = op.kwargs.get("session")
            session = session.text if isinstance(session, Dur) else None
            windowed = out.window(size, sliding=sliding, session=session)
        elif op.name == "aggregate":
            aggs = {k: _agg_expr(v) for k, v in op.kwargs.items()}
            out = (windowed or out).aggregate(**aggs)
            windowed = None
        elif op.name == "having":
            out = out.having(to_column(op.args[0]))
        elif op.name == "distinct":
            out = out.distinct(*[".".join(a.parts) for a in op.args if isinstance(a, Ref)])
        elif op.name == "limit":
            out = out.limit(int(op.args[0].value))
        elif op.name == "watermark":
            w = op.kwargs.get("out_of_order") or op.args[0]
            out = out.watermark(w.text if isinstance(w, Dur) else w.value)
        else:
            raise ValueError(f"op .{op.name} not supported")
    return out


def run_program(source: str, stream: Stream) -> dict[str, DataFrame]:
    """Compile+run every `stream X = ...` declaration against the ingest
    Stream; returns name → result DataFrame.

    Streams may reference earlier streams by name (the dataflow DAG the
    reference wires through its event-type router, engine/router.rs:13-23)
    — here it is plain DataFrame composition. `.from(Conn, ...)` connector
    bindings are accepted and ignored in replay mode (the ingest Stream IS
    the bound source)."""
    from varpulis_spark.vpl.parser import parse_program

    results: dict[str, DataFrame] = {}
    env: dict[str, Stream] = {}
    for decl in parse_program(source):
        # drop connector bindings (source already bound in replay mode)
        decl.ops = [op for op in decl.ops if op.name != "from"]
        is_pattern = len(decl.steps) > 1 or any(s.kleene or s.alias for s in decl.steps)
        if is_pattern:
            # steps naming a declared stream run over THAT stream (wildcard
            # type); all steps must reference the same upstream for now.
            refs = {s.event_type for s in decl.steps if s.event_type in env}
            src = stream
            if refs:
                if len(refs) > 1:
                    raise ValueError("pattern over multiple upstream streams not supported")
                src = env[next(iter(refs))]
                for s in decl.steps:
                    if s.event_type in env:
                        s.event_type = None
            out = compile_pattern_decl(decl, src)
        else:
            s0 = decl.steps[0]
            if s0.event_type in env:
                src = env[s0.event_type]
                out = _apply_relational_ops(decl, src, typed=False)
            else:
                out = compile_relational_decl(decl, stream)
        env[decl.name] = out
        results[decl.name] = out.df
    return results
