"""Semantic validation — the reference's diagnostics pass
(varpulis-core/src/validate/{checks,builtins,mod}.rs) over the parsed
Program, with the reference's error/warning codes so `varpulis check`
output matches tooling that greps for them.

Implemented codes (validation_coverage_tests.rs port):
  E001-E004  duplicate event / stream / fn / connector declarations
  E010       .having() without a prior .aggregate()
  E011/E012  duplicate .aggregate() / .window()
  E020       .within() outside a sequence context
  E030       undefined connector in .to()/.from()/.enrich()
  E032       .enrich() on a non-request-response connector type
  E040       assignment to an immutable variable
  E050/E051  unknown function / user-fn arity mismatch
  E060/W060  .where()/.having() non-boolean literal / arithmetic
  E061       .within()/.allowed_lateness() non-duration literal
  E070-E073  aggregate: unknown fn / missing field / ema arity / bare field
  E090       genuinely-unsupported ops (.map/.concurrent/.on_error/
             .collect/.fork/.any/.all)
  W001/W002  aggregate without window / partition_by after window
  W030/W031  undeclared source type / `.emit as` undeclared type
  W032       .enrich() without fields

Documented divergences from the reference's validator:
- `.distinct/.limit/.order_by/.first/.filter` are E090 "not yet
  implemented" THERE but fully implemented HERE — no diagnostic.
- E005/E031 (contexts) and E007 (type aliases) are not emitted: the
  parser accepts-and-skips context decls (contexts are Spark partitions)
  and has no `type` alias construct.
- W080/W081/E080 connector/named-parameter registries are not ported;
  connector kwargs are validated at bind time by the registry instead.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from varpulis_spark.vpl.parser import (
    Bin,
    Call,
    Dur,
    Lit,
    PatAnd,
    PatNot,
    PatOr,
    PatSeq,
    PatternStep,
    Program,
    Ref,
    SequenceSource,
    VarDecl,
)


def _arg_name(a) -> str | None:
    """Positional op args parse as bare PatternSteps (the op-chain grammar);
    a Ref also names a single identifier."""
    if isinstance(a, PatternStep):
        return a.event_type
    if isinstance(a, Ref) and len(a.parts) == 1:
        return a.parts[0]
    return None

ERROR = "error"
WARNING = "warning"

# reference registries (validate/builtins.rs) plus this engine's own
# scalar builtins (compiler._SCALAR_FNS/_PY_FNS superset)
AGGREGATE_FUNCTIONS = (
    "count", "sum", "avg", "min", "max", "stddev", "first", "last",
    "count_distinct", "ema",
    # engine extensions
    "variance", "median", "percentile", "approx_count_distinct", "collect",
)
AGGREGATE_REQUIRES_FIELD = {"sum", "avg", "min", "max", "stddev"}
AGGREGATE_REQUIRES_TWO_ARGS = {"ema"}
ENRICH_COMPATIBLE_TYPES = ("http", "database", "redis", "sql")

_REFERENCE_BUILTINS = {
    "abs", "sqrt", "floor", "ceil", "round", "log", "min", "max", "clamp",
    "len", "trim", "to_upper", "to_lower", "contains", "starts_with",
    "ends_with", "replace", "split", "join", "concat",
    "first", "last", "push", "pop", "reverse", "sort", "unique", "flatten",
    "zip", "range", "keys", "values",
    "to_string", "to_int", "to_float", "type_of",
    "now", "timestamp", "format", "parse",
    "print", "coalesce", "if_null",
}

# .map/.filter-family ops the REFERENCE rejects as E090; the subset this
# engine genuinely does not execute either
UNSUPPORTED_OPS = {
    "map": "use .select() with expressions instead",
    "concurrent": "use partition_by for parallel processing",
    "on_error": "handle errors in your .where() or .select() logic",
    "collect": None,
    "fork": None,
    "any": None,
    "all": None,
}


@dataclass
class Diagnostic:
    severity: str
    code: str
    message: str
    hint: str | None = None

    def format(self) -> str:
        base = f"{self.severity}[{self.code}]: {self.message}"
        return f"{base}\n  hint: {self.hint}" if self.hint else base


@dataclass
class ValidationResult:
    diagnostics: list[Diagnostic] = field(default_factory=list)

    @property
    def errors(self) -> list[Diagnostic]:
        return [d for d in self.diagnostics if d.severity == ERROR]

    @property
    def warnings(self) -> list[Diagnostic]:
        return [d for d in self.diagnostics if d.severity == WARNING]

    def has(self, code: str) -> bool:
        return any(d.code == code for d in self.diagnostics)

    def format(self) -> str:
        return "\n".join(d.format() for d in self.diagnostics)


def _engine_builtins() -> set[str]:
    from varpulis_spark.vpl import compiler as C

    names = set(_REFERENCE_BUILTINS)
    for reg in ("_SCALAR_FNS", "_SCALAR_MULTI", "_SQL_FNS", "_PY_FNS", "_AGG_FNS"):
        names |= set(getattr(C, reg, {}) or ())
    names |= set(AGGREGATE_FUNCTIONS)
    return names


def validate(program: Program) -> ValidationResult:
    """Run both validation passes over a parsed Program."""
    v = ValidationResult()
    emit = v.diagnostics.append

    # -- pass 1: duplicate declarations (checks.rs:18-184) -------------------
    for attr, code, what in (
        ("events", "E001", "event type"),
        ("streams", "E002", "stream"),
        ("fns", "E003", "function"),
        ("connectors", "E004", "connector"),
        ("patterns", "E006", "pattern"),
    ):
        seen: set[str] = set()
        for d in getattr(program, attr):
            if d.name in seen:
                emit(Diagnostic(ERROR, code, f"duplicate {what} '{d.name}'"))
            seen.add(d.name)

    events = {d.name for d in program.events}
    streams = {d.name for d in program.streams}
    patterns = {d.name for d in program.patterns}
    connectors = {d.name: d.kind for d in program.connectors}
    fns = {d.name: len(d.params) for d in program.fns}
    known_fns = _engine_builtins() | set(fns)

    # -- variables: immutability (checks.rs:214-238, E040) -------------------
    mutable: dict[str, bool] = {}
    for d in program.vars:
        if isinstance(d, VarDecl):
            if d.assign:
                if d.name in mutable and not mutable[d.name]:
                    emit(Diagnostic(
                        ERROR, "E040",
                        f"cannot assign to immutable variable '{d.name}'",
                        "declared as immutable — use 'var' instead of 'let'",
                    ))
                mutable.setdefault(d.name, True)  # implicit := creates mutable
            else:
                mutable[d.name] = not d.const
            _check_expr_functions(d.value, known_fns, fns, emit)

    # -- pass 2: stream semantics (checks.rs:187-688) -------------------------
    def check_source_name(name: str) -> None:
        if name not in events and name not in streams and name not in patterns:
            emit(Diagnostic(
                WARNING, "W030",
                f"reference to undeclared event type or stream '{name}'",
                "implicit event types are valid, but consider declaring it "
                "explicitly",
            ))

    for decl in program.streams:
        for step in decl.steps:
            if step.event_type:
                check_source_name(step.event_type)
        src = decl.source
        if src is not None and hasattr(src, "parts"):
            for p in src.parts:
                name = p if isinstance(p, str) else p.event_type
                if name:
                    check_source_name(name)
        if isinstance(src, SequenceSource):
            for step in src.steps:
                if step.event_type:
                    check_source_name(step.event_type)

        in_sequence = (
            isinstance(src, SequenceSource)
            or len(decl.steps) >= 2
            or any(getattr(s, "negated", False) for s in decl.steps)
            or (decl.steps and decl.steps[0].event_type in patterns)
        )
        # inline `.pattern(chain: A -> B)` must be the FIRST op: the
        # lowering attaches the pattern analyzer to the ingest stream, so
        # ops before it have nothing well-defined to apply to (E091 is
        # ours — the reference's apama programs never precede .pattern)
        for idx, op in enumerate(decl.ops):
            if op.name == "pattern" and any(
                isinstance(v, (PatSeq, PatAnd, PatOr, PatNot, PatternStep))
                for v in op.kwargs.values()
            ):
                if idx > 0:
                    prev = decl.ops[idx - 1].name
                    emit(Diagnostic(
                        ERROR, "E091",
                        f"ops before inline .pattern(...) are not supported "
                        f"(found .{prev} preceding it)",
                        "move the op after .pattern(...) or filter inside "
                        "the pattern's step predicates",
                    ))
                break
        seen_aggregate = seen_window = False
        ops = [op for s in decl.steps for op in getattr(s, "ops", [])] + list(decl.ops)
        for op in ops:
            if op.name in UNSUPPORTED_OPS:
                emit(Diagnostic(
                    ERROR, "E090",
                    f".{op.name}() is not implemented",
                    UNSUPPORTED_OPS[op.name],
                ))
            elif op.name == "having":
                if not seen_aggregate:
                    emit(Diagnostic(
                        ERROR, "E010",
                        ".having() used without a prior .aggregate()",
                        "add .aggregate(...) before .having()",
                    ))
                if op.args:
                    _check_boolean_expr(op.args[0], ".having()", emit)
            elif op.name == "aggregate":
                if seen_aggregate:
                    emit(Diagnostic(
                        ERROR, "E011",
                        "duplicate .aggregate() — only one aggregation per "
                        "stream is allowed",
                    ))
                if not seen_window:
                    emit(Diagnostic(
                        WARNING, "W001",
                        ".aggregate() without a prior .window()",
                        "results will accumulate indefinitely; add .window() "
                        "for bounded aggregation",
                    ))
                seen_aggregate = True
                _check_aggregate_items(op.kwargs, emit)
            elif op.name == "window":
                if seen_window:
                    emit(Diagnostic(
                        ERROR, "E012",
                        "duplicate .window() — only one window per stream is "
                        "allowed",
                    ))
                seen_window = True
            elif op.name == "partition_by":
                if seen_window:
                    emit(Diagnostic(
                        WARNING, "W002",
                        ".partition_by() after .window() — partitioning "
                        "should come before windowing",
                        "move .partition_by() before .window()",
                    ))
            elif op.name == "within":
                if not in_sequence:
                    emit(Diagnostic(
                        ERROR, "E020",
                        ".within() used outside a sequence context",
                        ".within() requires a sequence source or -> "
                        "(followed_by) operators",
                    ))
                if op.args:
                    _check_duration_expr(op.args[0], ".within()", emit)
            elif op.name in ("not", "followed_by"):
                in_sequence = True
            elif op.name in ("to", "from", "enrich"):
                cname = _arg_name(op.args[0]) if op.args else None
                if cname is not None:
                    if cname not in connectors:
                        emit(Diagnostic(
                            ERROR, "E030",
                            f"undefined connector '{cname}'",
                            f"declare it with: connector {cname} = type (...)",
                        ))
                    elif op.name == "enrich" and (
                        connectors[cname] not in ENRICH_COMPATIBLE_TYPES
                    ):
                        emit(Diagnostic(
                            ERROR, "E032",
                            f".enrich() is not compatible with '{cname}' "
                            f"connector type '{connectors[cname]}'",
                            ".enrich() requires a request-response connector "
                            f"({', '.join(ENRICH_COMPATIBLE_TYPES)})",
                        ))
                if op.name == "enrich" and "fields" not in op.kwargs:
                    emit(Diagnostic(
                        WARNING, "W032",
                        ".enrich() has no fields specified",
                        "add fields: [field1, field2] to extract data from "
                        "the enrichment response",
                    ))
            elif op.name in ("where", "filter"):
                if op.args:
                    _check_boolean_expr(op.args[0], f".{op.name}()", emit)
            elif op.name == "allowed_lateness":
                if op.args:
                    _check_duration_expr(op.args[0], ".allowed_lateness()", emit)
            elif op.name == "emit":
                # `.emit(Type, ...)` names the output type
                tname = _arg_name(op.args[0]) if op.args else None
                if tname is not None:
                    if tname not in events and tname not in streams:
                        emit(Diagnostic(
                            WARNING, "W031",
                            f".emit as '{tname}' references an undeclared type",
                            f"consider declaring: event {tname}: ...",
                        ))
    return v


def _check_boolean_expr(expr, context: str, emit) -> None:
    """checks.rs:690-734 — E060 for non-bool literals, W060 for arithmetic."""
    names = {int: "integer", float: "float", str: "string"}
    if isinstance(expr, Lit) and not isinstance(expr.value, bool):
        emit(Diagnostic(
            ERROR, "E060",
            f"{context} condition must be a boolean expression, got "
            f"{names.get(type(expr.value), 'non-boolean')} literal",
            "use a comparison like field > value or a boolean expression",
        ))
    elif isinstance(expr, Dur):
        emit(Diagnostic(
            ERROR, "E060",
            f"{context} condition must be a boolean expression, got "
            "duration literal",
            "use a comparison like field > value or a boolean expression",
        ))
    elif isinstance(expr, Bin) and expr.op in ("+", "-", "*", "/", "%", "**"):
        emit(Diagnostic(
            WARNING, "W060",
            f"{context} condition is an arithmetic expression ({expr.op}), "
            "expected boolean",
            "use a comparison operator (==, !=, <, >, <=, >=)",
        ))


def _check_duration_expr(expr, context: str, emit) -> None:
    """checks.rs:736-756 — E061; Int literals allowed (count-based)."""
    if isinstance(expr, Dur):
        return
    if isinstance(expr, Lit):
        if isinstance(expr.value, bool):
            kind = "boolean"
        elif isinstance(expr.value, int):
            return  # count-based is allowed
        elif isinstance(expr.value, float):
            kind = "float"
        elif isinstance(expr.value, str):
            kind = "string"
        elif expr.value is None:
            kind = "null"
        else:
            return
        emit(Diagnostic(
            ERROR, "E061",
            f"{context} must be a duration, got {kind} literal",
            "use a duration like 5s, 1m, 1h",
        ))


def _check_aggregate_items(kwargs: dict, emit) -> None:
    """checks.rs:902-979 — E070/E071/E072/E073."""
    for alias, expr in kwargs.items():
        if isinstance(expr, Call):
            fname = expr.name
            if fname not in AGGREGATE_FUNCTIONS:
                emit(Diagnostic(
                    ERROR, "E070",
                    f"unknown aggregate function '{fname}' in alias '{alias}'",
                    f"known aggregate functions: {', '.join(AGGREGATE_FUNCTIONS)}",
                ))
                continue
            if fname in AGGREGATE_REQUIRES_FIELD and not expr.args:
                emit(Diagnostic(
                    ERROR, "E071",
                    f"aggregate function '{fname}' requires a field argument",
                    f"usage: {fname}(field_name)",
                ))
            if fname in AGGREGATE_REQUIRES_TWO_ARGS and len(expr.args) < 2:
                emit(Diagnostic(
                    ERROR, "E072",
                    f"aggregate function '{fname}' requires two arguments: "
                    "field and period",
                    f"usage: {fname}(field_name, period)",
                ))
        elif isinstance(expr, Ref):
            emit(Diagnostic(
                ERROR, "E073",
                f"bare field reference '{'.'.join(expr.parts)}' in aggregate "
                "without an aggregate function",
                f"wrap in an aggregate function, e.g. "
                f"last({'.'.join(expr.parts)})",
            ))


def _check_expr_functions(expr, known: set[str], fns: dict[str, int], emit) -> None:
    """checks.rs:1013-1110 — E050 unknown fn, E051 user-fn arity."""
    if expr is None:
        return
    if isinstance(expr, Call):
        if expr.name in fns:
            if len(expr.args) != fns[expr.name]:
                emit(Diagnostic(
                    ERROR, "E051",
                    f"function '{expr.name}' expects {fns[expr.name]} "
                    f"argument(s), but {len(expr.args)} provided",
                ))
        elif expr.name not in known:
            emit(Diagnostic(
                ERROR, "E050",
                f"unknown function '{expr.name}'",
                "check the function name or declare it with fn",
            ))
        for a in expr.args:
            _check_expr_functions(a, known, fns, emit)
    elif isinstance(expr, Bin):
        _check_expr_functions(expr.left, known, fns, emit)
        _check_expr_functions(expr.right, known, fns, emit)
