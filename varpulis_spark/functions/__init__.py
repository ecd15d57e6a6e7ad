"""VPL expression semantics → Spark Columns.

Covers the reference's scalar expression language (operators and built-in
functions dispatched in crates/varpulis-runtime/src/engine/evaluator.rs:
470-793 free functions, 1376-1545 collection methods) as a thin, fully
JVM-side layer over pyspark.sql.functions — no Python UDFs in the hot path.

Semantics preserved from the reference:
- truthiness of non-bool predicates: 0 / "" / empty array / null are falsy
  (crates/varpulis-core/src/value.rs:110-121) → `truthy()`.
- division by zero → Null (evaluator.rs:543-553) → session runs ANSI-off.
- `??` coalesce, `?.` null-safe member access, `a..b` ranges, slices.
- duration literals ("5m", "1h30m", "250ms") → `duration()` nanoseconds,
  matching reference Value::Duration (ns, value.rs:38).
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# helpers

ColumnLike = "Column | str | int | float | bool"


def col(c) -> Column:
    """Coerce a column-like (Column, name string, or literal) to Column."""
    if isinstance(c, Column):
        return c
    if isinstance(c, str):
        return F.col(c)
    return F.lit(c)


def lit(v) -> Column:
    return F.lit(v)


def expr(sql: str) -> Column:
    return F.expr(sql)


# ---------------------------------------------------------------------------
# truthiness / logic (reference value.rs:110-121)


def truthy(c) -> Column:
    """VPL truthiness: null/false/0/0.0/''/empty-array → false, else true."""
    c = col(c)
    return F.when(c.isNull(), F.lit(False)).otherwise(
        c.try_cast("boolean").isNotNull()
        & c.try_cast("boolean")
        | (c.try_cast("double").isNotNull() & (c.try_cast("double") != 0.0))
        | (c.try_cast("string").isNotNull() & (F.length(c.try_cast("string")) > 0)
           & c.try_cast("double").isNull() & c.try_cast("boolean").isNull())
    )


def coalesce(*cols) -> Column:
    """`a ?? b` (reference ast.rs:473-565 Coalesce)."""
    return F.coalesce(*[col(c) for c in cols])


def if_then_else(cond, then, otherwise) -> Column:
    """`if c then a else b` expression form."""
    return F.when(col(cond), col(then)).otherwise(col(otherwise))


def is_in(needle, *haystack) -> Column:
    """`x in [..]` → isin; `x in array_col` → array_contains."""
    if len(haystack) == 1 and isinstance(haystack[0], Column):
        return F.array_contains(haystack[0], col(needle))
    return col(needle).isin(*haystack)


def xor(a, b) -> Column:
    return truthy(a) != truthy(b)


# ---------------------------------------------------------------------------
# arithmetic (ANSI-off session: / by zero → null like evaluator.rs:543-553)


def pow_(a, b) -> Column:  # `**` operator, ast.rs:576-610
    return F.pow(col(a), col(b))


def safe_div(a, b) -> Column:
    """Explicit guarded division — null on zero denominator, any ANSI mode."""
    b = col(b)
    return F.when(b == 0, F.lit(None)).otherwise(col(a) / b)


def neg(a) -> Column:
    return -col(a)


# ---------------------------------------------------------------------------
# durations & timestamps


_DUR_RE = re.compile(r"(\d+(?:\.\d+)?)\s*(ns|us|ms|s|m|h|d|w)")
_DUR_NS = {
    "ns": 1,
    "us": 1_000,
    "ms": 1_000_000,
    "s": 1_000_000_000,
    "m": 60 * 1_000_000_000,
    "h": 3_600 * 1_000_000_000,
    "d": 86_400 * 1_000_000_000,
    "w": 7 * 86_400 * 1_000_000_000,
}


def duration_ns(spec: str | int | float) -> int:
    """Parse a VPL duration literal ('5m', '1h30m') to integer nanoseconds."""
    if isinstance(spec, (int, float)):
        return int(spec)
    total = 0
    pos = 0
    for m in _DUR_RE.finditer(spec):
        total += int(float(m.group(1)) * _DUR_NS[m.group(2)])
        pos = m.end()
    if total == 0 and pos == 0:
        raise ValueError(f"bad duration literal: {spec!r}")
    return total


def duration_seconds(spec: str | int | float) -> float:
    return duration_ns(spec) / 1e9


def duration_interval_str(spec: str | int | float) -> str:
    """Duration as a Spark interval string ('300 seconds') for F.window."""
    ns = duration_ns(spec)
    if ns % 1_000_000_000 == 0:
        return f"{ns // 1_000_000_000} seconds"
    return f"{ns // 1_000} microseconds"


# ---------------------------------------------------------------------------
# math (evaluator.rs:470-545) — direct F.* mappings

abs_ = F.abs
sqrt = F.sqrt
floor = F.floor
ceil = F.ceil
exp = F.exp
sin = F.sin
cos = F.cos
tan = F.tan


def round_(c, digits: int = 0) -> Column:
    return F.round(col(c), digits)


def log(c, base=None) -> Column:
    return F.log(float(base), col(c)) if base is not None else F.log(col(c))


def log10(c) -> Column:
    return F.log10(col(c))


def min_(*cols) -> Column:  # scalar n-ary min (evaluator.rs:532)
    return F.least(*[col(c) for c in cols])


def max_(*cols) -> Column:
    return F.greatest(*[col(c) for c in cols])


# ---------------------------------------------------------------------------
# collections (evaluator.rs:548-683 & method-style 1376-1545)


def len_(c) -> Column:
    c = col(c)
    return F.size(c)


def first(c) -> Column:
    return F.element_at(col(c), 1)


def last(c) -> Column:
    return F.element_at(col(c), -1)


def push(arr, v) -> Column:
    return F.array_append(col(arr), col(v))


def reverse(c) -> Column:
    return F.reverse(col(c))


def sort(c) -> Column:
    return F.array_sort(col(c))


def contains(c, v) -> Column:
    return F.array_contains(col(c), col(v))


def keys(m) -> Column:
    return F.map_keys(col(m))


def values(m) -> Column:
    return F.map_values(col(m))


def get(m, k, default=None) -> Column:
    out = F.element_at(col(m), k if not isinstance(k, Column) else k)
    return F.coalesce(out, col(default)) if default is not None else out


def range_(a, b, inclusive: bool = False) -> Column:
    """`a..b` / `a..=b` range expressions (ast.rs:473-565)."""
    end = col(b) if inclusive else col(b) - 1
    return F.sequence(col(a), end)


def slice_(arr, start, stop) -> Column:
    """Python-style arr[start:stop] (0-based, stop exclusive)."""
    return F.slice(col(arr), start + 1, stop - start)


def sum_list(c) -> Column:
    return F.aggregate(col(c), F.lit(0.0), lambda acc, x: acc + x.cast("double"))


def avg_list(c) -> Column:
    c = col(c)
    return safe_div(sum_list(c), F.size(c))


def map_list(c, fn) -> Column:  # .map(x => ...) evaluator.rs:1397
    return F.transform(col(c), fn)


def filter_list(c, fn) -> Column:  # .filter(x => ...) evaluator.rs:1376
    return F.filter(col(c), fn)


def flatten(c) -> Column:
    return F.flatten(col(c))


def min_list(c) -> Column:
    return F.array_min(col(c))


def max_list(c) -> Column:
    return F.array_max(col(c))


def sliding_pairs(c) -> Column:
    """.sliding_pairs() (evaluator.rs:1459): [a,b,c] → [[a,b],[b,c]]."""
    c = col(c)
    return F.zip_with(
        F.slice(c, 1, F.greatest(F.size(c) - 1, F.lit(0))),
        F.slice(c, 2, F.greatest(F.size(c) - 1, F.lit(0))),
        lambda a, b: F.array(a, b),
    )


def variance_list(c) -> Column:
    """Population variance of an array of numbers (evaluator.rs collection
    method)."""
    c = col(c)
    n = F.size(c)
    mean = avg_list(c)
    sq = F.aggregate(c, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double"))
    return safe_div(sq, n) - mean * mean


# ---------------------------------------------------------------------------
# strings (evaluator.rs:685-758)


def to_string(c) -> Column:
    return col(c).cast("string")


def to_int(c) -> Column:
    return col(c).try_cast("long")


def to_float(c) -> Column:
    return col(c).try_cast("double")


trim = F.trim
lower = F.lower
upper = F.upper


def split(c, sep: str) -> Column:
    # reference split is literal, Spark's is regex — escape it.
    return F.split(col(c), re.escape(sep))


def join(arr, sep: str) -> Column:
    return F.array_join(col(arr), sep)


def replace(c, old: str, new: str) -> Column:
    return F.replace(col(c), F.lit(old), F.lit(new))


def starts_with(c, prefix) -> Column:
    return col(c).startswith(prefix)


def ends_with(c, suffix) -> Column:
    return col(c).endswith(suffix)


def substring(c, start: int, length: int) -> Column:
    return F.substring(col(c), start + 1, length)  # reference is 0-based


# ---------------------------------------------------------------------------
# type introspection (evaluator.rs:760-793)


def type_of(c) -> Column:
    return F.typeof(col(c))


def is_null(c) -> Column:
    return col(c).isNull()


def is_int(c) -> Column:
    return F.typeof(col(c)).isin("int", "bigint", "smallint", "tinyint")


def is_float(c) -> Column:
    return F.typeof(col(c)).isin("double", "float", "decimal")


def is_string(c) -> Column:
    return F.typeof(col(c)) == "string"


def is_bool(c) -> Column:
    return F.typeof(col(c)) == "boolean"


def is_array(c) -> Column:
    return F.typeof(col(c)).startswith("array")


def is_map(c) -> Column:
    return F.typeof(col(c)).startswith("map")


# JSON access for dynamic payloads (the generic `props` column)
def prop(c, key: str) -> Column:
    """Extract a key from a JSON props column (dynamic event payload)."""
    return F.get_json_object(col(c), f"$.{key}")


def register_fn(spark, name: str, fn, return_type: str = "double"):
    """`fn name(params) -> T:` user functions (UserFunction
    engine/types.rs:33-38) → registered Spark UDF, callable from both the
    Column API and SQL. Row-at-a-time Python — keep OUT of hot paths; the
    expression layer above covers the built-ins JVM-side."""
    from pyspark.sql.functions import udf

    f = udf(fn, return_type)
    spark.udf.register(name, f)
    return f
