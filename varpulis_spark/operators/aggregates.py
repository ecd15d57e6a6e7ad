"""Aggregation functions for `.aggregate(...)` after a window / group-by.

Reference surface: crates/varpulis-runtime/src/aggregation.rs (Aggregator,
AggregateFunc impls) and the aggregate-expression compiler
crates/varpulis-runtime/src/engine/compiler.rs:15-106. Everything here lowers
to built-in Spark aggregate Columns — partial (map-side) aggregation, codegen
and AQE come for free; there is no Python in the aggregation path. The one
order-dependent aggregate (EMA) lowers to sort_array(collect_list(...)) +
F.aggregate — still JVM-side via Catalyst higher-order functions.

Semantics preserved:
- stddev = SAMPLE stddev, null when n < 2 (aggregation.rs:328-388 Welford,
  n-1 denominator) — Spark's stddev_samp yields NaN for n==1, so we guard.
- ema: k = 2/(period+1), seeded with the first value
  (aggregation.rs:677-724).
- count_distinct is EXACT (HashSet, aggregation.rs:445).
- first/last are ordered by (ts, order tiebreaker) — the reference sees
  events in arrival order; batch mode orders by event time.
- arithmetic over aggregates, e.g. ema(x,12) - ema(x,26)
  (ExprAggregate, aggregation.rs:494-675) → plain Column arithmetic.
"""

from __future__ import annotations

import operator
from dataclasses import dataclass, field as dc_field
from typing import Any, Callable

from pyspark.sql import Column
from pyspark.sql import functions as F


class AggBase:
    """Base for aggregate specs; supports arithmetic composition like the
    reference's ExprAggregate (aggregation.rs:494-675)."""

    def _bin(self, other: Any, op: Callable, rev: bool = False) -> "AggArith":
        return AggArith(self, other, op, rev)

    def __add__(self, other):
        return self._bin(other, operator.add)

    def __radd__(self, other):
        return self._bin(other, operator.add, rev=True)

    def __sub__(self, other):
        return self._bin(other, operator.sub)

    def __rsub__(self, other):
        return self._bin(other, operator.sub, rev=True)

    def __mul__(self, other):
        return self._bin(other, operator.mul)

    def __rmul__(self, other):
        return self._bin(other, operator.mul, rev=True)

    def __truediv__(self, other):
        return self._bin(other, operator.truediv)

    def __rtruediv__(self, other):
        return self._bin(other, operator.truediv, rev=True)

    def to_column(
        self, ts_col: str, order_col: str | None, float_fields: frozenset | None = None
    ) -> Column:
        raise NotImplementedError


@dataclass
class AggSpec(AggBase):
    kind: str
    field: str | Column | None = None
    params: dict = dc_field(default_factory=dict)

    def _field_col(self) -> Column:
        return F.col(self.field) if isinstance(self.field, str) else self.field

    def _order(self, ts_col: str, order_col: str | None) -> Column:
        if order_col:
            return F.struct(F.col(ts_col), F.col(order_col))
        return F.col(ts_col)

    def to_column(
        self, ts_col: str, order_col: str | None, float_fields: frozenset | None = None
    ) -> Column:
        k = self.kind
        f = self._field_col() if self.field is not None else None
        if f is not None and k in (
            "sum", "avg", "min", "max", "stddev", "variance",
            "median", "percentile", "ema",
        ):
            # the reference FILTERS NaN from every numeric aggregate
            # (aggregation.rs:183-198 and siblings; pinned by the
            # aggregation_coverage_tests port) where Spark would propagate
            # it — and F.max even ranks NaN above every real double.
            # `f = f` is false exactly for NaN and type-preserving for
            # every non-floating column, so longs/strings are untouched.
            f = F.when(f == f, f)
        if k == "count":
            return F.count(F.lit(1)) if f is None else F.count(f)
        if k == "sum":
            s = F.sum(f)
            if float_fields and isinstance(self.field, str) and self.field in float_fields:
                # the reference's Sum filters NaN then sums the remaining
                # slice — an empty slice folds to Float(0.0), not null
                # (aggregation.rs apply_refs + simd sum_f64), so an all-NaN
                # or all-missing float group yields 0.0. Only floating
                # fields get this (integer sums keep their Long type).
                s = F.coalesce(s, F.lit(0.0))
            return s
        if k == "avg":
            return F.avg(f)
        if k == "min":
            return F.min(f)
        if k == "max":
            return F.max(f)
        if k == "stddev":
            # sample stddev, null when n < 2 (aggregation.rs:355-360)
            return F.when(F.count(f) >= 2, F.stddev_samp(f)).otherwise(F.lit(None))
        if k == "variance":
            return F.when(F.count(f) >= 2, F.var_samp(f)).otherwise(F.lit(None))
        if k == "count_distinct":
            return F.countDistinct(f)
        if k == "approx_count_distinct":
            return F.approx_count_distinct(f, self.params.get("rsd", 0.05))
        if k == "first":
            return F.min_by(f, self._order(ts_col, order_col))
        if k == "last":
            return F.max_by(f, self._order(ts_col, order_col))
        if k == "collect":
            # ts-ordered list of values (columnar window buffer analog)
            pairs = F.sort_array(F.collect_list(F.struct(self._order(ts_col, order_col).alias("o"), f.alias("v"))))
            return F.transform(pairs, lambda s: s.getField("v"))
        if k == "ema":
            return self._ema(ts_col, order_col)
        if k == "median":
            return F.median(f)
        if k == "percentile":
            return F.percentile(f, self.params["p"])
        if k == "udaf":
            return self._udaf(ts_col, order_col)
        raise ValueError(f"unknown aggregate: {self.kind}")

    def _udaf(self, ts_col: str, order_col: str | None) -> Column:
        """Custom aggregate (AggregateFunc trait, aggregation.rs:104-148).

        Default: collect_list (map-side partial list building) + ONE
        SCALAR pandas UDF over the aggregated array column — `fn` gets a
        pandas Series (unordered) or a ts-ordered python list
        (ordered=True, the trait's apply(events) contract). A scalar
        pandas UDF applied to an aggregate expression runs AFTER the
        aggregation, so it mixes freely with built-in aggregates (which
        Spark forbids for GROUPED_AGG pandas UDFs), and the group arrays
        cross into Python as Arrow batches — no row-at-a-time pickling
        (plan shows ArrowEvalPython, never BatchEvalPython). A black-box
        fn cannot partial-aggregate, so every path ships the group's
        values. vectorized=True keeps the grouped-agg pandas UDF (skips
        the JVM array materialization) for all-pandas specs."""
        fn = self.params["fn"]
        rt = self.params.get("return_type", "double")
        f = self._field_col()
        from pyspark.sql.functions import pandas_udf

        if self.params.get("vectorized"):
            import pandas as pd

            py = {"double": float, "float": float, "int": int, "long": int,
                  "bigint": int, "string": str, "boolean": bool}.get(rt, float)

            def w(s):
                return fn(s)

            w.__annotations__ = {"s": pd.Series, "return": py}
            return pandas_udf(w, rt)(f)

        if self.params.get("ordered"):
            pairs = F.sort_array(
                F.collect_list(
                    F.struct(self._order(ts_col, order_col).alias("o"), f.alias("v"))
                )
            )
            vals = F.transform(pairs, lambda s: s.getField("v"))

            def on_lists(groups):
                import pandas as pd

                return pd.Series([fn(list(arr)) for arr in groups])

            on_lists.__name__ = getattr(fn, "__name__", "udaf_ordered")
            return pandas_udf(on_lists, rt)(vals)

        def on_arrays(groups):
            import pandas as pd

            return pd.Series([fn(pd.Series(arr)) for arr in groups])

        on_arrays.__name__ = getattr(fn, "__name__", "udaf")
        return pandas_udf(on_arrays, rt)(F.collect_list(f))

    def _ema(self, ts_col: str, order_col: str | None) -> Column:
        """EMA over ts-ordered values: seed = first value, then
        v*k + prev*(1-k), k = 2/(period+1) (aggregation.rs:677-724).

        Lowered as sort_array(collect_list(struct(order, v))) then a Catalyst
        higher-order F.aggregate — no Python UDF. Per-window lists are bounded
        by the window size; for unbounded groups prefer a windowed query.
        """
        # Ema::new(0) clamps the period to 1 (module-level `max` is the
        # aggregate factory, hence the conditional)
        period = self.params.get("period", 12)
        if period < 1:
            period = 1
        k = 2.0 / (float(period) + 1.0)
        if isinstance(self.field, str):
            # assembled as ONE SQL string: composing the HOF chain from
            # Column objects + Python lambdas issues ~350 py4j round-trips
            # per EMA instance (~0.2 s of driver wall each, measured r13 —
            # guide §1.2 driver overhead); a single F.expr is one
            # round-trip and parses to the identical optimized plan
            # (verified by normalized-plan diff).
            o = (
                f"struct(`{ts_col}`, `{order_col}`)"
                if order_col
                else f"`{ts_col}`"
            )
            fx = f"cast(`{self.field}` as double)"
            fx = f"case when {fx} = {fx} then {fx} end"  # NaN -> null
            pairs = f"sort_array(collect_list(struct({o} as o, ({fx}) as v)))"
            vals = f"filter(transform({pairs}, s -> s.v), v -> v is not null)"
            seed = f"element_at({vals}, 1)"
            rest = f"slice({vals}, 2, greatest(size({vals}) - 1, 0))"
            return F.expr(
                f"aggregate({rest}, {seed}, "
                f"(acc, x) -> x * {k!r}D + acc * {1.0 - k!r}D)"
            )
        f = self._field_col().cast("double")
        # NaN → null here, then null entries are FILTERED from the fold
        # input (collect_list skips bare nulls but keeps structs with a
        # null field), matching the reference's get_float + NaN filter
        # before the fold (missing/NaN values are skipped, not zeroed)
        f = F.when(f == f, f)
        pairs = F.sort_array(
            F.collect_list(F.struct(self._order(ts_col, order_col).alias("o"), f.alias("v")))
        )
        vals = F.filter(
            F.transform(pairs, lambda s: s.getField("v")), lambda v: v.isNotNull()
        )
        seed = F.element_at(vals, 1)
        rest = F.slice(vals, 2, F.greatest(F.size(vals) - 1, F.lit(0)))
        return F.aggregate(rest, seed, lambda acc, x: x * F.lit(k) + acc * F.lit(1.0 - k))


@dataclass
class AggArith(AggBase):
    left: Any
    right: Any
    op: Callable
    rev: bool = False

    def to_column(
        self, ts_col: str, order_col: str | None, float_fields: frozenset | None = None
    ) -> Column:
        def lower(x):
            return (
                x.to_column(ts_col, order_col, float_fields)
                if isinstance(x, AggBase)
                else F.lit(x)
            )

        l, r = lower(self.left), lower(self.right)
        return self.op(r, l) if self.rev else self.op(l, r)


# -- public constructors (the `.aggregate(alias: func(field))` surface) -----


def count(field: str | Column | None = None) -> AggSpec:
    return AggSpec("count", field)


def sum(field: str | Column) -> AggSpec:  # noqa: A001 - mirrors VPL name
    return AggSpec("sum", field)


def avg(field: str | Column) -> AggSpec:
    return AggSpec("avg", field)


def min(field: str | Column) -> AggSpec:  # noqa: A001
    return AggSpec("min", field)


def max(field: str | Column) -> AggSpec:  # noqa: A001
    return AggSpec("max", field)


def stddev(field: str | Column) -> AggSpec:
    return AggSpec("stddev", field)


def variance(field: str | Column) -> AggSpec:
    return AggSpec("variance", field)


def count_distinct(field: str | Column) -> AggSpec:
    return AggSpec("count_distinct", field)


def approx_count_distinct(field: str | Column, rsd: float = 0.05) -> AggSpec:
    return AggSpec("approx_count_distinct", field, {"rsd": rsd})


def first(field: str | Column) -> AggSpec:
    return AggSpec("first", field)


def last(field: str | Column) -> AggSpec:
    return AggSpec("last", field)


def collect(field: str | Column) -> AggSpec:
    return AggSpec("collect", field)


def ema(field: str | Column, period: int = 12) -> AggSpec:
    return AggSpec("ema", field, {"period": period})


def median(field: str | Column) -> AggSpec:
    return AggSpec("median", field)


def percentile(field: str | Column, p: float) -> AggSpec:
    return AggSpec("percentile", field, {"p": p})


def udaf(
    fn,
    field: str | Column,
    return_type: str = "double",
    ordered: bool = False,
    vectorized: bool = False,
) -> AggSpec:
    """Custom aggregate (AggregateFunc trait, aggregation.rs:104-148):
    `fn(values) -> scalar` over each group/window, one Python call per
    GROUP. Default: fn gets a pandas Series (unordered), mix-safe with
    built-ins. ordered=True: a ts-ordered list (the apply(events)
    contract). vectorized=True: grouped-agg Pandas UDF (Arrow path; Spark
    forbids mixing it with non-pandas aggregates). Composes with aggregate
    arithmetic like any built-in."""
    return AggSpec(
        "udaf",
        field,
        {"fn": fn, "return_type": return_type, "ordered": ordered,
         "vectorized": vectorized},
    )


def compile_aggs(
    aggs: dict[str, AggBase | Column],
    ts_col: str,
    order_col: str | None,
    float_fields: frozenset | None = None,
) -> list[Column]:
    """Lower alias→spec mappings to aliased aggregate Columns.

    `float_fields` is the set of floating-typed column names in the input
    frame — used to match the reference's all-NaN Sum → Float(0.0)."""
    out = []
    for alias, spec in aggs.items():
        col = (
            spec.to_column(ts_col, order_col, float_fields)
            if isinstance(spec, AggBase)
            else spec
        )
        out.append(col.alias(alias))
    return out
