"""GRETA trend aggregation — aggregate over ALL Kleene trend matches
WITHOUT enumerating them.

Reference: `.trend_aggregate(c: count_trends(), n: count_events(f), ...)`
(ast.rs:321-323,343-350) implemented by the GRETA dynamic program
(crates/varpulis-runtime/src/greta.rs:1-41, GretaAggregate greta.rs:238-252;
after Poppe et al., "GRETA: Graph-based Real-time Event Trend Aggregation",
VLDB'17). A trend is a match of `E+` under skip-till-any-match with an
optional adjacency predicate (e.g. rising: next.value > prev.value) and an
optional `within` span; the number of trends is exponential in the event
count, but per-event propagated counts give every aggregate in O(n²):

    cnt[i] = 1 + Σ_{j<i, adjacent(j,i)} cnt[j]       (trends ending at i)
    count_trends  = Σ cnt[i]
    count_events  = Σ_i cnt[i]·... — here: Σ over trends of trend length,
                    propagated as len_sum[i] = cnt[i] + Σ len_sum[j]
    sum_trends(f) = Σ over trends of Σ f(e), propagated the same way.

Spark lowering: per partition key the DP is a ts-sorted numpy loop inside
`applyInPandas` (the same shuffle shape as any keyed aggregation; O(n²) work
per key is the algorithm's contract — the reference is identical). The
event-type prefilter pushes into the scan.

Caps: the reference bounds Kleene state (MAX_KLEENE_EVENTS=20 applies to
ENUMERATION, sase.rs:36-39); GRETA's whole point is no enumeration, so no
cap is applied here. Counts can exceed int64 for adversarial inputs
(2^n growth) — computed in float64 like the reference's f64 accumulators.
"""

from __future__ import annotations

from typing import Callable

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from varpulis_spark.functions import duration_ns


def trend_aggregate_multi(
    stream,
    queries: dict[str, dict],
) -> DataFrame:
    """Hamlet-style MULTI-QUERY trend aggregation (runtime/src/hamlet/,
    SIGMOD'21): N concurrent trend queries answered in ONE pass per key.

    What is shared (the Hamlet idea, adapted to Spark): the scan, the
    event-type prefilter (union of all queries' types), the shuffle, the
    per-key sort, and the Arrow materialization — the dominant costs at
    scale. Each query then runs its GRETA DP over its own type/predicate
    view of the sorted batch. (The reference additionally shares graphlet
    counts BETWEEN queries with overlapping patterns; that sub-quadratic
    sharing is future work — this gives the N-queries-for-one-scan
    economics that the Hamlet benchmark measures.)

    `queries`: name → {event_type?, adjacent?, value_field?, within?}.
    Output: one row per (key, query) with the same aggregates as
    `trend_aggregate`.
    """
    df = stream.df
    ts_col = stream.ts_col
    order_col = stream.order_col
    keys = stream.keys
    types = {q.get("event_type") for q in queries.values()}
    if None not in types:
        df = df.filter(F.col("event_type").isin(sorted(t for t in types if t)))
    sort_cols = [ts_col] + ([order_col] if order_col else [])
    specs = {
        name: (
            q.get("event_type"),
            q.get("adjacent"),
            q.get("value_field"),
            duration_ns(q["within"]) if q.get("within") is not None else None,
        )
        for name, q in queries.items()
    }

    key_fields = ", ".join(f"{k} {t}" for k, t in df.dtypes if k in keys)
    schema = (key_fields + ", " if keys else "") + (
        "query string, trend_count double, event_count double, value_sum double"
    )

    def run(key_tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(sort_cols, kind="mergesort")  # shared sort
        rows = []
        for name, (etype, adjacent, value_field, within_ns) in specs.items():
            sub = pdf[pdf["event_type"] == etype] if etype else pdf
            ts = sub[ts_col].astype("int64").to_numpy()
            events = sub.to_dict("records") if adjacent is not None else None
            vals = (
                sub[value_field].to_numpy(dtype=np.float64)
                if value_field
                else None
            )
            n = len(sub)
            cnt = np.zeros(n)
            len_sum = np.zeros(n)
            val_sum = np.zeros(n)
            for i in range(n):
                c, ls, vs = 1.0, 0.0, 0.0
                for j in range(i):
                    if within_ns is not None and ts[i] - ts[j] > within_ns:
                        continue
                    if adjacent is not None and not adjacent(events[j], events[i]):
                        continue
                    c += cnt[j]
                    ls += len_sum[j]
                    vs += val_sum[j]
                cnt[i] = c
                len_sum[i] = ls + c
                val_sum[i] = vs + (vals[i] * c if vals is not None else 0.0)
            rows.append(
                list(key_tuple)
                + [name, float(cnt.sum()), float(len_sum.sum()), float(val_sum.sum())]
            )
        cols = list(keys) + ["query", "trend_count", "event_count", "value_sum"]
        return pd.DataFrame(rows, columns=cols)

    if keys:
        return df.groupBy(*[F.col(k) for k in keys]).applyInPandas(run, schema)
    return (
        df.withColumn("__g", F.lit(0))
        .groupBy("__g")
        .applyInPandas(lambda k, pdf: run((), pdf.drop(columns="__g")), schema)
    )


def trend_aggregate(
    stream,
    event_type: str | None = None,
    adjacent: Callable[[dict, dict], bool] | None = None,
    value_field: str | None = None,
    within=None,
) -> DataFrame:
    """GRETA aggregates over all `E+` trends per partition key.

    Output per key: `trend_count` (number of trends), `event_count`
    (Σ trend lengths), and `value_sum` (Σ over trends of Σ value_field)
    when `value_field` is given.

    `adjacent(prev, next)` is the Kleene iterative predicate; None means any
    ts-increasing pair (every non-empty ordered subset is a trend).

    `within` bounds the gap between CONSECUTIVE trend events (per-edge
    budget). The reference's whole-span `within` composes via a window
    operator before trend aggregation (window panes per GRETA §5); a plain
    DP cannot carry span deadlines without per-start bookkeeping.
    """
    df = stream.df
    ts_col = stream.ts_col
    order_col = stream.order_col
    keys = stream.keys
    if event_type is not None:
        df = df.filter(F.col("event_type") == event_type)
    within_ns = duration_ns(within) if within is not None else None

    sort_cols = [ts_col] + ([order_col] if order_col else [])
    has_value = value_field is not None
    schema = "trend_count double, event_count double" + (
        ", value_sum double" if has_value else ""
    )
    key_fields = ", ".join(f"{k} {t}" for k, t in df.dtypes if k in keys)
    if keys:
        schema = key_fields + ", " + schema

    def run(key_tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(sort_cols, kind="mergesort")
        ts = pdf[ts_col].astype("int64").to_numpy()
        events = pdf.to_dict("records") if adjacent is not None else None
        vals = pdf[value_field].to_numpy(dtype=np.float64) if has_value else None
        n = len(pdf)
        cnt = np.zeros(n)        # trends ending at i
        len_sum = np.zeros(n)    # Σ lengths of trends ending at i
        val_sum = np.zeros(n)    # Σ value-sums of trends ending at i
        for i in range(n):
            c, ls, vs = 1.0, 0.0, 0.0
            for j in range(i):
                if within_ns is not None and ts[i] - ts[j] > within_ns:
                    continue
                if adjacent is not None and not adjacent(events[j], events[i]):
                    continue
                c += cnt[j]
                ls += len_sum[j]
                vs += val_sum[j]
            cnt[i] = c
            len_sum[i] = ls + c  # every trend ending at i gains event i
            val_sum[i] = vs + (vals[i] * c if has_value else 0.0)
        row = list(key_tuple) + [float(cnt.sum()), float(len_sum.sum())]
        if has_value:
            row.append(float(val_sum.sum()))
        cols = list(keys) + ["trend_count", "event_count"] + (
            ["value_sum"] if has_value else []
        )
        return pd.DataFrame([row], columns=cols)

    if keys:
        return df.groupBy(*[F.col(k) for k in keys]).applyInPandas(run, schema)
    return (
        df.withColumn("__g", F.lit(0))
        .groupBy("__g")
        .applyInPandas(lambda k, pdf: run((), pdf.drop(columns="__g")), schema)
    )
