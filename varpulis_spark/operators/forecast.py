"""`.forecast(...)` — online pattern-completion forecasting.

Reference: ForecastConfig engine/types.rs:232-246; runtime/src/pst/ — a
Prediction Suffix Tree Markov model over the SASE NFA (arXiv:2109.00287)
with optional Hawkes intensity and conformal intervals. This module
implements the core: an ONLINE variable-order Markov model (PST with
escape-style back-off) over each key's event-type sequence, emitting for
every event the probability that a target pattern (remaining event-type
sequence) completes within the next `horizon` events.

Spark lowering: per-key `applyInPandas` (batch) — the model trains online in
arrival order, so each event's forecast uses only the prefix before it
(no lookahead leakage), matching the reference's online PST (pst/online.rs).
The per-key state is a dict of suffix→next-type counts, bounded by
`max_depth` (pruning.rs analog: shallow contexts only).

Completion probability: with remaining pattern (t1..tm) and horizon h, a
dynamic program over the Markov chain computes
P(sequence of next h symbols contains t1..tm as a subsequence).
"""

from __future__ import annotations

from collections import defaultdict

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class OnlinePST:
    """Variable-order Markov with back-off over contexts up to max_depth."""

    def __init__(self, max_depth: int = 3):
        self.max_depth = max_depth
        self.counts: dict[tuple, dict[str, int]] = defaultdict(lambda: defaultdict(int))
        self.alphabet: set[str] = set()

    def update(self, history: list[str], symbol: str) -> None:
        self.alphabet.add(symbol)
        for d in range(0, self.max_depth + 1):
            ctx = tuple(history[-d:]) if d else ()
            if d <= len(history):
                self.counts[ctx][symbol] += 1

    def prob(self, history: list[str], symbol: str) -> float:
        """Back-off: deepest context with data wins; +1 smoothing."""
        v = max(1, len(self.alphabet))
        for d in range(min(self.max_depth, len(history)), -1, -1):
            ctx = tuple(history[-d:]) if d else ()
            if ctx in self.counts and self.counts[ctx]:
                c = self.counts[ctx]
                total = sum(c.values())
                return (c.get(symbol, 0) + 1) / (total + v)
        return 1.0 / v

    def completion_prob(self, history: list[str], remaining: list[str], horizon: int) -> float:
        """P(next `horizon` symbols contain `remaining` as a subsequence),
        first-order approximation: the chain state is the last symbol."""
        if not remaining:
            return 1.0
        if horizon < len(remaining):
            return 0.0
        # dp[j] = P(matched j symbols of remaining so far)
        dp = [0.0] * (len(remaining) + 1)
        dp[0] = 1.0
        hist = list(history)
        for _step in range(horizon):
            p_next = [self.prob(hist, t) for t in remaining]
            new = dp[:]
            for j in range(len(remaining) - 1, -1, -1):
                advance = dp[j] * p_next[j]
                new[j + 1] += advance
                new[j] -= advance
            dp = new
            # advance the history pessimistically with the most likely symbol
            if self.alphabet:
                best = max(self.alphabet, key=lambda s: self.prob(hist, s))
                hist.append(best)
                hist = hist[-self.max_depth:]
        return min(1.0, dp[len(remaining)])


def forecast(
    stream,
    pattern_types: list[str],
    horizon: int = 10,
    max_depth: int = 3,
    warmup: int = 10,
) -> DataFrame:
    """Per event: probability that the remaining pattern completes within
    the next `horizon` events of the same key (null during warmup)."""
    df = stream.df
    ts_col = stream.ts_col
    order_col = stream.order_col
    keys = stream.keys
    if not keys:
        raise ValueError("forecast requires partition_by (per-key model)")
    sort_cols = [ts_col] + ([order_col] if order_col else [])

    key_fields = ", ".join(f"{k} {t}" for k, t in df.dtypes if k in keys)
    id_field = order_col or ts_col
    id_type = dict(df.dtypes)[id_field]
    schema = f"{key_fields}, {id_field} {id_type}, next_step int, completion_prob double"

    def run(key_tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(sort_cols, kind="mergesort")
        pst = OnlinePST(max_depth)
        history: list[str] = []
        rows = []
        progress = 0  # naive NFA progress through pattern_types
        seen = 0
        for _, row in pdf.iterrows():
            et = row["event_type"]
            if progress < len(pattern_types) and et == pattern_types[progress]:
                progress += 1
                if progress == len(pattern_types):
                    progress = 0
            remaining = pattern_types[progress:]
            prob = (
                pst.completion_prob(history, remaining, horizon)
                if seen >= warmup
                else None
            )
            seen += 1
            rows.append(list(key_tuple) + [row[id_field], progress, prob])
            pst.update(history, et)
            history.append(et)
            history = history[-max_depth:]
        cols = list(keys) + [id_field, "next_step", "completion_prob"]
        return pd.DataFrame(rows, columns=cols)

    return df.groupBy(*[F.col(k) for k in keys]).applyInPandas(run, schema)
