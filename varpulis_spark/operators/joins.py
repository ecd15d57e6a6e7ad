"""Join / merge / enrich operators.

Reference surface:
- n-way windowed equi-join: `stream J = join(A: SA, B: SB).on(A.k == B.k)
  .window(5m)` — JoinBuffer keyed per source; emits a merged event when every
  source has a key-matching event within the window
  (crates/varpulis-runtime/src/join.rs:18-71, add_event :88; wiring
  crates/varpulis-runtime/src/engine/mod.rs:941-990,1067-1078; the default
  join key is the field "symbol" when `.on` is omitted, mod.rs:2202-2207).
  Inner-join semantics only; merged fields are prefixed with the source
  alias.
- merge(a: A, b: B where cond): union of filtered sources (ast.rs:184,
  228-232; MergeSource engine/types.rs:167-171).
- .enrich(Conn, key:, fields:, fallback:): per-event lookup join with TTL
  cache (EnrichConfig engine/types.rs:248-263, providers
  runtime/src/enrichment/).

Spark lowering (batch):
- windowed join → chained equi-joins on the key plus a time-band condition;
  the band `|ts_i - ts_j| <= window` makes every pair of matched events lie
  within the window span, matching the buffer semantics. Equi-key joins
  shuffle-hash/broadcast under AQE; the time band is a post-join filter so
  the join itself stays an equi-join (no cartesian).
- merge → unionByName(allowMissingColumns=True).
- enrich → broadcast hash join against the dimension DataFrame (the Spark
  analog of the TTL lookup cache: in streaming, re-reading the dimension per
  micro-batch gives the refresh; fallback values fill misses, inner-drop
  matches the reference's drop-on-miss).

Scale: the key+band join never degenerates into a range-only join — Catalyst
plans an equi-join on the key with the band as residual. Skewed keys are
handled by AQE skew-join splitting (enabled in engine.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from varpulis_spark.functions import duration_ns

DEFAULT_JOIN_KEY = "symbol"  # reference engine/mod.rs:2202-2207


def _interval_us(win_us: int) -> Column:
    """Exact day-time interval of `win_us` microseconds (no double rounding)."""
    return F.expr(f"INTERVAL '{win_us // 1_000_000}.{win_us % 1_000_000:06d}' SECOND")


def windowed_join(
    sources: dict[str, DataFrame],
    on: str | list[str] | None = None,
    window=None,
    ts_col: str = "ts",
    watermark=None,
) -> DataFrame:
    """N-way windowed equi-join. `sources` maps alias → DataFrame.

    Output columns: `{alias}_{col}` for every payload column of every source
    (the reference merges fields with source prefixes), plus `ts` = the max
    event time across the matched tuple (the triggering event's time) and the
    join key column(s) unprefixed.

    Streaming (SURVEY §2.6 mapping of join.rs:18-71): when any source is a
    streaming DataFrame, every streaming source gets `withWatermark(ts,
    watermark or window)` applied before the join, and the time band is
    expressed as `ts_b BETWEEN ts_a - window AND ts_a + window` (timestamp ±
    interval). That form is what Spark's StreamingJoinHelper recognizes for
    deriving state-eviction watermarks — the reference's JoinBuffer eviction
    (join.rs:104-121) for free; arithmetic on `unix_micros` would force
    unbounded state. Interval arithmetic is exact µs, so batch and streaming
    bands agree at boundaries.
    """
    if len(sources) < 2:
        raise ValueError("windowed_join needs >= 2 sources")
    keys = [on] if isinstance(on, str) else list(on or [DEFAULT_JOIN_KEY])
    win_us = duration_ns(window) // 1000 if window is not None else None
    streaming = any(df.isStreaming for df in sources.values())
    if streaming and win_us is None:
        raise ValueError("stream-stream join requires a window (bounded state)")

    aliased: list[tuple[str, DataFrame]] = []
    for alias, df in sources.items():
        if streaming and df.isStreaming:
            from varpulis_spark.functions import duration_interval_str

            df = df.withWatermark(ts_col, duration_interval_str(watermark or window))
        renamed = df
        for c in df.columns:
            renamed = renamed.withColumnRenamed(c, f"{alias}_{c}")
        aliased.append((alias, renamed))

    first_alias, joined = aliased[0]
    seen = [first_alias]
    # the watermarked event-time column to keep tagged through the chain:
    # the first STREAMING side's ts — the first alias may be a batch frame
    # in a mixed join, whose ts carries no watermark tag (ADVICE r6)
    wm_alias = next(
        (a for a, _df in aliased if sources[a].isStreaming), first_alias
    )
    wm_ts = f"{wm_alias}_{ts_col}"
    for alias, df in aliased[1:]:
        cond = None
        for k in keys:
            c = F.col(f"{seen[0]}_{k}") == F.col(f"{alias}_{k}")
            cond = c if cond is None else (cond & c)
        if win_us is not None:
            # band against every already-joined source so the whole tuple
            # spans <= window (max-min <= window ⇔ all pairwise <= window)
            for prev in seen:
                a_ts = F.col(f"{alias}_{ts_col}")
                p_ts = F.col(f"{prev}_{ts_col}")
                if streaming:
                    band = (a_ts >= p_ts - _interval_us(win_us)) & (
                        a_ts <= p_ts + _interval_us(win_us)
                    )
                else:
                    # exact µs integer arithmetic — a double-seconds compare
                    # has ~0.5 µs ulp at epoch magnitudes and flickers at the
                    # boundary (kept for batch plan-shape stability)
                    dt = F.unix_micros(a_ts) - F.unix_micros(p_ts)
                    band = F.abs(dt) <= F.lit(win_us)
                cond = cond & band
        joined = joined.join(df, cond, "inner")
        seen.append(alias)
        if streaming and alias != aliased[-1][0]:
            # Spark allows AT MOST ONE event-time column per join input
            # (StreamingJoinHelper rejects a side with several watermarked
            # columns), so a chained n-way join keeps exactly the FIRST
            # side's tag flowing: every other ts column is re-aliased with
            # empty metadata (a fresh, untagged attribute — same values).
            # The next join's pairwise band against the still-tagged
            # `{first}_{ts_col}` is what Spark derives state eviction
            # from; the other bands stay as exact residual predicates.
            joined = joined.select(
                *[
                    F.col(c)
                    if c == wm_ts
                    else (
                        F.col(c).alias(c, metadata={})
                        if c in {f"{a}_{ts_col}" for a in seen}
                        else F.col(c)
                    )
                    for c in joined.columns
                ]
            )

    ts_cols = [F.col(f"{a}_{ts_col}") for a in seen]
    joined = joined.withColumn(ts_col, F.greatest(*ts_cols) if len(ts_cols) > 1 else ts_cols[0])
    for k in keys:
        joined = joined.withColumn(k, F.col(f"{seen[0]}_{k}"))
    return joined


def merge_frames(*dfs: DataFrame) -> DataFrame:
    """merge(a: A, b: B, ...) — union of (already filtered) sources."""
    out = dfs[0]
    for df in dfs[1:]:
        out = out.unionByName(df, allowMissingColumns=True)
    return out


def enrich(
    df: DataFrame,
    dimension: DataFrame,
    key,
    dim_key: str,
    fields: list[str] | None = None,
    fallback: dict | None = None,
    drop_on_miss: bool = False,
    status_cols: bool = False,
) -> DataFrame:
    """Lookup-join enrichment against a dimension table.

    `key` is a column/name on the event side, `dim_key` the dimension column.
    `fields` restricts which dimension columns are appended (column pruning →
    narrower broadcast). `fallback` fills missing lookups per field;
    `drop_on_miss=True` reproduces the reference's drop behavior
    (EnrichConfig, engine/types.rs:248-263).
    """
    key_col = F.col(key) if isinstance(key, str) else key
    wanted = fields or [c for c in dimension.columns if c != dim_key]
    dim = dimension.select(F.col(dim_key).alias("__enrich_key"), *[F.col(c) for c in wanted])
    how = "inner" if drop_on_miss else "left"
    out = df.join(F.broadcast(dim), key_col == F.col("__enrich_key"), how)
    if status_cols:
        # the reference stamps lookup metadata on every enriched event
        # (engine/pipeline.rs:249-302: enrich_status ok/cached/error,
        # enrich_latency_ms). A broadcast dim join is the batch analog of a
        # 100% cache hit, so latency is 0; a key miss takes the fallback
        # path, mirroring enrich_with_provider's 'fallback' status. A
        # chained .enrich overwrites the previous hop's columns (the
        # reference's insert replaces the map entry).
        out = out.drop("enrich_status", "enrich_latency_ms")
        out = out.withColumn(
            "enrich_status",
            F.when(F.col("__enrich_key").isNotNull(), F.lit("ok")).otherwise(
                F.lit("fallback")
            ),
        ).withColumn("enrich_latency_ms", F.lit(0).cast("long"))
    out = out.drop("__enrich_key")
    if fallback and not drop_on_miss:
        for f_name, f_val in fallback.items():
            out = out.withColumn(f_name, F.coalesce(F.col(f_name), F.lit(f_val)))
    return out
