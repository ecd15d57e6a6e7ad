"""Window operators: tumbling / sliding / session (time) and count windows.

Reference surface: crates/varpulis-runtime/src/window.rs (TumblingWindow:22,
SlidingWindow:153, CountWindow:274, SlidingCountWindow:362, SessionWindow:446
and the Partitioned* variants) selected by crates/varpulis-runtime/src/engine/
mod.rs:1357-1476 — duration → time window, int → count window, `session:`
kwarg → session window; a preceding `.partition_by(key)` switches to the
partitioned variant.

Spark lowering (batch):
- tumbling/sliding → groupBy(F.window(ts, size[, slide])) — fully native,
  map-side partial aggregation, no Python.
- session → F.session_window(ts, gap) — native.
- count windows → row_number() over (partition by keys order by ts) then
  group by floor((rn-1)/N); sliding count explodes each row into the window
  indices it belongs to. Count windows inherently impose a total per-key
  order: at 100 TB they only make sense partitioned (the reference has the
  same constraint — a single CountWindow is a serial buffer,
  window.rs:274-359). Unpartitioned count windows over huge data funnel
  through one task; we keep them for parity but document the hazard.

Alignment note: reference time windows open at the FIRST EVENT's timestamp
(window.rs:22-150), not at epoch boundaries. Spark's F.window is
epoch-aligned. `align="first_event"` reproduces reference alignment by
shifting each partition by its min(ts) before bucketing; the default is
epoch alignment, which is the standard SQL-expressible semantics.

Only complete count windows are emitted (a CountWindow emits exactly when it
reaches N events; the trailing partial buffer never fires — window.rs:274).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from varpulis_spark.functions import duration_interval_str, duration_seconds


def time_window_cols(
    df: DataFrame,
    ts_col: str,
    size,
    slide=None,
    align: str = "epoch",
    keys: list[str] | None = None,
) -> tuple[DataFrame, Column]:
    """Return (df, window_col) for tumbling/sliding time windows."""
    size_s = duration_interval_str(size)
    if align == "first_event":
        # shift so windows open at the partition's first event (reference
        # TumblingWindow semantics, window.rs:22-150)
        spec = W.partitionBy(*[F.col(k) for k in (keys or [])])
        base = F.min(F.unix_micros(F.col(ts_col))).over(spec)
        shifted = F.unix_micros(F.col(ts_col)) - base
        df = df.withColumn("__shift_ts", F.timestamp_micros(shifted))
        wcol = (
            F.window("__shift_ts", size_s, duration_interval_str(slide))
            if slide
            else F.window("__shift_ts", size_s)
        )
        return df, wcol
    wcol = (
        F.window(F.col(ts_col), size_s, duration_interval_str(slide))
        if slide
        else F.window(F.col(ts_col), size_s)
    )
    return df, wcol


def explode_time_windows(
    df: DataFrame,
    ts_col: str,
    size,
    slide=None,
    align: str = "epoch",
    keys: list[str] | None = None,
) -> DataFrame:
    """Row-level window assignment: one output row per (row, containing
    window), with `window_start`/`window_end` columns.

    F.window only materializes inside groupBy; non-aggregating composites
    (GRETA pane composition, VLDB'17 §5: whole-span `within` = run the
    trend DP per window pane) need the assignment as plain rows. Window k
    covers [k·slide, k·slide + size); a row at t belongs to every k with
    k·slide ≤ t < k·slide + size — identical window set to F.window.
    Tumbling (slide None) emits exactly one row per input row."""
    from varpulis_spark.functions import duration_ns

    size_us = duration_ns(size) // 1000
    slide_us = duration_ns(slide) // 1000 if slide else size_us
    t = F.unix_micros(F.col(ts_col))
    if align == "first_event":
        spec = W.partitionBy(*[F.col(k) for k in (keys or [])])
        t = t - F.min(t).over(spec)
    k_lo = F.floor((t - size_us) / slide_us) + 1
    k_hi = F.floor(t / slide_us)
    df = df.withColumn("__wk", F.explode(F.sequence(k_lo, k_hi)))
    return (
        df.withColumn("window_start", F.timestamp_micros(F.col("__wk") * slide_us))
        .withColumn(
            "window_end", F.timestamp_micros(F.col("__wk") * slide_us + size_us)
        )
        .drop("__wk")
    )


def session_window_col(ts_col: str, gap) -> Column:
    return F.session_window(F.col(ts_col), duration_interval_str(gap))


def count_window_ids(
    df: DataFrame,
    ts_col: str,
    size: int,
    slide: int | None = None,
    keys: list[str] | None = None,
    order_col: str | None = None,
) -> DataFrame:
    """Assign a `__win` window-id column for count-based windows.

    Tumbling count (slide is None): __win = floor((rn-1)/size); only groups
    with exactly `size` rows are complete (caller filters on __win_complete).
    Sliding count: each row explodes into every window index it belongs to;
    window j covers rows rn in (j*slide, j*slide + size].
    """
    order = [F.col(ts_col)]
    if order_col:
        order.append(F.col(order_col))
    spec = W.partitionBy(*[F.col(k) for k in (keys or [])]).orderBy(*order)
    df = df.withColumn("__rn", F.row_number().over(spec))
    if not slide:
        df = df.withColumn("__win", F.floor((F.col("__rn") - 1) / size))
        # complete windows only: max rn in window == (win+1)*size
        cnt_spec = W.partitionBy(*([F.col(k) for k in (keys or [])] + [F.col("__win")]))
        df = df.withColumn("__win_complete", F.max("__rn").over(cnt_spec) >= (F.col("__win") + 1) * size)
        return df
    # sliding count: j in [ceil((rn-size)/slide), floor((rn-1)/slide)], j >= 0
    lo = F.greatest(F.ceil((F.col("__rn") - size) / slide), F.lit(0)).cast("long")
    hi = F.floor((F.col("__rn") - 1) / slide).cast("long")
    df = df.withColumn("__win", F.explode(F.sequence(lo, hi)))
    cnt_spec = W.partitionBy(*([F.col(k) for k in (keys or [])] + [F.col("__win")]))
    df = df.withColumn("__win_complete", F.count(F.lit(1)).over(cnt_spec) >= size)
    return df
