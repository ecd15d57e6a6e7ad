"""Benchmark driver: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is forced with a count() action (full pipeline execution, no
driver-side collect of payloads). BASELINE.md's reference numbers are
single-node event-throughput; our comparable figure is wall-clock per query
over the same table at the bench scale factor.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entrymod  # noqa: E402
from varpulis_spark.engine import get_spark  # noqa: E402


def warmup(spark, sf_dir: str) -> None:
    """Absorb one-time costs the baseline also excludes ('preloaded events,
    median of 3 runs', README.md:100): JVM codegen, parquet footer reads,
    and the Arrow python worker pool (one spinup per core, reused after)."""
    from varpulis_spark.engine import load_table

    n_events = load_table(spark, sf_dir, "events").count()
    load_table(spark, sf_dir, "lineitem").count()
    load_table(spark, sf_dir, "documents").count()
    load_table(spark, sf_dir, "embeddings").count()
    # spin up the Arrow worker pool across all partitions
    spark.range(0, 10_000, 1, spark.sparkContext.defaultParallelism).mapInPandas(
        lambda it: it, "id long"
    ).count()
    return n_events


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    runs_per_query = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3"))
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else None
    spark = get_spark("varpulis-bench")
    spark.sparkContext.setLogLevel("ERROR")
    load_start = os.getloadavg()
    n_events = warmup(spark, sf_dir)

    # median-of-N with a warm session (matches the baseline's 'preloaded
    # events, median of 3 runs' protocol, README.md:100); the spread field
    # exposes host-contention noise (shared microVM shows 10-20x spikes)
    # so round-over-round deltas can be read against variance.
    times: dict[str, float] = {}
    spread: dict[str, list[float]] = {}
    rows: dict[str, int] = {}
    for name, fn in entrymod.queries().items():
        try:
            samples = []
            for _ in range(max(1, runs_per_query)):
                t0 = time.time()
                rows[name] = fn(spark, sf_dir).count()
                samples.append(time.time() - t0)
                spark.catalog.clearCache()
                from varpulis_spark.operators.dedup import release_caches

                release_caches()  # drop registry refs alongside the cache
            samples.sort()
            times[name] = round(samples[len(samples) // 2], 3)
            spread[name] = [round(samples[0], 3), round(samples[-1], 3)]
        except Exception as e:  # noqa: BLE001
            print(f"bench error in {name}: {e}", file=sys.stderr)
            times[name] = -1.0
    total = round(sum(t for t in times.values() if t >= 0), 3)
    # comparable to BASELINE.md CPU-bound event throughput (filter row)
    filter_tput = (
        round(n_events / times["high_value_filter"]) if times.get("high_value_filter", 0) > 0 else None
    )
    events_per_sec = {
        name: round(n_events / t) for name, t in times.items() if t > 0
    }
    print(json.dumps({
        "metric": "headline_query_suite_wall_clock",
        "value": total,
        "unit": "sec",
        "queries": times,
        "spread_min_max": spread,
        "events_per_sec": events_per_sec,
        "rows": rows,
        "sf": sf,
        "events_rows": n_events,
        "filter_events_per_sec": filter_tput,
        "runs_per_query": runs_per_query,
        "loadavg_start": [round(x, 2) for x in load_start],
        "loadavg_end": [round(x, 2) for x in os.getloadavg()],
    }))


if __name__ == "__main__":
    main()
