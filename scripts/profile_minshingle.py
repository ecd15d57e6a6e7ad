"""sf10 minshingle profile: wall, exact-dup recall, and the exchange-bound
fraction (VERDICT r11 tasks 2/3/5 evidence).

Runs ngram_minshingle_pairs over localdata/sf10 documents, captures
per-stage executor metrics from the AppStatusStore (shuffle read/write
bytes, shuffle write time, fetch wait, spill, executor run/CPU time), and
checks recall against the text-identity ground truth (planted exact dups
in scripts/make_sf.py). Prints ONE JSON line.

Usage: python scripts/profile_minshingle.py [sf_dir]
  SPARK_LOCAL_DIRS can be pointed at a tmpfs for the spindle A/B.
"""
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from varpulis_spark.engine import get_spark, read_parquet  # noqa: E402
from varpulis_spark.operators import dedup as D  # noqa: E402


def stage_metrics(spark) -> dict:
    """Aggregate executor metrics across ALL stages via the UI REST API
    (requires VARPULIS_SPARK_UI=1; the documented stable interface — the
    py4j AppStatusStore route needs Scala default-arg plumbing)."""
    import urllib.request

    ui = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId
    with urllib.request.urlopen(
        f"{ui}/api/v1/applications/{app_id}/stages", timeout=30
    ) as r:
        stages = json.loads(r.read())
    agg = {
        "shuffle_write_bytes": 0, "shuffle_read_bytes": 0,
        "shuffle_write_time_ns": 0, "shuffle_fetch_wait_ns": 0,
        "memory_spill_bytes": 0, "disk_spill_bytes": 0,
        "executor_run_ms": 0, "executor_cpu_ns": 0, "stages": 0,
    }
    for s in stages:
        if s.get("status") not in ("COMPLETE", "FAILED"):
            continue
        agg["stages"] += 1
        agg["shuffle_write_bytes"] += s.get("shuffleWriteBytes", 0)
        agg["shuffle_read_bytes"] += s.get("shuffleReadBytes", 0)
        agg["shuffle_write_time_ns"] += s.get("shuffleWriteTime", 0)
        agg["shuffle_fetch_wait_ns"] += s.get("shuffleFetchWaitTime", 0)
        agg["memory_spill_bytes"] += s.get("memoryBytesSpilled", 0)
        agg["disk_spill_bytes"] += s.get("diskBytesSpilled", 0)
        agg["executor_run_ms"] += s.get("executorRunTime", 0)
        agg["executor_cpu_ns"] += s.get("executorCpuTime", 0)
    return agg


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/localdata/sf10"
    spark = get_spark("profile-minshingle", cores=32)
    spark.sparkContext.setLogLevel("ERROR")
    docs = read_parquet(spark, os.path.join(sf_dir, "documents.parquet"))
    n_docs = docs.count()  # warm the scan

    before = stage_metrics(spark)
    t0 = time.time()
    pairs = D.ngram_minshingle_pairs(docs, k=8, threshold=0.6).persist()
    n_pairs = pairs.count()
    wall = time.time() - t0
    after = stage_metrics(spark)
    delta = {k: after[k] - before[k] for k in before}

    # exact-dup ground truth: every unordered pair of identical texts
    # (make_sf plants copies; incidental dups count too)
    dup_groups = (
        docs.groupBy("text")
        .agg(F.collect_list("doc_id").alias("ids"))
        .filter(F.size("ids") >= 2)
        .select("ids")
        .collect()
    )
    truth = set()
    for r in dup_groups:
        g = sorted(r.ids)
        for i in range(len(g) - 1):
            for j in range(i + 1, len(g)):
                truth.add((g[i], g[j]))
    got = {
        (min(r.id_a, r.id_b), max(r.id_a, r.id_b))
        for r in pairs.select("id_a", "id_b").collect()
    }
    found = len(truth & got)
    pairs.unpersist()
    D.release_caches()

    run_ms = max(delta["executor_run_ms"], 1)
    out = {
        "sf_dir": sf_dir,
        "n_docs": n_docs,
        "n_pairs": n_pairs,
        "wall_sec": round(wall, 2),
        "exact_dup_truth": len(truth),
        "exact_dup_found": found,
        "exact_dup_recall": round(found / max(len(truth), 1), 4),
        "metrics": {
            "shuffle_write_gb": round(delta["shuffle_write_bytes"] / 2**30, 2),
            "shuffle_read_gb": round(delta["shuffle_read_bytes"] / 2**30, 2),
            "disk_spill_gb": round(delta["disk_spill_bytes"] / 2**30, 2),
            "memory_spill_gb": round(delta["memory_spill_bytes"] / 2**30, 2),
            "shuffle_write_time_sec": round(
                delta["shuffle_write_time_ns"] / 1e9, 2
            ),
            "shuffle_fetch_wait_sec": round(
                delta["shuffle_fetch_wait_ns"] / 1e9, 2
            ),
            "executor_run_sec": round(run_ms / 1e3, 1),
            "executor_cpu_sec": round(delta["executor_cpu_ns"] / 1e9, 1),
            "stages": delta["stages"],
        },
        # fraction of executor time spent writing shuffle or waiting on
        # fetches — the direct exchange-bound share; the cpu/run gap is the
        # broader everything-but-CPU share (includes parquet IO + py4j)
        "exchange_time_fraction": round(
            (delta["shuffle_write_time_ns"] + delta["shuffle_fetch_wait_ns"])
            / 1e6 / run_ms, 4,
        ),
        "cpu_fraction": round(delta["executor_cpu_ns"] / 1e6 / run_ms, 4),
        "local_dirs": os.environ.get("SPARK_LOCAL_DIRS", "(default)"),
    }
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
