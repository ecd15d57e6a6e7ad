"""Per-job decomposition of one declared query's wall-clock.

Usage: VARPULIS_SPARK_UI=1 python scripts/profile_query.py <query> [runs] [sf_dir]

Runs the query `runs` times (count() action, bench methodology) after a
bench-style warmup, then prints one line per Spark job of the LAST run
(duration, stage count, description) from the UI REST API — the same
source scripts/profile_minshingle.py reads. Job boundaries, not guesses:
this is how we attribute an sf0.1 wall to scalar-probe jobs vs the main
pipeline vs scheduling.
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

os.environ.setdefault("VARPULIS_SPARK_UI", "1")

import __spark_entry__ as entrymod  # noqa: E402
from varpulis_spark.engine import get_spark  # noqa: E402


def api(path: str):
    with urllib.request.urlopen(f"http://localhost:4040/api/v1/{path}") as r:
        return json.loads(r.read())


def main() -> None:
    name = sys.argv[1]
    runs = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    sf_dir = sys.argv[3] if len(sys.argv) > 3 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    fn = entrymod.queries()[name]
    spark = get_spark("varpulis-profile")
    spark.sparkContext.setLogLevel("ERROR")
    import bench

    bench.warmup(spark, sf_dir)
    app_id = spark.sparkContext.applicationId
    from varpulis_spark.operators.dedup import release_caches

    walls = []
    for i in range(runs):
        jobs_before = {j["jobId"] for j in api(f"applications/{app_id}/jobs")}
        t0 = time.time()
        n = fn(spark, sf_dir).count()
        walls.append(time.time() - t0)
        spark.catalog.clearCache()
        release_caches()
        last_jobs = [
            j for j in api(f"applications/{app_id}/jobs")
            if j["jobId"] not in jobs_before
        ]
    last_jobs.sort(key=lambda j: j["jobId"])

    def ptime(s):
        return time.mktime(time.strptime(s[:19], "%Y-%m-%dT%H:%M:%S")) + float(
            "0." + s[20:23] if len(s) > 20 else 0
        )

    total_job = 0.0
    print(f"\n{name}: rows={n} walls={[round(w, 3) for w in walls]}")
    for j in last_jobs:
        dur = ptime(j["completionTime"]) - ptime(j["submissionTime"])
        total_job += dur
        desc = (j.get("description") or j.get("name") or "")[:90]
        print(
            f"  job {j['jobId']:>4}  {dur:6.3f}s  stages={len(j['stageIds'])}"
            f"  tasks={j['numTasks']:>4}  {desc}"
        )
    print(
        f"  jobs total {total_job:.3f}s of wall {walls[-1]:.3f}s "
        f"(gap = driver/planning/collect-outside-jobs)"
    )


if __name__ == "__main__":
    main()
