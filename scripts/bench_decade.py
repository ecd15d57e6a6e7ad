"""sf1 → sf10 decade bench (VERDICT r7 task 4).

Runs the dedup/ANN tail plus five headline queries at localdata/sf1 and
localdata/sf10 (~10M events / ~50k docs ×10) and reports the per-query
eps ratio (events-per-second at sf10 vs sf1, the same convention as
bench.py's eps_ratio_vs_sf0.1): ratio ≥ 1 means the query processes
events at least as fast per event at 10× the data — nothing
super-linear. Writes BENCH_DECADE_r{round}.json and prints one compact
line.

Excluded by spec: embedding_near_dup (labeled O(n²) — its scale paths
ivf_near_dup / minhash / simhash ARE in the list), plus everything not
in the tail/headline set (the full suite runs at sf0.1/sf1 in bench.py).

Run: python scripts/bench_decade.py  (~10-20 min at sf10)
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "scripts"))

QUERIES = [
    # five headlines (BASELINE classes)
    "high_value_filter",
    "windowed_join_10m",
    "ema_macd",
    "seq_signup_purchase",
    "kleene_purchases",
    # dedup/ANN tail
    "exact_dedup_docs",
    "minhash_near_dup",
    "simhash_near_dup",
    "minshingle_near_dup",
    "near_dup_clusters",
    "ann_ivf",
    "ivf_near_dup",
    # r13: the embedding family's SCALING signal moved to the 0.85
    # planted-pair regime — at the operators' 0.4 oracle threshold the
    # output is intrinsically ~n²·2.5e-4 on this corpus family (isotropic
    # unit noise in d=64; see PERF_NOTES r13), so ivf_near_dup@0.4 is
    # kept for continuity but its decade eps ratio reads output volume,
    # not engine scaling. embedding_near_dup_capped exercises the exact
    # kernel at a fixed 4,000-row budget (VERDICT r12 task 6).
    "ivf_near_dup_t85",
    "embedding_near_dup_capped",
    "knn_cosine",
    "text_stats",
    "lang_distribution",
]


def run_streaming_decade(spark) -> dict:
    """Streaming state-store scaling (VERDICT r8 task 6): run the pattern
    and trend twins at 1× and 10× KEY cardinality (64 → 640 keys) and
    compare sustained eps + p50/p99 — the axis the batch decade cannot
    see is per-key state count (store lookups, snapshot size, group
    fan-out per micro-batch). A healthy engine holds sustained eps
    roughly flat: state is keyed, so 10× keys means 10× state ENTRIES but
    the same per-event work."""
    import shutil
    import tempfile

    import bench_streaming as B

    out: dict = {}
    for name, fn, kw in (
        ("pattern_runcap", B.bench_pattern_runcap, "users"),
        ("trend_windowed", B.bench_trend_windowed, "users"),
    ):
        per_scale: dict = {}
        for label, keys in (("keys_1x", 64), ("keys_10x", 640)):
            wd = tempfile.mkdtemp(prefix=f"vdecade_{name}_{label}_")
            try:
                r = fn(spark, wd, **{kw: keys})
            except Exception as e:  # record, never kill the artifact
                r = {"error": f"{type(e).__name__}: {e}"[:300]}
            finally:
                shutil.rmtree(wd, ignore_errors=True)
            per_scale[label] = r
        r1, r10 = per_scale["keys_1x"], per_scale["keys_10x"]
        if "error" not in r1 and "error" not in r10 and r1.get("sustained_eps"):
            per_scale["sustained_eps_ratio_10x"] = round(
                r10["sustained_eps"] / r1["sustained_eps"], 2
            )
        out[name] = per_scale
    out["note"] = (
        "pattern_runcap offers a CONSTANT rate (ratio ~1.0 = flat per-event "
        "cost at 10x state keys); trend_windowed's offered rate scales WITH "
        "keys (one event per key per tick), so a healthy ratio is ~10 — "
        "sub-linear sustained growth there would flag per-key state cost"
    )
    return out


def run_clusters_scale_probe(spark) -> dict:
    """VERDICT r9 task 7: exercise dedup_clusters' DISTRIBUTED
    label-propagation branch on a real large mined pair graph. At
    natural planted-dup density even an sf30 corpus (~1.5M docs) yields
    a pair graph well under CLUSTERS_LOCAL_MAX_EDGES — the adaptive
    driver-side union-find remains the RIGHT production plan there (that
    is the point of the threshold) — so the probe mines the sf30 pair
    graph once, then clusters it through BOTH branches: adaptive, and
    with VARPULIS_CLUSTERS_LOCAL_MAX_EDGES=0 forcing the distributed
    loop. Done-criteria checked: the distributed branch converges, its
    wall stays in the same class (no super-linear blowup), and its
    canon_id assignment is IDENTICAL to the union-find's. Also records
    the sf10→sf30 per-doc ratio for the same mine+cluster pipeline (the
    3× decade axis).

    Mining uses the PRODUCTION near-dup path (minhash_near_dup_pairs:
    numpy OPH signatures, salted capped buckets, bucket-local verify —
    recall 1.0 at sf10) rather than the oracle-checkable minshingle twin:
    this is what a 100 TB pipeline feeds dedup_clusters, and the
    minshingle verify join's shuffle footprint at sf30 (tens of GB of
    sorted array payloads) measured DISK, not the clustering under
    test."""
    import make_sf

    from varpulis_spark.operators import dedup as D

    out: dict = {}

    def _drop_caches():
        spark.catalog.clearCache()
        D.release_caches()

    from varpulis_spark.engine import read_parquet

    def mine_and_cluster_wall(sf_dir: str) -> tuple[int, int, float]:
        docs = read_parquet(spark, os.path.join(sf_dir, "documents.parquet"))
        n_docs = docs.count()
        t0 = time.time()
        p = D.minhash_near_dup_pairs(docs, threshold=0.6)
        rows = D.dedup_clusters(p).count()
        wall = time.time() - t0
        _drop_caches()
        return n_docs, rows, wall

    # sf10 reference wall for the same pipeline
    sf10 = make_sf.ensure_sf10()
    docs10, rows10, wall10 = mine_and_cluster_wall(sf10)
    out["sf10_full"] = {
        "n_docs": docs10, "rows": rows10, "wall_sec": round(wall10, 2)
    }

    # sf30: mine once, cluster through both branches
    sf30 = make_sf.ensure_docs30()
    docs = read_parquet(spark, os.path.join(sf30, "documents.parquet"))
    n_docs30 = docs.count()
    t0 = time.time()
    pairs = D.minhash_near_dup_pairs(docs, threshold=0.6).persist()
    n_pairs = pairs.count()
    wall_mine = time.time() - t0
    # pairs is materialized; the op-internal signature cache (~GBs at
    # sf30) is no longer needed — release it, keep the pairs cache
    D.release_caches()

    runs: dict[str, dict] = {}
    assignments: dict[str, set] = {}
    for label, forced in (("adaptive", False), ("distributed", True)):
        if forced:
            os.environ["VARPULIS_CLUSTERS_LOCAL_MAX_EDGES"] = "0"
        try:
            t0 = time.time()
            cl = D.dedup_clusters(pairs)
            got = {(r[0], r[1]) for r in cl.select("id", "canon_id").collect()}
            wall = time.time() - t0
        finally:
            os.environ.pop("VARPULIS_CLUSTERS_LOCAL_MAX_EDGES", None)
        runs[label] = {"wall_sec": round(wall, 2), "rows": len(got)}
        assignments[label] = got
    pairs.unpersist()
    _drop_caches()

    out["sf30"] = {
        "n_docs": n_docs30,
        "n_pairs": n_pairs,
        "mine_wall_sec": round(wall_mine, 2),
        "cluster": runs,
        "branches_identical": assignments["adaptive"] == assignments["distributed"],
    }
    full30 = wall_mine + runs["adaptive"]["wall_sec"]
    out["docs_per_sec_ratio_sf30_vs_sf10"] = round(
        (n_docs30 / full30) / (docs10 / wall10), 2
    )
    return out


def main() -> None:
    # sf10 runs 10x the data under the same per-query cap — widen it so a
    # perfectly linear 60 s query isn't recorded as a timeout (bench reads
    # the env at import). 600 s: the r10 minshingle (full-recall banded
    # blocking) runs ~190 s fresh / ~300 s session-aged at sf10.
    os.environ.setdefault("SPARK_GRAFT_BENCH_QUERY_TIMEOUT", "600")
    os.environ.setdefault("SPARK_GRAFT_BENCH_SUITE_BUDGET", "2400")
    # decade corpora cache multi-GB signature tables (sf10 ~1.4 GB, the
    # sf30 probe ~4 GB) in ONE long session; the 8g default driver heap
    # OOMed the probe on a 128 GiB box — size for the workload
    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "24g")
    import bench
    import make_sf

    import __spark_entry__ as entrymod
    from varpulis_spark.engine import get_spark

    sf1 = make_sf.ensure()
    sf10 = make_sf.ensure_sf10()
    spark = get_spark("varpulis-decade")
    spark.sparkContext.setLogLevel("ERROR")

    out: dict = {"queries": QUERIES}
    # Same calibration block bench.py stamps (VERDICT r12 task 4: the r12
    # decade artifact recorded loadavg 21 with no in-artifact way to tell
    # host state from engine change — the in-suite minshingle 134 s vs
    # 85 s warm-standalone gap was pure host state, invisible to a reader
    # of the artifact alone). Probe BEFORE the suite heats the box.
    cpu = bench.cpu_ref()
    cal = bench.host_calibration(cpu)
    out["cpu_ref"] = cpu
    out.update(cal)
    results = {}
    all_queries = entrymod.queries()
    skip = set(all_queries) - set(QUERIES)
    for label, sf_dir in (("sf1", sf1), ("sf10", sf10)):
        n = bench.warmup(spark, sf_dir)
        runs = 2 if label == "sf1" else 1
        times, spread, rows, skipped = bench.run_suite(spark, sf_dir, runs, skip=skip)
        results[label] = {"n_events": n, "times": times, "rows": rows,
                          "spread": spread, "skipped": skipped}
    eps1 = {k: results["sf1"]["n_events"] / v
            for k, v in results["sf1"]["times"].items() if v > 0}
    eps10 = {k: results["sf10"]["n_events"] / v
             for k, v in results["sf10"]["times"].items() if v > 0}
    ratio = {k: round(eps10[k] / eps1[k], 2) for k in eps10 if k in eps1}
    out.update(
        sf1=results["sf1"], sf10=results["sf10"],
        eps_ratio_sf10_vs_sf1=ratio,
        ratio_floor=min(ratio.values()) if ratio else None,
        ratio_median=sorted(ratio.values())[len(ratio) // 2] if ratio else None,
        loadavg=[round(x, 2) for x in os.getloadavg()],
        ts=time.strftime("%Y-%m-%dT%H:%M:%S"),
    )
    out["streaming"] = run_streaming_decade(spark)
    # keys_1x runs the same scenario shape (64 keys) as bench.py's idle
    # twin, so the >3x anomaly note applies mechanically here too
    # (VERDICT r12 task 4: decade trend p50 1.76 s vs 1.05 idle deserved
    # the stamp, not prose). Mutates the nested dicts in place.
    flat_1x = {
        name: scales.get("keys_1x")
        for name, scales in out["streaming"].items()
        if isinstance(scales, dict) and isinstance(scales.get("keys_1x"), dict)
    }
    bench.annotate_streaming_anomalies(flat_1x)
    try:
        out["clusters_scale_probe"] = run_clusters_scale_probe(spark)
    except Exception as e:  # record, never kill the artifact
        out["clusters_scale_probe"] = {"error": f"{type(e).__name__}: {e}"[:300]}
    rnd = bench._running_round()
    path = os.path.join(REPO, f"BENCH_DECADE_r{rnd}.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({
        "metric": "decade_eps_ratio_sf10_vs_sf1",
        "gemm_factor": out.get("gemm_factor"),
        "host_degraded": out.get("host_degraded"),
        "ratio_floor": out["ratio_floor"],
        "ratio_median": out["ratio_median"],
        "ratios": ratio,
        "sf10_wall": round(sum(t for t in results["sf10"]["times"].values() if t > 0), 1),
        "streaming_eps_ratio_10x_keys": {
            k: v.get("sustained_eps_ratio_10x")
            for k, v in out["streaming"].items()
            if isinstance(v, dict)
        },
        "clusters_sf30_distributed_wall": out["clusters_scale_probe"]
        .get("sf30", {})
        .get("cluster", {})
        .get("distributed", {})
        .get("wall_sec"),
        "clusters_branches_identical": out["clusters_scale_probe"]
        .get("sf30", {})
        .get("branches_identical"),
        "detail": os.path.basename(path),
    }))


if __name__ == "__main__":
    main()
