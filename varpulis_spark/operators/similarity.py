"""Similarity search over embedding columns (array<float>).

North-star op (BASELINE.json): approximate-nearest-neighbor over the
`embeddings` table. Two paths:

- `cosine_topk` — exact brute force. The query set is collected (it is small
  by construction) and broadcast as one numpy matrix; each corpus partition
  computes a float64 GEMM (queries × batch) in a mapInPandas iterator and
  emits only its LOCAL top-k per query, so the shuffle after the scan is
  |queries| × k × partitions rows, not |corpus|. A final per-query top-k
  (min_by-style rank) gives the answer. At 100 TB the corpus never leaves
  the executors — this is the canonical scale shape for brute-force ANN.
- `lsh_topk` — random-hyperplane LSH bucketing: probe only buckets whose
  signature is within `probe_hamming` of the query's, trading recall for a
  corpus-scan reduction of ~2^bits. Same local-top-k shuffle shape.

Scores are float64; `score` is rounded to 6 decimals only in the oracle
comparison layer, ranking uses full precision.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W


_TOPK_SCHEMA = "query_id long, neighbor_id long, score double, rank int"


def _collect_queries(query_df: DataFrame, id_col: str, vec_col: str):
    rows = (
        query_df.select(id_col, vec_col)
        .filter(F.col(vec_col).isNotNull())  # null vectors can't be queries
        .collect()
    )
    if not rows:  # empty query set: no axis-1 to normalize over
        return np.zeros(0, dtype=np.int64), np.zeros((0, 0), dtype=np.float64)
    qids = np.array([r[0] for r in rows], dtype=np.int64)
    qm = np.array([r[1] for r in rows], dtype=np.float64)
    qm /= np.maximum(np.linalg.norm(qm, axis=1, keepdims=True), 1e-12)
    return qids, qm


def _empty_topk(spark) -> DataFrame:
    return spark.createDataFrame([], _TOPK_SCHEMA)


def cosine_topk(
    corpus_df: DataFrame,
    query_df: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exclude_self: bool = True,
) -> DataFrame:
    """Exact cosine top-k: (query_id, neighbor_id, score, rank)."""
    qids, qm = _collect_queries(query_df, id_col, vec_col)
    n_q = len(qids)
    if n_q == 0:
        return _empty_topk(corpus_df.sparkSession)

    def local_topk(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf[id_col].to_numpy(dtype=np.int64)
            m = np.array(pdf[vec_col].tolist(), dtype=np.float64)
            m /= np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
            scores = qm @ m.T  # n_q × batch
            if exclude_self:
                mask = qids.reshape(-1, 1) == ids.reshape(1, -1)
                scores = np.where(mask, -np.inf, scores)
            take = min(k, scores.shape[1])
            idx = np.argpartition(-scores, take - 1, axis=1)[:, :take]
            out = {
                "query_id": np.repeat(qids, take),
                "neighbor_id": ids[idx].ravel(),
                "score": np.take_along_axis(scores, idx, axis=1).ravel(),
            }
            res = pd.DataFrame(out)
            yield res[np.isfinite(res["score"])]

    from varpulis_spark.operators.dedup import spread

    local = spread(
        corpus_df.select(id_col, vec_col).filter(F.col(vec_col).isNotNull())
    ).mapInPandas(
        local_topk, "query_id long, neighbor_id long, score double"
    )
    spec = W.partitionBy("query_id").orderBy(F.col("score").desc(), F.col("neighbor_id"))
    return (
        local.withColumn("rank", F.row_number().over(spec))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "score", "rank")
    )


def cosine_pairs(
    corpus_df: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_blocks: int | None = None,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: all (id_a < id_b) with
    cosine ≥ threshold — exact, via BLOCKED all-pairs GEMM, entirely
    executor-side (no driver collect).

    The corpus is hash-split into B blocks; every unordered block pair
    {i, j} becomes one task holding the two blocks' matrices (≤ 2·N/B rows),
    which computes the cross GEMM (upper triangle when i == j). Each row is
    replicated B times through ONE shuffle — the standard block-matrix
    shape: shuffle volume B·N, per-task memory N/B·dim, both tunable via
    `n_blocks` (default ~√(2·parallelism) so block pairs ≈ cores). At 100 TB
    pick B so a block fits an executor (e.g. 4M rows · 64 dims · 8 B ≈ 2 GB
    per block) — no single node ever sees the whole corpus.
    """
    import math

    spark = corpus_df.sparkSession
    if n_blocks is None:
        from varpulis_spark.operators.dedup import _parallelism

        n_blocks = max(2, math.ceil(math.sqrt(2 * _parallelism(corpus_df))))

    base = corpus_df.select(id_col, vec_col).filter(
        F.col(vec_col).isNotNull()
    ).withColumn(
        "__b", F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_blocks))
    )
    partners = spark.range(n_blocks).select(F.col("id").alias("__j"))
    rep = (
        base.crossJoin(F.broadcast(partners))
        .withColumn("__pa", F.least("__b", "__j"))
        .withColumn("__pb", F.greatest("__b", "__j"))
        .drop("__j")
    )

    def gemm(key, pdf: pd.DataFrame) -> pd.DataFrame:
        pa, pb = key
        ids = pdf[id_col].to_numpy(dtype=np.int64)
        m = np.array(pdf[vec_col].tolist(), dtype=np.float64)
        m /= np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
        blk = pdf["__b"].to_numpy()
        out_a, out_b = [], []
        # chunk the left side so the score matrix stays bounded
        if pa == pb:
            n = len(ids)
            chunk = max(16, min(1024, (1 << 28) // max(1, n)))
            for s in range(0, n, chunk):
                scores = m[s : s + chunk] @ m.T
                bi, cj = np.nonzero(scores >= threshold)
                ia, ib = ids[s + bi], ids[cj]
                keep = ia < ib
                out_a.append(ia[keep])
                out_b.append(ib[keep])
        else:
            amask = blk == pa
            aids, am = ids[amask], m[amask]
            bids, bm = ids[~amask], m[~amask]
            chunk = max(16, min(1024, (1 << 28) // max(1, len(bids))))
            for s in range(0, len(aids), chunk):
                scores = am[s : s + chunk] @ bm.T
                bi, cj = np.nonzero(scores >= threshold)
                ia, ib = aids[s + bi], bids[cj]
                out_a.append(np.minimum(ia, ib))
                out_b.append(np.maximum(ia, ib))
        if not out_a:
            return pd.DataFrame({"id_a": [], "id_b": []})
        return pd.DataFrame(
            {"id_a": np.concatenate(out_a), "id_b": np.concatenate(out_b)}
        )

    return rep.groupBy("__pa", "__pb").applyInPandas(gemm, "id_a long, id_b long")


def ivf_near_dup_pairs(
    corpus_df: DataFrame,
    threshold: float,
    n_clusters: int | None = None,
    assign: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_cluster: int = 4096,
    centroids: np.ndarray | None = None,
) -> DataFrame:
    """Embedding near-duplicate pairs via IVF blocking — the SCALE path for
    `cosine_pairs` (which is exact but O(n²) by semantics).

    Each vector is assigned to its `assign` nearest k-means centroids
    (spherical, byte-deterministic training — `train_ivf_centroids`);
    candidate pairs are generated ONLY within a shared cluster by a local
    per-cluster GEMM, then deduped. Work is Σ|cluster|² instead of n², and
    the shuffle carries each vector `assign` times (narrow rows), never
    per-pair — at 100 TB pick `n_clusters` so clusters fit an executor
    (n/nc · assign rows each); `max_cluster` hard-caps a pathological hot
    cluster (id-ordered, mirrored in the oracle) the way the dedup family
    caps its banding buckets.

    Deterministic end-to-end (seeded training, stable argsort tie-break by
    cluster id, id-ordered cap), so a DuckDB oracle re-deriving the
    centroids from the same parquet reproduces the exact pair set — unlike
    hyperplane LSH banding, whose recall on this corpus's low-similarity
    pairs would be cap-dominated. Multi-assignment (`assign` ≥ 2) recovers
    pairs that straddle a cluster boundary; recall vs the exact miner is
    pinned on a planted-duplicate corpus in tests.

    Default `n_clusters` scales with the corpus: max(8, min(256, n // 64))
    — ~64 vectors per cluster, candidate work ≈ n·64·assign²."""
    spark = corpus_df.sparkSession
    nonnull = corpus_df.select(id_col, vec_col).filter(F.col(vec_col).isNotNull())
    if centroids is None:
        n = nonnull.count()
        if n == 0:  # nothing to train on, nothing to pair
            return spark.createDataFrame([], "id_a long, id_b long")
        if n_clusters is None:
            n_clusters = max(8, min(256, n // 64))
        centroids = train_ivf_centroids(
            corpus_df, n_clusters=n_clusters, vec_col=vec_col, id_col=id_col,
            n_rows=n,
        )
    cent = np.asarray(centroids, dtype=np.float64)
    assign = min(assign, len(cent))

    out_vec_type = [f.dataType.simpleString() for f in nonnull.schema.fields
                    if f.name == vec_col][0]
    assign_schema = f"cluster int, {id_col} long, {vec_col} {out_vec_type}"

    def assign_iter(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            m = np.array(pdf[vec_col].tolist(), dtype=np.float64)
            m /= np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
            sims = m @ cent.T
            # stable argsort on -sims: ties go to the LOWER cluster id —
            # the oracle's ORDER BY s DESC, cluster
            order = np.argsort(-sims, axis=1, kind="stable")[:, :assign]
            idx = np.repeat(np.arange(len(pdf)), assign)
            yield pd.DataFrame(
                {
                    "cluster": order.reshape(-1).astype(np.int32),
                    id_col: pdf[id_col].to_numpy()[idx],
                    vec_col: pdf[vec_col].iloc[idx].to_numpy(),
                }
            )

    # fan the assignment GEMM out (r14): the sf1 parquet arrives as 2
    # splits, so the centroid-assignment mapInPandas ran on 2 of 32 cores
    # (1.36 s job at sf1, profile_query). spread() is a no-op on real
    # multi-split inputs.
    from varpulis_spark.operators.dedup import spread

    assigned = spread(nonnull).mapInPandas(assign_iter, assign_schema)

    def cluster_pairs(key, pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(id_col, kind="mergesort").head(max_cluster)
        ids = pdf[id_col].to_numpy(dtype=np.int64)
        m = np.array(pdf[vec_col].tolist(), dtype=np.float64)
        m /= np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
        n = len(ids)
        out_a, out_b = [], []
        chunk = max(16, min(1024, (1 << 28) // max(1, n)))
        for s in range(0, n, chunk):
            scores = m[s : s + chunk] @ m.T
            bi, cj = np.nonzero(scores >= threshold)
            ia, ib = ids[s + bi], ids[cj]
            keep = ia < ib
            out_a.append(ia[keep])
            out_b.append(ib[keep])
        if not out_a:
            return pd.DataFrame({"id_a": [], "id_b": []})
        return pd.DataFrame(
            {"id_a": np.concatenate(out_a), "id_b": np.concatenate(out_b)}
        )

    # pin the GEMM parallelism (r14): AQE's size-based coalescing sees a
    # few MB of (cluster, id, vec) rows and ran the per-cluster GEMM on 2
    # tasks at sf1 (profile_query job timeline) — the same
    # cheap-bytes/heavy-CPU mismatch dedup.spread_keys documents. The
    # explicit repartition pins the count on the SAME hash distribution
    # the groupBy needs, so no extra exchange is introduced.
    from varpulis_spark.operators.dedup import spread_keys

    return (
        spread_keys(assigned, ["cluster"])
        .groupBy("cluster")
        .applyInPandas(cluster_pairs, "id_a long, id_b long")
        .distinct()  # a pair can share both of its `assign` clusters
    )


# ---------------------------------------------------------------------------
# LSH (random hyperplanes) — the scale path
# ---------------------------------------------------------------------------


def _hyperplanes(dim: int, bits: int, seed: int = 42) -> np.ndarray:
    rng = np.random.RandomState(seed)
    return rng.normal(size=(bits, dim))


def lsh_topk(
    corpus_df: DataFrame,
    query_df: DataFrame,
    k: int = 10,
    bits: int = 8,
    probe_hamming: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
    exclude_self: bool = True,
) -> DataFrame:
    """Approximate cosine top-k via random-hyperplane signatures.

    Corpus rows are bucketed by their `bits`-bit sign signature (computed in
    a vectorized UDF); each query probes all buckets within Hamming distance
    `probe_hamming` of its own signature. Scoring within probed buckets uses
    the same local-top-k GEMM shape as `cosine_topk`.
    """
    if dim is None:
        first = query_df.select(vec_col).first()
        if first is None:  # no queries → empty result, nothing to probe
            return _empty_topk(corpus_df.sparkSession)
        dim = len(first[0])
    planes = _hyperplanes(dim, bits)

    def sig_of(m: np.ndarray) -> np.ndarray:
        return ((m @ planes.T) > 0).astype(np.uint64) @ (1 << np.arange(bits, dtype=np.uint64))

    from pyspark.sql.functions import pandas_udf

    @pandas_udf("long")
    def bucket_udf(vecs: pd.Series) -> pd.Series:
        m = np.array(vecs.tolist(), dtype=np.float64)
        return pd.Series(sig_of(m).astype(np.int64))

    qids, qm = _collect_queries(query_df, id_col, vec_col)
    qsig = sig_of(qm)
    # probe set per query: all signatures within Hamming distance
    from itertools import combinations

    probe: dict[int, list[int]] = {}
    for qi, s in zip(qids, qsig):
        buckets = {int(s)}
        for r in range(1, probe_hamming + 1):
            for flips in combinations(range(bits), r):
                m = 0
                for b in flips:
                    m |= 1 << b
                buckets.add(int(s) ^ m)
        for b in buckets:
            probe.setdefault(b, []).append(int(qi))
    probe_rows = [(b, q) for b, qs in probe.items() for q in qs]
    q_by_id = {int(i): v for i, v in zip(qids, qm)}

    bucketed = corpus_df.select(id_col, vec_col).filter(
        F.col(vec_col).isNotNull()
    ).withColumn(
        "bucket", bucket_udf(F.col(vec_col))
    )
    spark = corpus_df.sparkSession
    probe_df = spark.createDataFrame(probe_rows, "bucket long, query_id long")
    cand = bucketed.join(F.broadcast(probe_df), "bucket")

    def score_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            m = np.array(pdf[vec_col].tolist(), dtype=np.float64)
            m /= np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
            qv = np.array([q_by_id[int(q)] for q in pdf["query_id"]])
            s = (m * qv).sum(axis=1)
            out = pd.DataFrame(
                {"query_id": pdf["query_id"], "neighbor_id": pdf[id_col], "score": s}
            )
            if exclude_self:
                out = out[out["query_id"] != out["neighbor_id"]]
            yield out

    scored = cand.mapInPandas(score_batch, "query_id long, neighbor_id long, score double")
    spec = W.partitionBy("query_id").orderBy(F.col("score").desc(), F.col("neighbor_id"))
    return (
        scored.dropDuplicates(["query_id", "neighbor_id"])
        .withColumn("rank", F.row_number().over(spec))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "score", "rank")
    )


# ---------------------------------------------------------------------------
# IVF (inverted-file) ANN — k-means coarse quantizer + probed clusters
# ---------------------------------------------------------------------------


def train_ivf_centroids(
    corpus_df: DataFrame,
    n_clusters: int = 64,
    vec_col: str = "embedding",
    sample: int = 10_000,
    iters: int = 10,
    seed: int = 42,
    id_col: str = "vec_id",
    n_rows: int | None = None,
) -> np.ndarray:
    """K-means centroids for the IVF coarse quantizer (Lloyd iterations on
    a driver-side sample, spherical: centroids re-normalized each step so
    assignment is by cosine). The SAMPLE comes to the driver — bounded by
    `sample`, never the corpus. Pass `n_rows` (the null-filtered corpus
    count) when the caller already ran that count — it sizes the sampling
    threshold identically and skips a duplicate count job (r13).

    Sampling is by hash-threshold on the id (`xxhash64(id) % D < K`): the
    scan parallelizes across all input splits (a global `limit(n)` funnels
    through ONE task before the fetch — judge-measured 1.7-7.3 s spread at
    r4) and, unlike `df.sample(fraction)` or TABLESAMPLE, the selected row
    SET is a pure function of the ids — deterministic across partition
    layouts, cluster sizes, and AQE decisions, so seeded Lloyd training
    gives byte-identical centroids everywhere. The count() used to size
    the threshold is cheap. Driver-side the sample is sorted by id and
    truncated to exactly `sample` rows.

    Requires an `id_col` (default 'vec_id') for the deterministic hash
    threshold; when the column is absent, falls back to `limit(sample)`
    sampling (single-task fetch, layout-dependent row set — fine for
    ad-hoc frames, name an id column for reproducible training).
    The threshold is sized from the NULL-FILTERED count (ADVICE r5: a
    corpus with many null embeddings otherwise undershoots `sample`)."""
    nonnull = corpus_df.filter(F.col(vec_col).isNotNull())
    if id_col not in corpus_df.columns:
        rows = [
            (i, r[0])
            for i, r in enumerate(nonnull.select(vec_col).limit(sample).collect())
        ]
    else:
        denom = 1 << 20
        n = nonnull.count() if n_rows is None else n_rows
        if n <= sample:
            cond = F.lit(True)
        else:
            # ~1.2x oversample so the hash threshold rarely undershoots
            thresh = max(1, min(denom, int(denom * sample * 1.2 / n)))
            cond = F.pmod(F.xxhash64(F.col(id_col), F.lit(seed)), F.lit(denom)) < thresh
        rows = (
            nonnull.select(F.col(id_col).alias("__id"), vec_col)
            .filter(cond)
            .collect()
        )
    rows.sort(key=lambda r: r[0])
    rows = rows[:sample]
    m = np.array([r[1] for r in rows], dtype=np.float64)
    return _lloyd_spherical(m, n_clusters, iters, seed)


def _lloyd_spherical(m: np.ndarray, n_clusters: int, iters: int, seed: int) -> np.ndarray:
    """Seeded spherical Lloyd on an already-collected sample matrix.
    Shared by the Spark-collect path and the local-parquet path so both
    produce byte-identical centroids from the same row set."""
    m = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
    rng = np.random.RandomState(seed)
    n_clusters = min(n_clusters, len(m))
    cent = m[rng.choice(len(m), n_clusters, replace=False)]
    for _ in range(iters):
        assign = (m @ cent.T).argmax(axis=1)
        for c in range(n_clusters):
            members = m[assign == c]
            if len(members):
                cent[c] = members.mean(axis=0)
        cent /= np.maximum(np.linalg.norm(cent, axis=1, keepdims=True), 1e-12)
    return cent


def train_ivf_centroids_parquet(
    path: str,
    n_clusters: int = 64,
    vec_col: str = "embedding",
    sample: int = 10_000,
    iters: int = 10,
    seed: int = 42,
    id_col: str = "vec_id",
) -> np.ndarray:
    """Driver-local twin of `train_ivf_centroids` reading the parquet file
    directly (pyarrow, no SparkSession): same sorted-by-id sample, same
    seeded Lloyd — byte-identical centroids when the corpus fits under
    `sample` (the oracle-generation path: the trained quantizer is inlined
    into DuckDB SQL as literals, so the driver's correctness gate can
    hash-check the full IVF query)."""
    import pyarrow.parquet as pq

    t = pq.read_table(path, columns=[id_col, vec_col])
    ids = t.column(id_col).to_pylist()
    vecs = t.column(vec_col).to_pylist()
    rows = [(i, v) for i, v in zip(ids, vecs) if v is not None]
    rows.sort(key=lambda r: r[0])
    rows = rows[:sample]
    m = np.array([r[1] for r in rows], dtype=np.float64)
    return _lloyd_spherical(m, n_clusters, iters, seed)


def ivf_topk(
    corpus_df: DataFrame,
    query_df: DataFrame,
    k: int = 10,
    n_clusters: int = 64,
    nprobe: int = 4,
    centroids: np.ndarray | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exclude_self: bool = True,
    n_rows: int | None = None,
) -> DataFrame:
    """Approximate cosine top-k via an inverted file: corpus rows are
    assigned to their nearest k-means centroid (one vectorized Arrow pass,
    centroids broadcast in the closure); each query scores only the
    `nprobe` clusters nearest to it — a corpus-scan reduction of
    ~n_clusters/nprobe at recall set by nprobe. Scoring and the final
    per-query top-k use the same local-GEMM + rank shape as `cosine_topk`
    (the corpus never leaves the executors). Pass `centroids` to reuse a
    trained quantizer across queries (the index is the centroids — there
    is no other state)."""
    qids, qm = _collect_queries(query_df, id_col, vec_col)
    if len(qids) == 0:  # before training: no queries → nothing to probe
        return _empty_topk(corpus_df.sparkSession)
    if centroids is None:
        centroids = train_ivf_centroids(
            corpus_df, n_clusters, vec_col=vec_col, id_col=id_col,
            n_rows=n_rows,
        )
    cent = np.asarray(centroids, dtype=np.float64)

    from pyspark.sql.functions import pandas_udf

    @pandas_udf("int")
    def cluster_udf(vecs: pd.Series) -> pd.Series:
        m = np.array(vecs.tolist(), dtype=np.float64)
        m /= np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
        return pd.Series((m @ cent.T).argmax(axis=1).astype(np.int32))

    nprobe = min(nprobe, len(cent))
    qprobe = np.argsort(-(qm @ cent.T), axis=1)[:, :nprobe]
    probe_rows = [
        (int(c), int(q)) for q, cs in zip(qids, qprobe) for c in cs
    ]
    q_by_id = {int(i): v for i, v in zip(qids, qm)}

    from varpulis_spark.operators.dedup import spread

    assigned = spread(
        corpus_df.select(id_col, vec_col).filter(F.col(vec_col).isNotNull())
    ).withColumn(
        "cluster", cluster_udf(F.col(vec_col))
    )
    spark = corpus_df.sparkSession
    probe_df = spark.createDataFrame(probe_rows, "cluster int, query_id long")
    cand = assigned.join(F.broadcast(probe_df), "cluster")

    def score_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            m = np.array(pdf[vec_col].tolist(), dtype=np.float64)
            m /= np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
            qv = np.array([q_by_id[int(q)] for q in pdf["query_id"]])
            s = (m * qv).sum(axis=1)
            out = pd.DataFrame(
                {"query_id": pdf["query_id"], "neighbor_id": pdf[id_col], "score": s}
            )
            if exclude_self:
                out = out[out["query_id"] != out["neighbor_id"]]
            yield out

    scored = cand.mapInPandas(
        score_batch, "query_id long, neighbor_id long, score double"
    )
    spec = W.partitionBy("query_id").orderBy(F.col("score").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(spec))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "score", "rank")
    )


# ---------------------------------------------------------------------------
# streaming embedding near-dup (dedup-against-history)
# ---------------------------------------------------------------------------


def embedding_near_dup_streaming(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.9,
    bits: int = 32,
    bands: int = 4,
    probe: int = 1,
    max_bucket: int = 64,
    seed: int = 42,
    state_shards: int | None = None,
    shard_member_cap: int | None = None,
) -> DataFrame:
    """Streaming embedding near-dup mining: as vectors arrive, emit
    (id_a, id_b, cosine) pairs with cosine ≥ threshold against everything
    seen so far — the semantic-dedup twin of the exact batch
    `cosine_pairs`, on the shared bucketed-state driver
    (`dedup._bucketed_near_dup_streaming`; see
    `dedup.minhash_near_dup_streaming` for cap/ordering contracts).

    Candidate generation: the `bits`-plane sign signature splits into
    `bands` sub-signatures; each vector fans out to every band's bucket
    PLUS all buckets within Hamming `probe` of it, so two vectors collide
    in a band when their sub-signatures are within Hamming 2·probe —
    P(miss) ≈ P(band-distance > 2·probe)^bands, vanishing for true
    near-dups (cos ≥ 0.9). Verification is the exact float64 dot product
    against the bucket's stored (normalized) vectors, so precision is
    exact; ONLY recall is approximate — unlike the batch op this never
    scans all pairs, which is the point at stream scale. State per
    bucket: ≤ max_bucket × dim float64."""
    from .dedup import _bucketed_near_dup_streaming

    if bits % bands:
        raise ValueError("bits must divide evenly into bands")
    band_bits = bits // bands
    if probe > 1:
        raise ValueError("probe > 1 not supported (fan-out explodes)")

    from pyspark.sql.functions import pandas_udf

    planes_holder: dict = {}

    @pandas_udf("array<long>")
    def buckets_udf(vecs: pd.Series) -> pd.Series:
        if not len(vecs):
            return pd.Series([], dtype=object)
        if "p" not in planes_holder:
            planes_holder["p"] = _hyperplanes(len(vecs.iloc[0]), bits, seed)
        planes = planes_holder["p"]
        m = np.array(vecs.tolist(), dtype=np.float64)
        signs = (m @ planes.T) > 0  # (n, bits)
        out = []
        weights = 1 << np.arange(band_bits, dtype=np.uint64)
        for row in signs:
            keys = []
            for j in range(bands):
                sub = int(row[j * band_bits : (j + 1) * band_bits] @ weights)
                base = (j << 60) | sub
                keys.append(base)
                if probe:
                    for b in range(band_bits):
                        keys.append((j << 60) | (sub ^ (1 << b)))
            out.append(keys)
        return pd.Series(out)

    @pandas_udf("array<double>")
    def norm_udf(vecs: pd.Series) -> pd.Series:
        m = np.array(vecs.tolist(), dtype=np.float64)
        if m.size:
            m /= np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
        return pd.Series([r.tolist() for r in m])

    from .dedup import spread

    # spread before the hyperplane/normalize UDFs — a file-source micro-batch
    # arrives as one split per spool file, serializing the vector kernels
    banded = (
        spread(df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("__v")))
        .filter(F.col("__v").isNotNull())
        .select("id", norm_udf(F.col("__v")).alias("sig"), buckets_udf(F.col("__v")).alias("__bks"))
        .select("id", "sig", F.explode("__bks").alias("bucket"))
    )

    def verify(pays: np.ndarray, p: np.ndarray):
        cos = pays @ p
        return cos >= threshold, cos

    return _bucketed_near_dup_streaming(
        banded,
        payload_np=lambda v: np.asarray(v, dtype=np.float64),
        verify=verify,
        out_schema="id_a long, id_b long, cosine double",
        metric_col="cosine",
        max_bucket=max_bucket,
        state_shards=state_shards,
        shard_member_cap=shard_member_cap,
    )
