"""Deduplication operators — exact, fingerprint, MinHash-LSH, SimHash,
n-gram Jaccard — designed for 100 TB corpora.

These extend the reference's `.distinct()` (DistinctState, engine/types.rs:
289-295) to the LLM-data-pipeline scale ops called for by BASELINE.json's
north star. Scale design:

- exact / fingerprint dedup: hash-shuffle on the (narrow) key only; the
  winning row id is resolved with min/count aggregation, so no wide-row
  shuffle and no window-function sort.
- shingling + hashing happen INSIDE one Arrow-batched pandas UDF as a
  vectorized numpy rolling hash (sliding_window_view over utf-8 bytes ×
  power vector, uint64 wraparound — deterministic). A JVM-side
  transform/substring shingler is O(len²) per doc and was measured 50×
  slower; per-row Python regex is avoided via pandas C-level .str ops.
- MinHash signatures: (a_j·h + b_j) mod p universal-hash family over the
  distinct shingle hashes, one numpy broadcast per row. LSH banding explodes
  to `bands` rows per doc (bounded, default 16); per-bucket candidate lists
  are capped (MAX_BUCKET) to defuse degenerate skew (an empty-text bucket
  would otherwise go quadratic).
- SimHash: 64-bit sign-of-bit-votes signature from the same shingle hashes;
  near-dup = Hamming ≤ k over 4×16-bit banded exact-match candidates
  (pigeonhole: Hamming ≤ 3 ⇒ at least one identical band).
- verification joins carry only (id, signature/shingle-hash array), never
  the text.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

MERSENNE_PRIME = (1 << 61) - 1
MAX_BUCKET = 64  # cap candidates per LSH bucket (skew guard)
_FNV = np.uint64(1099511628211)


def spread(df: DataFrame) -> DataFrame:
    """Ensure at least default-parallelism partitions before a CPU-heavy UDF.

    Small local files arrive as one input split, serializing Arrow-UDF work;
    on a real cluster with many input splits this is a no-op."""
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


def spread_keys(df: DataFrame, keys: list[str]) -> DataFrame:
    """Hash-repartition on `keys` to ≥ default parallelism before a
    CPU-heavy keyed op (applyInPandas).

    AQE's size-based shuffle coalescing is wrong for Python-stateful
    stages: a few MB of events can carry minutes of NFA/DP work, and AQE
    happily coalesces them onto 1-2 tasks. An explicit repartition(N, keys)
    pins the partition count; it is the SAME hash distribution the keyed op
    needs, so no extra shuffle is introduced."""
    target = df.sparkSession.sparkContext.defaultParallelism
    return df.repartition(target, *[F.col(k) for k in keys])


# ---------------------------------------------------------------------------
# exact / fingerprint dedup
# ---------------------------------------------------------------------------


def exact_dedup(df: DataFrame, on: list[str] | str, id_col: str) -> DataFrame:
    """Keep the lowest-id row per duplicate group; adds `dup_count`.

    One shuffle keyed by `on`; resolved via min/count agg (no sort/window)."""
    on = [on] if isinstance(on, str) else list(on)
    keep = (
        df.groupBy(*[F.col(c) for c in on])
        .agg(
            F.min(F.col(id_col)).alias("__keep_id"),
            F.count(F.lit(1)).alias("dup_count"),
        )
    )
    return df.join(
        keep, [df[c].eqNullSafe(keep[c]) for c in on], "inner"
    ).filter(F.col(id_col) == F.col("__keep_id")).drop("__keep_id", *[keep[c] for c in on])


# ---------------------------------------------------------------------------
# vectorized shingle hashing (shared by MinHash / SimHash / Jaccard)
# ---------------------------------------------------------------------------


def _normalize(texts: pd.Series) -> pd.Series:
    """lowercase + whitespace-collapse, C-level pandas string ops."""
    return texts.fillna("").str.lower().str.replace(r"\s+", " ", regex=True)


def _shingle_hash_row(text: str, k: int, powers: np.ndarray) -> np.ndarray:
    """Distinct uint64 rolling hashes of the char k-shingles of one text."""
    b = np.frombuffer(text.encode("utf-8"), dtype=np.uint8)
    if len(b) == 0:
        return np.zeros(0, dtype=np.uint64)
    if len(b) < k:
        w = np.zeros((1, k), dtype=np.uint64)
        w[0, : len(b)] = b
    else:
        w = np.lib.stride_tricks.sliding_window_view(b, k).astype(np.uint64)
    with np.errstate(over="ignore"):
        h = (w * powers).sum(axis=1, dtype=np.uint64)
    return np.unique(h)


def _powers(k: int) -> np.ndarray:
    with np.errstate(over="ignore"):
        p = np.empty(k, dtype=np.uint64)
        p[0] = np.uint64(1)
        for i in range(1, k):
            p[i] = p[i - 1] * _FNV
    return p


def shingle_hashes_udf(k: int = 5):
    """pandas UDF: text → array<long> distinct shingle hashes."""
    powers = _powers(k)

    @pandas_udf("array<long>")
    def _sh(texts: pd.Series) -> pd.Series:
        normed = _normalize(texts)
        return pd.Series(
            [_shingle_hash_row(t, k, powers).astype(np.int64).tolist() for t in normed]
        )

    return _sh


def _perm_params(num_perm: int, seed: int = 42) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.RandomState(seed)
    a = rng.randint(1, MERSENNE_PRIME, size=num_perm, dtype=np.int64).astype(np.uint64)
    b = rng.randint(0, MERSENNE_PRIME, size=num_perm, dtype=np.int64).astype(np.uint64)
    return a, b


def minhash_signature_udf(num_perm: int = 128, shingle_k: int = 5, seed: int = 42):
    """pandas UDF: text → array<long> MinHash signature.

    Signature_j = min_s ((a_j·s + b_j) mod p), p = 2^61−1 — the classic
    universal-hash permutation family. The permutation matrix is computed
    for the WHOLE Arrow batch at once (docs' shingle hashes concatenated,
    per-doc mins via np.minimum.reduceat) — one big numpy kernel instead of
    a Python loop per document; bounded by a shingle-count chunk so the
    intermediate stays ~100 MB regardless of batch size.
    """
    a, b = _perm_params(num_perm, seed)
    powers = _powers(shingle_k)
    empty = np.full(num_perm, MERSENNE_PRIME, dtype=np.int64)
    CHUNK_SHINGLES = 1 << 17  # ~128K shingles × 128 perms × 8 B ≈ 134 MB

    @pandas_udf("array<long>")
    def _sig(texts: pd.Series) -> pd.Series:
        hashes = [_shingle_hash_row(t, shingle_k, powers) for t in _normalize(texts)]
        sigs: list[np.ndarray] = [None] * len(hashes)
        group: list[int] = []
        pending = 0

        def flush():
            nonlocal pending
            if not group:
                return
            hs = [hashes[i] for i in group]
            starts = np.zeros(len(hs), dtype=np.int64)
            np.cumsum([len(h) for h in hs[:-1]], out=starts[1:])
            cat = np.concatenate(hs)
            with np.errstate(over="ignore"):
                # multiply-add with 2^64 wraparound (multiply-shift family):
                # a uint64 `%` has no SIMD path in numpy and was measured
                # 40× slower than the wraparound product for the same
                # MinHash quality (equality-only use of the signatures).
                vals = cat.reshape(-1, 1) * a + b
            mins = np.minimum.reduceat(vals, starts, axis=0)
            for gi, i in enumerate(group):
                sigs[i] = mins[gi].astype(np.int64)
            group.clear()
            pending = 0

        for i, h in enumerate(hashes):
            if len(h) == 0:
                sigs[i] = empty
                continue
            group.append(i)
            pending += len(h)
            if pending >= CHUNK_SHINGLES:
                flush()
        flush()
        return pd.Series([s.tolist() for s in sigs])

    return _sig


def simhash_udf(shingle_k: int = 5):
    """pandas UDF: text → 64-bit SimHash (long)."""
    powers = _powers(shingle_k)
    bits = np.arange(64, dtype=np.uint64)
    weights = (np.uint64(1) << bits).astype(np.uint64)

    @pandas_udf("long")
    def _sim(texts: pd.Series) -> pd.Series:
        out = np.zeros(len(texts), dtype=np.int64)
        for i, t in enumerate(_normalize(texts)):
            h = _shingle_hash_row(t, shingle_k, powers)
            if len(h) == 0:
                continue
            bitvals = ((h.reshape(-1, 1) >> bits) & np.uint64(1)).astype(np.int64)
            score = bitvals.sum(axis=0) * 2 - len(h)
            sig = (weights[score > 0]).sum(dtype=np.uint64)
            out[i] = sig.astype(np.int64)
        return pd.Series(out)

    return _sim


# ---------------------------------------------------------------------------
# MinHash + LSH near-duplicate pairs
# ---------------------------------------------------------------------------


def minhash_near_dup_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_perm: int = 128,
    bands: int = 32,
    shingle_k: int = 5,
    threshold: float = 0.5,
) -> DataFrame:
    """Candidate near-duplicate pairs via MinHash + LSH banding.

    Returns (id_a, id_b, est_jaccard) with id_a < id_b and estimated Jaccard
    (signature agreement rate) ≥ threshold.

    Choose `bands` for the target similarity: the banding S-curve midpoint is
    (1/bands)^(bands/num_perm) — 32×4 ≈ 0.42 (default, near-dup mining),
    16×8 ≈ 0.71 (strict dup detection). More bands → higher recall at low
    similarity, more candidate pairs to verify."""
    rows_per_band = num_perm // bands
    sig = minhash_signature_udf(num_perm, shingle_k)
    # persist: the banding projection references `sig` once per band and
    # CollapseProject would otherwise re-evaluate the UDF `bands` times.
    base = (
        spread(df.select(F.col(id_col).alias("id"), F.col(text_col).alias("__t")))
        .select("id", sig(F.col("__t")).alias("sig"))
        .persist()
    )

    # banding carries only (band-bucket hash, id) — the shuffle and the
    # per-bucket pair explosion never touch the 128-long signatures.
    # xxhash64 hashes the band's longs directly (no string casts).
    banded = base.select(
        "id",
        F.explode(
            F.array(
                *[
                    F.xxhash64(
                        F.lit(j),
                        *[
                            F.col("sig").getItem(j * rows_per_band + r)
                            for r in range(rows_per_band)
                        ],
                    )
                    for j in range(bands)
                ]
            )
        ).alias("bucket"),
    )

    # skew guard: cap degenerate mega-buckets
    pairs = _bucket_pairs(banded)

    # verify on signatures joined back by id (base is persisted + narrow;
    # the sig table scales with the corpus, so the join strategy is left to
    # AQE — broadcast when it fits, shuffle-hash otherwise)
    a_sig = base.select(F.col("id").alias("id_a"), F.col("sig").alias("sig_a"))
    b_sig = base.select(F.col("id").alias("id_b"), F.col("sig").alias("sig_b"))
    est = F.size(
        F.filter(F.zip_with("sig_a", "sig_b", lambda x, y: x == y), lambda eq: eq)
    ).cast("double") / F.lit(float(num_perm))
    return (
        pairs.join(a_sig, "id_a").join(b_sig, "id_b")
        .withColumn("est_jaccard", est)
        .filter(F.col("est_jaccard") >= threshold)
        .select("id_a", "id_b", "est_jaccard")
    )


def _bucket_pairs(banded: DataFrame) -> DataFrame:
    """(id, bucket) → distinct candidate (id_a, id_b) pairs per bucket.

    ONE shuffle: groupBy(bucket) collects the ids, truncates to the
    MAX_BUCKET lowest (skew guard — a degenerate bucket, e.g. empty-text,
    stays bounded but still contributes candidates), and the pair explosion
    happens JVM-side with higher-order functions over the sorted list
    (sort_array guarantees id_a < id_b). A second shuffle dedups pairs seen
    in several bands. Replaces a window-rank + self-join + dedup pipeline
    (3 shuffles + a per-bucket sort) measured 2× slower."""
    lists = (
        banded.groupBy("bucket")
        .agg(F.slice(F.sort_array(F.collect_list("id")), 1, MAX_BUCKET).alias("ids"))
        .filter(F.size("ids") >= 2)
    )
    pair_expr = (
        "flatten(transform(ids, (x, i) -> "
        "transform(slice(ids, i + 2, size(ids)), y -> struct(x AS id_a, y AS id_b))))"
    )
    return (
        lists.select(F.explode(F.expr(pair_expr)).alias("p"))
        .select("p.id_a", "p.id_b")
        .dropDuplicates(["id_a", "id_b"])
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_k: int = 5,
    threshold: float = 0.5,
    candidates: DataFrame | None = None,
) -> DataFrame:
    """Exact n-gram Jaccard over candidate pairs (default: MinHash LSH
    candidates) — array_intersect/array_union cardinality, JVM-side."""
    if candidates is None:
        candidates = minhash_near_dup_pairs(
            df, id_col, text_col, shingle_k=shingle_k, threshold=threshold * 0.5
        ).select("id_a", "id_b")
    sh_udf = shingle_hashes_udf(shingle_k)
    sh = spread(df.select(F.col(id_col).alias("id"), F.col(text_col).alias("__t"))).select(
        "id", sh_udf(F.col("__t")).alias("sh")
    )
    j = (
        candidates.join(sh.withColumnRenamed("id", "id_a").withColumnRenamed("sh", "sh_a"), "id_a")
        .join(sh.withColumnRenamed("id", "id_b").withColumnRenamed("sh", "sh_b"), "id_b")
        .withColumn(
            "jaccard",
            F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
            / F.size(F.array_union("sh_a", "sh_b")),
        )
    )
    return j.filter(F.col("jaccard") >= threshold).select("id_a", "id_b", "jaccard")


# ---------------------------------------------------------------------------
# SimHash near-duplicate pairs
# ---------------------------------------------------------------------------


def with_simhash(df: DataFrame, text_col: str = "text", shingle_k: int = 5) -> DataFrame:
    return df.withColumn("simhash", simhash_udf(shingle_k)(F.col(text_col)))


def simhash_near_dup_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 3,
    shingle_k: int = 5,
) -> DataFrame:
    """Near-dup pairs by SimHash Hamming distance ≤ max_hamming.

    Candidate generation: 4×16-bit bands — two signatures within Hamming 3
    share at least one exact band (pigeonhole), so the join is equi-key."""
    sh = (
        with_simhash(spread(df.select(id_col, text_col)), text_col, shingle_k)
        .select(F.col(id_col).alias("id"), "simhash")
        .persist()  # 4 band projections would re-run the UDF otherwise
    )
    banded = sh.select(
        "id",
        F.explode(
            F.array(
                *[
                    F.xxhash64(
                        F.lit(j),
                        F.shiftright(F.col("simhash"), j * 16).bitwiseAND(F.lit(0xFFFF)),
                    )
                    for j in range(4)
                ]
            )
        ).alias("bucket"),
    )
    pairs = _bucket_pairs(banded)
    a = sh.select(F.col("id").alias("id_a"), F.col("simhash").alias("h_a"))
    b = sh.select(F.col("id").alias("id_b"), F.col("simhash").alias("h_b"))
    hamming = F.bit_count(F.col("h_a").bitwiseXOR(F.col("h_b")))
    return (
        pairs.join(a, "id_a").join(b, "id_b")
        .withColumn("hamming", hamming)
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )
