"""Generate a larger local scale factor from the driver's sf0.1 tables.

The driver ships sf{0.001,0.01,0.1}; proving the scale story (VERDICT r3
task 1) needs a 10x step. This derives `localdata/sf1` (gitignored) from
/root/testdata/sf0.1 deterministically (seed 42), preserving the
distributions that drive engine work:

- events: 10 copies, USER IDS SHIFTED per copy (15k users at the same
  per-user event density — TPC-H SF semantics: more keys, not denser
  keys; denser keys would inflate the exponential trend/Kleene outputs,
  measuring the data, not the engine). event_ids globally unique; ts kept
  (more concurrent users over the same month).
- documents: resampled bag-of-words from the sf0.1 EMPIRICAL per-language
  word frequencies and length distribution (plain 10x replication would
  make every doc a 10-way exact+near duplicate, quadratically inflating
  LSH candidate pairs — a data artifact, not scaling). A small planted
  dup (0.2%) and near-dup (0.5%) population keeps the dedup pipelines'
  match stages exercised, matching sf0.1's density.
- embeddings: 10 copies, ids shifted, deterministic random ORTHOGONAL
  rotation + small noise per (level, copy) — an isometry, so per-copy
  cluster geometry is exact, while cross-copy cosine similarity is
  destroyed by design (the old per-level np.roll composed additively
  across derivation levels: equal-total-roll sub-copies were near-dups
  of each other, inflating ivf_near_dup output ~99x per decade).
- orders/customer/lineitem: 10 copies with consistent key shifts so the
  orders->customer enrich join and lineitem aggregation keep their shape;
  region/nation/supplier/part are fixed dimensions, copied as-is.

Run: python scripts/make_sf.py [--force]   (~1 min, ~100 MB)
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SRC = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DST = os.path.join(REPO, "localdata", "sf1")
DST10 = os.path.join(REPO, "localdata", "sf10")
COPIES = 10
SEED = 42

# module-level src/dst so ensure() and ensure_sf10() reuse the same
# generator functions; swapped by _target()
_src = SRC
_dst = DST


def _target(src: str, dst: str) -> None:
    global _src, _dst
    _src, _dst = src, dst


def _read(name: str) -> pa.Table:
    return pq.read_table(os.path.join(_src, f"{name}.parquet"))


def _write(name: str, table: pa.Table) -> None:
    pq.write_table(table, os.path.join(_dst, f"{name}.parquet"))


def _shift_copies(table: pa.Table, shifts: dict[str, int]) -> pa.Table:
    """Concatenate COPIES copies, adding k*shift to each listed int column."""
    parts = []
    for k in range(COPIES):
        arrays = []
        for col in table.column_names:
            a = table.column(col)
            if col in shifts and k > 0:
                a = pa.chunked_array(
                    [pa.compute.add(c, shifts[col] * k) for c in a.chunks]
                )
            arrays.append(a)
        parts.append(pa.table(dict(zip(table.column_names, arrays))))
    return pa.concat_tables(parts)


def make_events() -> None:
    t = _read("events")
    n = t.num_rows
    n_users = int(pa.compute.max(t.column("user_id")).as_py()) + 1
    _write("events", _shift_copies(t, {"event_id": n, "user_id": n_users}))


def make_documents(copies: int = COPIES) -> None:
    t = _read("documents")
    texts = t.column("text").to_pylist()
    langs = t.column("lang").to_pylist()
    sources = sorted(set(t.column("source").to_pylist()))
    rng = np.random.default_rng(SEED)

    # empirical per-language unigram tables + per-language word-count dist
    by_lang: dict[str, dict[str, int]] = {}
    lens_by_lang: dict[str, list[int]] = {}
    for txt, lg in zip(texts, langs):
        words = txt.split()
        lens_by_lang.setdefault(lg, []).append(len(words))
        freq = by_lang.setdefault(lg, {})
        for w in words:
            freq[w] = freq.get(w, 0) + 1
    tables = {}
    heads = {}
    for lg, freq in by_lang.items():
        ws = np.array(list(freq.keys()))
        ps = np.array(list(freq.values()), dtype=np.float64)
        ps = ps / ps.sum()
        tables[lg] = (ws, ps, np.array(lens_by_lang[lg]))
        # HEAD vocabulary = words covering the top 50% of probability mass
        # (stopword-like; shared at any corpus size). TAIL words are
        # sharded per copy below so the shingle vocabulary grows ~O(n)
        # with the corpus (VERDICT r10 task 3): real corpora do not keep
        # a frozen vocabulary at 10x the documents, and a frozen one makes
        # LSH candidate density grow super-linearly — a generator
        # artifact, not an engine property. The derivation chain
        # compounds: sf10 re-learns its empirical tables from sf1's
        # (already sharded) vocabulary and shards again, so each decade
        # multiplies the tail vocabulary ~copies× alongside the docs.
        order = np.argsort(-ps)
        cum = np.cumsum(ps[order])
        n_head = int(np.searchsorted(cum, 0.5)) + 1
        heads[lg] = np.array(sorted(ws[order[:n_head]]))

    n_out = t.num_rows * copies
    lang_choices = rng.choice(langs, size=n_out)  # empirical lang mix
    # vectorized per language: one big word draw split by doc lengths
    # (the per-doc rng.choice loop costs ~1 ms/doc — minutes at sf10)
    out_texts: list[str] = [""] * n_out
    for lg, (ws, ps, ls) in tables.items():
        idx = np.flatnonzero(lang_choices == lg)
        if idx.size == 0:
            continue
        nw = np.maximum(rng.choice(ls, size=idx.size), 1)
        pool = rng.choice(ws, size=int(nw.sum()), p=ps)
        # per-doc vocabulary shard (doc index mod copies): tail-word draws
        # get a shard suffix, head words stay global — vectorized suffixing
        shard = np.char.mod("%d", (idx % copies).astype(np.int64))
        word_shard = np.repeat(shard, nw)
        is_head = np.isin(pool, heads[lg])
        pool = np.where(is_head, pool, np.char.add(pool, word_shard))
        bounds = np.concatenate(([0], np.cumsum(nw)))
        for j, i in enumerate(idx):
            out_texts[i] = " ".join(pool[bounds[j]:bounds[j + 1]]) + " "
    # planted exact dups (0.2%) and near-dups (0.5%), like the source corpus
    for _ in range(n_out // 500):
        i, j = rng.integers(0, n_out, 2)
        out_texts[j] = out_texts[i]
    for _ in range(n_out // 200):
        i, j = rng.integers(0, n_out, 2)
        words = out_texts[i].split()
        lg = lang_choices[i]
        ws, ps, _ = tables[lg]
        head = heads[lg]
        sfx = str(int(i) % copies)  # replacements stay in i's vocab shard
        for p in rng.integers(0, max(1, len(words)), max(1, len(words) // 10)):
            w = str(rng.choice(ws))
            words[p] = w if w in head else w + sfx
        out_texts[j] = " ".join(words) + " "
    _write(
        "documents",
        pa.table(
            {
                "doc_id": pa.array(range(n_out), type=pa.int64()),
                "text": pa.array(out_texts),
                "lang": pa.array(lang_choices.tolist()),
                "source": pa.array(
                    [sources[i % len(sources)] for i in range(n_out)]
                ),
                "n_chars": pa.array(
                    [len(s) for s in out_texts], type=pa.int64()
                ),
            }
        ),
    )


def planted_slices(n: int) -> dict:
    """Per-copy planted-near-dup source-id ranges for an n-row source
    table: copy k keeps ids [(k-1)·step, k·step) as near-copies (see
    make_embeddings). Exported so tests and the decade bench can compute
    the expected O(n) planted-pair population exactly."""
    step = max(1, n // 100)
    return {
        k: ((k - 1) * step, min(k * step, n))
        for k in range(1, COPIES)
        if (k - 1) * step < n
    }


def make_embeddings() -> None:
    t = _read("embeddings")
    vecs = np.array(t.column("embedding").to_pylist(), dtype=np.float32)
    labels = np.array(t.column("label").to_pylist())
    n, d = vecs.shape
    # Per-(level, copy) random ORTHOGONAL rotation, not np.roll (VERDICT
    # r12 What's-wrong #2): rolls compose ADDITIVELY, so deriving sf10
    # from sf1 re-rolled every copy and any two sub-copies whose total
    # roll collided (mod d) differed only by two small noise draws —
    # cosine far above any near-dup threshold, and ivf_near_dup pairs
    # grew ~99x per 10x input (manufactured density, same class as the
    # r11 frozen-vocabulary documents bug). A seeded QR rotation is the
    # same isometry class (within-copy cluster geometry preserved
    # exactly, like the roll), but independent rotations drawn per
    # (level, copy) compose to rotations that agree between two DISTINCT
    # composite copies with probability ~0 — cross-copy similarity is
    # destroyed by design, so near-dup output stays O(n) across decades.
    # The level salt keeps sf1's rotation k and sf10's rotation k
    # distinct (otherwise level-1 copy (0,k) and level-2 copy (k,0)
    # would share the composite Q_k and differ only by noise).
    import zlib

    level_salt = zlib.crc32(os.path.basename(_dst).encode())
    plant = planted_slices(n)  # ~1% planted near-dups per non-base copy
    out_vecs, out_ids, out_labels = [], [], []
    for k in range(COPIES):
        if k == 0:
            v = vecs
        else:
            rng_k = np.random.default_rng([SEED, level_salt, k])
            q, _ = np.linalg.qr(rng_k.standard_normal((d, d)))
            v = (
                vecs @ q.astype(np.float32)
                + rng_k.normal(0, 0.05, size=(n, d)).astype(np.float32)
            )
            # Planted near-dup population (r13): copy k keeps the DISJOINT
            # 1% id slice [(k-1)·step, k·step) unrotated with tiny noise
            # (cos ≈ 0.99 to the source row) — the documents tables' 0.2%
            # dup / 0.5% near-dup analogue. Each source id is planted at
            # most once per level, so the high-similarity pair population
            # is provably O(n) across derivation levels — this is the
            # class the decade bench measures at threshold 0.85, where the
            # isotropic tail is ~0 (P(cos ≥ 0.85) in d=64 ≈ e^-23). At
            # the operators' oracle threshold 0.4 the output is
            # intrinsically ~n²·5e-4 for ANY faithful scale-up of this
            # corpus (the base table is isotropic unit noise; a d=64
            # codebook with pairwise cos < 0.4 saturates near the base
            # size), so O(n) growth at 0.4 is a sphere-packing
            # impossibility, not a derivation defect — see PERF_NOTES r13.
            if k in plant:
                lo, hi = plant[k]
                v[lo:hi] = vecs[lo:hi] + rng_k.normal(
                    0, 0.02, size=(hi - lo, d)
                ).astype(np.float32)
        out_vecs.append(v)
        out_ids.append(np.arange(n, dtype=np.int64) + k * n)
        out_labels.append(labels)
    flat = np.concatenate(out_vecs)
    _write(
        "embeddings",
        pa.table(
            {
                "vec_id": pa.array(np.concatenate(out_ids)),
                "embedding": pa.array(
                    flat.tolist(), type=pa.list_(pa.float32())
                ),
                "label": pa.array(
                    np.concatenate(out_labels), type=pa.int32()
                ),
            }
        ),
    )


def make_tpch() -> None:
    orders = _read("orders")
    customer = _read("customer")
    lineitem = _read("lineitem")
    n_ord = int(pa.compute.max(orders.column("o_orderkey")).as_py()) + 1
    n_cust = int(pa.compute.max(customer.column("c_custkey")).as_py()) + 1
    _write("orders", _shift_copies(orders, {"o_orderkey": n_ord, "o_custkey": n_cust}))
    _write("customer", _shift_copies(customer, {"c_custkey": n_cust}))
    _write("lineitem", _shift_copies(lineitem, {"l_orderkey": n_ord}))
    for name in ("region", "nation", "supplier", "part"):
        _write(name, _read(name))


def _generate(src: str, dst: str, force: bool) -> str:
    marker = os.path.join(dst, ".complete")
    if os.path.exists(marker) and not force:
        return dst
    _target(src, dst)
    os.makedirs(dst, exist_ok=True)
    make_events()
    make_documents()
    make_embeddings()
    make_tpch()
    with open(marker, "w") as f:
        f.write("ok\n")
    return dst


def ensure(force: bool = False) -> str:
    """Generate localdata/sf1 if absent; returns the directory."""
    return _generate(SRC, DST, force)


def ensure_sf10(force: bool = False) -> str:
    """localdata/sf10 (~10M events, ~1 GB): another 10x decade derived
    from sf1 with the SAME distribution-preserving rules (VERDICT r7
    task 4) — key-shifted copies for events/embeddings/TPC-H, resampled
    documents from sf1's empirical per-language tables."""
    ensure(force=False)  # sf10 derives from sf1
    return _generate(DST, DST10, force)


DST30D = os.path.join(REPO, "localdata", "sf30docs")


def ensure_docs30(force: bool = False) -> str:
    """documents-ONLY sf30 (~1.5M docs, resampled from sf10's empirical
    tables with the same planted dup/near-dup density): the near-dup
    clusters scale probe (VERDICT r9 task 7) needs a corpus big enough
    that the distributed label-propagation branch is worth exercising;
    events/embeddings/TPC-H are not read by that pipeline, so only
    documents.parquet is generated (~0.5 GB)."""
    ensure_sf10(force=False)
    marker = os.path.join(DST30D, ".complete")
    if os.path.exists(marker) and not force:
        return DST30D
    _target(DST10, DST30D)
    os.makedirs(DST30D, exist_ok=True)
    make_documents(copies=3)
    with open(marker, "w") as f:
        f.write("ok\n")
    return DST30D


if __name__ == "__main__":
    if "--sf10" in sys.argv:
        path = ensure_sf10(force="--force" in sys.argv)
    else:
        path = ensure(force="--force" in sys.argv)
    for f in sorted(os.listdir(path)):
        full = os.path.join(path, f)
        print(f"{f}: {os.path.getsize(full) // 1024} KiB")
