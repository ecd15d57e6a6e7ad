"""Multimodal plumbing, model scoring, forecasting, .process flatMap."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from varpulis_spark import Stream
from varpulis_spark.operators import multimodal as M
from varpulis_spark.operators.forecast import OnlinePST, forecast
from varpulis_spark.operators.score import score


@pytest.fixture(scope="module")
def images_df(spark):
    rows = [
        (i, M.make_fake_image(8 + i, 6 + i, 3, seed=i)) for i in range(20)
    ]
    return spark.createDataFrame(rows, "img_id long, content binary")


def test_encode_fake_images_roundtrip(spark):
    """encode_fake_images is a pure function of the row: decode must
    recover the doc_id-derived dims, and frame sampling the closed-form
    frame count (the multimodal_meta oracle's contract)."""
    rows = [(i, "word " * (i * 20)) for i in range(12)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    enc = M.encode_fake_images(df)
    meta = {r.doc_id: (r.width, r.height, r.channels)
            for r in M.decode_metadata(enc).collect()}
    for i, t in rows:
        assert meta[i] == (16 + i % 32, 16 + (i * 7) % 32, 1 + i % 3)
    frames = M.sample_frames(enc.select("doc_id", "content"),
                             every_n=10, frame_bytes=64)
    got = {r[0]: r[1] for r in frames.groupBy("doc_id").count().collect()}
    import math
    for i, t in rows:
        m = max(1, (12 + len(t.encode())) // 64)
        assert got[i] == math.ceil(m / 10)


def test_decode_metadata(spark, images_df):
    out = M.decode_metadata(images_df).collect()
    assert len(out) == 20
    for r in out:
        assert r.width == 8 + r.img_id and r.height == 6 + r.img_id
        assert r.channels == 3 and r.format == "raw-fake"


def test_resize_roundtrip(spark, images_df):
    resized = M.resize_images(images_df, 4, 4)
    metas = M.decode_metadata(resized).collect()
    assert all(r.width == 4 and r.height == 4 for r in metas)


def test_extract_features_shape(spark, images_df):
    out = M.extract_features(images_df, dim=16).collect()
    assert all(len(r.features) == 16 for r in out)
    # deterministic: same seed → same features
    again = M.extract_features(images_df, dim=16).collect()
    assert {r.img_id: tuple(r.features) for r in out} == {
        r.img_id: tuple(r.features) for r in again
    }


def test_unknown_codec_raises(spark, images_df):
    with pytest.raises(NotImplementedError):
        M.decode_metadata(images_df, codec="jpeg")


def test_sample_frames(spark):
    buf = bytes(range(256)) * 10  # 2560 bytes = 40 frames of 64
    df = spark.createDataFrame([(1, buf)], "vid_id long, content binary")
    out = M.sample_frames(df, every_n=10, frame_bytes=64).collect()
    assert [r.frame_index for r in out] == [0, 10, 20, 30]
    assert all(len(r.content) == 64 for r in out)


def test_score_linear(spark, sf_dir):
    df = Stream.events(spark, sf_dir).df.limit(50)
    out = score(df, "linear:2.0,0.5,3.0", inputs=["value", "user_id"]).collect()
    for r in out:
        assert r.score == pytest.approx(2.0 * r.value + 0.5 * r.user_id + 3.0)


def test_score_onnx_unavailable(spark, sf_dir):
    df = Stream.events(spark, sf_dir).df.limit(5)
    with pytest.raises(Exception):
        score(df, "model.onnx", inputs=["value"]).collect()


def test_pst_learns_periodic_sequence():
    pst = OnlinePST(max_depth=3)
    seq = ["a", "b", "c"] * 50
    hist = []
    for s in seq:
        pst.update(hist, s)
        hist.append(s)
        hist = hist[-3:]
    # after 'a','b' the model should strongly predict 'c'
    assert pst.prob(["a", "b"], "c") > 0.9
    assert pst.prob(["a", "b"], "a") < 0.1
    # forward fixed-point: one remaining step with p≈1 → completion ≈ 1
    from varpulis_spark.operators.forecast import _completion_prob

    p_next = [pst.prob(["b", "c"], "a"), pst.prob(["c", "a"], "b"), pst.prob(["a", "b"], "c")]
    assert _completion_prob(2, 3, p_next, None, 50) > 0.9
    # from state 0 the chain must traverse all three steps
    assert _completion_prob(0, 3, p_next, None, 50) <= _completion_prob(2, 3, p_next, None, 50)


def test_forecast_spark_periodic(spark):
    from datetime import datetime, timedelta

    t0 = datetime(2024, 1, 1)
    rows = []
    for u in range(3):
        for i, et in enumerate(["a", "b", "c"] * 20):
            rows.append((u * 1000 + i, t0 + timedelta(seconds=i), u, et, 1.0))
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double"
    )
    s = Stream(df, ts_col="ts", order_col="event_id").partition_by("user_id")
    out = forecast(s, ["a", "b", "c"], warmup=10).collect()
    # forecasts emit only while a run is active and after warmup
    assert len(out) > 50
    # one step remaining (state 2, after a→b): near-certain completion.
    # two steps remaining: the reference's forward algorithm holds the PST
    # context static during simulation (markov_chain.rs:379), so these stay
    # low — assert the discrimination, not a blanket threshold.
    near = [r.completion_prob for r in out if r.next_step == 2]
    far = [r.completion_prob for r in out if r.next_step == 1]
    # +1-smoothed PST climbs toward certainty as the context accumulates
    assert near and sum(near) / len(near) > 0.7
    assert sorted(near)[len(near) // 2] > 0.75  # median
    assert far and max(far) < 0.5
    for r in out:
        assert 0.0 <= r.prob_lo <= r.completion_prob <= r.prob_hi <= 1.0
        assert 1 <= r.next_step <= 2
        assert r.active_runs >= 1


def test_forecast_single_step_pattern_rejected():
    """A 1-type pattern completes on arrival — nothing to forecast. The
    engine raises instead of silently emitting nothing (ADVICE r3)."""
    from varpulis_spark.operators.forecast import ForecastEngine

    with pytest.raises(ValueError, match="at least|>= 2|2 event types"):
        ForecastEngine(["A"], 5, 10, 0.0, True, True, 0.9, None, None)


def test_forecast_no_run_no_emission(spark):
    """Events that never start the pattern produce no forecasts — the
    NFA-run tracker (not a linear counter) gates emission."""
    from datetime import datetime, timedelta

    t0 = datetime(2024, 1, 1)
    rows = [
        (i, t0 + timedelta(seconds=i), 1, "x", 1.0) for i in range(60)
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double"
    )
    s = Stream(df, ts_col="ts", order_col="event_id").partition_by("user_id")
    assert forecast(s, ["a", "b"], warmup=5).count() == 0


def test_forecast_within_expires_runs(spark):
    """Runs older than the span expire; with only stale starts, forecasts
    stop; expired outcomes calibrate (widen) the conformal interval."""
    from datetime import datetime, timedelta

    t0 = datetime(2024, 1, 1)
    rows = []
    # 'a' starts a run; 'b' never arrives; gaps of 10 min between events
    for i in range(40):
        rows.append((i, t0 + timedelta(minutes=10 * i), 1, "a" if i % 2 == 0 else "x", 1.0))
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double"
    )
    s = Stream(df, ts_col="ts", order_col="event_id").partition_by("user_id")
    out = forecast(s, ["a", "b"], within="15m", warmup=4, confidence=0.0).collect()
    # runs exist intermittently; predicted probabilities should be low
    # after the PST learns 'b' never occurs
    late = [r.completion_prob for r in out[len(out) // 2 :]]
    assert late and max(late) < 0.5


def test_process_flatmap(spark, sf_dir):
    """RuntimeOp::Process analog: 0..n output events per input event."""

    def dup_high(batches):
        for pdf in batches:
            big = pdf[pdf["value"] > 150][["event_id", "value"]]
            out = big.loc[big.index.repeat(2)].reset_index(drop=True)
            out["copy"] = out.groupby("event_id").cumcount()
            yield out

    s = Stream.events(spark, sf_dir).process(dup_high, "event_id long, value double, copy long")
    got = s.df.groupBy("event_id").count().collect()
    exp = Stream.events(spark, sf_dir).where(F.col("value") > 150).df.count()
    assert len(got) == exp and all(r["count"] == 2 for r in got)


def test_lsh_topk_recall(spark, sf_dir):
    """LSH ANN must hit high recall@10 vs exact brute force on the
    embeddings table (approximation quality gate)."""
    from varpulis_spark.engine import load_table
    from varpulis_spark.operators.similarity import cosine_topk, lsh_topk

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    exact = cosine_topk(emb, queries, k=10).collect()
    approx = lsh_topk(emb, queries, k=10, bits=6, probe_hamming=2).collect()
    ex = {}
    for r in exact:
        ex.setdefault(r.query_id, set()).add(r.neighbor_id)
    ap = {}
    for r in approx:
        ap.setdefault(r.query_id, set()).add(r.neighbor_id)
    recalls = [len(ex[q] & ap.get(q, set())) / len(ex[q]) for q in ex]
    assert sum(recalls) / len(recalls) >= 0.5  # 6-bit probe-2 on 64-dim


def test_cosine_pairs_exact_no_driver_collect(spark, sf_dir, monkeypatch):
    """Blocked all-pairs must match numpy brute force AND never collect the
    corpus on the driver (the 100 TB scale contract)."""
    from pyspark.sql import DataFrame

    from varpulis_spark.engine import load_table
    from varpulis_spark.operators.similarity import cosine_pairs

    emb = load_table(spark, sf_dir, "embeddings")
    rows = emb.select("vec_id", "embedding").collect()
    ids = np.array([r[0] for r in rows])
    m = np.array([r[1] for r in rows], dtype=np.float64)
    m /= np.linalg.norm(m, axis=1, keepdims=True)
    s = m @ m.T
    ii, jj = np.nonzero(s >= 0.4)
    exp = sorted(
        (int(min(ids[i], ids[j])), int(max(ids[i], ids[j])))
        for i, j in zip(ii, jj)
        if ids[i] < ids[j]
    )

    def boom(self):
        raise AssertionError("driver collect inside cosine_pairs")

    monkeypatch.setattr(DataFrame, "collect", boom)
    out = cosine_pairs(emb, threshold=0.4, n_blocks=4)
    monkeypatch.undo()
    got = sorted((r.id_a, r.id_b) for r in out.collect())
    assert got == exp


def test_metrics_listener(spark, sf_dir, tmp_path):
    import time as _time

    from varpulis_spark import metrics as MX
    from varpulis_spark import streaming as S

    listener = MX.attach(spark)
    schema = Stream.events(spark, sf_dir).df.schema
    import shutil

    src_dir = str(tmp_path / "mx_src")
    import os

    os.makedirs(src_dir)
    # reuse raw events parquet via spark rewrite (µs timestamps)
    Stream.events(spark, sf_dir).df.coalesce(1).write.parquet(str(tmp_path / "w"))
    for f in os.listdir(tmp_path / "w"):
        if f.endswith(".parquet"):
            shutil.copy(tmp_path / "w" / f, os.path.join(src_dir, f))
    out = S.file_source(spark, src_dir, schema).where(F.col("value") > 0)
    q = out.df.writeStream.format("memory").queryName("mx_q").outputMode("append").start()
    q.processAllAvailable()
    q.stop()
    for _ in range(20):  # listener events are delivered asynchronously
        st = listener.stats.get("mx_q")
        if st and st.input_rows >= 1000:
            break
        _time.sleep(0.5)
    st = listener.stats.get("mx_q")
    assert st is not None and st.input_rows == 1000 and st.batches >= 1
    spark.streams.removeListener(listener)


def test_register_fn(spark, sf_dir):
    from varpulis_spark.functions import register_fn

    register_fn(spark, "double_it", lambda x: x * 2.0, "double")
    out = (
        Stream.events(spark, sf_dir)
        .where(F.expr("double_it(value) > 300"))
        .count()
    )
    exp = Stream.events(spark, sf_dir).where(F.col("value") > 150).count()
    assert out == exp


def test_ivf_topk_recall(spark, sf_dir):
    """IVF ANN: recall@10 vs exact brute force stays high at modest nprobe,
    and probing scans only ~nprobe/n_clusters of the corpus."""
    from varpulis_spark.operators.similarity import (
        cosine_topk,
        ivf_topk,
        train_ivf_centroids,
    )
    from varpulis_spark.engine import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.orderBy("vec_id").limit(8)
    exact = {
        (r.query_id, r.neighbor_id)
        for r in cosine_topk(emb, queries, k=10).collect()
    }
    cent = train_ivf_centroids(emb, n_clusters=16, sample=2000)
    approx = {
        (r.query_id, r.neighbor_id)
        for r in ivf_topk(emb, queries, k=10, nprobe=6, centroids=cent).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.6, recall
    # reusing the trained quantizer is deterministic
    again = {
        (r.query_id, r.neighbor_id)
        for r in ivf_topk(emb, queries, k=10, nprobe=6, centroids=cent).collect()
    }
    assert approx == again


def test_ivf_quality_bounds(spark, sf_dir):
    """Explicit ann_ivf quality gates (VERDICT r5 task 8):

    1. recall@10 >= 0.9 vs exact top-k at nprobe/n_clusters = 0.5
       (nc=64, nprobe=32). The testdata embeddings are RANDOM 64-dim
       vectors — no cluster structure, the worst case for IVF — so the 0.9
       bound needs a 50% probe fraction here; on real embedding manifolds
       the same index clears it at far smaller fractions. What the gate
       protects against is a quantizer/probe regression, which would drop
       recall well below this floor at fixed config.
    2. Centroid training is DETERMINISTIC across partition layouts: the
       hash-threshold sample is a pure function of the ids, so retraining
       on a repartitioned corpus yields a byte-identical centroid matrix
       (fingerprint compare — a silent sampling regression can't pass)."""
    import hashlib

    import numpy as np

    from varpulis_spark.engine import load_table
    from varpulis_spark.operators.similarity import (
        cosine_topk,
        ivf_topk,
        train_ivf_centroids,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.orderBy("vec_id").limit(8)
    exact = {
        (r.query_id, r.neighbor_id)
        for r in cosine_topk(emb, queries, k=10).collect()
    }
    cent = train_ivf_centroids(emb, n_clusters=64, sample=2000)
    approx = {
        (r.query_id, r.neighbor_id)
        for r in ivf_topk(emb, queries, k=10, nprobe=32, centroids=cent).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.9, f"recall@10={recall} below 0.9 at nprobe/nc=0.5"

    cent2 = train_ivf_centroids(emb.repartition(7), n_clusters=64, sample=2000)
    fp = hashlib.sha256(np.ascontiguousarray(cent).tobytes()).hexdigest()
    fp2 = hashlib.sha256(np.ascontiguousarray(cent2).tobytes()).hexdigest()
    assert fp == fp2, "centroid training is layout-dependent"


def test_ivf_train_null_and_no_id(spark):
    """ADVICE r5: the sample threshold sizes from the NULL-FILTERED count,
    and a frame without the id column falls back to limit-based sampling
    instead of failing."""
    import numpy as np

    from varpulis_spark.operators.similarity import train_ivf_centroids

    rows = [(i, [float(i % 7), float(i % 5)] if i % 2 == 0 else None)
            for i in range(400)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    # 200 non-null rows, sample=150 < 200 → threshold path; must deliver
    # ~sample vectors despite half the corpus being null
    cent = train_ivf_centroids(df, n_clusters=4, sample=150)
    assert cent.shape == (4, 2)
    # no id column → limit fallback, still trains
    cent2 = train_ivf_centroids(df.select("embedding"), n_clusters=4, sample=50)
    assert cent2.shape == (4, 2)
    assert np.isfinite(cent2).all()


def test_ivf_parquet_training_twin_is_byte_identical(spark, sf_dir):
    """The oracle-generation path (train_ivf_centroids_parquet, pyarrow,
    no Spark) must produce BYTE-identical centroids to the Spark training
    path on the same corpus — this equality is what lets q_ann_ivf inline
    the quantizer into the DuckDB oracle and be hash-checked end to end."""
    import numpy as np

    from varpulis_spark.engine import load_table
    from varpulis_spark.operators.similarity import (
        train_ivf_centroids,
        train_ivf_centroids_parquet,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    cent_spark = train_ivf_centroids(emb, n_clusters=32)
    cent_local = train_ivf_centroids_parquet(
        f"{sf_dir}/embeddings.parquet", n_clusters=32
    )
    assert cent_spark.shape == cent_local.shape
    assert np.array_equal(cent_spark, cent_local)


def test_audio_features_match_numpy(spark):
    """Audio leg of the multimodal family: encode fake PCM -> framed
    RMS/ZCR features via mapInPandas; values verify against a direct numpy
    recomputation, row expansion yields one row per frame."""
    import numpy as np
    import struct as _struct
    from varpulis_spark.operators import multimodal as MM

    docs = spark.createDataFrame(
        [(i, "hello audio world " * (i + 1)) for i in range(4)],
        "doc_id long, text string",
    )
    enc = MM.encode_fake_audio(docs)
    out = MM.audio_features(enc, frame=64, hop=32).orderBy("doc_id", "frame_index")
    rows = out.collect()
    assert {r.doc_id for r in rows} == {0, 1, 2, 3}

    # recompute doc 2 frame 1 directly
    buf = {r[0]: bytes(r[2]) for r in enc.collect()}[2]
    (sr,) = _struct.unpack(">I", buf[3:7])
    x = np.frombuffer(buf[7:], dtype="<i2").astype(np.float64) / 32768.0
    seg = x[32 : 32 + 64]
    want_rms = float(np.sqrt(np.mean(seg * seg)))
    got = next(r for r in rows if r.doc_id == 2 and r.frame_index == 1)
    assert got.sample_rate == sr
    assert abs(got.rms - want_rms) < 1e-12
    # frame count = (n - frame)//hop + 1
    n2 = sum(1 for r in rows if r.doc_id == 2)
    assert n2 == (x.size - 64) // 32 + 1


def test_audio_real_codec_raises(spark):
    from varpulis_spark.operators import multimodal as MM

    docs = spark.createDataFrame([(1, "t")], "doc_id long, text string")
    enc = MM.encode_fake_audio(docs)
    import pytest as _pytest

    with _pytest.raises(NotImplementedError, match="torchaudio"):
        MM.audio_features(enc, codec="wav")


def test_ivf_near_dup_planted_recall(spark):
    """IVF near-dup blocking (similarity.py:ivf_near_dup_pairs): on a
    corpus with PLANTED near-duplicates (jittered copies, cos ≈ 0.99) —
    the regime near-dup mining targets — recall vs the exact O(n²) miner
    is ≥ 0.9. On random low-similarity pairs at threshold 0.4 recall is
    the documented IVF tradeoff (~0.8 at sf0.01, driver-oracle-checked)."""
    import numpy as np

    from varpulis_spark.operators.similarity import (
        cosine_pairs,
        ivf_near_dup_pairs,
    )

    rng = np.random.RandomState(7)
    base = rng.normal(size=(300, 32))
    dup = base[:80] + 0.02 * rng.normal(size=(80, 32))  # cos ≈ 0.999
    m = np.vstack([base, dup])
    rows = [(int(i), [float(x) for x in m[i]]) for i in range(len(m))]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")

    exact = {(r.id_a, r.id_b) for r in cosine_pairs(emb, 0.9).collect()}
    got = {
        (r.id_a, r.id_b)
        for r in ivf_near_dup_pairs(emb, 0.9, n_clusters=16).collect()
    }
    assert len(exact) >= 70  # the plant worked
    assert got <= exact  # blocking only ever DROPS pairs, never invents
    assert len(got & exact) / len(exact) >= 0.9
    # deterministic end-to-end (seeded training + stable tie-breaks)
    again = {
        (r.id_a, r.id_b)
        for r in ivf_near_dup_pairs(emb, 0.9, n_clusters=16).collect()
    }
    assert got == again
    # max_cluster hard-caps hot clusters: one survivor per cluster → no pairs
    assert ivf_near_dup_pairs(emb, 0.9, n_clusters=16, max_cluster=1).count() == 0


def test_ivf_t85_recovers_derived_corpus_plants(spark, tmp_path):
    """End-to-end pin for the decade-scale measurement regime
    (`ivf_near_dup_t85`): derive a corpus with scripts/make_sf.py (random
    orthogonal rotations + the ~1% planted near-dup slices) and run the
    IVF miner at threshold 0.85 — the output must be essentially the
    planted population: every planted (source, copy) link is recoverable
    (IVF recall >= 0.9 on cos ~ 0.99 pairs) and nothing beyond the
    planted/exact set appears (at 0.85 the isotropic cross-copy tail is
    negligible, unlike the operators' 0.4 oracle threshold — see
    PERF_NOTES r13)."""
    import os
    import sys

    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    sys.path.insert(
        0,
        os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "scripts",
        ),
    )
    import make_sf

    from varpulis_spark.operators.similarity import (
        cosine_pairs,
        ivf_near_dup_pairs,
    )

    rng = np.random.default_rng(11)
    n, d = 400, 32
    vecs = rng.standard_normal((n, d)).astype(np.float32)
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    src = tmp_path / "sfA"
    src.mkdir()
    pq.write_table(
        pa.table({
            "vec_id": pa.array(np.arange(n), type=pa.int64()),
            "embedding": pa.array(vecs.tolist(), type=pa.list_(pa.float32())),
            "label": pa.array(np.arange(n) % 10, type=pa.int32()),
        }),
        str(src / "embeddings.parquet"),
    )
    dst = tmp_path / "sfB"
    dst.mkdir()
    make_sf._target(str(src), str(dst))
    make_sf.make_embeddings()

    emb = spark.read.parquet(str(dst / "embeddings.parquet"))
    planted = {
        (i, k * n + i)
        for k, (lo, hi) in make_sf.planted_slices(n).items()
        for i in range(lo, hi)
    }
    assert planted
    exact = {(r.id_a, r.id_b) for r in cosine_pairs(emb, 0.85).collect()}
    # the 0.85 population IS the planted class (plants sit at cos ~ 0.99;
    # distinct composite rotations are isotropically unrelated)
    assert planted <= exact
    assert len(exact) <= len(planted) + 3  # tail slack, ~0 expected
    got = {(r.id_a, r.id_b) for r in ivf_near_dup_pairs(emb, 0.85).collect()}
    assert got <= exact
    assert len(got & planted) / len(planted) >= 0.9
