"""Pure-numpy mini ONNX runtime: wire-format round-trip, op parity with
hand-computed numpy, Spark score() integration over a real .onnx file
(the reference scores through ort, runtime/src/scoring.rs:10-97; this is
the no-onnxruntime path)."""

import numpy as np
import pytest

from varpulis_spark.operators import onnx_mini as M
from varpulis_spark.operators.score import score


RNG = np.random.default_rng(42)


def mlp_reference(x, w1, b1, w2, b2):
    h = np.maximum(x @ w1 + b1, 0.0)
    o = h @ w2 + b2
    return 1.0 / (1.0 + np.exp(-o))


def test_mlp_round_trip_matches_numpy():
    w1 = RNG.normal(size=(4, 8)).astype(np.float32)
    b1 = RNG.normal(size=(8,)).astype(np.float32)
    w2 = RNG.normal(size=(8, 1)).astype(np.float32)
    b2 = RNG.normal(size=(1,)).astype(np.float32)
    data = M.make_mlp_onnx(w1, b1, w2, b2)
    model = M.load_model(data)
    assert model.graph_inputs == ["x"] and model.graph_outputs == ["y"]
    x = RNG.normal(size=(16, 4))
    got = model.run({"x": x})[0]
    want = mlp_reference(x, w1.astype(np.float64), b1.astype(np.float64),
                         w2.astype(np.float64), b2.astype(np.float64))
    np.testing.assert_allclose(got, want, rtol=1e-12)


def test_tanh_softmax_variant():
    w1 = RNG.normal(size=(3, 5)).astype(np.float32)
    b1 = np.zeros(5, np.float32)
    w2 = RNG.normal(size=(5, 4)).astype(np.float32)
    b2 = np.zeros(4, np.float32)
    data = M.make_mlp_onnx(w1, b1, w2, b2, activation="Tanh",
                           out_activation="Softmax")
    x = RNG.normal(size=(7, 3))
    got = M.load_model(data).run({"x": x})[0]
    h = np.tanh(x @ w1.astype(np.float64) + b1)
    o = h @ w2.astype(np.float64) + b2
    e = np.exp(o - o.max(axis=-1, keepdims=True))
    np.testing.assert_allclose(got, e / e.sum(axis=-1, keepdims=True),
                               rtol=1e-12)
    np.testing.assert_allclose(got.sum(axis=1), np.ones(7), rtol=1e-12)


def test_gemm_with_attributes():
    """Gemm with transB + alpha/beta attributes (AttributeProto parse)."""
    w = RNG.normal(size=(3, 4)).astype(np.float32)  # stored transposed
    b = RNG.normal(size=(3,)).astype(np.float32)
    nodes = [M._node("Gemm", ["x", "w", "b"], ["y"],
                     attrs={"transB": 1, "alpha": 2.0, "beta": 0.5})]
    graph = b"".join(M._ld(1, n) for n in nodes)
    graph += M._ld(5, M._tensor("w", w))
    graph += M._ld(5, M._tensor("b", b))
    graph += M._ld(11, M._value_info("x"))
    graph += M._ld(12, M._value_info("y"))
    data = M._field(1, 0, M._varint(8)) + M._ld(7, graph)
    x = RNG.normal(size=(6, 4))
    got = M.load_model(data).run({"x": x})[0]
    want = 2.0 * (x @ w.astype(np.float64).T) + 0.5 * b.astype(np.float64)
    np.testing.assert_allclose(got, want, rtol=1e-12)


def test_unsupported_op_raises():
    nodes = [M._node("GRU", ["x"], ["y"])]  # recurrent op outside the subset
    graph = b"".join(M._ld(1, n) for n in nodes)
    graph += M._ld(11, M._value_info("x"))
    graph += M._ld(12, M._value_info("y"))
    data = M._ld(7, graph)
    with pytest.raises(NotImplementedError, match="GRU"):
        M.load_model(data).run({"x": np.zeros((1, 2))})


# -- r5 conv/pool/recurrent subset (naive-loop references) -------------------


def conv_reference(X, W, B, strides=(1, 1), pads=(0, 0, 0, 0)):
    """Direct quadruple-loop conv for verification."""
    N, C, H, Wd = X.shape
    Mo, _, kH, kW = W.shape
    sh, sw = strides
    pt, pl, pb, pr = pads
    Xp = np.pad(X, ((0, 0), (0, 0), (pt, pb), (pl, pr)))
    Ho = (Xp.shape[2] - kH) // sh + 1
    Wo = (Xp.shape[3] - kW) // sw + 1
    out = np.zeros((N, Mo, Ho, Wo))
    for n in range(N):
        for m in range(Mo):
            for i in range(Ho):
                for j in range(Wo):
                    patch = Xp[n, :, i * sh:i * sh + kH, j * sw:j * sw + kW]
                    out[n, m, i, j] = (patch * W[m]).sum() + B[m]
    return out


def test_conv2d_matches_naive_loop():
    X = RNG.normal(size=(2, 3, 8, 9))
    W = RNG.normal(size=(4, 3, 3, 3))
    B = RNG.normal(size=(4,))
    got = M._conv2d(X, W, B, strides=[2, 1], pads=[1, 0, 1, 0],
                    dilations=[1, 1], group=1)
    want = conv_reference(X, W, B, strides=(2, 1), pads=(1, 0, 1, 0))
    np.testing.assert_allclose(got, want, rtol=1e-12)


def test_grouped_conv_matches_per_group():
    X = RNG.normal(size=(1, 4, 6, 6))
    W = RNG.normal(size=(4, 2, 3, 3))  # group=2: 2 out-channels per group
    B = np.zeros(4)
    got = M._conv2d(X, W, B, [1, 1], [0, 0, 0, 0], [1, 1], group=2)
    for g in range(2):
        want = conv_reference(X[:, g * 2:(g + 1) * 2], W[g * 2:(g + 1) * 2],
                              B[g * 2:(g + 1) * 2])
        np.testing.assert_allclose(got[:, g * 2:(g + 1) * 2], want, rtol=1e-12)


def test_pools_and_batchnorm():
    X = RNG.normal(size=(2, 3, 6, 6))
    mx = M._pool2d(X, [2, 2], [2, 2], [0, 0, 0, 0], "max", False)
    assert mx.shape == (2, 3, 3, 3)
    np.testing.assert_allclose(mx[0, 0, 0, 0], X[0, 0, :2, :2].max())
    av = M._pool2d(X, [3, 3], [1, 1], [1, 1, 1, 1], "avg", False)
    # corner window overlaps the input in only 4 cells → mean of those 4
    np.testing.assert_allclose(av[0, 0, 0, 0], X[0, 0, :2, :2].mean())

    scale = RNG.normal(size=3)
    bias = RNG.normal(size=3)
    mean = RNG.normal(size=3)
    var = RNG.uniform(0.5, 2.0, size=3)
    nodes = [M._node("BatchNormalization", ["x", "s", "b", "m", "v"], ["y"],
                     {"epsilon": 1e-5})]
    inits = {"s": scale, "b": bias, "m": mean, "v": var}
    model = M.MiniOnnxModel(M._graph_to_model(nodes, inits, b"bn", ["x"], ["y"]))
    got = model.run({"x": X})[0]
    want = (X - mean.reshape(1, 3, 1, 1)) / np.sqrt(
        var.reshape(1, 3, 1, 1) + 1e-5
    ) * scale.reshape(1, 3, 1, 1) + bias.reshape(1, 3, 1, 1)
    # initializers round-trip through the writer at f32 precision
    np.testing.assert_allclose(got, want, rtol=1e-4)


def test_conv_net_end_to_end():
    """Conv → Relu → MaxPool → Flatten → Gemm → Sigmoid through the full
    protobuf round trip, vs a numpy recomputation."""
    cw = RNG.normal(size=(2, 1, 3, 3)).astype(np.float32)
    cb = RNG.normal(size=(2,)).astype(np.float32)
    # input 1×1×8×8 → conv 2×6×6 → pool 2×3×3 → flatten 18
    fw = RNG.normal(size=(1, 18)).astype(np.float32)
    fb = RNG.normal(size=(1,)).astype(np.float32)
    model = M.MiniOnnxModel(M.make_conv_onnx(cw, cb, fw, fb))
    X = RNG.normal(size=(3, 1, 8, 8))
    got = model.run({"x": X})[0]

    c = conv_reference(X, cw.astype(np.float64), cb.astype(np.float64))
    c = np.maximum(c, 0)
    p = M._pool2d(c, [2, 2], [2, 2], [0, 0, 0, 0], "max", False)
    f = p.reshape(3, -1)
    want = 1 / (1 + np.exp(-(f @ fw.astype(np.float64).T
                             + fb.astype(np.float64))))
    np.testing.assert_allclose(got, want, rtol=1e-6)


def lstm_reference(X, W, R, B, H):
    """Step-by-step scalar-ish LSTM (ONNX gate order i,o,f,c)."""
    def sig(v):
        return 1 / (1 + np.exp(-v))

    h = np.zeros((X.shape[1], H))
    c = np.zeros((X.shape[1], H))
    Wb, Rb = B[0][:4 * H], B[0][4 * H:]
    for t in range(X.shape[0]):
        g = X[t] @ W[0].T + h @ R[0].T + Wb + Rb
        i, o, f, cc = (g[:, k * H:(k + 1) * H] for k in range(4))
        c = sig(f) * c + sig(i) * np.tanh(cc)
        h = sig(o) * np.tanh(c)
    return h


def test_lstm_end_to_end():
    H, inp, seq, batch = 5, 3, 7, 4
    W = RNG.normal(size=(1, 4 * H, inp)).astype(np.float32)
    R = RNG.normal(size=(1, 4 * H, H)).astype(np.float32)
    B = RNG.normal(size=(1, 8 * H)).astype(np.float32)
    model = M.MiniOnnxModel(M.make_lstm_onnx(W, R, B, hidden=H))
    X = RNG.normal(size=(seq, batch, inp))
    got = model.run({"x": X})[0]
    want = lstm_reference(X, W.astype(np.float64), R.astype(np.float64),
                          B.astype(np.float64), H)
    assert got.shape == (batch, H)
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_reshape_transpose_concat_reduce():
    nodes = [
        M._node("Transpose", ["x"], ["t"], {"perm": [1, 0]}),
        M._node("Concat", ["t", "t"], ["cc"], {"axis": 1}),
        M._node("ReduceMean", ["cc"], ["y"], {"axes": [1], "keepdims": 0}),
    ]
    model = M.MiniOnnxModel(M._graph_to_model(nodes, {}, b"g", ["x"], ["y"]))
    X = RNG.normal(size=(2, 3))
    got = model.run({"x": X})[0]
    np.testing.assert_allclose(got, X.T.mean(axis=1), rtol=1e-12)


def test_not_onnx_raises():
    with pytest.raises(ValueError, match="ModelProto"):
        M.MiniOnnxModel(M._field(1, 0, M._varint(8)))


def test_score_runs_real_onnx_file(spark, tmp_path):
    """score() over a written .onnx artifact: loaded once per worker,
    batch-inferred via mapInPandas, matches driver-side numpy."""
    w1 = RNG.normal(size=(2, 6)).astype(np.float32)
    b1 = RNG.normal(size=(6,)).astype(np.float32)
    w2 = RNG.normal(size=(6, 1)).astype(np.float32)
    b2 = RNG.normal(size=(1,)).astype(np.float32)
    path = str(tmp_path / "risk.onnx")
    with open(path, "wb") as f:
        f.write(M.make_mlp_onnx(w1, b1, w2, b2))

    df = spark.createDataFrame(
        [(float(i), float(i * 2 % 7)) for i in range(50)], "f1 double, f2 double"
    )
    out = score(df, path, inputs=["f1", "f2"], output="risk").orderBy("f1")
    got = np.array([r.risk for r in out.collect()])
    x = np.array([(float(i), float(i * 2 % 7)) for i in range(50)])
    want = mlp_reference(x, w1.astype(np.float64), b1.astype(np.float64),
                         w2.astype(np.float64), b2.astype(np.float64)).reshape(-1)
    np.testing.assert_allclose(got, want, rtol=1e-9)


def attention_reference(x, wq, wk, wv, ln_s, ln_b, eps=1e-5):
    """Naive-loop single-head self-attention + residual + LayerNorm."""
    out = np.empty_like(x)
    d = wq.shape[0]
    for b in range(x.shape[0]):
        q, k, v = x[b] @ wq, x[b] @ wk, x[b] @ wv
        s = q @ k.T / np.sqrt(float(d))
        e = np.exp(s - s.max(axis=-1, keepdims=True))
        a = e / e.sum(axis=-1, keepdims=True)
        res = x[b] + a @ v
        mu = res.mean(axis=-1, keepdims=True)
        var = ((res - mu) ** 2).mean(axis=-1, keepdims=True)
        out[b] = (res - mu) / np.sqrt(var + eps) * ln_s + ln_b
    return out


def test_attention_block_matches_naive_loop():
    """MatMul/Transpose/Softmax/LayerNormalization compose into a real
    transformer-encoder attention block (VERDICT r5 task 7)."""
    d, seq, batch = 8, 5, 3
    wq = RNG.normal(size=(d, d)).astype(np.float32)
    wk = RNG.normal(size=(d, d)).astype(np.float32)
    wv = RNG.normal(size=(d, d)).astype(np.float32)
    ln_s = RNG.normal(size=(d,)).astype(np.float32)
    ln_b = RNG.normal(size=(d,)).astype(np.float32)
    model = M.MiniOnnxModel(M.make_attention_onnx(wq, wk, wv, ln_s, ln_b))
    x = RNG.normal(size=(batch, seq, d))
    got = model.run({"x": x})[0]
    want = attention_reference(
        x, wq.astype(np.float64), wk.astype(np.float64),
        wv.astype(np.float64), ln_s.astype(np.float64),
        ln_b.astype(np.float64),
    )
    # f32 weight storage bounds agreement at ~1e-6 relative
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-7)


def test_layernorm_default_scale_axis():
    """LayerNormalization without scale/bias inputs and a non-default axis
    normalizes over [axis..rank)."""
    nodes = [M._node("LayerNormalization", ["x"], ["y"], {"axis": 1})]
    model = M.MiniOnnxModel(M._graph_to_model(nodes, {}, b"ln", ["x"], ["y"]))
    x = RNG.normal(size=(2, 3, 4))
    got = model.run({"x": x})[0]
    mu = x.reshape(2, -1).mean(axis=1).reshape(2, 1, 1)
    var = ((x - mu) ** 2).reshape(2, -1).mean(axis=1).reshape(2, 1, 1)
    np.testing.assert_allclose(got, (x - mu) / np.sqrt(var + 1e-5), rtol=1e-12)


def test_lstm_optional_inputs_bind_positionally():
    """ADVICE r5: an LSTM omitting B/sequence_lens via EMPTY input names but
    supplying initial_h/initial_c must still bind h0/c0 (a compacted input
    list silently dropped them)."""
    hid, inp, seq, batch = 4, 3, 5, 2
    W = RNG.normal(size=(1, 4 * hid, inp)).astype(np.float32)
    R = RNG.normal(size=(1, 4 * hid, hid)).astype(np.float32)
    h0 = RNG.normal(size=(1, batch, hid)).astype(np.float32)
    c0 = RNG.normal(size=(1, batch, hid)).astype(np.float32)
    nodes = [
        M._node("LSTM", ["x", "W", "R", "", "", "h0", "c0"],
                ["Y", "Y_h", "Y_c"], {"hidden_size": hid}),
        M._node("Squeeze", ["Y_h"], ["y"], {"axes": [0]}),
    ]
    model = M.MiniOnnxModel(M._graph_to_model(
        nodes, {"W": W, "R": R, "h0": h0, "c0": c0}, b"lstm_hc", ["x"], ["y"]
    ))
    x = RNG.normal(size=(seq, batch, inp))
    got = model.run({"x": x})[0]
    want = M._lstm(
        x, W.astype(np.float64), R.astype(np.float64),
        h0=h0.astype(np.float64), c0=c0.astype(np.float64), hidden=hid,
    )[1][0]
    np.testing.assert_allclose(got, want, rtol=1e-6)
    # and it must NOT equal the zero-state result (the r5 bug's output)
    zero = M._lstm(x, W.astype(np.float64), R.astype(np.float64), hidden=hid)[1][0]
    assert not np.allclose(got, zero)


def test_erf_gelu_reducesum():
    """Transformer-FFN ops: exact Gelu = 0.5x(1+erf(x/sqrt 2)); tanh
    approximation within its published ~1e-3 band; ReduceSum with axes."""
    import math

    x = np.linspace(-4, 4, 33)
    nodes = [M._node("Gelu", ["x"], ["y"])]
    model = M.MiniOnnxModel(M._graph_to_model(nodes, {}, b"g", ["x"], ["y"]))
    got = model.run({"x": x})[0]
    want = np.array([0.5 * v * (1 + math.erf(v / math.sqrt(2))) for v in x])
    np.testing.assert_allclose(got.astype(np.float64), want, rtol=1e-12)

    nodes = [M._node("Gelu", ["x"], ["y"], {"approximate": "tanh"})]
    model = M.MiniOnnxModel(M._graph_to_model(nodes, {}, b"gt", ["x"], ["y"]))
    got_t = model.run({"x": x})[0]
    np.testing.assert_allclose(got_t, want, atol=2e-3)

    nodes = [M._node("Erf", ["x"], ["y"])]
    model = M.MiniOnnxModel(M._graph_to_model(nodes, {}, b"e", ["x"], ["y"]))
    np.testing.assert_allclose(
        model.run({"x": x})[0].astype(np.float64),
        np.array([math.erf(v) for v in x]), rtol=1e-12)

    X = RNG.normal(size=(2, 3, 4))
    nodes = [M._node("ReduceSum", ["x"], ["y"], {"axes": [1], "keepdims": 0})]
    model = M.MiniOnnxModel(M._graph_to_model(nodes, {}, b"rs", ["x"], ["y"]))
    np.testing.assert_allclose(model.run({"x": X})[0], X.sum(axis=1), rtol=1e-12)


def test_transformer_ffn_block():
    """Attention + Gelu-FFN + residual LayerNorm — the full encoder layer
    shape runs through the mini-runtime."""
    d, ff, seq = 4, 8, 3
    w1 = RNG.normal(size=(d, ff)).astype(np.float32)
    w2 = RNG.normal(size=(ff, d)).astype(np.float32)
    ln_s = np.ones(d, dtype=np.float32)
    ln_b = np.zeros(d, dtype=np.float32)
    nodes = [
        M._node("MatMul", ["x", "w1"], ["h0"]),
        M._node("Gelu", ["h0"], ["h1"]),
        M._node("MatMul", ["h1", "w2"], ["h2"]),
        M._node("Add", ["x", "h2"], ["res"]),
        M._node("LayerNormalization", ["res", "ln_s", "ln_b"], ["y"], {"axis": -1}),
    ]
    model = M.MiniOnnxModel(M._graph_to_model(
        nodes, {"w1": w1, "w2": w2, "ln_s": ln_s, "ln_b": ln_b},
        b"ffn", ["x"], ["y"]))
    x = RNG.normal(size=(2, seq, d))
    got = model.run({"x": x})[0]
    import math
    h = x @ w1.astype(np.float64)
    h = 0.5 * h * (1 + np.vectorize(math.erf)(h / math.sqrt(2)))
    res = x + h @ w2.astype(np.float64)
    mu = res.mean(axis=-1, keepdims=True)
    var = ((res - mu) ** 2).mean(axis=-1, keepdims=True)
    want = (res - mu) / np.sqrt(var + 1e-5)
    np.testing.assert_allclose(got.astype(np.float64), want, rtol=1e-5, atol=1e-7)


def test_gather_slice_split_where_expand():
    """Indexing/masking family: each op vs direct numpy."""
    X = RNG.normal(size=(4, 6))

    nodes = [M._node("Gather", ["x", "idx"], ["y"], {"axis": 1})]
    model = M.MiniOnnxModel(M._graph_to_model(
        nodes, {"idx": np.array([0, 2, 5], dtype=np.int64)}, b"g", ["x"], ["y"]))
    np.testing.assert_allclose(model.run({"x": X})[0], X[:, [0, 2, 5]])

    nodes = [M._node("Slice", ["x", "st", "en", "ax", "sp"], ["y"])]
    model = M.MiniOnnxModel(M._graph_to_model(
        nodes,
        {"st": np.array([1]), "en": np.array([5]), "ax": np.array([1]),
         "sp": np.array([2])},
        b"s", ["x"], ["y"]))
    np.testing.assert_allclose(model.run({"x": X})[0], X[:, 1:5:2])

    # QKV-style split: one (4, 6) tensor → three (4, 2) heads
    nodes = [M._node("Split", ["x"], ["q", "k", "v"], {"axis": 1, "num_outputs": 3}),
             M._node("Concat", ["v", "q"], ["y"], {"axis": 1})]
    model = M.MiniOnnxModel(M._graph_to_model(nodes, {}, b"sp", ["x"], ["y"]))
    got = model.run({"x": X})[0]
    np.testing.assert_allclose(got, np.concatenate([X[:, 4:6], X[:, 0:2]], axis=1))

    nodes = [M._node("Greater", ["x", "zero"], ["m"]),
             M._node("Where", ["m", "x", "neg"], ["y"])]
    model = M.MiniOnnxModel(M._graph_to_model(
        nodes, {"zero": np.zeros(1, dtype=np.float32),
                "neg": np.full(1, -1.0, dtype=np.float32)}, b"w", ["x"], ["y"]))
    np.testing.assert_allclose(model.run({"x": X})[0], np.where(X > 0, X, -1.0))

    nodes = [M._node("Expand", ["x", "shape"], ["y"])]
    model = M.MiniOnnxModel(M._graph_to_model(
        nodes, {"shape": np.array([3, 4, 6], dtype=np.int64)}, b"e", ["x"], ["y"]))
    np.testing.assert_allclose(model.run({"x": X})[0], np.broadcast_to(X, (3, 4, 6)))


def test_multihead_attention_matches_naive_loop():
    """2-head attention via Split/per-head softmax-attention/Concat — the
    real exported-transformer path through the op set."""
    d, seq, batch, heads = 8, 5, 3, 2
    dh = d // heads
    wq = RNG.normal(size=(d, d)).astype(np.float32)
    wk = RNG.normal(size=(d, d)).astype(np.float32)
    wv = RNG.normal(size=(d, d)).astype(np.float32)
    wo = RNG.normal(size=(d, d)).astype(np.float32)
    model = M.MiniOnnxModel(M.make_multihead_attention_onnx(wq, wk, wv, wo, heads))
    x = RNG.normal(size=(batch, seq, d))
    got = model.run({"x": x})[0]

    q, k, v = x @ wq.astype(np.float64), x @ wk.astype(np.float64), x @ wv.astype(np.float64)
    ctxs = []
    for h in range(heads):
        qs, ks, vs = (t[..., h * dh:(h + 1) * dh] for t in (q, k, v))
        out_b = []
        for b in range(batch):
            s = qs[b] @ ks[b].T / np.sqrt(float(dh))
            e = np.exp(s - s.max(axis=-1, keepdims=True))
            a = e / e.sum(axis=-1, keepdims=True)
            out_b.append(a @ vs[b])
        ctxs.append(np.stack(out_b))
    want = np.concatenate(ctxs, axis=-1) @ wo.astype(np.float64)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-7)


def test_score_sequence_attention_model(spark, tmp_path):
    """score_sequence: per-user last-n event windows scored by a REAL
    multi-head-attention .onnx through the Spark pipeline; values match a
    driver-side numpy rerun of the same model."""
    from varpulis_spark.operators.score import _load_seq_model, score_sequence

    d = 4
    wq = RNG.normal(size=(d, d)).astype(np.float32)
    wk = RNG.normal(size=(d, d)).astype(np.float32)
    wv = RNG.normal(size=(d, d)).astype(np.float32)
    wo = RNG.normal(size=(d, d)).astype(np.float32)
    path = str(tmp_path / "mha.onnx")
    with open(path, "wb") as f:
        f.write(M.make_multihead_attention_onnx(wq, wk, wv, wo, n_heads=2))

    import datetime as dt
    t0 = dt.datetime(2024, 1, 1)
    rows = []
    for u in range(6):
        for i in range(10):
            rows.append((u, t0 + dt.timedelta(seconds=i), i,
                         float(u + i), float(i % 3), float(u), float(i)))
    df = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_id long, f1 double, f2 double, f3 double, f4 double"
    )
    out = score_sequence(
        df, path, inputs=["f1", "f2", "f3", "f4"], keys=["user_id"],
        ts_col="ts", order_col="event_id", last_n=8,
    ).orderBy("user_id")
    got = [(r.user_id, r.n_events, round(r.seq_score, 9)) for r in out.collect()]

    predict = _load_seq_model(path)
    want = []
    for u in range(6):
        feats = np.array([[float(u + i), float(i % 3), float(u), float(i)]
                          for i in range(10)])[-8:]
        want.append((u, 8, round(predict(feats[None]), 9)))
    assert got == want
