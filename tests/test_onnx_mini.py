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
    nodes = [M._node("Conv", ["x"], ["y"])]
    graph = b"".join(M._ld(1, n) for n in nodes)
    graph += M._ld(11, M._value_info("x"))
    graph += M._ld(12, M._value_info("y"))
    data = M._ld(7, graph)
    with pytest.raises(NotImplementedError, match="Conv"):
        M.load_model(data).run({"x": np.zeros((1, 2))})


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
