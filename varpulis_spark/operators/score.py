"""`.score(model: "x.onnx", inputs: [...], outputs: [...])` — per-event
model inference appended as columns.

Reference: ScoreConfig engine/types.rs:266-271; runtime/src/scoring.rs (ONNX
via ort). Spark lowering: an Arrow-batched pandas iterator (mapInPandas) so
the model is loaded ONCE per executor python worker and scored per batch —
the `predict_batch_udf` shape, never per-row dispatch.

Model resolution: `linear:<w0,w1,...,b>` is a deterministic inline model;
`.onnx` paths run through onnxruntime when installed, else through the
pure-numpy mini runtime (operators/onnx_mini.py — protobuf decode + dense
MLP ops), so real model artifacts score in both environments.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame


def _load_model(model: str):
    if model.startswith("linear:"):
        parts = [float(x) for x in model[len("linear:"):].split(",")]
        w, b = np.array(parts[:-1]), parts[-1]

        def predict(x: np.ndarray) -> np.ndarray:
            return x @ w + b

        return predict
    try:
        import onnxruntime  # noqa: F401
    except ImportError:
        # pure-numpy fallback: real .onnx files still run for the dense-op
        # subset (operators/onnx_mini.py); unsupported ops raise
        # NotImplementedError naming the op
        from varpulis_spark.operators.onnx_mini import load_model

        mini = load_model(model)
        in_name = mini.graph_inputs[0] if mini.graph_inputs else "x"

        def predict(x: np.ndarray) -> np.ndarray:
            return np.asarray(mini.run({in_name: x})[0]).reshape(len(x))

        return predict
    sess = onnxruntime.InferenceSession(model)

    def predict(x: np.ndarray) -> np.ndarray:
        input_name = sess.get_inputs()[0].name
        return sess.run(None, {input_name: x.astype(np.float32)})[0].reshape(len(x))

    return predict


def score(
    df: DataFrame,
    model: str,
    inputs: list[str],
    output: str = "score",
) -> DataFrame:
    """Append `output` = model(inputs...) per row, batch-inferred."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        predict = _load_model(model)  # once per worker
        for pdf in batches:
            x = pdf[inputs].to_numpy(dtype=np.float64)
            pdf = pdf.copy()
            pdf[output] = predict(x)
            yield pdf

    out_schema = ", ".join(f"{n} {t}" for n, t in df.dtypes) + f", {output} double"
    return df.mapInPandas(run, out_schema)
