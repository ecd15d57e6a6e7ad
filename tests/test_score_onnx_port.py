"""Port of the reference's `.score()` ONNX battery
(crates/varpulis-runtime/tests/score_onnx_tests.rs) — against the
reference's OWN model fixture (tests/fixtures/fraud_scorer.onnx, a
scikit-learn logistic regression exported via skl2onnx: Gemm → Sigmoid,
coefficients [0.0189, 0.4091, 0.1198], intercept -8.7583). The reference
needs a real ONNX Runtime behind a feature flag; here the pure-numpy
mini-runtime (operators/onnx_mini.py) decodes and executes the same
protobuf directly — same analytic expectations (normal tx → ~0.003,
suspicious tx → ~1.0)."""

import pytest

from varpulis_spark.sources.event_file import load_evt
from varpulis_spark.stream import Stream
from varpulis_spark.vpl.compiler import run_program

MODEL = "/root/reference/crates/varpulis-runtime/tests/fixtures/fraud_scorer.onnx"


@pytest.fixture(scope="module")
def spark():
    from varpulis_spark.engine import get_spark

    return get_spark("score-onnx-port")


EVT = (
    "TradeEvent { amount: 50.0, velocity: 2.0, distance: 10.0 }\n"
    "@100 TradeEvent { amount: 5000.0, velocity: 20.0, distance: 800.0 }\n"
)


def run(spark, src, evt=EVT, name=None):
    res = run_program(src, Stream(load_evt(spark, evt), ts_col="ts",
                                  order_col="event_id"))
    if name is None:
        (name,) = res
    return [r.asDict() for r in res[name].collect()]


def test_score_enriches_event_with_fraud_probability(spark):
    rows = run(spark, f'''
stream ScoredTrades = TradeEvent
    .score(model: "{MODEL}", inputs: [amount, velocity, distance], outputs: [fraud_prob])
    .emit(amount: amount, fraud_prob: fraud_prob)
''')
    assert len(rows) == 2
    by_amount = {r["amount"]: r["fraud_prob"] for r in rows}
    assert by_amount[50.0] < 0.1, "normal tx fraud_prob should be low"
    assert by_amount[5000.0] > 0.9, "suspicious tx fraud_prob should be high"


def test_score_followed_by_where_filter(spark):
    rows = run(spark, f'''
stream FraudAlerts = TradeEvent
    .score(model: "{MODEL}", inputs: [amount, velocity, distance], outputs: [fraud_prob])
    .where(fraud_prob > 0.5)
    .emit(alert_type: "fraud", amount: amount, fraud_prob: fraud_prob)
''')
    assert len(rows) == 1
    assert rows[0]["amount"] == 5000.0 and rows[0]["alert_type"] == "fraud"


def test_score_with_where_before_score(spark):
    """rs:154-189: a pre-score filter drops events before inference."""
    rows = run(spark, f'''
stream BigTrades = TradeEvent
    .where(amount > 1000.0)
    .score(model: "{MODEL}", inputs: [amount, velocity, distance], outputs: [fraud_prob])
    .emit(amount: amount, fraud_prob: fraud_prob)
''')
    assert len(rows) == 1 and rows[0]["amount"] == 5000.0


def test_score_with_integer_inputs(spark):
    """rs:192-219: integer-typed input fields coerce to the model's float
    tensor."""
    rows = run(spark, f'''
stream Scored = TradeEvent
    .score(model: "{MODEL}", inputs: [amount, velocity, distance], outputs: [fraud_prob])
    .emit(fraud_prob: fraud_prob)
''', evt="TradeEvent { amount: 50, velocity: 2, distance: 10 }\n")
    assert len(rows) == 1
    assert rows[0]["fraud_prob"] == pytest.approx(0.0030239446, rel=1e-6)


def test_score_analytic_probability_matches_reference_coefficients(spark):
    """The exported logistic regression is analytic: sigmoid(w·x + b) with
    w=[0.0189, 0.4091, 0.1198], b=-8.7583 — the mini-runtime must
    reproduce it through the real protobuf weights."""
    import math

    rows = run(spark, f'''
stream Scored = TradeEvent
    .score(model: "{MODEL}", inputs: [amount, velocity, distance], outputs: [fraud_prob])
    .emit(amount: amount, fraud_prob: fraud_prob)
''')
    by_amount = {r["amount"]: r["fraud_prob"] for r in rows}
    z = 0.0189 * 50.0 + 0.4091 * 2.0 + 0.1198 * 10.0 - 8.7583
    expected = 1.0 / (1.0 + math.exp(-z))
    # f32 weights in the protobuf vs the docstring's rounded coefficients
    assert by_amount[50.0] == pytest.approx(expected, rel=5e-3)
