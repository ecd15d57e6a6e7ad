"""Port of the reference's VPL forecast-surface battery
(crates/varpulis-runtime/tests/pst_forecast_tests.rs): `.forecast()` on
sequence streams end-to-end — parameter surface (confidence/warmup/
hawkes/conformal/none), warmup suppression, the non-sequence load error,
negation compatibility, SASE backward compatibility, and the conformal
interval field invariants (lower ≤ probability ≤ upper)."""

import pytest

from varpulis_spark.sources.event_file import load_evt
from varpulis_spark.stream import Stream
from varpulis_spark.vpl.compiler import run_program


@pytest.fixture(scope="module")
def spark():
    from varpulis_spark.engine import get_spark

    return get_spark("pst-forecast-port")


def pairs_evt(a="Event1", b="Event2", n=10, step_ms=100, gap_ms=50):
    lines = []
    for i in range(n):
        lines.append(f"@{1000 + i * step_ms} {a} {{ x: {i} }}")
        lines.append(f"@{1000 + gap_ms + i * step_ms} {b} {{ x: {i} }}")
    return "\n".join(lines) + "\n"


def run(spark, src, evt, name):
    res = run_program(src, Stream(load_evt(spark, evt), ts_col="ts",
                                  order_col="event_id"))
    return [r.asDict() for r in res[name].collect()]


def test_forecast_processes_events(spark):
    """rs:99-140: warmup=2, confidence=0 over 10 A→B pairs produces
    forecast output."""
    rows = run(spark, """
stream ForecastStream = Event1 as e1
    -> Event2 as e2
    .within(10s)
    .forecast(confidence: 0.0, warmup: 2)
    .emit(status: "forecasted")
""", pairs_evt(), "ForecastStream")
    assert rows, "forecast pipeline should produce output"


def test_forecast_confidence_threshold_filters(spark):
    """rs:148-190: confidence 0.8 suppresses low-probability forecasts —
    every emitted probability meets the threshold."""
    rows = run(spark, """
stream ForecastStream = Event1 as e1
    -> Event2 as e2
    .within(10s)
    .forecast(confidence: 0.8, warmup: 2)
    .emit(probability: forecast_probability)
""", pairs_evt(), "ForecastStream")
    for r in rows:
        if r["probability"] is not None:
            assert r["probability"] >= 0.8, (
                "the confidence threshold is applied INSIDE the forecast op"
            )


def test_forecast_without_sequence_errors(spark):
    """rs:197-225: `.forecast()` on a non-sequence stream is a load
    error mentioning the sequence requirement."""
    with pytest.raises(Exception, match="sequence|followed-by|pattern"):
        run(spark, """
stream BadForecast = SensorReading
    .where(temperature > 30.0)
    .forecast(confidence: 0.5)
    .emit(status: "forecasted")
""", "SensorReading { temperature: 35.0 }\n", "BadForecast")


def test_forecast_warmup_suppression(spark):
    """rs:228-272: warmup=10000 with 40 events emits NO forecasts."""
    rows = run(spark, """
stream ForecastStream = Event1 as e1
    -> Event2 as e2
    .within(10s)
    .forecast(confidence: 0.0, warmup: 10000)
    .emit(status: "forecasted")
""", pairs_evt(n=20), "ForecastStream")
    assert rows == [], "no forecasts during the warmup period"


def test_forecast_deterministic_pattern(spark):
    """rs:275-334: a perfectly alternating Start→End pattern yields
    probability > 0 after warmup."""
    rows = run(spark, """
stream ForecastStream = Start as s
    -> End as e
    .within(10s)
    .forecast(confidence: 0.0, warmup: 3)
    .emit(prob: forecast_probability)
""", pairs_evt("Start", "End", n=30, step_ms=200, gap_ms=100),
        "ForecastStream")
    assert rows, "deterministic pattern should forecast after warmup"
    assert all(r["prob"] > 0.0 for r in rows if r["prob"] is not None)


def test_forecast_with_negation(spark):
    """rs:337-395: `.not()` + `.forecast()` compile and run together."""
    evt = "\n".join(
        f"@{1000 + i * 200} Order {{ id: {i} }}\n"
        f"@{1100 + i * 200} Payment {{ order_id: {i} }}"
        for i in range(10)
    ) + "\n"
    rows = run(spark, """
stream ForecastNeg = Order as order
    -> Payment where order_id == order.id as payment
    .not(Cancel where order_id == order.id)
    .forecast(confidence: 0.0, warmup: 2)
    .emit(status: "paid_forecast")
""", evt, "ForecastNeg")
    assert rows, "negation + forecast should produce output"


def test_forecast_backward_compat(spark):
    """rs:397-450: adding `.forecast()` must not break SASE match
    detection — the same events still produce output under both forms."""
    evt = pairs_evt("Start", "End", n=10, step_ms=200, gap_ms=100)
    plain = run(spark, """
stream Matches = Start as s
    -> End as e
    .within(10s)
    .emit(status: "matched")
""", evt, "Matches")
    forecasted = run(spark, """
stream Matches = Start as s
    -> End as e
    .within(10s)
    .forecast(confidence: 0.0, warmup: 2)
    .emit(status: "forecasted")
""", evt, "Matches")
    assert plain and forecasted, (
        "adding .forecast() must not break the pipeline"
    )


def test_forecast_no_params_defaults(spark):
    """rs:454-508: bare `.forecast()` loads with balanced defaults (the
    200-pair feed clears the balanced preset's warmup of 100)."""
    rows = run(spark, """
stream F = Start as s
    -> End as e
    .within(10s)
    .forecast()
    .emit(prob: forecast_probability)
""", pairs_evt("Start", "End", n=100, step_ms=200, gap_ms=100), "F")
    assert rows, "bare .forecast() should run with preset defaults"


def test_forecast_conformal_interval_fields(spark):
    """rs:510-578: forecast_lower ≤ forecast_probability ≤ forecast_upper
    and all three live in [0, 1]."""
    rows = run(spark, """
stream F = Event1 as e1
    -> Event2 as e2
    .within(10s)
    .forecast(confidence: 0.0, warmup: 2)
    .emit(p: forecast_probability, lo: forecast_lower, hi: forecast_upper)
""", pairs_evt(n=20), "F")
    assert rows
    for r in rows:
        if r["p"] is None:
            continue
        assert 0.0 <= r["lo"] <= r["p"] <= r["hi"] <= 1.0, r


def test_forecast_hawkes_disabled_vpl(spark):
    rows = run(spark, """
stream F = Event1 as e1
    -> Event2 as e2
    .within(10s)
    .forecast(confidence: 0.0, warmup: 2, hawkes: false)
    .emit(p: forecast_probability)
""", pairs_evt(), "F")
    assert rows


def test_forecast_conformal_disabled_vpl(spark):
    """conformal: false → intervals degenerate to the [0, 1] defaults."""
    rows = run(spark, """
stream F = Event1 as e1
    -> Event2 as e2
    .within(10s)
    .forecast(confidence: 0.0, warmup: 2, conformal: false)
    .emit(lo: forecast_lower, hi: forecast_upper)
""", pairs_evt(), "F")
    assert rows
    assert all(r["lo"] == 0.0 and r["hi"] == 1.0 for r in rows)


def test_forecast_both_disabled_vpl(spark):
    rows = run(spark, """
stream F = Event1 as e1
    -> Event2 as e2
    .within(10s)
    .forecast(confidence: 0.0, warmup: 2, hawkes: false, conformal: false)
    .emit(p: forecast_probability)
""", pairs_evt(), "F")
    assert rows
    assert all(0.0 <= r["p"] <= 1.0 for r in rows if r["p"] is not None)
