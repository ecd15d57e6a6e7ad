"""Port of the reference's PST/PMC convergence battery
(crates/varpulis-runtime/tests/pst_convergence_tests.rs): the forecasting
model is validated against KNOWN ground truth — sequences generated from a
Markov chain with a known transition matrix must drive the learned
transition probabilities and the NFA completion probabilities to the
analytical values. "Produces output without crashing" is not the bar.

Harness mapping: the reference drives PredictionSuffixTree /
PatternMarkovChain directly; ours drives `OnlinePST` and `ForecastEngine`
(operators/forecast.py) — same deterministic Knuth LCG, same matrices,
same tolerances. The reference's configurable smoothing (0.001) maps to
our fixed +1/V smoothing — negligible at these sample sizes. Not ported:
`adaptive_warmup` (a PMCConfig internal; this engine's contract is the
fixed warmup the mode presets set) and batch-vs-online PST training (ours
is online-only by construction).

The VPL mode-preset cases (fast/accurate/zero-config) run end-to-end
through run_program like the reference's engine tests."""

import pytest

from varpulis_spark.operators.forecast import (
    ConformalCalibrator,
    ForecastEngine,
    OnlinePST,
)


class Lcg:
    """Knuth LCG — the reference's deterministic PRNG (rs:34-65)."""

    def __init__(self, seed: int):
        self.state = seed

    def next_f64(self) -> float:
        self.state = (
            self.state * 6_364_136_223_846_793_005 + 1_442_695_040_888_963_407
        ) % (1 << 64)
        return (self.state >> 33) / float(1 << 31)

    def sample_discrete(self, probs) -> int:
        r = self.next_f64()
        c = 0.0
        for i, p in enumerate(probs):
            c += p
            if r < c:
                return i
        return len(probs) - 1


def markov_chain(rng: Lcg, matrix, initial: int, length: int) -> list[int]:
    seq = [initial]
    state = initial
    for _ in range(length - 1):
        state = rng.sample_discrete(matrix[state])
        seq.append(state)
    return seq


# -- 1-2. PST transition convergence (rs:88-195) --------------------------------


def test_pst_two_symbol_convergence():
    matrix = [[0.3, 0.7], [0.6, 0.4]]
    names = ["A", "B"]
    seq = markov_chain(Lcg(42), matrix, 0, 50_000)
    pst = OnlinePST(max_depth=3)
    history: list[str] = []
    for idx in seq:
        pst.update(history, names[idx])
        history.append(names[idx])
        history = history[-3:]
    for frm, row in enumerate(matrix):
        for to, expected in enumerate(row):
            learned = pst.prob([names[frm]], names[to])
            assert abs(learned - expected) < 0.05, (
                f"P({names[to]}|{names[frm]}) ~{expected}, got {learned:.4f}"
            )


def test_pst_four_symbol_convergence():
    matrix = [
        [0.1, 0.6, 0.2, 0.1],
        [0.2, 0.1, 0.5, 0.2],
        [0.3, 0.2, 0.1, 0.4],
        [0.4, 0.3, 0.2, 0.1],
    ]
    names = ["A", "B", "C", "D"]
    seq = markov_chain(Lcg(123), matrix, 0, 100_000)
    pst = OnlinePST(max_depth=3)
    history: list[str] = []
    for idx in seq:
        pst.update(history, names[idx])
        history.append(names[idx])
        history = history[-3:]
    max_err = 0.0
    for frm, row in enumerate(matrix):
        for to, expected in enumerate(row):
            learned = pst.prob([names[frm]], names[to])
            err = abs(learned - expected)
            max_err = max(max_err, err)
            assert err < 0.05, (
                f"P({names[to]}|{names[frm]}) ~{expected}, got {learned:.4f}"
            )
    assert max_err < 0.05


# -- 3-4. completion probability convergence (rs:196-405) -------------------------


def _drive(engine, seq, names, collect):
    """Feed a generated sequence; `collect(et, fired)` harvests."""
    for i, idx in enumerate(seq):
        et = names[idx]
        fired = engine.process(et, i * 1_000_000_000, i)
        if fired is not None:
            collect(et, fired)


def test_pmc_completion_two_step():
    """Pattern A → B over P(B|A)=0.7: the state-1 completion probability
    must converge to ~0.7 (rs:196-290)."""
    matrix = [[0.3, 0.7], [0.6, 0.4]]
    names = ["A", "B"]
    seq = markov_chain(Lcg(42), matrix, 0, 20_000)
    eng = ForecastEngine(
        ["A", "B"], max_depth=3, warmup=200, confidence=0.0,
        hawkes=False, conformal=False, coverage=0.9, max_steps=20,
        span_ns=None,
    )
    probs: list[float] = []

    def collect(et, fired):
        step, _n, prob, *_ = fired
        if et == "A" and step == 1:
            probs.append(prob)

    _drive(eng, seq, names, collect)
    assert len(probs) > 100
    avg = sum(probs) / len(probs)
    assert abs(avg - 0.7) < 0.1, f"state-1 completion ~0.7, got {avg:.4f}"
    late = probs[-200:]
    late_avg = sum(late) / len(late)
    assert abs(late_avg - 0.7) < 0.08, (
        f"late-stage completion should converge to 0.7, got {late_avg:.4f}"
    )


def test_pmc_completion_three_step():
    """Pattern A → B → C (rs:293-405): state-2 completion ≈ P(C|B)=0.7;
    state-1 completion ≈ P(B|A)·P(C|A) = 0.6·0.3 = 0.18 (the fixed-point
    evaluates both steps under the SAME context)."""
    matrix = [
        [0.1, 0.6, 0.3],
        [0.2, 0.1, 0.7],
        [0.5, 0.3, 0.2],
    ]
    names = ["A", "B", "C"]
    seq = markov_chain(Lcg(99), matrix, 0, 50_000)
    eng = ForecastEngine(
        ["A", "B", "C"], max_depth=3, warmup=500, confidence=0.0,
        hawkes=False, conformal=False, coverage=0.9, max_steps=50,
        span_ns=None,
    )
    s1: list[float] = []
    s2: list[float] = []

    def collect(et, fired):
        step, _n, prob, *_ = fired
        # gate on (event, state) so a stale deeper run never pollutes the
        # shallower state's sample (the reference injects runs explicitly)
        if et == "A" and step == 1:
            s1.append(prob)
        elif et == "B" and step == 2:
            s2.append(prob)

    _drive(eng, seq, names, collect)
    assert s1 and s2
    avg2 = sum(s2) / len(s2)
    assert abs(avg2 - 0.7) < 0.1, f"state-2 ~P(C|B)=0.7, got {avg2:.4f}"
    avg1 = sum(s1) / len(s1)
    assert abs(avg1 - 0.18) < 0.1, (
        f"state-1 ~P(B|A)*P(C|A)=0.18, got {avg1:.4f}"
    )


def test_pmc_convergence_rate():
    """rs:408-510: forecast error decreases with data — late-half error
    ≤ early-half error against the analytical value."""
    matrix = [[0.3, 0.7], [0.6, 0.4]]
    names = ["A", "B"]
    seq = markov_chain(Lcg(7), matrix, 0, 20_000)
    eng = ForecastEngine(
        ["A", "B"], max_depth=3, warmup=50, confidence=0.0,
        hawkes=False, conformal=False, coverage=0.9, max_steps=20,
        span_ns=None,
    )
    probs: list[float] = []

    def collect(et, fired):
        step, _n, prob, *_ = fired
        if et == "A" and step == 1:
            probs.append(prob)

    _drive(eng, seq, names, collect)
    half = len(probs) // 2
    early_err = sum(abs(p - 0.7) for p in probs[:half]) / half
    late_err = sum(abs(p - 0.7) for p in probs[half:]) / (len(probs) - half)
    assert late_err <= early_err + 0.01, (
        f"late error {late_err:.4f} should not exceed early {early_err:.4f}"
    )


# -- 6. Hawkes burst raises completion probability (rs:514-613) -------------------


def test_hawkes_burst_effect_on_probability():
    def make(hawkes):
        return ForecastEngine(
            ["A", "B"], max_depth=3, warmup=5, confidence=0.0,
            hawkes=hawkes, conformal=False, coverage=0.9, max_steps=20,
            span_ns=None,
        )

    no_h, with_h = make(False), make(True)
    # phase 1: steady state, 1s apart
    for i in range(20):
        et = "A" if i % 2 == 0 else "B"
        ts = i * 1_000_000_000
        no_h.process(et, ts, i)
        with_h.process(et, ts, i)
    # phase 2: burst, 1ms apart
    base = 20_000_000_000
    last = (None, None)
    for i in range(60):
        et = "A" if i % 2 == 0 else "B"
        ts = base + i * 1_000_000
        f1 = no_h.process(et, ts, i)
        f2 = with_h.process(et, ts, i)
        if et == "A" and f1 is not None and f2 is not None:
            last = (f1[2], f2[2])
    p_no, p_h = last
    assert p_no is not None and 0.0 < p_no <= 1.0
    assert p_h is not None and 0.0 < p_h <= 1.0
    assert p_h >= p_no * 0.9, (
        f"Hawkes forecast ({p_h:.4f}) should be >= no-Hawkes "
        f"({p_no:.4f}) during a burst"
    )


# -- 7. conformal intervals narrow with data (rs:619-699) -------------------------


def test_conformal_intervals_narrow_with_data():
    eng = ForecastEngine(
        ["A", "B"], max_depth=3, warmup=5, confidence=0.0,
        hawkes=False, conformal=True, coverage=0.9, max_steps=20,
        span_ns=None,
    )
    early, late = [], []
    for i in range(500):
        ts = i * 100_000_000
        et = "A" if i % 2 == 0 else "B"
        fired = eng.process(et, ts, i)
        if et == "A" and fired is not None:
            _step, _n, _p, lo, hi, *_ = fired
            (early if i < 100 else late).append(hi - lo)
    assert early and late
    early_avg = sum(early) / len(early)
    late_avg = sum(late) / len(late)
    assert late_avg <= early_avg + 0.1, (
        f"late widths ({late_avg:.4f}) should not exceed early "
        f"({early_avg:.4f}) by much"
    )


def test_conformal_calibrator_quantile_shrinks_on_good_outcomes():
    cal = ConformalCalibrator(coverage=0.9)
    lo0, hi0 = cal.interval(0.8)
    assert (lo0, hi0) == (0.0, 1.0)  # no data: maximal uncertainty
    for _ in range(200):
        cal.record(0.95, completed=True)  # consistently accurate
    lo, hi = cal.interval(0.8)
    assert (hi - lo) < (hi0 - lo0), "intervals must narrow with evidence"


# -- 11. forecast confidence increases over time (rs:1037-1100) --------------------


def test_forecast_confidence_increases_over_time():
    eng = ForecastEngine(
        ["A", "B"], max_depth=3, warmup=5, confidence=0.0,
        hawkes=False, conformal=False, coverage=0.9, max_steps=20,
        span_ns=None,
    )
    confs = []
    for i in range(200):
        et = "A" if i % 2 == 0 else "B"
        fired = eng.process(et, i * 1_000_000_000, i)
        if et == "A" and fired is not None:
            confs.append(fired[5])
    assert len(confs) > 20
    assert confs[-1] > confs[0], "confidence must grow under a stable pattern"
    assert confs[-1] == pytest.approx(1.0), (
        "deterministic alternation should saturate forecast confidence"
    )


# -- 12. mode presets through the full VPL pipeline (rs:1105-1260) ------------------


@pytest.fixture(scope="module")
def spark():
    from varpulis_spark.engine import get_spark

    return get_spark("pst-convergence-port")


def _ab_events(n=100, step_ms=200):
    lines = []
    for i in range(n):
        lines.append(f"@{1000 + i * step_ms} EventA {{ x: {i} }}")
        lines.append(f"@{1100 + i * step_ms} EventB {{ x: {i} }}")
    return "\n".join(lines) + "\n"


def _run_mode(spark, forecast_op):
    from varpulis_spark.sources.event_file import load_evt
    from varpulis_spark.stream import Stream
    from varpulis_spark.vpl.compiler import run_program

    src = f"""
stream FastForecast = EventA as a
    -> EventB as b
    .within(10s)
    {forecast_op}
    .emit(prob: forecast_probability, conf: forecast_confidence)
"""
    res = run_program(src, Stream(load_evt(spark, _ab_events()), ts_col="ts",
                                  order_col="event_id"))
    return [r.asDict() for r in res["FastForecast"].collect()]


def test_forecast_mode_fast_vpl(spark):
    rows = _run_mode(spark, '.forecast(mode: "fast")')
    assert rows, "fast mode should produce forecasts"
    assert all("prob" in r and "conf" in r for r in rows)
    assert all(0.0 <= r["prob"] <= 1.0 for r in rows if r["prob"] is not None)


def test_forecast_mode_accurate_vpl(spark):
    # accurate preset: warmup 200 > the 100 pairs seen by EventA steps —
    # feed enough events that forecasts appear after the longer warmup
    rows = _run_mode(spark, '.forecast(mode: "accurate", warmup: 50)')
    assert rows, "accurate mode (explicit warmup override) should forecast"


def test_forecast_zero_config_vpl(spark):
    rows = _run_mode(spark, ".forecast(warmup: 50)")
    assert rows, "zero-config .forecast() should produce output events"
