"""VPL front-end: the reference's OWN .vpl programs run unmodified against
their .evt fixtures and produce the reference-asserted alerts
(cxo_scenario_tests.rs expectations)."""

import pytest
from pyspark.sql import functions as F

from varpulis_spark import Stream
from varpulis_spark.sources import load_evt
from varpulis_spark.vpl import parse_program, run_program

FRAUD_VPL = "/root/reference/tests/scenarios/cxo_fraud_detection.vpl"
FRAUD_EVT = "/root/reference/tests/scenarios/cxo_fraud_detection.evt"


@pytest.fixture(scope="module")
def fraud_results(spark):
    with open(FRAUD_VPL) as f:
        src = f.read()
    events = Stream(load_evt(spark, FRAUD_EVT), ts_col="ts", order_col="event_id")
    return run_program(src, events)


def test_parse_shape():
    with open(FRAUD_VPL) as f:
        decls = parse_program(f.read())
    names = [d.name for d in decls]
    assert names == ["AccountTakeover", "CardTesting", "ImpossibleTravel"]
    takeover = decls[0]
    assert [s.event_type for s in takeover.steps] == [
        "Login", "PasswordChange", "Purchase"
    ]
    assert any(op.name == "not" for op in takeover.ops)
    card = decls[1]
    assert card.steps[1].kleene  # `all SmallPurchase`


def test_account_takeover_via_vpl(fraud_results):
    rows = fraud_results["AccountTakeover"].collect()
    assert len(rows) == 1
    r = rows[0]
    assert r.user_id == "attacker1"
    assert r.alert_type == "account_takeover"
    assert r.purchase_amount == pytest.approx(4999.0)


def test_card_testing_via_vpl(fraud_results):
    rows = fraud_results["CardTesting"].collect()
    assert len(rows) >= 1  # reference asserts ≥1; exhaustive Kleene → 4
    assert len(rows) == 4
    assert all(r.card_id == "stolen_card_42" for r in rows)


def test_impossible_travel_via_vpl(fraud_results):
    rows = fraud_results["ImpossibleTravel"].collect()
    assert len(rows) == 1
    assert rows[0].user_id == "traveler1"
    assert (rows[0].location1, rows[0].location2) == ("US", "NG")


def test_auto_partitioning_enables_join_path(spark):
    """The user_id==login.user_id correlation should auto-partition and
    (for the Kleene-free pattern) take the Catalyst join path."""
    src = """
stream T = Login as a
    -> Purchase where user_id == a.user_id as b
    .within(1h)
    .emit(alert_type: "t", user_id: a.user_id)
"""
    events = Stream(load_evt(spark, FRAUD_EVT), ts_col="ts", order_col="event_id")
    out = run_program(src, events)["T"]
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "FlatMapGroupsInPandas" not in plan
    assert out.count() >= 1


def test_cross_field_auto_partition_spec():
    """Cross-step equality on DIFFERENT fields (NetworkConnection.source_ip
    == first.host_ip style) infers a per-event-type key spec instead of
    falling back to one NFA universe (VERDICT r5 task 5)."""
    from varpulis_spark.vpl.compiler import _auto_partition_spec
    from varpulis_spark.vpl.parser import parse_program

    prog = parse_program("""
stream X = FailedLogin as first_fail
    -> all FailedLogin where target_host == first_fail.target_host as fails
    -> SuccessfulLogin where target_host == first_fail.target_host as success
    -> NetworkConnection where source_host == first_fail.target_host as lateral
    .within(30m)
    .emit(h: first_fail.target_host)
""")
    decl = [d for d in prog if getattr(d, "steps", None)][0]
    spec = _auto_partition_spec(decl.steps)
    assert spec == (
        "target_host",
        {
            "FailedLogin": "target_host",
            "SuccessfulLogin": "target_host",
            "NetworkConnection": "source_host",
        },
    )

    # same-field correlation still infers the plain column (stable path)
    prog2 = parse_program("""
stream Y = A as a
    -> B where k == a.k as b
    -> C where k == a.k and v > a.v as c
    .within(1h)
    .emit(k: a.k)
""")
    decl2 = [d for d in prog2 if getattr(d, "steps", None)][0]
    assert _auto_partition_spec(decl2.steps) == "k"

    # conflicting fields for ONE event type → no sound CASE key → None
    prog3 = parse_program("""
stream Z = A as a
    -> B where x == a.k as b
    -> B where y == a.k as c
    .within(1h)
    .emit(k: a.k)
""")
    decl3 = [d for d in prog3 if getattr(d, "steps", None)][0]
    assert _auto_partition_spec(decl3.steps) is None

    # a negation with its OWN cross-field correlation joins the key map
    # (keyed negation can't veto across partitions); an unkeyed negation
    # vetoes globally and blocks partitioning entirely
    prog4 = parse_program("""
stream W = Login as a
    -> Purchase where user_id == a.user_id as b
    .not(Logout where session_user == a.user_id)
    .within(1h)
    .emit(u: a.user_id)
""")
    decl4 = [d for d in prog4 if getattr(d, "steps", None)][0]
    negs4 = [op.args[0] for op in decl4.ops if op.name == "not"]
    assert _auto_partition_spec(decl4.steps, neg_steps=negs4) == (
        "user_id",
        {"Login": "user_id", "Purchase": "user_id", "Logout": "session_user"},
    )

    prog5 = parse_program("""
stream V = Login as a
    -> Purchase where user_id == a.user_id as b
    .not(SystemHalt where severity > 3)
    .within(1h)
    .emit(u: a.user_id)
""")
    decl5 = [d for d in prog5 if getattr(d, "steps", None)][0]
    negs5 = [op.args[0] for op in decl5.ops if op.name == "not"]
    assert _auto_partition_spec(decl5.steps, neg_steps=negs5) is None


def test_cyber_vpl_patterns_partition(spark):
    """The cyber kill-chain .vpl compiles with NO unpartitioned-NFA
    warning (cross-field inference keys Pattern 1) and the alert sets are
    unchanged."""
    import warnings

    with open(f"{SCEN}/cxo_cyber_threat.vpl") as f:
        src = f.read()
    events = Stream(
        load_evt(spark, f"{SCEN}/cxo_cyber_threat.evt"),
        ts_col="ts", order_col="event_id",
    )
    with warnings.catch_warnings():
        warnings.simplefilter("error", UserWarning)
        res = run_program(src, events)
        counts = {k: v.count() for k, v in res.items()}
    assert counts["BruteForceLateral"] == 4
    assert counts["DnsExfiltration"] == 4
    assert counts["PrivilegeEscalation"] == 1


def test_relational_decl(spark, sf_dir):
    src = """
stream HighValue = events
    .where(value > 150)
    .emit(event_id: event_id, user_id: user_id, v: value)
"""
    # our events table carries event_type values, use a typed source analog:
    src = src.replace("= events", "= purchase")
    events = Stream.events(spark, sf_dir)
    out = run_program(src, events)["HighValue"]
    exp = (
        Stream.events(spark, sf_dir, "purchase").where(F.col("value") > 150).count()
    )
    assert out.count() == exp


def test_cyber_threat_via_vpl(spark):
    """The cyber kill-chain .vpl (Kleene + cross-field correlation) runs
    unmodified: ≥1 brute_force_lateral, ≥1 dns_exfiltration, exactly 1
    privilege_escalation (cxo_scenario_tests.rs)."""
    with open("/root/reference/tests/scenarios/cxo_cyber_threat.vpl") as f:
        src = f.read()
    events = Stream(
        load_evt(spark, "/root/reference/tests/scenarios/cxo_cyber_threat.evt"),
        ts_col="ts", order_col="event_id",
    )
    res = run_program(src, events)
    assert res["BruteForceLateral"].count() == 4   # ≥1 asserted by reference
    assert res["DnsExfiltration"].count() == 4      # ≥1 asserted by reference
    assert res["PrivilegeEscalation"].count() == 1


SCEN = "/root/reference/tests/scenarios"


def _run_scenario(spark, name):
    with open(f"{SCEN}/{name}.vpl") as f:
        src = f.read()
    events = Stream(
        load_evt(spark, f"{SCEN}/{name}.evt"), ts_col="ts", order_col="event_id"
    )
    return run_program(src, events)


def test_insider_trading_via_vpl(spark):
    res = _run_scenario(spark, "cxo_insider_trading")
    assert res["TradeBeforeNews"].count() == 1           # ref asserts == 1
    assert res["AbnormalPositionBuilding"].count() >= 1  # ref asserts >= 1


def test_patient_safety_via_vpl(spark):
    res = _run_scenario(spark, "cxo_patient_safety")
    di = res["DrugInteraction"].collect()
    assert len(di) == 1 and di[0].patient_id == "P-101"
    vd = res["VitalDeterioration"].collect()
    assert len(vd) == 1 and vd[0].patient_id == "P-202"
    da = res["DosageAnomaly"].collect()
    assert len(da) == 1 and da[0].patient_id == "P-303"
    # healthy patient P-404 triggers nothing (cxo_patient_healthy_no_alert)
    for df in res.values():
        if "patient_id" in df.columns:
            assert df.filter(F.col("patient_id") == "P-404").count() == 0


def test_predictive_maintenance_via_vpl(spark):
    res = _run_scenario(spark, "cxo_predictive_maintenance")
    bd = res["BearingDegradation"].collect()
    assert len(bd) == 1
    assert res["OverheatingCascade"].count() == 1
    # healthy machine CNC-02 silent (cxo_maintenance_healthy_no_alert)
    for df in res.values():
        if "machine_id" in df.columns:
            assert df.filter(F.col("machine_id") == "CNC-02").count() == 0


def test_vpl_window_aggregate_ema_crossover(spark, sf_dir):
    """The reference's headline EMA-crossover shape via VPL: windowed
    aggregate with arithmetic over EMAs (README.md:108; ExprAggregate)."""
    import duckdb

    src = """
stream Macd = purchase
    .partition_by(user_id)
    .aggregate(e12: ema(value, 12), macd: ema(value, 12) - ema(value, 26))
"""
    events = Stream.events(spark, sf_dir)
    out = run_program(src, events)["Macd"]
    got = sorted(
        (r.user_id, round(r.e12, 6), round(r.macd, 6)) for r in out.collect()
    )
    exp = duckdb.connect().execute(
        f"""WITH v AS (SELECT user_id, list(value ORDER BY ts, event_id) vs
             FROM '{sf_dir}/events.parquet' WHERE event_type='purchase' GROUP BY 1)
            SELECT user_id,
              round(list_reduce(vs, (acc, x) -> x*(2.0/13.0) + acc*(1-2.0/13.0)), 6),
              round(list_reduce(vs, (acc, x) -> x*(2.0/13.0) + acc*(1-2.0/13.0))
                  - list_reduce(vs, (acc, x) -> x*(2.0/27.0) + acc*(1-2.0/27.0)), 6)
            FROM v ORDER BY 1"""
    ).fetchall()
    assert got == [tuple(r) for r in exp]


def test_vpl_tumbling_window(spark, sf_dir):
    src = """
stream ZoneStats = view
    .partition_by(user_id)
    .window(1h)
    .aggregate(n: count(), mx: max(value))
    .having(n > 1)
"""
    events = Stream.events(spark, sf_dir)
    out = run_program(src, events)["ZoneStats"]
    import duckdb

    exp = duckdb.connect().execute(
        f"""SELECT count(*) FROM (
              SELECT user_id, time_bucket(INTERVAL '1 hour', ts), count(*) n
              FROM '{sf_dir}/events.parquet' WHERE event_type='view'
              GROUP BY 1,2 HAVING count(*) > 1)"""
    ).fetchone()[0]
    assert out.count() == exp


def test_hvac_readme_program(spark):
    """The reference README's flagship HVAC program (README.md:75-96):
    stream references, connector binding (ignored in replay), relational
    alerting, windowed zone stats, and the rapid-swing SASE pattern —
    all through the VPL front-end on hvac_monitoring.evt."""
    src = """
stream Readings = TemperatureReading.from(Sensors, topic: "sensors/temp")

stream HighTemp = Readings
    .where(value > 28)
    .emit(alert: "HIGH_TEMPERATURE", zone: zone, temperature: value)

stream ZoneStats = Readings
    .partition_by(zone)
    .window(5m)
    .aggregate(avg_temp: avg(value), max_temp: max(value))

stream RapidSwing = Readings as t1
    -> Readings where sensor_id == t1.sensor_id and value > t1.value + 5 as t2
    -> Readings where sensor_id == t1.sensor_id and value < t2.value - 5 as t3
    .within(10m)
    .emit(alert: "RAPID_SWING", zone: t1.zone, peak: t2.value)
"""
    events = Stream(
        load_evt(spark, f"{SCEN}/hvac_monitoring.evt"),
        ts_col="ts", order_col="event_id",
    )
    res = run_program(src, events)
    high = res["HighTemp"].collect()
    assert len(high) == 1 and high[0].temperature == pytest.approx(35.0)
    assert high[0].zone == "Zone_A"
    zs = res["ZoneStats"].collect()
    assert {r.zone for r in zs} == {"Zone_A", "Zone_B", "Zone_C"}
    # no same-sensor ±5°C swing exists in the fixture
    assert res["RapidSwing"].count() == 0
