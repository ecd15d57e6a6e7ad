"""Golden scenario corpus — the reference's flagship CxO acceptance tests
re-expressed on our API (SURVEY §5: tests/scenarios/*.{vpl,evt}; harness
cxo_scenario_tests.rs). The .evt fixture replays through our event-file
source; alert counts must match the reference's assertions.
"""

import pytest
from pyspark.sql import functions as F

from varpulis_spark import Stream
from varpulis_spark.operators.sase import Pattern, not_step, step
from varpulis_spark.sources import load_evt

FRAUD_EVT = "/root/reference/tests/scenarios/cxo_fraud_detection.evt"


@pytest.fixture(scope="module")
def fraud_stream(spark):
    df = load_evt(spark, FRAUD_EVT)
    return Stream(df, ts_col="ts", order_col="event_id")


def test_account_takeover(fraud_stream):
    """Login → PasswordChange → Purchase within 30m, no Logout in between
    (cxo_fraud_detection.vpl Pattern 1) — exactly 1 alert (attacker1)."""
    p = Pattern(
        steps=[
            step("Login", "login"),
            not_step("Logout"),
            step("PasswordChange", "pwd"),
            not_step("Logout"),
            step("Purchase", "purchase"),
        ],
        within="30m",
        emit={"user_id": ("login", "user_id"),
              "device": ("login", "device_id"),
              "purchase_amount": ("purchase", "amount")},
    )
    out = fraud_stream.partition_by("user_id").pattern(p).df.collect()
    assert len(out) == 1
    assert out[0].user_id == "attacker1"
    assert out[0].purchase_amount == pytest.approx(4999.0)


def test_card_testing_kleene(fraud_stream):
    """SmallPurchase → all SmallPurchase+ → LargePurchase within 60m
    (Pattern 2). Exhaustive skip-till-any combinations: firsts s1,s2,s3 with
    later-subset closures → 3 + 1 = 4 matches, all on stolen_card_42
    (the reference asserts ≥ 1; exhaustive semantics give exactly 4)."""
    p = Pattern(
        steps=[
            step("SmallPurchase", "first"),
            step("SmallPurchase", "tests", kleene="+"),
            step("LargePurchase", "large"),
        ],
        within="60m",
        emit={"card_id": ("first", "card_id"),
              "n_tests": ("tests", "__count"),
              "large_amount": ("large", "amount")},
    )
    out = fraud_stream.partition_by("card_id").pattern(p).df.collect()
    assert len(out) == 4
    assert all(r.card_id == "stolen_card_42" for r in out)
    assert all(r.large_amount == pytest.approx(2500.0) for r in out)


def test_impossible_travel(fraud_stream):
    """Login → Login with different country within 1h (Pattern 3) —
    exactly 1 alert (traveler1 US→NG)."""
    p = Pattern(
        steps=[
            step("Login", "login1"),
            step("Login", "login2",
                 where=lambda e, b: e["country"] != b["login1"]["country"],
                 where_sql="login2.country != login1.country"),
        ],
        within="1h",
        emit={"user_id": ("login1", "user_id"),
              "location1": ("login1", "country"),
              "location2": ("login2", "country")},
    )
    out = fraud_stream.partition_by("user_id").pattern(p).df.collect()
    assert len(out) == 1
    assert out[0].user_id == "traveler1"
    assert (out[0].location1, out[0].location2) == ("US", "NG")


def test_no_false_positives(fraud_stream):
    """legit_user (Login → Purchase, no PasswordChange) triggers nothing
    (cxo_fraud_no_false_positives)."""
    p = Pattern(
        steps=[step("Login", "login"), step("PasswordChange", "pwd"),
               step("Purchase", "purchase")],
        within="30m",
        emit={"user_id": ("login", "user_id")},
    )
    out = fraud_stream.partition_by("user_id").pattern(p).df.collect()
    assert {r.user_id for r in out} == {"attacker1"}


CYBER_EVT = "/root/reference/tests/scenarios/cxo_cyber_threat.evt"


@pytest.fixture(scope="module")
def cyber_stream(spark):
    df = load_evt(spark, CYBER_EVT)
    return Stream(df, ts_col="ts", order_col="event_id")


def test_brute_force_lateral(cyber_stream):
    """FailedLogin → all FailedLogin+ → SuccessfulLogin → NetworkConnection
    (cxo_cyber_threat.vpl Pattern 1). Cross-field key (NetworkConnection
    joins on source_host == first.target_host) → unpartitioned NFA with
    binding predicates. Exhaustive combinations: first=f1 with 3 closure
    subsets of {f2,f3}, plus first=f2 with {f3} → 4 (≥1 asserted by the
    reference)."""
    p = Pattern(
        steps=[
            step("FailedLogin", "first_fail"),
            step("FailedLogin", "fails", kleene="+",
                 where=lambda e, b: e["target_host"] == b["first_fail"]["target_host"]),
            step("SuccessfulLogin", "success",
                 where=lambda e, b: e["target_host"] == b["first_fail"]["target_host"]),
            step("NetworkConnection", "lateral",
                 where=lambda e, b: e["source_host"] == b["first_fail"]["target_host"]),
        ],
        within="30m",
        emit={"target_host": ("first_fail", "target_host"),
              "attacker_ip": ("first_fail", "source_ip"),
              "lateral_target": ("lateral", "dest_host")},
    )
    out = cyber_stream.pattern(p).df.collect()
    assert len(out) == 4
    assert all(r.lateral_target == "file-server-02" for r in out)


def test_dns_exfiltration_kleene(cyber_stream):
    """DnsQuery → all DnsQuery+ same host within 5m (Pattern 2): 4
    combinations over the 3-query burst."""
    p = Pattern(
        steps=[
            step("DnsQuery", "first"),
            step("DnsQuery", "queries", kleene="+",
                 where=lambda e, b: e["source_host"] == b["first"]["source_host"]),
        ],
        within="5m",
        emit={"source_host": ("first", "source_host"),
              "domain": ("first", "domain"),
              "n_queries": ("queries", "__count")},
    )
    out = cyber_stream.pattern(p).df.collect()
    assert len(out) == 4
    assert all(r.source_host == "workstation-15" for r in out)


def test_privilege_escalation_join_path(cyber_stream):
    """UserProcess → ElevationEvent → RootProcess per host within 10m
    (Pattern 3) — partitionable on `host`, so it takes the Catalyst join
    path; exactly 1 alert (reference asserts == 1)."""
    p = Pattern(
        steps=[step("UserProcess", "user_proc"),
               step("ElevationEvent", "elevation"),
               step("RootProcess", "root_proc")],
        within="10m",
        emit={"host": ("user_proc", "host"),
              "user": ("user_proc", "username"),
              "root_command": ("root_proc", "command")},
    )
    assert p.join_compilable()
    out = cyber_stream.partition_by("host").pattern(p).df.collect()
    assert len(out) == 1
    assert out[0].host == "dev-box-03" and out[0].user == "jdoe"


def test_evt_loader_shape(spark):
    df = load_evt(spark, FRAUD_EVT)
    assert df.filter(F.col("event_type") == "Login").count() == 4
    assert df.filter(F.col("event_type") == "SmallPurchase").count() == 3
    # BATCH offsets become event time: purchase at 15s after epoch
    purchase = df.filter(F.col("event_type") == "Purchase").orderBy("ts").first()
    assert purchase.amount == pytest.approx(4999.0)
