"""Hot-key skew robustness: ALL events collapse onto one partition key —
the worst case for per-key stateful operators (one serial NFA/DP/PST over
everything, reference-mandated ordering). Contract: bounded state (Kleene
caps, max_matches, run consumption) keeps the single-key path finite and
fast; nothing hangs or explodes.

Scoped to representative stateful queries; cap generous (catching
super-linear blowups, not benchmarking)."""

from __future__ import annotations

import os
import sys
import threading

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402

STATEFUL = [
    "seq_signup_purchase", "kleene_purchases", "kleene_maximal",
    "kleene_deferred", "and_pattern", "greta_trend_count", "trend_multi",
    "forecast_pst", "ema_macd", "session_30m", "count_window_20",
]
CAP = 120.0


@pytest.fixture(scope="module")
def skew_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("sf_skew")
    src = "/root/testdata/sf0.001"
    con = duckdb.connect()
    con.execute(
        f"COPY (SELECT event_id, ts, event_type, CAST(0 AS BIGINT) AS user_id, "
        f"value, props FROM '{src}/events.parquet') TO '{d}/events.parquet' (FORMAT PARQUET)"
    )
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "documents", "embeddings"]:
        con.execute(
            f"COPY (SELECT * FROM '{src}/{t}.parquet') TO '{d}/{t}.parquet' (FORMAT PARQUET)"
        )
    return str(d)


@pytest.mark.parametrize("name", STATEFUL)
def test_stateful_query_survives_hot_key(spark, skew_dir, name):
    result: dict = {}
    group = f"skew-{name}"

    def work() -> None:
        try:
            spark.sparkContext.setJobGroup(group, name, True)
            result["rows"] = entrymod.queries()[name](spark, skew_dir).count()
        except BaseException as e:  # noqa: BLE001
            result["err"] = e

    t = threading.Thread(target=work, daemon=True)
    t.start()
    t.join(CAP)
    if t.is_alive():
        spark.sparkContext.cancelJobGroup(group)
        t.join(15)
        pytest.fail(f"{name} exceeded {CAP:.0f}s with a single hot key")
    if "err" in result:
        raise result["err"]
    assert result["rows"] >= 0
