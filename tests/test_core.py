"""Core stateless operators: where/select/emit/distinct/limit/order_by/merge.

Differential-tested against duckdb on the same parquet (the same oracle
strategy the driver uses at sf0.01).
"""

import duckdb
import pytest
from pyspark.sql import functions as F

import varpulis_spark.functions as vf
from varpulis_spark import Stream, merge

EV = "/root/testdata/sf0.001/events.parquet"


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM '{EV}'")
    return con


def test_where_emit(spark, sf_dir, duck):
    out = (
        Stream.events(spark, sf_dir)
        .where(F.col("value") > 150.0)
        .emit("HighValue", user=F.col("user_id"), v=F.col("value"))
    )
    rows = out.df.select("user", "v").collect()
    expected = duck.execute("SELECT user_id, value FROM events WHERE value > 150").fetchall()
    assert sorted([(r.user, r.v) for r in rows]) == sorted(expected)
    # event_type got set
    assert out.df.select("event_type").distinct().collect()[0][0] == "HighValue"


def test_select_computed(spark, sf_dir, duck):
    out = Stream.events(spark, sf_dir).select(
        "event_id", doubled=F.col("value") * 2, k=vf.prop("props", "k")
    )
    got = {r.event_id: (r.doubled, r.k) for r in out.df.collect()}
    exp = duck.execute(
        "SELECT event_id, value*2, json_extract_string(props,'$.k') FROM events"
    ).fetchall()
    for eid, d, k in exp:
        assert got[eid][0] == pytest.approx(d)
        assert got[eid][1] == k


def test_distinct_whole_and_expr(spark, sf_dir, duck):
    s = Stream.events(spark, sf_dir)
    # whole-event distinct hashes the event DATA (payload fields), not the
    # envelope (ts / arrival id) — DistinctState hashes event.data (r9)
    payload = [c for c in s.df.columns
               if c not in {s.ts_col, s.order_col, "event_type"}]
    assert s.distinct().count() == duck.execute(
        f"SELECT count(*) FROM (SELECT DISTINCT {', '.join(payload)} FROM events)"
    ).fetchone()[0]
    # distinct by expr keeps earliest event per key
    d = s.distinct(F.col("event_type")).df
    assert d.count() == duck.execute("SELECT count(DISTINCT event_type) FROM events").fetchone()[0]
    first_login = duck.execute(
        "SELECT event_id FROM events WHERE event_type='purchase' ORDER BY ts, event_id LIMIT 1"
    ).fetchone()[0]
    got = d.filter(F.col("event_type") == "purchase").select("event_id").collect()[0][0]
    assert got == first_login


def test_distinct_no_payload_keeps_earliest(spark, sf_dir):
    """Whole-event distinct on a stream with ZERO payload columns: every
    event is 'equal', and the reference's DistinctState keeps the FIRST
    arrival — the surviving envelope must be the earliest (ts, order) row,
    not an arbitrary limit(1) pick (ADVICE r9 #5)."""
    s = Stream.events(spark, sf_dir)
    envelope_only = s._with(
        s.df.select(s.ts_col, s.order_col, "event_type")
    )
    assert envelope_only._payload_columns() == []
    out = envelope_only.distinct().df.collect()
    first = (
        s.df.orderBy(s.ts_col, s.order_col)
        .select(s.ts_col, s.order_col)
        .head(1)[0]
    )
    assert len(out) == 1
    assert (out[0][s.ts_col], out[0][s.order_col]) == tuple(first)


def test_limit_order(spark, sf_dir, duck):
    s = Stream.events(spark, sf_dir)
    rows = s.limit(10).df.select("event_id").collect()
    exp = duck.execute("SELECT event_id FROM events ORDER BY ts, event_id LIMIT 10").fetchall()
    assert sorted(r.event_id for r in rows) == sorted(e[0] for e in exp)
    assert s.first().count() == 1
    ordered = s.order_by(F.col("value").desc()).df.select("value").head(3)
    exp2 = duck.execute("SELECT value FROM events ORDER BY value DESC LIMIT 3").fetchall()
    assert [r.value for r in ordered] == [e[0] for e in exp2]


def test_merge(spark, sf_dir, duck):
    a = Stream.events(spark, sf_dir).of_type("purchase").where(F.col("value") > 100)
    b = Stream.events(spark, sf_dir).of_type("error")
    m = merge(a, b)
    exp = duck.execute(
        "SELECT count(*) FROM events WHERE (event_type='purchase' AND value>100) OR event_type='error'"
    ).fetchone()[0]
    assert m.count() == exp


def test_functions_layer(spark):
    df = spark.range(1).select(
        vf.coalesce(F.lit(None), F.lit(5)).alias("c"),
        vf.safe_div(F.lit(1.0), F.lit(0.0)).alias("d"),
        F.lit(vf.duration_ns("5m") / 1e9),
        vf.sliding_pairs(F.array(F.lit(1), F.lit(2), F.lit(3))).alias("sp"),
        vf.sum_list(F.array(F.lit(1.0), F.lit(2.0))).alias("sl"),
        vf.substring(F.lit("hello"), 1, 3).alias("sub"),
    )
    row = df.collect()[0]
    assert row.c == 5
    assert row.d is None
    assert row[2] == 300.0
    assert row.sp == [[1, 2], [2, 3]]
    assert row.sl == 3.0
    assert row.sub == "ell"


def test_print_and_log_passthrough(spark, sf_dir, capsys, caplog):
    """`.print` / `.log` (PrintConfig/LogConfig engine/types.rs:424-434) are
    diagnostic PASSTHROUGHS: the stream continues unchanged, output goes to
    console/logger."""
    import logging

    s = Stream.events(spark, sf_dir).where(F.col("value") > 150).limit(3)
    before = s.count()
    with caplog.at_level(logging.INFO, logger="varpulis_spark"):
        out = s.print(2).log("info", "sample")
    assert out.count() == before  # passthrough: same stream
    assert "value" in capsys.readouterr().out  # .show table reached stdout
    assert any("sample" in r.message for r in caplog.records)
