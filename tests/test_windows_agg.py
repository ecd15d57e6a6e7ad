"""Windows + aggregations, differential-tested against duckdb.

Window/agg semantics per SURVEY §2.4/§2.5 (reference window.rs /
aggregation.rs): epoch-aligned tumbling & sliding, gap-based sessions,
complete-only count windows, sample stddev null under n<2, first-seeded EMA.
"""

import duckdb
import pytest
from pyspark.sql import functions as F

from varpulis_spark import Stream
from varpulis_spark.operators import aggregates as A

EV = "/root/testdata/sf0.001/events.parquet"


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM '{EV}'")
    return con


def _rows(df, *cols):
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


def _approx_eq(a, b, tol=1e-9):
    assert len(a) == len(b)
    for ra, rb in zip(a, b):
        for va, vb in zip(ra, rb):
            if isinstance(va, float):
                assert va == pytest.approx(vb, rel=1e-9), (ra, rb)
            else:
                assert va == vb, (ra, rb)


def test_tumbling_window_agg(spark, sf_dir, duck):
    out = (
        Stream.events(spark, sf_dir)
        .partition_by("user_id")
        .window("1h")
        .aggregate(n=A.count(), total=A.sum("value"), mx=A.max("value"))
    )
    got = _rows(out.df.withColumn("ws", F.col("window_start")).select("user_id", "ws", "n", "total", "mx"),
                "user_id", "ws", "n", "total", "mx")
    exp = duck.execute(
        """SELECT user_id, time_bucket(INTERVAL '1 hour', ts) ws, count(*) n,
                  sum(value) total, max(value) mx
           FROM events GROUP BY 1,2 ORDER BY 1,2"""
    ).fetchall()
    _approx_eq(got, sorted(exp))


def test_sliding_window_agg(spark, sf_dir, duck):
    out = (
        Stream.events(spark, sf_dir)
        .window("2h", sliding="1h")
        .aggregate(n=A.count())
    )
    got = _rows(out.df.select("window_start", "n"), "window_start", "n")
    exp = duck.execute(
        """WITH w AS (SELECT DISTINCT time_bucket(INTERVAL '1 hour', ts) b FROM events),
           starts AS (SELECT b s FROM w UNION SELECT b - INTERVAL '1 hour' FROM w)
           SELECT s, count(*) n FROM starts JOIN events
             ON ts >= s AND ts < s + INTERVAL '2 hours'
           GROUP BY s ORDER BY s"""
    ).fetchall()
    _approx_eq(got, sorted(exp))


def test_session_window(spark, sf_dir, duck):
    out = (
        Stream.events(spark, sf_dir)
        .partition_by("user_id")
        .window(session="30m")
        .aggregate(n=A.count(), total=A.sum("value"))
    )
    got = _rows(out.df.select("user_id", "window_start", "n", "total"),
                "user_id", "window_start", "n", "total")
    exp = duck.execute(
        """WITH t AS (
             SELECT user_id, ts, value,
               CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                    > INTERVAL '30 minutes' OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                    THEN 1 ELSE 0 END AS brk
             FROM events)
           , s AS (SELECT *, sum(brk) OVER (PARTITION BY user_id ORDER BY ts
                     ROWS UNBOUNDED PRECEDING) sid FROM t)
           SELECT user_id, min(ts) ws, count(*) n, sum(value) total
           FROM s GROUP BY user_id, sid"""
    ).fetchall()
    _approx_eq(got, sorted(exp))


def test_count_window_complete_only(spark, sf_dir, duck):
    out = (
        Stream.events(spark, sf_dir)
        .partition_by("user_id")
        .window(100)
        .aggregate(n=A.count(), avg_v=A.avg("value"))
    )
    got = _rows(out.df.select("user_id", "window_id", "n", "avg_v"),
                "user_id", "window_id", "n", "avg_v")
    assert all(r[2] == 100 for r in got)  # only complete windows
    exp = duck.execute(
        """WITH t AS (SELECT user_id, value,
              row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) rn
            FROM events)
           SELECT user_id, (rn-1)//100 win, count(*) n, avg(value) avg_v
           FROM t GROUP BY 1,2 HAVING count(*) = 100"""
    ).fetchall()
    _approx_eq(got, sorted(exp))


def test_sliding_count_window(spark, sf_dir, duck):
    out = (
        Stream.events(spark, sf_dir)
        .partition_by("user_id")
        .window(50, sliding=25)
        .aggregate(n=A.count(), total=A.sum("value"))
    )
    got = _rows(out.df.select("user_id", "window_id", "n"), "user_id", "window_id", "n")
    assert all(r[2] == 50 for r in got)
    exp = duck.execute(
        """WITH t AS (SELECT user_id, value,
              row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) rn
            FROM events),
           x AS (SELECT user_id, value, rn, unnest(generate_series(
              greatest(cast(ceil((rn-50)/25.0) as bigint), 0),
              (rn-1)//25)) win FROM t)
           SELECT user_id, win, count(*) FROM x GROUP BY 1,2 HAVING count(*) >= 50"""
    ).fetchall()
    assert got == sorted(exp)


def test_stats_aggregates(spark, sf_dir, duck):
    out = (
        Stream.events(spark, sf_dir)
        .partition_by("event_type")
        .aggregate(
            sd=A.stddev("value"),
            nd=A.count_distinct("user_id"),
            f=A.first("value"),
            l=A.last("value"),
            med=A.median("value"),
        )
    )
    got = _rows(out.df.select("event_type", "sd", "nd", "f", "l", "med"),
                "event_type", "sd", "nd", "f", "l", "med")
    exp = duck.execute(
        """SELECT event_type, stddev_samp(value), count(DISTINCT user_id),
                  first(value ORDER BY ts, event_id), last(value ORDER BY ts, event_id),
                  median(value)
           FROM events GROUP BY 1"""
    ).fetchall()
    _approx_eq(got, sorted(exp))


def test_ema_and_agg_arithmetic(spark, sf_dir, duck):
    out = (
        Stream.events(spark, sf_dir)
        .partition_by("user_id")
        .aggregate(
            e12=A.ema("value", 12),
            macd=A.ema("value", 12) - A.ema("value", 26),
        )
    )
    got = _rows(out.df.select("user_id", "e12", "macd"), "user_id", "e12", "macd")
    exp = duck.execute(
        """SELECT user_id,
             list_reduce(list(value ORDER BY ts, event_id),
               (acc, x) -> x * (2.0/13.0) + acc * (1 - 2.0/13.0)) e12,
             list_reduce(list(value ORDER BY ts, event_id),
               (acc, x) -> x * (2.0/13.0) + acc * (1 - 2.0/13.0))
             - list_reduce(list(value ORDER BY ts, event_id),
               (acc, x) -> x * (2.0/27.0) + acc * (1 - 2.0/27.0)) macd
           FROM events GROUP BY 1"""
    ).fetchall()
    _approx_eq(got, sorted(exp))


def test_stddev_small_group_null(spark):
    df = spark.createDataFrame([(1, 1.0)], "id long, value double").withColumn(
        "ts", F.current_timestamp()
    )
    out = Stream.from_df(df).aggregate(sd=A.stddev("value")).df.collect()
    assert out[0].sd is None  # n<2 → null (aggregation.rs:355-360)


def test_having(spark, sf_dir, duck):
    out = (
        Stream.events(spark, sf_dir)
        .partition_by("user_id")
        .aggregate(n=A.count())
        .having(F.col("n") > 50)
    )
    exp = duck.execute(
        "SELECT user_id, count(*) n FROM events GROUP BY 1 HAVING count(*) > 50"
    ).fetchall()
    assert _rows(out.df, "user_id", "n") == sorted(exp)


def test_first_event_aligned_window(spark, sf_dir, duck):
    """Reference alignment: windows open at the partition's first event
    (window.rs:22-150)."""
    out = (
        Stream.events(spark, sf_dir)
        .partition_by("user_id")
        .window("1h", align="first_event")
        .aggregate(n=A.count())
    )
    exp = duck.execute(
        """WITH t AS (SELECT user_id, ts,
             min(ts) OVER (PARTITION BY user_id) t0 FROM events)
           SELECT user_id,
             cast(floor((epoch(ts) - epoch(t0)) / 3600) as bigint) win, count(*) n
           FROM t GROUP BY 1, 2"""
    ).fetchall()
    got = out.df.select("user_id", (F.col("window_start").cast("long") / 3600).cast("long").alias("w"), "n")
    # compare per-user window counts multiset (window ids differ by shift)
    got_counts = sorted((r.user_id, r.n) for r in got.collect())
    exp_counts = sorted((u, n) for u, _w, n in exp)
    assert got_counts == exp_counts


def test_custom_udaf(spark, sf_dir, duck):
    """AggregateFunc-trait analog (aggregation.rs:104): vectorized
    (Series) and ordered (ts-ordered list) custom aggregates vs SQL."""
    rng = A.udaf(lambda s: float(s.max() - s.min()), "value")
    swing = A.udaf(lambda vs: float(vs[-1] - vs[0]), "value", ordered=True)
    out = (
        Stream.events(spark, sf_dir)
        .partition_by("user_id")
        .aggregate(value_range=rng, swing=swing)
    )
    exp = {
        u: (round(r, 6), round(s, 6))
        for u, r, s in duck.execute(
            """SELECT user_id, max(value) - min(value),
                      last(value ORDER BY ts, event_id)
                        - first(value ORDER BY ts, event_id)
               FROM events GROUP BY 1"""
        ).fetchall()
    }
    got = {
        r.user_id: (round(r.value_range, 6), round(r.swing, 6))
        for r in out.df.collect()
    }
    assert got == exp and len(got) > 0


def test_custom_udaf_arithmetic_and_window(spark, sf_dir, duck):
    """UDAFs compose with aggregate arithmetic and windowed aggregation
    like built-ins."""
    rel = A.udaf(lambda s: float(s.max() - s.min()), "value") / A.max("value")
    out = (
        Stream.events(spark, sf_dir)
        .partition_by("user_id")
        .window("6h")
        .aggregate(rel_range=rel)
    )
    exp = {
        (u, int(w)): round(v, 9)
        for u, w, v in duck.execute(
            """SELECT user_id,
                      floor(epoch_us(ts) / 21600000000) w,
                      (max(value) - min(value)) / max(value)
               FROM events GROUP BY 1, 2"""
        ).fetchall()
    }
    got = {
        (r.user_id, int(r.window_start.timestamp() // 21600)): round(r.rel_range, 9)
        for r in out.df.collect()
    }
    assert got == exp and len(got) > 0


def test_custom_udaf_arrow_not_row_at_a_time(spark, sf_dir):
    """Plain-callable UDAFs (ordered and unordered) lower to scalar pandas
    UDFs over the collected arrays: the plan must show ArrowEvalPython and
    never BatchEvalPython (the pickled row-at-a-time path) — and they stay
    mix-safe with built-in aggregates in the same spec."""
    rng = A.udaf(lambda s: float(s.max() - s.min()), "value")
    swing = A.udaf(lambda vs: float(vs[-1] - vs[0]), "value", ordered=True)
    out = (
        Stream.events(spark, sf_dir)
        .partition_by("user_id")
        .aggregate(value_range=rng, swing=swing, total=A.sum("value"))
    )
    plan = out.df._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" in plan
    assert out.df.count() > 0


def test_custom_udaf_vectorized(spark, sf_dir, duck):
    """The Arrow grouped-agg path (vectorized=True, all-pandas agg)."""
    rng = A.udaf(lambda s: float(s.max() - s.min()), "value", vectorized=True)
    out = Stream.events(spark, sf_dir).partition_by("user_id").aggregate(value_range=rng)
    exp = {
        u: round(v, 6)
        for u, v in duck.execute(
            "SELECT user_id, max(value) - min(value) FROM events GROUP BY 1"
        ).fetchall()
    }
    got = {r.user_id: round(r.value_range, 6) for r in out.df.collect()}
    assert got == exp and len(got) > 0


def test_sliding_count_window_slide_equals_window(spark):
    """window_coverage_tests.rs:722 — slide == size is tumbling: 6 events
    in windows of (3, slide 3) yield exactly two complete windows of 3."""
    import pandas as pd

    df = spark.createDataFrame(pd.DataFrame({
        "event_type": ["T"] * 6,
        "v": [float(i) for i in range(6)],
        "ts": pd.to_datetime(range(1, 7), unit="s", utc=True),
        "event_id": range(6),
    }))
    out = (
        Stream(df, ts_col="ts", order_col="event_id")
        .window(3, sliding=3)
        .aggregate(n=A.count(), first_v=A.first("v"), last_v=A.last("v"))
    )
    rows = sorted(
        (r.window_id, r.n, r.first_v, r.last_v) for r in out.df.collect()
    )
    assert rows == [(0, 3, 0.0, 2.0), (1, 3, 3.0, 5.0)]


def test_sliding_count_window_slide_one(spark):
    """window_coverage_tests.rs:751 — slide 1 emits per event once full:
    4 events in windows of (3, slide 1) yield windows [0..2] and [1..3]."""
    import pandas as pd

    df = spark.createDataFrame(pd.DataFrame({
        "event_type": ["T"] * 4,
        "v": [float(i + 1) for i in range(4)],
        "ts": pd.to_datetime(range(1, 5), unit="s", utc=True),
        "event_id": range(4),
    }))
    out = (
        Stream(df, ts_col="ts", order_col="event_id")
        .window(3, sliding=1)
        .aggregate(n=A.count(), first_v=A.first("v"), last_v=A.last("v"))
    )
    rows = sorted(
        (r.window_id, r.n, r.first_v, r.last_v) for r in out.df.collect()
    )
    assert rows == [(0, 3, 1.0, 3.0), (1, 3, 2.0, 4.0)]
