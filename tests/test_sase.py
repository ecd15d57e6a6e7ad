"""SASE+ semantics tests.

Pure-Python enumerator checks mirror the reference's unit-test style
(sase.rs:4700+): sequences are ALL-pairs under skip-till-any (SIGMOD'06
skip_till_any_match), Kleene captures all combinations with the reference
caps, negation guards intervals, within bounds the match span.
"""

import duckdb
import pandas as pd
import pytest
from pyspark.sql import functions as F

from varpulis_spark import Stream
from varpulis_spark.operators.sase import (
    MAX_KLEENE_EVENTS,
    SKIP_TILL_NEXT,
    STRICT,
    Pattern,
    _enumerate_matches,
    not_step,
    step,
)

S = 1_000_000_000  # ns per second


def ev(i, typ, t, **extra):
    d = {"event_id": i, "event_type": typ, "__ts": t * S}
    d.update(extra)
    return d


def ids(rows, *cols):
    return sorted(tuple(r[c] for c in cols) for r in rows)


def test_seq_all_pairs():
    events = [ev(0, "A", 0), ev(1, "A", 1), ev(2, "B", 2), ev(3, "B", 3)]
    p = Pattern(steps=[step("A", "a"), step("B", "b")],
                emit={"a": ("a", "event_id"), "b": ("b", "event_id")})
    got = ids(_enumerate_matches(events, p), "a", "b")
    assert got == [(0, 2), (0, 3), (1, 2), (1, 3)]


def test_seq_within():
    events = [ev(0, "A", 0), ev(1, "B", 5), ev(2, "B", 20)]
    p = Pattern(steps=[step("A", "a"), step("B", "b")], within="10s",
                emit={"a": ("a", "event_id"), "b": ("b", "event_id")})
    assert ids(_enumerate_matches(events, p), "a", "b") == [(0, 1)]


def test_seq_predicate_binding():
    events = [ev(0, "A", 0, v=10), ev(1, "B", 1, v=5), ev(2, "B", 2, v=20)]
    p = Pattern(
        steps=[step("A", "a"), step("B", "b", where=lambda e, b: e["v"] > b["a"]["v"])],
        emit={"a": ("a", "event_id"), "b": ("b", "event_id")},
    )
    assert ids(_enumerate_matches(events, p), "a", "b") == [(0, 2)]


def test_negation_between():
    events = [ev(0, "A", 0), ev(1, "C", 1), ev(2, "B", 2), ev(3, "A", 3), ev(4, "B", 4)]
    p = Pattern(
        steps=[step("A", "a"), not_step("C"), step("B", "b")],
        emit={"a": ("a", "event_id"), "b": ("b", "event_id")},
    )
    # A0 has C1 before both Bs → dead; A3 → B4 clean.
    assert ids(_enumerate_matches(events, p), "a", "b") == [(3, 4)]


def test_global_negation_completing_event_vetoes():
    """Global negation is checked BEFORE run advancement (sase.rs:2204):
    the event completing the sequence can itself invalidate the run — the
    veto span is (first, last] in arrival order."""
    # pattern A -> B with .not(B): the completing B always vetoes
    events = [ev(0, "A", 0), ev(1, "B", 5)]
    p = Pattern(
        steps=[step("A", "a"), not_step("B"), step("B", "b")],
        emit={"a": ("a", "event_id"), "b": ("b", "event_id")},
    )
    assert _enumerate_matches(events, p) == []


def test_global_negation_arrival_order_ties():
    """Same-timestamp events: arrival (sort) order decides whether the
    negated event saw an active run. C before B at the same ts vetoes;
    C after B arrives post-completion and does not."""
    # C sorted before the completing B at ts=5 → run still active → veto
    events = [ev(0, "A", 0), ev(1, "C", 5), ev(2, "B", 5)]
    p = Pattern(
        steps=[step("A", "a"), not_step("C"), step("B", "b")],
        emit={"a": ("a", "event_id"), "b": ("b", "event_id")},
    )
    assert _enumerate_matches(events, p) == []
    # C sorted after the completing B at ts=5 → run already completed
    events = [ev(0, "A", 0), ev(1, "B", 5), ev(2, "C", 5)]
    assert ids(_enumerate_matches(events, p), "a", "b") == [(0, 1)]


def test_trailing_negation_needs_quiet_window():
    events = [ev(0, "A", 0), ev(1, "C", 5), ev(2, "A", 20)]
    p = Pattern(
        steps=[step("A", "a"), not_step("C")], within="10s",
        emit={"a": ("a", "event_id")},
    )
    # A0 sees C within 10s → suppressed; A20 confirmed at deadline.
    assert ids(_enumerate_matches(events, p), "a") == [(2,)]


def test_kleene_all_combinations():
    events = [ev(0, "A", 0), ev(1, "B", 1), ev(2, "B", 2), ev(3, "C", 3)]
    p = Pattern(
        steps=[step("A", "a"), step("B", "bs", kleene="+"), step("C", "c")],
        emit={"a": ("a", "event_id"), "bs": ("bs", "event_id"), "c": ("c", "event_id")},
    )
    got = sorted(tuple(r["bs"]) for r in _enumerate_matches(events, p))
    assert got == [(1,), (1, 2), (2,)]  # all non-empty ordered subsets


def test_kleene_iterative_predicate():
    # strictly-increasing closure: each B must exceed the previous one
    events = [ev(0, "A", 0), ev(1, "B", 1, v=3), ev(2, "B", 2, v=1),
              ev(3, "B", 3, v=5), ev(4, "C", 4)]

    def rising(e, b):
        prev = b["bs"]
        return not prev or e["v"] > prev[-1]["v"]

    p = Pattern(
        steps=[step("A", "a"), step("B", "bs", kleene="+", where=rising), step("C", "c")],
        emit={"bs": ("bs", "v")},
    )
    got = sorted(tuple(r["bs"]) for r in _enumerate_matches(events, p))
    assert got == [(1,), (1, 5), (3,), (3, 5), (5,)]


def test_kleene_cap():
    events = [ev(0, "A", 0)] + [ev(i, "B", i) for i in range(1, 40)] + [ev(99, "C", 99)]
    p = Pattern(
        steps=[step("A", "a"), step("B", "bs", kleene="+"), step("C", "c")],
        emit={"n": ("bs", "__count")},
        max_matches=100_000,
    )
    rows = _enumerate_matches(events, p)
    assert rows and max(r["n"] for r in rows) <= MAX_KLEENE_EVENTS


def test_skip_till_next():
    events = [ev(0, "A", 0), ev(1, "B", 1), ev(2, "B", 2)]
    p = Pattern(steps=[step("A", "a"), step("B", "b")], strategy=SKIP_TILL_NEXT,
                emit={"a": ("a", "event_id"), "b": ("b", "event_id")})
    assert ids(_enumerate_matches(events, p), "a", "b") == [(0, 1)]


def test_strict_contiguous():
    events = [ev(0, "A", 0), ev(1, "X", 1), ev(2, "B", 2), ev(3, "A", 3), ev(4, "B", 4)]
    p = Pattern(steps=[step("A", "a"), step("B", "b")], strategy=STRICT,
                emit={"a": ("a", "event_id"), "b": ("b", "event_id")})
    # A0 followed by X → broken; A3 immediately followed by B4 → match.
    assert ids(_enumerate_matches(events, p), "a", "b") == [(3, 4)]


def test_match_cap():
    events = [ev(i, "A", i) for i in range(200)] + [ev(1000 + i, "B", 1000 + i) for i in range(200)]
    p = Pattern(steps=[step("A", "a"), step("B", "b")], max_matches=500,
                emit={"a": ("a", "event_id")})
    assert len(_enumerate_matches(events, p)) == 500


# ---------------------------------------------------------------------------
# Spark driver differential test vs duckdb
# ---------------------------------------------------------------------------


def test_spark_seq_vs_duckdb(spark, sf_dir):
    p = Pattern(
        steps=[step("signup", "a"), step("purchase", "b")],
        within="24h",
        emit={"user_id": ("a", "user_id"), "a_id": ("a", "event_id"),
              "b_id": ("b", "event_id")},
    )
    out = Stream.events(spark, sf_dir).partition_by("user_id").pattern(p)
    got = sorted((r.user_id, r.a_id, r.b_id) for r in out.df.collect())
    con = duckdb.connect()
    exp = con.execute(
        f"""SELECT a.user_id, a.event_id, b.event_id
            FROM '{sf_dir}/events.parquet' a JOIN '{sf_dir}/events.parquet' b
              ON a.user_id = b.user_id
             AND a.event_type='signup' AND b.event_type='purchase'
             AND b.ts > a.ts AND b.ts <= a.ts + INTERVAL '24 hours'
            ORDER BY 1,2,3"""
    ).fetchall()
    assert got == exp


def test_spark_negation_vs_duckdb(spark, sf_dir):
    p = Pattern(
        steps=[step("signup", "a"), not_step("error",
                    where=lambda e, b: e["user_id"] == b["a"]["user_id"]),
               step("purchase", "b")],
        within="24h",
        emit={"user_id": ("a", "user_id"), "a_id": ("a", "event_id"),
              "b_id": ("b", "event_id")},
    )
    out = Stream.events(spark, sf_dir).partition_by("user_id").pattern(p)
    got = sorted((r.user_id, r.a_id, r.b_id) for r in out.df.collect())
    con = duckdb.connect()
    exp = con.execute(
        f"""SELECT a.user_id, a.event_id, b.event_id
            FROM '{sf_dir}/events.parquet' a JOIN '{sf_dir}/events.parquet' b
              ON a.user_id = b.user_id
             AND a.event_type='signup' AND b.event_type='purchase'
             AND b.ts > a.ts AND b.ts <= a.ts + INTERVAL '24 hours'
            WHERE NOT EXISTS (
              SELECT 1 FROM '{sf_dir}/events.parquet' c
              WHERE c.user_id = a.user_id AND c.event_type='error'
                AND (c.ts > a.ts OR (c.ts = a.ts AND c.event_id > a.event_id))
                AND (c.ts < b.ts OR (c.ts = b.ts AND c.event_id <= b.event_id)))
            ORDER BY 1,2,3"""
    ).fetchall()
    assert got == exp


def test_global_negation_arrival_time_bindings(spark):
    """ADVICE r2 (sase.py:277): a global-negation predicate referencing an
    alias bound AFTER the negated event arrives must NOT veto — the
    reference evaluates negation predicates at neg-event arrival against
    the run's partially captured events (check_global_negations,
    run.captured). Here C arrives between A and B; its predicate
    references b (unbound at C's arrival), so the match survives."""
    from datetime import datetime, timedelta

    t0 = datetime(2024, 1, 1)
    rows = [
        (1, t0, 7, "A", 10.0),
        (2, t0 + timedelta(seconds=1), 7, "C", 99.0),
        (3, t0 + timedelta(seconds=2), 7, "B", 5.0),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double"
    )
    s = Stream(df, ts_col="ts", order_col="event_id").partition_by("user_id")

    # predicate reads b.value — would veto (99 > 5) if evaluated with the
    # final bindings, but b is unbound when C arrives
    p = Pattern(
        steps=[
            step("A", "a"),
            not_step("C", where=lambda ev, b: ev.get("value") > b["b"].get("value")),
            step("B", "b"),
        ],
        within="1h",
        emit={"a_id": ("a", "event_id"), "b_id": ("b", "event_id")},
    )
    got = s.pattern(p).df.collect()
    assert [(r.a_id, r.b_id) for r in got] == [(1, 3)]

    # control: the same predicate over the ALREADY-bound alias a still
    # vetoes (99 > 10 at C's arrival)
    p2 = Pattern(
        steps=[
            step("A", "a"),
            not_step("C", where=lambda ev, b: ev.get("value") > b["a"].get("value")),
            step("B", "b"),
        ],
        within="1h",
        emit={"a_id": ("a", "event_id"), "b_id": ("b", "event_id")},
    )
    assert s.pattern(p2).df.count() == 0


# ---------------------------------------------------------------------------
# step-predicate pushdown (compiler.rs:146-156 analog): single-event
# where_sql predicates become a Catalyst filter BELOW the NFA
# ---------------------------------------------------------------------------


def test_prefilter_condition_pushes_own_alias_only(spark):
    from varpulis_spark.operators.sase import pattern_prefilter

    p = Pattern(
        steps=[
            step("A", "a", where=lambda e, b: e["value"] > 100,
                 where_sql="a.value > 100"),
            step("B", "b", where=lambda e, b: e["value"] > b["a"]["value"],
                 where_sql="b.value > a.value"),
        ],
        emit={"a_id": ("a", "event_id")},
    )
    cond = pattern_prefilter(p)
    assert cond is not None
    s = str(cond)
    # A's single-event predicate is pushed with the alias stripped...
    assert "value > 100" in s and "A" in s
    # ...B's cross-event predicate is NOT (needs bindings)
    assert "a.value" not in s and "'B'" not in s


def test_prefilter_none_when_nothing_pushable():
    from varpulis_spark.operators.sase import pattern_prefilter

    # unconditional steps
    p = Pattern(steps=[step("A", "a"), step("B", "b")],
                emit={"a_id": ("a", "event_id")})
    assert pattern_prefilter(p) is None
    # Kleene predicate (may reference its own closure through its alias)
    p2 = Pattern(
        steps=[
            step("A", "a", where=lambda e, b: e["value"] > 1,
                 where_sql="a.value > 1", kleene="+"),
            step("B", "b"),
        ],
        emit={"b_id": ("b", "event_id")},
    )
    assert pattern_prefilter(p2) is None
    # where_sql-only step: the NFA ignores it, so pushing would ADD a predicate
    p3 = Pattern(
        steps=[step("A", "a", where_sql="a.value > 1"), step("B", "b")],
        emit={"a_id": ("a", "event_id")},
    )
    assert pattern_prefilter(p3) is None
    # wildcard step consumes any type
    p4 = Pattern(
        steps=[step(None, "a", where=lambda e, b: True, where_sql="a.value > 1"),
               step("B", "b")],
        emit={"b_id": ("b", "event_id")},
    )
    assert pattern_prefilter(p4) is None


def test_prefilter_bails_on_string_literals():
    """A where_sql carrying a string literal is never pushed: the
    alias-strip regex can't tell `a.x` in code from `a.x` INSIDE a quoted
    literal (e.g. msg == 'a.x' would be corrupted to msg == 'x' and the
    prefilter would silently drop events the NFA matches)."""
    from varpulis_spark.operators.sase import pattern_prefilter

    p = Pattern(
        steps=[
            step("A", "a", where=lambda e, b: e["msg"] == "a.x",
                 where_sql="a.msg == 'a.x'"),
            step("B", "b", where=lambda e, b: True, where_sql="true"),
        ],
        emit={"a_id": ("a", "event_id")},
    )
    cond = pattern_prefilter(p)
    # the A-branch (quoted literal) must not appear; B's `true` is harmless
    assert cond is None or "a.x" not in str(cond)


def test_prefilter_string_literal_matches_unfiltered_nfa(spark):
    """End-to-end: a predicate whose literal embeds the alias prefix
    yields identical matches with and without the prefilter path."""
    rows = [
        (1, "A", "a.x", 10.0),
        (2, "A", "x", 20.0),
        (3, "B", "done", 30.0),
    ]
    df = spark.createDataFrame(rows, "event_id long, event_type string, msg string, ts double")
    from varpulis_spark.stream import Stream

    p = Pattern(
        steps=[
            step("A", "a", where=lambda e, b: e["msg"] == "a.x",
                 where_sql="a.msg == 'a.x'"),
            step("B", "b", where=lambda e, b: True, where_sql="true"),
        ],
        emit={"a_id": ("a", "event_id"), "b_id": ("b", "event_id")},
    )
    s = Stream(df.withColumn("ts", F.col("ts").cast("timestamp")), ts_col="ts")
    got = {tuple(r) for r in s.pattern(p).df.select("a_id", "b_id").collect()}
    # only event 1 has msg == 'a.x'; a corrupted prefilter (msg == 'x')
    # would instead admit event 2 and drop event 1
    assert got == {(1, 3)}


def test_prefilter_preserves_nfa_results(spark):
    """Pushdown is behavior-preserving: the NFA with the Catalyst prefilter
    returns exactly the matches of the NFA evaluating the same predicates
    in Python (where_sql stripped → no pushdown)."""
    from datetime import datetime, timedelta

    t0 = datetime(2024, 1, 1)
    rows = []
    eid = 0
    for u in range(4):
        for i in range(20):
            eid += 1
            rows.append((eid, t0 + timedelta(seconds=i), u, "A", float(i * 13 % 40)))
            eid += 1
            rows.append((eid, t0 + timedelta(seconds=i, milliseconds=500), u, "B",
                         float(i * 7 % 30)))
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double"
    )
    s = Stream(df, ts_col="ts", order_col="event_id").partition_by("user_id")

    def mk(push: bool):
        return Pattern(
            steps=[
                step("A", "a", where=lambda e, b: e["value"] > 20,
                     where_sql="a.value > 20" if push else None),
                step("B", "b", where=lambda e, b: e["value"] < 10,
                     where_sql="b.value < 10" if push else None),
            ],
            within="5s",
            force_nfa=True,  # pin the NFA path (else join compilation)
            emit={"a_id": ("a", "event_id"), "b_id": ("b", "event_id")},
        )

    got_push = ids(s.pattern(mk(True)).df.collect(), "a_id", "b_id")
    got_plain = ids(s.pattern(mk(False)).df.collect(), "a_id", "b_id")
    assert got_push == got_plain and len(got_push) > 0


def test_prefilter_appears_in_plan(spark):
    """The pushed predicate is visible in the optimized plan as a Catalyst
    filter (i.e. it runs JVM-side, not inside the Python NFA)."""
    from datetime import datetime

    df = spark.createDataFrame(
        [(1, datetime(2024, 1, 1), 1, "A", 150.0)],
        "event_id long, ts timestamp, user_id long, event_type string, value double",
    )
    s = Stream(df, ts_col="ts", order_col="event_id").partition_by("user_id")
    p = Pattern(
        steps=[
            step("A", "a", where=lambda e, b: e["value"] > 100,
                 where_sql="a.value > 100"),
            step("B", "b", where=lambda e, b: True,
                 where_sql="b.value > a.value"),
        ],
        force_nfa=True,
        emit={"a_id": ("a", "event_id")},
    )
    plan = s.pattern(p).df._jdf.queryExecution().optimizedPlan().toString()
    assert "100" in plan  # literal only reachable via the pushed filter
