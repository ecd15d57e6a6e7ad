"""Join-compiled patterns must agree exactly with the Python NFA.

The join path (compile_pattern_to_joins) and the NFA path (force_nfa=True)
are two lowerings of the same semantics; differential-test them on the
events table, including predicates and negation. NFA result caps
(MAX_MATCHES_PER_GROUP) don't apply to joins, so inputs stay below the cap.
"""

import pytest
from pyspark.sql import functions as F

from varpulis_spark import Stream
from varpulis_spark.operators.sase import Pattern, not_step, step


def run_both(spark, sf_dir, mk_pattern):
    s = Stream.events(spark, sf_dir).partition_by("user_id")
    join_out = s.pattern(mk_pattern(False))
    nfa_out = s.pattern(mk_pattern(True))
    cols = join_out.df.columns
    a = sorted(tuple(r[c] for c in cols) for r in join_out.df.collect())
    b = sorted(tuple(r[c] for c in cols) for r in nfa_out.df.collect())
    return a, b


def test_plain_seq_equivalence(spark, sf_dir):
    def mk(force_nfa):
        return Pattern(
            steps=[step("signup", "a"), step("purchase", "b")],
            within="24h",
            emit={"user_id": ("a", "user_id"), "a_id": ("a", "event_id"),
                  "b_id": ("b", "event_id")},
            force_nfa=force_nfa,
        )

    a, b = run_both(spark, sf_dir, mk)
    assert a == b and len(a) > 0


def test_predicated_seq_equivalence(spark, sf_dir):
    def mk(force_nfa):
        return Pattern(
            steps=[
                step("view", "a"),
                step("purchase", "b",
                     where=lambda e, bnd: e["value"] > bnd["a"]["value"],
                     where_sql="b.value > a.value"),
            ],
            within="6h",
            emit={"user_id": ("a", "user_id"), "a_id": ("a", "event_id"),
                  "b_id": ("b", "event_id"), "b_val": ("b", "value")},
            force_nfa=force_nfa,
        )

    a, b = run_both(spark, sf_dir, mk)
    assert a == b and len(a) > 0


def test_negation_equivalence(spark, sf_dir):
    def mk(force_nfa):
        return Pattern(
            steps=[step("signup", "a"), not_step("error"), step("purchase", "b")],
            within="24h",
            emit={"user_id": ("a", "user_id"), "a_id": ("a", "event_id"),
                  "b_id": ("b", "event_id")},
            force_nfa=force_nfa,
        )

    a, b = run_both(spark, sf_dir, mk)
    assert a == b and len(a) > 0


def test_trailing_negation_equivalence(spark, sf_dir):
    def mk(force_nfa):
        return Pattern(
            steps=[step("signup", "a"), step("purchase", "b"), not_step("error")],
            within="24h",
            emit={"user_id": ("a", "user_id"), "a_id": ("a", "event_id"),
                  "b_id": ("b", "event_id")},
            force_nfa=force_nfa,
        )

    a, b = run_both(spark, sf_dir, mk)
    assert a == b and len(a) > 0


def test_three_step_equivalence(spark, sf_dir):
    def mk(force_nfa):
        return Pattern(
            steps=[step("signup", "a"), step("click", "b"), step("purchase", "c")],
            within="12h",
            emit={"user_id": ("a", "user_id"), "a_id": ("a", "event_id"),
                  "b_id": ("b", "event_id"), "c_id": ("c", "event_id")},
            force_nfa=force_nfa,
        )

    a, b = run_both(spark, sf_dir, mk)
    assert a == b and len(a) > 0


def test_join_path_is_selected(spark, sf_dir):
    p = Pattern(
        steps=[step("signup", "a"), step("purchase", "b")],
        within="24h",
        emit={"a_id": ("a", "event_id")},
    )
    assert p.join_compilable()
    out = Stream.events(spark, sf_dir).partition_by("user_id").pattern(p)
    plan = out.df._jdf.queryExecution().executedPlan().toString()
    assert "FlatMapGroupsInPandas" not in plan  # no Python NFA in the plan
    assert "Join" in plan


def test_kleene_falls_back_to_nfa():
    p = Pattern(
        steps=[step("A", "a"), step("B", "bs", kleene="+")],
        emit={"a_id": ("a", "event_id")},
    )
    assert not p.join_compilable()


def test_and_any_order(spark, sf_dir):
    """AND(signup, error): both orders within the window (AndState
    sase.rs:738-772) — oracle is the two-sided time-band join."""
    import duckdb

    from varpulis_spark.operators.sase import Pattern, step

    p = Pattern(
        steps=[step("signup", "a"), step("error", "b")],
        within="2h",
        emit={"a_id": ("a", "event_id"), "b_id": ("b", "event_id")},
        any_order=True,
    )
    out = Stream.events(spark, sf_dir).partition_by("user_id").pattern(p)
    got = sorted((r.a_id, r.b_id) for r in out.df.collect())
    exp = duckdb.connect().execute(
        f"""SELECT a.event_id, b.event_id
            FROM '{sf_dir}/events.parquet' a JOIN '{sf_dir}/events.parquet' b
              ON a.user_id = b.user_id
             AND a.event_type='signup' AND b.event_type='error'
             AND a.event_id <> b.event_id
             AND abs(epoch_us(a.ts) - epoch_us(b.ts)) <= 7200000000
            ORDER BY 1, 2"""
    ).fetchall()
    assert got == sorted(tuple(r) for r in exp) and len(got) > 0


def test_pattern_or_union(spark, sf_dir):
    from varpulis_spark.operators.sase import Pattern, pattern_or, step

    p1 = Pattern(steps=[step("signup", "a"), step("purchase", "b")], within="24h",
                 emit={"a_id": ("a", "event_id"), "b_id": ("b", "event_id")})
    p2 = Pattern(steps=[step("signup", "a"), step("error", "b")], within="24h",
                 emit={"a_id": ("a", "event_id"), "b_id": ("b", "event_id")})
    s = Stream.events(spark, sf_dir).partition_by("user_id")
    both = pattern_or(s, p1, p2).count()
    assert both == s.pattern(p1).df.count() + s.pattern(p2).df.count()
