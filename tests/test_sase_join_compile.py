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
