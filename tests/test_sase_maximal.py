"""kleene_emit='maximal' — reference RUN semantics (runs never fork,
process_runs_shared sase.rs:2691-2735): greedy closure accumulation, first
successor event completes and consumes the run (complete_run
sase.rs:3120-3131), trailing closures emit per-prefix
(CompleteAndContinue), deferred predicates enumerate ZDD combinations at
completion (CompleteMulti → enumerate_with_filter)."""

from itertools import combinations

import pytest

from varpulis_spark.operators.sase import (
    MAX_KLEENE_EVENTS,
    STRICT,
    Pattern,
    _enumerate_matches,
    step,
)

S = 1_000_000_000


def ev(i, typ, t, **extra):
    d = {"event_id": i, "event_type": typ, "__ts": t * S}
    d.update(extra)
    return d


def run(events, p):
    return _enumerate_matches(events, p)


def test_mid_pattern_first_successor_consumes_run():
    """A B B B C B C: per A-run the first C closes with ALL prior B's —
    exactly one match; the later C and B never re-fire the run."""
    events = [ev(0, "A", 0), ev(1, "B", 1), ev(2, "B", 2), ev(3, "B", 3),
              ev(4, "C", 4), ev(5, "B", 5), ev(6, "C", 6)]
    p = Pattern(
        steps=[step("A", "a"), step("B", "bs", kleene="+"), step("C", "c")],
        emit={"a": ("a", "event_id"), "bs": ("bs", "event_id"),
              "c": ("c", "event_id")},
        kleene_emit="maximal",
    )
    got = run(events, p)
    assert len(got) == 1
    assert got[0]["a"] == 0 and got[0]["bs"] == [1, 2, 3] and got[0]["c"] == 4
    # default exhaustive mode on the same input: every subset × every C
    p_all = Pattern(steps=p.steps, emit=p.emit)
    assert len(run(events, p_all)) == (2 ** 3 - 1) + (2 ** 4 - 1)


def test_one_run_per_initial_event():
    """Two A's → two runs, each closing at its own first C."""
    events = [ev(0, "A", 0), ev(1, "B", 1), ev(2, "A", 2), ev(3, "B", 3),
              ev(4, "C", 4)]
    p = Pattern(
        steps=[step("A", "a"), step("B", "bs", kleene="+"), step("C", "c")],
        emit={"a": ("a", "event_id"), "n": ("bs", "__count"),
              "c": ("c", "event_id")},
        kleene_emit="maximal",
    )
    got = sorted(run(events, p), key=lambda r: r["a"])
    assert [(r["a"], r["n"], r["c"]) for r in got] == [(0, 2, 4), (2, 1, 4)]


def test_successor_before_min_needed_is_ignored():
    """For B+ a C arriving before any B does not close (the NFA hasn't
    entered the Kleene state); the run closes at the NEXT C."""
    events = [ev(0, "A", 0), ev(1, "C", 1), ev(2, "B", 2), ev(3, "C", 3)]
    p = Pattern(
        steps=[step("A", "a"), step("B", "bs", kleene="+"), step("C", "c")],
        emit={"c": ("c", "event_id"), "n": ("bs", "__count")},
        kleene_emit="maximal",
    )
    got = run(events, p)
    assert len(got) == 1 and got[0]["c"] == 3 and got[0]["n"] == 1


def test_star_allows_empty_closure_mid_pattern():
    events = [ev(0, "A", 0), ev(1, "C", 1)]
    p = Pattern(
        steps=[step("A", "a"), step("B", "bs", kleene="*"), step("C", "c")],
        emit={"a": ("a", "event_id"), "n": ("bs", "__count")},
        kleene_emit="maximal",
    )
    got = run(events, p)
    assert len(got) == 1 and got[0]["n"] == 0


def test_trailing_closure_emits_per_prefix():
    """A B+ (trailing): CompleteAndContinue — one match per accumulated
    event, closure = the prefix so far (sase.rs:3195-3201)."""
    events = [ev(0, "A", 0), ev(1, "B", 1), ev(2, "B", 2), ev(3, "B", 3)]
    p = Pattern(
        steps=[step("A", "a"), step("B", "bs", kleene="+")],
        emit={"bs": ("bs", "event_id")},
        kleene_emit="maximal",
    )
    got = run(events, p)
    assert sorted(r["bs"] for r in got) == [[1], [1, 2], [1, 2, 3]]


def test_trailing_star_includes_empty_match():
    events = [ev(0, "A", 0), ev(1, "B", 1)]
    p = Pattern(
        steps=[step("A", "a"), step("B", "bs", kleene="*")],
        emit={"bs": ("bs", "event_id")},
        kleene_emit="maximal",
    )
    got = run(events, p)
    assert sorted(r["bs"] for r in got) == [[], [1]]


def test_within_bounds_maximal_closure():
    events = [ev(0, "A", 0), ev(1, "B", 1), ev(2, "B", 100), ev(3, "C", 101)]
    p = Pattern(
        steps=[step("A", "a"), step("B", "bs", kleene="+"), step("C", "c")],
        within="10s",
        emit={"bs": ("bs", "event_id")},
        kleene_emit="maximal",
    )
    assert run(events, p) == []  # C at 101s exceeds A+10s; run expired


def test_kleene_predicate_checked_incrementally():
    """Non-deferred maximal closures evaluate `where` at accumulation with
    the partial closure bound (iterative condition)."""
    events = [ev(0, "A", 0), ev(1, "B", 1, v=1), ev(2, "B", 2, v=5),
              ev(3, "B", 3, v=3), ev(4, "C", 4)]
    p = Pattern(
        steps=[
            step("A", "a"),
            step("B", "bs", kleene="+",
                 where=lambda e, b: not b.get("bs") or e["v"] > b["bs"][-1]["v"]),
            step("C", "c"),
        ],
        emit={"bs": ("bs", "event_id")},
        kleene_emit="maximal",
    )
    got = run(events, p)
    # rising closure: B1(v=1), B2(v=5); B3(v=3) rejected
    assert len(got) == 1 and got[0]["bs"] == [1, 2]


def test_deferred_predicate_enumerates_combinations():
    """deferred=True: accumulation is type-only; at completion every
    subset of the accumulated closure passing the predicate emits
    (CompleteMulti, capped at max_matches)."""
    vals = [4, 7, 2, 9]
    events = [ev(0, "A", 0)] + [
        ev(i + 1, "B", i + 1, v=v) for i, v in enumerate(vals)
    ] + [ev(9, "C", 8)]
    p = Pattern(
        steps=[
            step("A", "a"),
            step("B", "bs", kleene="+", deferred=True,
                 where=lambda evs, b: sum(e["v"] for e in evs) >= 10),
            step("C", "c"),
        ],
        emit={"bs": ("bs", "event_id"), "c": ("c", "event_id")},
        kleene_emit="maximal",
    )
    got = sorted(r["bs"] for r in run(events, p))
    want = sorted(
        [list(c) for r in range(1, 5) for c in combinations(range(1, 5), r)
         if sum(vals[i - 1] for i in c) >= 10]
    )
    assert got == want


def test_deferred_predicate_sees_completion_bindings():
    """The deferred predicate receives bindings as of completion — later
    aliases (the closing event) included, parity with
    evaluate_deferred_predicate(&pred, combo, &run.captured)."""
    events = [ev(0, "A", 0), ev(1, "B", 1, v=2), ev(2, "B", 2, v=5),
              ev(3, "C", 3, limit=4)]
    p = Pattern(
        steps=[
            step("A", "a"),
            step("B", "bs", kleene="+", deferred=True,
                 where=lambda evs, b: all(e["v"] < b["c"]["limit"] for e in evs)),
            step("C", "c"),
        ],
        emit={"bs": ("bs", "event_id")},
        kleene_emit="maximal",
    )
    got = sorted(r["bs"] for r in run(events, p))
    assert got == [[1]]  # only B1 (v=2 < limit 4); any combo with B2 fails


def test_deferred_requires_maximal_and_kleene():
    p_bad = Pattern(
        steps=[step("A", "a"),
               step("B", "bs", kleene="+", deferred=True, where=lambda e, b: True),
               step("C", "c")],
        emit={"n": ("bs", "__count")},
    )
    with pytest.raises(ValueError, match="maximal"):
        _enumerate_matches([ev(0, "A", 0)], p_bad)
    p_bad2 = Pattern(
        steps=[step("A", "a", deferred=True), step("B", "b")],
        emit={"a": ("a", "event_id")},
        kleene_emit="maximal",
    )
    with pytest.raises(ValueError, match="Kleene step"):
        _enumerate_matches([ev(0, "A", 0)], p_bad2)


def test_strict_maximal_rejected():
    p = Pattern(
        steps=[step("A", "a"), step("B", "bs", kleene="+"), step("C", "c")],
        strategy=STRICT,
        emit={"n": ("bs", "__count")},
        kleene_emit="maximal",
    )
    with pytest.raises(ValueError, match="strict"):
        _enumerate_matches([ev(0, "A", 0)], p)


def test_accumulation_cap_matches_reference():
    """Accumulation stops at MAX_KLEENE_EVENTS (limits check before
    extend, sase.rs:3188-3192); the run still completes with the capped
    closure."""
    events = [ev(0, "A", 0)] + [
        ev(i + 1, "B", i + 1) for i in range(MAX_KLEENE_EVENTS + 5)
    ] + [ev(99, "C", 99)]
    p = Pattern(
        steps=[step("A", "a"), step("B", "bs", kleene="+"), step("C", "c")],
        emit={"n": ("bs", "__count")},
        kleene_emit="maximal",
    )
    got = run(events, p)
    assert len(got) == 1 and got[0]["n"] == MAX_KLEENE_EVENTS


def test_shared_type_closure_and_successor():
    """Closure type == successor type: the self-loop consumes the event
    first (sase.rs:3178-3186) — B+ then B never closes early."""
    events = [ev(0, "A", 0), ev(1, "B", 1), ev(2, "B", 2)]
    p = Pattern(
        steps=[step("A", "a"), step("B", "bs", kleene="+"), step("B", "c")],
        emit={"n": ("bs", "__count")},
        kleene_emit="maximal",
    )
    # every B accumulates; no event is left to close the run
    assert run(events, p) == []


def test_vpl_kleene_emit_maximal(spark):
    """`.kleene_emit("maximal")` from the VPL front-end: one run per Login,
    closed by the first Logout with the maximal purchase closure."""
    from varpulis_spark import Stream
    from varpulis_spark.sources.event_file import load_evt
    from varpulis_spark.vpl import run_program

    src = load_evt(spark, """
Login { user_id: 1 }
Purchase { user_id: 1 }
Purchase { user_id: 1 }
Purchase { user_id: 1 }
Logout { user_id: 1 }
Logout { user_id: 1 }
""")
    stream = Stream(src, ts_col="ts", order_col="event_id")
    res = run_program("""
stream Runs = Login as a
    -> all Purchase where user_id == a.user_id as ps
    -> Logout where user_id == a.user_id as c
    .kleene_emit("maximal")
    .emit(user: a.user_id, n: len(ps))
""", stream)
    rows = res["Runs"].collect()
    assert len(rows) == 1 and rows[0].n == 3
    # default mode on the same program: 2 Logouts x subsets
    res2 = run_program("""
stream Runs = Login as a
    -> all Purchase where user_id == a.user_id as ps
    -> Logout where user_id == a.user_id as c
    .emit(user: a.user_id, n: len(ps))
""", stream)
    assert len(res2["Runs"].collect()) == 2 * (2 ** 3 - 1)
