"""Property-based SASE semantics: the NFA enumerator vs a brute-force
O(2^n) oracle on random small event sequences (the reference's ZDD-test
oracle trick, SURVEY §5). Pure Python — no Spark session needed."""

from itertools import combinations

from hypothesis import given, settings
from hypothesis import strategies as st

from varpulis_spark.operators.sase import Pattern, _enumerate_matches, not_step, step

S = 1_000_000_000


def mk_events(types):
    return [
        {"event_id": i, "event_type": t, "__ts": i * S, "value": float(i)}
        for i, t in enumerate(types)
    ]


def brute_seq2(events, within_s=None):
    """All (a, b) index pairs: a is A, b is B, b after a, within budget."""
    out = []
    for i, a in enumerate(events):
        if a["event_type"] != "A":
            continue
        for b in events[i + 1:]:
            if b["event_type"] != "B":
                continue
            if within_s is not None and b["__ts"] - a["__ts"] > within_s * S:
                continue
            out.append((a["event_id"], b["event_id"]))
    return sorted(out)


def brute_seq2_neg(events, within_s=None):
    """Pairs with no C strictly between."""
    out = []
    for a_id, b_id in brute_seq2(events, within_s):
        blocked = any(
            e["event_type"] == "C" and a_id * S < e["__ts"] < b_id * S
            for e in events
        )
        if not blocked:
            out.append((a_id, b_id))
    return sorted(out)


def brute_kleene(events):
    """A → B+ → C: (a, frozenset(bs), c) for every non-empty ordered subset
    of Bs strictly between a and c."""
    out = set()
    a_idx = [i for i, e in enumerate(events) if e["event_type"] == "A"]
    c_idx = [i for i, e in enumerate(events) if e["event_type"] == "C"]
    for ai in a_idx:
        for ci in c_idx:
            if ci <= ai:
                continue
            bs = [i for i in range(ai + 1, ci) if events[i]["event_type"] == "B"]
            for r in range(1, len(bs) + 1):
                for combo in combinations(bs, r):
                    out.add((ai, tuple(combo), ci))
    return out


types_strategy = st.lists(st.sampled_from(["A", "B", "C", "X"]), min_size=0, max_size=12)


@given(types_strategy)
@settings(max_examples=200, deadline=None)
def test_seq_matches_brute_force(types):
    events = mk_events(types)
    p = Pattern(steps=[step("A", "a"), step("B", "b")],
                emit={"a": ("a", "event_id"), "b": ("b", "event_id")})
    got = sorted((r["a"], r["b"]) for r in _enumerate_matches(events, p))
    assert got == brute_seq2(events)


@given(types_strategy, st.integers(min_value=1, max_value=8))
@settings(max_examples=150, deadline=None)
def test_seq_within_matches_brute_force(types, within_s):
    events = mk_events(types)
    p = Pattern(steps=[step("A", "a"), step("B", "b")], within=f"{within_s}s",
                emit={"a": ("a", "event_id"), "b": ("b", "event_id")})
    got = sorted((r["a"], r["b"]) for r in _enumerate_matches(events, p))
    assert got == brute_seq2(events, within_s)


@given(types_strategy)
@settings(max_examples=150, deadline=None)
def test_negation_matches_brute_force(types):
    events = mk_events(types)
    p = Pattern(steps=[step("A", "a"), not_step("C"), step("B", "b")],
                emit={"a": ("a", "event_id"), "b": ("b", "event_id")})
    got = sorted((r["a"], r["b"]) for r in _enumerate_matches(events, p))
    assert got == brute_seq2_neg(events)


@given(st.lists(st.sampled_from(["A", "B", "C"]), min_size=0, max_size=9))
@settings(max_examples=100, deadline=None)
def test_kleene_matches_brute_force(types):
    events = mk_events(types)
    p = Pattern(
        steps=[step("A", "a"), step("B", "bs", kleene="+"), step("C", "c")],
        emit={"a": ("a", "event_id"), "bs": ("bs", "event_id"), "c": ("c", "event_id")},
        max_matches=1_000_000,
    )
    got = {(r["a"], tuple(r["bs"]), r["c"]) for r in _enumerate_matches(events, p)}
    assert got == brute_kleene(events)
