"""ZDD property tests — equivalence with a naive set-of-frozensets model
(the reference crate tests the same way against HashSet<BTreeSet>,
varpulis-zdd/src/lib.rs tests), plus the compression and KleeneCapture
behaviors the crate documents."""

import random

from varpulis_spark.operators.zdd import BASE, EMPTY, KleeneCapture, ZddArena


def build_family(arena, sets):
    """Build a ZDD for an explicit family of sets via union of chains."""
    f = EMPTY
    for s in sets:
        g = BASE
        for v in sorted(s):
            g = arena._mk(v, EMPTY, g)  # exactly-this-set chain
        f = arena.union(f, g)
    return f


def enumerate_family(arena, f):
    return {frozenset(s) for s in arena.iter_sets(f)}


def test_chain_compression():
    """2^20 combinations in ~20 nodes (lib.rs doc example)."""
    a = ZddArena()
    f = a.base()
    for v in range(20):
        f = a.product_with_optional(f, v)
    assert a.count(f) == 2 ** 20
    assert a.node_count(f) < 500  # crate asserts the same bound
    assert a.node_count(f) == 20  # chain: exactly one node per variable
    assert a.contains(f, [0, 5, 10, 15, 19])
    assert a.contains(f, [])
    assert not a.contains(f, [20])


def test_product_with_optional_requires_append_order():
    a = ZddArena()
    f = a.product_with_optional(a.base(), 5)
    try:
        a.product_with_optional(f, 3)
        raise AssertionError("expected ValueError")
    except ValueError:
        pass


def test_union_intersection_difference_vs_naive():
    rng = random.Random(7)
    a = ZddArena()
    for _trial in range(40):
        fam1 = {frozenset(rng.sample(range(8), rng.randint(0, 5)))
                for _ in range(rng.randint(0, 10))}
        fam2 = {frozenset(rng.sample(range(8), rng.randint(0, 5)))
                for _ in range(rng.randint(0, 10))}
        f, g = build_family(a, fam1), build_family(a, fam2)
        assert enumerate_family(a, f) == fam1  # round-trip
        assert enumerate_family(a, a.union(f, g)) == fam1 | fam2
        assert enumerate_family(a, a.intersection(f, g)) == fam1 & fam2
        assert enumerate_family(a, a.difference(f, g)) == fam1 - fam2
        assert a.count(f) == len(fam1)
        for s in fam1:
            assert a.contains(f, s)


def test_canonicity():
    """Equal families hash-cons to the SAME node id regardless of build
    order — the canonical-form property that makes f == g an O(1) check."""
    a = ZddArena()
    fam = [{1, 3}, {2}, {1, 2, 3}, set()]
    f = build_family(a, fam)
    g = build_family(a, list(reversed(fam)))
    assert f == g


def test_kleene_capture_counts_and_enumerates():
    kc = KleeneCapture()
    for i in range(10):
        kc.extend_simple({"i": i})
    assert kc.combination_count() == 2 ** 10
    combos = list(kc.iter_combinations())
    assert len(combos) == 2 ** 10
    assert [] in combos
    assert [{"i": i} for i in range(10)] in combos


def test_kleene_capture_deferred_filter():
    """Deferred predicate applied during enumeration (SIGMOD'14 postponed
    evaluation; enumerate_with_filter sase.rs): only passing, non-empty
    combos come out, capped at max_results."""
    kc = KleeneCapture(deferred_predicate=lambda evs: sum(e["v"] for e in evs) % 2 == 0)
    for i in range(6):
        kc.extend({"v": i}, alias="b")
    assert kc.needs_zdd and kc.node_count() == 6
    got = list(kc.enumerate_with_filter(max_results=10_000))
    # brute-force expectation: non-empty subsets with even sum
    from itertools import combinations

    want = 0
    idx = list(range(6))
    for r in range(1, 7):
        for c in combinations(idx, r):
            if sum(c) % 2 == 0:
                want += 1
    assert len(got) == want
    assert all(sum(e["v"] for e in evs) % 2 == 0 for evs in got)
    capped = list(kc.enumerate_with_filter(max_results=3))
    assert len(capped) == 3
