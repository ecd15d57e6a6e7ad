"""Zero-suppressed Decision Diagrams for Kleene-closure compression.

Python analog of the reference's `varpulis-zdd` crate (crates/varpulis-zdd/
src/lib.rs, zdd.rs, arena.rs): a family of sets stored in canonical
hash-consed form so the O(2^n) combinations of a Kleene closure take O(n)
nodes. The public surface mirrors the crate's:

- ``ZddArena.base()`` / ``ZddArena.empty()`` — {∅} and ∅
- ``product_with_optional(f, var)`` — S × {∅, {var}}, the Kleene-extend
  primitive (zdd.rs `product_with_optional`)
- ``union`` / ``intersection`` / ``difference`` — canonical set-family ops
- ``count(f)`` — number of sets in O(|nodes|), not O(2^n)
- ``iter_sets(f)`` — lazy enumeration
- ``contains(f, s)`` — membership in O(|s|)
- ``KleeneCapture`` — the SASE-side wrapper (sase.rs:553-667): captured
  events + the ZDD of valid index combinations + a deferred predicate
  applied during enumeration (SIGMOD'14 postponed evaluation).

ZDDs are published technique (Minato, DAC'93 "Zero-suppressed BDDs for set
manipulation in combinatorial problems"); this is a fresh implementation.

Convention: variables are appended in increasing order and the ROOT holds
the largest variable, matching the crate's append-at-top
`product_with_optional` (each extend wraps the current root).

This is a driver/executor-local structure: each NFA universe (one
`partition_by` group inside one `applyInPandas` task) owns its own arena —
nothing here crosses a shuffle boundary.
"""

from __future__ import annotations

from typing import Callable, Iterable, Iterator

EMPTY = 0  # the empty family ∅ (no sets)
BASE = 1   # the family {∅} (one set: the empty set)


class ZddArena:
    """Hash-consed node store with memoized operations (arena.rs: shared
    unique-table + persistent op caches + cached counts)."""

    def __init__(self):
        # ids 0/1 are the terminals; placeholders keep indexing aligned
        self._var = [-1, -1]
        self._lo = [0, 0]
        self._hi = [0, 0]
        self._unique: dict[tuple[int, int, int], int] = {}
        self._count: dict[int, int] = {EMPTY: 0, BASE: 1}
        self._cache: dict[tuple, int] = {}

    # -- construction ------------------------------------------------------
    def base(self) -> int:
        return BASE

    def empty(self) -> int:
        return EMPTY

    def _mk(self, var: int, lo: int, hi: int) -> int:
        if hi == EMPTY:  # zero-suppression: a node whose hi-branch is ∅
            return lo    # contributes nothing — collapse to lo
        key = (var, lo, hi)
        node = self._unique.get(key)
        if node is None:
            node = len(self._var)
            self._var.append(var)
            self._lo.append(lo)
            self._hi.append(hi)
            self._unique[key] = node
        return node

    def product_with_optional(self, f: int, var: int) -> int:
        """S × {∅, {var}} = S ∪ {s ∪ {var} | s ∈ S} (zdd.rs). `var` must be
        larger than every variable in `f` (append order)."""
        if f == EMPTY:
            return EMPTY
        if f != BASE and self._var[f] >= var:
            raise ValueError(
                f"product_with_optional: var {var} not above root "
                f"var {self._var[f]} (append in increasing order)"
            )
        return self._mk(var, f, f)

    # -- set-family algebra ------------------------------------------------
    def _contains_empty(self, f: int) -> bool:
        # ∅ ∈ f iff the all-lo path reaches BASE
        while f > BASE:
            f = self._lo[f]
        return f == BASE

    def union(self, f: int, g: int) -> int:
        if f == EMPTY or f == g:
            return g
        if g == EMPTY:
            return f
        if f > g:  # canonical arg order doubles cache hits
            f, g = g, f
        key = ("u", f, g)
        r = self._cache.get(key)
        if r is not None:
            return r
        if f == BASE:  # g is a node: add ∅ to g's lo-chain
            r = self._mk(self._var[g], self.union(BASE, self._lo[g]),
                         self._hi[g])
        else:
            vf, vg = self._var[f], self._var[g]
            if vf == vg:
                r = self._mk(vf, self.union(self._lo[f], self._lo[g]),
                             self.union(self._hi[f], self._hi[g]))
            elif vf > vg:
                r = self._mk(vf, self.union(self._lo[f], g), self._hi[f])
            else:
                r = self._mk(vg, self.union(f, self._lo[g]), self._hi[g])
        self._cache[key] = r
        return r

    def intersection(self, f: int, g: int) -> int:
        if f == EMPTY or g == EMPTY:
            return EMPTY
        if f == g:
            return f
        if f > g:
            f, g = g, f
        key = ("i", f, g)
        r = self._cache.get(key)
        if r is not None:
            return r
        if f == BASE:
            r = BASE if self._contains_empty(g) else EMPTY
        else:
            vf, vg = self._var[f], self._var[g]
            if vf == vg:
                r = self._mk(vf, self.intersection(self._lo[f], self._lo[g]),
                             self.intersection(self._hi[f], self._hi[g]))
            elif vf > vg:  # g has no vf — only f's vf-free sets can agree
                r = self.intersection(self._lo[f], g)
            else:
                r = self.intersection(f, self._lo[g])
        self._cache[key] = r
        return r

    def difference(self, f: int, g: int) -> int:
        if f == EMPTY or f == g:
            return EMPTY
        if g == EMPTY:
            return f
        key = ("d", f, g)
        r = self._cache.get(key)
        if r is not None:
            return r
        if f == BASE:
            r = EMPTY if self._contains_empty(g) else BASE
        elif g == BASE:
            r = self._mk(self._var[f], self.difference(self._lo[f], BASE),
                         self._hi[f])
        else:
            vf, vg = self._var[f], self._var[g]
            if vf == vg:
                r = self._mk(vf, self.difference(self._lo[f], self._lo[g]),
                             self.difference(self._hi[f], self._hi[g]))
            elif vf > vg:
                r = self._mk(vf, self.difference(self._lo[f], g), self._hi[f])
            else:
                r = self.difference(f, self._lo[g])
        self._cache[key] = r
        return r

    # -- queries -----------------------------------------------------------
    def count(self, f: int) -> int:
        """Number of sets in the family — O(|nodes|), exact bigint (no 2^n
        enumeration; zdd.rs cached counts)."""
        r = self._count.get(f)
        if r is None:
            r = self.count(self._lo[f]) + self.count(self._hi[f])
            self._count[f] = r
        return r

    def node_count(self, f: int) -> int:
        """Reachable (non-terminal) nodes under f."""
        seen: set[int] = set()
        stack = [f]
        while stack:
            x = stack.pop()
            if x <= BASE or x in seen:
                continue
            seen.add(x)
            stack.append(self._lo[x])
            stack.append(self._hi[x])
        return len(seen)

    def contains(self, f: int, s: Iterable[int]) -> bool:
        """Membership test in O(|s| + depth)."""
        want = sorted(set(s), reverse=True)  # match root-descending walk
        i = 0
        while True:
            if f == EMPTY:
                return False
            if f == BASE:
                return i == len(want)
            v = self._var[f]
            if i < len(want) and want[i] == v:
                f = self._hi[f]
                i += 1
            elif i < len(want) and want[i] > v:
                return False  # wanted var absent from remaining structure
            else:
                f = self._lo[f]

    def iter_sets(self, f: int) -> Iterator[tuple[int, ...]]:
        """Lazily yield each set as an ascending tuple of variables."""
        # iterative DFS; path holds chosen vars root→leaf (descending)
        stack: list[tuple[int, tuple[int, ...]]] = [(f, ())]
        while stack:
            node, path = stack.pop()
            if node == EMPTY:
                continue
            if node == BASE:
                yield tuple(reversed(path))
                continue
            v = self._var[node]
            # hi first so inclusion-heavy combos don't starve; order is not
            # part of the contract
            stack.append((self._lo[node], path))
            stack.append((self._hi[node], path + (v,)))


class KleeneCapture:
    """Compact Kleene capture (sase.rs:553-667): events indexed by ZDD
    variable; `extend` records an optional event (all prior combinations
    fork into with/without — O(1) new nodes); `extend_simple` skips the ZDD
    when no deferred predicate needs enumeration (needs_zdd=false fast
    path, sase.rs:3214-3221)."""

    def __init__(self, deferred_predicate: Callable | None = None):
        self.arena = ZddArena()
        self.handle = self.arena.base()
        self.events: list = []
        self.aliases: list = []
        self.next_var = 0
        self.deferred_predicate = deferred_predicate
        self.needs_zdd = deferred_predicate is not None

    def extend(self, event, alias=None) -> None:
        var = self.next_var
        self.next_var += 1
        self.events.append(event)
        self.aliases.append(alias)
        self.handle = self.arena.product_with_optional(self.handle, var)

    def extend_simple(self, event, alias=None) -> None:
        self.next_var += 1
        self.events.append(event)
        self.aliases.append(alias)

    def combination_count(self) -> int:
        """Valid combinations, O(|nodes|) (includes the empty one, matching
        the crate: 2^n for n unconstrained events)."""
        if not self.needs_zdd:
            return 2 ** self.next_var
        return self.arena.count(self.handle)

    def event_count(self) -> int:
        return len(self.events)

    def node_count(self) -> int:
        return self.arena.node_count(self.handle)

    def is_empty(self) -> bool:
        return not self.events

    def iter_combinations(self) -> Iterator[list]:
        """Yield each valid non-∅-aware combination as a list of events in
        capture order (sase.rs iter_combinations; ∅ is yielded too — the
        completion path skips it, enumerate_with_filter sase.rs)."""
        if not self.needs_zdd:
            # all subsets of the captured events, lazily
            n = len(self.events)
            for mask in range(2 ** n):
                yield [self.events[i] for i in range(n) if mask >> i & 1]
            return
        for combo in self.arena.iter_sets(self.handle):
            yield [self.events[i] for i in combo]

    def enumerate_with_filter(self, max_results: int) -> Iterator[list]:
        """Non-empty combinations passing the deferred predicate, capped —
        the CompleteMulti path (enumerate_with_filter, sase.rs). The
        predicate sees the combination's event list."""
        pred = self.deferred_predicate
        emitted = 0
        for combo in self.iter_combinations():
            if not combo:
                continue
            if pred is not None and not pred(combo):
                continue
            yield combo
            emitted += 1
            if emitted >= max_results:
                return
