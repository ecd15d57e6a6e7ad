"""Hamlet dynamic sharing decisions — the benefit model that decides, per
Kleene sub-pattern, whether multi-query trend aggregation processes shared
or per-query (hamlet/optimizer.rs:1-250; Hamlet, SIGMOD'21 §6).

Benefit model (optimizer.rs:10-17):

    Benefit(G_E) = NonShared(G_E) − Shared(G_E)
                 = ks·g² − (sp·g² + ks·sp)
                 = g²·(ks − sp) − ks·sp

with ks = queries sharing the sub-pattern, sp = snapshots per graphlet,
g = average graphlet size. Sharing wins when more queries share than
snapshots must be propagated (ks > sp) and graphlets are big enough to
amortize.

Relation to this engine's batch lowering (greta.trend_aggregate_multi):
queries that agree on (type, predicate, within) ride ONE DP with their
value fields as matrix columns — that sharing has NO snapshot analogue
(sp = 0), so its benefit is g²·ks > 0, always positive; the optimizer
confirms Shared. The adaptive Split/Merge machinery matters when a runtime
feeds real snapshot counts (the reference's streaming push loop — and any
future cross-predicate snapshot sharing here); decisions are honored by
trend_aggregate_multi either way, so a Split provably preserves results.
"""

from __future__ import annotations

from dataclasses import dataclass, field as dc_field

SHARED = "shared"
NON_SHARED = "non_shared"
SPLIT = "split"          # was shared; switch to per-query
MERGE = "merge"          # was per-query; switch to shared


@dataclass
class KleeneStats:
    """Per-sub-pattern statistics (KleeneStats, optimizer.rs:36-92)."""

    num_queries: int = 0
    num_snapshots: int = 0
    num_graphlets: int = 0
    total_events: int = 0
    avg_graphlet_size: float = 0.0

    def update(self, graphlet_size: int, num_snapshots: int) -> None:
        self.num_graphlets += 1
        self.num_snapshots += num_snapshots
        self.total_events += graphlet_size
        alpha = 0.1  # EMA, optimizer.rs:69-72
        self.avg_graphlet_size = (
            alpha * graphlet_size + (1.0 - alpha) * self.avg_graphlet_size
        )

    def sharing_benefit(self) -> float:
        ks = float(self.num_queries)
        sp = self.num_snapshots / max(self.num_graphlets, 1)
        g = self.avg_graphlet_size
        return g * g * (ks - sp) - ks * sp

    def should_share(self) -> bool:
        return self.num_queries > 1 and self.sharing_benefit() > 0.0


@dataclass
class OptimizerConfig:
    """Defaults mirror OptimizerConfig (optimizer.rs:109-119)."""

    min_graphlet_size: int = 4
    min_queries: int = 2
    switch_threshold: float = 100.0
    reevaluate_interval: int = 10
    adaptive: bool = True


@dataclass
class HamletOptimizer:
    """Sharing decisions with hysteresis (optimizer.rs:135-218): switching
    modes needs the benefit to clear ±switch_threshold, so borderline stats
    don't thrash; reevaluation happens every `reevaluate_interval`
    graphlets."""

    config: OptimizerConfig = dc_field(default_factory=OptimizerConfig)
    stats: dict = dc_field(default_factory=dict)
    decisions: dict = dc_field(default_factory=dict)
    _since_eval: int = 0

    def register_kleene(self, key, num_queries: int) -> None:
        self.stats[key] = KleeneStats(num_queries=num_queries)
        self.decisions[key] = (
            SHARED if num_queries >= self.config.min_queries else NON_SHARED
        )

    def decision(self, key) -> str:
        return self.decisions.get(key, NON_SHARED)

    def is_shared(self, key) -> bool:
        return self.decision(key) in (SHARED, MERGE)

    def report_graphlet(self, key, graphlet_size: int, num_snapshots: int) -> None:
        st = self.stats.get(key)
        if st is not None:
            st.update(graphlet_size, num_snapshots)
        self._since_eval += 1
        if self.config.adaptive and self._since_eval >= self.config.reevaluate_interval:
            self.reevaluate()
            self._since_eval = 0

    def reevaluate(self) -> None:
        for key, st in self.stats.items():
            current = self.decisions.get(key)
            ok = (
                st.should_share()
                and st.avg_graphlet_size >= self.config.min_graphlet_size
            )
            if current in (SHARED, MERGE):
                if ok:
                    new = SHARED
                elif st.sharing_benefit() < -self.config.switch_threshold:
                    new = SPLIT
                else:
                    new = SHARED
            elif current in (NON_SHARED, SPLIT):
                if ok and st.sharing_benefit() > self.config.switch_threshold:
                    new = MERGE
                else:
                    new = NON_SHARED
            else:
                new = SHARED if ok else NON_SHARED
            self.decisions[key] = new

    def force_decision(self, key, decision: str) -> None:
        self.decisions[key] = decision

    def reset_stats(self) -> None:
        for st in self.stats.values():
            st.num_snapshots = st.num_graphlets = st.total_events = 0
            st.avg_graphlet_size = 0.0
