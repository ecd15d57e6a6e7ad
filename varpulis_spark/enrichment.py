"""Live enrichment providers — per-row lookups with a TTL cache.

Reference: runtime/src/enrichment/ — the `EnrichmentProvider` trait
(mod.rs:43-52), TTL `EnrichmentCache` (cache.rs, MAX_ENTRIES=100_000), and
HTTP/SQL/Redis providers wired by `.enrich(Conn, ...)`.

Spark lowering and the 100 TB stance:

- A DIMENSION-TABLE source (SQL table, file, Redis snapshot) should be
  enriched with the broadcast dim join (`operators/joins.py:enrich`) — a
  per-row SQL/Redis round-trip inside a 1000-executor scan is an
  anti-pattern; `spark.read.jdbc` + broadcast is the Spark-first shape.
- A genuinely DYNAMIC source (an HTTP API, a lookup service that cannot be
  snapshotted) maps to `enrich_with_provider`: an Arrow-batched
  `mapInPandas` where each python worker holds ONE provider instance and
  ONE TTL cache (worker reuse keeps them across batches/micro-batches —
  the cache_ttl IS the refresh bound, matching EnrichConfig semantics).
  Lookups are deduplicated per batch (distinct keys), bounded by
  `timeout`, and misses fall back per field.

The HTTP provider uses stdlib urllib (no network in this sandbox — the
code path is real, tests drive Static/Callable providers through identical
plumbing).
"""

from __future__ import annotations

import json
import time
from collections.abc import Callable, Iterator
from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F  # noqa: F401 (re-export convenience)

MAX_CACHE_ENTRIES = 100_000  # cache.rs:12


class TTLCache:
    """TTL + size-bounded cache (EnrichmentCache, cache.rs)."""

    def __init__(self, ttl_s: float, max_entries: int = MAX_CACHE_ENTRIES):
        self.ttl_s = ttl_s
        self.max_entries = max_entries
        self._d: dict[str, tuple[float, dict | None]] = {}
        self.hits = 0
        self.misses = 0

    def get(self, key: str):
        ent = self._d.get(key)
        if ent is not None and ent[0] > time.monotonic():
            self.hits += 1
            return ent[1], True
        if ent is not None:
            del self._d[key]
        self.misses += 1
        return None, False

    def put(self, key: str, value: dict | None) -> None:
        if len(self._d) >= self.max_entries:
            # evict ~10% oldest-expiry entries (cache.rs evicts on cap)
            for k in sorted(self._d, key=lambda k: self._d[k][0])[
                : max(1, self.max_entries // 10)
            ]:
                del self._d[k]
        self._d[key] = (time.monotonic() + self.ttl_s, value)


@dataclass
class StaticProvider:
    """Dict-backed provider (test/dev double for any lookup service)."""

    data: dict
    name: str = "static"

    def lookup(self, key, fields: list[str]):
        row = self.data.get(key)
        if row is None:
            return None
        return {f: row.get(f) for f in fields}


@dataclass
class CallableProvider:
    """Wrap any picklable `fn(key) -> dict | None`."""

    fn: Callable
    name: str = "callable"

    def lookup(self, key, fields: list[str]):
        row = self.fn(key)
        if row is None:
            return None
        return {f: row.get(f) for f in fields}


@dataclass
class HttpProvider:
    """HTTP GET lookup: `url_template.format(key=...)` → JSON object
    (HttpEnrichmentProvider, enrichment/http.rs). Timeout per request;
    errors surface as misses (fallback applies)."""

    url_template: str
    timeout_s: float = 3.0
    headers: dict = field(default_factory=dict)
    name: str = "http"

    def lookup(self, key, fields: list[str]):
        import urllib.request

        req = urllib.request.Request(
            self.url_template.format(key=key), headers=self.headers
        )
        try:
            with urllib.request.urlopen(req, timeout=self.timeout_s) as resp:
                obj = json.loads(resp.read().decode("utf-8"))
            return {f: obj.get(f) for f in fields}
        except Exception:
            return None


# per-python-worker provider/cache instances, keyed by operator id —
# worker reuse keeps them alive across Arrow batches and micro-batches.
# LRU-bounded: each enrich call mints a fresh operator id, so an unbounded
# dict would leak one provider+cache per call for the worker's lifetime.
from collections import OrderedDict

_WORKER_STATE: "OrderedDict[str, tuple[object, TTLCache]]" = OrderedDict()
_MAX_WORKER_STATE = 64


def enrich_with_provider(
    stream,
    provider,
    key: str,
    fields: list[str] | dict[str, str],
    cache_ttl="5m",
    timeout=None,
    fallback: dict | None = None,
    status_col: str = "enrich_status",
):
    """Append `fields` looked up from `provider` per distinct key, with a
    per-worker TTL cache; adds `enrich_status` ('ok'|'cached'|'fallback',
    the reference's implicit enrich_status field).

    `fields` may be a dict name→spark-type (default: all string).
    `timeout` is a POST-HOC bound (reference EnrichmentError::Timeout): it
    is checked after the lookup returns, so a lookup that took longer is
    recorded as a miss — but a provider that HANGS still blocks the worker
    unless the provider enforces its own deadline (HttpProvider does, via
    the socket timeout; custom providers should too).
    """
    import uuid

    from varpulis_spark.functions import duration_seconds

    df = stream.df if hasattr(stream, "df") else stream
    if status_col in df.columns:
        # chained enrichments: the trailing op's status wins (reference
        # keeps a single enrich_status field)
        df = df.drop(status_col)
    ftypes = dict(fields) if isinstance(fields, dict) else {f: "string" for f in fields}
    fnames = list(ftypes)
    ttl_s = duration_seconds(cache_ttl)
    timeout_s = duration_seconds(timeout) if timeout is not None else None
    op_id = uuid.uuid4().hex
    if "enrich_latency_ms" in df.columns:
        df = df.drop("enrich_latency_ms")
    schema = (
        ", ".join(f"{c} {t}" for c, t in df.dtypes)
        + ", "
        + ", ".join(f"{n} {t}" for n, t in ftypes.items())
        + f", {status_col} string, enrich_latency_ms double"
    )
    fb = fallback or {}

    def run(batches: Iterator):
        import pandas as pd

        state = _WORKER_STATE.get(op_id)
        if state is None:
            state = (provider, TTLCache(ttl_s))
            _WORKER_STATE[op_id] = state
            while len(_WORKER_STATE) > _MAX_WORKER_STATE:
                _WORKER_STATE.popitem(last=False)  # evict least-recently-used
        else:
            _WORKER_STATE.move_to_end(op_id)
        prov, cache = state
        for pdf in batches:
            keys = pdf[key]
            resolved: dict[object, tuple[dict | None, str, float]] = {}
            for k in keys.drop_duplicates():
                ck = str(k)
                val, hit = cache.get(ck)
                if hit:
                    resolved[k] = (val, "cached", 0.0)
                    continue
                t0 = time.monotonic()
                try:
                    val = prov.lookup(k, fnames)
                except Exception:
                    val = None
                latency_ms = (time.monotonic() - t0) * 1000.0
                if timeout_s is not None and latency_ms > timeout_s * 1000.0:
                    val = None  # EnrichmentError::Timeout → miss
                cache.put(ck, val)
                resolved[k] = (
                    val, "ok" if val is not None else "fallback", latency_ms
                )
            out = pdf.copy()
            for fname in fnames:
                vals = [
                    resolved[k][0].get(fname) if resolved[k][0] is not None
                    else fb.get(fname)
                    for k in keys
                ]
                if ftypes[fname] == "string":
                    # untyped (VPL) fields surface as strings; provider
                    # values are dynamic (reference Value) — stringify
                    vals = [v if v is None or isinstance(v, str) else str(v) for v in vals]
                out[fname] = vals
            out[status_col] = [
                "fallback" if resolved[k][0] is None else resolved[k][1]
                for k in keys
            ]
            out["enrich_latency_ms"] = [resolved[k][2] for k in keys]
            yield out

    out_df = df.mapInPandas(run, schema)
    if hasattr(stream, "_with"):
        return stream._with(out_df)
    return out_df
