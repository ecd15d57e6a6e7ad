"""Managed connector registry — one shared connector instance per declared
name (connector/managed.rs, managed_registry.rs).

`ConnectorRegistry.from_configs` plays the role of the reference's
`ManagedConnectorRegistry::from_configs` (managed_registry.rs:28-45): a
dict of connector declarations (name → {type, ...params}) constructs the
matching Source/Sink classes once, hands out shared handles, reports
health (managed.rs ConnectorHealthReport), and shuts everything down
together. The `sources(...)`/`sinks()` views plug straight into
`vpl.run_program(sources=..., sinks=...)`, closing the loop from a VPL
`connector` declaration to live I/O.

Supported types: mqtt, nats, kinesis (spooled bridges — sources + sinks),
database (sqlite/jdbc), redis, http (sink) / webhook (source),
elasticsearch, rest (client/sink).
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field


@dataclass
class ConnectorHealthReport:
    """managed.rs:16-32; `drops` adds the ingest-limit counters
    (limits.rs parity): reason → count of rejected/truncated payloads at
    the spool boundary."""

    connected: bool = True
    last_error: str | None = None
    messages_received: int = 0
    seconds_since_last_message: int = 0
    drops: dict = field(default_factory=dict)


@dataclass
class _Entry:
    kind: str
    source: object | None = None
    sink: object | None = None
    created_at: float = field(default_factory=time.time)
    last_error: str | None = None


_VPL_RENAMES = {
    # VPL declaration params (reference config field names) → our configs;
    # the managed config's generic `url:` maps onto each kind's endpoint
    # (managed_registry.rs:100-160)
    "mqtt": {"host": "broker", "url": "broker"},
    "nats": {"url": "servers", "server": "servers"},
    "kafka": {"url": "brokers"},
}


def connector_configs(source_or_program) -> dict[str, dict]:
    """VPL `connector Name = kind (k: v, ...)` declarations → registry
    config dicts (the reference's ManagedConnectorRegistry::from_configs
    input, built straight from the program like `varpulis run` does).

    Parameter expressions are const-evaluated (literals, consts, arrays);
    reference param names map onto our config fields (mqtt `host` →
    `broker`, kafka broker LISTS join to the comma string). Params our
    config classes don't carry are dropped with a warning — a declaration
    must never fail deploy over an optional tuning knob."""
    import dataclasses
    import warnings

    from varpulis_spark.vpl.compiler import ProgramEnv, _const_eval
    from varpulis_spark.vpl.parser import Program, parse_full

    prog = (
        source_or_program
        if isinstance(source_or_program, Program)
        else parse_full(source_or_program)
    )
    env = ProgramEnv()
    for v in prog.vars:
        env.vars[v.name] = _const_eval(v.value, env)

    def cfg_class(kind: str):
        if kind == "mqtt":
            from varpulis_spark.sources.mqtt import MqttConfig
            return MqttConfig
        if kind == "nats":
            from varpulis_spark.sources.nats import NatsConfig
            return NatsConfig
        if kind == "kinesis":
            from varpulis_spark.sources.kinesis import KinesisConfig
            return KinesisConfig
        if kind == "kafka":
            from varpulis_spark.sources.kafka import KafkaConfig
            return KafkaConfig
        if kind == "database":
            from varpulis_spark.sinks import DatabaseConfig
            return DatabaseConfig
        if kind == "redis":
            from varpulis_spark.sinks import RedisConfig
            return RedisConfig
        if kind == "elasticsearch":
            from varpulis_spark.sinks import ElasticsearchConfig
            return ElasticsearchConfig
        if kind == "rest":
            from varpulis_spark.sinks import RestApiConfig
            return RestApiConfig
        if kind == "webhook":
            from varpulis_spark.sinks import HttpWebhookConfig
            return HttpWebhookConfig
        return None

    out: dict[str, dict] = {}
    for c in prog.connectors:
        params = {k: _const_eval(v, env) for k, v in c.kwargs.items()}
        renames = _VPL_RENAMES.get(c.kind, {})
        params = {renames.get(k, k): v for k, v in params.items()}
        if c.kind == "kafka" and isinstance(params.get("brokers"), list):
            params["brokers"] = ",".join(params["brokers"])
        # topic/subject bind at `.from(...)` in the reference; our config
        # classes require the field — empty until bound
        if c.kind in ("mqtt", "kafka"):
            params.setdefault("topic", "")
        if c.kind == "nats":
            params.setdefault("subject", "")
        klass = cfg_class(c.kind)
        if klass is not None and dataclasses.is_dataclass(klass):
            known = {f.name for f in dataclasses.fields(klass)}
            dropped = sorted(set(params) - known)
            if dropped:
                warnings.warn(
                    f"connector '{c.name}' ({c.kind}): ignoring params "
                    f"{dropped} not carried by {klass.__name__}"
                )
            params = {k: v for k, v in params.items() if k in known}
        out[c.name] = {"type": c.kind, **params}
    return out


# type aliases (connector_registry_tests.rs:250-335): postgres/mysql/
# sqlite are database drivers, api = rest, es = elasticsearch
_TYPE_ALIASES = {
    "postgres": "database",
    "mysql": "database",
    "sqlite": "database",
    "api": "rest",
    "es": "elasticsearch",
}


def _build(name: str, cfg: dict, spool_root: str | None):
    kind = cfg.get("type")
    kind = _TYPE_ALIASES.get(kind, kind)
    params = {k: v for k, v in cfg.items() if k != "type"}
    spool = params.pop("spool_dir", None) or (
        f"{spool_root}/{name}" if spool_root else None
    )

    def need_spool():
        if spool is None:
            raise ValueError(
                f"connector '{name}' ({kind}) needs spool_dir (pass it in the "
                "config or give the registry a spool_root)"
            )
        return spool

    # the managed config's generic `url:` field maps onto each kind's
    # endpoint param, and mqtt/nats default their topic/subject wildcards
    # (managed_registry.rs:100-160)
    if "url" in params:
        endpoint = {"mqtt": "broker", "kafka": "brokers", "nats": "servers"}
        if kind in endpoint:
            params.setdefault(endpoint[kind], params.pop("url"))

    if kind == "mqtt":
        from varpulis_spark.sources.mqtt import MqttConfig, MqttSink, MqttSource

        params.setdefault("topic", "#")
        c = MqttConfig(**params)
        return _Entry(kind, MqttSource(name, c, need_spool()), MqttSink(name, c))
    if kind == "nats":
        from varpulis_spark.sources.nats import NatsConfig, NatsSink, NatsSource

        if not params.get("subject"):
            params["subject"] = ">"  # managed default (managed_registry.rs:157)
        c = NatsConfig(**params)
        return _Entry(kind, NatsSource(name, c, need_spool()), NatsSink(name, c))
    if kind == "kinesis":
        from varpulis_spark.sources.kinesis import (
            KinesisConfig, KinesisSink, KinesisSource,
        )

        c = KinesisConfig(**params)
        return _Entry(kind, KinesisSource(name, c, need_spool()),
                      KinesisSink(name, c))
    if kind == "kafka":
        from varpulis_spark.sources.kafka import (
            KafkaConfig, KafkaSinkHandle, KafkaSourceHandle,
        )

        ts_col = params.pop("ts_col", "ts")
        c = KafkaConfig(**params)
        return _Entry(
            kind, KafkaSourceHandle(name, c), KafkaSinkHandle(name, c, ts_col)
        )
    if kind == "database":
        from varpulis_spark.sinks import DatabaseConfig, DatabaseSink, DatabaseSource

        c = DatabaseConfig(**params)
        return _Entry(
            kind,
            DatabaseSource(name, c, need_spool()) if spool else None,
            DatabaseSink(name, c),
        )
    if kind == "redis":
        from varpulis_spark.sinks import RedisConfig, RedisSink

        return _Entry(kind, None, RedisSink(name, RedisConfig(**params)))
    if kind == "http":
        from varpulis_spark.sinks import HttpSink

        return _Entry(kind, None, HttpSink(name, **params))
    if kind == "webhook":
        from varpulis_spark.sinks import HttpWebhookConfig, HttpWebhookSource

        c = HttpWebhookConfig(**params)
        return _Entry(kind, HttpWebhookSource(name, c, need_spool()), None)
    if kind == "elasticsearch":
        from varpulis_spark.sinks import ElasticsearchConfig, ElasticsearchSink

        return _Entry(
            kind, None, ElasticsearchSink(name, ElasticsearchConfig(**params))
        )
    if kind == "rest":
        from varpulis_spark.sinks import RestApiConfig, RestApiSink

        path = params.pop("path", "/events")
        return _Entry(
            kind, None, RestApiSink(name, RestApiConfig(**params), path)
        )
    if kind == "console":
        from varpulis_spark.sinks import ConsoleSink

        return _Entry(kind, None, ConsoleSink(**params))
    if kind in ("s3", "file"):
        # S3/file connector (connector/s3.rs): the sink appends JSONL to
        # `path` (an s3a:// URI on a real cluster, a directory/file
        # locally); the source side is the directory replay/streaming
        # reader (streaming.file_source) bound at .from() time
        from varpulis_spark.sinks import FileSink

        path = params.get("path") or params.get("bucket") or need_spool()
        return _Entry(kind, None, FileSink(path))
    raise ValueError(f"unknown connector type '{kind}' for '{name}'")


class ConnectorRegistry:
    """One shared instance per declared connector (managed_registry.rs:22).
    First access hands out the already-constructed handle; sinks may be
    wrapped (e.g. resilient_sink_fn) by the caller without affecting the
    shared source."""

    def __init__(self, spool_root: str | None = None):
        self._entries: dict[str, _Entry] = {}
        self.spool_root = spool_root

    @classmethod
    def from_configs(cls, configs: dict[str, dict],
                     spool_root: str | None = None) -> "ConnectorRegistry":
        reg = cls(spool_root)
        for name, cfg in configs.items():
            reg._entries[name] = _build(name, cfg, spool_root)
        return reg

    @classmethod
    def from_program(cls, source: str, spool_root: str | None = None,
                     overrides: dict[str, dict] | None = None
                     ) -> "ConnectorRegistry":
        """Build the registry straight from a VPL program's `connector`
        declarations (`varpulis run`'s connector startup, main.rs:1005-1040).
        `overrides` deep-merges per-connector config on top of the declared
        params (e.g. inject credentials or a test endpoint)."""
        configs = connector_configs(source)
        for name, extra in (overrides or {}).items():
            configs.setdefault(name, {}).update(extra)
        return cls.from_configs(configs, spool_root)

    def register(self, name: str, source=None, sink=None,
                 kind: str = "custom") -> None:
        """Attach pre-built connector objects under a name."""
        self._entries[name] = _Entry(kind, source, sink)

    def _get(self, name: str) -> _Entry:
        e = self._entries.get(name)
        if e is None:
            raise KeyError(f"Unknown connector: {name}")  # managed_registry.rs:57
        return e

    def source(self, name: str):
        e = self._get(name)
        if e.source is None:
            raise ValueError(f"connector '{name}' ({e.kind}) has no source side")
        return e.source

    def sink(self, name: str):
        e = self._get(name)
        if e.sink is None:
            raise ValueError(f"connector '{name}' ({e.kind}) has no sink side")
        return e.sink

    # -- run_program views -------------------------------------------------
    def sources(self, spark, value_schemas: dict[str, str],
                streaming: bool = False) -> dict:
        """name → Stream for `run_program(sources=...)`; `value_schemas`
        maps connector name → the DDL of its event fields."""
        out = {}
        for name, schema in value_schemas.items():
            src = self.source(name)
            out[name] = (
                src.stream(spark, schema) if streaming else src.batch(spark, schema)
            )
        return out

    def sinks(self) -> dict:
        """name → sink object for `run_program(sinks=...)`."""
        return {
            n: e.sink for n, e in self._entries.items() if e.sink is not None
        }

    # -- lifecycle ---------------------------------------------------------
    def health_reports(self) -> list[tuple[str, str, ConnectorHealthReport]]:
        """(name, type, report) per connector (managed_registry.rs:80-87).
        For spooled sources: messages_received counts buffered+flushed
        ingests; seconds_since_last_message from the newest spool record."""
        out = []
        for name, e in self._entries.items():
            rep = ConnectorHealthReport(last_error=e.last_error)
            src = e.source
            if src is not None:
                buffered = len(getattr(src, "_buf", []) or [])
                seq = getattr(src, "_seq", 0)
                rep.messages_received = buffered + seq  # flushed files + pending
                rep.drops = dict(getattr(src, "drops", {}) or {})
                thread = getattr(src, "_thread", None)
                if thread is not None:
                    rep.connected = thread.is_alive()
            out.append((name, e.kind, rep))
        return out

    def shutdown(self) -> None:
        """Stop every connector that has a stop() (managed_registry.rs:90-97);
        errors are recorded per entry, not raised."""
        for name, e in self._entries.items():
            for obj in (e.source, e.sink):
                stop = getattr(obj, "stop", None)
                if callable(stop):
                    try:
                        stop()
                    except Exception as exc:  # noqa: BLE001 - parity: warn, continue
                        e.last_error = str(exc)
