"""Ingest-limit tests (VERDICT r4 task 8 — limits.rs:1-30 +
connector/helpers.rs parity at the spool/webhook boundary)."""

from __future__ import annotations

import json

from varpulis_spark.limits import (
    MAX_ARRAY_ELEMENTS,
    MAX_EVENT_PAYLOAD_BYTES,
    MAX_FIELDS_PER_EVENT,
    MAX_JSON_DEPTH,
    MAX_STRING_VALUE_BYTES,
    payload_too_large,
    sanitize_event,
)


def test_payload_size_boundary():
    assert not payload_too_large("x" * MAX_EVENT_PAYLOAD_BYTES)
    assert payload_too_large("x" * (MAX_EVENT_PAYLOAD_BYTES + 1))
    assert payload_too_large(b"x" * (MAX_EVENT_PAYLOAD_BYTES + 1))
    # multi-byte chars: the BYTE length is what's bounded
    assert payload_too_large("é" * (MAX_EVENT_PAYLOAD_BYTES // 2 + 1))


def test_field_cap_drops_remaining_keeps_event():
    """helpers.rs:16-27: fields past MAX_FIELDS_PER_EVENT are dropped, the
    event itself survives."""
    obj = {f"f{i}": i for i in range(MAX_FIELDS_PER_EVENT + 5)}
    out, fired = sanitize_event(obj)
    assert len(out) == MAX_FIELDS_PER_EVENT
    assert "fields_truncated" in fired


def test_depth_cap_nulls_value_keeps_event():
    """json_to_value_bounded depth=0 → None: the over-deep VALUE nulls,
    siblings survive."""
    deep = 1
    for _ in range(MAX_JSON_DEPTH + 4):
        deep = {"d": deep}
    out, fired = sanitize_event({"ok": 7, "deep": deep})
    assert out["ok"] == 7
    assert "value_truncated" in fired
    # walk down: the innermost levels were nulled
    node = out["deep"]
    for _ in range(MAX_JSON_DEPTH - 2):
        node = node["d"]
    assert node is None or isinstance(node, dict)


def test_string_and_array_truncation():
    out, fired = sanitize_event(
        {
            "s": "a" * (MAX_STRING_VALUE_BYTES + 10),
            "arr": list(range(MAX_ARRAY_ELEMENTS + 10)),
        }
    )
    assert len(out["s"].encode()) == MAX_STRING_VALUE_BYTES
    assert len(out["arr"]) == MAX_ARRAY_ELEMENTS
    assert "value_truncated" in fired


def test_webhook_rejects_oversize_and_counts(tmp_path):
    """The webhook source 413s an oversize body BEFORE JSON parsing and
    counts the drop; sane events still flow; the health report surfaces
    the counters."""
    from varpulis_spark.sinks import HttpWebhookConfig, HttpWebhookSource

    src = HttpWebhookSource(
        "wh", HttpWebhookConfig(port=0), spool_dir=str(tmp_path / "spool")
    )
    big = json.dumps({"pad": "x" * (MAX_EVENT_PAYLOAD_BYTES + 10)}).encode()
    status, reply = src.handle("/event", big, {})
    assert status == 413
    assert src.drops == {"payload_too_large": 1}

    ok = json.dumps({"event_type": "T", "v": 1}).encode()
    status, _ = src.handle("/event", ok, {})
    assert status == 200

    # keep-event limits: an event with too many fields is truncated+counted
    wide = json.dumps({f"f{i}": i for i in range(MAX_FIELDS_PER_EVENT + 1)}).encode()
    status, _ = src.handle("/event", wide, {})
    assert status == 200
    assert src.drops.get("fields_truncated") == 1


def test_spool_sources_count_oversize(tmp_path):
    from varpulis_spark.sources.kinesis import KinesisConfig, KinesisSource
    from varpulis_spark.sources.mqtt import MqttConfig, MqttSource

    m = MqttSource("m", MqttConfig(broker="h", topic="t"), str(tmp_path / "m"))
    m.ingest("t", "x" * (MAX_EVENT_PAYLOAD_BYTES + 1))
    m.ingest("t", json.dumps({"v": 1}))
    assert m.drops == {"payload_too_large": 1}
    assert len(m._buf) == 1

    k = KinesisSource(
        "k", KinesisConfig(stream_name="s", region="us-east-1"), str(tmp_path / "k")
    )
    k.ingest("x" * (MAX_EVENT_PAYLOAD_BYTES + 1))
    assert k.drops == {"payload_too_large": 1}


def test_registry_health_reports_surface_drops(tmp_path):
    from varpulis_spark.registry import ConnectorRegistry

    reg = ConnectorRegistry.from_configs(
        {"wh": {"type": "webhook", "port": 0}}, spool_root=str(tmp_path)
    )
    src = reg.source("wh")
    src.handle(
        "/event",
        json.dumps({"pad": "x" * (MAX_EVENT_PAYLOAD_BYTES + 10)}).encode(),
        {},
    )
    reports = {n: rep for n, _t, rep in reg.health_reports()}
    assert reports["wh"].drops == {"payload_too_large": 1}
    reg.shutdown()
