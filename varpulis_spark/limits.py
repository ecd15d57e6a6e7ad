"""Ingest resource limits (reference: runtime/src/limits.rs:1-30 +
connector/helpers.rs json_to_event/json_to_value_bounded).

These bound memory allocation at the ingest boundary so a malformed or
hostile payload cannot OOM the driver-side spool or the executors. The
enforcement semantics mirror the reference exactly:

- payload larger than MAX_EVENT_PAYLOAD_BYTES → the EVENT IS DROPPED
  before JSON parsing (kafka.rs:262-269, http.rs request cap);
- more than MAX_FIELDS_PER_EVENT top-level fields → remaining fields are
  DROPPED, the event is kept (helpers.rs:16-27);
- a value nested deeper than MAX_JSON_DEPTH → that VALUE becomes null,
  the event is kept (json_to_value_bounded depth=0 → None);
- strings above MAX_STRING_VALUE_BYTES are truncated; arrays above
  MAX_ARRAY_ELEMENTS are truncated (helpers.rs:55-80).

`sanitize_event` applies the keep-event rules and reports which fired, so
spool sources can count drops/truncations for health reports.
"""

from __future__ import annotations

MAX_EVENT_PAYLOAD_BYTES = 1_048_576  # limits.rs:8
MAX_FIELDS_PER_EVENT = 1_024  # limits.rs:12
MAX_STRING_VALUE_BYTES = 262_144  # limits.rs:16
MAX_JSON_DEPTH = 32  # limits.rs:20
MAX_ARRAY_ELEMENTS = 10_000  # limits.rs:23


def payload_too_large(payload: str | bytes) -> bool:
    """Size check on the RAW payload, before any parsing (the reject-event
    rule). str payloads measure their utf-8 byte length."""
    n = len(payload.encode("utf-8")) if isinstance(payload, str) else len(payload)
    return n > MAX_EVENT_PAYLOAD_BYTES


def _bound_value(v, depth: int):
    """json_to_value_bounded (helpers.rs:41-100): depth-exhausted values
    become None; strings/arrays truncate. Returns (value, truncated?)."""
    if depth <= 0:
        return None, True
    if isinstance(v, str):
        b = v.encode("utf-8")
        if len(b) > MAX_STRING_VALUE_BYTES:
            return b[:MAX_STRING_VALUE_BYTES].decode("utf-8", "ignore"), True
        return v, False
    if isinstance(v, list):
        trunc = len(v) > MAX_ARRAY_ELEMENTS
        out = []
        for x in v[:MAX_ARRAY_ELEMENTS]:
            bx, tx = _bound_value(x, depth - 1)
            trunc |= tx
            out.append(bx)
        return out, trunc
    if isinstance(v, dict):
        trunc = False
        out = {}
        for k, x in v.items():
            bx, tx = _bound_value(x, depth - 1)
            trunc |= tx
            out[k] = bx
        return out, trunc
    return v, False


def sanitize_event(obj: dict) -> tuple[dict, list[str]]:
    """Apply the keep-event limits to a parsed payload object. Returns the
    sanitized object plus the list of limit names that fired
    (for health counters): 'fields_truncated', 'value_truncated'."""
    fired: list[str] = []
    out: dict = {}
    for i, (k, v) in enumerate(obj.items()):
        if i >= MAX_FIELDS_PER_EVENT:
            fired.append("fields_truncated")
            break
        bv, trunc = _bound_value(v, MAX_JSON_DEPTH)
        if trunc and "value_truncated" not in fired:
            fired.append("value_truncated")
        out[k] = bv
    return out, fired
