"""Port of the reference's property battery
(crates/varpulis-runtime/tests/proptest_runtime.rs) via hypothesis:
event JSON round-trips, serializable-event round-trips, checkpoint JSON
round-trips, checkpoint version gating, and Value display determinism.

Mapping:
- Event → to_sink_payload JSON → the FileSink/Kafka sink payload built by
  `kafka_sink_frame` here; the property drives `events_to_df` (Event
  materialization) + the sink framing through Spark once per example, so
  example counts are capped to keep the suite fast.
- SerializableEvent round-trip → the REST checkpoint's event-log triples
  ([offset, type, fields]) through JSON.
- EngineCheckpoint round-trip + version invariants → persistence.py.
"""

import json
import math

from hypothesis import HealthCheck, given, settings, strategies as st

from varpulis_spark.persistence import (
    CHECKPOINT_VERSION,
    StoreError,
    new_checkpoint,
    validate_and_migrate,
)

# arb_value (proptest_runtime.rs:14-23): ints, finite floats, bools,
# [a-zA-Z0-9_ ]{0,64} strings
ARB_VALUE = st.one_of(
    st.integers(min_value=-(2**63), max_value=2**63 - 1),
    st.floats(allow_nan=False, allow_infinity=False, width=64),
    st.booleans(),
    st.text(
        alphabet="abcdefghijklmnopqrstuvwxyz"
        "ABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789_ ",
        max_size=64,
    ),
)

# arb_event (rs:26-38): [A-Z][A-Za-z0-9]{1,15} type, 0..5 fields named
# [a-z][a-z0-9_]{0,10}
ARB_EVENT_TYPE = st.from_regex(r"[A-Z][A-Za-z0-9]{1,15}", fullmatch=True)
ARB_FIELD_NAME = st.from_regex(r"[a-z][a-z0-9_]{0,10}", fullmatch=True)
ARB_FIELDS = st.dictionaries(ARB_FIELD_NAME, ARB_VALUE, max_size=5)


import pytest


@pytest.fixture(scope="module")
def spark():
    from varpulis_spark.engine import get_spark

    return get_spark("proptest-port")


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(etype=ARB_EVENT_TYPE, fields=ARB_FIELDS)
def test_event_json_roundtrip(spark, etype, fields):
    """rs:41-69 event_json_roundtrip: an Event's sink payload is valid
    JSON carrying event_type and every field — through events_to_df
    (the Event materialization) + kafka_sink_frame (to_sink_payload)."""
    from varpulis_spark.sources.event_file import events_to_df
    from varpulis_spark.sources.kafka import kafka_sink_frame

    df = events_to_df(spark, [(0.0, etype, dict(fields))])
    (row,) = kafka_sink_frame(df).collect()
    parsed = json.loads(row.value)
    assert parsed.get("event_type") == etype
    reserved = {"event_id", "ts", "event_type"}
    for key in fields:
        out_key = f"{key}_payload" if key in reserved else key
        assert out_key in parsed, f"field {key!r} missing from payload"


@settings(max_examples=100, deadline=None)
@given(etype=ARB_EVENT_TYPE, fields=ARB_FIELDS, off=st.floats(0, 1e6))
def test_serializable_event_roundtrip(etype, fields, off):
    """rs:72-88: Event → serializable form → Event preserves event_type
    and field count. Ours: the checkpoint log's [offset, type, fields]
    triple through JSON (what /checkpoint emits and /restore consumes)."""
    triple = [off, etype, fields]
    restored = json.loads(json.dumps(triple))
    assert restored[1] == etype
    assert len(restored[2]) == len(fields)
    for k, v in fields.items():
        rv = restored[2][k]
        if isinstance(v, float):
            assert rv == v or (math.isnan(v) and math.isnan(rv))
        else:
            assert rv == v


@settings(max_examples=100, deadline=None)
@given(
    events_processed=st.integers(min_value=0, max_value=2**63 - 1),
    output_emitted=st.integers(min_value=0, max_value=2**63 - 1),
)
def test_checkpoint_json_roundtrip(events_processed, output_emitted):
    """rs:91-115: checkpoint JSON round-trip preserves version+counters."""
    cp = new_checkpoint(
        source="stream S = A",
        events_processed=events_processed,
        output_events_emitted=output_emitted,
    )
    restored = json.loads(json.dumps(cp))
    assert restored["version"] == CHECKPOINT_VERSION
    assert restored["events_processed"] == events_processed
    assert restored["output_events_emitted"] == output_emitted


@settings(max_examples=100, deadline=None)
@given(future_offset=st.integers(min_value=1, max_value=999))
def test_future_versions_rejected(future_offset):
    """rs:118-140: every future version is rejected."""
    cp = new_checkpoint(source="s")
    cp["version"] = CHECKPOINT_VERSION + future_offset
    try:
        validate_and_migrate(cp)
        raise AssertionError(
            f"version {cp['version']} should be rejected "
            f"(current {CHECKPOINT_VERSION})"
        )
    except StoreError:
        pass


@settings(max_examples=50, deadline=None)
@given(version=st.integers(min_value=1, max_value=CHECKPOINT_VERSION))
def test_current_and_past_versions_accepted(version):
    """rs:143-165: current and past versions migrate cleanly."""
    cp = new_checkpoint(source="s")
    cp["version"] = version
    out = validate_and_migrate(cp)
    assert out["version"] == CHECKPOINT_VERSION


@settings(max_examples=100, deadline=None)
@given(v=ARB_VALUE)
def test_value_display_deterministic(v):
    """rs:168-173 value_debug_deterministic: the Value display used in
    sink/console output is a pure function."""
    from varpulis_spark.vpl.compiler import _vpl_display

    assert _vpl_display(v) == _vpl_display(v)
