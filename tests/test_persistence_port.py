"""Port of the reference's persistence coverage battery
(crates/varpulis-runtime/tests/persistence_coverage_tests.rs, ~48 cases):
SerializableValue/Event round-trips, MemoryStore/FileStore KV +
checkpoint surfaces, CheckpointManager lifecycle (ids, pruning,
recovery, interval gating), checkpoint serde round-trips.

Mapping: SerializableValue here is plain JSON (the replay-model
checkpoint carries events as [offset, type, fields] with JSON-native
values); the store/manager surface ports 1:1 onto
varpulis_spark/persistence.py. Timestamp/Duration values have no typed
analog in the JSON model — they serialize as epoch-ms / ns integers,
asserted as such."""

import json
import time

import pytest

from varpulis_spark.persistence import (
    CHECKPOINT_VERSION,
    CheckpointConfig,
    CheckpointManager,
    FileStore,
    MemoryStore,
    new_checkpoint,
)


def roundtrip(v):
    """SerializableValue round-trip analog: value → JSON → value."""
    return json.loads(json.dumps({"v": v}))["v"]


# -- 1. SerializableValue round-trips (rs:21-143) -----------------------------


def test_serializable_value_int_round_trip():
    assert roundtrip(42) == 42
    assert roundtrip(-(2**62)) == -(2**62)


def test_serializable_value_float_round_trip():
    assert roundtrip(98.6) == 98.6


def test_serializable_value_string_round_trip():
    assert roundtrip("hello world") == "hello world"


def test_serializable_value_bool_round_trip():
    out = roundtrip(False)
    assert out is False  # not coerced to 0


def test_serializable_value_null_round_trip():
    assert roundtrip(None) is None


def test_serializable_value_array_round_trip():
    out = roundtrip([1, "two", None])
    assert out == [1, "two", None]
    assert isinstance(out[0], int) and isinstance(out[1], str)


def test_serializable_value_map_round_trip():
    out = roundtrip({"a": 1, "b": 2.0})
    assert out["a"] == 1 and out["b"] == 2.0


def test_serializable_value_nested_array_in_map():
    out = roundtrip({"arr": [1, 2], "s": "x"})
    assert out["arr"] == [1, 2] and out["arr"][0] == 1


# -- 2. SerializableEvent round-trips (rs:147-184, 843-853) -------------------


def test_serializable_event_multi_field_round_trip():
    fields = {"temp": 98.6, "count": 7, "label": "ok",
              "active": False, "extra": None}
    triple = [0.5, "SensorReading", fields]
    off, etype, f2 = json.loads(json.dumps(triple))
    assert etype == "SensorReading" and len(f2) == 5
    assert f2["temp"] == 98.6 and f2["count"] == 7
    assert f2["label"] == "ok" and f2["active"] is False and f2["extra"] is None


def test_serializable_event_timestamp_preserved():
    # timestamps ride as epoch-ms integers in the JSON model
    ts_ms = 1_700_000_000_000
    assert roundtrip(ts_ms) == ts_ms


def test_serializable_event_empty_fields():
    off, etype, fields = json.loads(json.dumps([0.0, "Empty", {}]))
    assert etype == "Empty" and fields == {}


def test_serializable_value_duration_round_trip():
    # durations serialize as ns integers (functions.duration_ns)
    from varpulis_spark.functions import duration_ns

    ns = duration_ns("5m")
    assert roundtrip(ns) == 300_000_000_000


# -- 3. MemoryStore KV + checkpoints (rs:186-302, 737-756, 855-876) -----------


def test_memory_store_put_get():
    s = MemoryStore()
    s.put("k", b"value")
    assert s.get("k") == b"value"


def test_memory_store_get_non_existent():
    assert MemoryStore().get("nope") is None


def test_memory_store_delete():
    s = MemoryStore()
    s.put("k", b"v")
    s.delete("k")
    assert s.get("k") is None


def test_memory_store_delete_non_existent():
    MemoryStore().delete("nope")  # no error


def test_memory_store_overwrite_key():
    s = MemoryStore()
    s.put("k", b"one")
    s.put("k", b"two")
    assert s.get("k") == b"two"


def test_memory_store_flush_is_noop():
    MemoryStore().flush()


def test_memory_store_list_checkpoints_empty():
    assert MemoryStore().list_checkpoints() == []


def test_memory_store_save_and_load_checkpoint():
    s = MemoryStore()
    cp = {**new_checkpoint(source="s", events_processed=3), "id": 1,
          "timestamp_ms": 0}
    s.save_checkpoint(cp)
    out = s.load_checkpoint(1)
    assert out["events_processed"] == 3 and out["id"] == 1


def test_memory_store_load_latest_checkpoint():
    s = MemoryStore()
    for i, n in ((1, 10), (2, 20), (3, 30)):
        s.save_checkpoint({**new_checkpoint(source="s", events_processed=n),
                           "id": i, "timestamp_ms": 0})
    assert s.load_latest_checkpoint()["events_processed"] == 30


def test_memory_store_load_latest_when_empty():
    assert MemoryStore().load_latest_checkpoint() is None


def test_memory_store_load_nonexistent_checkpoint():
    assert MemoryStore().load_checkpoint(404) is None


def test_memory_store_empty_value():
    s = MemoryStore()
    s.put("k", b"")
    assert s.get("k") == b""


def test_memory_store_large_value():
    s = MemoryStore()
    s.put("k", b"x" * 1_000_000)
    assert len(s.get("k")) == 1_000_000


def test_memory_store_prune_more_than_available():
    s = MemoryStore()
    s.save_checkpoint({**new_checkpoint(source="s"), "id": 1,
                       "timestamp_ms": 0})
    assert s.prune_checkpoints(10) == 0
    assert s.list_checkpoints() == [1]


# -- 4. FileStore (rs:305-485, 756-764) ----------------------------------------


def test_file_store_put_get(tmp_path):
    s = FileStore.open(str(tmp_path / "fs"))
    s.put("k", b"value")
    assert s.get("k") == b"value"


def test_file_store_colon_key_creates_subdirectory(tmp_path):
    import os

    s = FileStore.open(str(tmp_path / "fs"))
    s.put("a:b:c", b"v")
    assert s.get("a:b:c") == b"v"
    assert os.path.isfile(str(tmp_path / "fs" / "a" / "b" / "c"))


def test_file_store_get_missing_key(tmp_path):
    assert FileStore.open(str(tmp_path / "fs")).get("nope") is None


def test_file_store_delete(tmp_path):
    s = FileStore.open(str(tmp_path / "fs"))
    s.put("k", b"v")
    s.delete("k")
    assert s.get("k") is None


def test_file_store_delete_non_existent(tmp_path):
    FileStore.open(str(tmp_path / "fs")).delete("nope")


def test_file_store_overwrite(tmp_path):
    s = FileStore.open(str(tmp_path / "fs"))
    s.put("k", b"one")
    s.put("k", b"two")
    assert s.get("k") == b"two"


def test_file_store_list_checkpoints(tmp_path):
    s = FileStore.open(str(tmp_path / "fs"))
    for i in (3, 1, 2):
        s.save_checkpoint({**new_checkpoint(source="s"), "id": i,
                           "timestamp_ms": 0})
    assert s.list_checkpoints() == [1, 2, 3]  # sorted, 'latest' excluded


def test_file_store_list_checkpoints_empty(tmp_path):
    assert FileStore.open(str(tmp_path / "fs")).list_checkpoints() == []


def test_file_store_save_load_checkpoint(tmp_path):
    s = FileStore.open(str(tmp_path / "fs"))
    s.save_checkpoint({**new_checkpoint(source="s", events_processed=5),
                       "id": 2, "timestamp_ms": 9})
    out = s.load_checkpoint(2)
    assert out["events_processed"] == 5 and out["timestamp_ms"] == 9


def test_file_store_load_latest_checkpoint(tmp_path):
    s = FileStore.open(str(tmp_path / "fs"))
    for i in (1, 2):
        s.save_checkpoint({**new_checkpoint(source="s", events_processed=i),
                           "id": i, "timestamp_ms": 0})
    assert s.load_latest_checkpoint()["events_processed"] == 2


def test_file_store_prune_checkpoints(tmp_path):
    s = FileStore.open(str(tmp_path / "fs"))
    for i in range(1, 6):
        s.save_checkpoint({**new_checkpoint(source="s"), "id": i,
                           "timestamp_ms": 0})
    deleted = s.prune_checkpoints(2)
    assert deleted == 3
    assert s.list_checkpoints() == [4, 5]


def test_file_store_flush_is_noop(tmp_path):
    FileStore.open(str(tmp_path / "fs")).flush()


def test_file_store_empty_value(tmp_path):
    s = FileStore.open(str(tmp_path / "fs"))
    s.put("k", b"")
    assert s.get("k") == b""


# -- 5. CheckpointManager (rs:488-632, 878-893) --------------------------------


def test_checkpoint_manager_create_and_restore():
    m = CheckpointManager(MemoryStore())
    m.checkpoint(new_checkpoint(source="s", events_processed=12))
    cp = m.recover()
    assert cp["events_processed"] == 12 and cp["id"] == 1
    assert cp["timestamp_ms"] > 0


def test_checkpoint_manager_sequential_ids():
    m = CheckpointManager(MemoryStore(), CheckpointConfig(max_checkpoints=10))
    for i in range(3):
        m.checkpoint(new_checkpoint(source="s", events_processed=i))
    assert m.store.list_checkpoints() == [1, 2, 3]


def test_checkpoint_manager_prunes_old_checkpoints():
    m = CheckpointManager(MemoryStore(), CheckpointConfig(max_checkpoints=2))
    for i in range(5):
        m.checkpoint(new_checkpoint(source="s", events_processed=i))
    assert m.store.list_checkpoints() == [4, 5]


def test_checkpoint_manager_recover_empty_store():
    assert CheckpointManager(MemoryStore()).recover() is None


def test_checkpoint_manager_store_accessor():
    s = MemoryStore()
    assert CheckpointManager(s).store is s


def test_checkpoint_manager_resumes_id_from_existing():
    s = MemoryStore()
    s.save_checkpoint({**new_checkpoint(source="s", events_processed=50),
                       "id": 10, "timestamp_ms": 0})
    m = CheckpointManager(s, CheckpointConfig(max_checkpoints=10))
    m.checkpoint(new_checkpoint(source="s", events_processed=60))
    latest = m.recover()
    assert latest["id"] == 11 and latest["events_processed"] == 60


def test_checkpoint_manager_should_checkpoint_timing():
    m = CheckpointManager(MemoryStore(), CheckpointConfig(interval_s=0.05))
    assert not m.should_checkpoint()
    time.sleep(0.06)
    assert m.should_checkpoint()
    m.checkpoint(new_checkpoint(source="s"))
    assert not m.should_checkpoint()  # timer reset by the checkpoint


# -- 6. checkpoint serde round-trips (rs:635-735, 766-772) ---------------------


def test_checkpoint_serde_round_trip():
    cp = {**new_checkpoint(source="stream S = A", name="p1",
                           events_processed=999), "id": 7,
          "timestamp_ms": 123456789}
    decoded = json.loads(json.dumps(cp))
    assert decoded["id"] == 7
    assert decoded["timestamp_ms"] == 123456789
    assert decoded["events_processed"] == 999
    assert decoded["version"] == CHECKPOINT_VERSION


def test_checkpoint_with_events_round_trip():
    cp = new_checkpoint(
        source="stream S = TestEvent",
        events=[[0.25, "TestEvent", {"value": 42}]],
    )
    decoded = json.loads(json.dumps(cp))
    assert len(decoded["events"]) == 1
    off, etype, fields = decoded["events"][0]
    assert etype == "TestEvent" and fields["value"] == 42 and off == 0.25


def test_checkpoint_config_default_values():
    cfg = CheckpointConfig()
    assert cfg.interval_s == 60.0
    assert cfg.max_checkpoints == 3
    assert cfg.checkpoint_on_shutdown
    assert cfg.key_prefix == "varpulis"
