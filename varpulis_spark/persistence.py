"""Checkpoint stores + manager (reference: runtime/src/persistence.rs).

The engine-state checkpoint in this repo is the replay-model blob the REST
API serves (`{name, source, events, version, events_processed,
output_events_emitted}` — the pipeline's full state IS its program + event
log, api.py handle_checkpoint), plus Spark's own streaming
checkpointLocations for live incremental state. This module supplies the
persistence LIFECYCLE around that blob, mirroring persistence.rs:

- `MemoryStore` / `FileStore` — the StateStore surface
  (persistence.rs:247-642): save/load/list/prune checkpoints + raw KV,
  FileStore with ':'→directory key mapping and atomic tmp+rename writes.
- `CheckpointManager` (persistence.rs:644-702): monotonically-increasing
  ids, interval gating (`should_checkpoint`), prune-to-max on every
  checkpoint, latest-wins recovery.
- `CHECKPOINT_VERSION` + `validate_and_migrate`
  (persistence.rs:705-766): future versions are rejected with the
  reference's "newer than supported" error; missing version defaults to 1
  (pre-versioning checkpoints stay loadable); past versions migrate
  forward (no migrations exist at v1, like the reference).

Checkpoints are plain JSON-able dicts; the stores serialize with JSON
(the reference's codec::CheckpointFormat::active is serde-JSON in the
default build).
"""

from __future__ import annotations

import json
import os
import threading
import time
from dataclasses import dataclass, field

CHECKPOINT_VERSION = 1


class StoreError(Exception):
    """persistence.rs StoreError analog."""


@dataclass
class CheckpointConfig:
    """persistence.rs:34-55 (interval, retention, shutdown, key prefix)."""

    interval_s: float = 60.0
    max_checkpoints: int = 3
    checkpoint_on_shutdown: bool = True
    key_prefix: str = "varpulis"


def new_checkpoint(
    *,
    source: str = "",
    name: str = "",
    events: list | None = None,
    events_processed: int = 0,
    output_events_emitted: int = 0,
) -> dict:
    """EngineCheckpoint analog (persistence.rs:714-744) for the replay
    model: program + event log + counters, stamped with the current
    schema version."""
    return {
        "version": CHECKPOINT_VERSION,
        "name": name,
        "source": source,
        "events": list(events or []),
        "events_processed": events_processed,
        "output_events_emitted": output_events_emitted,
    }


def validate_and_migrate(cp: dict) -> dict:
    """persistence.rs:746-766: reject future versions, default missing
    version to 1 (pre-versioning), apply forward migrations (none at v1).
    Mutates and returns `cp`."""
    version = cp.get("version", 1)
    if version > CHECKPOINT_VERSION:
        raise StoreError(
            f"checkpoint version {version} is newer than supported "
            f"version {CHECKPOINT_VERSION}"
        )
    # sequential migrations v → v+1 would run here; at v1 there are none
    cp["version"] = CHECKPOINT_VERSION
    return cp


class MemoryStore:
    """In-memory StateStore (persistence.rs:278-368) — tests/ephemeral."""

    def __init__(self):
        self._data: dict[str, bytes] = {}
        self._lock = threading.RLock()

    # -- checkpoint surface --------------------------------------------------
    def save_checkpoint(self, checkpoint: dict) -> None:
        key = f"checkpoint:{checkpoint['id']}"
        self.put(key, json.dumps(checkpoint).encode())

    def load_latest_checkpoint(self) -> dict | None:
        ids = self.list_checkpoints()
        return self.load_checkpoint(ids[-1]) if ids else None

    def load_checkpoint(self, cid: int) -> dict | None:
        data = self.get(f"checkpoint:{cid}")
        return json.loads(data) if data is not None else None

    def list_checkpoints(self) -> list[int]:
        with self._lock:
            ids = [
                int(k.split(":", 1)[1])
                for k in self._data
                if k.startswith("checkpoint:")
            ]
        return sorted(ids)

    def prune_checkpoints(self, keep: int) -> int:
        ids = self.list_checkpoints()
        doomed = ids[: max(0, len(ids) - keep)]
        for cid in doomed:
            self.delete(f"checkpoint:{cid}")
        return len(doomed)

    # -- raw KV ---------------------------------------------------------------
    def put(self, key: str, value: bytes) -> None:
        with self._lock:
            self._data[key] = bytes(value)

    def get(self, key: str) -> bytes | None:
        with self._lock:
            return self._data.get(key)

    def delete(self, key: str) -> None:
        with self._lock:
            self._data.pop(key, None)

    def flush(self) -> None:
        pass


class FileStore:
    """Durable file-backed StateStore (persistence.rs:529-642): keys map
    ':' → directory separators, writes are atomic (tmp + rename)."""

    def __init__(self, directory: str):
        self.dir = directory
        try:
            os.makedirs(directory, exist_ok=True)
        except OSError as e:
            raise StoreError(str(e)) from e

    @classmethod
    def open(cls, directory: str) -> "FileStore":
        return cls(directory)

    def _key_to_path(self, key: str) -> str:
        return os.path.join(self.dir, key.replace(":", os.sep))

    # -- checkpoint surface --------------------------------------------------
    def save_checkpoint(self, checkpoint: dict) -> None:
        key = f"checkpoint:{checkpoint['id']}"
        self.put(key, json.dumps(checkpoint).encode())

    def load_latest_checkpoint(self) -> dict | None:
        ids = self.list_checkpoints()
        return self.load_checkpoint(ids[-1]) if ids else None

    def load_checkpoint(self, cid: int) -> dict | None:
        data = self.get(f"checkpoint:{cid}")
        return json.loads(data) if data is not None else None

    def list_checkpoints(self) -> list[int]:
        cdir = os.path.join(self.dir, "checkpoint")
        if not os.path.isdir(cdir):
            return []
        ids = []
        for name in os.listdir(cdir):
            if name != "latest":
                try:
                    ids.append(int(name))
                except ValueError:
                    pass
        return sorted(ids)

    def prune_checkpoints(self, keep: int) -> int:
        ids = self.list_checkpoints()
        doomed = ids[: max(0, len(ids) - keep)]
        for cid in doomed:
            self.delete(f"checkpoint:{cid}")
        return len(doomed)

    # -- raw KV ---------------------------------------------------------------
    def put(self, key: str, value: bytes) -> None:
        path = self._key_to_path(key)
        try:
            os.makedirs(os.path.dirname(path), exist_ok=True)
            tmp = path + ".tmp"
            with open(tmp, "wb") as f:
                f.write(value)
            os.rename(tmp, path)
        except OSError as e:
            raise StoreError(str(e)) from e

    def get(self, key: str) -> bytes | None:
        try:
            with open(self._key_to_path(key), "rb") as f:
                return f.read()
        except FileNotFoundError:
            return None
        except OSError as e:
            raise StoreError(str(e)) from e

    def delete(self, key: str) -> None:
        try:
            os.remove(self._key_to_path(key))
        except FileNotFoundError:
            pass
        except OSError as e:
            raise StoreError(str(e)) from e

    def flush(self) -> None:
        pass


class CheckpointManager:
    """persistence.rs:644-702: id assignment, interval gating, prune on
    every checkpoint, latest-wins recovery."""

    def __init__(self, store, config: CheckpointConfig | None = None):
        self.store = store
        self.config = config or CheckpointConfig()
        latest = store.load_latest_checkpoint()
        self._next_id = (latest["id"] + 1) if latest else 1
        self._last_checkpoint = time.monotonic()

    def should_checkpoint(self) -> bool:
        return time.monotonic() - self._last_checkpoint >= self.config.interval_s

    def checkpoint(self, cp: dict) -> None:
        cp = dict(cp)
        cp["id"] = self._next_id
        cp["timestamp_ms"] = int(time.time() * 1000)
        self.store.save_checkpoint(cp)
        self.store.prune_checkpoints(self.config.max_checkpoints)
        self.store.flush()
        self._last_checkpoint = time.monotonic()
        self._next_id += 1

    def recover(self) -> dict | None:
        return self.store.load_latest_checkpoint()
