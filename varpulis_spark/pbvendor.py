"""Offline protobuf vendoring for `transformWithStateInPandas`.

PySpark 4.1's arbitrary-state-v2 API (`transformWithStateInPandas`) speaks
a protobuf protocol between the Python worker and the JVM state server
(`pyspark/sql/streaming/proto/StateMessage_pb2.py`, gencode 6.33.0), so it
hard-requires a `google.protobuf` runtime that pip cannot install here
(no network). Several publicly-installed toolchains bundle a pure-Python
protobuf runtime, though; the Google Cloud SDK's app-engine platform ships
6.32.0-dev — one minor version *behind* the gencode, which the runtime's
own `ValidateProtobufRuntimeVersion` rejects but also lets you waive via
its documented `TEMPORARILY_DISABLE_PROTOBUF_VERSION_CHECK` escape hatch.
The serialized-FileDescriptorProto wire format the gencode loads through
`descriptor_pool.AddSerializedFile` is stable across that gap (plain
proto3, no editions), so the waiver is sound for this message set — and
smoke-tested end-to-end before we ever claim the API is available.

This module builds a *confined* shim: a scratch package directory exposing
ONLY `google/protobuf` (symlink into the bundled runtime — never its
sibling `google.auth` / `google.appengine` packages), prepends it to
`sys.path` AND `$PYTHONPATH` (the Python workers re-import everything in a
fresh interpreter, so the env var is what actually matters), and sets the
version-check waiver. Call :func:`ensure_protobuf` before the first
SparkSession is created so workers inherit the environment.

Everything degrades gracefully: no bundled runtime found → `False`, and
the hand-rolled `applyInPandasWithState` operators remain the default
everywhere (`transformWithStateInPandas` twins are opt-in via flags).
"""

from __future__ import annotations

import os
import sys

# Publicly-known locations of bundled pure-Python protobuf runtimes.
# Overridable (or extendable) via VARPULIS_PROTOBUF_DIR.
_CANDIDATE_RUNTIMES = (
    "/usr/lib/google-cloud-sdk/platform/google_appengine/google/protobuf",
)

_SHIM_ENV = "TEMPORARILY_DISABLE_PROTOBUF_VERSION_CHECK"

# Cached result of ensure_protobuf(): None = not yet probed.
_state: dict = {"probed": False, "available": False, "shim_dir": None}


def _runtime_usable(path: str) -> bool:
    """A bundled runtime is usable if it carries the modules the 6.x
    serialized-descriptor gencode imports at load time."""
    needed = ("runtime_version.py", "descriptor_pool.py")
    if not all(os.path.isfile(os.path.join(path, f)) for f in needed):
        return False
    return os.path.isfile(os.path.join(path, "internal", "builder.py"))


def _build_shim(runtime_dir: str) -> str | None:
    """Create (idempotently) a package dir exposing only google/protobuf."""
    import tempfile

    base = os.path.join(
        os.environ.get("XDG_CACHE_HOME", os.path.expanduser("~/.cache")),
        "varpulis_spark",
    )
    try:
        os.makedirs(base, exist_ok=True)
        shim = os.path.join(base, "pbshim")
        gdir = os.path.join(shim, "google")
        os.makedirs(gdir, exist_ok=True)
        init = os.path.join(gdir, "__init__.py")
        if not os.path.exists(init):
            with open(init, "w") as f:
                f.write("# varpulis_spark protobuf shim namespace\n")
        link = os.path.join(gdir, "protobuf")
        if os.path.islink(link):
            if os.readlink(link) != runtime_dir:
                os.unlink(link)
        if not os.path.exists(link):
            os.symlink(runtime_dir, link)
        return shim
    except OSError:
        # Read-only home etc. — fall back to a process-lifetime tempdir.
        try:
            shim = tempfile.mkdtemp(prefix="varpulis-pbshim-")
            gdir = os.path.join(shim, "google")
            os.makedirs(gdir)
            with open(os.path.join(gdir, "__init__.py"), "w") as f:
                f.write("")
            os.symlink(runtime_dir, os.path.join(gdir, "protobuf"))
            return shim
        except OSError:
            return None


def ensure_protobuf() -> bool:
    """Make `google.protobuf` importable in this process and in Spark
    Python workers, vendoring a bundled runtime if necessary.

    Returns True when `pyspark.sql.streaming.proto.StateMessage_pb2` can
    load (i.e. transformWithStateInPandas is viable). Idempotent; cheap
    after the first call. Must run before SparkSession creation for the
    PYTHONPATH/env changes to reach workers.
    """
    if _state["probed"]:
        return _state["available"]
    _state["probed"] = True

    def _gencode_loads() -> bool:
        try:
            import warnings

            with warnings.catch_warnings():
                warnings.simplefilter("ignore")
                from pyspark.sql.streaming.proto import StateMessage_pb2  # noqa: F401
            return True
        except Exception:
            return False

    # A real protobuf install wins outright.
    try:
        import google.protobuf  # noqa: F401

        _state["available"] = _gencode_loads()
        return _state["available"]
    except ImportError:
        pass

    candidates = []
    extra = os.environ.get("VARPULIS_PROTOBUF_DIR")
    if extra:
        candidates.append(extra)
    candidates.extend(_CANDIDATE_RUNTIMES)
    runtime_dir = next((c for c in candidates if _runtime_usable(c)), None)
    if runtime_dir is None:
        return False

    shim = _build_shim(runtime_dir)
    if shim is None:
        return False

    # Waive the minor-version check (gencode 6.33 vs bundled 6.32-dev) —
    # the runtime's own documented escape hatch; soundness argued in the
    # module docstring and verified by the smoke import below.
    os.environ[_SHIM_ENV] = "true"
    if shim not in sys.path:
        sys.path.insert(0, shim)
    pp = os.environ.get("PYTHONPATH", "")
    if shim not in pp.split(os.pathsep):
        os.environ["PYTHONPATH"] = shim + (os.pathsep + pp if pp else "")
    _state["shim_dir"] = shim

    _state["available"] = _gencode_loads()
    if not _state["available"]:
        _rollback_shim(shim)
        _state["shim_dir"] = None
    return _state["available"]


def _rollback_shim(shim: str) -> None:
    """Roll the shim back COMPLETELY so a broken bundled runtime can't
    shadow a later real install (ADVICE r10): waiver env var, sys.path and
    PYTHONPATH entries, and the shim's partially-imported modules."""
    os.environ.pop(_SHIM_ENV, None)
    if shim in sys.path:
        sys.path.remove(shim)
    parts = [
        p for p in os.environ.get("PYTHONPATH", "").split(os.pathsep)
        if p and p != shim
    ]
    if parts:
        os.environ["PYTHONPATH"] = os.pathsep.join(parts)
    else:
        os.environ.pop("PYTHONPATH", None)
    # purge ONLY what the shim imported: google.protobuf and below. Other
    # google.* namespace packages (google.auth, google.cloud, ...) belong to
    # the host — deleting them loses their module-level state and breaks
    # isinstance checks against pre-existing references in long-running
    # processes (ADVICE r11).
    for mod in [
        m for m in sys.modules
        if m == "google.protobuf" or m.startswith("google.protobuf.")
    ]:
        del sys.modules[mod]
    g = sys.modules.get("google")
    if g is not None:
        # Remove the shim entry from the namespace __path__ IN PLACE: with
        # a mixed __path__ ([host_dir, shim_dir]) dropping the whole module
        # would leave host submodules (google.auth, ...) in sys.modules
        # with a dangling parent (ADVICE r12). Compare realpath + os.sep so
        # a sibling dir (/tmp/shim2 vs /tmp/shim) can't prefix-match.
        shim_real = os.path.realpath(shim)
        paths = list(getattr(g, "__path__", None) or [])
        kept = [
            p for p in paths
            if not (
                os.path.realpath(str(p)) == shim_real
                or os.path.realpath(str(p)).startswith(shim_real + os.sep)
            )
        ]
        if kept != paths:
            if kept:
                try:
                    g.__path__ = kept
                except Exception:  # frozen/odd namespace object
                    pass
            else:
                # every entry pointed into the shim — nothing of the host's
                # lives under this namespace, safe to drop entirely
                del sys.modules["google"]


def tws_available() -> bool:
    """True when transformWithStateInPandas can run (protobuf loadable)."""
    return ensure_protobuf()


def shim_active() -> bool:
    return _state.get("shim_dir") is not None


def _pyfiles_zip() -> str | None:
    """Zip the vendored runtime (google/__init__ + google/protobuf/**.py,
    symlinks resolved) next to the shim so real clusters can ship it via
    `spark.submit.pyFiles` — executor machines do NOT share the driver's
    filesystem, so a bare PYTHONPATH pointing at the driver-local shim
    would 404 there (ADVICE r10). ~0.5 MB zipped; built once, reused."""
    shim = _state.get("shim_dir")
    if not shim:
        return None
    zpath = os.path.join(shim, "pbshim.zip")
    if os.path.isfile(zpath):
        return zpath
    import zipfile

    gdir = os.path.join(shim, "google")
    try:
        with zipfile.ZipFile(zpath + ".tmp", "w", zipfile.ZIP_DEFLATED) as z:
            z.writestr("google/__init__.py", "")
            runtime = os.path.realpath(os.path.join(gdir, "protobuf"))
            for root, _dirs, files in os.walk(runtime):
                rel_root = os.path.relpath(root, runtime)
                for f in sorted(files):
                    if not f.endswith(".py"):
                        continue
                    arc = os.path.normpath(
                        os.path.join("google/protobuf", rel_root, f)
                    )
                    z.write(os.path.join(root, f), arc)
        os.replace(zpath + ".tmp", zpath)
        return zpath
    except OSError:
        return None


def executor_env() -> dict[str, str]:
    """Builder configs a deploy needs when the shim is active. Local mode
    inherits os.environ; a real cluster gets the runtime shipped as a
    py-files zip (distributed by Spark's file server — no shared-filesystem
    assumption) plus the version-check waiver in the executor env. Only the
    shim path is exported, never the driver's whole PYTHONPATH."""
    if not shim_active():
        return {}
    conf = {f"spark.executorEnv.{_SHIM_ENV}": "true"}
    zpath = _pyfiles_zip()
    if zpath:
        conf["spark.submit.pyFiles"] = zpath
    else:
        # Fallback: shim path only — requires a shared filesystem; documented.
        conf["spark.executorEnv.PYTHONPATH"] = _state["shim_dir"]
    return conf
