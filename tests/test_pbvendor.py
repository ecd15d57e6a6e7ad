"""pbvendor shim hygiene (ADVICE r10): cluster shipping via a py-files
zip instead of a driver-local PYTHONPATH, and full rollback on failure."""

import os
import zipfile

import pytest

from varpulis_spark import pbvendor


needs_shim = pytest.mark.skipif(
    not pbvendor.tws_available() or not pbvendor.shim_active(),
    reason="no bundled protobuf runtime vendored in this environment",
)


@needs_shim
def test_executor_env_ships_zip_not_driver_pythonpath():
    """A real cluster's executors don't share the driver filesystem: the
    deploy config must carry the runtime as a distributable py-files zip
    (or, fallback, ONLY the shim dir — never the driver's whole
    PYTHONPATH, which leaks unrelated driver-local entries)."""
    conf = pbvendor.executor_env()
    assert conf.get(f"spark.executorEnv.{pbvendor._SHIM_ENV}") == "true"
    if "spark.submit.pyFiles" in conf:
        assert os.path.isfile(conf["spark.submit.pyFiles"])
        assert "spark.executorEnv.PYTHONPATH" not in conf
    else:
        # fallback: shim dir only, not the concatenated driver PYTHONPATH
        pp = conf["spark.executorEnv.PYTHONPATH"]
        assert os.pathsep not in pp and pp == pbvendor._state["shim_dir"]


@needs_shim
def test_pyfiles_zip_contains_importable_protobuf_package():
    """The zip must be a self-contained google.protobuf package (zipimport
    works for pure Python): namespace __init__ plus the modules the
    StateMessage gencode imports at load time."""
    zpath = pbvendor._pyfiles_zip()
    assert zpath and os.path.isfile(zpath)
    with zipfile.ZipFile(zpath) as z:
        names = set(z.namelist())
    assert "google/__init__.py" in names
    for mod in (
        "google/protobuf/__init__.py",
        "google/protobuf/runtime_version.py",
        "google/protobuf/descriptor_pool.py",
        "google/protobuf/internal/builder.py",
    ):
        assert mod in names, f"zip missing {mod}"
    # built once, reused (idempotent — no rebuild churn per session)
    assert pbvendor._pyfiles_zip() == zpath


@needs_shim
def test_shim_exposes_only_protobuf():
    """The shim's google/ namespace must contain ONLY the protobuf
    symlink — never the SDK's sibling google.auth / google.appengine."""
    gdir = os.path.join(pbvendor._state["shim_dir"], "google")
    entries = {e for e in os.listdir(gdir) if not e.startswith("__")}
    assert entries == {"protobuf"}


def test_rollback_purges_only_protobuf_modules(tmp_path, monkeypatch):
    """A failed shim install must purge google.protobuf* from sys.modules
    but NEVER host google.* namespace siblings (google.auth, google.cloud):
    deleting those loses their module-level state and breaks isinstance
    checks against pre-existing references (ADVICE r11)."""
    import sys
    import types

    shim = str(tmp_path / "shim")
    os.makedirs(shim)
    host_pkg_dir = str(tmp_path / "host" / "google")

    g = types.ModuleType("google")
    g.__path__ = [host_pkg_dir]  # host-owned namespace, NOT the shim
    fakes = {
        "google": g,
        "google.auth": types.ModuleType("google.auth"),
        "google.cloud": types.ModuleType("google.cloud"),
        "google.protobuf": types.ModuleType("google.protobuf"),
        "google.protobuf.internal": types.ModuleType("google.protobuf.internal"),
    }
    for name, mod in fakes.items():
        monkeypatch.setitem(sys.modules, name, mod)
    monkeypatch.setenv("PYTHONPATH", shim)
    monkeypatch.setenv(pbvendor._SHIM_ENV, "true")
    monkeypatch.syspath_prepend(shim)

    pbvendor._rollback_shim(shim)

    assert "google.protobuf" not in sys.modules
    assert "google.protobuf.internal" not in sys.modules
    # host packages and the host-owned namespace survive, same objects
    assert sys.modules.get("google") is g
    assert sys.modules.get("google.auth") is fakes["google.auth"]
    assert sys.modules.get("google.cloud") is fakes["google.cloud"]
    assert shim not in sys.path
    assert pbvendor._SHIM_ENV not in os.environ


def test_rollback_drops_shim_owned_namespace(tmp_path, monkeypatch):
    """When the top-level google namespace itself resolved into the shim dir
    (no host google packages were sharing it), rollback drops it so a later
    real install re-imports cleanly."""
    import sys
    import types

    shim = str(tmp_path / "shim")
    gdir = os.path.join(shim, "google")
    os.makedirs(gdir)
    g = types.ModuleType("google")
    g.__path__ = [gdir]
    monkeypatch.setitem(sys.modules, "google", g)
    monkeypatch.setitem(
        sys.modules, "google.protobuf", types.ModuleType("google.protobuf")
    )
    pbvendor._rollback_shim(shim)
    assert "google" not in sys.modules
    assert "google.protobuf" not in sys.modules


def test_rollback_mixed_namespace_path_keeps_host_entries(tmp_path, monkeypatch):
    """Mixed namespace __path__ ([host_dir, shim_dir]) — the shim entry is
    removed IN PLACE and the module survives with the host entry, so host
    submodules (google.auth) keep a working parent (ADVICE r12: the old
    any()-then-delete dropped the whole module, leaving google.auth in
    sys.modules with a dangling parent). A sibling dir that merely
    prefix-matches the shim path string (/tmp/shim2 vs /tmp/shim) must
    NOT be treated as shim-owned."""
    import sys
    import types

    shim = str(tmp_path / "shim")
    gdir = os.path.join(shim, "google")
    os.makedirs(gdir)
    host_dir = str(tmp_path / "host" / "google")
    sibling = str(tmp_path / "shim2" / "google")  # prefix-collides w/ shim

    g = types.ModuleType("google")
    g.__path__ = [host_dir, gdir, sibling]
    auth = types.ModuleType("google.auth")
    monkeypatch.setitem(sys.modules, "google", g)
    monkeypatch.setitem(sys.modules, "google.auth", auth)
    monkeypatch.setitem(
        sys.modules, "google.protobuf", types.ModuleType("google.protobuf")
    )

    pbvendor._rollback_shim(shim)

    assert sys.modules.get("google") is g  # survives: host entries remain
    assert list(g.__path__) == [host_dir, sibling]  # only shim entry gone
    assert sys.modules.get("google.auth") is auth
    assert "google.protobuf" not in sys.modules
