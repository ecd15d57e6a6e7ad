"""CLI entry points (varpulis run / varpulis server parity,
main.rs:451-464,486): in-process main() invocations over a reference
scenario — parse, replay, per-stream output, parquet export."""

from __future__ import annotations

import io
import sys
from contextlib import redirect_stdout

from varpulis_spark.__main__ import main

FRAUD_VPL = "/root/reference/tests/scenarios/cxo_fraud_detection.vpl"
FRAUD_EVT = "/root/reference/tests/scenarios/cxo_fraud_detection.evt"


def test_cli_run_scenario(spark, tmp_path, monkeypatch):
    # reuse the test session instead of building a second JVM
    import varpulis_spark.__main__ as M

    monkeypatch.setattr(M, "_build_spark", lambda cores: spark)
    buf = io.StringIO()
    with redirect_stdout(buf):
        rc = main([
            "run", "--file", FRAUD_VPL, "--events", FRAUD_EVT,
            "--stream", "AccountTakeover", "--output", str(tmp_path / "out"),
        ])
    out = buf.getvalue()
    assert rc == 0
    assert "AccountTakeover: 1 rows" in out
    assert "attacker1" in out
    got = spark.read.parquet(str(tmp_path / "out" / "AccountTakeover")).collect()
    assert len(got) == 1 and got[0].user_id == "attacker1"


def test_cli_run_unknown_stream(spark, monkeypatch, capsys):
    import varpulis_spark.__main__ as M

    monkeypatch.setattr(M, "_build_spark", lambda cores: spark)
    rc = main(["run", "--file", FRAUD_VPL, "--events", FRAUD_EVT,
               "--stream", "NoSuchStream"])
    assert rc == 2
    assert "no stream named" in capsys.readouterr().err


def test_cli_parse_and_check(capsys):
    """`parse` / `check` (main.rs:466-484): front-end passes with no Spark
    session; parse errors and undeclared .process fns exit 1."""
    rc = main(["parse", "--file",
               "/root/reference/examples/mandelbrot/mandelbrot.vpl"])
    out = capsys.readouterr().out
    assert rc == 0
    assert "16 streams, 2 fns" in out
    assert "stream Tile00: context.process.to" in out

    rc = main(["check", "--file",
               "/root/reference/examples/functions.vpl"])
    assert rc == 0

    import tempfile

    with tempfile.NamedTemporaryFile("w", suffix=".vpl", delete=False) as f:
        f.write("stream S = Trigger\n    .process(nope())\n")
        bad = f.name
    rc = main(["check", "--file", bad])
    err = capsys.readouterr().err
    assert rc == 1 and "undeclared fn 'nope'" in err

    with tempfile.NamedTemporaryFile("w", suffix=".vpl", delete=False) as f:
        f.write("frobnicate X = y\n")
        bad = f.name
    rc = main(["parse", "--file", bad])
    err = capsys.readouterr().err
    assert rc == 1 and "parse error" in err


def test_cli_rest_client_roundtrip(spark, capsys):
    """deploy → pipelines → status → undeploy against a live in-process
    control plane (the reference CLI's REST client commands,
    main.rs:615-748)."""
    from varpulis_spark.api import PipelineServer

    srv = PipelineServer(spark).start()
    try:
        rc = main(["deploy", "--file",
                   "/root/reference/examples/hvac_quickstart.vpl",
                   "--server", srv.url])
        out = capsys.readouterr().out
        assert rc == 0 and "deployed 'hvac_quickstart' as pipeline" in out
        pid = out.strip().rsplit(" ", 1)[-1]

        rc = main(["pipelines", "--server", srv.url])
        out = capsys.readouterr().out
        assert rc == 0 and "1 pipeline(s)" in out and pid in out

        rc = main(["status", "--id", pid, "--server", srv.url])
        out = capsys.readouterr().out
        assert rc == 0 and "events_ingested: 0" in out

        rc = main(["undeploy", "--id", pid, "--server", srv.url])
        out = capsys.readouterr().out
        assert rc == 0 and "deleted" in out

        rc = main(["pipelines", "--server", srv.url])
        out = capsys.readouterr().out
        assert rc == 0 and "0 pipeline(s)" in out

        rc = main(["status", "--id", pid, "--server", srv.url])
        err = capsys.readouterr().err
        assert rc == 1 and "404" in err
    finally:
        srv.stop()


def test_cli_demo(spark, monkeypatch, capsys):
    """`demo` (main.rs:1913): seeded HVAC simulation replayed through a
    pipeline. Event cadence mirrors simulator.rs: temp per zone per tick,
    humidity every 3rd tick, HVAC status every 5th."""
    import varpulis_spark.__main__ as M

    monkeypatch.setattr(M, "_build_spark", lambda cores: spark)
    rc = main(["demo", "--duration", "3", "--eps", "5"])
    out = capsys.readouterr().out
    assert rc == 0
    # 15 ticks: 45 temp readings, 5 humidity passes x3 zones, 3 hvac
    assert "TemperatureReadings: 45 rows" in out
    assert "HumidityReadings: 15 rows" in out
    assert "HVACStatuses: 3 rows" in out

    # the demo events drive the unmodified quickstart example too
    rc = main(["demo", "--duration", "2", "--eps", "5", "--anomalies",
               "--seed", "7", "--file",
               "/root/reference/examples/hvac_quickstart.vpl"])
    out = capsys.readouterr().out
    assert rc == 0 and "Temperatures:" in out


def test_cli_config_gen_and_init(tmp_path, monkeypatch, capsys, spark):
    """config-gen / init (main.rs:600-613,749): example config emission and
    .varpulis.toml project file; client commands resolve the server URL
    from the project file when --server is omitted (resolve_url parity)."""
    monkeypatch.chdir(tmp_path)
    rc = main(["config-gen"])
    out = capsys.readouterr().out
    assert rc == 0 and "connectors:" in out and "api_key" in out
    rc = main(["config-gen", "--format", "toml"])
    assert rc == 1  # unsupported here, named in the error
    capsys.readouterr()

    rc = main(["config-gen", "--output", "cfg.yaml"])
    capsys.readouterr()
    assert rc == 0 and (tmp_path / "cfg.yaml").read_text().startswith("#")

    from varpulis_spark.api import PipelineServer

    srv = PipelineServer(spark).start()
    try:
        rc = main(["init", "--server", srv.url])
        capsys.readouterr()
        assert rc == 0
        assert f'url = "{srv.url}"' in (tmp_path / ".varpulis.toml").read_text()
        rc = main(["init", "--server", srv.url])
        assert rc == 1  # refuses to overwrite without --force
        capsys.readouterr()

        # no --server: resolved from .varpulis.toml
        rc = main(["pipelines"])
        out = capsys.readouterr().out
        assert rc == 0 and "0 pipeline(s)" in out
    finally:
        srv.stop()


def test_cli_simulate_reference_invocation(spark, tmp_path, monkeypatch):
    """`varpulis simulate` (main.rs:560-598) with the reference's exact
    flag surface runs a scenario unmodified, honors -q/--checkpoint-dir,
    and accepts the pass-through flags."""
    import json

    import varpulis_spark.__main__ as M

    monkeypatch.setattr(M, "_build_spark", lambda cores: spark)
    buf = io.StringIO()
    with redirect_stdout(buf):
        rc = main([
            "simulate", "-p", FRAUD_VPL, "-e", FRAUD_EVT,
            "--immediate", "--preload", "-q", "-w", "4",
            "--partition-by", "user_id",
            "--checkpoint-dir", str(tmp_path / "cp"),
            "--checkpoint-interval", "30",
        ])
    out = buf.getvalue()
    assert rc == 0
    assert "simulated 11 events" in out
    assert "events/sec" in out
    # quiet mode: no per-stream row dumps
    assert "== " not in out
    cp = json.load(open(tmp_path / "cp" / "checkpoint.json"))
    assert cp["events_processed"] == 11 and "stream" in cp["source"]


def test_cli_simulate_verbose_shows_outputs(spark, monkeypatch):
    import varpulis_spark.__main__ as M

    monkeypatch.setattr(M, "_build_spark", lambda cores: spark)
    buf = io.StringIO()
    with redirect_stdout(buf):
        rc = main(["simulate", "-p", FRAUD_VPL, "-e", FRAUD_EVT,
                   "--immediate", "-v"])
    out = buf.getvalue()
    assert rc == 0
    assert "AccountTakeover: 1 rows" in out
    assert "attacker1" in out
