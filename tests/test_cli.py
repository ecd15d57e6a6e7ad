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
