"""CLI entry points (reference: `varpulis run` / `varpulis server`,
varpulis-cli/src/main.rs:451-464,486 — SURVEY §3 entry points 1 and 2).

    python -m varpulis_spark run --file prog.vpl --events data.evt \
        [--table Conn=dim.parquet ...] [--stream NAME] [--output out_dir] \
        [--cores N]
    python -m varpulis_spark server [--host H] [--port P] [--api-key K] \
        [--cores N]

`run` parses + compiles the VPL program, replays the `.evt` file (or a
parquet events table) through it, and prints each stream's row count and
a sample — writing full results per stream as parquet when `--output` is
given. `--table` binds connector names to dimension parquet for
`.enrich`. `server` starts the REST control plane (api.py) and blocks.
"""

from __future__ import annotations

import argparse
import os
import sys


def _build_spark(cores: int | None):
    from varpulis_spark.engine import get_spark

    return get_spark("varpulis-cli", cores=cores) if cores else get_spark("varpulis-cli")


def cmd_run(args) -> int:
    from varpulis_spark.sources import load_evt
    from varpulis_spark.stream import Stream
    from varpulis_spark.vpl.compiler import run_program

    spark = _build_spark(args.cores)
    spark.sparkContext.setLogLevel("ERROR")
    with open(args.file) as f:
        source = f.read()

    if args.events.endswith(".evt"):
        events = Stream(load_evt(spark, args.events), ts_col="ts",
                        order_col="event_id")
    else:  # parquet events table (driver-testdata shape)
        from varpulis_spark.engine import read_parquet

        events = Stream(read_parquet(spark, args.events), ts_col="ts",
                        order_col="event_id")

    tables = {}
    for spec in args.table or []:
        name, _, path = spec.partition("=")
        if not path:
            print(f"--table expects Name=path.parquet, got {spec!r}",
                  file=sys.stderr)
            return 2
        from varpulis_spark.engine import read_parquet

        tables[name] = read_parquet(spark, path)

    results = run_program(source, events, tables=tables or None)
    wanted = [args.stream] if args.stream else list(results)
    for name in wanted:
        if name not in results:
            print(f"no stream named {name!r}; have {sorted(results)}",
                  file=sys.stderr)
            return 2
        df = results[name]
        n = df.count()
        print(f"== {name}: {n} rows")
        if n:
            df.show(min(args.show, n), truncate=False)
        if args.output:
            df.write.mode("overwrite").parquet(f"{args.output}/{name}")
    if args.output:
        print(f"results written under {args.output}/")
    return 0


def cmd_simulate(args) -> int:
    """`varpulis simulate` (main.rs:560-598 / Commands::Simulate
    main.rs:170-211): timed .evt replay with the reference's flag surface,
    so reference users' scripts run unmodified.

    Flag mapping onto the Spark replay model:
      --immediate      replay is ALWAYS immediate here (batch execution
                       computes all results at once); without the flag a
                       note says timing delays are not reproduced —
                       results are identical either way.
      --preload        no-op (events always load up front).
      --workers/-w     Spark cores (local[N]).
      --partition-by   accepted; partitioning comes from the program's
                       `partition by` clauses — noted, not applied.
      --quiet/-q       counts only (benchmark mode).
      --verbose/-v     show output events.
      --checkpoint-dir exact {source, event log} checkpoint written at end
                       (the replay model's checkpoint is exact by
                       construction; interval-based snapshots of a batch
                       run collapse to one final write).
    """
    import json as _json
    import time as _time

    from varpulis_spark.sources import load_evt
    from varpulis_spark.stream import Stream
    from varpulis_spark.vpl.compiler import run_program

    if not args.immediate:
        print("note: replay executes immediately; event-time offsets are "
              "honored in results, wall-clock pacing is not reproduced")
    if args.partition_by:
        print(f"note: --partition-by {args.partition_by!r} accepted; "
              "partitioning follows the program's `partition by` clauses")
    spark = _build_spark(args.workers)
    spark.sparkContext.setLogLevel("ERROR")
    with open(args.program) as f:
        source = f.read()
    t0 = _time.time()
    if args.events.endswith(".evt"):
        events = Stream(load_evt(spark, args.events), ts_col="ts",
                        order_col="event_id")
    else:
        from varpulis_spark.engine import read_parquet

        events = Stream(read_parquet(spark, args.events), ts_col="ts",
                        order_col="event_id")
    n_in = events.df.count()
    results = run_program(source, events)
    total_out = 0
    for name in sorted(results):
        df = results[name]
        n = df.count()
        total_out += n
        if args.quiet:
            continue
        print(f"== {name}: {n} rows")
        if args.verbose and n:
            df.show(min(n, 50), truncate=False)
    wall = _time.time() - t0
    print(f"simulated {n_in} events -> {total_out} outputs in {wall:.2f}s "
          f"({n_in / wall:,.0f} events/sec)")
    if args.checkpoint_dir:
        os.makedirs(args.checkpoint_dir, exist_ok=True)
        cp_path = os.path.join(args.checkpoint_dir, "checkpoint.json")
        with open(cp_path, "w") as f:
            _json.dump({"source": source, "events_file": args.events,
                        "events_processed": n_in}, f)
        print(f"checkpoint written to {cp_path}")
    return 0


def cmd_parse(args) -> int:
    """`varpulis parse` (main.rs:466-469): parse and show the program's
    declarations; exit 1 with the parse error on failure. No Spark session
    is started — this is a pure front-end pass."""
    with open(args.file) as f:
        source = f.read()
    from varpulis_spark.vpl.parser import parse_full

    try:
        prog = parse_full(source, base_path=_dirname(args.file))
    except (SyntaxError, ValueError) as ex:
        print(f"parse error: {ex}", file=sys.stderr)
        return 1
    print(f"parsed OK: {len(prog.streams)} streams, {len(prog.fns)} fns, "
          f"{len(prog.events)} events, {len(prog.patterns)} patterns, "
          f"{len(prog.connectors)} connectors, {len(prog.vars)} vars")
    for s in prog.streams:
        ops = ".".join(o.name for o in s.ops) or "passthrough"
        print(f"  stream {s.name}: {ops}")
    return 0


def cmd_check(args) -> int:
    """`varpulis check` (main.rs:481-484): syntax + the reference's full
    semantic validation pass (varpulis-core/src/validate — duplicate
    decls, op ordering, type-shaped expression checks, connector
    references, function arity; vpl/validate.py carries the code list).
    Exit 1 on any error; warnings print but do not fail."""
    with open(args.file) as f:
        source = f.read()
    from varpulis_spark.vpl.parser import Call, parse_full
    from varpulis_spark.vpl.validate import validate

    try:
        prog = parse_full(source, base_path=_dirname(args.file))
    except (SyntaxError, ValueError) as ex:
        print(f"parse error: {ex}", file=sys.stderr)
        return 1
    result = validate(prog)
    # legacy extra check kept: .process must reference a declared fn
    fn_names = {f.name for f in prog.fns}
    extra: list[str] = []
    for s in prog.streams:
        for op in s.ops:
            if op.name == "process" and op.args:
                a = op.args[0]
                if isinstance(a, Call) and a.name not in fn_names:
                    extra.append(
                        f"stream {s.name}: .process references undeclared "
                        f"fn {a.name!r}"
                    )
    out = result.format()
    if out:
        print(out, file=sys.stderr)
    for p in extra:
        print(f"error[E050]: {p}", file=sys.stderr)
    if result.errors or extra:
        return 1
    print(f"{args.file}: OK"
          + (f" ({len(result.warnings)} warning(s))" if result.warnings else ""))
    return 0


def _dirname(path: str) -> str:
    import os

    return os.path.dirname(os.path.abspath(path))


def _api(args, method: str, path: str, payload=None):
    """Tiny stdlib client for the REST control plane (the reference CLI's
    deploy/pipelines/undeploy/status commands, main.rs:615-748)."""
    import json
    import urllib.request

    server = args.server or _project_server_url() or "http://127.0.0.1:8080"
    url = f"{server.rstrip('/')}/api/v1{path}"
    data = json.dumps(payload).encode() if payload is not None else None
    req = urllib.request.Request(url, data=data, method=method)
    req.add_header("Content-Type", "application/json")
    if args.api_key:
        req.add_header("x-api-key", args.api_key)
    try:
        with urllib.request.urlopen(req, timeout=30) as resp:
            return resp.status, json.loads(resp.read() or b"{}")
    except urllib.error.HTTPError as ex:
        return ex.code, json.loads(ex.read() or b"{}")


def cmd_deploy(args) -> int:
    with open(args.file) as f:
        source = f.read()
    import os

    name = args.name or os.path.splitext(os.path.basename(args.file))[0]
    code, body = _api(args, "POST", "/pipelines",
                      {"name": name, "source": source})
    if code != 200:
        print(f"deploy failed ({code}): {body}", file=sys.stderr)
        return 1
    print(f"deployed {name!r} as pipeline {body.get('id')}")
    return 0


def cmd_pipelines(args) -> int:
    code, body = _api(args, "GET", "/pipelines")
    if code != 200:
        print(f"list failed ({code}): {body}", file=sys.stderr)
        return 1
    pipes = body.get("pipelines", [])
    print(f"{len(pipes)} pipeline(s)")
    for p in pipes:
        print(f"  {p.get('id')}  {p.get('name')}  streams={p.get('streams')}")
    return 0


def cmd_undeploy(args) -> int:
    code, body = _api(args, "DELETE", f"/pipelines/{args.id}")
    if code != 200:
        print(f"undeploy failed ({code}): {body}", file=sys.stderr)
        return 1
    print(f"pipeline {args.id} deleted")
    return 0


def cmd_status(args) -> int:
    code, body = _api(args, "GET", f"/pipelines/{args.id}/metrics")
    if code != 200:
        print(f"status failed ({code}): {body}", file=sys.stderr)
        return 1
    for k in ("id", "events_ingested", "output_rows_total", "uptime_secs"):
        print(f"{k}: {body.get(k)}")
    for et, n in sorted((body.get("events_by_type") or {}).items()):
        print(f"  {et}: {n}")
    return 0


_EXAMPLE_CONFIG_YAML = """\
# varpulis_spark example configuration (config-gen parity,
# varpulis-cli/src/config.rs:318-358 — Spark-relevant subset)
server:
  bind: 127.0.0.1
  port: 8080
  api_key: your-api-key-here
spark:
  app_name: varpulis
  cores: null          # null = SPARK_GRAFT_CPUS / local[*]
  shuffle_partitions: 32
connectors:            # name -> ConnectorRegistry config (registry.py)
  KafkaIn:
    kind: kafka
    brokers: kafka:9092
    topic: events
    group_id: varpulis-consumer
  MqttOut:
    kind: mqtt
    host: localhost
    port: 1883
logging:
  level: info
"""

_EXAMPLE_PROJECT_TOML = """\
# Varpulis project configuration (.varpulis.toml, config.rs:472)
url = "{url}"
# api_key = "your-api-key-here"
"""


def cmd_config_gen(args) -> int:
    """`varpulis config-gen` (main.rs:600-613): emit an example config."""
    if args.format.lower() not in ("yaml", "yml"):
        print(f"Unsupported format: {args.format}. Use 'yaml'.",
              file=sys.stderr)
        return 1
    if args.output:
        with open(args.output, "w") as f:
            f.write(_EXAMPLE_CONFIG_YAML)
        print(f"Configuration written to: {args.output}")
    else:
        print(_EXAMPLE_CONFIG_YAML, end="")
    return 0


def cmd_init(args) -> int:
    """`varpulis init` (main.rs:749): write .varpulis.toml with the server
    URL so the client commands can omit --server."""
    import os

    path = ".varpulis.toml"
    if os.path.exists(path) and not args.force:
        print(f"{path} already exists (use --force to overwrite)",
              file=sys.stderr)
        return 1
    with open(path, "w") as f:
        f.write(_EXAMPLE_PROJECT_TOML.format(url=args.server))
    print(f"wrote {path}")
    return 0


def _project_server_url() -> str | None:
    """Read `url` from ./.varpulis.toml if present (resolve_url parity)."""
    try:
        with open(".varpulis.toml") as f:
            for line in f:
                line = line.strip()
                if line.startswith("url") and "=" in line:
                    return line.split("=", 1)[1].strip().strip('"')
    except OSError:
        return None
    return None


_DEMO_PROGRAM = """
stream TemperatureReadings = TemperatureReading
stream HumidityReadings = HumidityReading
stream HVACStatuses = HVACStatus
"""

# the reference simulator's default building (simulator.rs:37-76)
_DEMO_ZONES = [
    ("zone_a", 22.0, 50.0, 1.0, 5.0),
    ("zone_b", 19.0, 50.0, 0.5, 3.0),
    ("zone_c", 21.0, 50.0, 2.0, 8.0),
]
_DEMO_HVAC = [("cta_main", 15.0, 8.5)]


def _demo_events(duration_s: int, eps: int, anomalies: bool,
                 degradation: bool, seed: int) -> list[tuple[float, str, dict]]:
    """One tick = one pass over the zones (simulator.rs:120-170): a
    temperature reading per zone (anomaly = +5..10 spike at p=0.05 when
    enabled, else p=0.01), humidity every 3rd tick, HVAC status every 5th
    (power drifts up / pressure down under degradation). Seeded RNG so
    demo runs are reproducible; generated instantly and replayed, not
    paced in wall-clock like the reference's live loop."""
    import random

    rng = random.Random(seed)
    p_anom = 0.05 if anomalies else 0.01
    degr = 1.0
    out: list[tuple[float, str, dict]] = []
    for tick in range(1, duration_s * eps + 1):
        t = tick / eps
        for zid, ttemp, thum, tvar, hvar in _DEMO_ZONES:
            is_anom = rng.random() < p_anom
            temp = (ttemp + rng.uniform(5.0, 10.0) if is_anom
                    else ttemp + rng.uniform(-tvar, tvar))
            out.append((t, "TemperatureReading",
                        {"sensor_id": f"{zid}_temp_01", "zone": zid,
                         "value": temp, "anomaly": is_anom}))
            if tick % 3 == 0:
                out.append((t, "HumidityReading",
                            {"sensor_id": f"{zid}_hum_01", "zone": zid,
                             "value": thum + rng.uniform(-hvar, hvar)}))
        if tick % 5 == 0:
            for hid, pwr, prs in _DEMO_HVAC:
                out.append((t, "HVACStatus",
                            {"unit_id": hid, "mode": "cooling",
                             "power_consumption": pwr * degr + rng.uniform(-0.5, 0.5),
                             "fan_speed": 1200 + rng.randint(-50, 50),
                             "compressor_pressure": prs / degr + rng.uniform(-0.1, 0.1)}))
        if degradation:
            degr += 0.0001
    return out


def cmd_demo(args) -> int:
    """`varpulis demo` (main.rs:1913-1955): the built-in HVAC building
    simulation through a pipeline — ours generates the whole run up front
    (seeded) and replays it through Spark instead of pacing wall-clock."""
    from varpulis_spark.sources.event_file import events_to_df
    from varpulis_spark.stream import Stream
    from varpulis_spark.vpl.compiler import run_program

    spark = _build_spark(args.cores)
    spark.sparkContext.setLogLevel("ERROR")
    events = _demo_events(args.duration, args.eps, args.anomalies,
                          args.degradation, args.seed)
    print("Varpulis HVAC Building Demo")
    print("================================")
    print(f"Duration: {args.duration} seconds  ({len(events)} events, "
          f"seed {args.seed})")
    print(f"Anomalies: {'enabled' if args.anomalies else 'disabled'}")
    print(f"Degradation: {'enabled' if args.degradation else 'disabled'}")
    source = _DEMO_PROGRAM
    if args.file:
        with open(args.file) as f:
            source = f.read()
    stream = Stream(events_to_df(spark, events), ts_col="ts",
                    order_col="event_id")
    results = run_program(source, stream)
    for name, df in results.items():
        print(f"== {name}: {df.count()} rows")
        df.show(min(args.show, 5), truncate=False)
    return 0


def cmd_logs(args) -> int:
    """`varpulis logs` (main.rs:772): the reference tails an SSE stream;
    ours polls GET /logs (documented divergence — stdlib server). With
    --follow, keeps polling until interrupted."""
    import json as _json
    import time as _time

    since = args.since
    while True:
        code, body = _api(args, "GET", f"/pipelines/{args.id}/logs?since={since}")
        if code != 200:
            print(f"logs failed ({code}): {body}", file=sys.stderr)
            return 1
        for entry in body.get("logs", []):
            print(_json.dumps(entry))
        since = body.get("next_offset", since)
        if not args.follow:
            return 0
        _time.sleep(args.interval)


def cmd_server(args) -> int:
    from varpulis_spark.api import PipelineServer

    spark = _build_spark(args.cores)
    spark.sparkContext.setLogLevel("ERROR")
    srv = PipelineServer(spark, host=args.host, port=args.port,
                         api_key=args.api_key).start()
    print(f"varpulis server listening on {srv.url}/api/v1  (Ctrl-C to stop)")
    try:
        import threading

        threading.Event().wait()
    except KeyboardInterrupt:
        srv.stop()
    return 0


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="python -m varpulis_spark")
    sub = ap.add_subparsers(dest="cmd", required=True)

    p_run = sub.add_parser("run", help="compile + replay a VPL program")
    p_run.add_argument("--file", required=True, help="VPL program path")
    p_run.add_argument("--events", required=True,
                       help=".evt replay file or events parquet")
    p_run.add_argument("--table", action="append",
                       help="Name=dim.parquet enrichment binding (repeatable)")
    p_run.add_argument("--stream", help="only this stream (default: all)")
    p_run.add_argument("--output", help="write per-stream parquet here")
    p_run.add_argument("--show", type=int, default=10)
    p_run.add_argument("--cores", type=int)
    p_run.set_defaults(fn=cmd_run)

    p_srv = sub.add_parser("server", help="start the REST control plane")
    p_srv.add_argument("--host", default="127.0.0.1")
    p_srv.add_argument("--port", type=int, default=8080)
    p_srv.add_argument("--api-key")
    p_srv.add_argument("--cores", type=int)
    p_srv.set_defaults(fn=cmd_server)

    p_sim = sub.add_parser(
        "simulate", help="simulate events from an event file (.evt)"
    )
    p_sim.add_argument("-p", "--program", required=True,
                       help="path to the VPL program (.vpl)")
    p_sim.add_argument("-e", "--events", required=True,
                       help="path to the event file (.evt)")
    p_sim.add_argument("--immediate", action="store_true",
                       help="run without timing delays (always true here)")
    p_sim.add_argument("-v", "--verbose", action="store_true",
                       help="verbose output (show output events)")
    p_sim.add_argument("--preload", action="store_true",
                       help="preload all events into memory (always true here)")
    p_sim.add_argument("-w", "--workers", type=int,
                       help="worker threads (Spark local[N] cores)")
    p_sim.add_argument("--partition-by", dest="partition_by",
                       help="accepted; program `partition by` wins")
    p_sim.add_argument("-q", "--quiet", action="store_true",
                       help="benchmark mode: only count outputs")
    p_sim.add_argument("--checkpoint-dir", dest="checkpoint_dir",
                       help="write a {source, event log} checkpoint here")
    p_sim.add_argument("--checkpoint-interval", dest="checkpoint_interval",
                       type=int, default=60,
                       help="accepted; batch runs write one final checkpoint")
    p_sim.set_defaults(fn=cmd_simulate)

    p_parse = sub.add_parser("parse", help="parse a VPL program and show declarations")
    p_parse.add_argument("--file", required=True)
    p_parse.set_defaults(fn=cmd_parse)

    p_check = sub.add_parser("check", help="syntax + reference checks")
    p_check.add_argument("--file", required=True)
    p_check.set_defaults(fn=cmd_check)

    def _client(p):
        # default resolves at call time: --server, else ./.varpulis.toml's
        # url (written by `init`), else localhost:8080
        p.add_argument("--server")
        p.add_argument("--api-key")

    p_dep = sub.add_parser("deploy", help="deploy a VPL program to a server")
    p_dep.add_argument("--file", required=True)
    p_dep.add_argument("--name")
    _client(p_dep)
    p_dep.set_defaults(fn=cmd_deploy)

    p_ls = sub.add_parser("pipelines", help="list deployed pipelines")
    _client(p_ls)
    p_ls.set_defaults(fn=cmd_pipelines)

    p_un = sub.add_parser("undeploy", help="delete a deployed pipeline")
    p_un.add_argument("--id", required=True)
    _client(p_un)
    p_un.set_defaults(fn=cmd_undeploy)

    p_st = sub.add_parser("status", help="show a pipeline's metrics")
    p_st.add_argument("--id", required=True)
    _client(p_st)
    p_st.set_defaults(fn=cmd_status)

    p_cg = sub.add_parser("config-gen", help="emit an example configuration")
    p_cg.add_argument("--format", default="yaml")
    p_cg.add_argument("--output")
    p_cg.set_defaults(fn=cmd_config_gen)

    p_init = sub.add_parser("init", help="write .varpulis.toml project config")
    p_init.add_argument("--server", default="http://127.0.0.1:8080")
    p_init.add_argument("--force", action="store_true")
    p_init.set_defaults(fn=cmd_init)

    p_demo = sub.add_parser("demo", help="run the built-in HVAC demo")
    p_demo.add_argument("--duration", type=int, default=10,
                        help="simulated seconds (default 10)")
    p_demo.add_argument("--eps", type=int, default=10,
                        help="ticks per simulated second")
    p_demo.add_argument("--anomalies", action="store_true")
    p_demo.add_argument("--degradation", action="store_true")
    p_demo.add_argument("--seed", type=int, default=0)
    p_demo.add_argument("--file", help="run this VPL instead of the "
                        "built-in passthrough demo program")
    p_demo.add_argument("--show", type=int, default=5)
    p_demo.add_argument("--cores", type=int)
    p_demo.set_defaults(fn=cmd_demo)

    p_lg = sub.add_parser("logs", help="fetch a pipeline's output events")
    p_lg.add_argument("--id", required=True)
    p_lg.add_argument("--since", type=int, default=0)
    p_lg.add_argument("--follow", action="store_true")
    p_lg.add_argument("--interval", type=float, default=2.0)
    _client(p_lg)
    p_lg.set_defaults(fn=cmd_logs)

    args = ap.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    raise SystemExit(main())
