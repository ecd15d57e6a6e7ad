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

    args = ap.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    raise SystemExit(main())
