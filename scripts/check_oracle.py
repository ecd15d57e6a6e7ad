"""Differential check: run every __spark_entry__ query against its DuckDB
oracle and compare row count + (column-name-sorted, row-sorted) values —
the same shape of comparison the round driver performs.

Usage: python scripts/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys
import time

import duckdb

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entrymod  # noqa: E402
from varpulis_spark.engine import TABLE_NAMES, get_spark  # noqa: E402
from varpulis_spark.operators.dedup import release_caches  # noqa: E402


def norm_cell(v):
    if isinstance(v, float):
        # exact compare is the goal; tiny epsilon only de-noises -0.0/NaN
        if v != v:
            return "NaN"
        if v == 0.0:
            return 0.0
    if isinstance(v, list):
        return tuple(norm_cell(x) for x in v)
    return v


def frame_key(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(norm_cell(r[i]) for i in order) for r in rows)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])
    # oracles that re-derive model artifacts (ann_ivf centroids) must train
    # on the SAME sf as the Spark query under test
    os.environ["SPARK_GRAFT_ORACLE_SF_DIR"] = sf_dir
    spark = get_spark("oracle-check")
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            df = fn(spark, sf_dir)
            cols = df.columns
            rows = [tuple(r) for r in df.collect()]
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: spark error: {e}")
            failures.append(name)
            continue
        finally:
            # operator-registered persists (multimodal encode, near-dup
            # signature caches) are per-query intermediates; without this
            # they accumulate across the 48-query sweep (ADVICE r13)
            release_caches()
            spark.catalog.clearCache()
        if name not in oracles:
            print(f"rows-only  {name}: {len(rows)} rows  ({time.time()-t0:.1f}s)")
            continue
        try:
            res = con.execute(oracles[name])
            ocols = [d[0] for d in res.description]
            orows = res.fetchall()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: oracle error: {e}")
            failures.append(name)
            continue
        ok_count = len(rows) == len(orows)
        ok_cols = sorted(cols) == sorted(ocols)
        ok_vals = ok_count and ok_cols and frame_key(cols, rows) == frame_key(ocols, orows)
        status = "OK   " if (ok_count and ok_cols and ok_vals) else "FAIL "
        print(f"{status} {name}: spark={len(rows)} oracle={len(orows)} "
              f"cols={'ok' if ok_cols else f'{sorted(cols)} vs {sorted(ocols)}'} "
              f"values={'ok' if ok_vals else 'MISMATCH'}  ({time.time()-t0:.1f}s)")
        if not (ok_count and ok_cols and ok_vals):
            failures.append(name)
            if ok_count and ok_cols:
                a, b = frame_key(cols, rows), frame_key(ocols, orows)
                diffs = [(x, y) for x, y in zip(a, b) if x != y][:3]
                for x, y in diffs:
                    print(f"    spark={x}\n    duck ={y}")
    print(f"\n{len(failures)} failures: {failures}" if failures else "\nall green")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
