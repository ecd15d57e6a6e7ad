"""Capture `.explain("formatted")` for every declared driver query into
plans/r<N>/<query>_<tag>.txt (tag = before/after, argv[1], default
"before"; N from $SPARK_GRAFT_PLAN_ROUND, default 14).

Usage: python scripts/capture_plans.py [before|after] [query ...]

Plan capture only PLANS the query (no action), but some query builders run
eager driver-side work while constructing the DataFrame (IVF k-means
training, ONNX artifact writes) — that cost is part of building, not of
the captured plan, and is fine here because nothing is timed.
"""

from __future__ import annotations

import os
import sys

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

import __spark_entry__ as entrymod  # noqa: E402
from varpulis_spark.engine import get_spark  # noqa: E402


def explain_str(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    only = set(sys.argv[2:])
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(
        HERE, "plans", "r" + os.environ.get("SPARK_GRAFT_PLAN_ROUND", "14")
    )
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("varpulis-capture-plans")
    spark.sparkContext.setLogLevel("ERROR")
    for name, fn in entrymod.queries().items():
        if only and name not in only:
            continue
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        try:
            df = fn(spark, sf_dir)
            text = explain_str(df)
        except Exception as e:  # noqa: BLE001 - record the failure, move on
            text = f"PLAN CAPTURE FAILED: {e!r}\n"
        with open(path, "w") as f:
            f.write(f"-- query: {name} ({tag}) @ {sf_dir}\n{text}")
        print(f"{name}: {len(text)} chars -> {path}", flush=True)
        from varpulis_spark.operators.dedup import release_caches

        release_caches()
        spark.catalog.clearCache()


if __name__ == "__main__":
    main()
