"""Correctness-at-scale guard (VERDICT r4 task 10).

The round driver checks correctness at sf0.001 and benches at sf0.1 — a
query can be green at sf0.001 yet pathological one decade up (r4's
`minshingle_near_dup`: 28 correct pairs at sf0.001, >9.5 MINUTES at sf0.1,
which destroyed the whole round's perf record). This guard runs EVERY
driver-contract query at sf0.01 under a hard per-query wall-clock cap in
the normal test suite, so a scale explosion is caught at test time, not at
bench time.

The cap (60 s on the 4-core test session) is deliberately loose — it
exists to catch super-linear blowups (quadratic joins, single-task
funnels), not to benchmark. The count runs in a worker thread holding its
own Spark job group; on timeout the group is cancelled so a runaway query
doesn't poison the rest of the suite.
"""

from __future__ import annotations

import os
import sys
import threading
import time

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402

SF_MID = "/root/testdata/sf0.01"
CAP = float(os.environ.get("SPARK_GRAFT_SCALE_GUARD_CAP", "60"))


@pytest.mark.scale_guard
@pytest.mark.parametrize("name", sorted(entrymod.queries()))
def test_query_completes_at_sf0_01(spark, name):
    fn = entrymod.queries()[name]
    result: dict = {}
    group = f"scale-guard-{name}"

    def work() -> None:
        try:
            spark.sparkContext.setJobGroup(group, name, True)
            result["rows"] = fn(spark, SF_MID).count()
        except BaseException as e:  # noqa: BLE001
            result["err"] = e

    t = threading.Thread(target=work, daemon=True)
    t0 = time.time()
    t.start()
    t.join(CAP)
    elapsed = time.time() - t0
    if t.is_alive():
        spark.sparkContext.cancelJobGroup(group)
        t.join(15)
        pytest.fail(
            f"{name} exceeded the {CAP:.0f}s scale cap at sf0.01 — "
            f"green-at-sf0.001 is not enough; check for quadratic joins or "
            f"single-task funnels before it reaches the bench"
        )
    from varpulis_spark.operators.dedup import release_caches

    release_caches()
    spark.catalog.clearCache()
    if "err" in result:
        raise result["err"]
    assert result["rows"] >= 0, f"{name} returned no count ({elapsed:.1f}s)"
