"""Financial-markets fixture: VWAP over count windows (the reference's
'VWAP window(100)' benchmark shape, APAMA_COMPARISON_2026.md:62) and
per-symbol windowed join — on the reference's financial_markets.evt."""

import pytest
from pyspark.sql import functions as F

from varpulis_spark import Stream
from varpulis_spark.operators import aggregates as A
from varpulis_spark.sources import load_evt

EVT = "/root/reference/tests/scenarios/financial_markets.evt"


@pytest.fixture(scope="module")
def ticks(spark):
    df = load_evt(spark, EVT).filter(F.col("event_type") == "MarketTick")
    return Stream(df, ts_col="ts", order_col="event_id")


def test_vwap_count_window(ticks):
    """VWAP per symbol over tumbling count windows of 5 ticks:
    sum(price*volume)/sum(volume) via aggregate arithmetic."""
    pv = F.col("price") * F.col("volume")
    out = (
        ticks.partition_by("symbol")
        .window(5)
        .aggregate(vwap=A.sum(pv) / A.sum("volume"), n=A.count())
    )
    rows = {(r.symbol, r.window_id): r for r in out.df.collect()}
    # independent oracle: recompute from the raw rows in python
    raw = sorted(
        ((r.symbol, r.ts, r.price, r.volume) for r in ticks.df.collect()),
        key=lambda x: (x[0], x[1]),
    )
    by_symbol: dict[str, list] = {}
    for sym, _ts, price, vol in raw:
        by_symbol.setdefault(sym, []).append((price, vol))
    for sym, pvs in by_symbol.items():
        for w in range(len(pvs) // 5):
            chunk = pvs[w * 5 : (w + 1) * 5]
            expect = sum(p * v for p, v in chunk) / sum(v for _p, v in chunk)
            got = rows[(sym, w)]
            assert got.n == 5
            assert got.vwap == pytest.approx(expect)


def test_payload_ts_collision_renamed(spark):
    df = load_evt(spark, EVT)
    assert "ts_payload" in df.columns  # payload `ts` field survives, renamed
    assert df.schema["ts"].dataType.typeName() == "timestamp"
