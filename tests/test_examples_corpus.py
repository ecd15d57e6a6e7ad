"""The reference's shipped example corpus (examples/*.vpl) compiles and
runs UNMODIFIED through `run_program` in replay mode — the "a user of the
reference could switch" gate at the whole-program level, beyond the
per-construct scenario tests.

The two enrichment demos require host-bound dimension tables, exactly as
the reference requires live database/HTTP/redis connectors
(runtime/src/enrichment/); we bind tiny dimension frames the same way a
replay host would.
"""

import glob

import pytest

from varpulis_spark.sources.event_file import load_evt
from varpulis_spark.stream import Stream
from varpulis_spark.vpl.compiler import run_program

EXAMPLES = sorted(glob.glob("/root/reference/examples/*.vpl"))


@pytest.fixture(scope="module")
def spark():
    from varpulis_spark.engine import get_spark

    return get_spark("examples-corpus-tests")


@pytest.fixture(scope="module")
def dummy(spark):
    return Stream(
        load_evt(spark, "Dummy { x: 1 }\n"), ts_col="ts", order_col="event_id"
    )


@pytest.mark.parametrize(
    "path",
    [p for p in EXAMPLES if "enrich" not in p],
    ids=lambda p: p.split("/")[-1],
)
def test_example_program_compiles(spark, dummy, path):
    """Every non-enrich example compiles end-to-end (plans built, sinks
    routed, .process bodies translated); mandelbrot's full execution is
    pinned separately in test_vpl_imperative.py."""
    with open(path) as f:
        src = f.read()
    res = run_program(src, dummy)
    assert len(res) >= 1


def test_enrich_examples_run_with_bound_dimensions(spark):
    """enrich_refdata.vpl / enrich_weather.vpl run unmodified with their
    connectors bound to dimension frames (the replay-mode stand-in for the
    reference's live DB/HTTP/redis providers). The programs project the
    implicit lookup-metadata fields (`enrich_status`, `enrich_latency_ms`,
    engine/pipeline.rs:249-302), which the dim-join path must stamp."""
    products = spark.createDataFrame(
        [("p1", "phone", "electronics", 199.0, "acme")],
        "product_id string, name string, category string, price double, supplier string",
    )
    users = spark.createDataFrame(
        [("u1", "premium", "LV")], "user_id string, user_tier string, country string"
    )
    events = """
Order { order_id: "o1", user_id: "u1", product_id: "p1", quantity: 2 }
Order { order_id: "o2", user_id: "u9", product_id: "p9", quantity: 1 }
"""
    orders = Stream(load_evt(spark, events), ts_col="ts", order_col="event_id")
    with open("/root/reference/examples/enrich_refdata.vpl") as f:
        res = run_program(
            f.read(),
            orders,
            tables={
                "ProductDB": (products, "product_id"),
                "UserCache": (users, "user_id"),
            },
        )
    with_products = {r.order_id: r for r in res["OrdersWithProducts"].collect()}
    assert with_products["o1"].product == "phone"
    assert with_products["o1"].unit_price == 199.0
    assert with_products["o2"].product is None  # miss, no fallback
    full = res["FullOrders"].collect()
    assert [(r.order_id, r.user_tier, r.status) for r in full] == [
        ("o1", "premium", "ok")
    ]

    weather = spark.createDataFrame(
        [("riga", "sunny", 12.0, 3.0)],
        "city string, forecast string, wind_speed double, uv_index double",
    )
    temps = Stream(
        load_evt(
            spark,
            """
Temperature { city: "riga", value: 21.0 }
Temperature { city: "nowhere", value: 30.0 }
""",
        ),
        ts_col="ts",
        order_col="event_id",
    )
    with open("/root/reference/examples/enrich_weather.vpl") as f:
        res = run_program(f.read(), temps, tables={"WeatherAPI": (weather, "city")})
    by_city = {r.city: r for r in res["AllTemps"].collect()}
    assert by_city["riga"].forecast == "sunny"
    assert by_city["nowhere"].forecast == "unavailable"  # fallback fill
