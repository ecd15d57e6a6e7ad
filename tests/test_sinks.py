"""Concrete connector sinks/sources against REAL local transports:
sqlite files (database.rs), a live RESP endpoint (redis.rs), http.server
(http.rs sink + webhook source), and a fake Elasticsearch /_bulk endpoint
(elasticsearch.rs). No network stubs — the bytes on the wire are asserted."""

import json
import socketserver
import sqlite3
import threading
import urllib.request
import urllib.error

import pytest

from varpulis_spark import streaming as S
from varpulis_spark.sinks import (
    DatabaseConfig,
    DatabaseSink,
    DatabaseSource,
    ElasticsearchConfig,
    ElasticsearchSink,
    HttpSink,
    HttpWebhookConfig,
    HttpWebhookSource,
    RedisConfig,
    RedisSink,
    RespConnection,
    resp_encode,
    validate_table_name,
)


# ---------------------------------------------------------------------------
# database
# ---------------------------------------------------------------------------

def test_table_name_validation():
    validate_table_name("events")
    validate_table_name("_schema.events_2")
    for bad in ("", "1evt", "evt;drop", "e vt", "evt--"):
        with pytest.raises(ValueError, match="Invalid table name"):
            validate_table_name(bad)
    with pytest.raises(ValueError):
        DatabaseConfig("sqlite:/tmp/x.db", "bad name")


def test_database_sink_inserts_rows(spark, tmp_path):
    db = str(tmp_path / "out.db")
    sink = DatabaseSink("db", DatabaseConfig(f"sqlite:{db}", "alerts"))
    df = spark.createDataFrame(
        [("HighValue", 1), ("HighValue", 2)], "event_type string, id long"
    )
    sink.write_batch(df, epoch=0)
    rows = sqlite3.connect(db).execute(
        "SELECT event_type, data, timestamp FROM alerts ORDER BY id"
    ).fetchall()
    assert len(rows) == 2
    assert rows[0][0] == "HighValue"
    assert json.loads(rows[1][1])["id"] == 2
    assert "T" in rows[0][2]  # rfc3339-ish timestamp


def test_database_source_polls_incrementally(spark, tmp_path):
    db = str(tmp_path / "in.db")
    conn = sqlite3.connect(db)
    conn.execute(
        "CREATE TABLE feed (id INTEGER PRIMARY KEY, event_type TEXT, data TEXT)"
    )
    conn.executemany(
        "INSERT INTO feed (event_type, data) VALUES (?, ?)",
        [("Tick", json.dumps({"x": 1.0})), ("Tick", json.dumps({"x": 2.0}))],
    )
    conn.commit()
    src = DatabaseSource(
        "feed", DatabaseConfig(f"sqlite:{db}", "feed"), str(tmp_path / "spool")
    )
    assert src.poll_once() == 2
    assert src.last_id == 2
    # resume: only rows with id > last_id come back
    conn.execute(
        "INSERT INTO feed (event_type, data) VALUES (?, ?)",
        ("Tock", json.dumps({"x": 3.0})),
    )
    conn.commit()
    assert src.poll_once() == 1 and src.poll_once() == 0
    rows = src.batch(spark, "x double").df.collect()
    got = sorted((r.event_type, r.x) for r in rows)
    assert got == [("Tick", 1.0), ("Tick", 2.0), ("Tock", 3.0)]


# ---------------------------------------------------------------------------
# redis (RESP)
# ---------------------------------------------------------------------------

class FakeRedis(socketserver.ThreadingTCPServer):
    """Speaks enough RESP to capture commands: +OK to writes, bulk reply
    to GET from an in-memory store."""

    allow_reuse_address = True

    def __init__(self):
        self.store: dict = {}
        self.published: list = []
        self.connections = 0

        outer = self

        class H(socketserver.StreamRequestHandler):
            def handle(self):
                outer.connections += 1
                while True:
                    line = self.rfile.readline()
                    if not line or not line.startswith(b"*"):
                        return
                    argc = int(line[1:].strip())
                    args = []
                    for _ in range(argc):
                        ln = int(self.rfile.readline()[1:].strip())
                        args.append(self.rfile.read(ln).decode())
                        self.rfile.read(2)
                    cmd = args[0].upper()
                    if cmd == "SET":
                        outer.store[args[1]] = args[2]
                        self.wfile.write(b"+OK\r\n")
                    elif cmd == "GET":
                        v = outer.store.get(args[1])
                        if v is None:
                            self.wfile.write(b"$-1\r\n")
                        else:
                            b = v.encode()
                            self.wfile.write(
                                b"$" + str(len(b)).encode() + b"\r\n" + b + b"\r\n"
                            )
                    elif cmd == "PUBLISH":
                        outer.published.append((args[1], args[2]))
                        self.wfile.write(b":1\r\n")
                    else:
                        self.wfile.write(b"-ERR unknown\r\n")

        super().__init__(("127.0.0.1", 0), H)
        threading.Thread(target=self.serve_forever, daemon=True).start()


@pytest.fixture()
def fake_redis():
    srv = FakeRedis()
    yield srv
    srv.shutdown()


def test_resp_encode():
    assert resp_encode("SET", "k", "v") == b"*3\r\n$3\r\nSET\r\n$1\r\nk\r\n$1\r\nv\r\n"


def test_redis_sink_set_get_publish(spark, fake_redis):
    host, port = fake_redis.server_address
    cfg = RedisConfig(f"redis://{host}:{port}", "alerts", key_prefix="vp")
    sink = RedisSink("r", cfg)
    assert sink.set("state", "on") == "OK"
    assert fake_redis.store == {"vp:state": "on"}  # prefix applied
    assert sink.get("state") == "on"
    assert sink.get("missing") is None
    df = spark.createDataFrame([(1,), (2,)], "id long")
    sink.write_batch(df, 0)
    assert {c for c, _ in fake_redis.published} == {"alerts"}
    assert sorted(json.loads(p)["id"] for _, p in fake_redis.published) == [1, 2]


def test_resp_connection_error_reply(fake_redis):
    host, port = fake_redis.server_address
    conn = RespConnection(host, port)
    with pytest.raises(ConnectionError, match="unknown"):
        conn.command("BOGUS")


# ---------------------------------------------------------------------------
# http sink + elasticsearch
# ---------------------------------------------------------------------------

class CaptureHttp:
    def __init__(self, status=200):
        import http.server

        self.requests: list = []
        outer = self

        class H(http.server.BaseHTTPRequestHandler):
            def do_POST(self):
                n = int(self.headers.get("Content-Length", 0))
                outer.requests.append({
                    "path": self.path,
                    "body": self.rfile.read(n).decode(),
                    "headers": {k.lower(): v for k, v in self.headers.items()},
                })
                self.send_response(status)
                self.send_header("Content-Length", "2")
                self.end_headers()
                self.wfile.write(b"{}")

            def log_message(self, *a):
                pass

        self.server = http.server.ThreadingHTTPServer(("127.0.0.1", 0), H)
        threading.Thread(target=self.server.serve_forever, daemon=True).start()

    @property
    def url(self):
        h, p = self.server.server_address
        return f"http://{h}:{p}"


@pytest.fixture()
def capture_http():
    srv = CaptureHttp()
    yield srv
    srv.server.shutdown()


def test_http_sink_posts_rows(spark, capture_http):
    sink = HttpSink("h", capture_http.url + "/ingest",
                    headers={"X-Token": "t0"})
    df = spark.createDataFrame([(1,), (2,)], "id long")
    sink.write_batch(df, 0)
    assert len(capture_http.requests) == 2
    assert all(r["path"] == "/ingest" for r in capture_http.requests)
    assert all(r["headers"]["x-token"] == "t0" for r in capture_http.requests)
    assert sorted(json.loads(r["body"])["id"] for r in capture_http.requests) == [1, 2]


def test_http_sink_composes_with_resilient_sink(spark, tmp_path):
    sink = HttpSink("h", "http://127.0.0.1:1/unreachable", timeout_s=0.5)
    dlq = str(tmp_path / "dlq")
    wrapped = S.resilient_sink_fn(sink.write_batch, dlq, connector="http")
    wrapped(spark.createDataFrame([(1,)], "id long"), 0)
    rows = S.read_dlq(spark, dlq).collect()
    assert len(rows) == 1 and rows[0].connector == "http"


def test_elasticsearch_bulk_ndjson(spark, capture_http):
    cfg = ElasticsearchConfig(capture_http.url, "logs-{yyyy}", batch_size=2,
                              username="u", password="pw")
    sink = ElasticsearchSink("es", cfg)
    idx = sink.expand_index()
    assert idx.startswith("logs-2")  # {yyyy} expanded
    df = spark.createDataFrame([(i,) for i in range(5)], "id long").coalesce(1)
    sink.write_batch(df, 0)
    # one partition: 5 docs at batch_size=2 → 3 bulk requests (2+2+1)
    assert len(capture_http.requests) == 3
    assert all(r["path"] == "/_bulk" for r in capture_http.requests)
    assert all(r["headers"]["authorization"].startswith("Basic ")
               for r in capture_http.requests)
    lines = [ln for r in capture_http.requests for ln in r["body"].strip().split("\n")]
    actions = [json.loads(x) for x in lines[0::2]]
    docs = [json.loads(x) for x in lines[1::2]]
    assert all(a == {"index": {"_index": idx}} for a in actions)
    assert sorted(d["id"] for d in docs) == [0, 1, 2, 3, 4]


def test_elasticsearch_bulk_executor_side(spark, capture_http):
    """No driver funnel: each non-empty partition POSTs its own bulks, so a
    4-partition frame produces >= 4 requests (one per partition minimum)
    and every doc still arrives exactly once."""
    cfg = ElasticsearchConfig(capture_http.url, "logs", batch_size=100)
    sink = ElasticsearchSink("es", cfg)
    df = spark.createDataFrame([(i,) for i in range(20)], "id long").repartition(4)
    sink.write_batch(df, 0)
    assert len(capture_http.requests) >= 4  # partition-parallel, not driver-serial
    lines = [ln for r in capture_http.requests for ln in r["body"].strip().split("\n")]
    docs = [json.loads(x) for x in lines[1::2]]
    assert sorted(d["id"] for d in docs) == list(range(20))


def test_redis_publish_executor_side(spark, fake_redis):
    """PUBLISH runs per partition: multiple RESP connections hit the server
    (one per non-empty partition) and every payload arrives exactly once."""
    host, port = fake_redis.server_address
    sink = RedisSink("r", RedisConfig(f"redis://{host}:{port}", "bulk"))
    df = spark.createDataFrame([(i,) for i in range(20)], "id long").repartition(4)
    sink.write_batch(df, 0)
    assert sorted(json.loads(p)["id"] for _, p in fake_redis.published) == list(range(20))
    assert fake_redis.connections >= 4  # one connection per partition, no driver funnel


def test_redis_lazy_driver_conn_keeps_executor_path(spark, fake_redis):
    """A driver-side set()/get() lazily opens a connection; write_batch must
    STILL publish executor-side (ADVICE r6: keying the branch on self._conn
    silently fell back to the toLocalIterator funnel after any set())."""
    host, port = fake_redis.server_address
    sink = RedisSink("r", RedisConfig(f"redis://{host}:{port}", "bulk2"))
    sink.set("k", "v")  # lazily assigns self._conn
    assert sink._conn is not None and not sink._injected
    before = fake_redis.connections
    df = spark.createDataFrame([(i,) for i in range(12)], "id long").repartition(4)
    sink.write_batch(df, 0)
    pub = [p for ch, p in fake_redis.published if ch == "bulk2"]
    assert sorted(json.loads(p)["id"] for p in pub) == list(range(12))
    assert fake_redis.connections - before >= 4  # per-partition, not the driver funnel


# ---------------------------------------------------------------------------
# http webhook source
# ---------------------------------------------------------------------------

def _post(url, obj, headers=None):
    req = urllib.request.Request(
        url, data=json.dumps(obj).encode(), method="POST",
        headers={"Content-Type": "application/json", **(headers or {})},
    )
    try:
        with urllib.request.urlopen(req, timeout=5) as resp:
            return resp.status, json.loads(resp.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read() or b"{}")


def test_webhook_source_end_to_end(spark, tmp_path):
    import random

    port = random.randint(20000, 40000)
    cfg = HttpWebhookConfig(port=port, api_key="sekret", max_batch_size=3)
    src = HttpWebhookSource("wh", cfg, str(tmp_path / "spool")).start()
    try:
        base = f"http://127.0.0.1:{port}"
        # auth: missing key → 401; x-api-key and Bearer both accepted
        assert _post(f"{base}/event", {"x": 0.0})[0] == 401
        assert _post(f"{base}/event", {"event_type": "Ping", "x": 1.0},
                     {"x-api-key": "sekret"})[0] == 200
        assert _post(f"{base}/event", {"x": 2.0},
                     {"Authorization": "Bearer sekret"})[0] == 200
        # batch endpoint with size cap
        code, reply = _post(f"{base}/events", [{"x": 3.0}, {"x": 4.0}],
                            {"x-api-key": "sekret"})
        assert (code, reply["count"]) == (200, 2)
        assert _post(f"{base}/events", [{"x": 0.0}] * 4,
                     {"x-api-key": "sekret"})[0] == 413
        assert _post(f"{base}/nope", {}, {"x-api-key": "sekret"})[0] == 404
        src.flush()
        rows = src.batch(spark, "x double").df.collect()
        got = sorted((r.event_type, r.x) for r in rows)
        assert got == [("Ping", 1.0), ("WebhookEvent", 2.0),
                       ("WebhookEvent", 3.0), ("WebhookEvent", 4.0)]
    finally:
        src.stop()


# ---------------------------------------------------------------------------
# rest api client
# ---------------------------------------------------------------------------

def test_rest_api_client_and_sink(spark, capture_http):
    from varpulis_spark.sinks import RestApiClient, RestApiConfig, RestApiSink

    cfg = RestApiConfig(capture_http.url).with_bearer_token("tk")
    client = RestApiClient("api", cfg)
    resp = client.post("/orders", {"id": 1})
    assert resp["event_type"] == "ApiResponse"
    assert capture_http.requests[-1]["path"] == "/orders"
    assert capture_http.requests[-1]["headers"]["authorization"] == "Bearer tk"
    assert json.loads(capture_http.requests[-1]["body"]) == {"id": 1}

    sink = RestApiSink("api", cfg, "/events")
    df = spark.createDataFrame([(7,)], "id long")
    sink.write_batch(df, 0)
    assert capture_http.requests[-1]["path"] == "/events"
    assert json.loads(capture_http.requests[-1]["body"])["id"] == 7


def test_rest_api_get(spark):
    import http.server, threading

    class H(http.server.BaseHTTPRequestHandler):
        def do_GET(self):
            body = json.dumps({"price": 9.5}).encode()
            self.send_response(200)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, *a):
            pass

    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), H)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        from varpulis_spark.sinks import RestApiClient, RestApiConfig

        h, p = srv.server_address
        client = RestApiClient("api", RestApiConfig(f"http://{h}:{p}"))
        out = client.get("/quote")
        assert out == {"price": 9.5, "event_type": "ApiResponse"}
    finally:
        srv.shutdown()


# ---------------------------------------------------------------------------
# VPL .to(Conn) routing
# ---------------------------------------------------------------------------

def test_vpl_to_routes_to_bound_sink(spark, tmp_path):
    """`stream X = ... .to(Conn)` routes the result through a bound sink
    object (sink_factory analog); unbound names stay ignored."""
    from varpulis_spark import Stream
    from varpulis_spark.sources.event_file import load_evt
    from varpulis_spark.vpl import run_program

    src = load_evt(spark, """
Reading { x: 50.0 }
Reading { x: 150.0 }
""")
    db = str(tmp_path / "alerts.db")
    sink = DatabaseSink("db", DatabaseConfig(f"sqlite:{db}", "alerts"))
    res = run_program("""
stream Hot = Reading
    .where(x > 100.0)
    .emit(kind: "Hot", x: x)
    .to(alert_db)

stream Cold = Reading
    .where(x <= 100.0)
    .emit(x: x)
    .to(unbound_conn)
""", Stream(src, ts_col="ts", order_col="event_id"),
        sinks={"alert_db": sink})
    assert res["Hot"].count() == 1 and res["Cold"].count() == 1
    rows = sqlite3.connect(db).execute("SELECT data FROM alerts").fetchall()
    assert len(rows) == 1
    d = json.loads(rows[0][0])
    assert d["kind"] == "Hot" and d["x"] == 150.0


def test_vpl_from_binds_source_stream(spark, tmp_path):
    """`EventType.from(Conn)` reads from the bound source Stream — here an
    MQTT bridge spool — instead of the ingest stream."""
    from varpulis_spark import Stream
    from varpulis_spark.sources.event_file import load_evt
    from varpulis_spark.sources.mqtt import MqttConfig, MqttSource
    from varpulis_spark.vpl import run_program

    mqtt = MqttSource("m", MqttConfig("h", "s/#"), str(tmp_path / "spool"))
    for v in (10.0, 200.0):
        mqtt.ingest("s/t", json.dumps({"event_type": "Reading", "x": v}))
    mqtt.flush()
    ingest = load_evt(spark, "Reading { x: 999.0 }\n")
    res = run_program("""
stream Hot = Reading
    .from(mqtt_conn)
    .where(x > 100.0)
    .emit(x: x)
""", Stream(ingest, ts_col="ts", order_col="event_id"),
        sources={"mqtt_conn": mqtt.batch(spark, "x double")})
    rows = res["Hot"].collect()
    # 200.0 from the spool qualifies; the ingest 999.0 is NOT read
    assert [r.x for r in rows] == [200.0]


# ---------------------------------------------------------------------------
# file / console sinks: alert-storm safety (VERDICT r8 "what's wrong" #1)
# ---------------------------------------------------------------------------

def test_file_sink_100k_batch_streams_without_collect(spark, tmp_path, monkeypatch):
    """A 100k-row output batch goes through FileSink with bounded driver
    memory: rows stream via toLocalIterator (one partition at a time) and
    DataFrame.collect is never called — pinned by making collect raise."""
    import json as _json

    from pyspark.sql import DataFrame, functions as F
    from varpulis_spark.sinks import FileSink

    n = 100_000
    df = (
        spark.range(n)
        .select(
            F.col("id").alias("event_id"),
            F.timestamp_seconds(F.lit(1_700_000_000) + F.col("id")).alias("ts"),
            (F.col("id") * 2).alias("value"),
        )
        .repartition(16)  # deliberately unordered partitions
    )

    def boom(self, *a, **k):
        raise AssertionError("FileSink must not collect() the batch")

    monkeypatch.setattr(DataFrame, "collect", boom)
    path = str(tmp_path / "alerts.jsonl")
    FileSink(path).write_batch(df, epoch=0)
    with open(path) as f:
        lines = f.readlines()
    assert len(lines) == n
    first, last = _json.loads(lines[0]), _json.loads(lines[-1])
    # global (ts, event_id) order survived partition-wise iteration
    assert first["event_id"] == 0 and last["event_id"] == n - 1
    assert first["value"] == 0 and "timestamp" in first


def test_console_sink_caps_output(spark, capsys):
    from varpulis_spark.sinks import ConsoleSink

    sink = ConsoleSink(max_rows_per_batch=5)
    df = spark.range(12).selectExpr("id", "id * 10 AS v")
    sink.write_batch(df, epoch=0)
    out = capsys.readouterr().out
    shown = [l for l in out.splitlines() if l.startswith("[SINK] {")]
    assert len(shown) == 5
    assert "7 more rows suppressed this batch" in out
    # counter accumulates across batches
    sink.write_batch(df, epoch=1)
    out2 = capsys.readouterr().out
    assert "14 total" in out2


def test_console_sink_small_batch_prints_everything(spark, capsys):
    from varpulis_spark.sinks import ConsoleSink

    ConsoleSink().write_batch(spark.range(3).selectExpr("id"), epoch=0)
    out = capsys.readouterr().out
    assert len([l for l in out.splitlines() if l.startswith("[SINK]")]) == 3
    assert "suppressed" not in out
