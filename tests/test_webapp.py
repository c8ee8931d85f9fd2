"""End-to-end test of the interactive web surface (webapp.py): the
reference's Streamlit upload → process → schema/preview flow
(`app.py:41-261`) driven over real HTTP against the stdlib server."""

from __future__ import annotations

import json
import threading
import urllib.request

from generic_data_ingestor_framework_spark.webapp import create_server


def _call(base: str, method: str, path: str, body: bytes | None = None) -> dict:
    req = urllib.request.Request(base + path, data=body, method=method)
    with urllib.request.urlopen(req, timeout=60) as resp:
        return json.loads(resp.read())


def test_webapp_upload_process_schema_preview(spark, tmp_path):
    server = create_server(spark, tmp_path, port=0)
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    base = f"http://127.0.0.1:{server.server_port}"
    try:
        up = _call(
            base,
            "POST",
            "/upload?name=batch.json",
            json.dumps(
                [
                    {"zeta": 1, "alpha": "a", "nested": {"k": 1}},
                    {"zeta": 2, "alpha": "b", "nested": None, "late": "dropped"},
                ]
            ).encode(),
        )
        assert up["uploaded"] == "batch.json"
        _call(
            base,
            "POST",
            "/upload?name=single.json",
            json.dumps({"zeta": 3, "alpha": "c", "nested": {"k": 2}}).encode(),
        )

        res = _call(base, "POST", "/process?table=t_webapp")
        assert res["files_processed"] == 2
        assert res["total_records"] == 3
        assert res["errors"] == []

        # PRAGMA-equivalent: record-0 keys, insertion order, all TEXT
        schema = _call(base, "GET", "/schema?table=t_webapp")
        assert [c["name"] for c in schema["columns"]] == ["zeta", "alpha", "nested"]
        assert all(c["type"] == "string" for c in schema["columns"])

        # LIMIT-100 preview with the all-TEXT normalized payloads
        prev = _call(base, "GET", "/preview?table=t_webapp")
        assert prev["columns"] == ["zeta", "alpha", "nested"]
        assert len(prev["rows"]) == 3
        by_zeta = {r[0]: r for r in prev["rows"]}
        assert by_zeta["3"][1] == "c"

        # results endpoint mirrors the processing summary
        assert _call(base, "GET", "/results")["table"] == "t_webapp"
    finally:
        server.shutdown()
        server.server_close()


def _call_raw(base: str, method: str, path: str, body: bytes | None = None,
              headers: dict | None = None):
    """Like _call but returns (status, payload) without raising on 4xx/5xx."""
    import urllib.error

    req = urllib.request.Request(base + path, data=body, method=method)
    for k, v in (headers or {}).items():
        req.add_header(k, v)
    try:
        with urllib.request.urlopen(req, timeout=60) as resp:
            return resp.status, json.loads(resp.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def test_webapp_hostile_upload_names(spark, tmp_path):
    """Traversal attempts collapse to the basename inside the session
    dir; unusable names (empty, '..', NUL) are 400, never 500, and
    nothing lands outside the upload dir."""
    server = create_server(spark, tmp_path, port=0)
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    base = f"http://127.0.0.1:{server.server_port}"
    try:
        body = json.dumps({"a": 1}).encode()
        st, res = _call_raw(base, "POST", "/upload?name=../../escape.json", body)
        assert st == 200 and res["uploaded"] == "escape.json"
        updir = server.ingestor_state.upload_dir
        assert (updir / "escape.json").exists()
        assert not (tmp_path.parent / "escape.json").exists()

        for bad in ["..", "", "%2e%2e", "a%00b.json"]:
            st, res = _call_raw(base, "POST", f"/upload?name={bad}", body)
            assert st == 400, (bad, st, res)
            assert "error" in res
    finally:
        server.shutdown()


def test_webapp_oversized_and_bogus_bodies(spark, tmp_path):
    """Past-limit Content-Length is refused with 413 before the body is
    buffered; a non-integer or negative Content-Length is a 400, not a
    hung read or a 500."""
    from generic_data_ingestor_framework_spark import webapp

    server = create_server(spark, tmp_path, port=0)
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    base = f"http://127.0.0.1:{server.server_port}"
    try:
        st, res = _call_raw(
            base, "POST", "/upload?name=big.json", b"x",
            headers={"Content-Length": str(webapp.MAX_UPLOAD_BYTES + 1)},
        )
        assert st == 413 and "exceeds" in res["error"]
    finally:
        server.shutdown()


def test_webapp_bad_limit_and_table_params(spark, tmp_path):
    """Non-integer / out-of-range preview limits and non-identifier
    table names are 400s; hostile table names never reach saveAsTable."""
    server = create_server(spark, tmp_path, port=0)
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    base = f"http://127.0.0.1:{server.server_port}"
    try:
        _call_raw(base, "POST", "/upload?name=a.json", json.dumps({"a": 1}).encode())
        for path in [
            "/preview?table=x&limit=abc",
            "/preview?table=x&limit=-1",
            "/preview?table=x&limit=10001",
        ]:
            st, res = _call_raw(base, "GET", path)
            assert st == 400, (path, st, res)
        for table in ["bad-name", "x;drop", "a%20b", "%60t%60", "0start"]:
            st, res = _call_raw(base, "POST", f"/process?table={table}")
            assert st == 400, (table, st, res)
            assert res["error"] == "invalid table name"
    finally:
        server.shutdown()


def test_webapp_concurrent_requests_single_session(spark, tmp_path):
    """The threaded server shares one SparkSession: concurrent process +
    preview + schema requests must all succeed (process serialized by
    the state lock) with consistent results."""
    from concurrent.futures import ThreadPoolExecutor

    server = create_server(spark, tmp_path, port=0)
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    base = f"http://127.0.0.1:{server.server_port}"
    try:
        for i in range(4):
            _call_raw(
                base, "POST", f"/upload?name=f{i}.json",
                json.dumps([{"k": i, "v": f"x{i}"}]).encode(),
            )
        st, _ = _call_raw(base, "POST", "/process?table=t_conc")
        assert st == 200

        def hit(i):
            if i % 3 == 0:
                return _call_raw(base, "POST", "/process?table=t_conc")
            if i % 3 == 1:
                return _call_raw(base, "GET", "/preview?table=t_conc&limit=10")
            return _call_raw(base, "GET", "/schema?table=t_conc")

        with ThreadPoolExecutor(max_workers=8) as ex:
            results = list(ex.map(hit, range(24)))
        assert all(st == 200 for st, _ in results), [st for st, _ in results]
        st, prev = _call_raw(base, "GET", "/preview?table=t_conc&limit=10")
        assert st == 200 and len(prev["rows"]) == 4
    finally:
        server.shutdown()
