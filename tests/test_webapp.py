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
