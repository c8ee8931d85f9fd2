"""Golden-contract E2E: the reference integration expectations
(`tests/integration/test_end_to_end_processing.py`) reproduced on the
Spark pipeline."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from generic_data_ingestor_framework_spark.ingest import (
    ingest_directory,
    read_json_file,
)


def test_golden_counts(spark, integration_dir):
    df, report = ingest_directory(spark, integration_dir)
    assert report.files_processed == 3        # customers, orders, edge_cases
    assert report.files_failed == 1           # malformed.json
    assert report.total_records == 4          # 2 + 1 + 1
    assert report.errors[0]["file"] == "malformed.json"
    assert df.count() == 4


def test_lineage_and_schema_union(spark, integration_dir):
    df, _ = ingest_directory(spark, integration_dir)
    cols = set(df.columns)
    # unified schema must contain fields from every processed file
    assert {"customer_id", "name", "email"} <= cols
    assert {"order_id", "shipping_address", "items"} <= cols
    assert {"unicode_text", "special_chars"} <= cols
    assert "_source_file" in cols
    srcs = {r["_source_file"] for r in df.select("_source_file").collect()}
    assert srcs == {"customers.json", "orders.json", "edge_cases.json"}
    # A11 parity: data columns sorted alphabetically, lineage last
    data_cols = [c for c in df.columns if c != "_source_file"]
    assert data_cols == sorted(data_cols)
    assert df.columns[-1] == "_source_file"


def test_text_parity_normalization_applied(spark, integration_dir):
    df, _ = ingest_directory(spark, integration_dir)
    assert all(t == "string" for _, t in df.dtypes)
    row = df.filter(F.col("order_id") == "ORD-2024-001").collect()[0]
    addr = json.loads(row["shipping_address"])
    assert addr["city"] == "Springfield"
    assert addr["coordinates"]["latitude"] == 39.78
    items = json.loads(row["items"])
    assert items[0]["quantity"] == 2


def test_empty_file_is_not_an_error(spark, integration_dir):
    _, report = ingest_directory(spark, integration_dir)
    # empty.json ([]) is neither processed nor failed
    assert report.files_processed + report.files_failed == 4


def test_bulk_mode_reads_all_valid_records(spark, integration_dir):
    df, report = ingest_directory(spark, integration_dir, mode="bulk")
    # bulk mode quarantines the malformed file's record inline
    assert df.filter(F.col("customer_id") == "CUST-001").count() >= 1
    assert report.total_records >= 4


def test_lossless_mode_keeps_types(spark, integration_dir):
    df, _ = ingest_directory(spark, integration_dir, text_parity=False)
    dtypes = dict(df.dtypes)
    assert dtypes["shipping_address"].startswith("struct")
    assert dtypes["items"].startswith("array")


def test_encoding_fallback_reads_latin1(spark, tmp_path):
    p = tmp_path / "latin.json"
    p.write_bytes('[{"name": "café"}]'.encode("latin-1"))
    df = read_json_file(spark, p)
    # the byte-sniff must pick latin-1 and decode the VALUE correctly —
    # a lenient UTF-8 read would silently produce caf�
    assert df.collect()[0]["name"] == "café"


def test_missing_directory_raises(spark, tmp_path):
    import pytest as _pytest

    with _pytest.raises(NotADirectoryError):
        ingest_directory(spark, tmp_path / "not_there")


def test_bulk_mode_reads_all_formats(spark, tmp_path):
    """Bulk = one distributed scan per format, schema-merged union —
    csv/parquet no longer silently vanish (nor crash an empty-json
    directory)."""
    (tmp_path / "a.json").write_text('[{"id": 1, "name": "j"}]')
    (tmp_path / "b.csv").write_text("id,extra\n2,x\n")
    df, report = ingest_directory(spark, tmp_path, mode="bulk")
    assert df.count() == 2
    assert report.files_processed == 2
    assert report.files_failed == 0
    assert {"id", "name", "extra", "_source_file"} <= set(df.columns)


def test_bulk_mode_csv_only_directory(spark, tmp_path):
    (tmp_path / "only.csv").write_text("x,y\n1,2\n")
    df, report = ingest_directory(spark, tmp_path, mode="bulk")
    assert df.count() == 1
    assert report.files_processed == 1


def test_bulk_mode_empty_directory_returns_none(spark, tmp_path):
    df, report = ingest_directory(spark, tmp_path, mode="bulk")
    assert df is None
    assert report.files_processed == 0


def test_first_record_schema_mode_reproduces_web_path(spark, tmp_path):
    """app.py:168-175 parity: schema = record-0 keys only, no lineage;
    later-appearing columns are dropped (the web path's documented
    data loss, reproduced only when opted in)."""
    (tmp_path / "a_first.json").write_text(
        json.dumps([{"id": 1, "name": "A"}, {"id": 2, "name": "B", "extra": "x"}])
    )
    df, _ = ingest_directory(spark, tmp_path, schema_mode="first_record")
    assert set(df.columns) == {"id", "name"}
    assert "_source_file" not in df.columns
    assert df.count() == 2
    # default mode keeps the union of keys plus lineage
    df2, _ = ingest_directory(spark, tmp_path)
    assert set(df2.columns) == {"id", "name", "extra", "_source_file"}


def test_bulk_ingest_jsonl_keeps_all_lines(spark, tmp_path):
    """Bulk mode must read line-delimited files with multiLine=false:
    under multiLine=true Spark silently keeps only the FIRST object of
    a .jsonl file. Mixed layouts union in one call."""
    import json as _json

    d = tmp_path / "mixed"
    d.mkdir()
    (d / "lines.jsonl").write_text(
        "\n".join(_json.dumps({"id": i, "v": f"l{i}"}) for i in range(25))
    )
    (d / "whole.json").write_text(
        _json.dumps([{"id": 100 + i, "v": f"w{i}"} for i in range(5)])
    )
    df, report = ingest_directory(spark, d, mode="bulk", text_parity=False)
    assert df.count() == 30
    ids = sorted(r["id"] for r in df.select("id").collect())
    assert ids == list(range(25)) + list(range(100, 105))


def test_bulk_ingest_csv_header_order_and_separators(spark, tmp_path):
    """Bulk CSV must align columns BY HEADER NAME across files and
    respect each file's separator: a single positional csv() scan puts
    a reordered file's values in the wrong columns and mangles a .tsv
    swept into a comma scan."""
    d = tmp_path / "csvmix"
    d.mkdir()
    (d / "a.csv").write_text("name,age\nalice,30\nbob,25\n")
    (d / "b.csv").write_text("age,name\n40,carol\n35,dan\n")
    (d / "c.tsv").write_text("name\tage\neve\t50\n")
    df, report = ingest_directory(spark, d, mode="bulk", text_parity=False)
    got = {r["name"]: r["age"] for r in df.select("name", "age").collect()}
    assert got == {"alice": "30", "bob": "25", "carol": "40", "dan": "35", "eve": "50"}


def test_bulk_parquet_schema_conflict_degrades_to_per_file(spark, tmp_path):
    """One parquet file whose column type conflicts must not lose the
    whole format group: the bulk scan fails to merge, degrades to
    per-file reads, and the union widens the conflicting column."""
    import glob
    import shutil

    spark.createDataFrame([(1, "a")], "id bigint, v string").coalesce(1).write.parquet(
        str(tmp_path / "t1")
    )
    spark.createDataFrame([(2, 3.5)], "id bigint, v double").coalesce(1).write.parquet(
        str(tmp_path / "t2")
    )
    mix = tmp_path / "mix"
    mix.mkdir()
    for i, f in enumerate(
        sorted(glob.glob(str(tmp_path / "t*" / "part-*.parquet")))
    ):
        shutil.copy(f, mix / f"f{i}.parquet")
    df, report = ingest_directory(spark, mix, mode="bulk", text_parity=False)
    assert df is not None and df.count() == 2
    assert report.files_processed == 2 and report.files_failed == 0
    got = {r["id"]: r["v"] for r in df.collect()}
    assert got[1] == "a" and got[2] in (3.5, "3.5")
    assert any("degrading to per-file" in e["error"] for e in report.errors)


def test_web_path_parity_end_to_end(spark, tmp_path):
    """Golden test of the reference's SECOND pipeline — the web upload
    path (`app.py:125-201,243-257`) — driven entirely through the
    public API: upload-dir materialization -> single-object promotion +
    non-record drop -> record-0 schema (insertion order, no lineage) ->
    CREATE TABLE + batch insert -> PRAGMA-style describe -> LIMIT-100
    preview. Asserts the web path's documented divergences from the CLI
    path: no ``_source_file``, record-0 column order, later-appearing
    keys dropped."""
    import json as _json

    from generic_data_ingestor_framework_spark import catalog, query, sink

    up = tmp_path / "uploads"
    up.mkdir()
    # file 1: array upload; record 0 fixes schema AND column order
    (up / "batch.json").write_text(
        _json.dumps(
            [
                {"zeta": 1, "alpha": "a", "mid": {"k": 1}},
                {"zeta": 2, "alpha": "b", "mid": None, "late_key": "dropped"},
                "not-a-record",  # app.py silently keeps list; processor drops non-dicts
            ]
        )
    )
    # file 2: single object -> promoted to a 1-element list (app.py:149-152)
    (up / "single.json").write_text(_json.dumps({"zeta": 3, "alpha": "c", "mid": {"k": 2}}))

    df, report = ingest_directory(spark, up, schema_mode="first_record")
    # web-path schema contract: record-0 keys, insertion order, no lineage
    assert df.columns == ["zeta", "alpha", "mid"]
    assert "_source_file" not in df.columns
    assert df.count() == 3  # 2 array records + 1 promoted object
    assert report.files_processed == 2

    # all-TEXT normalization parity: nested dict -> JSON string
    rows = {r["zeta"]: r for r in df.collect()}
    assert rows["1"]["mid"] == '{"k": 1}' or rows["1"]["mid"] == '{"k":1}'

    # CREATE TABLE + insert (web step 2), then PRAGMA-style describe
    t = "t_web_parity"
    assert sink.create_table(spark, df, t)
    assert sink.insert_data(spark, df, t) == 3
    cols = catalog.describe_table(spark, t)
    assert [c["name"] for c in cols] == ["zeta", "alpha", "mid"]
    assert all(c["type"] == "string" and c["nullable"] for c in cols)  # all-TEXT

    # LIMIT-100 preview (web step 3)
    prev = query.preview(spark, t, limit=100)
    assert prev.count() == 3
    assert prev.columns == ["zeta", "alpha", "mid"]
