"""Hostile-input suite (FIXTURES.md §11 / reference
`tests/error_handling/test_error_scenarios.py`): every malformed file
must be rejected-but-isolated; every survivable oddity must survive.
"""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from generic_data_ingestor_framework_spark.ingest import ingest_directory

MALFORMED = {
    "missing_brace.json": '{"id": 1, "name": "John"',
    "missing_comma.json": '{"id": 1 "name": "Missing comma"}',
    "trailing_comma.json": '{"id": 1, "name": "John",}',
    "invalid_quotes.json": "{'id': 1, 'name': 'single'}",
    "invalid_quotes_array.json": "[{'id': 1, 'name': 'single-in-array'}]",
    "invalid_literal.json": '{"invalid": json}',
    "incomplete_array.json": '[{"id": 1}, {"id": 2',
    "undefined_literal.json": '{"x": undefined}',
    "zero_byte.json": "",
}

SURVIVORS = {
    "unicode.json": json.dumps(
        [
            {
                "id": "u1",
                "chinese": "中文测试",
                "arabic": "اختبار",
                "emoji": "🎉🎊",
                "xml_entities": "<>&\"'",
                "zero_width": "a​b‌c",
                "control_chars": "line1\nline2\ttab",
            }
        ]
    ),
    "large_values.json": json.dumps(
        [
            {
                "id": "lv1",
                "very_large_integer": 9223372036854775807,
                "very_large_float": 1.7976931348623157e308,
                "very_small_float": 2.2250738585072014e-308,
                "large_string": "x" * 10000,
            }
        ]
    ),
}


def test_hostile_directory_isolates_every_bad_file(spark, tmp_path):
    for name, content in {**MALFORMED, **SURVIVORS}.items():
        (tmp_path / name).write_text(content)
    df, report = ingest_directory(spark, tmp_path)
    assert report.files_processed == len(SURVIVORS)
    assert report.files_failed == len(MALFORMED)
    failed = {e["file"] for e in report.errors}
    assert failed == set(MALFORMED)
    assert df.count() == 2


def test_unicode_values_roundtrip(spark, tmp_path):
    (tmp_path / "u.json").write_text(SURVIVORS["unicode.json"])
    df, _ = ingest_directory(spark, tmp_path)
    row = df.collect()[0]
    assert row["chinese"] == "中文测试"
    assert row["emoji"] == "🎉🎊"
    assert row["xml_entities"] == "<>&\"'"
    assert row["zero_width"] == "a​b‌c"
    assert row["control_chars"] == "line1\nline2\ttab"


def test_numeric_extremes_preserved_as_text(spark, tmp_path):
    (tmp_path / "lv.json").write_text(SURVIVORS["large_values.json"])
    df, _ = ingest_directory(spark, tmp_path)
    row = df.collect()[0]
    assert row["very_large_integer"] == "9223372036854775807"
    assert float(row["very_large_float"]) == 1.7976931348623157e308
    assert float(row["very_small_float"]) == 2.2250738585072014e-308
    assert len(row["large_string"]) == 10000


def test_lossless_mode_numeric_extremes(spark, tmp_path):
    (tmp_path / "lv.json").write_text(SURVIVORS["large_values.json"])
    df, _ = ingest_directory(spark, tmp_path, text_parity=False)
    row = df.collect()[0]
    assert row["very_large_integer"] == 9223372036854775807
    assert row["very_large_float"] == 1.7976931348623157e308


def test_deep_nesting_survives(spark, tmp_path):
    deep: dict = {"leaf": 1.5}
    for i in range(8):
        deep = {f"level{i}": deep}
    (tmp_path / "deep.json").write_text(json.dumps([{"id": "d1", "tree": deep}]))
    df, report = ingest_directory(spark, tmp_path)
    assert report.files_processed == 1
    parsed = json.loads(df.select("tree").collect()[0][0])
    node = parsed
    for i in reversed(range(8)):
        node = node[f"level{i}"]
    assert node["leaf"] == 1.5


def test_salvage_latin1_mixed_array_keeps_encoding(spark, tmp_path):
    """A6×A8: a latin-1 file whose top-level array mixes objects and
    scalars must salvage the objects WITHOUT mangling the text (the
    salvage read threads the sniffed encoding through)."""
    p = tmp_path / "mixed_latin.json"
    p.write_bytes('[{"name": "café"}, 42, "loose"]'.encode("latin-1"))
    df, report = ingest_directory(spark, tmp_path)
    assert report.files_processed == 1
    assert report.records_dropped_non_dict == 2
    assert df.collect()[0]["name"] == "café"


def test_hostile_csv_ragged_and_empty(spark, tmp_path):
    """CSV robustness: ragged rows survive PERMISSIVE parsing and an
    empty (header-only) csv is not an error."""
    (tmp_path / "ragged.csv").write_text("a,b,c\n1,2,3\n4,5\n6,7,8,9\n")
    (tmp_path / "header_only.csv").write_text("x,y\n")
    df, report = ingest_directory(spark, tmp_path, file_types=["csv"])
    assert report.files_failed == 0
    ragged = df.filter(F.col("_source_file") == "ragged.csv")
    assert ragged.count() == 3  # every data row kept, short/long rows padded/truncated


def test_salvage_plan_is_jvm_only(spark, tmp_path):
    """The salvaged bulk path must be pure Catalyst: no RDD scan, no
    Python runner stage (only the bounded schema sample touches the
    driver)."""
    from generic_data_ingestor_framework_spark.ingest import salvage_json_elements

    p = tmp_path / "mixed.json"
    p.write_text('[{"a": 1, "b": "x"}, 7, {"a": 2}, "loose"]')
    df, dropped = salvage_json_elements(spark, str(p))
    assert dropped == 2
    plan = df._jdf.queryExecution().executedPlan().toString()
    for marker in ("ExistingRDD", "EvalPython", "PythonRunner", "MapPartitions"):
        assert marker not in plan, f"Python/RDD stage in salvage plan: {marker}"
    rows = {tuple(r) for r in df.collect()}
    assert rows == {(1, "x"), (2, None)}
