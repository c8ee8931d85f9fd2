"""Error aggregation + metrics tests (A21-A24)."""

from __future__ import annotations

from generic_data_ingestor_framework_spark.errors import (
    error_summary,
    errors_from_report,
    quarantine_corrupt,
)
from generic_data_ingestor_framework_spark.metrics import (
    Timer,
    observed_count,
    throughput_rps,
)


def test_error_summary_top5(spark):
    rows = (
        [("f1", "JSONDecodeError", "bad json")] * 5
        + [("f2", "UnicodeDecodeError", "bad bytes")] * 3
        + [("f3", "OSError", "gone")] * 2
        + [("f4", "ValueError", "weird")]
        + [("f5", "KeyError", "missing")]
        + [("f6", "TypeError", "wrong")]
    )
    df = spark.createDataFrame(rows, "file string, error_type string, message string")
    s = error_summary(df)
    assert s["total_errors"] == 13
    assert s["errors_by_type"]["JSONDecodeError"] == 5
    assert len(s["top_errors"]) == 5  # top-5 by count desc (A21)
    assert s["top_errors"][0] == ("JSONDecodeError", 5)
    assert len(s["details"]) == 10


def test_errors_from_report(spark):
    df = errors_from_report(
        spark, [{"file": "m.json", "error": "ValueError: no parseable JSON"}]
    )
    assert df.collect()[0]["error_type"] == "ValueError"


def test_quarantine_split(spark, tmp_path):
    # line-delimited file with one malformed line: PERMISSIVE parsing
    # keeps the bad line as a corrupt record alongside the data columns
    p = tmp_path / "mixed.jsonl"
    p.write_text('{"id": 1}\nTHIS IS NOT JSON\n{"id": 2}')
    raw = (
        spark.read.option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(str(p))
    )
    clean, bad = quarantine_corrupt(raw)
    assert clean.count() == 2
    # collect (not count) — counting only the corrupt column of a raw
    # scan is disallowed by Spark; full-row access is the contract
    bad_rows = bad.collect()
    assert len(bad_rows) == 1
    assert bad_rows[0]["_corrupt_record"] == "THIS IS NOT JSON"


def test_observed_count_no_extra_job(spark):
    df = spark.range(100).withColumnRenamed("id", "x")
    observed, obs = observed_count(df)
    observed.write.format("noop").mode("overwrite").save()
    assert obs.get["n_rows"] == 100


def test_timer_and_throughput():
    with Timer() as t:
        sum(range(10000))
    assert t.elapsed >= 0
    assert throughput_rps(100, 2.0) == 50.0
    assert throughput_rps(100, 0.0) == 0.0
