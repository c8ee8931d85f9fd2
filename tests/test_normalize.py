"""Unit tests for the A7/A8 normalization semantics
(reference `tests/unit/test_json_processor.py`)."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from generic_data_ingestor_framework_spark.normalize import (
    drop_corrupt_records,
    flatten_dot_paths,
    normalize_text_parity,
)


def _df(spark, records):
    return spark.read.json(spark.sparkContext.parallelize([json.dumps(r) for r in records]))


def test_nested_dict_roundtrips_as_json_string(spark):
    df = _df(spark, [{"user": {"name": "Ann", "address": {"city": "X"}}}])
    out = normalize_text_parity(df).collect()[0]
    parsed = json.loads(out["user"])
    assert parsed == {"name": "Ann", "address": {"city": "X"}}


def test_array_roundtrips_as_json_string(spark):
    df = _df(spark, [{"tags": ["a", "b", "c"], "items": [{"q": 1}]}])
    out = normalize_text_parity(df).collect()[0]
    assert json.loads(out["tags"]) == ["a", "b", "c"]
    assert json.loads(out["items"]) == [{"q": 1}]


def test_null_and_falsy_collapse_to_empty_string(spark):
    df = spark.createDataFrame(
        [(None, [], "keep")], "maybe string, arr array<string>, s string"
    )
    out = normalize_text_parity(df).collect()[0]
    assert out["maybe"] == ""
    assert out["arr"] == ""      # [] → "" (falsy collapse)
    assert out["s"] == "keep"


def test_primitives_become_strings_preserving_value(spark):
    df = spark.createDataFrame([(0, False, 2.5)], "z int, b boolean, f double")
    out = normalize_text_parity(df).collect()[0]
    assert out["z"] == "0"
    assert out["b"] == "false"
    assert out["f"] == "2.5"


def test_int64_extremes_survive(spark):
    df = spark.createDataFrame([(9223372036854775807,)], "big bigint")
    out = normalize_text_parity(df).collect()[0]
    assert out["big"] == "9223372036854775807"


def test_non_dict_elements_dropped(spark, tmp_path):
    # top-level array mixing objects and scalars: the scalars must be
    # dropped, the dicts kept (A8, `json_processor.py:57-61`)
    from generic_data_ingestor_framework_spark.ingest import read_json_records

    p = tmp_path / "mixed.json"
    p.write_text('[{"id": 1}, "just a string", 42, {"id": 2}]')
    clean, dropped = read_json_records(spark, p)
    ids = sorted(r["id"] for r in clean.collect())
    assert ids == [1, 2]
    assert dropped == 2


def test_flatten_dot_paths(spark):
    df = _df(
        spark,
        [{"user": {"name": "Ann", "address": {"city": "X"}}, "n": 1}],
    )
    flat = flatten_dot_paths(df)
    assert set(flat.columns) == {"user.name", "user.address.city", "n"}
    row = flat.collect()[0]
    assert row["user.address.city"] == "X"


def test_unicode_passthrough(spark):
    df = _df(spark, [{"t": "Hello 世界! 🌍", "x": "<>&\"'"}])
    out = normalize_text_parity(df).collect()[0]
    assert out["t"] == "Hello 世界! 🌍"
    assert out["x"] == "<>&\"'"


def test_flatten_collision_and_hostile_field_names(spark):
    """A literal `a.b` column colliding with flattened struct a.b must
    not produce duplicate output names (ambiguous for every later
    select); struct FIELD names containing dots must not corrupt the
    lookup path."""
    df = spark.createDataFrame(
        [({"b": 1}, "literal")], "a struct<b: bigint>, `a.b` string"
    )
    out = flatten_dot_paths(df)
    assert out.columns == ["a.b", "a.b_2"]
    row = out.collect()[0]
    assert row["a.b"] == 1 and row["a.b_2"] == "literal"

    df2 = spark.createDataFrame([({"d.ot": 7},)], "s struct<`d.ot`: bigint>")
    out2 = flatten_dot_paths(df2)
    assert out2.columns == ["s.d.ot"]
    assert out2.collect()[0][0] == 7
