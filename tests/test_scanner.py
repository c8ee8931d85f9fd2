"""Scanner unit tests (A1-A4, A20; reference `file_scanner.py`)."""

from __future__ import annotations

from generic_data_ingestor_framework_spark.scanner import FileScanner


def _touch(d, name, content="x"):
    p = d / name
    p.write_text(content)
    return p


def test_classification_and_grouping(tmp_path):
    _touch(tmp_path, "a.json")
    _touch(tmp_path, "b.jsonl")
    _touch(tmp_path, "c.csv")
    _touch(tmp_path, "d.parquet")
    _touch(tmp_path, "e.txt")  # unclassified
    found = FileScanner(tmp_path).discover_files()
    assert sorted(p.name for p in found["json"]) == ["a.json", "b.jsonl"]
    assert [p.name for p in found["csv"]] == ["c.csv"]
    assert [p.name for p in found["parquet"]] == ["d.parquet"]
    assert "e.txt" not in str(found)


def test_default_ignore_patterns(tmp_path):
    _touch(tmp_path, ".hidden.json")
    _touch(tmp_path, "x.tmp")
    _touch(tmp_path, "good.json")
    found = FileScanner(tmp_path).discover_files(file_types=["json"])
    assert [p.name for p in found["json"]] == ["good.json"]


def test_recursive_and_nonrecursive(tmp_path):
    sub = tmp_path / "sub"
    sub.mkdir()
    _touch(sub, "deep.json")
    _touch(tmp_path, "top.json")
    s = FileScanner(tmp_path)
    rec = s.discover_files(file_types=["json"], recursive=True)
    assert sorted(p.name for p in rec["json"]) == ["deep.json", "top.json"]
    nonrec = FileScanner(tmp_path).discover_files(file_types=["json"], recursive=False)
    assert [p.name for p in nonrec["json"]] == ["top.json"]


def test_include_exclude_patterns(tmp_path):
    _touch(tmp_path, "keep_1.json")
    _touch(tmp_path, "keep_2.json")
    _touch(tmp_path, "skip.json")
    found = FileScanner(tmp_path).discover_files(
        file_types=["json"], include_patterns=["keep_*"], exclude_patterns=["*_2*"]
    )
    assert [p.name for p in found["json"]] == ["keep_1.json"]


def test_file_details_md5(tmp_path):
    p = _touch(tmp_path, "f.json", '{"a": 1}')
    det = FileScanner(tmp_path).get_file_details(p)
    assert det["size_bytes"] == 8
    assert det["detected_type"] == "json"
    assert len(det["md5"]) == 32


def test_scan_statistics(tmp_path):
    _touch(tmp_path, "a.json")
    _touch(tmp_path, "b.tmp")
    s = FileScanner(tmp_path)
    s.discover_files(file_types=["json"])
    assert s.get_scan_statistics().files_classified == 1
    assert s.get_scan_statistics().files_ignored == 1
