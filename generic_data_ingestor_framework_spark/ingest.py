"""Ingestion pipeline (SURVEY §2 A5-A6, A9-A11, A22, A24).

The reference's lifecycle — discover → parse JSON → normalize → add
lineage → concatenate → infer unified schema → save
(`src/core/application.py:36-153`) — re-expressed as Spark reads and
one union plan.

Two execution modes:

- ``bulk`` (the scale path): ONE multi-path ``spark.read.json`` over
  all discovered files — distributed listing, distributed parse,
  native schema union, corrupt records quarantined via PERMISSIVE
  ``_corrupt_record``. This is what you run on 100 TB.
- ``parity`` (the reference-contract path): per-file reads so that
  per-file error isolation and the reference's run report (files
  processed / failed / error list, A24/A22) are byte-for-byte
  reproducible. File-level parallelism only; used by the golden tests.

Encoding fallback (A6) mirrors `file_handler.py:147-170`: utf-8-sig
first, then utf-8 / latin-1 / cp1252 / ascii, retried on parse failure.
"""

from __future__ import annotations

import json
import time
from dataclasses import dataclass, field
from functools import reduce
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from generic_data_ingestor_framework_spark.normalize import (
    drop_corrupt_records,
    normalize_text_parity,
)
from generic_data_ingestor_framework_spark.scanner import FileScanner

FALLBACK_ENCODINGS = ["UTF-8", "ISO-8859-1", "windows-1252", "US-ASCII"]

# row element name for the XML source (Spark 4 built-in data source);
# files written by sink-side Spark use the same tag, so round-trips are
# configuration-free
XML_ROW_TAG = "record"

_SNIFF_BYTES = 64 * 1024


def _logical_path(p: str) -> str:
    """Path with a trailing ``.gz`` stripped: Spark's text readers
    decompress by codec extension, so every FORMAT decision (layout,
    separator, multiline) must look at the inner extension."""
    return p[:-3] if p.lower().endswith(".gz") else p


def detect_encoding(path: str | Path) -> str:
    """A6: byte-sniff the encoding before handing the file to Spark.

    Spark's JSON reader replaces invalid UTF-8 with U+FFFD instead of
    failing, so a lenient read would silently mangle latin-1 input; the
    reference instead decodes strictly and falls back
    (`file_handler.py:147-170`, 1 KB probe at `:373-385`). Sniff the
    head bytes with strict decoding and return the first encoding that
    round-trips. Gzip members are sniffed on DECOMPRESSED bytes (the
    encoding option applies after Spark's codec decompression)."""
    if str(path).lower().endswith(".gz"):
        import gzip

        with gzip.open(path, "rb") as f:
            head = f.read(_SNIFF_BYTES)
    else:
        with open(path, "rb") as f:
            head = f.read(_SNIFF_BYTES)
    if head.startswith(b"\xef\xbb\xbf"):
        return "UTF-8"  # BOM: Spark strips it in multiLine mode
    for enc in FALLBACK_ENCODINGS:
        try:
            head.decode(enc)
            return enc
        except (UnicodeDecodeError, LookupError):
            continue
    return "ISO-8859-1"  # total fallback: latin-1 accepts any bytes

CORRUPT_COL = "_corrupt_record"
SOURCE_COL = "_source_file"
# bounded driver-side sample for salvage element-schema inference (A11
# sample-based contract; the bulk re-parse stays fully in-plan)
SALVAGE_SCHEMA_SAMPLE = 100


@dataclass
class IngestReport:
    """A22 run metrics + A24 error list."""

    files_processed: int = 0
    files_failed: int = 0
    total_records: int = 0
    records_dropped_non_dict: int = 0
    errors: list[dict] = field(default_factory=list)
    elapsed_sec: float = 0.0

    @property
    def throughput_rps(self) -> float:
        return self.total_records / self.elapsed_sec if self.elapsed_sec > 0 else 0.0


def with_lineage(df: DataFrame) -> DataFrame:
    """A9: `_source_file` = basename of the originating file."""
    return df.withColumn(
        SOURCE_COL, F.element_at(F.split(F.input_file_name(), "/"), -1)
    )


def read_json_file(
    spark: SparkSession, path: str | Path, multiline: bool | None = None
) -> DataFrame:
    """A5+A6: whole-file JSON read with encoding fallback.

    ``multiline`` defaults by extension: `.jsonl`/`.ndjson` are
    line-delimited, `.json` is a whole-file array/object."""
    p = str(path)
    if multiline is None:
        multiline = not _logical_path(p).endswith((".jsonl", ".ndjson"))
    enc = detect_encoding(p)
    df = (
        spark.read.option("multiLine", str(multiline).lower())
        .option("allowSingleQuotes", "false")  # Python json.load parity
        .option("encoding", enc)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .json(p)
    )
    df.schema  # force analysis so parse failures surface here
    return df


def _is_unparseable(df: DataFrame) -> bool:
    """A file whose every record is corrupt yields only the corrupt
    column (or nothing) — the reference treats that as a failed file."""
    cols = set(df.columns)
    return cols <= {CORRUPT_COL}


def salvage_json_elements(
    spark: SparkSession, path: str | Path
) -> tuple[DataFrame | None, int]:
    """A8 salvage for mixed top-level arrays.

    Spark's multiLine reader rejects a whole document whose top-level
    array mixes objects and scalars; the reference instead keeps the
    dict elements and silently drops the rest
    (`json_processor.py:57-61`). Reproduce that Spark-natively:
    binary read → ``decode`` with the sniffed encoding (the text
    source has no encoding option and would U+FFFD-mangle latin-1) →
    ``from_json(..., 'array<string>')`` (object elements come back as
    raw JSON text) → keep ``{``-prefixed elements → ``from_json``
    them against an element schema inferred from a bounded sample →
    ``select("s.*")``.  The whole bulk path is JVM-side Catalyst
    expressions: no RDD scan, no Python runner stage (a multi-GB
    hostile file pays one decode, not a JVM→Python→JVM round-trip).

    Schema contract: the element schema is inferred from the first
    ``SALVAGE_SCHEMA_SAMPLE`` object elements — the same bounded
    sample-based inference contract as A11's ``infer_schema_sample``
    (the reference's own schema unify samples 10 records,
    ``main.py:121-128``); a field first appearing after the sample
    window is dropped from the salvaged projection.  Only that bounded
    sample and scalar counts ever reach the driver.

    Returns (parsed_df | None, n_dropped_non_dict).
    """
    enc = detect_encoding(path)
    # detect_encoding only ever returns UTF-8 or ISO-8859-1 (latin-1
    # accepts every byte sequence, so later fallbacks are unreachable) —
    # both are charsets F.decode supports
    raw = spark.read.format("binaryFile").load(str(path)).select(
        F.decode(F.col("content"), enc).alias("value")
    )
    # from_json has its OWN parser options — without the explicit
    # allowSingleQuotes=false it would accept (and silently rewrite)
    # single-quoted pseudo-JSON that the strict fast path just rejected
    arr_df = raw.select(
        F.length(F.trim(F.col("value"))).alias("n_chars"),
        F.from_json(
            "value", "array<string>", {"allowSingleQuotes": "false"}
        ).alias("arr"),
    )
    is_obj = lambda j: j.isNotNull() & F.ltrim(j).startswith("{")
    stats = arr_df.select(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.when(F.col("n_chars") > 0, 1).otherwise(0)).alias("n_nonempty"),
        F.sum(F.when(F.col("arr").isNotNull(), 1).otherwise(0)).alias("n_arrays"),
        F.sum(F.coalesce(F.size("arr"), F.lit(0))).alias("n_elems"),
        F.sum(F.coalesce(F.size(F.filter("arr", is_obj)), F.lit(0))).alias("n_objs"),
    ).collect()[0]
    if stats["n_rows"] == 0 or not stats["n_nonempty"]:
        raise ValueError(f"empty file: {path}")
    if not stats["n_arrays"]:
        # not a JSON array: a single object parses on the fast path, so
        # reaching here means the document is malformed
        raise ValueError(f"no parseable JSON records in {path}")
    dropped = int(stats["n_elems"]) - int(stats["n_objs"])
    if not stats["n_objs"]:
        return None, dropped  # valid array, zero dict records (not an error)
    obj_df = arr_df.select(F.explode(F.filter("arr", is_obj)).alias("elem"))
    sample = [r.elem for r in obj_df.limit(SALVAGE_SCHEMA_SAMPLE).collect()]
    schema = (
        spark.read.option("allowSingleQuotes", "false")
        .json(spark.sparkContext.parallelize(sample))
        .schema
    )
    parsed = obj_df.select(
        F.from_json("elem", schema, {"allowSingleQuotes": "false"}).alias("s")
    ).select("s.*")
    return parsed, dropped


def read_json_records(
    spark: SparkSession, path: str | Path
) -> tuple[DataFrame, int]:
    """Full A5/A6/A8 read of one file: fast whole-file read with
    encoding fallback, then the mixed-array salvage path. Raises if the
    file has no parseable records. Returns (clean_df, n_dropped)."""
    raw = read_json_file(spark, path)
    dropped = 0
    if _is_unparseable(raw):
        salvaged, dropped = salvage_json_elements(spark, path)
        if salvaged is None:
            # valid array with zero dict records → empty, not an error
            from pyspark.sql import types as T

            return spark.createDataFrame([], T.StructType([])), dropped
        if _is_unparseable(salvaged):
            raise ValueError(f"no parseable JSON records in {path}")
        raw = salvaged
    return drop_corrupt_records(raw), dropped


_CSV_SEPARATORS = {".csv": ",", ".tsv": "\t", ".psv": "|"}


def read_csv_file(
    spark: SparkSession, path: str | Path | list[str], header: bool = True
) -> DataFrame:
    """CSV/TSV/PSV read (declared in the reference scanner,
    `file_scanner.py:22-29`, but never implemented there). All columns
    read as string — the reference's all-TEXT data model natively.
    Accepts a path list for the bulk mode's one-scan-per-format read
    (separator taken from the first path's extension)."""
    paths = [str(x) for x in path] if isinstance(path, list) else [str(path)]
    sep = _CSV_SEPARATORS.get(Path(_logical_path(paths[0])).suffix.lower(), ",")
    return (
        spark.read.option("header", str(header).lower())
        .option("sep", sep)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .csv(paths)
    )


def read_csv_paths_bulk(spark: SparkSession, paths: list[str]) -> DataFrame:
    """Bulk CSV read, grouped by (separator, header signature).

    Spark unions the files of one csv() scan POSITIONALLY: a file whose
    header reorders (or renames) columns lands its values in the wrong
    columns with only a console warning, and a tab-separated file swept
    into a comma scan collapses into one mangled column. Grouping by
    the first line (one local read per file — this ingest frontend is
    the reference's local-directory scanner; a remote-FS deployment
    would group via the FS client the same way) gives one scan per
    distinct header/separator and a by-NAME union across groups — no
    silent misalignment at any file count."""
    groups: dict[tuple[str, str], list[str]] = {}
    for p in paths:
        sep = _CSV_SEPARATORS.get(Path(_logical_path(p)).suffix.lower(), ",")
        if p.lower().endswith(".gz"):
            import gzip

            with gzip.open(p, "rt", encoding="utf-8", errors="replace") as fh:
                header = fh.readline().rstrip("\r\n")
        else:
            with open(p, encoding="utf-8", errors="replace") as fh:
                header = fh.readline().rstrip("\r\n")
        groups.setdefault((sep, header), []).append(p)
    frames = [read_csv_file(spark, ps) for ps in groups.values()]
    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f, allowMissingColumns=True)
    return out


def read_any_file(
    spark: SparkSession, path: str | Path, ftype: str
) -> tuple[DataFrame, int]:
    """Format dispatch (A2 classification → reader). Returns
    (clean_df, n_dropped_non_record)."""
    if ftype == "json":
        return read_json_records(spark, path)
    if ftype == "csv":
        return drop_corrupt_records(read_csv_file(spark, path)), 0
    if ftype == "parquet":
        return spark.read.parquet(str(path)), 0
    if ftype == "orc":
        return spark.read.orc(str(path)), 0
    if ftype == "xml":
        return (
            spark.read.format("xml").option("rowTag", XML_ROW_TAG).load(str(path)),
            0,
        )
    raise ValueError(f"unsupported file type: {ftype}")


def ingest_directory(
    spark: SparkSession,
    directory: str | Path,
    mode: str = "parity",
    text_parity: bool = True,
    file_types: list[str] | None = None,
    include_patterns: list[str] | None = None,
    exclude_patterns: list[str] | None = None,
    schema_mode: str = "sorted",
) -> tuple[DataFrame | None, IngestReport]:
    """The reference pipeline end-to-end. Returns (DataFrame, report).

    ``text_parity=True`` applies the A7 all-TEXT projection; False
    keeps lossless native types (the analytics-friendly default for
    new pipelines). ``file_types`` defaults to every supported format
    (json/csv/parquet/orc/xml) — a superset of the reference, which
    classifies csv/parquet but only ever ingests json (SURVEY §2.C);
    orc and xml ride Spark's built-in data sources.
    ``schema_mode`` picks the reference frontend being reproduced:
    ``"sorted"`` = CLI path (sorted union of all keys + lineage),
    ``"first_record"`` = Streamlit path (record-0 keys only, no
    lineage — see ``unify_schema_first_record``).
    """
    t0 = time.time()
    if not Path(directory).is_dir():
        raise NotADirectoryError(f"input directory does not exist: {directory}")
    report = IngestReport()
    scanner = FileScanner(directory)
    discovered = scanner.validate_discovered_files(
        scanner.discover_files(
            file_types=file_types or ["json", "csv", "parquet", "orc", "xml"],
            include_patterns=include_patterns,
            exclude_patterns=exclude_patterns,
        )
    )
    typed_paths = [
        (str(p), ftype) for ftype, ps in sorted(discovered.items()) for p in ps
    ]
    if not typed_paths:
        report.elapsed_sec = time.time() - t0
        return None, report

    if mode == "bulk":
        # one distributed multi-path read PER FORMAT, then a schema-
        # merging union — the whole directory becomes ~3 scans no
        # matter how many files it holds. If a format's group scan
        # fails (e.g. unmergeable parquet schemas), it DEGRADES to
        # per-file reads so one bad file costs itself, not the format
        # group (A24 continue-on-error at file granularity either way).
        # Bad JSON documents are dropped inline (DROPMALFORMED).
        frames = []
        for ftype, reader in (
            ("json", lambda ps: read_json_paths_bulk(spark, ps)),
            ("csv", lambda ps: with_lineage(read_csv_paths_bulk(spark, ps))),
            ("parquet", lambda ps: with_lineage(
                spark.read.option("mergeSchema", "true").parquet(*ps)
            )),
            ("orc", lambda ps: with_lineage(
                spark.read.option("mergeSchema", "true").orc(*ps)
            )),
            ("xml", lambda ps: with_lineage(
                spark.read.format("xml").option("rowTag", XML_ROW_TAG).load(ps)
            )),
        ):
            paths = [p for p, t in typed_paths if t == ftype]
            if not paths:
                continue
            try:
                frames.append(reader(paths))
                report.files_processed += len(paths)
            except Exception as ex:  # noqa: BLE001 — A24 continue-on-error
                report.errors.append(
                    {
                        "file": f"<bulk:{ftype}>",
                        "error": f"{type(ex).__name__}: {str(ex)[:400]}"
                        + " (degrading to per-file reads)",
                    }
                )
                for p in paths:
                    try:
                        fdf, _ = read_any_file(spark, p, ftype)
                        # literal lineage: input_file_name() is empty
                        # for salvaged (driver-parsed) frames, and the
                        # per-file path knows its file exactly
                        frames.append(
                            fdf.withColumn(SOURCE_COL, F.lit(Path(p).name))
                        )
                        report.files_processed += 1
                    except Exception as fex:  # noqa: BLE001
                        report.files_failed += 1
                        report.errors.append(
                            {
                                "file": Path(p).name,
                                "error": f"{type(fex).__name__}: {str(fex)[:400]}",
                            }
                        )
        if not frames:
            report.elapsed_sec = time.time() - t0
            return None, report
        frames = [
            f.drop(CORRUPT_COL) if CORRUPT_COL in f.columns else f for f in frames
        ]
        # harmonize type-conflicted columns to string BEFORE the union:
        # ANSI union coercion picks the numeric side for string+double
        # and then fails (or corrupts) at runtime on non-numeric rows —
        # the all-TEXT widening is the reference's own data model
        seen: dict[str, set[str]] = {}
        for f in frames:
            for c, t in f.dtypes:
                seen.setdefault(c, set()).add(t)
        conflicted = {c for c, ts in seen.items() if len(ts) > 1}
        if conflicted:
            frames = [
                f.select(
                    *[
                        f[c].cast("string").alias(c) if c in conflicted else f[c]
                        for c in f.columns
                    ]
                )
                for f in frames
            ]
        df = reduce(lambda a, b: a.unionByName(b, allowMissingColumns=True), frames)
        report.total_records = df.count()
        report.elapsed_sec = time.time() - t0
        return df, report

    frames: list[DataFrame] = []
    first_path: str | None = None
    for path, ftype in typed_paths:
        try:
            clean, dropped = read_any_file(spark, path, ftype)
            report.records_dropped_non_dict += dropped
            n = clean.count()
            if n == 0:
                continue  # valid-but-empty ([]): not processed, not an error
            if text_parity:
                clean = normalize_text_parity(clean)
            clean = with_lineage(clean)
            if dropped:
                # salvage re-parse loses input_file_name(); pin lineage
                clean = clean.withColumn(SOURCE_COL, F.lit(Path(path).name))
            frames.append(clean)
            if first_path is None:
                # record-0 key-order source (web path): ONLY the first
                # processed file overall qualifies, and only when it is
                # JSON — if a CSV/parquet frame leads, df.limit(1)'s
                # record 0 comes from THAT frame and imposing a later
                # JSON file's key order would mix two files' contracts
                # (CSV frames already carry their header order natively)
                first_path = path if ftype == "json" else ""
            report.files_processed += 1
            report.total_records += n
        except Exception as ex:  # noqa: BLE001 — A24 continue-on-error
            report.files_failed += 1
            report.errors.append(
                {"file": Path(path).name, "error": f"{type(ex).__name__}: {str(ex)[:400]}"}
            )

    df = (
        reduce(lambda a, b: a.unionByName(b, allowMissingColumns=True), frames)
        if frames
        else None
    )
    if df is not None:
        df = (
            unify_schema_first_record(df, first_file=first_path or None)
            if schema_mode == "first_record"
            else unify_schema_sorted(df)
        )
    report.elapsed_sec = time.time() - t0
    return df, report


def read_json_paths_bulk(spark: SparkSession, paths: list[str]) -> DataFrame:
    """The scale path: one distributed multi-path read per JSON layout;
    Spark unions schemas natively and drops malformed documents inline.

    Line-delimited files (``.jsonl``/``.ndjson``) MUST be read with
    ``multiLine=false`` — under ``multiLine=true`` Spark parses each
    file as one document and silently keeps only the first object
    (records 2..N lost). Whole-file JSON needs the opposite. So the
    bulk read is one scan per layout, unioned with missing columns
    allowed.

    DROPMALFORMED (not PERMISSIVE): the corrupt-record column of a raw
    scan can't be counted/aggregated on its own (Spark restriction), and
    at scale you route bad records to a quarantine prefix via
    ``badRecordsPath`` rather than carrying them in-plan."""
    line_delim = [p for p in paths if _logical_path(p).endswith((".jsonl", ".ndjson"))]
    whole_file = [p for p in paths if not _logical_path(p).endswith((".jsonl", ".ndjson"))]
    frames = []
    for group, multiline in ((whole_file, "true"), (line_delim, "false")):
        if group:
            frames.append(
                spark.read.option("multiLine", multiline)
                .option("allowSingleQuotes", "false")
                .option("mode", "DROPMALFORMED")
                .json(group)
            )
    df = frames[0]
    for f in frames[1:]:
        df = df.unionByName(f, allowMissingColumns=True)
    return with_lineage(df)


def unify_schema_first_record(df: DataFrame, first_file: str | Path | None = None) -> DataFrame:
    """A11, second frontend mode: the reference's Streamlit path infers
    the table schema from the FIRST processed record only
    (`app.py:168-175`) — later-appearing columns are silently dropped
    and no ``_source_file`` lineage exists on that path. Reproduced as
    an opt-in mode so a web-path user sees the same table shape.

    Column ORDER parity: the reference emits ``sample_record.keys()``
    in dict insertion order; Spark's JSON inference sorts keys, so when
    ``first_file`` is given, record 0's key order is recovered from the
    raw file with an order-preserving driver-side parse (non-dict array
    heads are skipped exactly like the reference's processor drops
    them). Without ``first_file`` the inference order stands. Remaining
    divergence (documented, SURVEY §1.3 path 2): a key that is null
    (or, after the A7 text projection, collapsed to ``""``) in record 0
    is indistinguishable from an absent key — all are dropped."""
    first = df.limit(1).collect()  # one row by contract, like the reference
    if not first:
        return df.select([c for c in df.columns if c != SOURCE_COL])
    row = first[0].asDict()
    cols = [
        c for c in df.columns if c != SOURCE_COL and row.get(c) not in (None, "")
    ]
    if first_file is not None:
        try:
            if str(first_file).lower().endswith(".gz"):
                import gzip

                opener = lambda: gzip.open(  # noqa: E731
                    first_file, "rt", encoding=detect_encoding(first_file)
                )
            else:
                opener = lambda: open(  # noqa: E731
                    first_file, encoding=detect_encoding(first_file)
                )
            with opener() as fh:
                data = json.load(fh)
            rec0 = (
                next((x for x in data if isinstance(x, dict)), None)
                if isinstance(data, list)
                else data
            )
            if isinstance(rec0, dict):
                order = {k: i for i, k in enumerate(rec0)}
                cols.sort(key=lambda c: order.get(c, len(order)))
        except Exception:  # noqa: BLE001 — unreadable head file: keep inference order
            pass
    return df.select(*cols)


def unify_schema_sorted(df: DataFrame) -> DataFrame:
    """A11 parity: columns sorted alphabetically (reference
    `_infer_simple_schema`, `application.py:219`), `_source_file` kept
    last for readability parity with the lineage injection order."""
    cols = sorted(c for c in df.columns if c != SOURCE_COL)
    if SOURCE_COL in df.columns:
        cols.append(SOURCE_COL)
    return df.select(*cols)


def infer_schema_sample(df: DataFrame, sample: int = 10) -> list[dict]:
    """The reference's sample-of-10 inference contract
    (`application.py:197-227`): union of keys over the first N records,
    sorted, every column TEXT/nullable. Returned as column descriptors;
    we deliberately do NOT drop later-appearing columns from the data
    (documented divergence from the reference's silent data loss,
    SURVEY §1.3)."""
    head = df.limit(sample)
    keys: set[str] = set()
    for row in head.collect():
        d = row.asDict()
        keys.update(k for k, v in d.items() if v is not None or k in d)
    return [{"name": k, "type": "TEXT", "nullable": True} for k in sorted(keys)]
