"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video ride through the engine as ``binary`` columns with
typed metadata alongside. The Spark-side plumbing — schema, batch
shape, Arrow transfer, partition-parallel decode via ``mapInPandas`` —
is real and tested; the actual codec step is STUBBED (image/audio
libraries are not available in this environment) behind
``decode_stub``, which derives deterministic fake features from the
raw bytes so results are reproducible and oracle-checkable.

Scale notes (100 TB): binary payloads never shuffle — metadata is
extracted in a map-only stage (``mapInPandas``, Arrow record batches),
and downstream joins/aggregations carry only the small typed columns.
Real deployments read payloads with the ``binaryFile`` source and
partition by file; here we synthesize payloads from ``documents.text``
to exercise the identical plumbing.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from generic_data_ingestor_framework_spark.relational import load_table


def with_binary_payload(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Attach an opaque binary column (synthesized from text here; in
    production this is the ``content`` column of a binaryFile read)."""
    return df.withColumn("payload", F.encode(F.col(text_col), "UTF-8"))


def multimodal_binary_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed metadata over an opaque binary column: byte length + md5 —
    the A20 file-metadata op (`src/handlers/file_handler.py:52-103`)
    recast as a distributed column computation."""
    d = with_binary_payload(load_table(spark, sf_dir, "documents"))
    return d.select(
        "doc_id",
        F.octet_length(F.col("payload")).alias("n_bytes"),
        F.md5(F.col("payload")).alias("payload_md5"),
        F.substring(F.hex(F.col("payload")), 1, 8).alias("magic_hex"),
    )


_DECODE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_frames", T.IntegerType()),
        T.StructField("mean_intensity", T.DoubleType()),
    ]
)


def decode_stub(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """STUB decoder (no image libs in this env): derives deterministic
    fake image properties from the payload bytes. A real deployment
    replaces the body with e.g. PIL/ffmpeg calls — the Arrow batch
    shape, schema, and partitioning are exactly what production uses.
    """
    for pdf in batches:
        payloads = pdf["payload"]
        first = payloads.map(lambda b: b[0] if len(b) > 0 else 0)
        second = payloads.map(lambda b: b[1] if len(b) > 1 else 0)
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "width": (64 + (first % 64)).astype("int32"),
                "height": (64 + (second % 64)).astype("int32"),
                "n_frames": (1 + (payloads.map(len) % 8)).astype("int32"),
                "mean_intensity": payloads.map(
                    lambda b: round(sum(b[:16]) / max(len(b[:16]), 1) / 255.0, 6)
                ),
            }
        )


def multimodal_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partition-parallel decode via mapInPandas (Arrow batches).

    The stub derives width/height/frames/intensity deterministically
    from the payload bytes, so the DuckDB oracle can recompute them
    from the source text's code units."""
    d = with_binary_payload(load_table(spark, sf_dir, "documents")).select(
        "doc_id", "payload"
    )
    return d.mapInPandas(decode_stub, schema=_DECODE_SCHEMA)


N_SAMPLED_FRAMES = 3

_FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("byte_offset", T.IntegerType()),
        T.StructField("chunk_md5", T.StringType()),
    ]
)


def frame_sample_stub(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Video-style frame sampling: each payload is treated as
    ``n_frames`` equal byte chunks and K frames are sampled at uniform
    positions — the 1→N row expansion (one input row, K output rows)
    that real frame extraction produces through mapInPandas. The
    chunk checksum stands in for the decoded frame tensor."""
    import hashlib

    for pdf in batches:
        out: dict[str, list] = {"doc_id": [], "frame_idx": [], "byte_offset": [], "chunk_md5": []}
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            n_bytes = len(payload)
            if n_bytes == 0:
                continue
            n_frames = 1 + n_bytes % 8
            chunk = max(1, n_bytes // n_frames)
            for idx in sorted({(j * n_frames) // N_SAMPLED_FRAMES for j in range(N_SAMPLED_FRAMES)}):
                off = idx * chunk
                out["doc_id"].append(doc_id)
                out["frame_idx"].append(idx)
                out["byte_offset"].append(off)
                out["chunk_md5"].append(hashlib.md5(bytes(payload[off : off + chunk])).hexdigest())
        yield pd.DataFrame(out).astype(
            {"doc_id": "int64", "frame_idx": "int32", "byte_offset": "int32"}
        )


def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Uniform frame sampling over binary payloads (see
    ``frame_sample_stub``): map-only, Arrow-batched, payload bytes
    never shuffle — only the sampled frame descriptors do."""
    d = with_binary_payload(load_table(spark, sf_dir, "documents")).select(
        "doc_id", "payload"
    )
    return d.mapInPandas(frame_sample_stub, schema=_FRAME_SCHEMA)


RESIZE_BUCKETS = 8

_RESIZE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("bucket", T.IntegerType()),
        T.StructField("mean_val", T.DoubleType()),
    ]
)


def resize_stub(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """STUB resize (area interpolation): the payload byte stream is
    downsampled to RESIZE_BUCKETS buckets, each reporting its mean
    intensity — the thumbnail/feature-pyramid step of an image
    pipeline, with the same 1→K row expansion and Arrow batch shape a
    real resize kernel produces. Payloads shorter than the bucket
    count are skipped (no partial thumbnails)."""
    B = RESIZE_BUCKETS
    for pdf in batches:
        out: dict[str, list] = {"doc_id": [], "bucket": [], "mean_val": []}
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            n = len(payload)
            if n < B:
                continue
            for b in range(B):
                lo, hi = (b * n) // B, ((b + 1) * n) // B
                out["doc_id"].append(doc_id)
                out["bucket"].append(b)
                out["mean_val"].append(
                    round(sum(payload[lo:hi]) / (hi - lo) / 255.0, 6)
                )
        yield pd.DataFrame(out).astype({"doc_id": "int64", "bucket": "int32"})


def multimodal_resize_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Area-resize over binary payloads via mapInPandas (see
    ``resize_stub``): map-only, Arrow-batched; the payload bytes stay
    in their partition and only the fixed-width thumbnail rows move."""
    d = with_binary_payload(load_table(spark, sf_dir, "documents")).select(
        "doc_id", "payload"
    )
    return d.mapInPandas(resize_stub, schema=_RESIZE_SCHEMA)


QUERIES = {
    "multimodal_binary_meta": multimodal_binary_meta,
    "multimodal_decode_features": multimodal_decode_features,
    "multimodal_frame_sample": multimodal_frame_sample,
    "multimodal_resize_buckets": multimodal_resize_buckets,
}

ORACLES = {
    "multimodal_binary_meta": """
        SELECT doc_id,
               CAST(octet_length(encode(text)) AS INT) AS n_bytes,
               md5(text) AS payload_md5,
               substr(upper(hex(encode(text))), 1, 8) AS magic_hex
        FROM documents
    """,
    # Text is ASCII in this corpus, so byte k == code unit k.
    "multimodal_frame_sample": f"""
        WITH base AS (
          SELECT doc_id, text,
                 octet_length(encode(text)) AS n_bytes,
                 1 + octet_length(encode(text)) % 8 AS n_frames,
                 greatest(1, octet_length(encode(text)) // (1 + octet_length(encode(text)) % 8)) AS chunk
          FROM documents WHERE octet_length(encode(text)) > 0
        ),
        sampled AS (
          SELECT DISTINCT doc_id, text, chunk,
                 CAST((j * n_frames) // {N_SAMPLED_FRAMES} AS INT) AS frame_idx
          FROM base, (VALUES (0), (1), (2)) t(j)
        )
        SELECT doc_id, frame_idx,
               CAST(frame_idx * chunk AS INT) AS byte_offset,
               md5(substr(text, frame_idx * chunk + 1, chunk)) AS chunk_md5
        FROM sampled
    """,
    "multimodal_resize_buckets": f"""
        WITH base AS (
          SELECT doc_id, text, octet_length(encode(text)) AS n
          FROM documents WHERE octet_length(encode(text)) >= {RESIZE_BUCKETS}
        ),
        buckets AS (
          SELECT doc_id, text, n, CAST(b AS INT) AS bucket,
                 (b * n) // {RESIZE_BUCKETS} AS lo,
                 ((b + 1) * n) // {RESIZE_BUCKETS} AS hi
          FROM base, range(0, {RESIZE_BUCKETS}) t(b)
        )
        SELECT doc_id, bucket,
               round(list_reduce(list_transform(range(lo + 1, hi + 1),
                       i -> CAST(ascii(substr(text, CAST(i AS INT), 1)) AS DOUBLE)),
                     (a, b) -> a + b) / (hi - lo) / 255.0, 6) AS mean_val
        FROM buckets
    """,
    "multimodal_decode_features": """
        SELECT doc_id,
               CAST(64 + ascii(substr(text, 1, 1)) % 64 AS INT) AS width,
               CAST(64 + ascii(substr(text, 2, 1)) % 64 AS INT) AS height,
               CAST(1 + octet_length(encode(text)) % 8 AS INT) AS n_frames,
               round(list_reduce(list_transform(range(1, least(octet_length(encode(text)), 16) + 1),
                       i -> CAST(ascii(substr(text, CAST(i AS INT), 1)) AS DOUBLE)),
                     (a, b) -> a + b)
                 / least(octet_length(encode(text)), 16) / 255.0, 6) AS mean_intensity
        FROM documents
    """,
}
