"""Error handling & aggregation (SURVEY §2 A21, A24).

The reference aggregates an error log into count-by-type with a top-5
ranking (`src/handlers/error_handler.py:47-95`) — the one genuine
groupBy/sort/limit computation in its codebase. Here it's a DataFrame
plan; the quarantine path keeps corrupt raw records queryable instead
of discarding them.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def error_summary(errors_df: DataFrame, top_n: int = 5) -> dict:
    """A21: total count, count by type, top-N types, first-10 details.

    ``errors_df`` needs columns ``error_type`` and ``message``."""
    by_type_df = (
        errors_df.groupBy("error_type")
        .agg(F.count(F.lit(1)).alias("count"))
        .orderBy(F.desc("count"), "error_type")
    )
    by_type = {r["error_type"]: r["count"] for r in by_type_df.collect()}
    return {
        "total_errors": sum(by_type.values()),
        "errors_by_type": by_type,
        "top_errors": list(by_type.items())[:top_n],
        "details": [r.asDict() for r in errors_df.limit(10).collect()],
    }


def errors_from_report(spark: SparkSession, report_errors: list[dict]) -> DataFrame:
    """Lift an IngestReport error list into a queryable DataFrame."""
    rows = [
        (e.get("file", ""), e.get("error", "").split(":")[0] or "UnknownError", e.get("error", ""))
        for e in report_errors
    ]
    return spark.createDataFrame(rows, "file string, error_type string, message string")


def quarantine_corrupt(df: DataFrame, corrupt_col: str = "_corrupt_record") -> tuple[DataFrame, DataFrame]:
    """A24: split (clean, quarantined) — the distributed form of the
    reference's per-file error isolation; quarantined raw text stays
    queryable for reprocessing."""
    if corrupt_col not in df.columns:
        return df, df.limit(0)
    # Spark disallows plans whose pruned column set is only the corrupt
    # column of a raw scan; materialize the parsed scan once (Spark's
    # own documented remedy). localCheckpoint, NOT cache(): checkpoint
    # blocks are ContextCleaner-managed and released when the returned
    # frames are dropped, while a cache() here leaked one pinned copy
    # per ingest in a long-lived session. At 100 TB you'd point
    # `badRecordsPath` at a quarantine prefix instead of splitting
    # in-plan.
    df = df.localCheckpoint(eager=False)
    clean = df.filter(F.col(corrupt_col).isNull()).drop(corrupt_col)
    bad = df.filter(F.col(corrupt_col).isNotNull())
    return clean, bad
