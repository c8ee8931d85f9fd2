"""Write sinks (SURVEY §2 A12-A13, A25-A26).

The reference's sink is a SQLite table created with all-TEXT DDL and
filled by batched ``executemany`` with rollback-on-error
(`src/connectors/sqlite_connector.py:131-222`). Spark equivalents:

- DDL + insert → ``saveAsTable`` (create semantics via mode);
  batching IS partitioning — each task commits its own split, and the
  commit protocol discards failed task output (the rollback analogue).
- atomic JSON/text writes (`file_handler.py:181-266`) → Spark's
  job-commit protocol: output appears only after a successful job.

Scale notes: writers repartition only when the caller asks — a 100 TB
sink wants the upstream partitioning preserved, not a coalesce through
one writer. ``maxRecordsPerFile`` bounds file sizes without a shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def create_table(
    spark: SparkSession, df: DataFrame, table: str, if_not_exists: bool = True
) -> bool:
    """A12: CREATE TABLE [IF NOT EXISTS] with the DataFrame's schema.
    Returns True if the table exists after the call."""
    mode = "ignore" if if_not_exists else "errorifexists"
    df.limit(0).write.mode(mode).saveAsTable(table)
    return spark.catalog.tableExists(table)


def insert_data(
    spark: SparkSession, df: DataFrame, table: str, max_records_per_file: int | None = None
) -> int:
    """A13: batched append. Partition-parallel; the task-commit
    protocol gives the reference's rollback-on-error semantics
    (failed tasks leave no visible output). Returns rows written."""
    writer = df.write.mode("append")
    if max_records_per_file:
        writer = writer.option("maxRecordsPerFile", str(max_records_per_file))
    writer.saveAsTable(table)
    return spark.table(table).count() if spark.catalog.tableExists(table) else 0


def write_parquet(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).parquet(path)


def write_json(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """A25: JSON sink — atomicity via the job commit protocol (the
    Spark-native form of temp-file-write → validate → rename)."""
    df.write.mode(mode).json(path)


def write_text(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """A26: text sink; the input must be a single string column."""
    df.write.mode(mode).text(path)
