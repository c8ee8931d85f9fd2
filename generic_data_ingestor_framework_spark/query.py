"""Query surface (SURVEY §2 A15-A19).

The reference's "query engine" is a raw-SQL pass-through with
parameter binding and swallowed errors
(`src/connectors/sqlite_connector.py:80-115`). Spark SQL replaces the
SQLite VM; Catalyst does parse→analyze→optimize→execute.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def execute_query(
    spark: SparkSession,
    sql: str,
    params: dict | list | None = None,
    swallow_errors: bool = False,
) -> DataFrame | None:
    """A15 + A19: SQL pass-through with named/positional parameter
    binding. ``swallow_errors=True`` reproduces the reference's
    return-[]-on-error contract (`sqlite_connector.py:111-115`) —
    off by default because silent failure is a bug-farm."""
    try:
        return spark.sql(sql, args=params) if params else spark.sql(sql)
    except Exception:
        if swallow_errors:
            return None
        raise


def preview(spark: SparkSession, table: str, limit: int = 10) -> DataFrame:
    """A16: SELECT * FROM t LIMIT n (`application.py:229-252`)."""
    return spark.table(table).limit(limit)


def count_rows(spark: SparkSession, table: str) -> int:
    """A17: COUNT(*)."""
    return spark.table(table).count()
