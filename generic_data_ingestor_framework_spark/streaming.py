"""Structured Streaming ingest + event-time windowing.

The reference polls a directory and batch-ingests it
(`src/core/application.py:36-153`); the idiomatic Spark replacement is
the file streaming source with ``Trigger.AvailableNow`` — incremental
listing, exactly-once sink commit, and the same code path keeps working
as a continuous stream. This module provides:

- batch event-time operators (tumbling / sliding / session windows,
  watermark-style dedup) over ``events`` — semantics identical to their
  streaming forms and oracle-checkable;
- ``stream_tumbling_counts``: a REAL streaming execution (readStream →
  window agg → memory sink, availableNow) whose final table must match
  the same DuckDB oracle as the batch form — proving batch/stream
  equivalence;
- reusable ``stream_ingest_json`` used by the ingestion tests.

Scale notes (100 TB): file-source streaming scales by listing
incrementally (maxFilesPerTrigger) instead of materializing the full
file index; windowed aggregation state is bounded by the watermark and
partitioned by group key, so state never concentrates on one executor.
Session windows use ``session_window`` (native state merge) rather than
a per-key collect.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from generic_data_ingestor_framework_spark.relational import load_table

EVENTS_RAW_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.LongType()),  # parquet TIMESTAMP(NANOS) read as long
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "events")


# ---------------------------------------------------------------------------
# Batch event-time windows (streaming-equivalent semantics)
# ---------------------------------------------------------------------------

def window_tumbling_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1h event-time window: counts + value sum per bucket."""
    return (
        _events(spark, sf_dir)
        .groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("sum_value"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "n",
            "sum_value",
        )
    )


def window_sliding_1h_30m(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding 1h window, 30m slide (each event lands in 2 windows)."""
    return (
        _events(spark, sf_dir)
        .groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").alias("window_start"), "n")
    )


def session_window_10m(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user session windows with a 10-minute inactivity gap
    (native ``session_window`` — distributed state merge, no collect)."""
    return (
        _events(spark, sf_dir)
        .groupBy("user_id", F.session_window("ts", "10 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
        )
    )


def events_dedup_earliest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermark-dedup analogue in batch: first event per
    (user_id, event_type), the deterministic form of
    ``dropDuplicatesWithinWatermark``."""
    from pyspark.sql import Window as W

    w = W.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    return (
        _events(spark, sf_dir)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "event_type", "event_id", "ts")
    )


# ---------------------------------------------------------------------------
# Real streaming execution (availableNow → memory sink)
# ---------------------------------------------------------------------------

def read_events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source stream over the events parquet (nanos ts → micros)."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    # the file stream source wants a directory; glob-filter to the table
    raw = (
        spark.readStream.schema(EVENTS_RAW_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    return raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))


def stream_tumbling_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling-window counts computed by an actual Structured
    Streaming job (watermark + availableNow + memory sink); the final
    table must equal the batch/oracle result — batch/stream parity."""
    events = read_events_stream(spark, sf_dir)
    agg = (
        events.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    sink = "stream_tumbling_counts_sink"
    q = (
        agg.writeStream.format("memory")
        .queryName(sink)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.table(sink).select(
        F.col("w.start").alias("window_start"), "n"
    )


def stream_stateful_user_counts(
    spark: SparkSession, sf_dir: str, timeout_ms: int = 0
):
    """Custom stateful streaming operator via ``applyInPandasWithState``:
    a per-user running event counter with explicit state management —
    the extension point for operators Spark's built-ins can't express
    (custom sessionization, CEP-ish patterns, online aggregates).

    State is partitioned by user_id and lives in the state store, so
    memory scales with #keys per executor, not stream length. Returns
    the started query's final memory-sink table (availableNow).
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    events = read_events_stream(spark, sf_dir)

    out_schema = T.StructType(
        [
            T.StructField("user_id", T.LongType()),
            T.StructField("n_events", T.LongType()),
            T.StructField("total_value", T.DoubleType()),
        ]
    )
    state_schema = T.StructType(
        [
            T.StructField("n", T.LongType()),
            T.StructField("total", T.DoubleType()),
        ]
    )

    def update(key, pdfs, state: GroupState):
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].sum())
        state.update((n, total))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "total_value": [round(total, 2)]}
        )

    sink = "stream_stateful_user_counts_sink"
    # streaming state partitioning is fixed by shuffle.partitions at the
    # first checkpoint and AQE never coalesces it — bound it explicitly
    # so a driver-default session (200) doesn't run 200 state tasks for
    # a handful of keys
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set(
        "spark.sql.shuffle.partitions", str(spark.sparkContext.defaultParallelism)
    )
    try:
        q = (
            events.groupBy("user_id")
            .applyInPandasWithState(
                update, out_schema, state_schema, "update", GroupStateTimeout.NoTimeout
            )
            .writeStream.format("memory")
            .queryName(sink)
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    # with `update` mode the sink holds one row per state update; the
    # LAST row per user is the final counter
    from pyspark.sql import Window as W

    t = spark.table(sink)
    w = W.partitionBy("user_id").orderBy(F.desc("n_events"))
    return (
        t.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "n_events", "total_value")
    )


def stream_ingest_json(
    spark: SparkSession,
    src_dir: str,
    dst_dir: str,
    checkpoint_dir: str,
    schema: T.StructType,
) -> None:
    """Directory-ingest as a stream: the Spark-native replacement for
    the reference's scan→parse→insert loop. AvailableNow drains the
    directory once; leaving the query running makes it continuous."""
    q = (
        spark.readStream.schema(schema)
        .option("multiLine", "false")
        .json(src_dir)
        .withColumn(
            "_source_file", F.element_at(F.split(F.input_file_name(), "/"), -1)
        )
        .writeStream.format("parquet")
        .option("path", dst_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)


QUERIES = {
    "window_tumbling_hourly": window_tumbling_hourly,
    "window_sliding_1h_30m": window_sliding_1h_30m,
    "session_window_10m": session_window_10m,
    "events_dedup_earliest": events_dedup_earliest,
    "stream_tumbling_counts": stream_tumbling_counts,
}

ORACLES = {
    "window_tumbling_hourly": """
        SELECT CAST(time_bucket(INTERVAL 1 HOUR, ts) AS TIMESTAMP) AS window_start,
               CAST(time_bucket(INTERVAL 1 HOUR, ts) + INTERVAL 1 HOUR AS TIMESTAMP) AS window_end,
               count(*) AS n,
               round(sum(value), 2) AS sum_value
        FROM events GROUP BY 1, 2
    """,
    "window_sliding_1h_30m": """
        WITH b AS (
          SELECT CAST(time_bucket(INTERVAL 30 MINUTE, ts) - k * INTERVAL 30 MINUTE AS TIMESTAMP) AS window_start
          FROM events, (VALUES (0), (1)) t(k)
        )
        SELECT window_start, count(*) AS n FROM b GROUP BY window_start
    """,
    "session_window_10m": """
        WITH marked AS (
          SELECT user_id, ts,
                 CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                        OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts) >= INTERVAL 10 MINUTE
                      THEN 1 ELSE 0 END AS new_s
          FROM events
        ),
        numbered AS (
          SELECT user_id, ts,
                 sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
                                  ROWS UNBOUNDED PRECEDING) AS sid
          FROM marked
        )
        SELECT user_id,
               min(ts) AS session_start,
               max(ts) + INTERVAL 10 MINUTE AS session_end,
               count(*) AS n_events
        FROM numbered GROUP BY user_id, sid
    """,
    "events_dedup_earliest": """
        SELECT user_id, event_type, event_id, ts FROM (
          SELECT user_id, event_type, event_id, ts,
                 row_number() OVER (PARTITION BY user_id, event_type
                                    ORDER BY ts, event_id) AS rn
          FROM events) WHERE rn = 1
    """,
    "stream_tumbling_counts": """
        SELECT CAST(time_bucket(INTERVAL 1 HOUR, ts) AS TIMESTAMP) AS window_start,
               count(*) AS n
        FROM events GROUP BY 1
    """,
}
