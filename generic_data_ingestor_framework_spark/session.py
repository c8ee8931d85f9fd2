"""SparkSession factory tuned for both local testing and cluster scale.

Scale notes (100 TB target):
- AQE on: runtime partition coalescing, skew-join splitting, and
  dynamic join-strategy switching replace hand-tuned shuffle counts.
- ``spark.sql.shuffle.partitions`` is only the *initial* number under
  AQE; on a real cluster set it ~2-3x total cores and let AQE coalesce.
- Arrow enabled for any pandas interchange (LLM ops use Pandas UDFs).
- UTC session timezone so event-time semantics are reproducible.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(
    app_name: str = "generic_data_ingestor_framework_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Create (or fetch) a SparkSession with engine defaults.

    Parameters mirror what a cluster deployment would override via
    ``spark-submit --conf``; nothing here is local-mode-only except the
    default master.
    """
    cpus = DEFAULT_CPUS
    builder = (
        SparkSession.builder.appName(app_name)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or cpus))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.filterPushdown", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # explicit split/partition sizing: 128 MB input splits and
        # 64 MB post-shuffle targets keep any single partition well
        # inside executor memory at 100 TB (AQE coalesces upward from
        # the advisory size, never above memory-unsafe splits)
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
        .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", str(64 * 1024 * 1024))
        .config("spark.ui.enabled", "false")
        # console progress bars interleave with stdout and corrupt
        # machine-read artifacts (the bench's one-line JSON contract)
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
    )
    if master:
        builder = builder.master(master)
    elif not os.environ.get("SPARK_MASTER"):
        builder = builder.master(f"local[{cpus}]")
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
