"""Scale patterns: skew salting, bucketed co-located joins, partitioned
writes.

These are the techniques that keep the engine's plans viable at 100 TB
where AQE alone isn't enough. Each helper is a plain DataFrame
transform; tests assert the resulting PLAN SHAPE (no exchange on the
bucketed join, salt fan-out on the skewed side), not just results.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def salted_join(
    skewed: DataFrame,
    dim: DataFrame,
    key: str,
    dim_key: str | None = None,
    salt_buckets: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-tolerant equi-join: salt the skewed side's key, replicate
    the other side once per salt bucket.

    A hot key that would concentrate on one reducer is spread across
    ``salt_buckets`` partitions; the dim side is exploded ×buckets
    (cheap when the dim is small — for dim-side skew use AQE's skew
    join instead). Result is identical to the plain join.
    """
    dim_key = dim_key or key
    salted_fact = skewed.withColumn(
        "__salt", (F.rand(seed=7) * salt_buckets).cast("int")
    )
    replicated_dim = dim.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1)))
    )
    cond = (salted_fact[key] == replicated_dim[dim_key]) & (
        salted_fact["__salt"] == replicated_dim["__salt"]
    )
    return salted_fact.join(replicated_dim, cond, how).drop("__salt")


def skew_report(df: DataFrame, key_cols: list[str], top_n: int = 10) -> dict:
    """Pre-flight skew diagnostic for a join/agg key: per-key counts of
    the ``top_n`` hottest keys, the skew factor (hottest key count /
    mean per-key count), and the salt-bucket count that would level the
    hottest key to roughly the mean (what ``salted_join`` needs).

    One hash-aggregate + one tiny top-n sort over the aggregated
    relation — safe to run on the full fact table before choosing a
    join strategy; nothing row-level ever reaches the driver."""
    counts = df.groupBy(*key_cols).agg(F.count(F.lit(1)).alias("n"))
    stats = counts.agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.sum("n").alias("n_rows"),
        F.max("n").alias("max_n"),
    ).collect()[0]
    n_keys = int(stats["n_keys"] or 0)
    if n_keys == 0:
        return {"n_keys": 0, "n_rows": 0, "skew_factor": 0.0, "top": [],
                "suggested_salt_buckets": 1}
    n_rows, max_n = int(stats["n_rows"]), int(stats["max_n"])
    mean = n_rows / n_keys
    top = [
        (tuple(r[c] for c in key_cols), int(r["n"]))
        for r in counts.orderBy(F.desc("n"), *key_cols).limit(top_n).collect()
    ]
    return {
        "n_keys": n_keys,
        "n_rows": n_rows,
        "skew_factor": round(max_n / mean, 2),
        "top": top,
        # buckets that level the hottest key's partition to ~mean size;
        # ceil, not round: banker's rounding at N.5x would under-salt,
        # and over-salting is harmless
        "suggested_salt_buckets": max(1, math.ceil(max_n / mean)),
    }


def write_bucketed_table(
    df: DataFrame,
    table: str,
    bucket_key: str,
    n_buckets: int = 8,
    sort_key: str | None = None,
) -> None:
    """Persist hash-bucketed (and optionally sorted) — joins and
    aggregations on ``bucket_key`` between co-bucketed tables run
    WITHOUT a shuffle (Exchange elided by the planner). This is the
    batch analogue of co-partitioned storage and the single biggest
    shuffle saver for repeated fact-fact joins at scale."""
    writer = df.write.mode("overwrite").bucketBy(n_buckets, bucket_key)
    if sort_key:
        writer = writer.sortBy(sort_key)
    writer.saveAsTable(table)


def repartitioned_write(
    df: DataFrame, path: str, partition_col: str, target_files_per_partition: int = 1
) -> None:
    """Partition-pruned layout: directory-partition by a low-cardinality
    column, with a repartition to bound small files. Readers filtering
    on ``partition_col`` scan only matching directories."""
    (
        df.repartition(target_files_per_partition, F.col(partition_col))
        .write.mode("overwrite")
        .partitionBy(partition_col)
        .parquet(path)
    )


def broadcast_threshold_bytes(spark) -> int:
    """``spark.sql.autoBroadcastJoinThreshold`` as plain bytes (-1 =
    broadcasting disabled). The conf value may carry a binary-size
    suffix (``10MB``, ``512k``, ``10485760b``); the index
    compaction-pressure policies compare their delta-size estimates
    against this budget, so the parse must accept every form Spark
    does."""
    raw = str(spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")).strip().lower()
    mult = 1
    for suffix, m in (("kb", 1 << 10), ("mb", 1 << 20), ("gb", 1 << 30),
                      ("tb", 1 << 40), ("pb", 1 << 50),
                      ("k", 1 << 10), ("m", 1 << 20), ("g", 1 << 30),
                      ("t", 1 << 40), ("p", 1 << 50), ("b", 1)):
        if raw.endswith(suffix):
            raw = raw[: -len(suffix)]
            mult = m
            break
    try:
        return int(raw) * mult
    except ValueError:
        # An unparseable operator-set value must not crash the pressure
        # probes; fall back to Spark's 10 MiB default budget.
        return 10 * (1 << 20)


def explain_string(df: DataFrame, mode: str = "simple") -> str:
    """The physical plan as text (for plan-shape assertions/audits)."""
    jmode = df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(mode)
    return df._jdf.queryExecution().explainString(jmode)


def count_exchanges(df: DataFrame) -> int:
    """Number of shuffle exchanges in the physical plan."""
    return explain_string(df).count("Exchange hashpartitioning")


def count_warm_exchanges(df: DataFrame) -> int:
    """Shuffle exchanges a STEADY-STATE run executes: like
    ``count_exchanges`` but excluding everything under an
    ``InMemoryTableScan`` — the one-time build lineage of
    session-persisted indexes, which explain prints but a warm run
    never re-executes.

    Walks the JVM physical-plan tree instead of parsing explain text:
    once any cached subtree has materialized, nested AQE sub-plans
    print ``== Final Plan ==`` blocks whose indentation RESETS, which
    defeats any indentation-based text parse (measured: a 176-vs-8
    overcount on a cache-heavy plan). Tree rules: descend through AQE
    wrappers (``executedPlan``) and query stages (``plan``), stop at
    ``InMemoryTableScanExec``, skip ``ReusedExchangeExec`` (reuse reads
    an existing shuffle, it doesn't re-execute one), count
    ``ShuffleExchangeExec`` with hash partitioning."""

    def walk(node) -> int:
        name = node.getClass().getSimpleName()
        if name.startswith("InMemoryTableScan"):
            return 0
        if name.startswith("ReusedExchange"):
            return 0
        n = 0
        if name.startswith("ShuffleExchange") and str(
            node.outputPartitioning().toString()
        ).startswith("hashpartitioning"):
            n = 1
        if name.startswith("AdaptiveSparkPlan"):
            return n + walk(node.executedPlan())
        if name.endswith("QueryStageExec"):
            return n + walk(node.plan())
        ch = node.children()
        for i in range(ch.size()):
            n += walk(ch.apply(i))
        return n

    return walk(df._jdf.queryExecution().executedPlan())


def union_loop_audit(df: DataFrame) -> list[dict]:
    """Audit of every recursive-CTE loop (``UnionLoopExec``) in the
    plan — the node the exchange walkers are otherwise BLIND inside
    (r11 verdict: PLANS.md showed rcte members as 0 shuffles / 0
    scans). The per-iteration physical plan is AQE-planned at runtime
    against the materialized previous frontier (``UnionLoopRef`` has no
    standalone physical strategy — planning it throws), so the honest
    static audit is the recursion's LOGICAL plan after the same cache
    substitution runtime planning applies: joins, relation scans,
    window operators, and cached-relation hits PER ITERATION, plus the
    anchor's scans. A recursion that re-scans or re-windows a fact
    table per iteration pays that cost × depth — exactly what this
    audit exists to surface: it caught ``rcte_order_chain`` re-deriving
    the rank window twice per level and ``rcte_reachability``
    re-building its edge union (6 scans/level) before both moved their
    loop-invariant relations into the session cache (r12)."""
    spark = df.sparkSession
    cachemgr = spark._jsparkSession.sharedState().cacheManager()

    def logical_counts(plan) -> dict:
        # the runtime per-iteration Dataset goes through withCachedData,
        # so apply the same cache substitution the executor will see —
        # a session-persisted loop-invariant relation (seq/edges) then
        # counts as an InMemoryRelation hit, not a re-scan
        plan = cachemgr.useCachedData(plan)
        counts = {"joins": 0, "scans": 0, "windows": 0, "cached": 0}

        def lwalk(node) -> None:
            nm = node.getClass().getSimpleName()
            if nm.startswith("InMemoryRelation") or nm == "LogicalRDD":
                # cached subtree / checkpointed leaf: loop-invariant
                # input whose build lineage never re-runs per iteration
                counts["cached"] += 1
                return
            if nm == "Join":
                counts["joins"] += 1
            elif nm == "Window":
                counts["windows"] += 1
            elif nm in ("LogicalRelation", "HiveTableRelation") or nm.startswith(
                "DataSourceV2"
            ):
                counts["scans"] += 1
            ch = node.children()
            for i in range(ch.size()):
                lwalk(ch.apply(i))

        lwalk(plan)
        return counts

    out: list[dict] = []

    def walk(node) -> None:
        nm = node.getClass().getSimpleName()
        if nm.startswith("UnionLoopExec"):
            rec = logical_counts(node.recursion())
            anc = logical_counts(node.anchor())
            out.append(
                {
                    "iter_joins": rec["joins"],
                    "iter_scans": rec["scans"],
                    "iter_windows": rec["windows"],
                    "iter_cached": rec["cached"],
                    "anchor_scans": anc["scans"],
                }
            )
        if nm.startswith("AdaptiveSparkPlan"):
            walk(node.executedPlan())
            return
        if nm.endswith("QueryStageExec"):
            walk(node.plan())
            return
        ch = node.children()
        for i in range(ch.size()):
            walk(ch.apply(i))

    walk(df._jdf.queryExecution().executedPlan())
    return out


def compact_parquet_dir(
    spark: SparkSession,
    path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    sort_within_by: list[str] | None = None,
) -> int:
    """Small-file compaction — the maintenance op every long-running
    ingestion pipeline needs: streaming/incremental writers leave
    thousands of KB-sized files whose per-file open/footer cost
    eventually dominates scan time.

    Sizes the output from the INPUT's actual bytes (sum of file sizes /
    target), so compaction stays one job with no driver-side listing of
    row counts. The rewrite goes through a temp sibling directory and a
    rename so a failed job never destroys the input. Optional
    ``sort_within_by`` applies a per-file sortWithinPartitions (better
    min/max pruning on the compacted files, no global shuffle beyond
    the repartition itself). Returns the output file count."""
    import shutil
    from pathlib import Path as _P

    src = _P(path)
    total_bytes = sum(f.stat().st_size for f in src.rglob("*.parquet"))
    n_files = max(1, -(-total_bytes // target_file_bytes))  # ceil
    df = spark.read.parquet(path)
    out = df.repartition(n_files)
    if sort_within_by:
        out = out.sortWithinPartitions(*sort_within_by)
    tmp = src.with_name(src.name + "._compacting")
    out.write.mode("overwrite").parquet(str(tmp))
    shutil.rmtree(src)
    tmp.rename(src)
    return len(list(src.rglob("*.parquet")))
