"""Generate the sf1 scale-proof dataset: a clean decade-up of sf0.1.

Every table is replicated 10× with consistent key remapping
(``key' = key*10 + r`` on BOTH sides of every FK edge), so join
cardinalities and per-group distributions are preserved exactly — a
true decade-up, not a skew-everything blowup. Two deliberate
exceptions inject realism:

- documents: 5% of replicated docs (r>0, portable-hash selected) get a
  fixed hot sentence appended — a corpus-wide hot shingle that makes
  the n-gram dedup DF-cap load-bearing (without the cap, one shingle
  bucket alone yields ~millions of candidate pairs).
- events: replica timestamps are shifted by r microseconds so event
  times stay distinct.

Output: /root/repo/_scale/sf1/*.parquet (gitignored; regenerate any
time with ``python tools/gen_scale.py``).
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from generic_data_ingestor_framework_spark.session import get_spark  # noqa: E402

SRC = "/root/testdata/sf0.1"
DST = "/root/repo/_scale/sf1"
REPLICAS = 10

HOT_SENTENCE = (
    " the quick brown fox jumps over the lazy dog near the riverbank every morning"
)

# key columns to remap per table: new = old * REPLICAS + r
REMAP = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
    "events": ["event_id"],
}
COPY = ["region", "nation"]


def main() -> None:
    spark = get_spark("gen-scale")

    for t in COPY:
        spark.read.parquet(f"{SRC}/{t}.parquet").write.mode("overwrite").parquet(
            f"{DST}/{t}.parquet"
        )
        print(f"copied {t}")

    r_col = F.explode(F.sequence(F.lit(0), F.lit(REPLICAS - 1))).alias("_r")
    for t, keys in REMAP.items():
        df = spark.read.parquet(f"{SRC}/{t}.parquet").select("*", r_col)
        for k in keys:
            df = df.withColumn(k, F.col(k) * REPLICAS + F.col("_r"))
        if t == "documents":
            # hot-shingle skew: 5% of replicated docs share one sentence
            hot = (
                (F.col("_r") > 0)
                & (F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
                   .cast("long") % 20 == 0)
            )
            df = df.withColumn(
                "text", F.when(hot, F.concat(F.col("text"), F.lit(HOT_SENTENCE))).otherwise(F.col("text"))
            )
        if t == "events":
            # keep event times distinct across replicas: shift each
            # replica by r microseconds (interval arithmetic keeps the
            # column's timestamp_ntz type intact)
            df = df.withColumn(
                "ts", F.col("ts") + F.expr("make_dt_interval(0, 0, 0, _r * 1e-6)")
            )
        # write 32 part files: the sf0.1 source is a single part, and a
        # 1-file decade-up would give Spark exactly ONE input split —
        # map-only queries (token_stats & friends) would run on 1 of 32
        # cores and the harness would measure file layout, not the plan.
        # Real corpus-scale tables always arrive in many splits; 32
        # matches local[32] the way thousands of splits match a cluster.
        n = (
            df.drop("_r")
            .repartition(32)
            .write.mode("overwrite")
            .parquet(f"{DST}/{t}.parquet")
        )
        print(f"wrote {t} x{REPLICAS}")

    for t in list(REMAP) + COPY:
        print(t, spark.read.parquet(f"{DST}/{t}.parquet").count())


if __name__ == "__main__":
    main()
