"""Similarity search over the ``embeddings`` table (array<float> column).

Brute-force cosine top-k as the correctness baseline, plus an
LSH-bucketed variant (random-hyperplane signs) as the scale path.

All vector math uses built-in higher-order functions (``zip_with`` +
``aggregate``) — JVM-side, no Python in the hot loop. Elements are cast
to double *before* multiplying and the fold is sequential left-to-right,
so the DuckDB oracle (``list_reduce`` over the same products) produces
bit-identical doubles; results are rounded to 6 dp as the query
contract.

Scale notes (100 TB): the query set is broadcast (small side); the
candidate side streams. Brute force is O(n_q × n_c) dot products —
fine for re-ranking; the LSH variant prunes candidates by bucket before
any dot product, which is the strategy that survives 1000× growth
(bucket join ≡ shuffle on signature, no cross join).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from generic_data_ingestor_framework_spark.relational import load_table

N_QUERY = 5   # vec_id < 5 are the query vectors
TOP_K = 3
N_PLANES = 4  # LSH hyperplanes → 16 buckets


def _as_double(col):
    return F.transform(col, lambda x: x.cast("double"))


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a):
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


def _vectors(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    return e.select("vec_id", _as_double(F.col("embedding")).alias("v"), "label")


def ann_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-k: 5 query vectors vs the rest.

    The query side is broadcast; ranking is a per-query window on the
    rounded similarity (round-then-rank keeps the order deterministic
    across engines)."""
    from pyspark.sql import Window as W

    vecs = _vectors(spark, sf_dir)
    q = vecs.filter(F.col("vec_id") < N_QUERY).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
    )
    c = vecs.filter(F.col("vec_id") >= N_QUERY).select(
        F.col("vec_id").alias("neighbor_id"), F.col("v").alias("cv")
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .withColumn(
            "cos_sim",
            F.round(_dot(F.col("qv"), F.col("cv")) / (_norm(F.col("qv")) * _norm(F.col("cv"))), 6),
        )
        .select("query_id", "neighbor_id", "cos_sim")
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cos_sim"), "neighbor_id")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select("query_id", "neighbor_id", "cos_sim", "rank")
    )


def embed_norms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-vector L2 norm and dimensionality (vector hygiene check)."""
    vecs = _vectors(spark, sf_dir)
    return vecs.select(
        "vec_id",
        F.size(F.col("v")).alias("dim"),
        F.round(_norm(F.col("v")), 6).alias("l2_norm"),
        "label",
    )


def ann_lsh_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Random-hyperplane LSH bucketing: sign pattern of N_PLANES
    deterministic pseudo-random hyperplanes → 16-way bucket id.

    Planes are generated arithmetically (plane p, dim i →
    ((7·p + 11·i) mod 13) − 6) so the oracle reproduces them exactly.
    Returns bucket occupancy — the pruning structure a scale-out ANN
    join builds its shuffle on."""
    vecs = _vectors(spark, sf_dir)

    def _plane_weight(p: int):
        # NOTE: must be a 1-arg lambda — PySpark treats 2-arg HOF lambdas
        # as (element, index), so closures must bind `p` outside.
        return lambda i: ((F.lit(7 * p) + F.lit(11) * i) % 13 - 6).cast("double")

    sign_bits = []
    for p in range(N_PLANES):
        weights = F.transform(
            F.sequence(F.lit(0), F.size(F.col("v")) - 1), _plane_weight(p)
        )
        proj = F.aggregate(
            F.zip_with(F.col("v"), weights, lambda x, w: x * w),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        sign_bits.append(F.when(proj > 0, F.lit(2 ** p)).otherwise(F.lit(0)))
    bucket = sign_bits[0]
    for sb in sign_bits[1:]:
        bucket = bucket + sb
    return (
        vecs.withColumn("bucket", bucket.cast("int"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n_vectors"), F.min("vec_id").alias("min_vec_id"))
        .orderBy("bucket")
    )


N_CENTROIDS = 8
SEED_LO, SEED_HI = N_QUERY, N_QUERY + N_CENTROIDS  # vec_ids [5, 13) are IVF seeds


def label_centroid_dims(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label centroid, one row per (label, dim): posexplode →
    hash-aggregate — the distributed element-wise mean that a k-means
    iteration or class-prototype computation uses."""
    vecs = _vectors(spark, sf_dir)
    return (
        vecs.select("label", F.posexplode("v").alias("pos", "x"))
        .groupBy("label", "pos")
        .agg(F.round(F.avg("x"), 6).alias("mean_x"))
    )


def ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-style ANN: assign every candidate to its nearest seed
    centroid (coarse quantizer), probe only the query's cell.

    The scale path: candidate pruning happens via an equi-join on
    ``centroid_id`` (a shuffle on a small key), so the expensive dot
    products run over one cell instead of the whole corpus. Seeds here
    are a deterministic slice of the data (vec_ids 5..12); production
    would broadcast trained centroids the same way."""
    from pyspark.sql import Window as W

    vecs = _vectors(spark, sf_dir)
    seeds = vecs.filter((F.col("vec_id") >= SEED_LO) & (F.col("vec_id") < SEED_HI)).select(
        F.col("vec_id").alias("centroid_id"), F.col("v").alias("cv")
    )
    others = vecs.filter(F.col("vec_id") >= SEED_HI).select(
        F.col("vec_id").alias("point_id"), F.col("v").alias("pv")
    )
    qs = vecs.filter(F.col("vec_id") < N_QUERY).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
    )

    def nearest_centroid(df, vec_col, id_col):
        scored = df.crossJoin(F.broadcast(seeds)).withColumn(
            "sim",
            F.round(_dot(F.col(vec_col), F.col("cv")) / (_norm(F.col(vec_col)) * _norm(F.col("cv"))), 6),
        )
        w = W.partitionBy(id_col).orderBy(F.desc("sim"), "centroid_id")
        return (
            scored.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select(id_col, vec_col, F.col("centroid_id").alias("cell"))
        )

    assigned = nearest_centroid(others, "pv", "point_id")
    probed = nearest_centroid(qs, "qv", "query_id")
    w2 = W.partitionBy("query_id").orderBy(F.desc("cos_sim"), "point_id")
    return (
        probed.join(assigned, "cell")
        .withColumn(
            "cos_sim",
            F.round(_dot(F.col("qv"), F.col("pv")) / (_norm(F.col("qv")) * _norm(F.col("pv"))), 6),
        )
        .withColumn("rank", F.row_number().over(w2))
        .filter(F.col("rank") <= TOP_K)
        .select("query_id", F.col("cell").alias("probe_centroid"), F.col("point_id").alias("neighbor_id"), "cos_sim", "rank")
    )


QUERIES = {
    "ann_cosine_topk": ann_cosine_topk,
    "embed_norms": embed_norms,
    "ann_lsh_bucketed": ann_lsh_bucketed,
    "label_centroid_dims": label_centroid_dims,
    "ann_ivf_topk": ann_ivf_topk,
}

_DOT = """list_reduce(list_transform(range(1, len({a}) + 1),
            i -> {a}[i] * {b}[i]), (acc, x) -> acc + x)"""

_NORM = """sqrt(list_reduce(list_transform(range(1, len({a}) + 1),
            i -> {a}[i] * {a}[i]), (acc, x) -> acc + x))"""

ORACLES = {
    "ann_cosine_topk": f"""
        WITH vecs AS (
          SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
        ),
        scored AS (
          SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                 round({_DOT.format(a='q.v', b='c.v')}
                       / ({_NORM.format(a='q.v')} * {_NORM.format(a='c.v')}), 6) AS cos_sim
          FROM vecs q, vecs c
          WHERE q.vec_id < {N_QUERY} AND c.vec_id >= {N_QUERY}
        )
        SELECT query_id, neighbor_id, cos_sim, rank FROM (
          SELECT query_id, neighbor_id, cos_sim,
                 row_number() OVER (PARTITION BY query_id
                                    ORDER BY cos_sim DESC, neighbor_id) AS rank
          FROM scored)
        WHERE rank <= {TOP_K}
    """,
    "embed_norms": f"""
        SELECT vec_id,
               CAST(len(embedding) AS INT) AS dim,
               round({_NORM.format(a='(embedding::DOUBLE[])')}, 6) AS l2_norm,
               label
        FROM embeddings
    """,
    "label_centroid_dims": """
        WITH e AS (SELECT label, embedding::DOUBLE[] AS v FROM embeddings),
        idx AS (SELECT label, v, unnest(range(1, len(v) + 1)) AS i FROM e)
        SELECT label, CAST(i - 1 AS INT) AS pos, round(avg(v[i]), 6) AS mean_x
        FROM idx GROUP BY label, i
    """,
    "ann_ivf_topk": f"""
        WITH vecs AS (
          SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
        ),
        seeds AS (
          SELECT vec_id AS centroid_id, v AS cv FROM vecs
          WHERE vec_id >= {SEED_LO} AND vec_id < {SEED_HI}
        ),
        assigned AS (
          SELECT point_id, pv, cell FROM (
            SELECT o.vec_id AS point_id, o.v AS pv, s.centroid_id AS cell,
                   row_number() OVER (
                     PARTITION BY o.vec_id
                     ORDER BY round({_DOT.format(a='o.v', b='s.cv')}
                        / ({_NORM.format(a='o.v')} * {_NORM.format(a='s.cv')}), 6) DESC,
                        s.centroid_id) AS rn
            FROM vecs o, seeds s WHERE o.vec_id >= {SEED_HI})
          WHERE rn = 1
        ),
        probed AS (
          SELECT query_id, qv, cell FROM (
            SELECT q.vec_id AS query_id, q.v AS qv, s.centroid_id AS cell,
                   row_number() OVER (
                     PARTITION BY q.vec_id
                     ORDER BY round({_DOT.format(a='q.v', b='s.cv')}
                        / ({_NORM.format(a='q.v')} * {_NORM.format(a='s.cv')}), 6) DESC,
                        s.centroid_id) AS rn
            FROM vecs q, seeds s WHERE q.vec_id < {N_QUERY})
          WHERE rn = 1
        )
        SELECT query_id, probe_centroid, neighbor_id, cos_sim, rank FROM (
          SELECT p.query_id, p.cell AS probe_centroid, a.point_id AS neighbor_id,
                 round({_DOT.format(a='p.qv', b='a.pv')}
                   / ({_NORM.format(a='p.qv')} * {_NORM.format(a='a.pv')}), 6) AS cos_sim,
                 row_number() OVER (
                   PARTITION BY p.query_id
                   ORDER BY round({_DOT.format(a='p.qv', b='a.pv')}
                     / ({_NORM.format(a='p.qv')} * {_NORM.format(a='a.pv')}), 6) DESC,
                     a.point_id) AS rank
          FROM probed p JOIN assigned a ON p.cell = a.cell)
        WHERE rank <= {TOP_K}
    """,
    "ann_lsh_bucketed": f"""
        WITH vecs AS (
          SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
        ),
        bucketed AS (
          SELECT vec_id,
            {" + ".join(
              f'''(CASE WHEN list_reduce(list_transform(range(1, len(v) + 1),
                    i -> v[i] * CAST((7 * {p} + 11 * (i - 1)) % 13 - 6 AS DOUBLE)),
                    (acc, x) -> acc + x) > 0 THEN {2 ** p} ELSE 0 END)'''
              for p in range(N_PLANES))} AS bucket
          FROM vecs
        )
        SELECT CAST(bucket AS INT) AS bucket, count(*) AS n_vectors,
               min(vec_id) AS min_vec_id
        FROM bucketed GROUP BY bucket ORDER BY bucket
    """,
}
