"""Deduplication operators over the ``documents`` table.

Six strategies, each a distributed DataFrame plan:

- **exact**: md5-content groupBy (one shuffle on the hash key).
- **MinHash signatures**: word-3-gram shingles → k portable min-hashes.
- **MinHash LSH pairs**: band the signature, bucket-join candidates —
  the scale path: candidate generation is a shuffle on (band, sig),
  never an O(n²) cross join.
- **n-gram Jaccard pairs**: exact set-overlap join on shared shingles
  (inverted-index join — only docs sharing a shingle ever meet).
- **SimHash**: 32-bit sign-aggregated fingerprint per doc.

Portability contract: the shingle hash is the first 8 hex digits of
md5, so Spark and the DuckDB oracle compute bit-identical signatures
(``F.conv(substr(md5, 1, 8), 16, 10)`` ≡ ``CAST('0x' || ... AS
BIGINT)``). In production you'd swap in ``xxhash64`` (JVM-side, no
md5 cost); the plan shape is identical.

Scale notes (100 TB): every stage is explode → hash-partition →
partial-agg; no driver-side state, no collects. Shingle explosion is
the dominant cost — `array_distinct` before explode cuts the shuffle
by the per-doc repeat factor. The exact-Jaccard join frequency-caps
skewed shingles (document frequency > ``DF_CAP``) before the
self-join: a stop-phrase shared by 1% of a 100 TB corpus would make
its join bucket quadratic, and a shingle that common carries no
similarity signal anyway. The document-frequency cap rides the
self-join's own shingle shuffle as a count window, so skew safety
costs no extra round trip. LSH bucket join is bounded by band-bucket
size, not corpus size; cluster assignment closes the loop with
pointer-jumping connected components (log-diameter convergence) and
``dedup_keep_corpus`` materializes the deduplicated corpus.
"""

from __future__ import annotations

import warnings

from pyspark import StorageLevel
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from generic_data_ingestor_framework_spark.relational import load_table

MOD = 1_000_000_007
N_PERM = 8
BANDS = 4  # rows-per-band = 2
DF_CAP = 100  # max document frequency for a shingle to join on


def minhash_coeffs(n_perm: int) -> tuple[list[int], list[int]]:
    """Affine permutation coefficients for ``h_j(x) = (a_j x + b_j) % MOD``.

    ``a_j`` is the j-th prime, ``b_j = 7919 (j+1)`` — MOD is prime so
    any nonzero ``a_j`` is invertible and each map is a true
    permutation of Z_MOD. The first 8 pairs are byte-identical to the
    historical fixed constants, so the default configuration's
    signatures (and every downstream gate checksum) are unchanged; a
    production 100 TB near-dup run wants ``n_perm=128, bands=16`` for
    a sharp S-curve knee (see ``dedup_minhash_sig_wide``).
    """
    primes: list[int] = []
    c = 2
    while len(primes) < n_perm:
        if all(c % p for p in primes if p * p <= c):
            primes.append(c)
        c += 1
    return primes, [7919 * (j + 1) for j in range(n_perm)]


A, B = minhash_coeffs(N_PERM)


def portable_hash32(col):
    """First 8 hex digits of md5 as a bigint — identical in DuckDB."""
    return F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("long")


_HASH_SQL = "CAST(concat('0x', substr(md5({c}), 1, 8)) AS BIGINT)"


def tokens_col(text_col="text"):
    return F.split(F.lower(F.col(text_col)), r"\s+")


# Word-shingle width for the MinHash/band pipeline. Three call sites
# depend on the SAME k for the "no bands ⟺ <k tokens" invariant
# (shingles_from_tokens, bands_per_row's token-count filter, and the
# supersede NULL-band marker rule) — a k changed in one place but not
# the others would silently stop retiring stale bands (r14 ADVICE).
SHINGLE_K = 3


def shingles_from_tokens(tok_col, k: int = SHINGLE_K):
    """Distinct word k-gram shingles from an ALREADY-MATERIALIZED token
    array column. Callers must project the token split into its own
    column first: Catalyst re-inlines aliased expressions into lambda
    bodies, so referencing ``tokens_col()`` directly here would re-run
    the regex split for every gram (measured 15x slowdown)."""
    n = F.size(tok_col)
    grams = F.transform(
        F.sequence(F.lit(0), n - k),
        lambda i: F.array_join(F.slice(tok_col, i + 1, k), " "),
    )
    empty = F.array().cast("array<string>")
    return F.array_distinct(F.when(n >= k, grams).otherwise(empty))


# Shared DuckDB CTE: doc_id → exploded distinct shingles
_SHINGLES_CTE = """
tok AS (
  SELECT doc_id, string_split_regex(lower(text), '\\s+') AS ts FROM documents
),
sh AS (
  SELECT doc_id, unnest(list_distinct(list_transform(
           range(1, greatest(len(ts) - 1, 1)),
           i -> concat_ws(' ', ts[i], ts[i + 1], ts[i + 2])))) AS shingle
  FROM tok
)
"""


# Storage policy for the shared shingle relation. The exploded
# (doc_id, shingle) relation is the SAME order of magnitude as the
# tokenized corpus itself (k overlapping grams per token, deduped
# per-doc) — at 100 TB of text it does NOT fit in cluster storage
# memory. Default keeps local/test behavior (memory with disk
# spillover); a 100 TB run should pass StorageLevel.DISK_ONLY, or
# materialize the relation to parquet once and share it across the
# whole dedup family.
DEFAULT_SHINGLE_STORAGE = StorageLevel.MEMORY_AND_DISK


def _exploded_shingles(
    spark: SparkSession, sf_dir: str, storage: StorageLevel | None = None
) -> DataFrame:
    """doc_id → exploded distinct shingles, persisted ONCE per session
    via the cache registry: every dedup plan branches over this relation
    2-4 times (self-join sides, size table), Spark re-executes
    unpersisted branches, and repeated invocations in a long-lived
    session must reuse one copy rather than leak one per call. Storage
    level per ``DEFAULT_SHINGLE_STORAGE`` (corpus-sized — see note
    above)."""
    from generic_data_ingestor_framework_spark.cachemgr import shared_persist

    def build() -> DataFrame:
        d = load_table(spark, sf_dir, "documents")
        # small single-file inputs arrive as ONE partition; spread the
        # CPU-heavy gram explosion across the cluster before computing
        # it (a big corpus already has enough input splits — repartition
        # of a thin (id, tokens) projection is cheap either way)
        par = spark.sparkContext.defaultParallelism
        toks = d.select("doc_id", tokens_col().alias("toks")).repartition(par)
        return toks.select(
            "doc_id", F.explode(shingles_from_tokens(F.col("toks"))).alias("shingle")
        )

    level = storage or DEFAULT_SHINGLE_STORAGE
    # the storage level is part of the key: an explicit DISK_ONLY
    # request must not silently reuse a MEMORY_AND_DISK relation
    return shared_persist(spark, ("shingles", sf_dir, str(level)), build, level)


# ---------------------------------------------------------------------------
# Exact dedup
# ---------------------------------------------------------------------------

def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact content dedup: hash-groupBy on md5(text), keep min doc_id.

    One shuffle on a 128-bit key; at 100 TB this is the cheapest dedup
    (combine-ahead partial aggregation, no payload movement — only the
    hash and the candidate keeper id shuffle)."""
    d = load_table(spark, sf_dir, "documents")
    return (
        d.select(F.md5(F.col("text")).alias("content_hash"), "doc_id")
        .groupBy("content_hash")
        .agg(F.min("doc_id").alias("keep_id"), F.count(F.lit(1)).alias("n_copies"))
    )


def dedup_exact_by_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Key-based exact dedup (lang, source): keep first doc per group."""
    d = load_table(spark, sf_dir, "documents")
    return (
        d.groupBy("lang", "source")
        .agg(F.min("doc_id").alias("keep_id"), F.count(F.lit(1)).alias("n_in_group"))
    )


# ---------------------------------------------------------------------------
# MinHash signatures + LSH banding
# ---------------------------------------------------------------------------

def _minhash_sig_df(
    spark: SparkSession, sf_dir: str, n_perm: int = N_PERM
) -> DataFrame:
    """Signature relation, persisted once per session AND per width (it
    feeds both sides of the LSH self-join and the cluster/keep-corpus
    pipelines; an explicit wide config must not reuse the default)."""
    from generic_data_ingestor_framework_spark.cachemgr import shared_persist

    a, b = minhash_coeffs(n_perm)

    def build() -> DataFrame:
        sh = _exploded_shingles(spark, sf_dir)
        # hash ONCE per shingle in a projection; the n_perm permutations
        # are cheap affine transforms of that single value
        hashed = sh.select("doc_id", portable_hash32(F.col("shingle")).alias("h"))
        aggs = [
            F.min((F.lit(a[j]) * F.col("h") + F.lit(b[j])) % MOD).alias(f"mh{j}")
            for j in range(n_perm)
        ]
        return hashed.groupBy("doc_id").agg(*aggs)

    return shared_persist(spark, ("minhash_sig", sf_dir, n_perm), build)


def dedup_minhash_sig(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash signature (8 portable permutations) per document."""
    return _minhash_sig_df(spark, sf_dir)


def dedup_minhash_sig_wide(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash signature at a WIDER configuration (16 permutations) —
    the config-sweep witness that ``minhash_coeffs`` generalizes
    beyond the default: oracle-checked exactly against a 16-column
    DuckDB twin generated from the same coefficient family. The build
    plan is identical to the default (one hash per shingle + affine
    transforms inside one hash-aggregate), so width scales the
    aggregate state linearly, never the shuffle count."""
    return _minhash_sig_df(spark, sf_dir, n_perm=16)


def _banded_df(
    spark: SparkSession, sf_dir: str, n_perm: int = N_PERM, bands: int = BANDS
) -> DataFrame:
    """Band-signature relation (doc_id, bucket, band_idx, band_sig),
    persisted once per session and per (n_perm, bands) config: short
    rows per document, shared by the LSH self-join, the incremental
    near-dup index, and PageRank's edge builder — consumers start from
    the materialized bands instead of each re-deriving sig →
    posexplode lineage. ``n_perm`` must divide evenly into ``bands``
    rows-per-band."""
    from generic_data_ingestor_framework_spark.cachemgr import shared_persist

    if n_perm % bands:
        raise ValueError(f"n_perm={n_perm} not divisible by bands={bands}")
    rpb = n_perm // bands

    def build() -> DataFrame:
        sig = _minhash_sig_df(spark, sf_dir, n_perm=n_perm)
        band_cols = F.array(
            *[
                F.concat_ws("_", *[F.col(f"mh{rpb * i + r}") for r in range(rpb)])
                for i in range(bands)
            ]
        )
        return sig.select(
            "doc_id",
            (portable_hash32(F.col("doc_id").cast("string")) % 2).alias("bucket"),
            F.posexplode(band_cols).alias("band_idx", "band_sig"),
        )

    return shared_persist(spark, ("minhash_bands", sf_dir, n_perm, bands), build)


def _lsh_pairs_from(banded: DataFrame) -> DataFrame:
    """Self-join a band relation on (band_idx, band_sig): docs sharing
    any band signature become a candidate pair (doc_a < doc_b).
    Candidate generation scales with bucket sizes, never with the
    number of document pairs."""
    a, b = banded.alias("a"), banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_sig") == F.col("b.band_sig"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )


def dedup_minhash_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH candidate pairs at the default 4 bands × 2 rows config.

    The PAIR RELATION itself is session-persisted (not just the band
    relation feeding it): graph consumers reference it several times
    per plan (PageRank edges, triangle closure x3, the estimator
    audit's estimate/candidate/intersection branches), and an
    unpersisted branch re-executes the band self-join + distinct once
    PER REFERENCE — the round-8 audit measured 45-96 warm exchanges in
    the graph members before this persist, ~5 after."""
    from generic_data_ingestor_framework_spark.cachemgr import shared_persist

    def build() -> DataFrame:
        banded = _banded_df(spark, sf_dir).select("doc_id", "band_idx", "band_sig")
        return _lsh_pairs_from(banded)

    return shared_persist(spark, ("lsh_pairs", sf_dir), build)


def dedup_minhash_lsh_pairs_wide(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH candidate pairs at the WIDE 16-perm / 8-band config (still
    2 rows per band, so the per-band collision curve matches the
    default while halving the miss probability: 1-(1-s²)⁸ vs ⁴).
    Oracle-checked exactly; the production 128/16 shape differs only
    in the two integers passed here."""
    banded = _banded_df(spark, sf_dir, n_perm=16, bands=8).select(
        "doc_id", "band_idx", "band_sig"
    )
    return _lsh_pairs_from(banded)


# ---------------------------------------------------------------------------
# Exact n-gram Jaccard (inverted-index join)
# ---------------------------------------------------------------------------

JACCARD_TAU = 0.2  # similarity threshold for n-gram Jaccard pairs


def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact Jaccard over hashed word-3-gram shingle sets for candidate
    pairs, via an inverted-index join with GROUP-COLLAPSE (Bayardo
    GroupJoin): documents whose capped shingle sets are IDENTICAL have
    identical Jaccard to everything, so each distinct set joins once
    through a representative and the results expand back to document
    pairs afterwards — within-group pairs are emitted directly with
    ``J = 1``. On a duplication-heavy corpus this shrinks the quadratic
    co-occurrence term by (distinct sets / docs)² — measured 50,000
    docs → 6,864 distinct sets at the sf1 decade-up (≈50× fewer pair
    rows) while a low-duplication corpus pays one extra doc-level
    aggregate.

    Shingles are keyed by ``portable_hash32`` (fixed-width join keys
    instead of 3-gram strings — ~35%% faster index probes; the DuckDB
    oracle applies the identical md5-based hash, so the engines agree
    bit-for-bit even on the ~1e-5-probability within-doc collisions,
    which both sides collapse with DISTINCT). Hot shingles (document
    frequency > ``DF_CAP``) are dropped before the join — the key
    class that would otherwise make a bucket quadratic at corpus scale
    — and the join predicate carries the PPJoin length filter
    (``J >= tau`` requires ``tau <= |A|/|B| <= 1/tau``), pruning
    size-incompatible pairs before the aggregate shuffle."""
    from pyspark.sql import Window as W

    from generic_data_ingestor_framework_spark.cachemgr import shared_persist

    tau = JACCARD_TAU

    def build_capped() -> DataFrame:
        raw = _exploded_shingles(spark, sf_dir)
        return (
            raw.select("doc_id", portable_hash32(F.col("shingle")).alias("sh"))
            .distinct()  # collapse within-doc hash collisions (oracle ditto)
            .withColumn("df", F.count(F.lit(1)).over(W.partitionBy("sh")))
            .filter(F.col("df") <= DF_CAP)
            .drop("df")  # nothing downstream reads it — don't persist it
        )

    # the capped hashed relation IS the inverted index: persist it once
    # per session. DF_CAP is part of the key: a different cap is a
    # different index.
    sh = shared_persist(spark, ("shingles_capped", sf_dir, DF_CAP), build_capped)

    # group-collapse: one row per DISTINCT capped shingle set, members
    # sorted so the first is the representative and within-group pairs
    # come out ordered
    def build_groups() -> DataFrame:
        return (
            sh.groupBy("doc_id")
            .agg(F.sort_array(F.collect_list("sh")).alias("s"))
            .groupBy("s")
            .agg(F.sort_array(F.collect_list("doc_id")).alias("members"))
            .select(
                F.col("members")[0].alias("rep_id"),
                "members",
                "s",
                F.size("s").alias("n_sh"),
            )
        )

    groups = shared_persist(spark, ("shingle_groups", sf_dir, DF_CAP), build_groups)

    # rep-level inverted index join: the quadratic term runs over
    # distinct sets only
    rep_idx = groups.select("rep_id", "n_sh", F.explode("s").alias("sh"))
    a, b = rep_idx.alias("a"), rep_idx.alias("b")
    rep_pairs = (
        a.join(
            b,
            (F.col("a.sh") == F.col("b.sh"))
            & (F.col("a.rep_id") < F.col("b.rep_id"))
            & (F.col("b.n_sh") >= F.lit(tau) * F.col("a.n_sh"))
            & (F.col("a.n_sh") >= F.lit(tau) * F.col("b.n_sh")),
        )
        .groupBy(F.col("a.rep_id").alias("ra"), F.col("b.rep_id").alias("rb"))
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    ga = groups.select(
        F.col("rep_id").alias("ra"), F.col("members").alias("ma"), F.col("n_sh").alias("n_a")
    )
    gb = groups.select(
        F.col("rep_id").alias("rb"), F.col("members").alias("mb"), F.col("n_sh").alias("n_b")
    )
    # expansion happens AFTER the tau filter: only qualifying group
    # pairs pay the member cross product
    cross = (
        rep_pairs.join(ga, "ra")
        .join(gb, "rb")
        .withColumn(
            "jaccard",
            F.round(
                F.col("n_inter") / (F.col("n_a") + F.col("n_b") - F.col("n_inter")), 6
            ),
        )
        .filter(F.col("jaccard") >= tau)
        .select(F.explode("ma").alias("doc_x"), "mb", "n_inter", "jaccard")
        .select("doc_x", F.explode("mb").alias("doc_y"), "n_inter", "jaccard")
        .select(
            F.least("doc_x", "doc_y").alias("doc_a"),
            F.greatest("doc_x", "doc_y").alias("doc_b"),
            "n_inter",
            "jaccard",
        )
    )
    # within-group pairs: identical sets, J = 1 by definition
    within = (
        groups.filter(F.size("members") >= 2)
        .select(F.posexplode("members").alias("i", "doc_a"), "members", "n_sh")
        .select(
            "doc_a",
            F.explode(F.slice("members", F.col("i") + 2, F.size("members"))).alias(
                "doc_b"
            ),
            F.col("n_sh").cast("long").alias("n_inter"),
            F.lit(1.0).alias("jaccard"),
        )
        .select("doc_a", "doc_b", "n_inter", "jaccard")
    )
    return cross.unionByName(within)


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """32-bit SimHash per document over distinct tokens.

    bit b of the fingerprint = sign of Σ_tokens (±1 by bit b of the
    token hash); near-duplicate docs land at small Hamming distance.

    The 32 per-bit sums are COLUMNS of one hash-aggregate, not a ×32
    row explosion: one shuffle on doc_id, partial aggregation upstream,
    token-stream row count unchanged (a row-exploded formulation
    measured ~5× slower at sf1)."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id", F.explode(F.array_distinct(tokens_col())).alias("tok")
    ).withColumn("h", portable_hash32(F.col("tok")))
    per_bit = [
        F.sum(F.expr(f"CAST(((h >> {b}) & 1) * 2 - 1 AS BIGINT)")).alias(f"s{b}")
        for b in range(32)
    ]
    per_doc = toks.groupBy("doc_id").agg(*per_bit)
    simhash = F.lit(0).cast("long")
    for b in range(32):
        simhash = simhash + F.when(
            F.col(f"s{b}") > 0, F.lit(1 << b).cast("long")
        ).otherwise(F.lit(0).cast("long"))
    return per_doc.select("doc_id", simhash.alias("simhash"))


def dedup_cluster_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Connected components over the LSH candidate graph: every doc gets
    a cluster id (min doc_id in its component); dedup keeps one doc per
    CLUSTER, not per pair.

    Spark has no recursive CTE, so this is the idiomatic substitute: an
    iterative min-label propagation as a driver-controlled DataFrame
    loop (each iteration fully distributed). Each pass also
    POINTER-JUMPS (cluster_id ← its cluster_id's cluster_id), so
    label paths halve every iteration and convergence is
    O(log diameter) rather than O(diameter) — a chain of 1000
    near-dup docs converges in ~10 passes, not 1000. The DuckDB
    oracle computes the same components with WITH RECURSIVE
    transitive closure.

    Graph collapse (round 5): documents with IDENTICAL MinHash
    signature vectors pair in every band, so they are provably one
    component — the iterations run over one REPRESENTATIVE per distinct
    signature (rep = group min, so the component minimum is preserved)
    and doc-level labels come from one post-hoc join. On a
    duplication-heavy corpus this removes the intra-group cliques from
    the edge list entirely (C(g,2)×bands edges per duplicate group →
    0) and shrinks every per-iteration join to distinct-signature
    cardinality. Results are identical; the oracle is unchanged."""
    from pyspark.sql import Window as W

    from generic_data_ingestor_framework_spark.cachemgr import shared_persist

    # the doc→rep map and the rep-level candidate edges ARE the collapse
    # index: persist both per session so the iterative loop (and
    # dedup_keep_corpus, and repeated invocations) never re-executes the
    # signature window or the band self-join lineage
    def build_rep_map() -> DataFrame:
        sig = _minhash_sig_df(spark, sf_dir)
        sig_cols = [f"mh{j}" for j in range(N_PERM)]
        return sig.select(
            "doc_id",
            *sig_cols,
            F.min("doc_id").over(W.partitionBy(*sig_cols)).alias("rep_id"),
        )

    with_rep = shared_persist(spark, ("sig_rep_map", sf_dir), build_rep_map)

    def build_rep_pairs() -> DataFrame:
        rep_sigs = with_rep.filter(F.col("doc_id") == F.col("rep_id"))
        bands = F.array(
            *[
                F.concat_ws("_", F.col(f"mh{2 * b}"), F.col(f"mh{2 * b + 1}"))
                for b in range(BANDS)
            ]
        )
        banded = rep_sigs.select(
            "rep_id", F.posexplode(bands).alias("band_idx", "band_sig")
        )
        a, b = banded.alias("a"), banded.alias("b")
        return (
            a.join(
                b,
                (F.col("a.band_idx") == F.col("b.band_idx"))
                & (F.col("a.band_sig") == F.col("b.band_sig"))
                & (F.col("a.rep_id") < F.col("b.rep_id")),
            )
            .select(F.col("a.rep_id").alias("doc_a"), F.col("b.rep_id").alias("doc_b"))
            .distinct()
        )

    rep_pairs = shared_persist(spark, ("rep_pairs", sf_dir), build_rep_pairs)
    # the component labels themselves are an index: every consumer
    # (keep_corpus, keep-best-quality resolution, repeated assigns)
    # reuses ONE run of the iterative loop per session instead of
    # re-executing all propagation iterations per call
    rep_labels = shared_persist(
        spark,
        ("rep_labels", sf_dir),
        lambda: connected_components(
            with_rep.filter(F.col("doc_id") == F.col("rep_id")).select(
                F.col("rep_id").alias("doc_id")
            ),
            rep_pairs,
            "doc_a",
            "doc_b",
        ),
    )
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    labels = (
        docs.join(with_rep.select("doc_id", "rep_id"), "doc_id", "left")
        .join(
            rep_labels.select(
                F.col("doc_id").alias("rep_id"), F.col("cluster_id").alias("rep_cluster")
            ),
            "rep_id",
            "left",
        )
        # docs with no signature (no shingles) are singleton components
        .select(
            "doc_id", F.coalesce("rep_cluster", "doc_id").alias("cluster_id")
        )
    )
    return labels.withColumn("is_keeper", F.col("doc_id") == F.col("cluster_id"))


def dedup_keep_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The dedup loop closed end-to-end: LSH candidates → connected
    components → keep one doc per cluster → the deduplicated corpus
    (what actually ships to training). Keeper join is a semi join on
    the label relation, so document payloads move once."""
    keepers = dedup_cluster_assign(spark, sf_dir).filter(F.col("is_keeper")).select("doc_id")
    d = load_table(spark, sf_dir, "documents")
    return d.join(keepers, "doc_id", "semi").select("doc_id", "lang", "source", "n_chars")


def dedup_against_corpus(
    new_docs: DataFrame,
    corpus_hashes: DataFrame,
    text_col: str = "text",
    hash_col: str = "content_hash",
) -> DataFrame:
    """Incremental (cross-run) dedup: drop new documents whose content
    hash already exists in the accumulated corpus — the every-crawl
    step of a training pipeline that never re-admits seen content.

    Shape: hash the new batch (narrow projection), ONE anti join
    against the corpus hash set. The corpus side carries only its
    128-bit hashes, so even a trillion-document history is a compact
    join relation; with the corpus bucketed on the hash the join is
    shuffle-free on the history side. Also de-dups WITHIN the batch
    (keep min id per hash) so the admitted set is hash-unique."""
    from pyspark.sql import Window as W

    hashed = new_docs.withColumn("__h", F.md5(F.col(text_col)))
    w = W.partitionBy("__h").orderBy(*[F.col(c) for c in new_docs.columns[:1]])
    return (
        hashed.join(
            corpus_hashes.select(F.col(hash_col).alias("__h")), "__h", "anti"
        )
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__h", "__rn")
    )


def dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Oracle-checked wrapper of ``dedup_against_corpus``: the corpus
    history is one hash half of ``documents`` (its md5 set), the new
    batch is the other half; returns the admitted (never-seen,
    batch-unique) documents — the every-crawl incremental dedup step."""
    d = load_table(spark, sf_dir, "documents")
    bucket = portable_hash32(F.col("doc_id").cast("string")) % 2
    corpus = d.filter(bucket == 0).select(F.md5("text").alias("content_hash"))
    batch = d.filter(bucket == 1).select("doc_id", "lang", "text")
    return dedup_against_corpus(batch, corpus).select("doc_id", "lang")


def bands_per_row(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """``(id, band_key)`` MinHash band signatures computed PER ROW —
    ``array_min`` over the shingle array applies the same affine
    permutations to the same 32-bit shingle hash as the
    ``_minhash_sig_df`` AGGREGATE, so signatures are identical (the
    min over a set equals the min over its exploded rows). Because no
    aggregate is involved, this projection works on static frames AND
    unbounded streams; docs too short to carry a shingle produce no
    rows (matching the aggregate, which has no group for them).
    ``band_key`` = ``{band_idx}:{band_sig}`` — one join/state column."""
    a, b = minhash_coeffs(N_PERM)
    rpb = N_PERM // BANDS
    # Filter on the TOKEN count, not the shingle array: size(__sh) > 0
    # ⟺ size(__toks) >= k (k or more tokens produce >= 1 gram, and
    # array_distinct of a non-empty array is non-empty). Filtering on
    # the derived __sh column let predicate pushdown re-inline the
    # WHOLE shingle expression below the projection — with the regex
    # split re-run PER GRAM inside the lambda (measured: the pushed
    # filter alone cost ~8x the rest of the pipeline at sf0.1).
    staged = (
        df.select(F.col(id_col), tokens_col(text_col).alias("__toks"))
        .filter(F.size(F.col("__toks")) >= SHINGLE_K)
        .withColumn("__sh", shingles_from_tokens(F.col("__toks")))
        .withColumn("__hs", F.transform("__sh", lambda s: portable_hash32(s)))
    )
    sig = staged.select(
        id_col,
        *[
            F.array_min(
                F.transform("__hs", lambda h: (F.lit(a[j]) * h + F.lit(b[j])) % MOD)
            ).alias(f"mh{j}")
            for j in range(N_PERM)
        ],
    )
    band_keys = F.array(
        *[
            F.concat_ws(
                ":",
                F.lit(i),
                F.concat_ws("_", *[F.col(f"mh{rpb * i + r}") for r in range(rpb)]),
            )
            for i in range(BANDS)
        ]
    )
    return sig.select(id_col, F.explode(band_keys).alias("band_key"))


def save_band_index(
    spark: SparkSession,
    docs: DataFrame,
    table: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 32,
    mode: str = "overwrite",
) -> None:
    """Persist a corpus's near-dup history as a hash-BUCKETED table of
    DISTINCT band keys — the cross-RUN completion of
    ``dedup_incremental_near`` (whose history lives for one session).
    The index stores only band keys (≤4 short strings per document,
    deduplicated), so a trillion-document history stays a compact
    relation; bucketing on ``band_key`` makes every future
    ``dedup_against_band_index`` probe shuffle-free on the history
    side — only the (small) new batch moves. ``mode="append"`` adds a
    run's admitted documents to the history (see
    ``update_band_index``)."""
    bands = bands_per_row(docs, id_col, text_col).select("band_key").distinct()
    writer = bands.write.mode(mode).bucketBy(n_buckets, "band_key")
    writer.saveAsTable(table)


def update_band_index(
    spark: SparkSession,
    admitted: DataFrame,
    table: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 32,
    skip_existing: bool = False,
) -> None:
    """Append a run's ADMITTED documents' band keys to the history
    index (same bucketing — appended files land in matching buckets,
    so the probe join stays shuffle-free on the history side).

    ``skip_existing`` anti-joins the admitted bands against the current
    index before appending, so a caller that cannot know whether a
    previous attempt already appended (the pipeline's completed-run
    re-execution path) converges instead of accumulating duplicate band
    rows on every re-run. Duplicates are semantically harmless to the
    semi-join probe but grow the index and its probe cost unboundedly.
    The anti-join reads the bucketed index in place (no shuffle on the
    history side) and only the batch-sized admitted bands move."""
    if skip_existing:
        bands = (
            bands_per_row(admitted, id_col, text_col)
            .select("band_key")
            .distinct()
            .join(spark.table(table), "band_key", "anti")
        )
        bands.write.mode("append").bucketBy(n_buckets, "band_key").saveAsTable(table)
        return
    save_band_index(
        spark, admitted, table, id_col, text_col, n_buckets, mode="append"
    )


def compact_band_index(
    spark: SparkSession, table: str, n_buckets: int = 32
) -> int:
    """Rewrite the band-index table as DISTINCT band keys in fresh
    bucketed files — the band-side analogue of ``compact_ann_index``.
    Every crawl's append lands one small file per bucket, so after many
    crawls the probe side opens crawl-count × bucket-count files; and
    appends may carry duplicate band keys (pre-``skip_existing``
    retries, keys shared by multiple admitted docs across runs), which
    cost probe work while adding nothing — the index's semantic is a
    SET. Compaction materializes the distinct keys (localCheckpoint,
    so the overwrite does not read the table it is replacing), then
    rewrites the table with the SAME bucketing — probes stay
    shuffle-free on the history side and results are identical.
    Returns the compacted row count. Single-writer contract (see
    ``_reset_managed_table``)."""
    bands = spark.table(table).select("band_key").distinct().localCheckpoint(
        eager=True
    )
    bands.write.mode("overwrite").bucketBy(n_buckets, "band_key").saveAsTable(table)
    return spark.table(table).count()


def dedup_against_band_index(
    spark: SparkSession,
    new_docs: DataFrame,
    table: str,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Cross-RUN near-duplicate dedup: the admitted subset of
    ``new_docs`` against a SAVED band index (``save_band_index``) —
    the every-crawl loop: load yesterday's index, drop near-dups of
    history AND of earlier (min-id) batch docs, append the survivors'
    bands back (``update_band_index``), repeat tomorrow.

    Same contract as ``dedup_incremental_near``: rejected when any
    band key exists in the history (semi join — the bucketed index
    side reads in place, no shuffle) or was claimed by a smaller-id
    batch doc (window over the batch's own band rows — batch-sized);
    docs with no shingles carry no signature and are not admitted."""
    from pyspark.sql import Window as W

    idx = spark.table(table)
    # Eager checkpoint (r14 opt, guide §2.4): nb is referenced by hit,
    # loser AND signed — three copies of the tokenize→minhash pipeline
    # in one plan (Catalyst does not share common subtrees across
    # joins). Materializing it once turns the probe into three block
    # reads of a batch-sized relation.
    nb = bands_per_row(
        new_docs.select(id_col, text_col), id_col, text_col
    ).localCheckpoint(eager=True)
    hit = nb.join(idx, "band_key", "semi").select(id_col).distinct()
    w = W.partitionBy("band_key").orderBy(id_col)
    loser = (
        nb.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") > 1)
        .select(id_col)
        .distinct()
    )
    signed = nb.select(id_col).distinct()
    return (
        new_docs.join(signed, id_col, "semi")
        .join(hit, id_col, "anti")
        .join(loser, id_col, "anti")
    )


def _clear_stale_location(spark: SparkSession, table: str) -> None:
    """Cheap pre-write guard for a table the caller is ABOUT TO
    OVERWRITE: when the table is already registered, do nothing (the
    overwrite owns the swap — dropping it first just doubles the
    metastore round-trips); when a previous PROCESS left its warehouse
    directory behind without a metastore entry, delete the directory so
    ``saveAsTable`` does not refuse with LOCATION_ALREADY_EXISTS.
    NOT a substitute for ``_reset_managed_table`` where the caller
    needs the table GONE (e.g. the pipeline's admitted-table existence
    check uses presence as a completed-run marker)."""
    from generic_data_ingestor_framework_spark.fileops import hadoop_delete

    # location inference below assumes an UNQUALIFIED default-database
    # name (<warehouse>/<lowercased name>); a qualified db.table would
    # compute a wrong path — at best a no-op, at worst deleting an
    # unrelated directory named like the qualified string (r14 ADVICE)
    if "." in table:
        raise ValueError(
            f"_clear_stale_location expects an unqualified default-db "
            f"table name, got {table!r}"
        )
    if spark.catalog.tableExists(table):
        return
    wh = spark.conf.get("spark.sql.warehouse.dir")
    hadoop_delete(spark, f"{wh}/{table.lower()}")


def _ensure_empty_delta(spark: SparkSession, delta_table: str) -> None:
    """Reset a versioned-index DELTA table to empty: TRUNCATE when a
    schema-compatible table already exists (one catalog op, no Spark
    job — the common warm path), else create it fresh (clearing any
    stale location first). Compatibility compares field TYPES as well
    as names (r14 ADVICE: a name-only check would TRUNCATE-and-reuse a
    foreign table whose matching names carry different types, and later
    generation-tagged appends would fail or silently coerce)."""
    expected = [
        (c.split()[0], c.split(" ", 1)[1].replace(" ", ""))
        for c in _BAND_DELTA_SCHEMA.split(", ")
    ]
    if (
        spark.catalog.tableExists(delta_table)
        and [
            (f.name, f.dataType.simpleString())
            for f in spark.table(delta_table).schema.fields
        ]
        == expected
    ):
        spark.sql(f"TRUNCATE TABLE {delta_table}")
        return
    _reset_managed_table(spark, delta_table)
    spark.createDataFrame([], _BAND_DELTA_SCHEMA).write.mode("overwrite").saveAsTable(
        delta_table
    )


def _reset_managed_table(spark: SparkSession, table: str) -> None:
    """Drop a managed table AND its warehouse location. A previous
    PROCESS can leave the directory behind while the current session's
    metastore has no such table — ``saveAsTable`` then refuses even
    overwrite mode (LOCATION_ALREADY_EXISTS). Storage-agnostic via the
    Hadoop FileSystem API (local path in tests, object store at
    scale).

    SINGLE-WRITER contract: callers that reset-and-rebuild fixed table
    names (``band_index_crawl``'s per-sf crawl tables) assume one
    writer per warehouse at a time — two sessions sharing a warehouse
    and running the same member concurrently would corrupt each
    other's tables mid-read. Production crawl loops own their index
    table names per pipeline (``pipeline.dedup_near_index``), where
    the admitted-table existence check already serializes re-runs; the
    gate member keeps fixed names so its oracle stays reproducible."""
    from generic_data_ingestor_framework_spark.fileops import hadoop_delete

    spark.sql(f"DROP TABLE IF EXISTS {table}")
    wh = spark.conf.get("spark.sql.warehouse.dir")
    hadoop_delete(spark, f"{wh}/{table.lower()}")


def band_index_crawl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The cross-run crawl loop driven END-TO-END through the
    PERSISTED band index — the gate member for ``save_band_index`` /
    ``dedup_against_band_index`` / ``update_band_index``
    (batch-equality pytests prove each step; this member drives the
    full save → probe → append → probe cycle through the bucketed
    TABLE, so a regression in the persisted path — bucket layout,
    append mode, semi-join claim order — flips the driver gate, not
    just a unit test).

    The corpus splits into three hash runs: run 0 seeds the index
    (``save_band_index``, overwrite → idempotent re-runs), run 1
    probes it and its admitted docs are WRITTEN to a table and
    appended to the index (reading the admitted set back from its
    table is the production shape — each crawl's output is durable —
    and pins the probe result against the index append that follows
    it in the same plan), run 2 probes the grown index. Output: the
    admitted (doc_id, lang) of both runs, tagged ``run`` 1/2.

    Scale shape: the index side of every probe is the bucketed
    band-key table (never shuffles); only batch-sized relations move.
    At 100 TB the only change is the table location (a real
    warehouse path instead of the local metastore)."""
    d = load_table(spark, sf_dir, "documents")
    run = portable_hash32(F.col("doc_id").cast("string")) % 3
    from generic_data_ingestor_framework_spark.fileops import sf_tag

    tag = sf_tag(sf_dir)
    idx_tbl = f"band_crawl_idx_{tag}"
    adm_tbl = f"band_crawl_adm1_{tag}"
    run0 = d.filter(run == 0).select("doc_id", "text")
    run1 = d.filter(run == 1).select("doc_id", "lang", "text")
    run2 = d.filter(run == 2).select("doc_id", "lang", "text")
    # both tables are rewritten in OVERWRITE mode below; only a
    # stale dir-without-table from a foreign process needs clearing
    _clear_stale_location(spark, idx_tbl)
    _clear_stale_location(spark, adm_tbl)
    save_band_index(spark, run0, idx_tbl)
    adm1 = dedup_against_band_index(spark, run1, idx_tbl)
    adm1.write.mode("overwrite").saveAsTable(adm_tbl)
    adm1_saved = spark.table(adm_tbl)
    update_band_index(spark, adm1_saved, idx_tbl)
    adm2 = dedup_against_band_index(spark, run2, idx_tbl)
    return adm1_saved.select("doc_id", "lang", F.lit(1).alias("run")).unionAll(
        adm2.select("doc_id", "lang", F.lit(2).alias("run"))
    )


# ---------------------------------------------------------------------------
# Versioned band index: DELETE/SUPERSEDE for re-crawled documents
# ---------------------------------------------------------------------------
#
# The plain band index (`save_band_index`) is a SET of distinct band
# keys — compact, but a crawl loop that RE-visits a changed document
# can only add its new bands; the stale ones stay forever, accumulating
# false-near-dup hits and probe cost. The versioned index is the LSM
# answer: a bucketed BASE table `(doc_id, band_key, gen)` carrying doc
# attribution, plus a small DELTA table `(doc_id, band_key, gen,
# tombstone)` receiving generation-tagged supersedes and deletes.
# Probes take latest-generation-wins; compaction folds the delta into
# the base and PHYSICALLY DROPS superseded/tombstoned rows.
#
# Scale shape: the base never shuffles at probe time — the semi join on
# band_key reads the bucketed table in place, and masking superseded
# docs is a broadcast anti join against the delta's doc set
# (batch-sized: only docs touched since the last compaction). The delta
# itself is broadcast into its own semi join. Compaction is the one
# full-index rewrite (that is what major compaction means) and restores
# the zero-delta probe path.

_BAND_DELTA_SCHEMA = "doc_id bigint, band_key string, gen int, tombstone boolean"


def save_band_index_versioned(
    spark: SparkSession,
    docs: DataFrame,
    base_table: str,
    delta_table: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 32,
) -> None:
    """Seed a VERSIONED band index: base rows at generation 0 (per-doc
    band attribution, bucketed by band_key so probes stay shuffle-free
    on the history side) plus an empty delta table."""
    rows = bands_per_row(docs, id_col, text_col).select(
        F.col(id_col).alias("doc_id"), "band_key", F.lit(0).alias("gen")
    )
    rows.write.mode("overwrite").bucketBy(n_buckets, "band_key").saveAsTable(
        base_table
    )
    _ensure_empty_delta(spark, delta_table)


def supersede_band_index(
    spark: SparkSession,
    docs: DataFrame,
    delta_table: str,
    gen: int,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> None:
    """Register re-crawled CHANGED content: the docs' NEW bands land in
    the delta at generation ``gen``; latest-generation-wins probes stop
    seeing their old bands immediately, compaction drops them
    physically. A doc whose new content carries no shingle signature
    still gets a NULL-band marker row, so its old bands die too (the
    band set of unshingleable content is empty, not "unchanged")."""
    bands = bands_per_row(docs, id_col, text_col).select(
        F.col(id_col).alias("doc_id"), "band_key"
    )
    # a doc has no bands IFF its token count is < SHINGLE_K (the
    # bands_per_row admission rule: >= k tokens produce >= 1 shingle) —
    # deriving the markers from that filter avoids re-running the whole
    # tokenize→minhash pipeline a second time just to anti-join it
    # (r14 opt; same rows as the previous anti join by construction)
    marker = (
        docs.select(
            F.col(id_col).alias("doc_id"),
            F.size(tokens_col(text_col)).alias("__ntok"),
        )
        .filter(F.col("__ntok") < SHINGLE_K)
        .select("doc_id", F.lit(None).cast("string").alias("band_key"))
    )
    rows = (
        bands.unionByName(marker)
        .withColumn("gen", F.lit(gen))
        .withColumn("tombstone", F.lit(False))
    )
    rows.write.mode("append").saveAsTable(delta_table)


def delete_band_index_docs(
    spark: SparkSession, ids: DataFrame, delta_table: str, gen: int,
    id_col: str = "doc_id",
) -> None:
    """Tombstone documents out of the index at generation ``gen`` (the
    crawl loop's 'page gone' signal). Pure markers — compaction removes
    every band row the doc ever contributed."""
    rows = ids.select(
        F.col(id_col).alias("doc_id"),
        F.lit(None).cast("string").alias("band_key"),
        F.lit(gen).alias("gen"),
        F.lit(True).alias("tombstone"),
    )
    rows.write.mode("append").saveAsTable(delta_table)


def _band_delta_live(delta: DataFrame) -> DataFrame:
    """Latest-generation-wins over the delta: per doc, only the highest
    generation's rows survive; tombstones and NULL-band markers carry
    no live bands. A delete and a supersede at the SAME generation
    resolve to the delete — ``max(struct(gen, tombstone))`` puts the
    tombstone on top of the tie (false < true), matching the ANN
    family's documented tie rule (``_load_index_relation`` orders by
    desc gen, desc tombstone), so a caller following that rule never
    silently resurrects a deleted doc's bands here. Window over the
    BATCH-SIZED delta only."""
    from pyspark.sql import Window as W

    top = F.max(F.struct("gen", "tombstone")).over(W.partitionBy("doc_id"))
    return (
        delta.withColumn("__top", top)
        .filter((F.col("gen") == F.col("__top.gen")) & ~F.col("__top.tombstone"))
        .filter(~F.col("tombstone") & F.col("band_key").isNotNull())
        .select("doc_id", "band_key", "gen")
    )


def dedup_against_band_index_versioned(
    spark: SparkSession,
    new_docs: DataFrame,
    base_table: str,
    delta_table: str | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    bands: DataFrame | None = None,
) -> DataFrame:
    """``dedup_against_band_index`` against the EFFECTIVE view of a
    versioned index: live history = base rows of docs untouched by the
    delta (broadcast anti join on the delta's doc set — batch-sized)
    plus the delta's latest-generation live bands (broadcast semi).
    ``delta_table=None`` probes the raw base alone — correct only
    post-compaction, which is exactly what the recrawl gate member uses
    it to PROVE (stale rows physically surviving compaction make the
    raw probe diverge from the oracle).

    GUARD: the masking anti join BROADCASTS the delta's doc set, which
    is only safe while the delta stays batch-sized. Rather than let a
    compaction-starved index walk into a silent driver-side blowup,
    the probe refuses loudly once the delta's DISTINCT doc count — the
    exact set the mask broadcasts, and the same quantity
    ``band_index_pressure_stats`` / ``maybe_compact_band_index`` police
    — estimates past the session's broadcast budget, so the compaction
    policy's trigger always dominates this guard.

    ``bands``: optionally the PRE-COMPUTED ``bands_per_row`` of
    ``new_docs`` (a caller probing the same batch against several index
    states — the recrawl gate member's two phases — computes it once);
    when absent it is computed and checkpointed here, since the plan
    references it four times (two semi joins + loser window + signed)
    and Catalyst does not share common subtrees across joins."""
    from pyspark.sql import Window as W

    base = spark.table(base_table)
    nb = (
        bands
        if bands is not None
        else bands_per_row(
            new_docs.select(id_col, text_col), id_col, text_col
        ).localCheckpoint(eager=True)
    )
    if delta_table is None:
        hit = nb.join(base, "band_key", "semi").select(id_col).distinct()
    else:
        from generic_data_ingestor_framework_spark.scale import (
            broadcast_threshold_bytes,
        )

        delta = spark.table(delta_table)
        budget = broadcast_threshold_bytes(spark)
        touched = delta.select("doc_id").distinct()
        est = touched.count() * BCAST_BYTES_PER_ID
        if 0 < budget < est:
            raise RuntimeError(
                f"versioned band index delta too large to broadcast-mask "
                f"(~{est} bytes estimated vs {budget} budget): run "
                f"compact_band_index_versioned('{base_table}', "
                f"'{delta_table}') or the band_auto_compact pipeline step "
                f"before probing"
            )
        # budget <= 0 = operator disabled broadcasting: honor it by
        # dropping the forced hints too (AQE decides the join side).
        hint = F.broadcast if budget > 0 else (lambda d: d)
        live_base = base.join(hint(touched), "doc_id", "anti")
        live_delta = _band_delta_live(delta)
        hit = (
            nb.join(live_base, "band_key", "semi")
            .select(id_col)
            .unionByName(
                nb.join(hint(live_delta), "band_key", "semi").select(id_col)
            )
            .distinct()
        )
    w = W.partitionBy("band_key").orderBy(id_col)
    loser = (
        nb.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") > 1)
        .select(id_col)
        .distinct()
    )
    signed = nb.select(id_col).distinct()
    return (
        new_docs.join(signed, id_col, "semi")
        .join(hit, id_col, "anti")
        .join(loser, id_col, "anti")
    )


# Broadcast-size estimate for one masked doc id: an 8-byte key plus
# hash-relation overhead (Spark's LongHashedRelation is ~2-4x the raw
# key bytes). Deliberately conservative — the pressure policy should
# compact well before the driver is at risk.
BCAST_BYTES_PER_ID = 32


def band_index_pressure_stats(
    spark: SparkSession, base_table: str, delta_table: str
) -> dict:
    """Delta/base PRESSURE of a versioned band index — the band twin of
    ``ann_index_pressure_stats``. The probe path masks the bucketed
    base with a BROADCAST anti join on the delta's doc set
    (``dedup_against_band_index_versioned``); that is safe only while
    the delta stays batch-sized, and nothing about the LSM discipline
    enforces it — a crawl loop that defers compaction long enough
    silently turns the broadcast into a driver OOM. This measures the
    contract: doc-grain ratio (``pressure_bp``) and the estimated
    broadcast bytes vs the session's broadcast budget. Counts are
    metadata/aggregate-sized jobs over the (batch-sized) delta plus one
    distinct-count over the base's doc column."""
    from generic_data_ingestor_framework_spark.scale import broadcast_threshold_bytes

    base_docs = spark.table(base_table).select("doc_id").distinct().count()
    delta = spark.table(delta_table)
    # one aggregate job for both delta gauges (r14 opt; was two jobs —
    # doc_id is never NULL in the delta, so count_distinct ≡ the
    # previous distinct().count())
    drow = delta.agg(
        F.count(F.lit(1)).alias("r"), F.count_distinct("doc_id").alias("d")
    ).collect()[0]
    delta_rows, delta_docs = drow["r"], drow["d"]
    threshold = broadcast_threshold_bytes(spark)
    est_bytes = delta_docs * BCAST_BYTES_PER_ID
    return {
        "base_docs": base_docs,
        "delta_rows": delta_rows,
        "delta_docs": delta_docs,
        "pressure_bp": (delta_docs * 10000) // base_docs if base_docs else 10000,
        "est_broadcast_bytes": est_bytes,
        "broadcast_threshold_bytes": threshold,
        "over_broadcast_budget": 0 < threshold < est_bytes,
    }


def maybe_compact_band_index(
    spark: SparkSession,
    base_table: str,
    delta_table: str,
    max_delta_ratio: float = 0.10,
    n_buckets: int = 32,
    stats: dict | None = None,
) -> dict:
    """AUTO-COMPACT policy for a versioned band index: compact when the
    delta's doc set exceeds ``max_delta_ratio`` of the base's docs OR
    its estimated broadcast size exceeds the session's broadcast
    budget — the enforcement arm of the batch-sized-delta contract
    (``band_index_pressure_stats``). A crawl pipeline runs this after
    its supersede/delete steps (pipeline op ``band_auto_compact``) so
    deferred compaction can never silently accumulate into a
    driver-sized broadcast. Returns the pressure stats plus the
    decision (``compacted``, ``reason``). ``stats``: optionally the
    CURRENT ``band_index_pressure_stats`` result, when the caller just
    measured it (the pressure gate member) — passing it skips an
    identical back-to-back recomputation; it must reflect the tables'
    present state."""
    if stats is None:
        stats = band_index_pressure_stats(spark, base_table, delta_table)
    over_ratio = stats["delta_docs"] > max_delta_ratio * stats["base_docs"]
    reason = (
        "delta_ratio" if over_ratio
        else "broadcast_budget" if stats["over_broadcast_budget"]
        else ""
    )
    if reason and stats["delta_rows"] > 0:
        compact_band_index_versioned(spark, base_table, delta_table, n_buckets)
        return {**stats, "compacted": True, "reason": reason}
    return {**stats, "compacted": False, "reason": reason}


def band_index_pressure(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gate member for the COMPACTION-PRESSURE policy (r12 verdict #1):
    drive the recrawl cohorts (seed hash%3==0, supersede hash%5==0 at
    gen 1, tombstone hash%7==0 at gen 2) into a versioned band index,
    measure the delta/base pressure, run ``maybe_compact_band_index``
    at the default 10% policy — the ~31% touched cohort exceeds it at
    every SF, so the policy MUST fire — and measure again. Stage 1 pins
    the observed pressure (delta docs = the touched cohort, base docs =
    seed docs with >=1 band); stage 2 pins the enforcement (delta
    drained, pressure 0, ``compacted`` true). The DuckDB oracle
    recomputes both stages from the hash cohorts and the >=3-token
    bandability rule.

    Scale shape: the pressure probe is aggregate-sized (two distinct
    counts + a metadata count); compaction is the one full rewrite the
    policy exists to schedule."""
    d = load_table(spark, sf_dir, "documents")
    h = portable_hash32(F.col("doc_id").cast("string"))
    from generic_data_ingestor_framework_spark.fileops import sf_tag

    tag = sf_tag(sf_dir)
    base_tbl = f"band_pressure_idx_{tag}"
    delta_tbl = f"band_pressure_delta_{tag}"
    modified = F.concat_ws(" ", F.reverse(F.split(F.col("text"), r"\s+")))
    run0 = d.filter(h % 3 == 0)
    changed = run0.filter(h % 5 == 0).select("doc_id", modified.alias("text"))
    deleted = run0.filter(h % 7 == 0).select("doc_id")
    # base is rewritten in OVERWRITE mode by save_band_index_versioned,
    # which also drains the delta (TRUNCATE when it already exists)
    _clear_stale_location(spark, base_tbl)
    save_band_index_versioned(spark, run0.select("doc_id", "text"), base_tbl, delta_tbl)
    supersede_band_index(spark, changed, delta_tbl, gen=1)
    delete_band_index_docs(spark, deleted, delta_tbl, gen=2)
    p1 = band_index_pressure_stats(spark, base_tbl, delta_tbl)
    # p1 measured the exact state maybe_compact would re-measure —
    # pass it through (r14 opt: one stats pass instead of two)
    dec = maybe_compact_band_index(spark, base_tbl, delta_tbl, stats=p1)
    p2 = band_index_pressure_stats(spark, base_tbl, delta_tbl)
    rows = [
        (1, p1["base_docs"], p1["delta_docs"], p1["pressure_bp"], False),
        (2, p2["base_docs"], p2["delta_docs"], p2["pressure_bp"], dec["compacted"]),
    ]
    return spark.createDataFrame(
        rows,
        "stage int, base_docs bigint, delta_docs bigint, pressure_bp bigint, "
        "compacted boolean",
    )


def compact_band_index_versioned(
    spark: SparkSession, base_table: str, delta_table: str, n_buckets: int = 32
) -> int:
    """MAJOR COMPACTION of a versioned band index: materialize the
    effective view (untouched base rows + the delta's latest-generation
    live bands) into a fresh bucketed base and truncate the delta —
    superseded and tombstoned rows are PHYSICALLY dropped, restoring
    the zero-delta probe path. Returns the compacted row count.
    Single-writer contract (see ``_reset_managed_table``).

    The effective view is STAGED into a temporary table and swapped in
    by catalog rename (r15, guide §5/§6 — the ``compact_ann_index``
    protocol): the old shape eagerly ``localCheckpoint``-ed the entire
    effective view so the overwrite would not read the table it
    replaces — INDEX-SIZED executor storage at the 100 TB design point.
    Staging writes the one full copy compaction inherently owes straight
    to disk instead. Crash windows are no worse than the overwrite
    path: a crash during staging leaves base+delta untouched (the stale
    staging table is reaped on the next compaction); a crash inside the
    drop→rename swap leaves the base absent — exactly the overwrite
    path's mid-rewrite window — and the crawl loop's save step rebuilds
    it."""
    base = spark.table(base_table)
    delta = spark.table(delta_table)
    # NO forced-broadcast hint here (unlike the probe path): compaction
    # must be able to drain exactly the oversized delta the probe guard
    # refuses — AQE still broadcasts a batch-sized touched set at
    # runtime, and an oversized one merges as a shuffle join.
    touched = delta.select("doc_id").distinct()
    # dropDuplicates: a retried supersede step re-appends identical
    # (doc_id, band_key, gen) rows — inert at probe time (band sets),
    # dropped here so the base never grows from retries
    live = (
        base.join(touched, "doc_id", "anti")
        .unionByName(_band_delta_live(delta))
        .dropDuplicates(["doc_id", "band_key", "gen"])
    )
    staging = f"{base_table}__compact"
    _reset_managed_table(spark, staging)  # reap a dead run's leftover
    live.write.mode("overwrite").bucketBy(n_buckets, "band_key").saveAsTable(
        staging
    )
    # count the staged parquet (metadata-count job) BEFORE the swap so
    # the returned number provably describes what was written
    n_live = spark.table(staging).count()
    _reset_managed_table(spark, base_table)
    spark.sql(f"ALTER TABLE {staging} RENAME TO {base_table}")
    # the delta table provably exists (read above): TRUNCATE drains it
    # in one catalog op instead of an empty-relation overwrite job
    spark.sql(f"TRUNCATE TABLE {delta_table}")
    return n_live


# re-crawled old-content copies are re-keyed past max(doc_id) — the
# offset is DERIVED (broadcast 1-row aggregate), not a fixed constant,
# so the disjoint-id-space assumption holds at every SF (r12 ADVICE: a
# fixed +1e6 collides with real ids once the corpus passes 1M docs)
RECRAWL_OFFSET_SQL = "(SELECT max(doc_id) + 1 FROM documents)"


def _recrawl_off(d: DataFrame):
    return F.broadcast(d.agg((F.max("doc_id") + 1).alias("__off")))


def band_index_recrawl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The DELETE/SUPERSEDE crawl loop driven END-TO-END through the
    VERSIONED band index — the gate member for
    ``save_band_index_versioned`` / ``supersede_band_index`` /
    ``delete_band_index_docs`` / ``compact_band_index_versioned``
    (mirrors ``band_index_crawl``, which pins the append-only loop).

    Shape: run-0 docs (hash%3==0) seed the base at gen 0. The crawl
    then RE-visits a subset (hash%5==0) whose content CHANGED — words
    reversed, a deterministic whole-text rewrite — superseding them at
    gen 1, and finds another subset (hash%7==0) GONE, tombstoning them
    at gen 2 (a doc in both is superseded then deleted; latest wins).
    A probe batch — run-1 docs plus OLD-CONTENT COPIES of every changed
    doc (original text re-keyed past max(doc_id)) — probes the effective
    view (phase 1) and, after compaction, the RAW base with no
    effective-view logic at all (phase 2). Equal phases pin both that
    the effective view is right and that compaction physically dropped
    every stale row: an old-content copy is admitted ONLY because the
    changed doc's old bands are dead, and a surviving stale row would
    flip phase 2. The DuckDB oracle recomputes the surviving band set
    from scratch.

    Scale shape: probes never shuffle the base (bucketed semi join +
    broadcast anti on the batch-sized touched set); compaction is the
    one full rewrite. At 100 TB only the table location changes."""
    d = load_table(spark, sf_dir, "documents")
    h = portable_hash32(F.col("doc_id").cast("string"))
    from generic_data_ingestor_framework_spark.fileops import sf_tag

    tag = sf_tag(sf_dir)
    base_tbl = f"band_recrawl_idx_{tag}"
    delta_tbl = f"band_recrawl_delta_{tag}"
    modified = F.concat_ws(" ", F.reverse(F.split(F.col("text"), r"\s+")))
    run0 = d.filter(h % 3 == 0)
    changed = run0.filter(h % 5 == 0).select("doc_id", modified.alias("text"))
    deleted = run0.filter(h % 7 == 0).select("doc_id")
    copies = run0.filter(h % 5 == 0).crossJoin(_recrawl_off(d)).select(
        (F.col("doc_id") + F.col("__off")).alias("doc_id"), "lang", "text"
    )
    batch = d.filter(h % 3 == 1).select("doc_id", "lang", "text").unionByName(copies)
    # base is rewritten in OVERWRITE mode by save_band_index_versioned,
    # which also drains the delta (TRUNCATE when it already exists)
    _clear_stale_location(spark, base_tbl)
    save_band_index_versioned(
        spark, run0.select("doc_id", "text"), base_tbl, delta_tbl
    )
    supersede_band_index(spark, changed, delta_tbl, gen=1)
    delete_band_index_docs(spark, deleted, delta_tbl, gen=2)
    # both probe phases sign the SAME batch — compute its bands once
    # (r14 opt; each probe otherwise re-ran the tokenize→minhash
    # pipeline, and referenced it 3-4x inside its own plan)
    nb = bands_per_row(
        batch.select("doc_id", "text"), "doc_id", "text"
    ).localCheckpoint(eager=True)
    adm1 = dedup_against_band_index_versioned(
        spark, batch, base_tbl, delta_tbl, bands=nb
    )
    # materialize phase 1 BEFORE compaction rewrites the tables it reads
    out1 = adm1.select(
        F.lit(1).alias("phase"), "doc_id", "lang"
    ).localCheckpoint(eager=True)
    compact_band_index_versioned(spark, base_tbl, delta_tbl)
    adm2 = dedup_against_band_index_versioned(
        spark, batch, base_tbl, None, bands=nb
    )
    return out1.unionAll(adm2.select(F.lit(2).alias("phase"), "doc_id", "lang"))


def dedup_incremental_near(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-run NEAR-duplicate dedup: ``dedup_incremental`` catches
    exact re-crawls, but production pipelines must also refuse content
    that is a near-duplicate of the accumulated corpus. The corpus
    history persists only its MinHash BAND SIGNATURES (4 strings per
    document — a compact index no matter how large the history grows);
    a new-batch document is rejected when ANY of its band signatures
    already exists in the corpus index (the LSH candidate test, the
    same recall contract as ``dedup_minhash_lsh_pairs``), and admitted
    documents are also band-unique within the batch (min doc_id wins).

    Scale shape (round-6: ONE band-key shuffle instead of the prior
    semi-join + separate window): corpus rows sort before batch rows
    inside each (band_idx, band_sig) partition (bucket 0 < 1, then
    doc_id), so a batch row with ``row_number > 1`` is exactly
    "band already claimed" — by corpus history OR by an earlier batch
    document. No pairwise comparisons anywhere; the band relation is
    session-persisted (``_banded_df``)."""
    from pyspark.sql import Window as W

    banded = _banded_df(spark, sf_dir)
    w = W.partitionBy("band_idx", "band_sig").orderBy("bucket", "doc_id")
    rejected = (
        banded.withColumn("rn", F.row_number().over(w))
        .filter((F.col("bucket") == 1) & (F.col("rn") > 1))
        .select("doc_id")
        .distinct()
    )
    batch_ids = banded.filter(F.col("bucket") == 1).select("doc_id").distinct()
    d = load_table(spark, sf_dir, "documents")
    return (
        d.select("doc_id", "lang")
        .join(batch_ids, "doc_id", "semi")
        .join(rejected, "doc_id", "anti")
    )


def connected_components(
    docs: DataFrame, pairs: DataFrame, a_col: str, b_col: str, max_iters: int = 12
) -> DataFrame:
    """Min-label propagation + pointer jumping over an undirected edge
    list. ``docs`` must have a ``doc_id`` column; returns
    (doc_id, cluster_id = component min). See ``dedup_cluster_assign``
    for the algorithmic contract."""
    edges = (
        pairs.select(F.col(a_col).alias("a"), F.col(b_col).alias("b"))
        .union(pairs.select(F.col(b_col).alias("a"), F.col(a_col).alias("b")))
        .cache()
    )
    # materialize the seed labels: the loop's first iteration references
    # `labels` TWICE (neighbor-min join + propagate join), so a heavy
    # docs lineage would otherwise execute twice before the first
    # checkpoint truncates it
    labels = docs.select(
        "doc_id", F.col("doc_id").alias("cluster_id")
    ).localCheckpoint(eager=True)

    # Convergence test: per-node labels are MONOTONE NON-INCREASING
    # (both steps take minima), so any change strictly decreases the
    # label sum — sum unchanged ⇔ fixpoint. One no-shuffle aggregate
    # per iteration instead of the join+count diff (decimal(38) keeps
    # the sum exact at any corpus size, no overflow wrap).
    def _label_sum(lbl: DataFrame):
        return lbl.agg(
            F.sum(F.col("cluster_id").cast("decimal(38,0)")).alias("s")
        ).collect()[0]["s"]

    prev_sum = _label_sum(labels)
    changed = 0
    try:
        for _ in range(max_iters):  # ≥ log2(max component diameter), with slack
            neighbor_min = (
                labels.join(edges, labels.doc_id == edges.a)
                .groupBy(F.col("b").alias("doc_id"))
                .agg(F.min("cluster_id").alias("nbr_min"))
            )
            propagated = (
                labels.join(neighbor_min, "doc_id", "left")
                .select(
                    "doc_id",
                    F.least(
                        F.col("cluster_id"), F.coalesce(F.col("nbr_min"), F.col("cluster_id"))
                    ).alias("cluster_id"),
                )
            )
            parent = propagated.select(
                F.col("doc_id").alias("p_id"), F.col("cluster_id").alias("p_cluster")
            )
            new_labels = (
                propagated.join(parent, propagated.cluster_id == parent.p_id, "left")
                .select(
                    "doc_id",
                    F.least(
                        F.col("cluster_id"), F.coalesce(F.col("p_cluster"), F.col("cluster_id"))
                    ).alias("cluster_id"),
                )
            )
            # localCheckpoint (not cache): the pointer-jump self-join puts
            # the prior plan in the tree TWICE per iteration, so without
            # lineage truncation the analyzed plan grows 2^iterations and
            # OOMs the driver long before any data does. The convergence
            # sum rides the SAME materialization job as an Observation —
            # zero extra actions per iteration.
            from pyspark.sql import Observation

            obs = Observation()
            new_labels = new_labels.observe(
                obs, F.sum(F.col("cluster_id").cast("decimal(38,0)")).alias("s")
            )
            new_labels = new_labels.localCheckpoint(eager=True)
            new_sum = obs.get["s"]
            changed = 0 if new_sum == prev_sum else 1
            prev_sum = new_sum
            labels = new_labels
            if changed == 0:
                break
    finally:
        # the returned labels are localCheckpoint-materialized, so they
        # no longer reference the edge lineage — release it now rather
        # than leaking one cached edge relation per invocation
        edges.unpersist()
    if changed:
        # a component needing more than the iteration bound would yield
        # silently-wrong cluster ids; surface it instead of returning
        warnings.warn(
            f"connected_components: min-label propagation did not converge "
            f"(labels still changing after {max_iters} iterations); "
            f"cluster ids may split large components",
            RuntimeWarning,
            stacklevel=2,
        )
    return labels


PR_DAMP = 0.85
PR_ITERS = 5
PR_ROUND = 9  # per-iteration rounding (cross-engine summation contract)
PR_SCALE = 10**12  # per-edge contribs integer-scale before summing so the
                   # two engines' (and Spark partial-agg's) summation
                   # orders cannot drift a float sum across a rounding
                   # boundary; si ≤ PR_SCALE per node, far inside bigint


def pagerank_doc_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank over the near-duplicate similarity graph: LSH candidate
    pairs become symmetric edges and ``PR_ITERS`` power iterations rank
    each document's centrality in its duplication neighborhood — high
    rank = hub of a large near-dup family (the doc you keep or audit
    first), base rank = no duplicates anywhere.

    The iterative-analytics sibling of ``connected_components``, and it
    gets the same plan hygiene: the edge list is pre-joined with its
    out-degree ONCE and session-persisted (one join + one destination
    hash-aggregate per iteration — the textbook distributed PageRank
    shape), and the rank relation is ``localCheckpoint``-truncated every
    iteration so the executed plan stays flat instead of re-deriving
    all prior iterations (round-5 audit: 100 exchanges, sf1 ratio 6.59).
    Dangling mass is NOT redistributed (defined contract, mirrored in
    the oracle). Per-edge contributions are integer-scaled by
    ``PR_SCALE`` before summing (order-exact cross-engine) and ranks
    round to ``PR_ROUND`` dp per iteration."""
    from generic_data_ingestor_framework_spark.cachemgr import shared_persist, shared_value

    docs = load_table(spark, sf_dir, "documents").select("doc_id")

    def _edges_with_degree() -> DataFrame:
        pairs = dedup_minhash_lsh_pairs(spark, sf_dir)
        e = pairs.select(F.col("doc_a").alias("u"), F.col("doc_b").alias("v")).unionAll(
            pairs.select(F.col("doc_b").alias("u"), F.col("doc_a").alias("v"))
        )
        deg = e.groupBy("u").agg(F.count(F.lit(1)).alias("deg"))
        return e.join(deg, "u")

    ed = shared_persist(spark, ("pr_edges_deg", sf_dir), _edges_with_degree)
    n = shared_value(spark, ("pr_n", sf_dir), lambda: docs.count())
    base = 0.15 / n
    p = docs.select(F.col("doc_id").alias("v"), F.lit(1.0 / n).alias("p"))
    p = p.localCheckpoint(eager=True)  # referenced once per iteration; seed flat
    for _ in range(PR_ITERS):
        contrib = (
            ed.join(p.withColumnRenamed("v", "u"), "u")
            .groupBy("v")
            .agg(
                F.sum(
                    F.round(F.col("p") * PR_SCALE / F.col("deg")).cast("bigint")
                ).alias("si")
            )
        )
        p = docs.join(contrib, docs.doc_id == contrib.v, "left").select(
            F.col("doc_id").alias("v"),
            F.round(
                F.lit(base)
                + PR_DAMP
                * (F.coalesce(F.col("si"), F.lit(0)).cast("double") / F.lit(float(PR_SCALE))),
                PR_ROUND,
            ).alias("p"),
        )
        # truncate lineage: without this, iteration k's plan re-derives
        # iterations 1..k-1 (the round-5 100-exchange plan); with it each
        # iteration executes exactly one join + one aggregate
        p = p.localCheckpoint(eager=True)
    return p.select(F.col("v").alias("doc_id"), F.round("p", 6).alias("pagerank"))


MH_ACC_MOD_TIERS = ((20_000, 4), (200_000, 16))  # (< n_docs bound, mod); else ↓
MH_ACC_MOD_CEIL = 64        # past the last tier


def _acc_sample_mod(spark: SparkSession, sf_dir: str) -> int:
    """SF-aware audit sample modulus: candidate-pair mass grows
    quadratically with duplicate-family size, so a fixed 1-in-4 sample
    re-inflates at each corpus decade (sf1 measured 4.4× for 10× data
    at mod 4). The modulus steps ×4 per decade past 20k docs —
    estimator calibration needs a stable SAMPLE SIZE, not a stable
    sample RATE. The tier function is integer-threshold CASE logic so
    the DuckDB oracle (``_MH_ACC_MOD_SQL``) reproduces it exactly (the
    ``lsh_scurve_audit``/SemDeDup adaptive-k precedent)."""
    from generic_data_ingestor_framework_spark.cachemgr import shared_value

    n = shared_value(
        spark,
        ("n_docs", sf_dir),
        lambda: load_table(spark, sf_dir, "documents").count(),
    )
    for bound, mod in MH_ACC_MOD_TIERS:
        if n < bound:
            return mod
    return MH_ACC_MOD_CEIL


_MH_ACC_MOD_SQL = (
    "(SELECT CASE "
    + " ".join(
        f"WHEN count(*) < {bound} THEN {mod}" for bound, mod in MH_ACC_MOD_TIERS
    )
    + f" ELSE {MH_ACC_MOD_CEIL} END FROM documents)"
)


def dedup_minhash_accuracy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Estimator audit for the MinHash pipeline (the dedup analogue of
    ``ann_recall_report``): for every LSH candidate pair, the
    signature-estimated Jaccard (matching components / ``N_PERM``)
    side-by-side with the EXACT Jaccard of the full distinct
    hashed-shingle sets, plus the absolute error — the measurement that
    justifies (or indicts) a chosen signature width before a 100 TB
    dedup run trusts it.

    Scale shape: both inputs are session-persisted relations (bands →
    pairs, signatures); the exact side prunes the shingle relation to
    candidate documents FIRST (broadcast semi-join on the pair set), so
    the set-intersection join is bounded by candidate-pair cardinality,
    never corpus size. All arithmetic is integer counts + one division,
    4-dp floored.

    The audit runs over a deterministic hash-sample of the candidate
    pairs whose modulus STEPS WITH CORPUS SIZE (``_acc_sample_mod``):
    estimator calibration is a statistical question, and on a
    duplication-heavy corpus the pair mass is quadratic in family size
    (the round-8 sf1 decade-up measured 7.8× before sampling, 4.4×
    at a fixed 1-in-4) — membership is portable hash arithmetic and
    the modulus an integer tier function, so both engines audit the
    identical subset at every scale."""
    from generic_data_ingestor_framework_spark.cachemgr import shared_value

    # Session-memoized eager checkpoint (r14 opt): the sampled pair set
    # is referenced by est, the candidate pruning, AND the intersection
    # join — un-truncated, the LSH self-join subtree repeats hundreds
    # of times through the downstream plan and Catalyst re-plans it all
    # on every call. The checkpoint collapses every reference to a
    # sampled-pair-sized leaf; cachemgr releases it at clear_caches.
    pairs = shared_value(
        spark,
        ("mh_acc_pairs", sf_dir),
        lambda: dedup_minhash_lsh_pairs(spark, sf_dir)
        .filter(
            portable_hash32(
                F.concat(F.col("doc_a").cast("string"), F.lit("_"),
                         F.col("doc_b").cast("string"))
            ) % _acc_sample_mod(spark, sf_dir) == 0
        )
        .localCheckpoint(eager=True),
    )
    sig = _minhash_sig_df(spark, sf_dir)
    a = sig.select(
        F.col("doc_id").alias("doc_a"),
        *[F.col(f"mh{j}").alias(f"a{j}") for j in range(N_PERM)],
    )
    b = sig.select(
        F.col("doc_id").alias("doc_b"),
        *[F.col(f"mh{j}").alias(f"b{j}") for j in range(N_PERM)],
    )
    m = sum(
        (F.col(f"a{j}") == F.col(f"b{j}")).cast("int") for j in range(N_PERM)
    ).alias("m")
    # broadcast the PAIR side (bounded by candidate count), never the
    # corpus-sized signature relation
    est = (
        F.broadcast(F.broadcast(pairs).join(a, "doc_a"))
        .join(b, "doc_b")
        .select("doc_a", "doc_b", m)
    )
    from generic_data_ingestor_framework_spark.cachemgr import shared_persist

    def _cand_shingles() -> DataFrame:
        hs = (
            _exploded_shingles(spark, sf_dir)
            .select("doc_id", portable_hash32(F.col("shingle")).alias("sh"))
            .distinct()
        )
        cand = (
            pairs.select(F.col("doc_a").alias("doc_id"))
            .unionAll(pairs.select(F.col("doc_b").alias("doc_id")))
            .distinct()
        )
        return hs.join(F.broadcast(cand), "doc_id")

    # referenced by sizes + both sides of the intersection join: persist
    # the candidate-pruned relation once (bounded by candidate docs)
    hc = shared_persist(spark, ("mh_acc_cand_shingles", sf_dir), _cand_shingles)
    # candidate-doc-sized; referenced as BOTH join sides below, which
    # re-ran the aggregate twice per call — checkpoint it once
    sizes = shared_value(
        spark,
        ("mh_acc_sizes", sf_dir),
        lambda: hc.groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("sz"))
        .localCheckpoint(eager=True),
    )
    x = hc.select(F.col("doc_id").alias("doc_a"), "sh")
    y = hc.select(F.col("doc_id").alias("doc_b"), "sh")
    # r14 opt: broadcast the pair side into the doc_a expansion (same
    # bounded class as est's build side) so the candidate-shingle
    # relation streams instead of shuffling by doc_a — 2 Exchange → 0
    # on that join. The y side is the SAME candidate-pruned persisted
    # relation (bounded by candidate docs × their shingles), so the
    # set-intersection join broadcasts too instead of planning a
    # sort-merge join — another 2 Exchange + 2 Sort removed.
    inter = (
        F.broadcast(pairs).join(x, "doc_a")
        .join(F.broadcast(y), ["doc_b", "sh"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("i"))
    )
    sza = sizes.select(F.col("doc_id").alias("doc_a"), F.col("sz").alias("sz_a"))
    szb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("sz").alias("sz_b"))
    est_j = F.col("m") / F.lit(float(N_PERM))
    exact_j = F.col("i") / (F.col("sz_a") + F.col("sz_b") - F.col("i"))
    # r14 opt: inter (≤ sampled-pair rows after the aggregate) joins as
    # the broadcast build side — the left-outer was a SortMergeJoin (the
    # LEFT side cannot broadcast), 2 Exchange + 2 Sort → 0
    return (
        est.join(F.broadcast(inter), ["doc_a", "doc_b"], "left")
        .withColumn("i", F.coalesce("i", F.lit(0)))
        .join(F.broadcast(sza), "doc_a")
        .join(F.broadcast(szb), "doc_b")
        .select(
            "doc_a",
            "doc_b",
            (F.floor(est_j * 10000) / 10000).alias("est_jaccard"),
            (F.floor(exact_j * 10000) / 10000).alias("exact_jaccard"),
            (F.floor(F.abs(est_j - exact_j) * 10000) / 10000).alias("abs_err"),
        )
        .orderBy("doc_a", "doc_b")
    )


TRI_DEG_CAP = 64  # max raw degree for a node to enter the triangle census


SCURVE_DOC_MOD = 4  # audit docs with hash('s'·id) % MOD == 0 (all-pairs ground truth)


def lsh_scurve_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Empirical LSH S-curve vs theory: on a deterministic document
    sample, EVERY pair's exact shingle Jaccard is computed (the ground
    truth LSH can never afford corpus-wide), pairs are bucketed by
    Jaccard decile, and each bucket reports the measured
    candidate-capture rate next to the banding theory's
    ``P = 1-(1-s^r)^b`` at the bucket midpoint — the calibration plot
    that tells you whether the (bands, rows) knee sits where the
    threshold needs it BEFORE a 100 TB dedup run commits to a config.

    Bucket ``-1`` is the zero-overlap mass: its pair count is
    arithmetic (``C(n,2)`` minus enumerated nonzero pairs — never
    materialized), and its candidate count is the LSH false-positive
    set (candidates sharing no shingle at all).

    Scale shape: the quadratic ground truth is confined to the sample
    (``1/MOD²`` of the pair mass — the audit's cost knob); the
    inverted-index join enumerates only nonzero-overlap pairs; all
    rates are integer-count ratios."""
    docs = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id")
        .filter(
            portable_hash32(F.concat(F.lit("s"), F.col("doc_id").cast("string")))
            % SCURVE_DOC_MOD
            == 0
        )
    )
    from generic_data_ingestor_framework_spark.cachemgr import (
        shared_persist,
        shared_value,
    )

    hs = shared_persist(
        spark,
        ("scurve_hs", sf_dir),
        lambda: (
            _exploded_shingles(spark, sf_dir)
            .select("doc_id", portable_hash32(F.col("shingle")).alias("sh"))
            .distinct()
            .join(F.broadcast(docs), "doc_id")
        ),
    )
    sizes = hs.groupBy("doc_id").agg(F.count(F.lit(1)).alias("sz"))
    a = hs.select(F.col("doc_id").alias("doc_a"), "sh")
    b = hs.select(F.col("doc_id").alias("doc_b"), "sh")
    nonzero = (
        a.join(b, "sh")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("i"))
        .join(
            F.broadcast(sizes.select(F.col("doc_id").alias("doc_a"),
                                     F.col("sz").alias("sza"))), "doc_a")
        .join(
            F.broadcast(sizes.select(F.col("doc_id").alias("doc_b"),
                                     F.col("sz").alias("szb"))), "doc_b")
        .withColumn("u", F.col("sza") + F.col("szb") - F.col("i"))
    )
    cands = shared_persist(
        spark,
        ("scurve_cands", sf_dir),
        lambda: (
            dedup_minhash_lsh_pairs(spark, sf_dir)
            .join(F.broadcast(docs.select(F.col("doc_id").alias("doc_a"))), "doc_a")
            .join(F.broadcast(docs.select(F.col("doc_id").alias("doc_b"))), "doc_b")
            .withColumn("cand", F.lit(1))
        ),
    )
    bucket = F.least(F.lit(9), F.floor(10 * F.col("i") / F.col("u"))).cast("int")
    flagged = nonzero.join(cands, ["doc_a", "doc_b"], "left").select(
        bucket.alias("bucket"), F.coalesce("cand", F.lit(0)).alias("cand")
    )
    # bucket-count relation is ≤11 rows but its lineage is the whole
    # audit: truncate it so the totals/zero-row derivations below read
    # the materialized rows instead of re-running the pipeline.
    # Session-memoized (r14 opt): the eager checkpoint ran the full
    # quadratic ground-truth join during DataFrame CONSTRUCTION on
    # every call — ~1.5 s per warm call for rows the session already
    # held (cachemgr releases the blocks at clear_caches).
    per_bucket = shared_value(
        spark,
        ("scurve_per_bucket", sf_dir),
        lambda: flagged.groupBy("bucket").agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.sum("cand").alias("n_candidates"),
        ).localCheckpoint(eager=True),
    )
    n_docs = docs.agg(F.count(F.lit(1)).alias("n"))
    totals = per_bucket.agg(
        F.coalesce(F.sum("n_pairs"), F.lit(0)).alias("nz"),
        F.coalesce(F.sum("n_candidates"), F.lit(0)).alias("cand_nz"),
    )
    cand_all = cands.agg(F.count(F.lit(1)).alias("cand_all"))
    zero_row = (
        n_docs.crossJoin(totals)
        .crossJoin(cand_all)
        .select(
            F.lit(-1).cast("int").alias("bucket"),
            (F.col("n") * (F.col("n") - 1) / 2 - F.col("nz"))
            .cast("bigint")
            .alias("n_pairs"),
            (F.col("cand_all") - F.col("cand_nz")).cast("bigint").alias("n_candidates"),
        )
    )
    # pow() is not correctly-rounded identically across engines;
    # integer exponents via LEFT-ASSOCIATED multiplication are
    r_rows, n_bands = N_PERM // BANDS, BANDS
    s_mid = (F.col("bucket") + 0.5) / 10
    s_r = s_mid
    for _ in range(r_rows - 1):
        s_r = s_r * s_mid
    base = 1 - s_r
    miss = base
    for _ in range(n_bands - 1):
        miss = miss * base
    theo = F.when(
        F.col("bucket") >= 0, F.floor((1 - miss) * 10000) / 10000
    ).otherwise(F.lit(0.0))
    rate = F.when(
        F.col("n_pairs") > 0,
        F.floor(F.col("n_candidates") * 10000 / F.col("n_pairs")) / 10000,
    ).otherwise(F.lit(0.0))
    return (
        per_bucket.unionByName(zero_row)
        .select(
            "bucket",
            "n_pairs",
            "n_candidates",
            rate.alias("cand_rate"),
            theo.alias("theo_rate"),
        )
        .orderBy("bucket")
    )


def graph_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle count + local clustering coefficient over the
    near-duplicate similarity graph (same LSH-pair edge list PageRank
    and connected components use): a node in many triangles sits inside
    a tight near-dup CLIQUE (template/boilerplate families), while a
    high-degree node with no triangles is a hub joining unrelated docs
    — the distinction cluster-size alone can't make.

    Enumeration uses the canonical oriented form: every edge is kept
    once as ``a < b`` and triangles are closed as
    ``(a<b) ⋈ (b<c) ⋈ (a<c)``, so each triangle is produced exactly
    once — no /6 correction, no duplicate elimination.

    DEGREE CAP (the graph analogue of the Jaccard DF cap): nodes whose
    raw degree exceeds ``TRI_DEG_CAP`` are excluded and the census runs
    on the induced subgraph (degrees recomputed within it). A
    boilerplate mega-family is a near-CLIQUE, and a k-clique contains
    k³/6 triangles — enumeration is Ω(#triangles), so no algorithm
    (including degree-ordered orientation) makes an uncapped census
    tractable: the round-8 sf1 decade-up measured **40.8×** superlinear
    on the planted 5%%-hot-sentence clique before this cap. Hub nodes
    carry no per-triangle information anyway — their neighborhoods are
    the degenerate everything-matches case the cluster-assign /
    keep-best pipeline already handles wholesale.

    Scale shape: one degree aggregate, two key joins to induce the
    capped subgraph, then the wedge join — whose intermediate is now
    bounded by ``TRI_DEG_CAP · |E|`` regardless of skew; the corpus
    text is never touched."""
    from generic_data_ingestor_framework_spark.cachemgr import shared_persist

    def _capped_edges() -> DataFrame:
        pairs = dedup_minhash_lsh_pairs(spark, sf_dir)
        e0 = pairs.select(F.col("doc_a").alias("a"), F.col("doc_b").alias("b"))
        deg0 = (
            e0.select(F.col("a").alias("doc_id"))
            .unionAll(e0.select(F.col("b").alias("doc_id")))
            .groupBy("doc_id")
            .agg(F.count(F.lit(1)).alias("d0"))
        )
        keep = deg0.filter(F.col("d0") <= TRI_DEG_CAP).select("doc_id")
        return (
            e0.join(keep.select(F.col("doc_id").alias("a")), "a")
            .join(keep.select(F.col("doc_id").alias("b")), "b")
            .select("a", "b")
        )

    # referenced five times below (three wedge sides + both degree
    # unions): checkpoint the induced edge list once per session —
    # persist() kept the full LSH lineage in the logical plan, so each
    # of the five references re-embedded (and Catalyst re-optimized)
    # the whole pair-generation subtree per call; the checkpoint is the
    # same executor storage with a truncated plan (r14 opt)
    from generic_data_ingestor_framework_spark.cachemgr import shared_value

    e = shared_value(
        spark,
        ("tri_capped_edges", sf_dir),
        lambda: _capped_edges().localCheckpoint(eager=True),
    )
    x, y, z = e.alias("x"), e.alias("y"), e.alias("z")
    tri = (
        x.join(y, F.col("x.b") == F.col("y.a"))
        .join(z, (F.col("x.a") == F.col("z.a")) & (F.col("y.b") == F.col("z.b")))
        .select(
            F.col("x.a").alias("ta"), F.col("x.b").alias("tb"), F.col("y.b").alias("tc")
        )
    )
    part = (
        tri.select(F.explode(F.array("ta", "tb", "tc")).alias("doc_id"))
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_triangles"))
    )
    deg = (
        e.select(F.col("a").alias("doc_id"))
        .unionAll(e.select(F.col("b").alias("doc_id")))
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("degree"))
    )
    return (
        part.join(deg, "doc_id")
        .select(
            "doc_id",
            "degree",
            "n_triangles",
            F.round(
                2.0 * F.col("n_triangles") / (F.col("degree") * (F.col("degree") - 1)),
                6,
            ).alias("clustering_coeff"),
        )
        .orderBy("doc_id")
    )


QUERIES = {
    "dedup_exact": dedup_exact,
    "pagerank_doc_graph": pagerank_doc_graph,
    "graph_triangle_count": graph_triangle_count,
    "dedup_minhash_accuracy": dedup_minhash_accuracy,
    "lsh_scurve_audit": lsh_scurve_audit,
    "dedup_cluster_assign": dedup_cluster_assign,
    "dedup_exact_by_key": dedup_exact_by_key,
    "dedup_minhash_sig": dedup_minhash_sig,
    "dedup_minhash_sig_wide": dedup_minhash_sig_wide,
    "dedup_minhash_lsh_pairs": dedup_minhash_lsh_pairs,
    "dedup_minhash_lsh_pairs_wide": dedup_minhash_lsh_pairs_wide,
    "dedup_ngram_jaccard": dedup_ngram_jaccard,
    "dedup_simhash": dedup_simhash,
    "dedup_keep_corpus": dedup_keep_corpus,
    "dedup_incremental": dedup_incremental,
    "dedup_incremental_near": dedup_incremental_near,
    "band_index_crawl": band_index_crawl,
    "band_index_recrawl": band_index_recrawl,
    "band_index_pressure": band_index_pressure,
}

def _sig_cte(n_perm: int) -> str:
    """DuckDB twin of ``_minhash_sig_df`` at any width — generated from
    the SAME ``minhash_coeffs`` family, so the two engines cannot
    drift on the coefficient tables."""
    a, b = minhash_coeffs(n_perm)
    mins = ",\n         ".join(
        f"CAST(min(({a[j]} * h + {b[j]}) % {MOD}) AS BIGINT) AS mh{j}"
        for j in range(n_perm)
    )
    return f"""
hashed AS (
  SELECT doc_id, {_HASH_SQL.format(c='shingle')} AS h FROM sh
),
sig AS (
  SELECT doc_id,
         {mins}
  FROM hashed GROUP BY doc_id
)
"""


def _banded_union_sql(n_perm: int, bands: int) -> str:
    """DuckDB twin of ``_banded_df``'s band projection (no bucket)."""
    rpb = n_perm // bands
    return "\n          UNION ALL ".join(
        "SELECT doc_id, {i} AS band_idx, concat_ws('_', {cols}) AS band_sig FROM sig".format(
            i=i, cols=", ".join(f"mh{rpb * i + r}" for r in range(rpb))
        )
        for i in range(bands)
    )


_SIG_CTE = _sig_cte(N_PERM)


def _sig_cte_tagged(n_perm: int) -> str:
    """``_sig_cte`` over a custom tagged doc set: reads ``shv``
    (doc_id, is_batch, shingle) instead of the fixed ``sh`` CTE —
    used by oracles that rebuild bands over modified/re-keyed text
    (the recrawl member)."""
    a, b = minhash_coeffs(n_perm)
    mins = ",\n         ".join(
        f"CAST(min(({a[j]} * hsh + {b[j]}) % {MOD}) AS BIGINT) AS mh{j}"
        for j in range(n_perm)
    )
    return f"""
hashedv AS (
  SELECT doc_id, is_batch, {_HASH_SQL.format(c='shingle')} AS hsh FROM shv
),
sigv AS (
  SELECT doc_id, is_batch,
         {mins}
  FROM hashedv GROUP BY doc_id, is_batch
)
"""


def _banded_union_tagged(n_perm: int, bands: int) -> str:
    rpb = n_perm // bands
    return "\n          UNION ALL ".join(
        "SELECT doc_id, is_batch, {i} AS band_idx, concat_ws('_', {cols}) AS band_sig FROM sigv".format(
            i=i, cols=", ".join(f"mh{rpb * i + r}" for r in range(rpb))
        )
        for i in range(bands)
    )


def _cc_labels_cte(rounds: int) -> tuple[str, str]:
    """Connected components as an UNROLLED min-label-propagation +
    pointer-jumping CTE chain (the engine's own algorithm,
    ``connected_components``) — replaces the r8 ``WITH RECURSIVE
    reach(src, dst)`` transitive closure, which materializes |C|² rows
    per component and made the oracle effectively non-terminating on
    the sf1 planted near-clique (~2,500 docs → 6M+ reach rows joined
    against a 6M-edge list every iteration). Each unrolled round is
    LINEAR in |edges|: a neighbor-min aggregate then one pointer jump
    (lbl := lbl(lbl)), so label distance roughly doubles per round.
    ``rounds`` must cover the component diameter after jumping;
    equality with the engine's exact fixpoint is what the oracle check
    itself validates at every SF, so an insufficient depth shows up as
    a red row, never silently."""
    parts = ["l0 AS MATERIALIZED (SELECT doc_id AS node, doc_id AS lbl FROM documents)"]
    prev = "l0"
    for i in range(1, rounds + 1):
        parts.append(
            f"""p{i} AS MATERIALIZED (
          SELECT node, min(lbl) AS lbl FROM (
            SELECT node, lbl FROM {prev}
            UNION ALL
            SELECT e.a AS node, l.lbl FROM edges e JOIN {prev} l ON l.node = e.b
          ) GROUP BY node
        )"""
        )
        parts.append(
            f"l{i} AS MATERIALIZED (SELECT c.node, m.lbl FROM p{i} c JOIN p{i} m ON c.lbl = m.node)"
        )
        prev = f"l{i}"
    return ",\n        ".join(parts), prev


_CC_EDGES_CTE = """banded AS MATERIALIZED (
          SELECT doc_id, 0 AS band_idx, concat_ws('_', mh0, mh1) AS band_sig FROM sig
          UNION ALL SELECT doc_id, 1, concat_ws('_', mh2, mh3) FROM sig
          UNION ALL SELECT doc_id, 2, concat_ws('_', mh4, mh5) FROM sig
          UNION ALL SELECT doc_id, 3, concat_ws('_', mh6, mh7) FROM sig
        ),
        pairs AS MATERIALIZED (
          SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
          FROM banded a JOIN banded b
            ON a.band_idx = b.band_idx AND a.band_sig = b.band_sig
           AND a.doc_id < b.doc_id
        ),
        edges AS MATERIALIZED (
          SELECT doc_a AS a, doc_b AS b FROM pairs
          UNION ALL SELECT doc_b, doc_a FROM pairs
        )"""

_CC_LABELS_CTE, _CC_FINAL = _cc_labels_cte(rounds=8)


def _pagerank_oracle() -> str:
    """The power-iteration trajectory unrolled into CTEs; reuses the
    LSH-pairs oracle verbatim as the edge source so the two members can
    never disagree about the graph."""
    iters = []
    for k in range(1, PR_ITERS + 1):
        iters.append(f"""p{k} AS (
          SELECT d.doc_id AS v,
                 round(0.15 / (SELECT n FROM n_nodes)
                       + {PR_DAMP} * (COALESCE(c.si, 0) / {float(PR_SCALE)}),
                       {PR_ROUND}) AS p
          FROM documents d LEFT JOIN (
            SELECT e.v AS v,
                   sum(CAST(round(p.p * {PR_SCALE} / g.deg) AS BIGINT)) AS si
            FROM edges e JOIN p{k - 1} p ON p.v = e.u JOIN deg g ON g.u = e.u
            GROUP BY e.v) c ON c.v = d.doc_id
        )""")
    chain = ",\n        ".join(iters)
    return f"""
        WITH n_nodes AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents),
        pairs AS MATERIALIZED ({{lsh}}),
        edges AS (
          SELECT doc_a AS u, doc_b AS v FROM pairs
          UNION ALL
          SELECT doc_b AS u, doc_a AS v FROM pairs
        ),
        deg AS (SELECT u, CAST(count(*) AS BIGINT) AS deg FROM edges GROUP BY u),
        p0 AS (
          SELECT doc_id AS v, 1.0 / (SELECT n FROM n_nodes) AS p FROM documents
        ),
        {chain}
        SELECT v AS doc_id, round(p, 6) AS pagerank FROM p{PR_ITERS}
    """


ORACLES = {
    "dedup_incremental_near": f"""
        WITH {_SHINGLES_CTE}, {_SIG_CTE},
        banded AS (
          SELECT doc_id,
                 CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 2
                   AS bucket,
                 band_idx, band_sig
          FROM (
            SELECT doc_id, 0 AS band_idx, concat_ws('_', mh0, mh1) AS band_sig FROM sig
            UNION ALL SELECT doc_id, 1, concat_ws('_', mh2, mh3) FROM sig
            UNION ALL SELECT doc_id, 2, concat_ws('_', mh4, mh5) FROM sig
            UNION ALL SELECT doc_id, 3, concat_ws('_', mh6, mh7) FROM sig
          )
        ),
        corpus AS (SELECT DISTINCT band_idx, band_sig FROM banded WHERE bucket = 0),
        batch AS (SELECT doc_id, band_idx, band_sig FROM banded WHERE bucket = 1),
        hit AS (
          SELECT DISTINCT doc_id FROM batch b
          WHERE EXISTS (SELECT 1 FROM corpus c
                        WHERE c.band_idx = b.band_idx AND c.band_sig = b.band_sig)
        ),
        loser AS (
          SELECT DISTINCT doc_id FROM (
            SELECT doc_id,
                   row_number() OVER (PARTITION BY band_idx, band_sig
                                      ORDER BY doc_id) AS rn
            FROM batch) WHERE rn > 1
        )
        SELECT d.doc_id, d.lang FROM documents d
        WHERE d.doc_id IN (SELECT doc_id FROM batch)
          AND d.doc_id NOT IN (SELECT doc_id FROM hit UNION SELECT doc_id FROM loser)
    """,
    "dedup_incremental": """
        WITH b AS (
          SELECT doc_id, lang, md5(text) AS h,
                 CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 2
                   AS bucket
          FROM documents
        ),
        corpus AS (SELECT h FROM b WHERE bucket = 0),
        nk AS (
          SELECT doc_id, lang, h FROM b
          WHERE bucket = 1
            AND NOT EXISTS (SELECT 1 FROM corpus c WHERE c.h = b.h)
        )
        SELECT doc_id, lang FROM (
          SELECT doc_id, lang,
                 row_number() OVER (PARTITION BY h ORDER BY doc_id) AS rn
          FROM nk) WHERE rn = 1
    """,
    "dedup_keep_corpus": f"""
        WITH {_SHINGLES_CTE}, {_SIG_CTE},
        {_CC_EDGES_CTE},
        {_CC_LABELS_CTE}
        SELECT d.doc_id, d.lang, d.source, d.n_chars
        FROM documents d JOIN {_CC_FINAL} l
          ON d.doc_id = l.node AND l.node = l.lbl
    """,
    "dedup_cluster_assign": f"""
        WITH {_SHINGLES_CTE}, {_SIG_CTE},
        {_CC_EDGES_CTE},
        {_CC_LABELS_CTE}
        SELECT node AS doc_id, lbl AS cluster_id,
               (node = lbl) AS is_keeper
        FROM {_CC_FINAL}
    """,
    "dedup_exact": """
        SELECT md5(text) AS content_hash,
               min(doc_id) AS keep_id, count(*) AS n_copies
        FROM documents GROUP BY md5(text)
    """,
    "dedup_exact_by_key": """
        SELECT lang, source, min(doc_id) AS keep_id, count(*) AS n_in_group
        FROM documents GROUP BY lang, source
    """,
    "dedup_minhash_sig": f"""
        WITH {_SHINGLES_CTE}, {_SIG_CTE}
        SELECT * FROM sig
    """,
    "dedup_minhash_sig_wide": f"""
        WITH {_SHINGLES_CTE}, {_sig_cte(16)}
        SELECT * FROM sig
    """,
    "dedup_minhash_lsh_pairs_wide": f"""
        WITH {_SHINGLES_CTE}, {_sig_cte(16)},
        banded AS (
          {_banded_union_sql(16, 8)}
        )
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM banded a JOIN banded b
          ON a.band_idx = b.band_idx AND a.band_sig = b.band_sig
         AND a.doc_id < b.doc_id
    """,
    "dedup_minhash_lsh_pairs": f"""
        WITH {_SHINGLES_CTE}, {_SIG_CTE},
        banded AS (
          SELECT doc_id, 0 AS band_idx, concat_ws('_', mh0, mh1) AS band_sig FROM sig
          UNION ALL
          SELECT doc_id, 1, concat_ws('_', mh2, mh3) FROM sig
          UNION ALL
          SELECT doc_id, 2, concat_ws('_', mh4, mh5) FROM sig
          UNION ALL
          SELECT doc_id, 3, concat_ws('_', mh6, mh7) FROM sig
        )
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM banded a JOIN banded b
          ON a.band_idx = b.band_idx AND a.band_sig = b.band_sig
         AND a.doc_id < b.doc_id
    """,
    # hashed-shingle space: the SAME md5-based 32-bit hash as the Spark
    # side, distinct per doc, so the engines agree even on collisions
    "dedup_ngram_jaccard": f"""
        WITH {_SHINGLES_CTE},
        hsh AS (
          SELECT DISTINCT doc_id, {_HASH_SQL.format(c='shingle')} AS sh FROM sh
        ),
        capped AS (
          SELECT doc_id, sh FROM hsh
          WHERE sh NOT IN (
            SELECT sh FROM hsh GROUP BY sh HAVING count(*) > {DF_CAP}
          )
        ),
        sizes AS (SELECT doc_id, count(*) AS n_sh FROM capped GROUP BY doc_id),
        inter AS (
          SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_inter
          FROM capped a JOIN capped b ON a.sh = b.sh AND a.doc_id < b.doc_id
          GROUP BY a.doc_id, b.doc_id
        )
        SELECT doc_a, doc_b, n_inter,
               round(n_inter / (sa.n_sh + sb.n_sh - n_inter), 6) AS jaccard
        FROM inter
        JOIN sizes sa ON sa.doc_id = doc_a
        JOIN sizes sb ON sb.doc_id = doc_b
        WHERE round(n_inter / (sa.n_sh + sb.n_sh - n_inter), 6) >= {JACCARD_TAU}
    """,
    "dedup_simhash": f"""
        WITH tok AS (
          SELECT doc_id, string_split_regex(lower(text), '\\s+') AS ts FROM documents
        ),
        toks AS (
          SELECT doc_id, {_HASH_SQL.format(c='tok')} AS h
          FROM (SELECT doc_id, unnest(list_distinct(ts)) AS tok FROM tok)
        ),
        contrib AS (
          SELECT doc_id, b,
                 sum(CASE WHEN (h >> b) & 1 = 1 THEN 1 ELSE -1 END) AS s
          FROM toks, range(0, 32) t(b)
          GROUP BY doc_id, b
        )
        SELECT doc_id,
               CAST(sum(CASE WHEN s > 0 THEN (CAST(1 AS BIGINT) << CAST(b AS INT)) ELSE 0 END) AS BIGINT) AS simhash
        FROM contrib GROUP BY doc_id
    """,
}

# PageRank oracle reuses the LSH-pairs SQL verbatim as the edge source
ORACLES["pagerank_doc_graph"] = _pagerank_oracle().format(
    lsh=ORACLES["dedup_minhash_lsh_pairs"]
)

# MinHash estimator audit: nests the LSH-pairs oracle, re-derives the
# signature and shingle CTEs at top level, and compares estimate vs exact
_MH_MATCHES = " + ".join(
    f"(CASE WHEN a.mh{j} = b.mh{j} THEN 1 ELSE 0 END)" for j in range(N_PERM)
)
# Band-index crawl oracle: the two-pass save→probe→append→probe loop
# replayed in SQL — run 0 seeds the distinct-band history, run 1's
# admissions (no band in history, band not claimed by a smaller-id
# run-1 doc) extend it, run 2 probes the grown history.
ORACLES["band_index_crawl"] = f"""
        WITH {_SHINGLES_CTE}, {_SIG_CTE},
        banded AS MATERIALIZED (
          SELECT doc_id,
                 {_HASH_SQL.format(c="CAST(doc_id AS VARCHAR)")} % 3 AS run,
                 band_idx, band_sig
          FROM (
            {_banded_union_sql(N_PERM, BANDS)}
          )
        ),
        hist0 AS (SELECT DISTINCT band_idx, band_sig FROM banded WHERE run = 0),
        b1 AS (SELECT doc_id, band_idx, band_sig FROM banded WHERE run = 1),
        rej1 AS (
          SELECT DISTINCT doc_id FROM b1
          WHERE EXISTS (SELECT 1 FROM hist0 h
                        WHERE h.band_idx = b1.band_idx AND h.band_sig = b1.band_sig)
          UNION
          SELECT doc_id FROM (
            SELECT doc_id, row_number() OVER (PARTITION BY band_idx, band_sig
                                              ORDER BY doc_id) AS rn
            FROM b1) WHERE rn > 1
        ),
        adm1 AS (
          SELECT DISTINCT doc_id FROM b1
          WHERE doc_id NOT IN (SELECT doc_id FROM rej1)
        ),
        hist1 AS (
          SELECT band_idx, band_sig FROM hist0
          UNION
          SELECT band_idx, band_sig FROM b1 JOIN adm1 USING (doc_id)
        ),
        b2 AS (SELECT doc_id, band_idx, band_sig FROM banded WHERE run = 2),
        rej2 AS (
          SELECT DISTINCT doc_id FROM b2
          WHERE EXISTS (SELECT 1 FROM hist1 h
                        WHERE h.band_idx = b2.band_idx AND h.band_sig = b2.band_sig)
          UNION
          SELECT doc_id FROM (
            SELECT doc_id, row_number() OVER (PARTITION BY band_idx, band_sig
                                              ORDER BY doc_id) AS rn
            FROM b2) WHERE rn > 1
        ),
        adm2 AS (
          SELECT DISTINCT doc_id FROM b2
          WHERE doc_id NOT IN (SELECT doc_id FROM rej2)
        )
        SELECT d.doc_id, d.lang, CAST(1 AS INT) AS run
        FROM documents d JOIN adm1 USING (doc_id)
        UNION ALL
        SELECT d.doc_id, d.lang, CAST(2 AS INT) AS run
        FROM documents d JOIN adm2 USING (doc_id)
"""

# Versioned-index recrawl oracle: recompute the SURVIVING band set from
# scratch — run-0 docs minus deleted (hash%7==0), with changed docs
# (hash%5==0) carrying their re-crawled reversed-word text — then admit
# the probe batch (run-1 docs + old-content copies re-keyed
# past max(doc_id)) against it with the standard rules. Phases 1
# (effective view) and 2 (post-compaction raw base) must be identical,
# so the oracle emits the admitted set twice.
_RECRAWL_MOD = "array_to_string(list_reverse(string_split_regex(text, '\\s+')), ' ')"

ORACLES["band_index_recrawl"] = f"""
        WITH hd AS (
          SELECT doc_id, lang, text,
                 {_HASH_SQL.format(c="CAST(doc_id AS VARCHAR)")} AS hv
          FROM documents
        ),
        docs_v AS (
          SELECT doc_id, text, 0 AS is_batch FROM hd
          WHERE hv % 3 = 0 AND hv % 5 <> 0 AND hv % 7 <> 0
          UNION ALL
          SELECT doc_id, {_RECRAWL_MOD}, 0 FROM hd
          WHERE hv % 3 = 0 AND hv % 5 = 0 AND hv % 7 <> 0
          UNION ALL
          SELECT doc_id, text, 1 FROM hd WHERE hv % 3 = 1
          UNION ALL
          SELECT doc_id + {RECRAWL_OFFSET_SQL}, text, 1 FROM hd
          WHERE hv % 3 = 0 AND hv % 5 = 0
        ),
        tokv AS (
          SELECT doc_id, is_batch,
                 string_split_regex(lower(text), '\\s+') AS ts
          FROM docs_v
        ),
        shv AS (
          SELECT doc_id, is_batch, unnest(list_distinct(list_transform(
                   range(1, greatest(len(ts) - 1, 1)),
                   i -> concat_ws(' ', ts[i], ts[i + 1], ts[i + 2])))) AS shingle
          FROM tokv
        ),
        {_sig_cte_tagged(N_PERM)},
        bandedv AS (
          {_banded_union_tagged(N_PERM, BANDS)}
        ),
        hist AS (SELECT DISTINCT band_idx, band_sig FROM bandedv WHERE is_batch = 0),
        bb AS (SELECT doc_id, band_idx, band_sig FROM bandedv WHERE is_batch = 1),
        rej AS (
          SELECT DISTINCT doc_id FROM bb
          WHERE EXISTS (SELECT 1 FROM hist h
                        WHERE h.band_idx = bb.band_idx AND h.band_sig = bb.band_sig)
          UNION
          SELECT doc_id FROM (
            SELECT doc_id, row_number() OVER (PARTITION BY band_idx, band_sig
                                              ORDER BY doc_id) AS rn
            FROM bb) WHERE rn > 1
        ),
        adm AS (
          SELECT DISTINCT doc_id FROM bb
          WHERE doc_id NOT IN (SELECT doc_id FROM rej)
        ),
        lmap AS (
          SELECT doc_id, lang FROM hd WHERE hv % 3 = 1
          UNION ALL
          SELECT doc_id + {RECRAWL_OFFSET_SQL}, lang FROM hd
          WHERE hv % 3 = 0 AND hv % 5 = 0
        )
        SELECT CAST(p.phase AS INT) AS phase, a.doc_id, l.lang
        FROM adm a JOIN lmap l USING (doc_id)
        CROSS JOIN (VALUES (1), (2)) AS p(phase)
"""

# Pressure-gate oracle: the cohort arithmetic is pure hashing, and a
# doc carries bands iff it has >=1 shingle (>=3 whitespace tokens — the
# same length rule the recrawl oracle's shingle CTE encodes). Stage 2
# replays compaction's survivor set: tombstoned docs (hash%7==0) die,
# changed docs keep bands (word reversal preserves token count), docs
# unshingleable before stay unshingleable after.
ORACLES["band_index_pressure"] = f"""
        WITH hd AS (
          SELECT doc_id, text,
                 {_HASH_SQL.format(c="CAST(doc_id AS VARCHAR)")} AS hv
          FROM documents
        ),
        run0 AS (SELECT * FROM hd WHERE hv % 3 = 0),
        banded AS (
          SELECT doc_id, hv FROM run0
          WHERE len(string_split_regex(lower(text), '\\s+')) >= 3
        ),
        touched AS (
          SELECT doc_id FROM run0 WHERE hv % 5 = 0 OR hv % 7 = 0
        ),
        n AS (
          SELECT (SELECT count(*) FROM banded) AS base1,
                 (SELECT count(*) FROM touched) AS delta1,
                 (SELECT count(*) FROM banded WHERE hv % 7 <> 0) AS base2
        )
        SELECT CAST(1 AS INT) AS stage, CAST(base1 AS BIGINT) AS base_docs,
               CAST(delta1 AS BIGINT) AS delta_docs,
               CAST((delta1 * 10000) // base1 AS BIGINT) AS pressure_bp,
               FALSE AS compacted
        FROM n
        UNION ALL
        SELECT CAST(2 AS INT), CAST(base2 AS BIGINT), CAST(0 AS BIGINT),
               CAST(0 AS BIGINT), TRUE
        FROM n
"""

ORACLES["dedup_minhash_accuracy"] = f"""
        WITH pairs0 AS ({ORACLES["dedup_minhash_lsh_pairs"]}),
        pairs AS (
          SELECT doc_a, doc_b FROM pairs0
          WHERE {_HASH_SQL.format(c="CAST(doc_a AS VARCHAR) || '_' || CAST(doc_b AS VARCHAR)")}
                % {_MH_ACC_MOD_SQL} = 0
        ),
        {_SHINGLES_CTE},
        {_SIG_CTE},
        hs AS (SELECT DISTINCT doc_id, h FROM hashed),
        cand AS (
          SELECT doc_a AS doc_id FROM pairs
          UNION SELECT doc_b FROM pairs
        ),
        hc AS (SELECT hs.doc_id, hs.h FROM hs JOIN cand USING (doc_id)),
        sizes AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS sz FROM hc GROUP BY doc_id),
        inter AS (
          SELECT p.doc_a, p.doc_b, CAST(count(*) AS BIGINT) AS i
          FROM pairs p
          JOIN hc x ON x.doc_id = p.doc_a
          JOIN hc y ON y.doc_id = p.doc_b AND y.h = x.h
          GROUP BY p.doc_a, p.doc_b
        ),
        m AS (
          SELECT p.doc_a, p.doc_b, CAST({{mm}} AS BIGINT) AS m
          FROM pairs p
          JOIN sig a ON a.doc_id = p.doc_a
          JOIN sig b ON b.doc_id = p.doc_b
        )
        SELECT m.doc_a, m.doc_b,
               floor(m / {float(N_PERM)} * 10000) / 10000 AS est_jaccard,
               floor(COALESCE(i, 0) / (sa.sz + sb.sz - COALESCE(i, 0)) * 10000)
                 / 10000 AS exact_jaccard,
               floor(abs(m / {float(N_PERM)}
                     - COALESCE(i, 0) / (sa.sz + sb.sz - COALESCE(i, 0))) * 10000)
                 / 10000 AS abs_err
        FROM m
        LEFT JOIN inter USING (doc_a, doc_b)
        JOIN sizes sa ON sa.doc_id = m.doc_a
        JOIN sizes sb ON sb.doc_id = m.doc_b
        ORDER BY m.doc_a, m.doc_b
""".replace("{mm}", _MH_MATCHES)

# S-curve oracle: same sample predicate, same enumerated nonzero pairs,
# same arithmetic zero-mass row, same left-associated banding theory
_R_ROWS, _N_BANDS = N_PERM // BANDS, BANDS
_S_MID = "((bucket + 0.5) / 10)"
_S_R = " * ".join([_S_MID] * _R_ROWS)
_MISS = " * ".join([f"(1 - {_S_R})"] * _N_BANDS)
ORACLES["lsh_scurve_audit"] = f"""
        WITH docs AS MATERIALIZED (
          SELECT doc_id FROM documents
          WHERE {_HASH_SQL.format(c="'s' || CAST(doc_id AS VARCHAR)")}
                % {SCURVE_DOC_MOD} = 0
        ),
        {_SHINGLES_CTE},
        hsd AS MATERIALIZED (
          SELECT DISTINCT s.doc_id, {_HASH_SQL.format(c='shingle')} AS h
          FROM sh s JOIN docs USING (doc_id)
        ),
        sizes AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS sz FROM hsd GROUP BY doc_id),
        nonzero AS (
          SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, CAST(count(*) AS BIGINT) AS i
          FROM hsd a JOIN hsd b ON a.h = b.h AND a.doc_id < b.doc_id
          GROUP BY 1, 2
        ),
        nz AS (
          SELECT n.doc_a, n.doc_b, n.i, sa.sz + sb.sz - n.i AS u
          FROM nonzero n
          JOIN sizes sa ON sa.doc_id = n.doc_a
          JOIN sizes sb ON sb.doc_id = n.doc_b
        ),
        cand AS MATERIALIZED (
          SELECT p.doc_a, p.doc_b FROM ({ORACLES["dedup_minhash_lsh_pairs"]}) p
          JOIN docs da ON da.doc_id = p.doc_a
          JOIN docs db ON db.doc_id = p.doc_b
        ),
        flagged AS MATERIALIZED (
          SELECT least(9, CAST(floor(10 * i / u) AS INT)) AS bucket,
                 CASE WHEN c.doc_a IS NOT NULL THEN 1 ELSE 0 END AS cand
          FROM nz LEFT JOIN cand c USING (doc_a, doc_b)
        ),
        per AS (
          SELECT bucket, CAST(count(*) AS BIGINT) AS n_pairs,
                 CAST(sum(cand) AS BIGINT) AS n_candidates
          FROM flagged GROUP BY bucket
        ),
        zero AS (
          SELECT CAST(-1 AS INT) AS bucket,
                 CAST((SELECT count(*) FROM docs)
                      * ((SELECT count(*) FROM docs) - 1) / 2
                      - (SELECT count(*) FROM flagged) AS BIGINT) AS n_pairs,
                 CAST((SELECT count(*) FROM cand)
                      - (SELECT COALESCE(sum(cand), 0) FROM flagged)
                      AS BIGINT) AS n_candidates
        ),
        allb AS (SELECT * FROM per UNION ALL SELECT * FROM zero)
        SELECT bucket, n_pairs, n_candidates,
               CASE WHEN n_pairs > 0
                    THEN floor(n_candidates * 10000 / n_pairs) / 10000
                    ELSE 0.0 END AS cand_rate,
               CASE WHEN bucket >= 0
                    THEN floor((1 - {_MISS}) * 10000) / 10000
                    ELSE 0.0 END AS theo_rate
        FROM allb ORDER BY bucket
"""

# Triangle oracle: same edge source, same oriented a<b / b<c / a<c closure
ORACLES["graph_triangle_count"] = f"""
        WITH pairs AS ({ORACLES["dedup_minhash_lsh_pairs"]}),
        e0 AS (SELECT doc_a AS a, doc_b AS b FROM pairs),
        deg0 AS (
          SELECT doc_id, count(*) AS d0 FROM (
            SELECT a AS doc_id FROM e0 UNION ALL SELECT b FROM e0)
          GROUP BY doc_id
        ),
        keep AS (SELECT doc_id FROM deg0 WHERE d0 <= {TRI_DEG_CAP}),
        e AS (
          SELECT a, b FROM e0
          JOIN keep ka ON ka.doc_id = e0.a
          JOIN keep kb ON kb.doc_id = e0.b
        ),
        tri AS (
          SELECT x.a AS ta, x.b AS tb, y.b AS tc
          FROM e x JOIN e y ON x.b = y.a
          JOIN e z ON z.a = x.a AND z.b = y.b
        ),
        part AS (
          SELECT doc_id, CAST(count(*) AS BIGINT) AS n_triangles
          FROM (SELECT unnest([ta, tb, tc]) AS doc_id FROM tri)
          GROUP BY doc_id
        ),
        deg AS (
          SELECT doc_id, CAST(count(*) AS BIGINT) AS degree FROM (
            SELECT a AS doc_id FROM e UNION ALL SELECT b FROM e)
          GROUP BY doc_id
        )
        SELECT doc_id, degree, n_triangles,
               round(2.0 * n_triangles / (degree * (degree - 1)), 6) AS clustering_coeff
        FROM part JOIN deg USING (doc_id)
        ORDER BY doc_id
"""
