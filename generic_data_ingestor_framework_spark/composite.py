"""Family-composite queries: fold many member queries into one gate row each.

The driver's correctness gate checks the first 50 ``queries()`` entries;
round 2 ended with 106 member queries, so most of the surface was
invisible in any single ``CORRECTNESS_rN.json``.  This module folds
near-duplicate members into *family composites*: one registered query
per capability family whose result is one row per member —
``(fam, n, checksum)`` — where ``checksum`` is an order-insensitive
fold of a portable per-row digest.  Any value change in any member
(any string/int/date/bool difference; any double difference ≥ 1e-4,
the canon's truncation grain — members already round their float
outputs at 2-6 dp as part of their own contracts) flips the md5-based
row digest and therefore the family checksum, at 1/Nth the registry
footprint.  Members additionally remain individually checkable at full
``repr()`` precision via ``tools/check_oracles.py --members``.

Cross-engine canonicalization (verified exact against DuckDB):
- strings / ints / bools / dates: plain ``CAST(x AS STRING)`` — textual
  forms agree between Spark and DuckDB for these types.
- doubles: ``FLOOR(x * 10000)`` as BIGINT.  Member queries already
  produce bit-identical doubles in both engines (they hash-match under
  ``repr()`` in the gate), and IEEE multiply/floor are deterministic,
  so the canon is engine-exact — no round-tie hazard (``round`` HALF_UP
  differs cross-engine at exact .xxx5 ties; ``floor`` cannot tie).
- timestamps: ``date_format(x, 'yyyy-MM-dd HH:mm:ss.SSSSSS')`` ≡
  DuckDB ``strftime(x, '%Y-%m-%d %H:%M:%S.%f')`` (UTC session tz).
- row digest: ``conv(substr(md5(row),1,8),16,10)`` ≡ DuckDB
  ``CAST('0x' || substr(md5(row),1,8) AS BIGINT)``; summed per block
  (32-bit terms, ≤~1e5 rows → no BIGINT overflow; DuckDB's HUGEINT sum
  is cast back to BIGINT).

The Spark side derives each member's column kinds from the live
DataFrame schema; the DuckDB side uses the generated static manifest in
``_composite_manifest.py`` (``tools/gen_manifest.py`` regenerates it;
``tests/test_composites.py`` asserts the two never drift).

Scale note (100 TB): a composite is a UNION ALL of per-member
single-row aggregates — each member keeps its own optimized plan
(pushdown, broadcast, partial agg) and the digest rides the member's
existing output; the fold adds one map-side projection + a 1-row
hash-aggregate per member, no new shuffle of member data.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from generic_data_ingestor_framework_spark import functions as fns
from generic_data_ingestor_framework_spark import llm, relational, streaming

_SEP = "\x01"   # unit separator between canon columns
_NULL = "\x02"  # NULL marker (distinct from empty string)

# Full member registry — every query keeps its public callable here even
# when it is registered with the driver only through a family composite.
MEMBER_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
MEMBER_ORACLES: dict[str, str] = {}
for _m in (relational, llm, streaming, fns):
    MEMBER_QUERIES.update(_m.QUERIES)
    MEMBER_ORACLES.update(_m.ORACLES)


# ---------------------------------------------------------------------------
# Portable canonicalization
# ---------------------------------------------------------------------------

_KIND_BY_DTYPE = {
    "string": "s",
    "bigint": "s",
    "int": "s",
    "smallint": "s",
    "tinyint": "s",
    "boolean": "s",
    "date": "s",
    "double": "d",
    "float": "d",
    "timestamp": "t",
    "timestamp_ntz": "t",
}


def kind_of(dtype: str) -> str:
    """Map a Spark simple dtype string to a canon kind (s/d/t).

    Unknown dtypes raise: extending the canon to a new type is a
    deliberate act (it must be verified cross-engine first).
    """
    if dtype.startswith("decimal"):
        return "s"
    return _KIND_BY_DTYPE[dtype]


def _spark_canon(c: str, kind: str):
    if kind == "d":
        return F.expr(
            f"CASE WHEN isnan(`{c}`) THEN 'nan'"
            f" WHEN `{c}` > 9e14 THEN 'inf'"
            f" WHEN `{c}` < -9e14 THEN '-inf'"
            f" ELSE CAST(CAST(FLOOR(`{c}` * 10000.0) AS BIGINT) AS STRING) END"
        )
    if kind == "t":
        return F.date_format(F.col(c), "yyyy-MM-dd HH:mm:ss.SSSSSS")
    return F.col(c).cast("string")


def _duck_canon(c: str, kind: str) -> str:
    q = f'"{c}"'
    if kind == "d":
        return (
            f"CASE WHEN isnan({q}) THEN 'nan'"
            f" WHEN {q} > 9e14 THEN 'inf'"
            f" WHEN {q} < -9e14 THEN '-inf'"
            f" ELSE CAST(CAST(FLOOR({q} * 10000.0) AS BIGINT) AS VARCHAR) END"
        )
    if kind == "t":
        return f"strftime({q}, '%Y-%m-%d %H:%M:%S.%f')"
    return f"CAST({q} AS VARCHAR)"


# Tiny-cardinality AUDIT members (≤ ~16 rows at any SF): their family
# composites embed the member's FULL canonical rows in a ``sample``
# column, so a red gate row names the diverging bucket instead of just
# flipping a checksum (r8 verdict: composite granularity made audit
# regressions expensive to localize).
SAMPLED_MEMBERS = {
    "lsh_scurve_audit", "ann_pq_recall", "ann_recall_report", "ann_probe_tradeoff",
    "ann_index_stats",
}
_SAMPLE_CAP = 1600  # chars; sampled members are ≤ ~16 short rows


def block_digest(df: DataFrame, tag: str, with_sample: bool = False, sampled: bool = False) -> DataFrame:
    """One-row digest of a member result: (fam, n, checksum[, sample]).

    ``with_sample`` adds the column (schema-uniform across the
    composite's union); ``sampled`` fills it with the sorted canonical
    rows joined by ';' (order-insensitive, capped) instead of ''."""
    cols = sorted(df.columns)
    dtypes = dict(df.dtypes)
    cc = F.concat_ws(
        _SEP, *[F.coalesce(_spark_canon(c, kind_of(dtypes[c])), F.lit(_NULL)) for c in cols]
    )
    h = F.conv(F.substring(F.md5(cc), 1, 8), 16, 10).cast("long")
    aggs = [
        F.count(F.lit(1)).alias("n"),
        F.coalesce(F.sum("_h"), F.lit(0)).cast("long").alias("checksum"),
    ]
    out_cols = [F.lit(tag).alias("fam"), F.col("n"), F.col("checksum")]
    if with_sample and sampled:
        aggs.append(
            F.substring(
                F.concat_ws(";", F.sort_array(F.collect_list("_cc"))), 1, _SAMPLE_CAP
            ).alias("sample")
        )
        out_cols.append(F.col("sample"))
    elif with_sample:
        out_cols.append(F.lit("").alias("sample"))
    return (
        df.select(cc.alias("_cc"), h.alias("_h"))
        .agg(*aggs)
        .select(*out_cols)
    )


def _oracle_block(
    member: str,
    sql: str,
    manifest: list[tuple[str, str]],
    with_sample: bool = False,
) -> str:
    parts = ", ".join(
        f"COALESCE({_duck_canon(c, k)}, chr(2))" for c, k in sorted(manifest)
    )
    sample = ""
    if with_sample and member in SAMPLED_MEMBERS:
        sample = (
            f",\n       SUBSTR(COALESCE(string_agg(cc, ';' ORDER BY cc), ''), 1, {_SAMPLE_CAP})"
            " AS sample"
        )
    elif with_sample:
        sample = ",\n       '' AS sample"
    return (
        f"SELECT '{member}' AS fam, COUNT(*) AS n,\n"
        f"       CAST(COALESCE(SUM(CAST('0x' || SUBSTR(md5(cc),1,8) AS BIGINT)), 0) AS BIGINT) AS checksum"
        f"{sample}\n"
        f"FROM (SELECT concat_ws(chr(1), {parts}) AS cc FROM ({sql}) _m) _h"
    )


# ---------------------------------------------------------------------------
# Family composition spec
# ---------------------------------------------------------------------------

COMPOSITES: dict[str, list[str]] = {
    # relational families (SURVEY §2.B)
    "tpch_shapes": [
        "q2_min_cost_supplier", "q3_shipping_priority", "q4_priority_exists",
        "q5_region_revenue", "q6_forecast_revenue", "q7_nation_trade_volume",
        "q8_market_share", "q9_product_profit", "q10_returned_revenue",
        "q11_important_stock", "q12_late_shipment_priority",
        "q13_order_count_distribution", "q14_promo_revenue_pct",
        "q15_top_supplier", "q16_supplier_cnt_distribution",
        "q17_small_quantity_revenue", "q18_large_volume_customers",
        "q19_disjunctive_predicates", "q20_supplier_part_chain",
        "q21_suppliers_kept_waiting", "q22_idle_customers",
    ],
    "scan_preview": [
        "preview_limit", "count_rows", "distinct_scan", "sort_limit_offset",
        "profile_customer",
    ],
    "filter_family": ["filter_predicates", "param_eq_filter"],
    "join_family": [
        "join_inner", "join_left_agg", "join_semi", "join_anti",
        "fuzzy_customer_pairs", "scd2_customer_history",
        "scd2_customer_multigen", "scd2_asof_lookup",
    ],
    "agg_family": [
        "agg_having_distinct", "group_concat_names", "stats_moments",
        "bool_bit_aggs",
    ],
    "multidim_agg": [
        "rollup_agg", "cube_agg", "grouping_sets_agg",
        "pivot_status_by_priority", "unpivot_part_measures",
    ],
    "window_family": [
        "window_rank", "window_frames", "window_navigation", "top_k_per_group",
    ],
    "set_ops": ["set_union", "set_intersect", "set_except"],
    "scalar_funcs": [
        "string_funcs", "math_funcs", "date_funcs", "json_funcs",
        "case_null_funcs", "regexp_funcs", "array_funcs", "explode_lateral",
    ],
    "subquery_family": [
        "subquery_cte", "correlated_subquery", "rcte_order_chain",
        "rcte_reachability",
    ],
    "approx_family": ["percentile_stats", "histogram_bins", "approx_sketches"],
    "ingest_parity": [
        "normalize_text_parity", "lineage_source_file", "md5_fingerprint",
        "union_all_missing_cols", "error_summary_topk",
    ],
    # llm families
    # minhash config sweep: the default-width signature plus the wide
    # (16-perm / 8-band) signature + LSH pairs — the gate row that
    # proves minhash_coeffs generalizes beyond the historical 8/4
    "dedup_minhash_sig": [
        "dedup_minhash_sig", "dedup_minhash_sig_wide",
        "dedup_minhash_lsh_pairs_wide", "dedup_minhash_accuracy",
        "lsh_scurve_audit", "band_index_crawl", "band_index_recrawl",
        "band_index_pressure",
    ],
    "embed_stats": [
        "embed_norms", "label_centroid_dims", "embed_quantize_int8",
        "dedup_semantic_clusters", "ann_quantized_rerank",
        "ann_pq_topk", "ann_pq_recall", "ann_ivf_pq_topk",
        "ann_ivf_persisted", "ann_pq_persisted",
        # ≤16-row audit members, SAMPLED (full canonical rows in the
        # composite's sample column — a red row names the diverging
        # bucket); folding recall/tradeoff here freed the top-level slot
        # the crawl-loop member uses (the gate compares that one
        # row-by-row).
        "ann_recall_report", "ann_probe_tradeoff", "ann_index_stats",
        "ann_index_recrawl", "ann_recall_after_append",
        # r14: the retrain policy over both health gauges, the ANN
        # side of the compaction-pressure contract (band twin:
        # band_index_pressure in dedup_minhash_sig), and the streaming
        # index maintainer served end-to-end
        "ann_retrain_decision", "ann_index_pressure",
        "stream_ann_index_maintain",
        # r14: the decision ACTED ON — retrain over the grown corpus,
        # recall measured before/after per query wave
        "ann_retrain_execute",
    ],
    "text_tokens": [
        "token_stats", "context_length_buckets", "corpus_mix_weights",
        "source_temperature_weights", "source_reputation",
    ],
    "text_quality": [
        "quality_score", "lang_id_heuristic", "char_entropy", "gopher_quality_flags",
        "doc_topgram_mass",
        "lm_unigram_score", "lm_bigram_score", "corpus_select_budget",
        "dedup_keep_best_quality",
    ],
    "doc_fingerprints": [
        "doc_fingerprint", "doc_rolling_hash", "dedup_segments_within_doc",
        "span_duplication_ratio", "pagerank_doc_graph",
        "remove_duplicated_spans", "graph_triangle_count",
    ],
    "term_stats": [
        "corpus_bigram_topk", "tfidf_top_terms", "tfidf_cosine_pairs", "bpe_train_merges",
        "bpe_train_merges_batched", "bpe_vocab_topk", "bpe_encode_docs", "bm25_topk",
        "retrieval_qlm_topk", "retrieval_rrf_fusion",
    ],
    "nb_family": ["nb_lang_predictions", "nb_lang_confusion", "nb_holdout_confusion",
                  "classifier_agreement_kappa"],
    "multimodal_family": [
        "multimodal_binary_meta", "multimodal_decode_features",
        "multimodal_frame_sample", "multimodal_resize_buckets",
        "multimodal_bmp_decode", "multimodal_wav_decode",
        "multimodal_bmp_resize", "multimodal_wav_frames",
        "multimodal_png_decode", "multimodal_jpeg_decode",
    ],
    "sampling_family": [
        "sample_hash_mod", "train_val_test_split", "stratified_sample_per_lang",
        "shard_export_assignment", "mix_resample_equalized",
        "quality_weighted_sample",
    ],
    "privacy_family": [
        "pseudonymize_users", "redact_pii",
        "pseudonymize_keyed_rotation", "k_anonymity_audit",
        "l_diversity_audit", "t_closeness_audit", "k_anonymize_generalize",
        "randomized_response_lang",
    ],
    # streaming families
    "event_windows": [
        "window_tumbling_hourly", "window_sliding_1h_30m", "events_multi_rollup",
        "stream_dedup_keys", "stream_interval_join_exact", "funnel_conversion",
        "events_rolling_zscore", "stream_rolling_zscore",
        "events_range_window_1h", "stream_dedup_near", "events_asof_tolerance_30m",
    ],
    "sessions_family": [
        "session_window_10m", "session_stats_per_user", "stream_session_windows",
        "user_activity_islands", "cohort_retention",
    ],
}

_COMPOSED = {m for members in COMPOSITES.values() for m in members}

# Registration order: one row per capability family, every row inside
# the driver's 50-entry window — no rotation needed.
REGISTER_ORDER = [
    # relational (13)
    "q1_pricing_summary",
    "tpch_shapes",
    "scan_preview",
    "filter_family",
    "join_family",
    "agg_family",
    "multidim_agg",
    "window_family",
    "set_ops",
    "scalar_funcs",
    "subquery_family",
    "approx_family",
    "ingest_parity",
    # dedup (10)
    "dedup_exact",
    "dedup_exact_by_key",
    "dedup_minhash_sig",
    "dedup_minhash_lsh_pairs",
    "dedup_ngram_jaccard",
    "dedup_simhash",
    "dedup_cluster_assign",
    "dedup_keep_corpus",
    "dedup_incremental",
    "dedup_incremental_near",
    # similarity / ANN (6; recall/tradeoff fold into embed_stats as
    # sampled members — their full rows still reach the gate via the
    # sample column)
    "ann_cosine_topk",
    "ann_lsh_bucketed",
    "ann_ivf_topk",
    "ann_index_crawl",
    "dedup_embedding_pairs",
    "embed_stats",
    # text analysis (5)
    "text_tokens",
    "text_quality",
    "doc_fingerprints",
    "term_stats",
    "cms_heavy_hitters",
    # curation (4)
    "decontaminate_against_benchmark",
    "pack_context_windows",
    "chunk_documents_overlap",
    "paragraph_dedup_corpus",
    # classification (1)
    "nb_family",
    # multimodal (1)
    "multimodal_family",
    # sampling / privacy (2)
    "sampling_family",
    "privacy_family",
    # streaming (6)
    "event_windows",
    "sessions_family",
    "events_dedup_earliest",
    "stream_tumbling_counts",
    "events_interval_join",
    "events_asof_join",
    # UDF surface (1)
    "udf_text_normalize",
]


def make_composite(name: str, members: list[str]) -> Callable[[SparkSession, str], DataFrame]:
    with_sample = any(m in SAMPLED_MEMBERS for m in members)

    def q(spark: SparkSession, sf_dir: str) -> DataFrame:
        parts = [
            block_digest(
                MEMBER_QUERIES[m](spark, sf_dir),
                m,
                with_sample=with_sample,
                sampled=m in SAMPLED_MEMBERS,
            )
            for m in members
        ]
        out = parts[0]
        for p in parts[1:]:
            out = out.unionAll(p)
        return out

    q.__name__ = name
    q.__doc__ = f"Family composite over members: {', '.join(members)}."
    return q


def registered_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for name in REGISTER_ORDER:
        if name in COMPOSITES:
            out[name] = make_composite(name, COMPOSITES[name])
        else:
            out[name] = MEMBER_QUERIES[name]
    return out


def registered_oracles() -> dict[str, str]:
    from generic_data_ingestor_framework_spark._composite_manifest import MANIFEST

    out: dict[str, str] = {}
    for name in REGISTER_ORDER:
        if name in COMPOSITES:
            members = COMPOSITES[name]
            missing = [m for m in members if m not in MEMBER_ORACLES]
            if missing:  # composites must stay fully oracle-backed
                raise KeyError(f"composite {name} members lack oracles: {missing}")
            with_sample = any(m in SAMPLED_MEMBERS for m in members)
            out[name] = "\nUNION ALL\n".join(
                _oracle_block(m, MEMBER_ORACLES[m], MANIFEST[m], with_sample=with_sample)
                for m in members
            )
        elif name in MEMBER_ORACLES:
            out[name] = MEMBER_ORACLES[name]
    return out
