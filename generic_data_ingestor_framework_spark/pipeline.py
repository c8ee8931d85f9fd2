"""Declarative pipeline runner: the reference's scan→parse→normalize→
save workflow (`src/core/application.py:36-153`) generalized into a
composable, data-driven pipeline over this engine's operators.

A pipeline is a plain dict (JSON/YAML-friendly):

    {
      "source": {"type": "directory", "path": "data/", "mode": "bulk"},
      "steps": [
        {"op": "filter", "where": "n_chars > 10"},
        {"op": "redact_pii", "column": "text"},
        {"op": "dedup_exact", "key": "text", "order_by": "doc_id"},
        {"op": "sample_hash", "key": "doc_id", "mod": 10, "keep": 0},
        {"op": "sql", "query": "SELECT doc_id, lang FROM __df__"},
      ],
      "sink": {"type": "parquet", "path": "out/"},
    }

Everything stays lazy until the sink: the whole pipeline is ONE Spark
plan, so Catalyst pushes filters into the source scan and prunes
columns across step boundaries — steps are logical, not materialized
stages. ``run_pipeline`` returns (DataFrame, manifest); the manifest
records the resolved steps and, when ``profile=True``, per-step row
counts (each count is an extra job — off by default for the 100 TB
path).
"""

from __future__ import annotations

from typing import Any, Callable

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from generic_data_ingestor_framework_spark import sink as sink_mod
from generic_data_ingestor_framework_spark.ingest import ingest_directory
from generic_data_ingestor_framework_spark.llm.dedup import portable_hash32
from generic_data_ingestor_framework_spark.llm.sampling import (
    _EMAIL_RE,
    _PHONE_RE,
    _SSN_RE,
)
from generic_data_ingestor_framework_spark.normalize import (
    flatten_dot_paths,
    normalize_text_parity,
)

StepFn = Callable[[DataFrame, dict], DataFrame]


def _step_filter(df: DataFrame, p: dict) -> DataFrame:
    return df.filter(p["where"])


def _step_select(df: DataFrame, p: dict) -> DataFrame:
    return df.select(*p["columns"])


def _step_rename(df: DataFrame, p: dict) -> DataFrame:
    return df.withColumnsRenamed(p["mapping"])


def _step_normalize_text(df: DataFrame, p: dict) -> DataFrame:
    return normalize_text_parity(df, p.get("columns"))


def _step_flatten(df: DataFrame, p: dict) -> DataFrame:
    return flatten_dot_paths(df)


def _step_dedup_exact(df: DataFrame, p: dict) -> DataFrame:
    """Keep one row per ``key`` value, first by ``order_by``."""
    w = W.partitionBy(p["key"]).orderBy(*[F.col(c) for c in p.get("order_by", "").split(",") if c] or [F.col(p["key"])])
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def _step_sample_hash(df: DataFrame, p: dict) -> DataFrame:
    """Deterministic hash-mod sample (engine-portable membership)."""
    h = portable_hash32(F.col(p["key"]).cast("string"))
    return df.filter(h % int(p["mod"]) == int(p.get("keep", 0)))


def _step_redact_pii(df: DataFrame, p: dict) -> DataFrame:
    col = p["column"]
    red = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(F.col(col), _SSN_RE, "<SSN>"), _EMAIL_RE, "<EMAIL>"
        ),
        _PHONE_RE,
        "<PHONE>",
    )
    return df.withColumn(col, red)


def _step_with_column(df: DataFrame, p: dict) -> DataFrame:
    return df.withColumn(p["name"], F.expr(p["expr"]))


def _step_repartition(df: DataFrame, p: dict) -> DataFrame:
    cols = p.get("by", [])
    return df.repartition(int(p["n"]), *cols) if cols else df.repartition(int(p["n"]))


def _step_sql(df: DataFrame, p: dict) -> DataFrame:
    """Arbitrary SQL over the running frame (registered as __df__)."""
    df.createOrReplaceTempView("__df__")
    return df.sparkSession.sql(p["query"])


def _step_join(df: DataFrame, p: dict) -> DataFrame:
    """Enrich against another source; ``broadcast: true`` hints the
    enrichment side (the common dimension-lookup case)."""
    other = _load_source(df.sparkSession, p["source"])
    if p.get("broadcast", False):
        other = F.broadcast(other)
    return df.join(other, p["on"], p.get("how", "inner"))


def _step_union(df: DataFrame, p: dict) -> DataFrame:
    other = _load_source(df.sparkSession, p["source"])
    return df.unionByName(other, allowMissingColumns=p.get("allow_missing", True))


def _step_chunk_overlap(df: DataFrame, p: dict) -> DataFrame:
    """Split ``column`` into strided overlap chunks (map-only explode);
    the text column is REPLACED by the chunk text and ``chunk_idx`` is
    appended — downstream steps see chunk-level rows."""
    from generic_data_ingestor_framework_spark.llm.curate import (
        CHUNK_STRIDE,
        CHUNK_TOKENS,
    )

    col = p.get("column", "text")
    chunk = int(p.get("chunk", CHUNK_TOKENS))
    stride = int(p.get("stride", CHUNK_STRIDE))
    ts = F.split(F.col(col), r"\s+")
    n = F.size(ts)
    n_chunks = 1 + F.greatest(
        F.lit(0), F.ceil((n - chunk) / F.lit(float(stride))).cast("int")
    )
    return (
        df.withColumn("__ts", ts)
        .withColumn("chunk_idx", F.explode(F.sequence(F.lit(0), n_chunks - 1)))
        .withColumn(
            col,
            F.array_join(F.slice("__ts", F.col("chunk_idx") * stride + 1, chunk), " "),
        )
        .drop("__ts")
    )


def _step_quality_filter(df: DataFrame, p: dict) -> DataFrame:
    """Gopher-style keep/drop gate on ``column`` (word count band, mean
    word length band, duplicate-token fraction cap)."""
    col = p.get("column", "text")
    ws = F.filter(F.split(F.lower(F.col(col)), r"\s+"), lambda t: t != "")
    n = F.size(ws)
    mean_len = F.aggregate(ws, F.lit(0), lambda a, t: a + F.length(t)) / n
    dup = 1 - F.size(F.array_distinct(ws)) / n
    cond = (
        (n >= int(p.get("min_words", 5)))
        & (n <= int(p.get("max_words", 100000)))
        & (mean_len >= float(p.get("min_mean_word_len", 2.0)))
        & (mean_len <= float(p.get("max_mean_word_len", 12.0)))
        & (dup <= float(p.get("max_dup_token_frac", 0.9)))
    )
    return df.filter(cond)


_REPETITION_RESERVED = frozenset({"__ts", "__bg", "__m", "__tot", "__top_frac"})


def _step_repetition_filter(df: DataFrame, p: dict) -> DataFrame:
    """Gopher top-n-gram mass gate: drop rows whose single most frequent
    bigram accounts for more than ``max_top_bigram_frac`` of bigram
    positions (phrase-looping spam the bag-level dup-token cap misses).
    Rows with fewer than 2 tokens have no bigrams and pass. Same
    explode → count → per-id window shape as ``doc_topgram_mass``,
    joined back by ``id`` (LEFT join + null-pass, so short rows are
    kept without a second pass over the text)."""
    from pyspark.sql import Window as W

    col = p.get("column", "text")
    idc = p["id"]
    if idc in _REPETITION_RESERVED or col in _REPETITION_RESERVED:
        raise ValueError(
            f"column {idc!r}/{col!r} collides with repetition-filter internals"
        )
    cap = float(p.get("max_top_bigram_frac", 0.2))
    if not 0 < cap <= 1:
        raise ValueError(f"max_top_bigram_frac must be in (0, 1]; got {cap}")
    ts = F.split(F.lower(F.col(col)), r"\s+")
    n = F.size(F.col("__ts"))
    bigrams = F.when(
        n >= 2,
        F.transform(
            F.sequence(F.lit(0), n - 2),
            lambda i: F.array_join(F.slice(F.col("__ts"), i + 1, 2), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))
    bg = (
        df.select(idc, ts.alias("__ts"))
        .select(idc, F.explode(bigrams).alias("__bg"))
        .groupBy(idc, "__bg")
        .agg(F.count(F.lit(1)).alias("__m"))
    )
    w = W.partitionBy(idc)
    frac = (
        bg.withColumn("__tot", F.sum("__m").over(w))
        .groupBy(idc)
        .agg(F.max(F.col("__m") / F.col("__tot")).alias("__top_frac"))
    )
    return (
        df.join(frac, idc, "left")
        .filter(F.col("__top_frac").isNull() | (F.col("__top_frac") <= cap))
        .select(*df.columns)
    )


def _step_weighted_sample(df: DataFrame, p: dict) -> DataFrame:
    """Quality-weighted Bernoulli sampling: each row survives with
    probability proportional to the shared heuristic quality of
    ``column`` — integer basis points + salted portable md5 hash of
    ``id`` (deterministic across engines, partitionings, and reruns;
    same contract as ``llm.sampling.quality_weighted_sample``). ``salt``
    decorrelates from other hash-based selections in the same spec."""
    from generic_data_ingestor_framework_spark.llm.sampling import (
        quality_weight_bp,
        salted_hash,
    )

    col = p.get("column", "text")
    idc = p["id"]
    salt = str(p.get("salt", "q"))
    return df.filter(salted_hash(idc, salt) % 10000 < quality_weight_bp(col))


def _step_lm_filter(df: DataFrame, p: dict) -> DataFrame:
    """Unigram-LM quality gate: fit a Laplace-smoothed unigram LM over
    THIS dataset's ``column`` and drop rows whose token cross-entropy
    exceeds ``max_xent`` (rare/garbled token soup scores high; see
    ``llm.textstats.lm_unigram_score`` for the corpus-level member).
    The LM is one hash-aggregate over the exploded token relation,
    broadcast back for scoring — two shuffles total, no driver-side
    model beyond the two scalar counts."""
    col = p.get("column", "text")
    idc = p["id"]
    max_xent = float(p.get("max_xent", 12.0))
    # rows with no tokens have no cross-entropy to evaluate: pass them
    # through UNCHANGED (same contract as paragraph_dedup's blank rows)
    is_blank = F.col(col).isNull() | (F.trim(F.col(col)) == "")
    blank_rows = df.filter(is_blank)
    df = df.filter(~is_blank)
    toks = (
        df.select(idc, F.explode(F.split(F.lower(F.col(col)), r"\s+")).alias("__tok"))
        .filter(F.col("__tok") != "")
        .groupBy(idc, "__tok")
        .agg(F.count(F.lit(1)).alias("__n"))
    )
    lm = toks.groupBy("__tok").agg(F.sum("__n").alias("__c"))
    sc = lm.agg(F.sum("__c").alias("N"), F.count(F.lit(1)).alias("V")).collect()[0]
    if sc["N"] is None:  # zero tokens anywhere: nothing scoreable
        return df.unionByName(blank_rows)
    denom = float(sc["N"] + sc["V"])
    lp = F.log((F.col("__c") + 1.0) / F.lit(denom))
    keep = (
        toks.join(F.broadcast(lm.select("__tok", lp.alias("__lp"))), "__tok")
        .groupBy(idc)
        .agg((-F.sum(F.col("__n") * F.col("__lp")) / F.sum("__n")).alias("__xent"))
        .filter(F.col("__xent") <= max_xent)
        .select(idc)
    )
    return df.join(keep, idc, "semi").unionByName(blank_rows)


def _step_decontaminate(df: DataFrame, p: dict) -> DataFrame:
    """Drop rows whose ``column`` shares any k-gram with the benchmark
    source (anti-join against a broadcast benchmark gram set)."""
    from generic_data_ingestor_framework_spark.llm.curate import DECON_GRAM_K
    from generic_data_ingestor_framework_spark.llm.dedup import shingles_from_tokens

    col = p.get("column", "text")
    idc = p["id"]
    k = int(p.get("k", DECON_GRAM_K))
    bench = _load_source(df.sparkSession, p["benchmark"])
    bcol = p.get("benchmark_column", col)
    bgrams = (
        bench.select(F.split(F.lower(F.col(bcol)), r"\s+").alias("__ts"))
        .select(F.explode(shingles_from_tokens(F.col("__ts"), k=k)).alias("gram"))
        .distinct()
    )
    hit_ids = (
        df.select(idc, F.split(F.lower(F.col(col)), r"\s+").alias("__ts"))
        .select(idc, F.explode(shingles_from_tokens(F.col("__ts"), k=k)).alias("gram"))
        .join(F.broadcast(bgrams), "gram", "semi")
        .select(idc)
        .distinct()
    )
    return df.join(hit_ids, idc, "anti")


def _step_paragraph_dedup(df: DataFrame, p: dict) -> DataFrame:
    """CCNet-style cross-corpus paragraph dedup over ``column``: cut
    rows into ``seg``-token segments, keep only the corpus-wide first
    occurrence of each segment's content (min (id, pos)), and rewrite
    the column to the surviving text. Rows left with no surviving
    segments are dropped (fully-boilerplate documents); rows whose text
    is NULL or blank carry no segments to deduplicate and pass through
    UNCHANGED (they are unioned back, not silently dropped). Same plan
    as ``llm.curate.paragraph_dedup_corpus``: one explode, one shuffle
    on segment content, one per-id aggregate, joined back on the id."""
    from generic_data_ingestor_framework_spark.llm.curate import SEG_TOKENS

    col = p.get("column", "text")
    idc = p["id"]
    seg_n = int(p.get("seg", SEG_TOKENS))
    is_blank = F.col(col).isNull() | (F.trim(F.col(col)) == "")
    blank_rows = df.filter(is_blank)
    df = df.filter(~is_blank)
    ts = F.split(F.lower(F.col(col)), r"\s+")
    # greatest(…, 1): defensive floor so a pathological zero/negative
    # size can never feed sequence() a descending range of phantom
    # positions (blank rows are already routed around this path).
    n_segs = F.greatest(
        F.ceil(F.size("__ts") / F.lit(float(seg_n))).cast("int"), F.lit(1)
    )
    segs = (
        df.select(idc, ts.alias("__ts"))
        .withColumn("__pos", F.explode(F.sequence(F.lit(0), n_segs - 1)))
        .select(
            idc,
            "__pos",
            F.array_join(F.slice("__ts", F.col("__pos") * seg_n + 1, seg_n), " ").alias(
                "__seg"
            ),
        )
    )
    w = W.partitionBy("__seg").orderBy(idc, "__pos")
    kept = (
        segs.withColumn("__keep", F.row_number().over(w) == 1)
        .groupBy(idc)
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.when(F.col("__keep"), F.struct("__pos", "__seg")))
                    ),
                    lambda s: s["__seg"],
                ),
                " ",
            ).alias("__kept")
        )
    )
    deduped = (
        df.drop(col)
        .join(kept, idc)
        .withColumnRenamed("__kept", col)
        .filter(F.col(col) != "")
        .select(*df.columns)
    )
    return deduped.unionByName(blank_rows.select(*df.columns))


def _step_bpe_tokenize(df: DataFrame, p: dict) -> DataFrame:
    """Tokenize ``column`` with BPE merges learned IN the pipeline:
    either from a provided ``corpus`` source (``{"type": "parquet"|
    "directory", ...}``) or from the flowing frame itself. Adds the
    ``bpe_tokens`` subword array column (pure projection — the learned
    merge table is driver-held, ``n_merges`` rows). The scale split is
    the same as ``llm.tokenize``: merge learning runs over a vocab-
    sized word-frequency relation, application is map-only."""
    from generic_data_ingestor_framework_spark.llm.tokenize import (
        BPE_MERGES,
        _init_syms,
        encode_with_merges,
        train_from_words,
    )

    col = p.get("column", "text")
    n_merges = int(p.get("n_merges", BPE_MERGES))
    src = _load_source(df.sparkSession, p["corpus"]) if "corpus" in p else df
    words = (
        src.select(F.explode(F.split(F.lower(F.col(col)), r"\s+")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .withColumn("s", _init_syms(F.col("word")))
        .localCheckpoint()
    )
    return encode_with_merges(df, train_from_words(words, n_merges), column=col)


# Internal working-column names per step: an id (or data) column with one
# of these names would yield a confusing duplicate-column failure deep in
# the plan, so both steps reject them up front (includes the __ts/__clean
# temporaries, not just the span-core outputs).
_SPAN_RESERVED = frozenset({"pos", "gram", "cov", "__ts", "__clean"})
_BUDGET_RESERVED = frozenset({"band", "n_tok", "cum_tokens", "sel_rank", "__ts"})


def _step_remove_dup_spans(df: DataFrame, p: dict) -> DataFrame:
    """Cross-corpus duplicated-SPAN removal over ``column`` (Lee et al.
    2022): any ``k``-token gram occurring ≥``min_occ`` times corpus-wide
    marks its token range; covered tokens are cut and the column is
    rewritten to the surviving text. Rows left empty (fully-duplicated
    text) are dropped; NULL/blank rows pass through unchanged — the
    same contracts as ``paragraph_dedup``. The gram/coverage/rebuild
    core is the SAME code as ``llm.curate.remove_duplicated_spans``
    (``pos_grams_from_tokens`` / ``span_coverage`` /
    ``cut_covered_tokens``), so the operator and the step cannot
    drift."""
    from generic_data_ingestor_framework_spark.llm.curate import (
        SPAN_K,
        cut_covered_tokens,
        pos_grams_from_tokens,
        span_coverage,
    )

    col = p.get("column", "text")
    idc = p["id"]
    if idc in _SPAN_RESERVED:
        raise ValueError(f"id column {idc!r} collides with span-removal internals")
    k = int(p.get("k", SPAN_K))
    min_occ = int(p.get("min_occ", 2))
    if k < 1:
        raise ValueError(f"k must be >= 1 (k=0 makes every gram empty-equal); got {k}")
    if min_occ < 2:
        raise ValueError(f"min_occ must be >= 2 (1 would cut every token); got {min_occ}")
    is_blank = F.col(col).isNull() | (F.trim(F.col(col)) == "")
    blank_rows = df.filter(is_blank)
    df = df.filter(~is_blank)
    base = df.select(idc, F.split(F.lower(F.col(col)), r"\s+").alias("__ts"))
    covered = span_coverage(pos_grams_from_tokens(base, idc, "__ts", k), idc, k, min_occ)
    _joined, kept = cut_covered_tokens(base, covered, idc, "__ts")
    cleaned = _joined.select(idc, F.array_join(kept, " ").alias("__clean"))
    out = (
        df.drop(col)
        .join(cleaned, idc)
        .withColumnRenamed("__clean", col)
        .filter(F.col(col) != "")
        .select(*df.columns)
    )
    return out.unionByName(blank_rows.select(*df.columns))


def _step_select_budget(df: DataFrame, p: dict) -> DataFrame:
    """Token-budget selection: keep the highest-quality rows (shared
    ``_quality_expr`` heuristic over ``column``) until ``frac`` of the
    dataset's tokens are spent. The banded-cumsum selection core is the
    SAME code as ``llm.curate.corpus_select_budget``
    (``banded_budget_select``) — per-band totals are a bounded
    driver-sized relation (quality is 6-dp, ≤1e6+1 bands at ANY data
    size), so no global sort exists; rows keep their original
    columns."""
    from generic_data_ingestor_framework_spark.llm.curate import banded_budget_select
    from generic_data_ingestor_framework_spark.llm.textstats import _quality_expr

    col = p.get("column", "text")
    idc = p["id"]
    frac = float(p.get("frac", 0.4))
    if not 0.0 < frac <= 1.0:
        raise ValueError(f"frac must be in (0, 1]; got {frac}")
    num, den = frac.as_integer_ratio()
    # NULL/blank rows can't be quality-scored: pass them through
    # UNCHANGED (the same contract as paragraph_dedup/remove_dup_spans;
    # size(NULL) would otherwise poison the token total as -1 or NULL)
    is_blank = F.col(col).isNull() | (F.trim(F.col(col)) == "")
    blank_rows = df.filter(is_blank)
    df = df.filter(~is_blank)
    # materialize the token array BEFORE the quality lambda: Catalyst
    # re-inlines aliased expressions into HOF lambda bodies, re-running
    # the regex split per element otherwise (see dedup.py:66-70)
    if idc in _BUDGET_RESERVED:
        raise ValueError(f"id column {idc!r} collides with selection internals")
    base = df.select(idc, F.split(F.lower(F.col(col)), r"\s+").alias("__ts"))
    banded = base.select(
        idc,
        F.size("__ts").alias("n_tok"),
        F.round(F.round(_quality_expr(F.col("__ts")), 6) * 1e6)
        .cast("bigint")
        .alias("band"),
    )
    stats = [
        (int(r["band"]), int(r["t"]), int(r["c"]))
        for r in banded.groupBy("band")
        .agg(F.sum("n_tok").alias("t"), F.count(F.lit(1)).alias("c"))
        .collect()
    ]
    total = sum(t for _, t, _ in stats)
    budget = total * num // den
    sel_ids = banded_budget_select(banded, idc, stats, budget).select(idc)
    return df.join(sel_ids, idc, "semi").unionByName(blank_rows)


def _step_dedup_near_index(df: DataFrame, p: dict) -> DataFrame:
    """Cross-run NEAR-duplicate dedup against a PERSISTED band index —
    the crawl loop as a pipeline step::

        {"op": "dedup_near_index", "table": "corpus_band_index",
         "id": "doc_id", "text": "text", "update": true,
         "admitted_table": "run42_admitted"}

    Rows whose MinHash band is already claimed by the index (or by a
    smaller-id row in this batch) are dropped; rows with no shingles
    are not admitted. With ``update`` the admitted rows are first
    WRITTEN to ``admitted_table`` (each crawl's durable output — and
    it pins the probe result against the index append that follows),
    then their bands append to the index so tomorrow's run sees them.
    The index table must exist (``save_band_index`` seeds it).

    Retry contract: ``admitted_table`` names THIS crawl run. If it
    already exists, the run is treated as (at least partially)
    complete — recomputing the probe would reject every doc the first
    attempt admitted (their bands are in the index) and overwrite the
    durable output with an empty frame — so the step re-appends ONLY
    the recorded admissions' bands that are not already in the index
    (``skip_existing`` anti-join): a retry after a crash in EITHER
    half converges on the same result, and a routine re-execution of
    an already-completed spec is a pure read — the index does not
    accumulate duplicate band rows across re-runs. See
    ``llm/dedup.py`` ``band_index_crawl`` — the driver-gated member
    exercising this cycle."""
    from generic_data_ingestor_framework_spark.fileops import hadoop_exists
    from generic_data_ingestor_framework_spark.llm.dedup import (
        dedup_against_band_index,
        update_band_index,
    )

    spark = df.sparkSession
    id_col = p.get("id", "doc_id")
    text_col = p.get("text", "text")
    if p.get("update"):
        out_tbl = p.get("admitted_table", f"{p['table']}_admitted")
        if spark.catalog.tableExists(out_tbl):
            admitted = spark.table(out_tbl)
            update_band_index(
                spark, admitted, p["table"], id_col, text_col, skip_existing=True
            )
            return admitted
        wh = spark.conf.get("spark.sql.warehouse.dir")
        if hadoop_exists(spark, f"{wh}/{out_tbl.lower()}"):
            raise RuntimeError(
                f"admitted table {out_tbl!r} has data at its warehouse "
                f"location but is not in this session's catalog (fresh "
                f"metastore?) — re-register it or remove the location; "
                f"refusing to overwrite a prior crawl's durable output"
            )
        admitted = dedup_against_band_index(spark, df, p["table"], id_col, text_col)
        admitted.write.saveAsTable(out_tbl)
        admitted = spark.table(out_tbl)
        update_band_index(spark, admitted, p["table"], id_col, text_col)
        return admitted
    return dedup_against_band_index(spark, df, p["table"], id_col, text_col)


def _step_ann_append(df: DataFrame, p: dict) -> DataFrame:
    """Append this frame's embedding vectors to a PERSISTED ANN index
    without retraining — the vector-side crawl step next to
    ``dedup_near_index``::

        {"op": "ann_append", "root": "/idx/ann_corpus",
         "batch_tag": "crawl42", "id": "vec_id", "vec": "embedding"}

    New rows are assigned to their nearest SAVED IVF centroid and
    encoded against the SAVED PQ codebooks (``append_ann_index``). The
    step passes the frame through unchanged, so it composes anywhere in
    a pipeline (typically after dedup/quality steps have picked the
    admitted rows).

    Retry contract: ``batch_tag`` names THIS crawl run — the append
    writes per-tag overwrite-mode subdirectories and recomputes the
    meta count from stored data, so a crashed-and-rerun spec replaces
    its own batch instead of duplicating rows. Run
    ``compact_ann_index`` periodically to fold accumulated batches
    into the cell-partitioned base."""
    from generic_data_ingestor_framework_spark.llm.similarity import (
        _as_double,
        append_ann_index,
    )

    from pyspark.sql import functions as F

    id_col = p.get("id", "vec_id")
    vec_col = p.get("vec", "embedding")
    vecs = df.select(
        F.col(id_col).alias("vec_id"), _as_double(F.col(vec_col)).alias("v")
    )
    append_ann_index(df.sparkSession, vecs, p["root"], p["batch_tag"])
    return df


def _step_ann_supersede(df: DataFrame, p: dict) -> DataFrame:
    """Register this frame's vectors as RE-CRAWLED CHANGED content in a
    persisted ANN index (``supersede_ann_index``) — the delete/supersede
    crawl step next to ``ann_append``::

        {"op": "ann_supersede", "root": "/idx/ann_corpus",
         "batch_tag": "crawl43", "gen": 3, "id": "vec_id",
         "vec": "embedding"}

    Ids MAY overlap the indexed set; rows are re-encoded against the
    SAVED quantizers at generation ``gen`` and probes stop serving the
    old vectors immediately (latest-generation-wins). ``gen`` must
    exceed every generation previously written for these ids — the
    crawl loop's monotonic batch counter. Pass-through frame; same
    per-tag overwrite retry contract as ``ann_append``; run
    ``compact_ann_index`` periodically to drop superseded rows
    physically."""
    from generic_data_ingestor_framework_spark.llm.similarity import (
        _as_double,
        supersede_ann_index,
    )

    from pyspark.sql import functions as F

    id_col = p.get("id", "vec_id")
    vec_col = p.get("vec", "embedding")
    vecs = df.select(
        F.col(id_col).alias("vec_id"), _as_double(F.col(vec_col)).alias("v")
    )
    supersede_ann_index(df.sparkSession, vecs, p["root"], p["batch_tag"], int(p["gen"]))
    return df


def _step_ann_delete(df: DataFrame, p: dict) -> DataFrame:
    """Tombstone this frame's ids out of a persisted ANN index
    (``delete_ann_index_ids``) — the 'document gone' crawl signal::

        {"op": "ann_delete", "root": "/idx/ann_corpus",
         "batch_tag": "crawl43_gone", "gen": 4, "id": "vec_id"}

    Probes stop serving the ids immediately; compaction drops their
    rows physically. Pass-through frame; per-tag overwrite retries."""
    from generic_data_ingestor_framework_spark.llm.similarity import (
        delete_ann_index_ids,
    )

    from pyspark.sql import functions as F

    ids = df.select(F.col(p.get("id", "vec_id")).alias("vec_id"))
    delete_ann_index_ids(df.sparkSession, ids, p["root"], p["batch_tag"], int(p["gen"]))
    return df


def _step_band_supersede(df: DataFrame, p: dict) -> DataFrame:
    """Register this frame's documents as RE-CRAWLED CHANGED content in
    a VERSIONED band index (``supersede_band_index``)::

        {"op": "band_supersede", "delta_table": "corpus_bands_delta",
         "gen": 2, "id": "doc_id", "text": "text"}

    The docs' new bands land in the delta at generation ``gen``; their
    old bands stop matching immediately and are physically dropped by
    ``compact_band_index_versioned``. A re-run re-appends the same
    rows — duplicates are inert at probe time (band sets) and dropped
    at compaction. Pass-through frame."""
    from generic_data_ingestor_framework_spark.llm.dedup import supersede_band_index

    supersede_band_index(
        df.sparkSession, df, p["delta_table"], int(p["gen"]),
        p.get("id", "doc_id"), p.get("text", "text"),
    )
    return df


def _step_scd2_apply(df: DataFrame, p: dict) -> DataFrame:
    """Apply this frame as an SCD2 update batch to a DIMENSION HISTORY
    table — the dimension twin of the index supersede/delete steps::

        {"op": "scd2_apply", "table": "dim_customer_hist",
         "key": "c_custkey", "attrs": ["c_mktsegment", "c_acctbal"],
         "gen": 3, "delete_col": "is_deleted"}

    The frame carries the batch's LATEST state per key
    (key, *attrs, delete_col). An absent table is seeded with the
    batch's non-deleted rows as open rows at ``gen``. ``gen`` is the
    crawl loop's monotonic batch counter — VALIDATED before merging: a
    stale gen below the table's newest ``valid_from`` raises instead of
    silently writing inverted history rows. RETRY-SAFE by merge
    semantics, not by tags:
    re-applying the same batch is a no-op — an identical update creates
    no version, a delete of an already-closed key closes nothing, an
    insert whose key is now open with identical attrs is a no-op. The
    overwrite stages through a localCheckpoint so the write never reads
    the table it replaces. Pass-through frame."""
    from generic_data_ingestor_framework_spark.relational import scd2_apply

    from pyspark.sql import functions as F

    spark = df.sparkSession
    key, attrs = p["key"], list(p["attrs"])
    gen = int(p["gen"])
    delete_col = p.get("delete_col", "is_deleted")
    batch = df.select(
        key,
        *attrs,
        (F.col(delete_col) if delete_col in df.columns else F.lit(False)).alias(
            delete_col
        ),
    )
    table = p["table"]
    if spark.catalog.tableExists(table):
        from generic_data_ingestor_framework_spark.relational import scd2_validate_gen

        hist = spark.table(table)
        scd2_validate_gen(hist, gen)
        merged = scd2_apply(hist, batch, key, attrs, gen, delete_col)
    else:
        merged = batch.filter(~F.col(delete_col)).select(
            key,
            *attrs,
            F.lit(gen).alias("valid_from"),
            F.lit(None).cast("int").alias("valid_to"),
        )
    merged.localCheckpoint(eager=True).write.mode("overwrite").saveAsTable(table)
    return df


def _step_ann_auto_compact(df: DataFrame, p: dict) -> DataFrame:
    """Enforce the batch-sized-delta contract on a persisted ANN index
    (``maybe_compact_ann_index``) — run after supersede/delete steps::

        {"op": "ann_auto_compact", "root": "/idx/ann_corpus",
         "max_delta_ratio": 0.1}

    Compacts when the delta's mark set exceeds ``max_delta_ratio`` of
    the base ids or the session's broadcast budget; otherwise a cheap
    metadata probe. Without this policy a crawl spec that defers
    compaction accumulates delta until the probe-side broadcast guard
    refuses loudly. Pass-through frame."""
    from generic_data_ingestor_framework_spark.llm.similarity import (
        maybe_compact_ann_index,
    )

    maybe_compact_ann_index(
        df.sparkSession, p["root"], float(p.get("max_delta_ratio", 0.10))
    )
    return df


def _step_band_auto_compact(df: DataFrame, p: dict) -> DataFrame:
    """Enforce the batch-sized-delta contract on a versioned band index
    (``maybe_compact_band_index``) — the band twin of
    ``ann_auto_compact``::

        {"op": "band_auto_compact", "base_table": "corpus_bands",
         "delta_table": "corpus_bands_delta", "max_delta_ratio": 0.1}

    Pass-through frame."""
    from generic_data_ingestor_framework_spark.llm.dedup import (
        maybe_compact_band_index,
    )

    maybe_compact_band_index(
        df.sparkSession,
        p["base_table"],
        p["delta_table"],
        float(p.get("max_delta_ratio", 0.10)),
        int(p.get("n_buckets", 32)),
    )
    return df


def _step_band_delete(df: DataFrame, p: dict) -> DataFrame:
    """Tombstone this frame's doc ids out of a versioned band index::

        {"op": "band_delete", "delta_table": "corpus_bands_delta",
         "gen": 3, "id": "doc_id"}

    Pass-through frame; same retry/compaction contract as
    ``band_supersede``."""
    from generic_data_ingestor_framework_spark.llm.dedup import delete_band_index_docs

    delete_band_index_docs(
        df.sparkSession, df, p["delta_table"], int(p["gen"]), p.get("id", "doc_id")
    )
    return df


STEP_REGISTRY: dict[str, StepFn] = {
    "filter": _step_filter,
    "select": _step_select,
    "rename": _step_rename,
    "normalize_text": _step_normalize_text,
    "flatten": _step_flatten,
    "dedup_exact": _step_dedup_exact,
    "sample_hash": _step_sample_hash,
    "redact_pii": _step_redact_pii,
    "with_column": _step_with_column,
    "repartition": _step_repartition,
    "sql": _step_sql,
    "join": _step_join,
    "union": _step_union,
    "chunk_overlap": _step_chunk_overlap,
    "quality_filter": _step_quality_filter,
    "repetition_filter": _step_repetition_filter,
    "weighted_sample": _step_weighted_sample,
    "lm_filter": _step_lm_filter,
    "decontaminate": _step_decontaminate,
    "paragraph_dedup": _step_paragraph_dedup,
    "bpe_tokenize": _step_bpe_tokenize,
    "remove_dup_spans": _step_remove_dup_spans,
    "select_budget": _step_select_budget,
    "dedup_near_index": _step_dedup_near_index,
    "ann_append": _step_ann_append,
    "ann_supersede": _step_ann_supersede,
    "ann_delete": _step_ann_delete,
    "ann_auto_compact": _step_ann_auto_compact,
    "scd2_apply": _step_scd2_apply,
    "band_supersede": _step_band_supersede,
    "band_delete": _step_band_delete,
    "band_auto_compact": _step_band_auto_compact,
}


def _load_source(spark: SparkSession, src: dict) -> DataFrame:
    kind = src["type"]
    if kind == "directory":
        df, report = ingest_directory(
            spark,
            src["path"],
            mode=src.get("mode", "parity"),
            text_parity=src.get("text_parity", True),
            file_types=src.get("file_types"),
            schema_mode=src.get("schema_mode", "sorted"),
        )
        if df is None:
            raise ValueError(f"no ingestible data under {src['path']}")
        return df
    if kind == "parquet":
        return spark.read.parquet(src["path"])
    if kind == "table":
        return spark.table(src["name"])
    raise ValueError(f"unknown source type: {kind}")


def _write_sink(df: DataFrame, dst: dict) -> None:
    kind = dst["type"]
    if kind == "parquet":
        sink_mod.write_parquet(df, dst["path"], backup=dst.get("backup", False))
    elif kind == "json":
        sink_mod.write_json(df, dst["path"], backup=dst.get("backup", False))
    elif kind == "table":
        sink_mod.create_table(df.sparkSession, df, dst["name"])
        sink_mod.insert_data(df.sparkSession, df, dst["name"])
    elif kind == "sqlite":
        sink_mod.write_sqlite(df, dst["path"], dst.get("table", "processed_data"))
    elif kind == "csv":
        sink_mod.write_csv(
            df,
            dst["path"],
            backup=dst.get("backup", False),
            sep=dst.get("sep", ","),
            compression=dst.get("compression"),
        )
    elif kind == "orc":
        sink_mod.write_orc(df, dst["path"], backup=dst.get("backup", False))
    elif kind == "xml":
        sink_mod.write_xml(df, dst["path"], backup=dst.get("backup", False))
    else:
        raise ValueError(f"unknown sink type: {kind}")


def run_pipeline(
    spark: SparkSession, spec: dict[str, Any], profile: bool = False
) -> tuple[DataFrame, dict]:
    """Execute a declarative pipeline spec. Returns (final DataFrame,
    manifest). The sink is optional — omit it to get the lazy frame."""
    df = _load_source(spark, spec["source"])
    manifest: dict[str, Any] = {"steps": [], "source": spec["source"]["type"]}
    for p in spec.get("steps", []):
        op = p["op"]
        if op not in STEP_REGISTRY:
            raise ValueError(f"unknown pipeline op: {op} (have {sorted(STEP_REGISTRY)})")
        df = STEP_REGISTRY[op](df, p)
        entry: dict[str, Any] = {"op": op}
        if profile:
            entry["rows"] = df.count()
        manifest["steps"].append(entry)
    if "sink" in spec:
        _write_sink(df, spec["sink"])
        manifest["sink"] = spec["sink"]["type"]
    return df, manifest
