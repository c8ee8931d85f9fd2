"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query on sf0.001; ``queries()``
exposes the registered query surface — one entry per capability family
from SURVEY.md §2 — as ``(spark, sf_dir) -> DataFrame``;
``oracle_sql()`` gives the DuckDB equivalent for the correctness gate.

Round 3 consolidation: the member surface is folded into family
composites (``composite.py``) so EVERY capability family has a row
inside the driver's 50-entry correctness window — no rotation.  Each
composite returns one ``(fam, n, checksum)`` row per member, where
``checksum`` is a portable md5-fold of the member's full result, so
member-level regressions still flip the gate.  The full member
registry stays public via ``member_queries()`` / ``member_oracles()``
(used by bench.py and ``tools/check_oracles.py --members``).

Round 4: 48 registered entries over 115 members — adds
``paragraph_dedup_corpus`` (direct entry) and
``multimodal_resize_buckets`` (multimodal_family member); streaming
reads ``ts`` as native ``timestamp[us]``; shared intermediates persist
once per session via ``cachemgr``.

Round 5: 50 registered entries over 135 members — adds
``ann_probe_tradeoff`` and ``dedup_incremental_near`` (direct entries)
plus the REAL binaryFile codecs ``multimodal_bmp_decode`` /
``multimodal_wav_decode`` / ``multimodal_bmp_resize`` /
``multimodal_wav_frames`` (multimodal_family members),
``lm_unigram_score`` (text_quality), ``embed_quantize_int8``
(embed_stats), ``stream_dedup_keys`` (real streaming dedup,
event_windows), ``stream_session_windows`` (real streaming
sessionization, sessions_family) and the in-engine BPE tokenizer
trainer
``bpe_train_merges`` / ``bpe_vocab_topk`` (term_stats members,
oracle-checked against an unrolled DuckDB CTE chain) and the
cross-document span-duplication audit ``span_duplication_ratio``
(doc_fingerprints member); ingest gains the built-in orc and xml
sources.

Round 11: 49 registered entries over 178 members — adds the
persisted-ANN crawl loop ``ann_index_crawl`` as a DIRECT entry (the
driver compares its 60 rows — 4 phases x 5 queries x top-3 — row by
row); ``ann_recall_report`` / ``ann_probe_tradeoff`` fold into the
``embed_stats`` composite as SAMPLED members (their full canonical
rows ride the composite's ``sample`` column).

Round 12: adds the index DELETE/SUPERSEDE lifecycle —
``band_index_recrawl`` / ``ann_index_recrawl`` (generation-tagged
appends, latest-generation-wins probes, tombstone-dropping
compaction) on all three surfaces (gate members, pipeline steps,
streaming ``stream_ann_index_upsert``), the recall-drift audit
``ann_recall_after_append``, the branching recursive-CTE member
``rcte_reachability``, and the SCD2 dimension merge
``scd2_customer_history``. The authoritative member count is
``len(composite.MEMBER_QUERIES)`` (asserted ==
len(MEMBER_ORACLES)+rows-only in test_composites).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from generic_data_ingestor_framework_spark import composite, relational


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return relational.q1_pricing_summary(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return composite.registered_queries()


def oracle_sql() -> dict[str, str]:
    return composite.registered_oracles()


def member_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """Every individual query, including those folded into composites."""
    return dict(composite.MEMBER_QUERIES)


def member_oracles() -> dict[str, str]:
    return dict(composite.MEMBER_ORACLES)
