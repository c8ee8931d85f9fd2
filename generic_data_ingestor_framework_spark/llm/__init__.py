"""LLM-data-pipeline operators: dedup, similarity search, text analysis,
multimodal column plumbing.

These extend the reference's ingestion surface with the operations a
large-scale training-data pipeline needs (north star in BASELINE.json).
All are Spark-first: built-in higher-order functions and hash-groupBys;
Pandas UDFs only for the multimodal decode path where per-row binary
work is genuinely imperative.
"""

from __future__ import annotations

from generic_data_ingestor_framework_spark.llm import (
    classify,
    curate,
    dedup,
    multimodal,
    sampling,
    similarity,
    textstats,
    tokenize,
)

QUERIES = {}
ORACLES = {}
for _m in (dedup, similarity, textstats, multimodal, sampling, classify, curate, tokenize):
    QUERIES.update(_m.QUERIES)
    ORACLES.update(_m.ORACLES)
