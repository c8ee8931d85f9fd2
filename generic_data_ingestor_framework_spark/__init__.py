"""generic_data_ingestor_framework_spark — a PySpark-native analytics/ingestion engine.

A brand-new engine with the query and data-processing capabilities of the
reference ingestion framework (``moezkayy/generic_data_ingestor_framework``),
re-expressed Spark-first: declarative DataFrame/SQL plans optimized by
Catalyst, Structured Streaming for incremental ingest, and
Arrow-batched Pandas UDFs only where built-ins can't express the
semantics.

Modules
-------
session     SparkSession factory (AQE on, sane shuffle partitions)
scanner     source discovery / classification / pattern filtering
ingest      JSON/CSV/Parquet readers, schema unification, lineage
normalize   row-normalization projections (TEXT-parity + flatten modes)
sink        table/parquet/json/text writers
catalog     table existence / schema introspection
query       SQL pass-through, preview, parameterized queries
relational  the full relational operator surface as reusable builders
errors      quarantine + error-summary aggregation
metrics     observe()/accumulator run metrics
cachemgr    session-scoped registry for persisted intermediates
llm         LLM-data-pipeline ops: dedup, similarity, text stats, multimodal
streaming   Structured Streaming ingest + event-time windowing
"""

from generic_data_ingestor_framework_spark.cachemgr import clear_caches

__version__ = "0.1.0"
__all__ = ["clear_caches", "__version__"]
