"""User-extensible function registry (closes SURVEY §2.C's "no
UDF/UDAF/UDTF surface" gap — the reference has no way to register
custom functions; this engine exposes Spark's three tiers).

Tiers, fastest first:
1. **Built-in column expressions** — always prefer; JVM codegen.
2. **Pandas UDFs** (``@pandas_udf``) — Arrow-batched, vectorized;
   the right tier for custom logic (~10-100x faster than row UDFs).
3. **Row Python UDFs** — kept ONLY as a contrast/compat example;
   never use in a hot path.

``register_all(spark)`` installs them for SQL use
(``SELECT norm_text(text) FROM ...``).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

from generic_data_ingestor_framework_spark.relational import load_table


@pandas_udf(T.StringType())
def norm_text(s: pd.Series) -> pd.Series:
    """Vectorized text normalization: lowercase + whitespace collapse."""
    return s.str.lower().str.replace(r"\s+", " ", regex=True).str.strip()


@pandas_udf(T.IntegerType())
def vowel_count(s: pd.Series) -> pd.Series:
    """Arrow-batched character-class count."""
    return s.str.count(r"[aeiou]").astype("int32")


def py_token_count(s: str | None) -> int:
    """Row-at-a-time Python UDF — the SLOW tier, for contrast only."""
    return len(s.split()) if s else 0


def register_all(spark: SparkSession) -> list[str]:
    """Install the registry into the session's SQL function namespace."""
    spark.udf.register("norm_text", norm_text)
    spark.udf.register("vowel_count", vowel_count)
    spark.udf.register("py_token_count", py_token_count, T.IntegerType())
    return ["norm_text", "vowel_count", "py_token_count"]


def udf_text_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pandas-UDF normalization over documents, registered and invoked
    through SQL — exercising the full registry path (register → SQL
    reference → Arrow batch execution)."""
    register_all(spark)
    load_table(spark, sf_dir, "documents").createOrReplaceTempView("documents_udf")
    return spark.sql(
        """
        SELECT doc_id,
               norm_text(text)    AS text_norm,
               vowel_count(text)  AS n_vowels
        FROM documents_udf
        """
    )


QUERIES = {"udf_text_normalize": udf_text_normalize}

ORACLES = {
    "udf_text_normalize": """
        SELECT doc_id,
               trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS text_norm,
               CAST(length(text) - length(regexp_replace(text, '[aeiou]', '', 'g')) AS INT) AS n_vowels
        FROM documents
    """,
}
