"""Row-normalization projections (SURVEY §2 A7-A8 + flatten mode).

The reference's only compute operator
(`src/processors/json_processor.py:35-104`) maps every record to a
flat all-text row: nested dict/list → JSON string, null → ``""``,
empty dict/array → ``""`` (falsy collapse), primitives pass through,
anything else → ``str()``.

Here that is ONE generated ``select`` projection — a narrow, codegen'd
map stage with no UDF and no shuffle, which is exactly what survives a
100 TB scan. Two modes:

- ``normalize_text_parity``: byte-faithful reference semantics
  (lossy — ``{}``/``[]``/null all collapse to ``""``).
- ``flatten_dot_paths``: lossless alternative from the reference's
  drifted tests (`tests/unit/test_json_processor.py:111-136`):
  nested structs expand to ``parent.child`` columns, arrays stay typed.

Note on JSON text form: Python ``json.dumps`` emits ``", "``/``": "``
separators, Spark ``to_json`` emits compact JSON. We standardize on the
compact form; parity tests compare parsed structures, not bytes
(SURVEY §7.4).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _normalize_column(col: Column, dtype: T.DataType) -> Column:
    """Reference normalization for one column, as a pure expression."""
    if isinstance(dtype, (T.StructType, T.ArrayType, T.MapType)):
        txt = F.to_json(col)
        # falsy collapse: {} / [] / null → ""
        return F.when(
            col.isNull() | txt.isin("{}", "[]"), F.lit("")
        ).otherwise(txt)
    if isinstance(dtype, T.StringType):
        return F.coalesce(col, F.lit(""))
    # primitives (and exotica) → string, null → ""
    return F.coalesce(col.cast("string"), F.lit(""))


def normalize_text_parity(df: DataFrame, keep_columns: list[str] | None = None) -> DataFrame:
    """A7: the all-TEXT parity projection (single codegen'd select)."""
    cols = keep_columns or df.columns
    return df.select(
        *[_normalize_column(F.col(c), df.schema[c].dataType).alias(c) for c in cols]
    )


def drop_corrupt_records(df: DataFrame, corrupt_col: str = "_corrupt_record") -> DataFrame:
    """A8: drop non-record elements. With PERMISSIVE parsing, non-dict
    top-level array elements land in ``_corrupt_record`` with all data
    columns null (`json_processor.py:57-61` drops them silently)."""
    if corrupt_col not in df.columns:
        return df
    return df.filter(F.col(corrupt_col).isNull()).drop(corrupt_col)


def flatten_dot_paths(df: DataFrame, sep: str = ".") -> DataFrame:
    """Recursive dot-path flattening (`user.name`-style columns), the
    semantics the reference's drifted tests expect of
    ``flatten_json_data``. Arrays are left intact (typed).

    Hostile-name safe: the reference path is built from the actual
    field parts (a field name CONTAINING a dot or backtick never
    corrupts the lookup), and generated names that collide — e.g. a
    literal ``a.b`` column next to struct ``a.b`` — are suffixed
    ``_2``, ``_3`` in schema order (duplicate output names would make
    every later select-by-name ambiguous)."""

    def quoted(parts: list[str]) -> str:
        return ".".join("`" + p.replace("`", "``") + "`" for p in parts)

    def expand(parts: list[str], dtype: T.DataType) -> list[tuple[Column, str]]:
        if isinstance(dtype, T.StructType):
            out: list[tuple[Column, str]] = []
            for f_ in dtype.fields:
                out.extend(expand([*parts, f_.name], f_.dataType))
            return out
        return [(F.col(quoted(parts)), sep.join(parts))]

    named: list[tuple[Column, str]] = []
    for f_ in df.schema.fields:
        if isinstance(f_.dataType, T.StructType):
            named.extend(expand([f_.name], f_.dataType))
        else:
            # quoted([...]) here too: df["a.b"] / F.col("a.b") would
            # resolve the dot as struct access, not the literal name
            named.append((F.col(quoted([f_.name])), f_.name))
    counts: dict[str, int] = {}
    final: list[Column] = []
    for col, name in named:
        n = counts.get(name, 0)
        counts[name] = n + 1
        final.append(col.alias(name if n == 0 else f"{name}_{n + 1}"))
    return df.select(*final)
