"""Property-based tests (hypothesis) for the normalization projection —
a stronger contract than the reference's example-based tests: for ANY
JSON record, normalization must be total, null-free, and
structure-preserving for nested values.
"""

from __future__ import annotations

import json
import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from generic_data_ingestor_framework_spark.normalize import normalize_text_parity

# JSON-safe scalars: text without surrogates; bounded ints; finite floats
scalars = st.one_of(
    st.text(alphabet=st.characters(blacklist_categories=("Cs",)), max_size=30),
    st.integers(min_value=-(2**53), max_value=2**53),
    st.floats(allow_nan=False, allow_infinity=False, width=64),
    st.booleans(),
    st.none(),
)
values = st.recursive(
    scalars,
    lambda children: st.one_of(
        st.lists(children, max_size=4),
        st.dictionaries(st.text(st.characters(whitelist_categories=("Ll",)), min_size=1, max_size=8), children, max_size=4),
    ),
    max_leaves=12,
)
records = st.dictionaries(
    st.text(st.characters(whitelist_categories=("Ll",)), min_size=1, max_size=8),
    values,
    min_size=1,
    max_size=5,
)


@settings(max_examples=25, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(st.lists(records, min_size=1, max_size=3))
def test_normalization_total_and_structure_preserving(spark, recs):
    df = spark.read.json(
        spark.sparkContext.parallelize([json.dumps(r) for r in recs])
    )
    out = normalize_text_parity(df)
    rows = out.collect()
    assert len(rows) == len(recs)
    # total: every output value is a string, never null
    for row in rows:
        for v in row:
            assert isinstance(v, str)
    # structure-preserving: nested values parse back to JSON unless they
    # collapsed by the falsy rule ({}/[]/null → ""). A STRING scalar that
    # merely looks like JSON (e.g. the one-character text "{") passes
    # through as-is and must NOT be required to parse — it just has to
    # be one of the input scalars for that key.
    inputs_by_key: dict[str, list] = {}
    for r in recs:
        for k, val in r.items():
            inputs_by_key.setdefault(k, []).append(val)
    for row in rows:
        d = row.asDict()
        for k, v in d.items():
            if v.startswith("{") or v.startswith("["):
                try:
                    parsed = json.loads(v)
                except json.JSONDecodeError:
                    assert v in inputs_by_key.get(k, []), (
                        f"unparseable non-input value for {k!r}: {v!r}"
                    )
                else:
                    assert isinstance(parsed, (dict, list))


@settings(max_examples=15, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(st.floats(allow_nan=False, allow_infinity=False, width=64))
def test_float_normalization_value_faithful(spark, x):
    df = spark.createDataFrame([(x,)], "v double")
    out = normalize_text_parity(df).collect()[0]["v"]
    assert math.isclose(float(out), x, rel_tol=0, abs_tol=0) or float(out) == x
