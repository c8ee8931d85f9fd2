"""Property-based contract for the generic as-of join: for ANY small
event set, `asof_join` must equal the naive per-row definition
(greatest right ts <= left ts per key)."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from generic_data_ingestor_framework_spark.streaming import asof_join

keys = st.integers(min_value=0, max_value=3)
times = st.integers(min_value=0, max_value=20)

left_rows = st.lists(st.tuples(keys, times), min_size=1, max_size=12)
# right side unique per (key, ts) by construction (dict)
right_rows = st.dictionaries(st.tuples(keys, times), st.just(None), min_size=0, max_size=12)


def naive_asof(left, right):
    out = set()
    for i, (k, lt) in enumerate(left):
        cands = [rt for (rk, rt) in right if rk == k and rt <= lt]
        if cands:
            out.add((k, i, lt, max(cands)))
    return out


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(left=left_rows, right=right_rows)
def test_asof_join_matches_naive(spark, left, right):
    rkeys = list(right)
    ldf = spark.createDataFrame(
        [(k, i, t) for i, (k, t) in enumerate(left)], "k int, lid int, lts int"
    )
    rdf = spark.createDataFrame(
        [(k, t, t) for (k, t) in rkeys] or [(None, None, None)],
        "k int, rts int, rval int",
    )
    if not rkeys:
        rdf = rdf.filter("k IS NOT NULL")
    got = {
        (r["k"], r["lid"], r["lts"], r["rval"])
        for r in asof_join(
            ldf, rdf, by=["k"], left_ts="lts", right_ts="rts", right_cols=["rval"]
        ).collect()
    }
    assert got == naive_asof(left, rkeys)


# right side NOT unique per (key, ts): rid breaks ties, max rid must win
dup_right_rows = st.lists(st.tuples(keys, times), min_size=0, max_size=16)


def naive_asof_tiebreak(left, right):
    out = set()
    for i, (k, lt) in enumerate(left):
        cands = [(rt, rid) for rid, (rk, rt) in enumerate(right) if rk == k and rt <= lt]
        if cands:
            best_ts = max(rt for rt, _ in cands)
            best_rid = max(rid for rt, rid in cands if rt == best_ts)
            out.add((k, i, lt, best_rid))
    return out


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(left=left_rows, right=dup_right_rows)
def test_asof_join_tiebreak_matches_naive(spark, left, right):
    """``right_tiebreak`` must equal the row_number-pre-dedup result
    (max tiebreak among equal-(key, ts) right rows wins) for ANY
    duplicated right side — the zero-extra-shuffle dedup contract."""
    ldf = spark.createDataFrame(
        [(k, i, t) for i, (k, t) in enumerate(left)], "k int, lid int, lts int"
    )
    rdf = spark.createDataFrame(
        [(k, t, rid) for rid, (k, t) in enumerate(right)] or [(None, None, None)],
        "k int, rts int, rval int",
    )
    if not right:
        rdf = rdf.filter("k IS NOT NULL")
    got = {
        (r["k"], r["lid"], r["lts"], r["rval"])
        for r in asof_join(
            ldf, rdf, by=["k"], left_ts="lts", right_ts="rts",
            right_cols=["rval"], right_tiebreak="rval",
        ).collect()
    }
    assert got == naive_asof_tiebreak(left, right)


def naive_asof_tiebreak_payload(left, right):
    """Winner = max rid among equal-(key, max ts) rows; the carried
    payload is THAT row's (possibly NULL) payload — never stitched
    from an older row."""
    out = set()
    for i, (k, lt) in enumerate(left):
        cands = [(rt, rid) for rid, (rk, rt) in enumerate(right) if rk == k and rt <= lt]
        if not cands:
            continue
        best_ts = max(rt for rt, _ in cands)
        best_rid = max(rid for rt, rid in cands if rt == best_ts)
        payload = best_rid if best_rid % 2 == 0 else None  # odd rids carry NULL
        out.add((k, i, lt, best_rid, payload))
    return out


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(left=left_rows, right=dup_right_rows)
def test_asof_join_tiebreak_carries_winner_nulls(spark, left, right):
    """Nullable carried columns must come ATOMICALLY from the winning
    right row: if the max-tiebreak row has NULL in a carried column
    while an older/lower-tiebreak row has it non-null, the output must
    carry the NULL (per-column forward-fill would stitch rows)."""
    ldf = spark.createDataFrame(
        [(k, i, t) for i, (k, t) in enumerate(left)], "k int, lid int, lts int"
    )
    rdf = spark.createDataFrame(
        [
            (k, t, rid, rid if rid % 2 == 0 else None)
            for rid, (k, t) in enumerate(right)
        ]
        or [(None, None, None, None)],
        "k int, rts int, rval int, payload int",
    )
    if not right:
        rdf = rdf.filter("k IS NOT NULL")
    got = {
        (r["k"], r["lid"], r["lts"], r["rval"], r["payload"])
        for r in asof_join(
            ldf, rdf, by=["k"], left_ts="lts", right_ts="rts",
            right_cols=["rval", "payload"], right_tiebreak="rval",
        ).collect()
    }
    assert got == naive_asof_tiebreak_payload(left, right)
