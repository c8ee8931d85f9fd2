"""Session-scoped registry for persisted intermediate relations.

Round-3 lesson: query builders that ``persist()``/``cache()`` their
shared intermediates (exploded shingles, MinHash signatures, token
counts) leaked one corpus-sized persisted copy PER INVOCATION in a
long-lived session — the correctness gate, the bench loop, and any
resident cluster all call each query repeatedly, so storage memory
filled with dead copies and every query after the dedup family slowed
1.3-1.6×.

The registry memoizes the persisted DataFrame per (session, key): the
first call builds and persists, every later call in the same session
reuses the SAME relation (no rebuild, no second copy, no "Asked to
cache already cached data" churn). ``clear_caches()`` unpersists and
forgets everything — call it when the underlying inputs change or to
release memory between pipeline phases.

Scale note (100 TB): this is the single-process analogue of
materializing a shared intermediate once per job; storage level stays
the caller's choice (``DISK_ONLY`` for corpus-sized relations on a
real cluster — see ``dedup.DEFAULT_SHINGLE_STORAGE``).
"""

from __future__ import annotations

import weakref
from collections.abc import Callable, Hashable

from pyspark import StorageLevel
from pyspark.sql import DataFrame, SparkSession

# Keyed weakly on the live SparkSession object: when a session is stopped
# and garbage-collected, its entries vanish with it, so a new session that
# happens to reuse the same id() can never observe a stale DataFrame bound
# to the dead session, and dead-session entries don't pin driver objects.
_REGISTRY: "weakref.WeakKeyDictionary[SparkSession, dict[Hashable, DataFrame]]" = (
    weakref.WeakKeyDictionary()
)


def shared_persist(
    spark: SparkSession,
    key: Hashable,
    builder: Callable[[], DataFrame],
    storage: StorageLevel | None = None,
) -> DataFrame:
    """Return the session's persisted relation for ``key``, building and
    persisting it on first use. ``builder`` must be deterministic for
    the key (the key should encode every input that changes the result,
    e.g. ``("shingles", sf_dir)``)."""
    per_session = _REGISTRY.get(spark)
    if per_session is None:
        per_session = {}
        _REGISTRY[spark] = per_session
    df = per_session.get(key)
    if df is not None:
        return df
    df = builder().persist(storage or StorageLevel.MEMORY_AND_DISK)
    per_session[key] = df
    return df


# Driver-held scalar results (model constants, centroid lists — KB-sized),
# memoized per session with the same weak-keyed lifetime as the relations.
_VALUES: "weakref.WeakKeyDictionary[SparkSession, dict[Hashable, object]]" = (
    weakref.WeakKeyDictionary()
)


def shared_value(spark: SparkSession, key: Hashable, builder: Callable[[], object]):
    """Memoize a driver-sized value (NOT a DataFrame) per (session, key):
    the first call runs ``builder`` (typically one collect job), later
    calls in the same session return the cached value with zero jobs."""
    per_session = _VALUES.get(spark)
    if per_session is None:
        per_session = {}
        _VALUES[spark] = per_session
    if key not in per_session:
        per_session[key] = builder()
    return per_session[key]


def clear_caches() -> None:
    """Unpersist and forget every registered relation (all live sessions)."""
    for per_session in list(_REGISTRY.values()):
        for df in per_session.values():
            try:
                df.unpersist()
            except Exception:
                pass  # session already stopped — nothing to release
    _REGISTRY.clear()
    _VALUES.clear()
