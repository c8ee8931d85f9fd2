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

from collections.abc import Callable, Hashable

from pyspark import StorageLevel
from pyspark.sql import DataFrame, SparkSession

_REGISTRY: dict[tuple, DataFrame] = {}


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
    full_key = (id(spark), key)
    df = _REGISTRY.get(full_key)
    if df is not None:
        return df
    df = builder().persist(storage or StorageLevel.MEMORY_AND_DISK)
    _REGISTRY[full_key] = df
    return df


def clear_caches() -> None:
    """Unpersist and forget every registered relation (all sessions)."""
    for df in _REGISTRY.values():
        try:
            df.unpersist()
        except Exception:
            pass  # session already stopped — nothing to release
    _REGISTRY.clear()
