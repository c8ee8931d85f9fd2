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

# Entries are keyed by a per-session token minted on first touch and
# stored AS AN ATTRIBUTE of the session object, so the token dies with
# the session and can never alias a later session the way a recycled
# id() could. A weak-keyed map cannot release anything here: the cached
# DataFrames strongly reference their SparkSession, so as long as a
# session's entries are registered the session itself is pinned by
# design. Lifecycle instead follows the active session: when a
# DIFFERENT session first touches the registry, every other session's
# entries are unpersisted and purged, so one stopped session never pins
# a second session's worth of driver objects. Two concurrently
# interleaved sessions would thrash rebuilds (correctness unaffected);
# the engine, tests, gate, and bench all run one session at a time.
_REGISTRY: dict[tuple, DataFrame] = {}
_VALUES: dict[tuple, object] = {}
_CURRENT_SID: list[int] = []  # 1-element holder for the active session token
_TOKEN_ATTR = "_gdifs_cache_token"
_NEXT_TOKEN = [0]


def _release(obj: object) -> None:
    """Release executor storage held by a memoized object, if any.

    ``shared_value`` is usually a driver-sized scalar, but a few callers
    (the recursive-CTE members) memoize localCheckpointed DataFrames
    whose blocks live on executors; dropping only the dict reference
    would leave those blocks to the ContextCleaner's GC cadence during
    long sweeps."""
    unpersist = getattr(obj, "unpersist", None)
    if callable(unpersist):
        try:
            unpersist()
        except Exception:
            pass  # session already stopped — nothing to release


def _purge_except(sid: int) -> None:
    for k in [k for k in _REGISTRY if k[0] != sid]:
        _release(_REGISTRY[k])
        del _REGISTRY[k]
    for k in [k for k in _VALUES if k[0] != sid]:
        _release(_VALUES[k])
        del _VALUES[k]


def _track(spark: SparkSession) -> int:
    sid = getattr(spark, _TOKEN_ATTR, None)
    if sid is None:
        _NEXT_TOKEN[0] += 1
        sid = _NEXT_TOKEN[0]
        setattr(spark, _TOKEN_ATTR, sid)
    if not _CURRENT_SID or _CURRENT_SID[0] != sid:
        _purge_except(sid)
        _CURRENT_SID[:] = [sid]
    return sid


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
    full = (_track(spark), key)
    df = _REGISTRY.get(full)
    if df is not None:
        return df
    df = builder().persist(storage or StorageLevel.MEMORY_AND_DISK)
    _REGISTRY[full] = df
    return df


def evict_prefix(spark: SparkSession, prefix: tuple) -> None:
    """Release every memoized value/relation of this session whose key
    TUPLE starts with ``prefix``. For memo families whose key embeds a
    version (mutation epoch, content fingerprint): without eviction the
    superseded versions' entries — and any executor blocks they hold —
    linger until ``clear_caches``, a slow leak in long sessions that
    mutate repeatedly (the index-lifecycle members)."""
    sid = _track(spark)

    def _stale(k: tuple) -> bool:
        key = k[1]
        return (
            k[0] == sid
            and isinstance(key, tuple)
            and key[: len(prefix)] == prefix
        )

    for store in (_VALUES, _REGISTRY):
        for k in [k for k in store if _stale(k)]:
            _release(store[k])
            del store[k]


def has_value(spark: SparkSession, key: Hashable) -> bool:
    """True when ``shared_value`` already memoized ``key`` this session
    (no build). Lets version-keyed callers evict superseded entries
    exactly once, when a new version first appears."""
    return (_track(spark), key) in _VALUES


def shared_value(spark: SparkSession, key: Hashable, builder: Callable[[], object]):
    """Memoize a value per (session, key): the first call runs
    ``builder`` (typically one collect job), later calls in the same
    session return the cached value with zero jobs. Values are usually
    driver-sized scalars, but checkpointed/persisted DataFrames are also
    supported: ``clear_caches()`` calls ``.unpersist()`` on any value
    that exposes it, so their executor blocks are released eagerly
    rather than by ContextCleaner GC."""
    full = (_track(spark), key)
    if full not in _VALUES:
        _VALUES[full] = builder()
    return _VALUES[full]


def clear_caches() -> None:
    """Unpersist and forget every registered relation (all sessions),
    including DataFrames memoized through ``shared_value``."""
    for df in _REGISTRY.values():
        _release(df)
    for v in _VALUES.values():
        _release(v)
    _REGISTRY.clear()
    _VALUES.clear()
