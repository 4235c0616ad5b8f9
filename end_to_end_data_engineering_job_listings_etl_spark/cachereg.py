"""Session-scoped cache lifecycle: central eviction for the per-
(session, sf_dir) memo caches (catalog._DIST_CACHE, plans/star.py's
landing/plan/dims memos, plans/joblistings.py's star memo).

The memo convention persists frames for process lifetime — right for
a bench/driver process that visits one or two datasets, wrong for a
long-lived multi-tenant driver that walks many (VERDICT r4 item 4:
"nothing calls the clear_caches hooks automatically"). This module
wires two automatic paths:

1. **LRU dataset cap** — every ``catalog.load_table`` call records a
   (session, sf_dir) touch; when a session has touched more than
   $SPARK_GRAFT_CACHE_DATASETS (default 4) distinct sf_dirs, the
   least-recently-used dataset's cached frames are evicted and
   unpersisted. The cap is per-session, so a multi-tenant driver's
   cache footprint is bounded by cap × per-dataset working set
   regardless of how many datasets it walks.
2. **Session-stop hook** — ``session.get_spark`` wraps the session's
   ``stop`` so closing the session evicts everything it pinned first
   (persisted frames die with the session's executors anyway, but the
   Python-side memo dicts would otherwise retain dead DataFrame
   handles forever — a driver-side leak).

Eviction invalidates externally-held DataFrames from the evicted
dataset only in the weak sense that their cached/checkpointed blocks
are dropped: plain-persisted frames silently recompute, while
localCheckpoint-pinned frames (operators/ids.py) FAIL-STOP on next
access — the designed loss semantics (tests/test_edges.py exercises
it). Re-running a registry query after eviction always rebuilds from
source and re-pins.

Modules register an evictor ``fn(spark, sf_dir)`` (either may be
None = wildcard) at import time; ``evict`` fans out to all of them.
"""

from __future__ import annotations

import os
import weakref
from collections.abc import Callable

from pyspark.sql import SparkSession

_Evictor = Callable[[SparkSession | None, "str | None"], None]
_EVICTORS: list[_Evictor] = []

# Most-recent-last sf_dirs per live session. WEAKLY keyed by the
# session object (ADVICE r5 item 3): a session that is stopped via
# sc.stop() (bypassing the hooked spark.stop), never stopped, or
# created before hook_session must not have its _LRU entry — and,
# through the evictors, its registered memo frames — retained for
# process lifetime. Weak keying drops the entry when the last user
# reference dies; ``touch`` additionally prunes sessions whose
# SparkContext reports stopped (evictors are exception-tolerant, so a
# dead JVM can't wedge eviction).
_LRU: "weakref.WeakKeyDictionary[SparkSession, list[str]]" = (
    weakref.WeakKeyDictionary()
)


def _is_stopped(sess: SparkSession) -> bool:
    try:
        return bool(sess.sparkContext._jsc.sc().isStopped())
    except Exception:  # noqa: BLE001 - unreachable JVM == stopped
        return True


def register_evictor(fn: _Evictor) -> _Evictor:
    """Register a module's cache-eviction hook. Idempotent per fn."""
    if fn not in _EVICTORS:
        _EVICTORS.append(fn)
    return fn


def evict(spark: SparkSession | None = None, sf_dir: str | None = None) -> None:
    """Evict (and unpersist) every registered module cache matching
    the (session, dataset) scope; ``None`` is a wildcard on either
    axis. ``evict()`` with no args clears the process. Evictor
    failures are swallowed per-fn: a stopped session's unpersist
    raising must still let every other module drop its (now dead)
    handles."""
    for fn in _EVICTORS:
        try:
            fn(spark, sf_dir)
        except Exception:  # noqa: BLE001
            pass
    for sess in list(_LRU) if spark is None else [spark]:
        dirs = _LRU.get(sess)
        if dirs is None:
            continue
        if sf_dir is None:
            _LRU.pop(sess, None)
        else:
            _LRU[sess] = [d for d in dirs if d != sf_dir]


def dataset_cap() -> int:
    return int(os.environ.get("SPARK_GRAFT_CACHE_DATASETS", "4"))


def touch(spark: SparkSession, sf_dir: str) -> None:
    """Record a dataset access; evict the least-recently-used
    dataset's caches once the session exceeds the dataset cap. Called
    from ``catalog.load_table`` — the chokepoint every query path
    reads tables through. Also prunes entries for OTHER sessions whose
    SparkContext has stopped (e.g. sc.stop() bypassed the hooked
    spark.stop): their module memos hold dead DataFrame handles."""
    for sess in [s for s in list(_LRU) if s is not spark and _is_stopped(s)]:
        evict(sess)
    lru = _LRU.setdefault(spark, [])
    if lru and lru[-1] == sf_dir:
        return  # hot path: repeated loads of the current dataset
    if sf_dir in lru:
        lru.remove(sf_dir)
    lru.append(sf_dir)
    cap = dataset_cap()
    while len(lru) > cap:
        old = lru.pop(0)
        for fn in _EVICTORS:
            try:
                fn(spark, old)
            except Exception:  # noqa: BLE001 - same tolerance as evict()
                pass


def hook_session(spark: SparkSession) -> None:
    """Wrap ``spark.stop`` so session shutdown evicts the session's
    caches first. Safe to call repeatedly (guards on a marker)."""
    if getattr(spark, "_sg_cache_stop_hooked", False):
        return
    orig_stop = spark.stop

    def stop() -> None:
        try:
            evict(spark)
        finally:
            orig_stop()

    spark.stop = stop
    spark._sg_cache_stop_hooked = True
