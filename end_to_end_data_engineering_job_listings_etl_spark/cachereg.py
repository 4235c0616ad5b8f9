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

3. **Within-dataset state budget** (r9 verdict #1 — the r9 full sf10
   surface needed 24-name fresh-process chunks because NOTHING bounded
   same-dataset accumulation): modules register their evictor under a
   FAMILY name (``register_family``) and report memo activity
   (``touch_family``) plus unmanaged-heap estimates
   (``note_unmanaged`` — embedded Derby pages are invisible to the
   block manager). ``query_boundary`` — called by the registry's
   per-query wrapper, i.e. at the only point where no memo build is
   in flight — measures pinned storage (block-manager memSize +
   reported unmanaged bytes) and, when it exceeds
   $SPARK_GRAFT_STATE_BUDGET_MB (default 40% of driver max heap),
   evicts least-recently-touched families until back under budget.
   The two most-recently-touched families are kept (same-family
   query bursts — the registry walks families contiguously — keep
   their memo plus the catalog scans it nests over), so the
   steady-state bound is budget + the last two families' working
   sets. Under budget, nothing happens: at sf≤1 the whole
   surface fits and memo semantics are byte-identical to r9.
   ``query_boundary`` also drops terminated streaming-query handles
   (``spark.streams.resetTerminated()`` — retained progress buffers
   were part of the accumulated session state).
"""

from __future__ import annotations

import os
import time
import weakref
from collections.abc import Callable

from pyspark.sql import SparkSession

_Evictor = Callable[[SparkSession | None, "str | None"], None]
_EVICTORS: list[_Evictor] = []

# family name -> evictor (a subset of _EVICTORS, addressable for the
# within-dataset budget path)
_FAMILIES: dict[str, _Evictor] = {}
# per-session LRU of (sf_dir, family) memo touches, MRU last. Weakly
# keyed for the same reason as _LRU below.
_FAMILY_LRU: "weakref.WeakKeyDictionary[SparkSession, list[tuple[str, str]]]" = (
    weakref.WeakKeyDictionary()
)
# per-session unmanaged-heap estimates, family -> bytes (embedded
# Derby pages etc. — state the block manager can't see)
_UNMANAGED: "weakref.WeakKeyDictionary[SparkSession, dict[str, int]]" = (
    weakref.WeakKeyDictionary()
)

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


def register_family(family: str, fn: _Evictor) -> _Evictor:
    """Register a module's evictor under a FAMILY name so the
    within-dataset budget path (``query_boundary``) can evict it
    individually. The evictor also joins the plain fan-out registry,
    so session-stop and dataset-LRU eviction behave exactly as before.
    """
    _FAMILIES[family] = fn
    return register_evictor(fn)


def touch_family(spark: SparkSession, sf_dir: str, family: str) -> None:
    """Record a family memo access (hit or build) for the session's
    within-dataset LRU. Called from each module's memo chokepoint;
    cheap (list surgery, no JVM round-trip)."""
    lru = _FAMILY_LRU.setdefault(spark, [])
    key = (sf_dir, family)
    if lru and lru[-1] == key:
        return
    if key in lru:
        lru.remove(key)
    lru.append(key)


def note_unmanaged(spark: SparkSession, family: str, n_bytes: int) -> None:
    """Report (or clear, with 0) a family's unmanaged-heap estimate —
    driver-side state invisible to the block manager (embedded Derby's
    in-memory pages). Counted by the budget alongside pinned storage."""
    notes = _UNMANAGED.setdefault(spark, {})
    if n_bytes <= 0:
        notes.pop(family, None)
    else:
        notes[family] = int(n_bytes)


def unmanaged_estimates(spark: SparkSession) -> dict[str, int]:
    """Copy of the session's reported unmanaged-heap estimates
    (family -> bytes) — read by calibration probes that compare the
    honor-system estimate against measured heap growth."""
    return dict(_UNMANAGED.get(spark, {}))


def pinned_bytes(spark: SparkSession) -> int:
    """Session state the budget governs: block-manager memSize over
    every persisted RDD (memo persists + localCheckpoint pins; disk
    spill is not heap and is not counted) plus reported unmanaged
    estimates."""
    try:
        infos = spark.sparkContext._jsc.sc().getRDDStorageInfo()
        mem = sum(i.memSize() for i in infos)
    except Exception:  # noqa: BLE001 - stopped JVM pins nothing
        mem = 0
    return mem + sum(_UNMANAGED.get(spark, {}).values())


def state_budget_bytes(spark: SparkSession) -> int:
    """$SPARK_GRAFT_STATE_BUDGET_MB, default 40% of driver max heap —
    leaves the unified pool execution headroom plus unmanaged slack
    even when a query's working set peaks."""
    env = os.environ.get("SPARK_GRAFT_STATE_BUDGET_MB")
    if env:
        # tolerate a malformed override (ADVICE r10 #1): query_boundary
        # sits on the registry hot path, so a bad env var must fall
        # through to the heap-derived default, not fail every query
        try:
            return int(env) * 2**20
        except ValueError:
            pass
    try:
        max_heap = int(
            spark._jvm.java.lang.Runtime.getRuntime().maxMemory()
        )
    except Exception:  # noqa: BLE001
        max_heap = 8 * 2**30
    return int(max_heap * 0.40)


# Boundary observability (VERDICT r10 #7): a bounded in-process log of
# query_boundary outcomes so harnesses (bench.py, sweep scripts) can
# attribute eviction churn to the query that triggered it. Counters are
# cumulative for process lifetime; the event list keeps only boundaries
# that actually evicted (the no-op case is ~1 ms and unbounded in
# count — logging it would be the leak this module exists to prevent).
_BOUNDARY_COUNTS = {"boundaries": 0, "evicting_boundaries": 0, "evictions": 0, "evict_sec": 0.0}
_BOUNDARY_EVENTS: list[dict] = []
_BOUNDARY_EVENTS_CAP = 500


def boundary_stats() -> dict:
    """Snapshot of boundary activity since process start: cumulative
    counters plus the (capped) list of evicting-boundary events. Cheap;
    returns copies so callers can diff before/after a query."""
    return {
        "counts": dict(_BOUNDARY_COUNTS),
        "events": list(_BOUNDARY_EVENTS),
    }


def query_boundary(spark: SparkSession) -> dict:
    """Bound within-dataset session state at a SAFE point — between
    registry queries, where no memo build is in flight (evicting
    mid-build would release a half-built family's checkpoint pins and
    fail the query). Called by registry._pinned before every query.

    Always: drop terminated streaming-query handles (their retained
    progress buffers accumulate per stream drain). Then, only if
    pinned state exceeds the budget: evict least-recently-touched
    families until back under. The two most-recently-touched families
    are NEVER evicted here (see the loop comment) — same-family bursts
    keep their memo, and the worst-case bound is budget + the last two
    families' working sets (documented in the module docstring).

    Retained-frame hazard (ADVICE r10 #2): eviction here releases pins
    that DataFrames RETURNED BY EARLIER registry queries may still
    reference. Plain-persisted frames silently recompute on next
    access; localCheckpoint-pinned frames (operators/ids.py) and the
    dropped Derby landing FAIL-STOP instead — lineage was truncated, so
    recompute is impossible by design. A caller holding result frames
    across queries in an over-budget session must either re-invoke the
    registry query (always rebuilds from source) or raise
    $SPARK_GRAFT_STATE_BUDGET_MB; under budget nothing is ever
    released. Checkpoint pins are NOT downgraded to plain unpersist to
    dodge this: the pins exist to cut quadratic lineage (log-round
    label propagation), and keeping a recompute path would keep that
    lineage alive on the executors — the fail-stop is the cheaper,
    explicit contract (tests/test_edges.py pins it)."""
    try:
        spark.streams.resetTerminated()
    except Exception:  # noqa: BLE001 - no streaming, stopped JVM
        pass
    budget = state_budget_bytes(spark)
    before = pinned_bytes(spark)
    stats = {"before": before, "budget": budget, "evicted": []}
    _BOUNDARY_COUNTS["boundaries"] += 1
    if before <= budget:
        return stats
    t0 = time.monotonic()
    lru = _FAMILY_LRU.get(spark) or []
    # oldest-first; the TWO most-recently-touched entries are never
    # evicted here: a memo build touches its own family first and then
    # the catalog scans it loads through (star → catalog nesting), so
    # at query end the just-built family is the SECOND-most-recent
    # entry — protecting only the MRU would evict the very frames the
    # burst is about to reuse
    for sf_dir, family in list(lru[:-2]):
        fn = _FAMILIES.get(family)
        if fn is None:
            continue
        try:
            fn(spark, sf_dir or None)
        except Exception:  # noqa: BLE001 - same tolerance as evict()
            pass
        try:
            lru.remove((sf_dir, family))
        except ValueError:
            pass
        stats["evicted"].append(family)
        # unpersist is async for plain persists — poll the block
        # manager (capped) instead of a fixed settle (VERDICT r10
        # "what's wrong" #2) so the re-measure neither over-evicts the
        # next family for blocks already on their way out nor pays the
        # full wait when the release lands immediately
        if pinned_bytes(spark) <= budget:
            break
        deadline = time.monotonic() + 0.15
        while pinned_bytes(spark) > budget and time.monotonic() < deadline:
            time.sleep(0.03)
        if pinned_bytes(spark) <= budget:
            break
    stats["after"] = pinned_bytes(spark)
    stats["sec"] = round(time.monotonic() - t0, 3)
    if not stats["evicted"]:
        # Over budget but nothing evictable (LRU <= 2 families, all
        # protected): don't count this as an evicting boundary or burn
        # an event slot — a session stuck over budget would otherwise
        # fill the event cap with no-op entries and starve real
        # eviction attribution (ADVICE r11).
        return stats
    _BOUNDARY_COUNTS["evicting_boundaries"] += 1
    _BOUNDARY_COUNTS["evictions"] += len(stats["evicted"])
    _BOUNDARY_COUNTS["evict_sec"] = round(
        _BOUNDARY_COUNTS["evict_sec"] + stats["sec"], 3
    )
    if len(_BOUNDARY_EVENTS) < _BOUNDARY_EVENTS_CAP:
        _BOUNDARY_EVENTS.append(
            {
                "evicted": list(stats["evicted"]),
                "before_mb": round(before / 2**20),
                "after_mb": round(stats["after"] / 2**20),
                "budget_mb": round(budget / 2**20),
                "sec": stats["sec"],
            }
        )
    return stats


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
    # keep the family-level bookkeeping consistent with what the
    # fan-out just evicted
    for sess in list(_FAMILY_LRU) if spark is None else [spark]:
        lru = _FAMILY_LRU.get(sess)
        if lru is None:
            continue
        if sf_dir is None:
            _FAMILY_LRU.pop(sess, None)
            _UNMANAGED.pop(sess, None)
        else:
            _FAMILY_LRU[sess] = [
                (d, f) for d, f in lru if d and d != sf_dir
            ]


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
