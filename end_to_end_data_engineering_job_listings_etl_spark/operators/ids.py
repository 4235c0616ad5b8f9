"""Distributed global ordinals: ``row_number() OVER (ORDER BY ...)``
values WITHOUT the single-partition window exchange.

The reference assigns surrogate/primary keys with a global
``row_number`` (``dags/spark_etl_script.py:95-168``), which Spark
executes as a one-partition WindowExec ("No Partition Defined") — a
funnel that caps at one task regardless of cluster size. At 100 TB a
fact PK assignment would push every key through that task.

The scale path here keeps the VALUES identical (so every existing
ANSI-SQL oracle still matches) and removes the funnel:

1. ``repartitionByRange`` on the ordering key — partitions become
   ordered, non-overlapping key ranges (Spark samples boundaries;
   where they land does not affect the final ordinal).
2. ``row_number`` / running-sum *within* each partition — parallel,
   whole-stage-codegen windows partitioned by ``spark_partition_id``.
3. Per-partition totals (one tiny agg, ≤ #partitions rows) turned
   into exclusive prefix offsets and broadcast back.

Ordinal = within-partition number + offset of all lower ranges — the
exact global ``row_number`` (ties co-locate: range partitioning sends
equal keys to one partition, matching the global window's
arbitrary-within-ties semantics).

Cost: one extra narrow shuffle (the range exchange) plus a sampling
pass, both O(rows/partitions) per task. At 1000 executors the old plan
is 1 task wide; this one is cluster-wide.

Correctness hinge: ``spark_partition_id`` is only meaningful per
MATERIALIZATION — two plan subtrees consuming the same
``repartitionByRange`` can see DIFFERENT physical layouts (AQE
coalesces each query stage independently; exchange reuse is not
guaranteed), which silently mis-aligns the offsets and yields
duplicate/gapped ordinals. The ranged+pid frame is therefore
``localCheckpoint``-pinned before fan-out: one materialization, both
consumers read the same pids, and lineage truncation makes loss
fail-stop instead of silently renumbering. (The checkpointed frame is
the NARROW key projection, not the caller's wide rows.)
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_PID = "__range_pid"


def _as_sort_exprs(order_cols: Sequence[Column | str]) -> list[Column]:
    # Spark's Window.orderBy defaults to ASC NULLS FIRST; pin the same
    # order explicitly so the range exchange and the in-partition
    # window agree (and the contract is visible, not incidental).
    return [
        (F.col(c) if isinstance(c, str) else c).asc_nulls_first()
        for c in order_cols
    ]


def _n_parts(df: DataFrame) -> int:
    return int(df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32"))


def release_pins(frames: Sequence[DataFrame]) -> None:
    """Unpersist the checkpoint blocks behind localCheckpoint-pinned
    frames (``DataFrame.unpersist`` can't: a checkpointed frame is a
    ``LogicalRDD``, not a cache-manager entry — its blocks are pinned
    at the RDD level). Used by the memo caches' eviction hooks so an
    evicted dataset leaves ZERO orphaned persisted RDDs. Plain
    persisted frames in ``frames`` are unpersisted normally. After
    release, a retained handle to a pinned frame FAIL-STOPS on next
    access (the module's designed loss semantics)."""
    for df in frames:
        try:
            df.unpersist()
            plan = df._jdf.queryExecution().analyzed()
            if plan.getClass().getSimpleName() == "LogicalRDD":
                plan.rdd().unpersist(True)
        except Exception:  # noqa: BLE001 - release is best-effort:
            # a stopped session's frames are already gone with its
            # executors; eviction of a dead session must not raise
            pass


def _ranged_with_pid(
    df: DataFrame,
    order_cols: Sequence[Column | str],
    n_parts: int | None,
    pin_input: bool = True,
    pinned_out: list[DataFrame] | None = None,
) -> tuple[DataFrame, list[Column]]:
    """Range-repartition on the ordering key and PIN the resulting
    (pid, row) assignment with a lazy localCheckpoint — see module
    docstring for why an unpinned pid is a correctness bug."""
    sort_exprs = _as_sort_exprs(order_cols)
    # Pin the (narrow) input too: repartitionByRange's boundary-sampling
    # pass and the exchange itself would otherwise EACH recompute the
    # caller's upstream (typically a distinct over a join chain) — with
    # the input checkpointed, upstream runs once and both passes read
    # the materialized keys. Perf-only (the CORRECTNESS pin is the one
    # on the ranged+pid frame below): callers whose upstream is already
    # a persisted frame (dim distincts over the cached landing) pass
    # pin_input=False and skip this materialization's job entirely.
    pinned = df.localCheckpoint(eager=False) if pin_input else df
    ranged = (
        pinned.repartitionByRange(n_parts or _n_parts(df), *sort_exprs)
        .select(F.spark_partition_id().alias(_PID), "*")
        .localCheckpoint(eager=False)
    )
    if pinned_out is not None:
        if pin_input:
            pinned_out.append(pinned)
        pinned_out.append(ranged)
    return ranged, sort_exprs


def _with_offsets(ranged: DataFrame, weight: Column) -> DataFrame:
    """Per-partition exclusive prefix totals of ``weight``, broadcast
    back onto ``ranged`` as ``__offset``. The offsets frame is at most
    #partitions rows; its prefix sum is a broadcast triangular
    self-join (O(P²) on ≤ a few hundred rows) rather than a cumulative
    window — a constant-partitioned window gets its foldable key
    optimized away and regenerates the exact single-partition exchange
    this module exists to remove."""
    totals = ranged.groupBy(_PID).agg(F.sum(weight).alias("__total"))
    a, b = totals.alias("a"), totals.alias("b")
    offsets = (
        a.join(F.broadcast(b), F.col(f"b.{_PID}") < F.col(f"a.{_PID}"), "left")
        .groupBy(F.col(f"a.{_PID}").alias(_PID))
        .agg(F.coalesce(F.sum("b.__total"), F.lit(0)).alias("__offset"))
    )
    return ranged.join(F.broadcast(offsets), _PID)


def ranked_ids(
    df: DataFrame,
    order_cols: Sequence[Column | str],
    id_name: str,
    start: int = 0,
    n_parts: int | None = None,
    pin_input: bool = True,
    pinned_out: list[DataFrame] | None = None,
) -> DataFrame:
    """``start + row_number() OVER (ORDER BY order_cols)`` as an INT
    column, computed with the range/two-phase plan above. Output
    columns: ``df``'s columns plus ``id_name``. ``pin_input=False``
    skips the input checkpoint when the caller's upstream is already
    persisted (cheap to scan twice). ``pinned_out`` receives the
    checkpointed frames so memoizing callers can ``release_pins``
    them on eviction — without it the checkpoint blocks live until
    the JVM's ContextCleaner notices the plan is garbage."""
    ranged, sort_exprs = _ranged_with_pid(
        df, order_cols, n_parts, pin_input, pinned_out
    )
    w_in = Window.partitionBy(_PID).orderBy(*sort_exprs)
    numbered = ranged.select("*", F.row_number().over(w_in).alias("__rn"))
    out = _with_offsets(numbered, F.lit(1))
    return out.select(
        *df.columns,
        (F.col("__rn") + F.col("__offset") + F.lit(start))
        .cast("int")
        .alias(id_name),
    )


def ranked_ids_grouped(
    df: DataFrame,
    group_col: str,
    order_cols: Sequence[Column | str],
    id_name: str,
    start: int = 0,
    n_parts: int | None = None,
    pin_input: bool = True,
    pinned_out: list[DataFrame] | None = None,
) -> DataFrame:
    """Per-group ``start + row_number() OVER (PARTITION BY group
    ORDER BY order_cols)`` with the same range/two-phase plan — the
    BATCHED surrogate-key assigner: a star build that needs
    independent dense SKs for N dimensions unions their (tagged,
    normalized) keys and ranks them all in ONE sampling pass, ONE
    range exchange, ONE offsets broadcast, instead of N of each.

    The range exchange keys on (group, order_cols) so a group's keys
    occupy contiguous partition ranges; the in-partition window
    partitions by (pid, group) and offsets accumulate per group over
    that group's own lower partitions only — values are identical to
    running ``ranked_ids`` per group separately."""
    sort_exprs = _as_sort_exprs([group_col, *order_cols])
    in_group_exprs = _as_sort_exprs(order_cols)
    pinned = df.localCheckpoint(eager=False) if pin_input else df
    ranged = (
        pinned.repartitionByRange(n_parts or _n_parts(df), *sort_exprs)
        .select(F.spark_partition_id().alias(_PID), "*")
        .localCheckpoint(eager=False)
    )
    if pinned_out is not None:
        if pin_input:
            pinned_out.append(pinned)
        pinned_out.append(ranged)
    w_in = Window.partitionBy(_PID, group_col).orderBy(*in_group_exprs)
    numbered = ranged.select("*", F.row_number().over(w_in).alias("__rn"))
    totals = ranged.groupBy(group_col, _PID).agg(F.count("*").alias("__total"))
    a, b = totals.alias("a"), totals.alias("b")
    offsets = (
        a.join(
            F.broadcast(b),
            (F.col(f"a.{group_col}") == F.col(f"b.{group_col}"))
            & (F.col(f"b.{_PID}") < F.col(f"a.{_PID}")),
            "left",
        )
        .groupBy(
            F.col(f"a.{group_col}").alias(group_col),
            F.col(f"a.{_PID}").alias(_PID),
        )
        .agg(F.coalesce(F.sum("b.__total"), F.lit(0)).alias("__offset"))
    )
    out = numbered.join(F.broadcast(offsets), [group_col, _PID])
    return out.select(
        *df.columns,
        (F.col("__rn") + F.col("__offset") + F.lit(start))
        .cast("int")
        .alias(id_name),
    )


def exclusive_prefix_sum(
    df: DataFrame,
    order_cols: Sequence[Column | str],
    weight_col: str,
    out_name: str,
    n_parts: int | None = None,
    pin_input: bool = True,
    pinned_out: list[DataFrame] | None = None,
) -> DataFrame:
    """``sum(weight) OVER (ORDER BY order_cols ROWS UNBOUNDED
    PRECEDING AND 1 PRECEDING)`` (0 for the first row) via the same
    two-phase plan — the running-start form used to seed dense key
    blocks (e.g. first ordinal of each duplicate-tuple group).
    ``pin_input`` / ``pinned_out`` as in ``ranked_ids``."""
    ranged, sort_exprs = _ranged_with_pid(
        df, order_cols, n_parts, pin_input, pinned_out
    )
    w_in = (
        Window.partitionBy(_PID)
        .orderBy(*sort_exprs)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    local = ranged.select(
        "*", F.coalesce(F.sum(weight_col).over(w_in), F.lit(0)).alias("__local")
    )
    out = _with_offsets(local, F.col(weight_col))
    return out.select(
        *df.columns, (F.col("__local") + F.col("__offset")).alias(out_name)
    )
