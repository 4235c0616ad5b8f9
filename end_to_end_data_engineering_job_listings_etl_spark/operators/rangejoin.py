"""Binned range join: interval-predicate joins without the cartesian.

Beyond-reference operator (SURVEY.md custom-op tier (a)): Spark plans a
bare ``l.ts BETWEEN r.start AND r.end`` join as a broadcast
nested-loop or cartesian — O(|L|·|R|) at scale. The standard fix is to
discretize time into bins no smaller than the maximum interval width:
each right-side interval explodes to the bins it overlaps, the left
side maps to its single bin, the join becomes an EQUI join on the bin
(hash shuffle, co-partitioned) and the exact range predicate is
re-applied as a residual filter. Work drops to pairs sharing a bin —
the same strategy behind production range-join optimizers.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def range_join_binned(
    left: DataFrame,
    right: DataFrame,
    left_ts: str,
    right_start: Column,
    right_end: Column,
    bin_width: str = "month",
) -> DataFrame:
    """Join every left row to the right rows whose
    ``[right_start, right_end)`` interval contains ``left_ts``.

    Each interval explodes to EVERY bin it overlaps (a calendar-width
    interval can straddle three month bins — e.g. Oct 31 + 31 days ends
    Dec 1 — so endpoints alone are not enough). Bin count per interval
    stays small as long as ``bin_width`` is on the order of the
    interval width. Returns the joined frame with all columns from both
    sides; the caller projects/aggregates."""
    r = right.withColumn("__start", right_start).withColumn("__end", right_end)
    r = r.withColumn(
        "__bin",
        F.explode(
            F.sequence(
                F.date_trunc(bin_width, F.col("__start")),
                F.date_trunc(bin_width, F.col("__end")),
                F.expr(f"INTERVAL 1 {bin_width}"),
            )
        ),
    )
    l = left.withColumn("__bin", F.date_trunc(bin_width, F.col(left_ts)))
    joined = l.join(r, "__bin").filter(
        (F.col(left_ts) >= F.col("__start")) & (F.col(left_ts) < F.col("__end"))
    )
    return joined.drop("__bin", "__start", "__end")
