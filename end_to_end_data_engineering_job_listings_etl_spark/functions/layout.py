"""Multi-dimensional data layout: z-order (Morton) interleaved sort
keys as pure column expressions.

A single-column sort-clustered layout (repartitionByRange +
sortWithinPartitions) gives parquet min/max skipping on that column
only; interleaving the bits of several normalized columns into one
sort key spreads locality across ALL of them, so narrow predicates on
ANY participating column skip row groups. The classic trade: each
dimension prunes less than a dedicated sort would, but every
dimension prunes (measured in tests/test_layout.py: a 10% slice on
either z-column decodes <70% of the table, where the single-sorted
layout decodes 100% on its non-sort column).

Built as SQL text (one parser call), not stacked Column ops — the
repo's standard for expression-heavy plans (hundreds of py4j RPCs
otherwise; see README scale notes).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zorder_key(
    cols: Sequence[str],
    maxes: Sequence[int],
    bits: int = 16,
) -> Column:
    """Morton key of ``cols``: each column is scaled to [0, 2^bits)
    by its known max (collect it once upstream — at 100 TB keep
    per-partition stats or use a fixed domain), then bits interleave
    round-robin so equal prefixes mean proximity in every dimension.

    ``bits * len(cols)`` must stay ≤ 62 (bigint)."""
    n = len(cols)
    if bits * n > 62:
        raise ValueError("zorder_key: bits * len(cols) must be <= 62")
    norm = [
        f"CAST({c} * {(1 << bits) - 1} / {int(m)} AS BIGINT)"
        for c, m in zip(cols, maxes)
    ]
    terms = []
    for i in range(bits):
        for j, e in enumerate(norm):
            terms.append(f"shiftleft(shiftright({e}, {i}) & 1, {i * n + j})")
    return F.expr(" + ".join(terms))


def write_zordered(
    df: DataFrame,
    path: str,
    cols: Sequence[str],
    maxes: Sequence[int],
    num_files: int = 16,
    bits: int = 16,
) -> None:
    """Write ``df`` as parquet clustered on the z-order key of
    ``cols``: range-partition on the key (files own contiguous
    z-ranges) and sort within files (page-index granularity). The key
    itself is dropped — it is a layout artifact, not data."""
    z = df.withColumn("__z", zorder_key(cols, maxes, bits))
    (
        z.repartitionByRange(num_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(path)
    )
