"""Vector (array<float>) expressions: dot product, norm, cosine.

Beyond-reference similarity-search layer (BASELINE.json north star).
Pure `F.zip_with`/`F.aggregate` expressions — JVM-evaluated per row, no
Python, no UDF. Used by operators/similarity.py for brute-force and
LSH-bucketed ANN.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    """Elementwise dot product of two array<numeric> columns."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def sq_l2(a: Column, b: Column) -> Column:
    """Squared L2 distance of two array<numeric> columns — the same
    left-to-right ``F.aggregate`` fold as :func:`dot`, so a DuckDB
    ``list_aggregate(list_transform(range ...), 'sum')`` over the same
    index order reproduces it bit for bit."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v)
    )


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity; null-safe on zero vectors (returns null)."""
    denom = norm(a) * norm(b)
    return F.when(denom != 0, dot(a, b) / denom)


def lit_vector(vec: Sequence[float]) -> Column:
    """A literal query vector as an array<double> column."""
    return F.array(*[F.lit(float(v)) for v in vec])
