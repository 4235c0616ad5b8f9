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


def dot_unrolled(a: Column, b: Column, d: int) -> Column:
    """``dot`` for a KNOWN static dimensionality: the same
    left-associated sum ``(((0 + x₁y₁) + x₂y₂) + …)`` emitted as a
    flat d-term arithmetic expression instead of a higher-order
    ``aggregate`` fold. Identical IEEE result (same additions, same
    order), but the flat expression whole-stage-codegens while the
    lambda fold is interpreted per element — ~an order of magnitude
    faster inside quadratic pair stages. Use wherever the embedding
    width is fixed (it always is for a given corpus)."""
    acc: Column = F.lit(0.0)
    for i in range(1, d + 1):
        acc = acc + F.element_at(a, i) * F.element_at(b, i)
    return acc


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
