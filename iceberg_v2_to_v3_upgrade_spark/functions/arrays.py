"""Array math on embedding columns — pure built-in higher-order functions.

Everything here stays JVM-side (whole-stage codegen); no UDFs. Dot products
and norms are expressed with ``zip_with``/``aggregate`` so Catalyst can
pipeline them inside the same stage as the surrounding join/filter.

Precision note: embeddings are stored float32; every helper casts to
``array<double>`` first so the sequential left-fold here is bit-compatible
with the DuckDB oracle's DOUBLE[] math (same multiply/add order).
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def as_double_array(col: Column | str) -> Column:
    return F.col(col).cast("array<double>") if isinstance(col, str) else col.cast(
        "array<double>"
    )


def dot(a: Column, b: Column) -> Column:
    """Sequential-order dot product of two double arrays."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine_similarity(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def array_mean(a: Column) -> Column:
    """Mean of the array's elements."""
    return F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v) / F.size(a)


def dot_fixed(a: Column, b: Column, dim: int) -> Column:
    """Dot product for a statically known dimension, unrolled to a flat
    sum of element_at products.

    Unlike aggregate(zip_with(...)), this allocates no intermediate array
    per row — on an N^2 pairwise step (near-dup search) the HOF form was
    measured ~30x slower purely from per-pair allocations. Summation order
    matches the sequential fold, so results are bit-identical.
    """
    expr = F.element_at(a, 1) * F.element_at(b, 1)
    for i in range(2, dim + 1):
        expr = expr + F.element_at(a, i) * F.element_at(b, i)
    return expr
