"""Vector (embedding) column expressions — cosine similarity & friends.

Everything here is built from `zip_with`/`aggregate`/`transform` higher-order
functions: JVM-evaluated, Arrow-free, no Python in the hot path. Arrays are
cast to double first so the arithmetic is bit-identical to the DuckDB oracle
(which also upcasts FLOAT→DOUBLE before its list arithmetic).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def as_double(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.transform(c, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Left-to-right sequential sum of elementwise products (order matters for
    float reproducibility; both engines fold the list in index order)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))
