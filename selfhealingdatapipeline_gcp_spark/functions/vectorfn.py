"""Vector expression library for array<float> embedding columns.

Dot products and norms are explicit left-to-right folds over
double-cast arrays (``zip_with`` + ``aggregate``) so any engine —
Spark, DuckDB — produces bit-identical doubles. All JVM-side; no
Python UDFs in the row path.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def to_double(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.transform(c, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Sequential-fold dot product. DuckDB twin:
    list_reduce([CAST(0.0 AS DOUBLE)] || list_transform(range(1,
    len(a)+1), i -> a[i]*b[i]), (acc, x) -> acc + x)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2sq(a: Column, b: Column) -> Column:
    """Squared L2 distance as a sequential fold (same determinism
    contract as ``dot``). DuckDB twin:
    list_reduce([CAST(0.0 AS DOUBLE)] || list_transform(range(1,
    len(a)+1), i -> (a[i]-b[i])*(a[i]-b[i])), (acc, x) -> acc + x)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column, a_norm: Column, b_norm: Column) -> Column:
    """Cosine from precomputed norms (compute norms once per vector,
    not once per pair — at 100 TB the norm column is materialized in
    the scan projection)."""
    return dot(a, b) / (a_norm * b_norm)
