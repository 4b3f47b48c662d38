"""Vector math over ``array<float>`` embedding columns — pure built-in
array lambdas, evaluated in whole-stage codegen (no UDF, no shuffle).

All arithmetic is done in DOUBLE with a sequential left-fold
(``F.aggregate``), so the result is deterministic for a given row —
unlike a groupBy-sum over exploded elements, whose reduction order varies
with partitioning.  Oracle parity: DuckDB's ``list_cosine_similarity``
computes the same formula in double; residual last-bit differences are
absorbed by rounding at the query layer (round to 6 dp before thresholding
or emitting).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _as_double(vec: Column) -> Column:
    return F.transform(vec, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Sequential-fold dot product in double precision."""
    return F.aggregate(
        F.zip_with(_as_double(a), _as_double(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine_similarity(a: Column, b: Column) -> Column:
    """cos(a,b) = a·b / (|a||b|); NULL when either norm is zero."""
    denominator = l2_norm(a) * l2_norm(b)
    return F.when(denominator > 0, dot(a, b) / denominator)
