"""Vector math over ``array<float/double>`` columns — pure JVM expressions.

``zip_with`` + ``aggregate`` keep the dot product inside Tungsten codegen;
no Python crossing, no UDF serialization. At 100 TB this is the difference
between a scan-bound job and a pickle-bound one. (A vectorized pandas-UDF
variant exists in operators/similarity.py for very high dimensions where
per-element codegen loses to BLAS.)
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def dot(a: Column | str, b: Column | str) -> Column:
    """Sum of element-wise products, computed in double precision."""
    prods = F.zip_with(_c(a), _c(b), lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, v: acc + v)


def l2_norm(a: Column | str) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column | str, b: Column | str) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))
