"""Distributed PCA (top principal direction) via an exact integer Gram
matrix and a driver-side power iteration.

The 100 TB decomposition: the ONLY corpus-sized work is the Gram/second-
moment matrix G[i][j] = sum over rows of q_i * q_j, computed on QUANTIZED
components (floor(x * 10000) — the same integer-sum discipline as
embedding_dimension_stats) so the reduction is an exact integer hash
aggregate whose result is independent of partition order. G is dim x dim
(64 x 64 here) — a fixed-size reduce output, so collecting it is
legitimate driver traffic (it IS the reduction result, not a data scan).
The power iteration then runs on the tiny G in pure Python with a
spelled-out left-fold operation order, which the DuckDB oracle replays
verbatim as a recursive CTE — two independent executions of the same
IEEE arithmetic, bit-identical end to end.

Scaling the matrix by 2^-48 (exact in binary floating point) keeps the
un-normalized iteration inside double range without per-step
normalization, which would otherwise need an aggregate inside the
recursive step on the SQL side.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: component quantizer (4 decimal digits, matches embedding_dimension_stats)
QUANT = 10000.0
#: power-of-two down-scale applied to Gram entries (exact in IEEE double);
#: keeps the first un-normalized matrix-vector product well inside double
#: range for corpus-scale Gram magnitudes (entries ~1e9..1e12).
SCALE_POW2 = 48
#: power-iteration steps. Each step renormalizes by the max-|component|
#: (one division per element — NOT exact, but both engines divide the
#: bit-identical raw vector by the bit-identical scalar, so parity holds
#: and magnitudes stay ~1 forever). 600 steps cover eigengap ratios down
#: to ~0.99 (residual (l2/l1)^600 < 1e-2; measured 0.984 at sf0.01).
ITERS = 600


def quantized_components(vec, dim: int):
    """qv[j] = floor(double(vec[j]) * 10000) as bigint, for j in 0..dim-1."""
    return [
        F.floor(F.col(vec)[j].cast("double") * F.lit(QUANT)).cast("bigint")
        for j in range(dim)
    ]


def gram_matrix_int(emb: DataFrame, vec_col: str = "embedding", dim: int = 64) -> DataFrame:
    """(i, j, g): exact integer Gram matrix of the quantized embedding
    matrix. Double posexplode + one hash aggregate on (i, j): the
    shuffle carries dim^2 x tasks partial sums regardless of corpus
    size (map-side combine), and the scan is a pure map. Symmetry
    (g[i][j] = g[j][i]) is NOT exploited here for clarity; at very
    large dim compute j >= i and mirror."""
    qarr = F.transform(
        F.col(vec_col), lambda x: F.floor(x.cast("double") * F.lit(QUANT)).cast("bigint")
    )
    a = emb.select(qarr.alias("q"))
    x = a.select(F.posexplode("q").alias("i", "qi"), F.col("q"))
    y = x.select("i", "qi", F.posexplode("q").alias("j", "qj"))
    return y.groupBy("i", "j").agg(F.sum(F.col("qi") * F.col("qj")).alias("g"))


def power_iteration_unit(gram_rows, dim: int = 64) -> list[float]:
    """Top eigenvector of the scaled Gram matrix, as a unit vector with a
    deterministic sign (component of largest magnitude made positive,
    lowest index on ties). Pure Python with explicit left-fold sums —
    the operation order the DuckDB oracle replays exactly."""
    g = [[0] * dim for _ in range(dim)]
    for i, j, v in gram_rows:
        g[i][j] = v
    scale = 2.0 ** SCALE_POW2
    # cast to double FIRST, then exact power-of-two divide — mirrors
    # DuckDB's CAST(g AS DOUBLE) / 2^48.
    m = [[float(g[i][j]) / scale for j in range(dim)] for i in range(dim)]
    u = [1.0] * dim
    for _ in range(ITERS):
        raw = []
        for i in range(dim):
            s = m[i][0] * u[0]
            for j in range(1, dim):
                s = s + m[i][j] * u[j]
            raw.append(s)
        amax = abs(raw[0])
        for x in raw[1:]:
            a = abs(x)
            if a > amax:
                amax = a
        u = [x / amax for x in raw]
    s = u[0] * u[0]
    for j in range(1, dim):
        s = s + u[j] * u[j]
    nrm = math.sqrt(s)
    best = 0
    for i in range(1, dim):
        if abs(u[i]) > abs(u[best]):
            best = i
    sgn = -1.0 if u[best] < 0 else 1.0
    return [(x / nrm) * sgn for x in u]


def top_component_unit(emb: DataFrame, vec_col: str = "embedding", dim: int = 64) -> list[float]:
    """Distributed Gram -> driver power iteration -> unit direction."""
    rows = gram_matrix_int(emb, vec_col, dim).collect()
    return power_iteration_unit([(r["i"], r["j"], r["g"]) for r in rows], dim)


def projection_expr(vec_col: str, unit: list[float], dim: int):
    """Left-fold chain: sum_j double(qv[j]) * unit[j], un-quantized by
    /10000 at the end. Matches the oracle's spelled chain term for term."""
    q = quantized_components(vec_col, dim)
    proj = q[0].cast("double") * F.lit(unit[0])
    for j in range(1, dim):
        proj = proj + q[j].cast("double") * F.lit(unit[j])
    return proj / F.lit(QUANT)
