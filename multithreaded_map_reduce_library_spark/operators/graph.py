"""Iterative graph algorithms over edge-list DataFrames.

Reference parity note: the reference has no joins and no iteration
(SURVEY.md §2.2 — its one dataflow is scan→shuffle→count, distwc.c:8-35);
these extend the engine for graph-shaped corpus work: PageRank ranks
documents inside a near-duplicate cluster (keep the most central copy),
and complements operators/dedup.py::connected_components.

Scale design: every iteration is a join + groupBy on the edge key —
fully distributed, no driver-side data. ``localCheckpoint`` truncates
lineage each round so the plan does not grow with the iteration count
(the classic iterative-Spark failure mode: analysis time explodes after
~20 unchecked iterations). Edge and degree tables are computed once and
reused; at cluster scale they would be cached/persisted explicitly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: PageRank constants — spelled as the exact doubles the oracle SQL uses
#: (CAST(0.85 AS DOUBLE)); (1 - 0.85) in Python is 0.15000000000000002,
#: which would drift the cross-engine hash, so never write `1 - DAMPING`.
DAMPING = 0.85
RESET = 0.15


def pagerank(edges: DataFrame, iters: int = 5) -> DataFrame:
    """PageRank over an undirected edge list ``(id_a, id_b)``.

    Returns ``(doc, deg, pagerank)`` for every vertex that appears in an
    edge. Each of the ``iters`` rounds distributes each vertex's rank
    equally over its neighbors (rank/degree), sums incoming
    contributions per vertex (one shuffle), and applies the damped
    update ``RESET/n + DAMPING * incoming``. Vertices all have degree
    >= 1 by construction, so there is no dangling-mass term.

    The single driver-side action is the vertex count ``n`` (one long) —
    the rank vectors themselves never leave the cluster.
    """
    both = edges.selectExpr("id_a AS u", "id_b AS v").union(
        edges.selectExpr("id_b AS u", "id_a AS v")
    )
    both = both.localCheckpoint()
    deg = both.groupBy("u").agg(F.count("*").alias("deg")).localCheckpoint()
    n = deg.count()
    ranks = deg.select("u", F.lit(1.0 / n).alias("r"))
    for _ in range(iters):
        contribs = (
            both.join(ranks.join(deg, "u"), "u")
            .select(F.col("v").alias("u"), (F.col("r") / F.col("deg")).alias("c"))
        )
        incoming = contribs.groupBy("u").agg(F.sum("c").alias("s"))
        ranks = (
            deg.select("u")
            .join(incoming, "u", "left")
            .select(
                "u",
                (
                    F.lit(RESET / n)
                    + F.lit(DAMPING) * F.coalesce(F.col("s"), F.lit(0.0))
                ).alias("r"),
            )
            .localCheckpoint()
        )
    from multithreaded_map_reduce_library_spark.functions.grid import grid

    return deg.join(ranks, "u").select(
        F.col("u").alias("doc"), "deg", grid(F.col("r"), 6).alias("pagerank_e6")
    )
