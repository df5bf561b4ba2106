"""Pipeline batch 84 (round 4): NOISY-COUNT RELEASE MECHANISM + SEQUENTIAL
PATTERN MINING — the noise-injection member of the governance tier and an
order-sensitive complement to market-basket mining.

* ``dp_noisy_release`` — the discrete-Laplace (two-sided geometric)
  noisy-count mechanism that differential-privacy releases use, replayed
  DETERMINISTICALLY: the two geometric draws come from md5-hash uniforms
  of the cell key, so the released table is reproducible and
  oracle-checkable. This tests/demonstrates the mechanism's plumbing
  (inverse-CDF sampling, symmetric noise, post-processing) — a real DP
  deployment would swap the hash uniforms for secure randomness, which
  changes ONLY the two ``u`` expressions (documented in the docstring;
  the determinism here is a test harness property, not a privacy claim).
* ``sequential_pattern_mining`` — frequent consecutive event-type
  trigrams per user (PrefixSpan's contiguous special case): unlike
  ``market_basket_pairs`` (unordered co-occurrence) and
  ``bigram_top_pairs`` (token text), this mines ORDERED behavioral
  n-grams with per-user support, the funnel-discovery primitive.

Reference parity anchor: the reference engine (mapreduce.h:44-83) has
neither tier; both queries extend the driver-mandated superset.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from multithreaded_map_reduce_library_spark.plans.registry import register
from multithreaded_map_reduce_library_spark.sources.catalog import load_table

_GEOM_Q = 0.6  # geometric ratio; ε = ln(1/q) ≈ 0.51 for the DP analogy


def _u(which: str) -> F.Column:
    """Deterministic uniform in (0,1) from the cell key: first 8 md5 hex
    digits of '<salt>|<event_type>|<day>' as a 32-bit integer, centered
    into the open interval ((h + 0.5) / 2^32)."""
    h = F.conv(
        F.substring(
            F.md5(
                F.concat(
                    F.lit(which),
                    F.lit("|"),
                    F.col("event_type"),
                    F.lit("|"),
                    F.col("day").cast("string"),
                )
            ),
            1,
            8,
        ),
        16,
        10,
    ).cast("bigint")
    return (h.cast("double") + F.lit(0.5)) / F.lit(4294967296.0)


def _duck_u(which: str) -> str:
    return (
        f"(CAST(CAST(('0x' || substr(md5('{which}|' || event_type || '|' ||"
        f" CAST(day AS VARCHAR)), 1, 8)) AS BIGINT) AS DOUBLE) + 0.5) / 4294967296.0"
    )


def _duck_geom(which: str) -> str:
    return f"CAST(FLOOR(ln(1.0 - {_duck_u(which)}) / ln({_GEOM_Q})) AS BIGINT)"


@register(
    "dp_noisy_release",
    oracle=f"""
        WITH cells AS (
            SELECT event_type, CAST(ts AS DATE) AS day, COUNT(*) AS n_true
            FROM events GROUP BY 1, 2
        )
        SELECT event_type, day,
               CAST(n_true AS BIGINT) AS n_true,
               {_duck_geom('g1')} - {_duck_geom('g2')} AS noise,
               CAST(n_true AS BIGINT) + {_duck_geom('g1')} - {_duck_geom('g2')} AS n_noisy
        FROM cells
    """,
    tags=("privacy", "governance", "noise", "events", "mechanism"),
)
def dp_noisy_release(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Noisy-count release via the discrete-Laplace mechanism: each
    (event_type, day) cell's true count gets additive noise G₁ − G₂,
    two geometric(1−q) draws (q = 0.6, the ε ≈ 0.51 discrete-Laplace
    ratio) sampled by inverse CDF ⌊ln(1−u)/ln(q)⌋ from md5-hash uniforms
    of the cell key. Deterministic seeding makes the release replayable
    and hash-checkable — the mechanism SHAPE is exactly what a DP
    deployment runs; swapping the two u-draws for secure randomness (one
    expression each) restores the formal guarantee. The ln() operands
    are identical IEEE doubles cross-engine (exact hash integer, one
    add, one divide), the TF-IDF-family grid-safety argument.

    Scale design: one groupBy over the fact scan; noise is per-cell
    scalar math on the rollup — zero extra shuffles, no driver state."""
    ev = load_table(spark, sf_dir, "events")
    cells = ev.groupBy(
        "event_type", F.col("ts").cast("date").alias("day")
    ).agg(F.count("*").cast("bigint").alias("n_true"))
    ln_q = F.log(F.lit(_GEOM_Q))
    g1 = F.floor(F.log(F.lit(1.0) - _u("g1")) / ln_q).cast("bigint")
    g2 = F.floor(F.log(F.lit(1.0) - _u("g2")) / ln_q).cast("bigint")
    return cells.select(
        "event_type",
        "day",
        "n_true",
        (g1 - g2).alias("noise"),
        (F.col("n_true") + g1 - g2).alias("n_noisy"),
    )


_MIN_SUPPORT = 3  # users


@register(
    "sequential_pattern_mining",
    oracle=f"""
        WITH seq AS (
            SELECT user_id, event_type,
                   LEAD(event_type, 1) OVER w AS e2,
                   LEAD(event_type, 2) OVER w AS e3
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ),
        tri AS (
            SELECT user_id, event_type AS e1, e2, e3
            FROM seq WHERE e2 IS NOT NULL AND e3 IS NOT NULL
        )
        SELECT e1, e2, e3,
               CAST(COUNT(*) AS BIGINT) AS n_occurrences,
               CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
        FROM tri
        GROUP BY e1, e2, e3
        HAVING COUNT(DISTINCT user_id) >= {_MIN_SUPPORT}
    """,
    tags=("pattern-mining", "sequence", "events", "behavioral"),
)
def sequential_pattern_mining(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frequent consecutive behavioral trigrams: each user's event stream
    (ordered by timestamp, event-id tie-break) is slid into contiguous
    event-type trigrams; a pattern qualifies when at least 3 distinct
    users exhibit it. The order-sensitive funnel-discovery counterpart
    to the unordered market-basket queries — 'view→click→purchase'
    and 'click→view→click' are different patterns here.

    Scale design: the window is PARTITIONED BY user (no global sort —
    user streams sort independently inside one fact shuffle); the
    trigram rollup is the second and last shuffle, over rows an order
    of magnitude skinnier than the input. At 100 TB both shuffles
    partition on high-cardinality keys with no skew hotspot."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "user_id",
        F.col("event_type").alias("e1"),
        F.lead("event_type", 1).over(w).alias("e2"),
        F.lead("event_type", 2).over(w).alias("e3"),
    ).where(F.col("e2").isNotNull() & F.col("e3").isNotNull())
    return (
        seq.groupBy("e1", "e2", "e3")
        .agg(
            F.count("*").cast("bigint").alias("n_occurrences"),
            F.countDistinct("user_id").cast("bigint").alias("n_users"),
        )
        .where(F.col("n_users") >= _MIN_SUPPORT)
    )
