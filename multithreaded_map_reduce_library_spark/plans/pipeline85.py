"""Pipeline batch 85 (round 4): RANSAC ROBUST TREND FIT + MANN-KENDALL
TREND TEST — robust estimation and nonparametric trend significance for
the time-series tier.

* ``ransac_trend_fit`` — RANSAC over the daily-revenue series: candidate
  lines come from deterministically (md5) sampled day pairs, every
  candidate scores its inlier count with an EXACT cross-multiplied
  integer residual test (no division ever happens), and the consensus
  winner is flagged. The robust-fit complement to ``theil_sen_user_trend``
  (median-of-slopes) and ``ols_user_trend`` (least squares): RANSAC
  tolerates gross outliers that break both.
* ``mann_kendall_trend`` — the standard nonparametric monotone-trend
  test: S = Σ_{{i<j}} sign(x_j − x_i) with the tie-corrected variance and
  the continuity-corrected z-score. Theil-Sen gives the slope; this
  gives its significance. S and Var(S) are exact integers; z uses only
  IEEE sqrt (correctly rounded per IEEE-754, hence cross-engine safe).

Reference parity anchor: the reference engine (mapreduce.h:44-83) has no
statistics tier; both queries extend the driver-mandated superset.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from multithreaded_map_reduce_library_spark.functions.grid import duck_grid, grid
from multithreaded_map_reduce_library_spark.plans.registry import register
from multithreaded_map_reduce_library_spark.sources.catalog import load_table

_N_CAND = 8  # RANSAC candidate pairs
_THRESH_DIV = 10  # inlier threshold = mean daily cents / 10

_DUCK_DAILY = """
        daily AS (
            SELECT CAST(ts AS DATE) AS day,
                   CAST(SUM(CAST(FLOOR(value * 100.0 + 0.5) AS BIGINT)) AS BIGINT) AS cents
            FROM events
            WHERE event_type = 'purchase' AND value IS NOT NULL
            GROUP BY 1
        ),
        idx AS (
            SELECT CAST(ROW_NUMBER() OVER (ORDER BY day) - 1 AS BIGINT) AS x, cents AS y
            FROM daily
        ),
        nn AS (SELECT COUNT(*) AS n, CAST(SUM(y) AS BIGINT) AS total FROM idx)
"""


@register(
    "ransac_trend_fit",
    oracle=f"""
        WITH {_DUCK_DAILY},
        cand AS (
            SELECT c AS cand_id,
                   CAST(('0x' || substr(md5('a|' || c), 1, 8)) AS BIGINT)
                       % (SELECT n FROM nn) AS i,
                   1 + CAST(('0x' || substr(md5('b|' || c), 1, 8)) AS BIGINT)
                       % ((SELECT n FROM nn) - 1) AS step
            FROM generate_series(0, {_N_CAND - 1}) AS t(c)
        ),
        model AS (
            SELECT cand_id, a.x AS x1, a.y AS y1, b.x AS x2, b.y AS y2
            FROM (SELECT cand_id, i, (i + step) % (SELECT n FROM nn) AS j FROM cand) s
            JOIN idx a ON a.x = s.i
            JOIN idx b ON b.x = s.j
        ),
        scored AS (
            SELECT m.cand_id, m.x1, m.y1, m.x2, m.y2,
                   CAST(SUM(CASE WHEN
                        ABS((p.y - m.y1) * (m.x2 - m.x1) - (p.x - m.x1) * (m.y2 - m.y1))
                            * {_THRESH_DIV} * (SELECT n FROM nn)
                        <= (SELECT total FROM nn) * ABS(m.x2 - m.x1)
                        THEN 1 ELSE 0 END) AS BIGINT) AS n_inliers
            FROM model m CROSS JOIN idx p
            GROUP BY m.cand_id, m.x1, m.y1, m.x2, m.y2
        ),
        best AS (
            SELECT MAX(n_inliers) AS top FROM scored
        )
        SELECT cand_id, x1, y1, x2, y2, n_inliers,
               n_inliers = (SELECT top FROM best)
               AND cand_id = (SELECT MIN(cand_id) FROM scored
                              WHERE n_inliers = (SELECT top FROM best)) AS is_best
        FROM scored
    """,
    tags=("statistics", "ransac", "robust", "events", "trend"),
)
def ransac_trend_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANSAC consensus line over daily purchase revenue: 8 candidate
    lines through md5-sampled day pairs (second index offset-sampled so
    the pair is always distinct); a day is an inlier when its vertical
    residual is within mean-daily-revenue/10 — tested as the fully
    cross-multiplied integer inequality |Δy·(x2−x1) − Δx·(y2−y1)|·10·n ≤
    total·|x2−x1|, so no quotient is ever formed. The candidate with the
    largest consensus set (min-id tie-break) wins. Robust to the gross
    outlier days that pull OLS and even strain Theil-Sen.

    Scale design: everything after the one fact-sized groupBy(day) runs
    on the day-level rollup — candidates × days is 8n on a relation of
    hundreds of rows. The rollup's row-number index is a tiny global
    sort (cusum precedent); the 1-row n/total aggregate broadcasts."""
    ev = load_table(spark, sf_dir, "events")
    daily = (
        ev.where((F.col("event_type") == "purchase") & F.col("value").isNotNull())
        .groupBy(F.col("ts").cast("date").alias("day"))
        .agg(
            F.sum(F.floor(F.col("value") * 100.0 + F.lit(0.5)).cast("bigint"))
            .cast("bigint")
            .alias("cents")
        )
    )
    idx = daily.select(
        (F.row_number().over(Window.orderBy("day")) - 1).cast("bigint").alias("x"),
        F.col("cents").alias("y"),
    )
    nn = idx.agg(F.count("*").alias("n"), F.sum("y").cast("bigint").alias("total"))

    def h(salt: str) -> F.Column:
        return F.conv(
            F.substring(F.md5(F.concat(F.lit(salt + "|"), F.col("c").cast("string"))), 1, 8),
            16,
            10,
        ).cast("bigint")

    cand = (
        spark.range(_N_CAND)
        .select(F.col("id").cast("bigint").alias("c"))
        .crossJoin(F.broadcast(nn))  # 1-row grand aggregate (BNLJ-exempt)
        .select(
            F.col("c").alias("cand_id"),
            (h("a") % F.col("n")).alias("i"),
            (F.lit(1) + h("b") % (F.col("n") - 1)).alias("step"),
            "n",
            "total",
        )
        .select(
            "cand_id",
            "i",
            ((F.col("i") + F.col("step")) % F.col("n")).alias("j"),
            "n",
            "total",
        )
    )
    a = idx.select(F.col("x").alias("i"), F.col("y").alias("y1"))
    b = idx.select(F.col("x").alias("j"), F.col("y").alias("y2"))
    model = (
        cand.join(F.broadcast(a), "i")
        .join(F.broadcast(b), "j")
        .select(
            "cand_id",
            F.col("i").alias("x1"),
            "y1",
            F.col("j").alias("x2"),
            "y2",
            "n",
            "total",
        )
    )
    scored = (
        model.crossJoin(idx.select(F.col("x").alias("px"), F.col("y").alias("py")))
        .select(
            "cand_id",
            "x1",
            "y1",
            "x2",
            "y2",
            F.when(
                F.abs(
                    (F.col("py") - F.col("y1")) * (F.col("x2") - F.col("x1"))
                    - (F.col("px") - F.col("x1")) * (F.col("y2") - F.col("y1"))
                )
                * F.lit(_THRESH_DIV)
                * F.col("n")
                <= F.col("total") * F.abs(F.col("x2") - F.col("x1")),
                1,
            )
            .otherwise(0)
            .alias("inl"),
        )
        .groupBy("cand_id", "x1", "y1", "x2", "y2")
        .agg(F.sum("inl").cast("bigint").alias("n_inliers"))
    )
    best = scored.agg(F.max("n_inliers").alias("top"))
    winner = (
        scored.join(F.broadcast(best), scored.n_inliers == F.col("top"))
        .agg(F.min("cand_id").alias("best_id"), F.max("top").alias("top2"))
    )
    return (
        scored.crossJoin(F.broadcast(winner))  # 1-row aggregate (BNLJ-exempt)
        .select(
            "cand_id",
            "x1",
            "y1",
            "x2",
            "y2",
            "n_inliers",
            (
                (F.col("n_inliers") == F.col("top2"))
                & (F.col("cand_id") == F.col("best_id"))
            ).alias("is_best"),
        )
    )


@register(
    "mann_kendall_trend",
    oracle=f"""
        WITH {_DUCK_DAILY},
        s AS (
            SELECT CAST(SUM(CASE WHEN b.y > a.y THEN 1
                                 WHEN b.y < a.y THEN -1 ELSE 0 END) AS BIGINT) AS s_stat
            FROM idx a JOIN idx b ON b.x > a.x
        ),
        ties AS (
            SELECT CAST(COALESCE(SUM(t * (t - 1) * (2 * t + 5)), 0) AS BIGINT) AS tie_term
            FROM (SELECT COUNT(*) AS t FROM idx GROUP BY y HAVING COUNT(*) > 1)
        ),
        v AS (
            SELECT (SELECT n FROM nn) AS n,
                   s.s_stat,
                   CAST(((SELECT n FROM nn) * ((SELECT n FROM nn) - 1)
                         * (2 * (SELECT n FROM nn) + 5)
                         - t.tie_term) AS BIGINT) AS var18
            FROM s, ties t
        )
        SELECT CAST(n AS BIGINT) AS n, s_stat,
               var18,
               {duck_grid("(CASE WHEN s_stat > 0 THEN s_stat - 1.0 "
                          "      WHEN s_stat < 0 THEN s_stat + 1.0 "
                          "      ELSE 0.0 END) / sqrt(CAST(var18 AS DOUBLE) / 18.0)", 6)} AS z_e6
        FROM v
    """,
    tags=("statistics", "trend", "mann-kendall", "events", "nonparametric"),
)
def mann_kendall_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Kendall monotone-trend test on daily purchase revenue:
    S = Σ_{{i<j}} sign(y_j − y_i) over the day-indexed series, the
    tie-corrected variance Var(S) = [n(n−1)(2n+5) − Σ t(t−1)(2t+5)]/18
    (kept as the exact integer numerator var18), and the continuity-
    corrected z = (S∓1)/√Var(S). IEEE sqrt is correctly rounded, so the
    z grid is cross-engine exact given identical integer inputs —
    Theil-Sen estimates the trend's slope, this scores its significance.

    Scale design: the O(n²) sign sum runs on the day rollup (hundreds
    of rows) after one fact-sized groupBy; at 100 TB the pair join is
    still metadata-sized because n is the number of DAYS, not rows."""
    ev = load_table(spark, sf_dir, "events")
    daily = (
        ev.where((F.col("event_type") == "purchase") & F.col("value").isNotNull())
        .groupBy(F.col("ts").cast("date").alias("day"))
        .agg(
            F.sum(F.floor(F.col("value") * 100.0 + F.lit(0.5)).cast("bigint"))
            .cast("bigint")
            .alias("cents")
        )
    )
    idx = daily.select(
        (F.row_number().over(Window.orderBy("day")) - 1).cast("bigint").alias("x"),
        F.col("cents").alias("y"),
    )
    nn = idx.agg(F.count("*").cast("bigint").alias("n"))
    a = idx.select(F.col("x").alias("xa"), F.col("y").alias("ya"))
    b = idx.select(F.col("x").alias("xb"), F.col("y").alias("yb"))
    s = (
        a.crossJoin(b)
        .where(F.col("xb") > F.col("xa"))
        .agg(
            F.sum(
                F.when(F.col("yb") > F.col("ya"), 1)
                .when(F.col("yb") < F.col("ya"), -1)
                .otherwise(0)
            )
            .cast("bigint")
            .alias("s_stat")
        )
    )
    ties = (
        idx.groupBy("y")
        .agg(F.count("*").alias("t"))
        .where(F.col("t") > 1)
        .agg(
            F.coalesce(
                F.sum(F.col("t") * (F.col("t") - 1) * (2 * F.col("t") + 5)), F.lit(0)
            )
            .cast("bigint")
            .alias("tie_term")
        )
    )
    v = (
        nn.crossJoin(F.broadcast(s))
        .crossJoin(F.broadcast(ties))  # 1-row aggregates (BNLJ-exempt)
        .select(
            "n",
            "s_stat",
            (
                F.col("n") * (F.col("n") - 1) * (2 * F.col("n") + 5) - F.col("tie_term")
            )
            .cast("bigint")
            .alias("var18"),
        )
    )
    zc = (
        F.when(F.col("s_stat") > 0, F.col("s_stat") - F.lit(1.0))
        .when(F.col("s_stat") < 0, F.col("s_stat") + F.lit(1.0))
        .otherwise(F.lit(0.0))
    )
    return v.select(
        "n",
        "s_stat",
        "var18",
        grid(zc / F.sqrt(F.col("var18").cast("double") / F.lit(18.0)), 6).alias("z_e6"),
    )
