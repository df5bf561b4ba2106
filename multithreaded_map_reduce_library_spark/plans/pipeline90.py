"""Pipeline batch 90 (round 4): MATRIX PROFILE + SAX SYMBOLIZATION — two
modern time-series-mining primitives over the daily revenue series.

* ``matrix_profile_daily`` — the (brute-force, exact) Matrix Profile:
  for every length-3 window of the day-indexed series, the minimum
  squared Euclidean distance to any non-overlapping window, plus the
  motif flag on the global minimizer pair. The motif/discord primitive
  of the UCR Matrix Profile line of work: low profile values = repeated
  structure (motifs), high values = anomalies (discords). All-integer
  (squared distances of cent values), deterministic argmin tie-breaks.
* ``sax_weekly_symbols`` — Symbolic Aggregate approXimation: days are
  binned into quartile symbols a-d by rank (ntile), then each ISO week
  rolls up to its ordered SAX word — the discretization that turns a
  numeric series into strings amenable to dedup/frequent-pattern
  machinery (the repo's own winnowing/n-gram tiers, for instance).

Reference parity anchor: the reference engine (mapreduce.h:44-83) has no
time-series tier; both queries extend the driver-mandated superset.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from multithreaded_map_reduce_library_spark.plans.registry import register
from multithreaded_map_reduce_library_spark.sources.catalog import load_table

_WLEN = 3  # subsequence length

_DUCK_IDX = """
        daily AS (
            SELECT CAST(ts AS DATE) AS day,
                   CAST(SUM(CAST(FLOOR(value * 100.0 + 0.5) AS BIGINT)) AS BIGINT) AS cents
            FROM events
            WHERE event_type = 'purchase' AND value IS NOT NULL
            GROUP BY 1
        ),
        idx AS (
            SELECT CAST(ROW_NUMBER() OVER (ORDER BY day) - 1 AS BIGINT) AS x,
                   cents AS y
            FROM daily
        )
"""


@register(
    "matrix_profile_daily",
    oracle=f"""
        WITH {_DUCK_IDX},
        win AS (
            SELECT a.x AS i, a.y AS v0, b.y AS v1, c.y AS v2
            FROM idx a JOIN idx b ON b.x = a.x + 1 JOIN idx c ON c.x = a.x + 2
        ),
        dist AS (
            SELECT w1.i AS i, w2.i AS j,
                   (w1.v0 - w2.v0) * (w1.v0 - w2.v0)
                 + (w1.v1 - w2.v1) * (w1.v1 - w2.v1)
                 + (w1.v2 - w2.v2) * (w1.v2 - w2.v2) AS d2
            FROM win w1 JOIN win w2 ON ABS(w1.i - w2.i) >= {_WLEN}
        ),
        mins AS (
            SELECT i, CAST(MIN(d2) AS BIGINT) AS mp FROM dist GROUP BY i
        ),
        prof AS (
            SELECT m.i AS i, m.mp AS mp, CAST(MIN(d.j) AS BIGINT) AS nn_j
            FROM mins m JOIN dist d ON d.i = m.i AND d.d2 = m.mp
            GROUP BY m.i, m.mp
        ),
        best AS (SELECT mp AS bmp, i AS bi FROM prof ORDER BY mp, i LIMIT 1)
        SELECT p.i AS i, p.mp AS mp, p.nn_j AS nn_j,
               (p.mp = b.bmp AND p.i = b.bi) AS is_motif
        FROM prof p CROSS JOIN best b
    """,
    tags=("time-series", "matrix-profile", "motif", "events"),
)
def matrix_profile_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact brute-force Matrix Profile of daily purchase revenue with
    length-3 windows: per window the minimum squared distance to any
    window at least 3 apart (the standard trivial-match exclusion zone),
    its nearest-neighbor index (smallest-j tie-break), and the motif
    flag on the globally minimal profile entry (smallest-i tie-break).
    Low values mark repeated weekly structure; the maxima are the
    discord/anomaly days.

    Scale design: windows come from two self-equi-joins on consecutive
    indices over the day rollup; the O(days²) distance join and the
    min-by rollup run on that metadata-sized relation (the Mann-Kendall
    precedent) — the fact table is touched exactly once."""
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
    ).localCheckpoint()
    a = idx.select(F.col("x").alias("i"), F.col("y").alias("v0"))
    b = idx.select((F.col("x") - 1).alias("i"), F.col("y").alias("v1"))
    c = idx.select((F.col("x") - 2).alias("i"), F.col("y").alias("v2"))
    win = a.join(b, "i").join(c, "i")
    w1 = win.select(
        F.col("i"), F.col("v0").alias("a0"), F.col("v1").alias("a1"), F.col("v2").alias("a2")
    )
    w2 = win.select(
        F.col("i").alias("j"),
        F.col("v0").alias("b0"),
        F.col("v1").alias("b1"),
        F.col("v2").alias("b2"),
    )
    d2 = (
        (F.col("a0") - F.col("b0")) * (F.col("a0") - F.col("b0"))
        + (F.col("a1") - F.col("b1")) * (F.col("a1") - F.col("b1"))
        + (F.col("a2") - F.col("b2")) * (F.col("a2") - F.col("b2"))
    )
    dist = w1.join(
        F.broadcast(w2), F.abs(F.col("i") - F.col("j")) >= _WLEN
    ).select("i", "j", d2.alias("d2"))
    prof = dist.groupBy("i").agg(
        F.min("d2").cast("bigint").alias("mp"),
        F.min_by("j", F.struct(F.col("d2"), F.col("j"))).cast("bigint").alias("nn_j"),
    )
    best = prof.agg(
        F.min(F.struct(F.col("mp"), F.col("i"))).alias("b")
    ).select(F.col("b.mp").alias("bmp"), F.col("b.i").alias("bi"))
    return (
        prof.crossJoin(F.broadcast(best))  # 1-row grand aggregate (BNLJ-exempt)
        .select(
            "i",
            "mp",
            "nn_j",
            ((F.col("mp") == F.col("bmp")) & (F.col("i") == F.col("bi"))).alias(
                "is_motif"
            ),
        )
    )


@register(
    "sax_weekly_symbols",
    oracle="""
        WITH daily AS (
            SELECT CAST(ts AS DATE) AS day,
                   CAST(SUM(CAST(FLOOR(value * 100.0 + 0.5) AS BIGINT)) AS BIGINT) AS cents
            FROM events
            WHERE event_type = 'purchase' AND value IS NOT NULL
            GROUP BY 1
        ),
        sym AS (
            SELECT day, cents,
                   substr('abcd', NTILE(4) OVER (ORDER BY cents, day), 1) AS s
            FROM daily
        ),
        wk AS (
            -- ISO week key via the Thursday rule with a PORTABLE day-of-week
            -- (days since 1970-01-01, a Thursday): isodow = ((diff%7)+3)%7+1
            SELECT CAST(year(day + CAST(4 - (((date_diff('day', DATE '1970-01-01', day) % 7) + 3) % 7 + 1) AS INTEGER)) AS VARCHAR)
                   || '-' || lpad(CAST(weekofyear(day) AS VARCHAR), 2, '0') AS iso_week,
                   day, s, cents
            FROM sym
        )
        SELECT iso_week,
               CAST(COUNT(*) AS BIGINT) AS n_days,
               string_agg(s, '' ORDER BY day) AS sax_word,
               CAST(SUM(cents) AS BIGINT) AS week_cents
        FROM wk
        GROUP BY iso_week
    """,
    tags=("time-series", "sax", "symbolization", "events"),
)
def sax_weekly_symbols(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SAX symbolization of daily revenue: days map to quartile symbols
    a–d by rank (ntile over (cents, day) — the day tie-break makes the
    binning deterministic), then each ISO week (year-week 'G-V' key, so
    year boundaries don't fold together) emits its ordered SAX word plus
    the week's exact revenue. The discretization step that lets numeric
    series reuse string machinery — frequent words, n-gram novelty,
    winnowing — all of which this repo already provides.

    Scale design: one fact-sized groupBy(day); ranking and word rollup
    run on the day-level relation. The ntile is a global window on that
    tiny rollup (cusum precedent)."""
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
    nt = F.ntile(4).over(Window.orderBy(F.col("cents"), F.col("day")))
    sym = daily.select(
        "day", "cents", F.substring(F.lit("abcd"), nt, F.lit(1)).alias("s")
    )
    # ISO week key via the Thursday rule with a portable day-of-week
    # (days since 1970-01-01, a Thursday): isodow = ((diff % 7) + 3) % 7 + 1
    diff = F.datediff(F.col("day"), F.lit("1970-01-01").cast("date"))
    isodow = ((diff % 7) + 3) % 7 + 1
    thursday = F.date_add(F.col("day"), (F.lit(4) - isodow).cast("int"))
    wk = sym.select(
        F.concat(
            F.year(thursday).cast("string"),
            F.lit("-"),
            F.lpad(F.weekofyear(F.col("day")).cast("string"), 2, "0"),
        ).alias("iso_week"),
        "day",
        "s",
        "cents",
    )
    word = F.concat_ws(
        "",
        F.transform(
            F.array_sort(F.collect_list(F.struct(F.col("day"), F.col("s")))),
            lambda x: x["s"],
        ),
    )
    return wk.groupBy("iso_week").agg(
        F.count("*").cast("bigint").alias("n_days"),
        word.alias("sax_word"),
        F.sum("cents").cast("bigint").alias("week_cents"),
    )
