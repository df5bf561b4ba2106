"""Pipeline batch 38: q-gram-filtered edit-distance join (the third
entity-resolution blocking strategy, with its count-filtering theorem
PROVEN by an unpruned oracle), hierarchical percent-of-parent revenue
shares, and a sessionization operating-point sweep.

The q-gram filter (Gravano et al. 2001): if edit_distance(a, b) <= d
then the strings share at least max(|a|,|b|) - q + 1 - d*q positional
q-grams (as multisets). Multiset intersection is computed by keying
each q-gram occurrence as (gram, occurrence_no) — an equi-join then
counts min(multiplicity) pairs automatically. The oracle is the naive
all-pairs join, so the hash match proves the pruning lossless.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from multithreaded_map_reduce_library_spark.functions.grid import grid, int_ratio
from multithreaded_map_reduce_library_spark.plans.registry import register
from multithreaded_map_reduce_library_spark.sources.catalog import load_table, scaled_broadcast

_QG_D = 2  # max edit distance
_QG_Q = 2  # gram size


@register(
    "qgram_edit_distance_join",
    oracle=f"""
        WITH p AS (SELECT p_partkey, p_name FROM part),
        c AS (
            SELECT a.p_partkey AS key_a, b.p_partkey AS key_b,
                   a.p_name AS name_a, b.p_name AS name_b,
                   levenshtein(a.p_name, b.p_name) AS dist
            FROM p a JOIN p b ON a.p_partkey < b.p_partkey
        )
        SELECT key_a, key_b, name_a, name_b, dist
        FROM c WHERE dist <= {_QG_D}
    """,
    tags=("entity-resolution", "qgram", "fuzzy", "part"),
)
def qgram_edit_distance_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit-distance self-join (distance <= 2 over part names) pruned by
    the POSITIONAL Q-GRAM COUNT FILTER: candidates must share at least
    max(|a|,|b|) - 1 - 2*2 bigrams as multisets (each bigram occurrence
    keyed (gram, occurrence_no), so an equi-join + count computes the
    multiset intersection), and |len_a - len_b| <= 2 (the length
    filter). Survivors are verified with exact Levenshtein. Completes
    the ER blocking triad: token blocking (fuzzy_blocked_name_pairs),
    sort order (sorted_neighborhood_pairs), q-gram count filtering.

    The oracle is the UNPRUNED all-pairs Levenshtein join — the hash
    match proves the count-filtering theorem lost no qualifying pair on
    this corpus, exactly like prefix_filter_jaccard_join's oracle.

    Scale design: candidates come from an inverted index keyed by
    (gram, occ) — each name posts |name|-1 entries; the join fans out
    per shared gram occurrence and the HAVING count collapses it
    map-side. Verification touches candidates only; the n² join never
    exists in the Spark plan.
    """
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_name")
    n = F.length("p_name")
    # (gram, occurrence_no) postings per name
    grams = part.select(
        "p_partkey",
        "p_name",
        n.alias("len"),
        F.explode(
            F.transform(
                F.sequence(F.lit(1), n - (_QG_Q - 1)),
                lambda i: F.col("p_name").substr(i, F.lit(_QG_Q)),
            )
        ).alias("gram"),
    )
    occ = grams.select(
        "p_partkey",
        "p_name",
        "len",
        "gram",
        F.row_number()
        .over(
            Window.partitionBy("p_partkey", "gram").orderBy(F.asc("p_partkey"))
        )
        .alias("occ"),
    )
    a = occ.select(
        F.col("p_partkey").alias("key_a"),
        F.col("p_name").alias("name_a"),
        F.col("len").alias("len_a"),
        "gram",
        "occ",
    )
    b = occ.select(
        F.col("p_partkey").alias("key_b"),
        F.col("p_name").alias("name_b"),
        F.col("len").alias("len_b"),
        "gram",
        "occ",
    )
    cand = (
        a.join(b, ["gram", "occ"])
        .where(
            (F.col("key_a") < F.col("key_b"))
            & (F.abs(F.col("len_a") - F.col("len_b")) <= _QG_D)
        )
        .groupBy("key_a", "key_b", "name_a", "name_b", "len_a", "len_b")
        .agg(F.count("*").alias("shared"))
        .where(
            F.col("shared")
            >= F.greatest("len_a", "len_b") - (_QG_Q - 1) - _QG_D * _QG_Q
        )
    )
    return cand.select(
        "key_a",
        "key_b",
        "name_a",
        "name_b",
        F.levenshtein("name_a", "name_b").alias("dist"),
    ).where(F.col("dist") <= _QG_D)


@register(
    "hierarchical_revenue_shares",
    oracle="""
        WITH r AS (
            SELECT n.n_regionkey, o.o_custkey, c.c_nationkey,
                   CAST(FLOOR(o.o_totalprice * 100.0 + 0.5) AS BIGINT) AS cents
            FROM orders o
            JOIN customer c ON o.o_custkey = c.c_custkey
            JOIN nation n ON c.c_nationkey = n.n_nationkey
        ),
        nat AS (
            SELECT n_regionkey, c_nationkey, SUM(cents) AS nat_cents
            FROM r GROUP BY n_regionkey, c_nationkey
        ),
        reg AS (
            SELECT n_regionkey, SUM(nat_cents) AS reg_cents
            FROM nat GROUP BY n_regionkey
        ),
        tot AS (SELECT SUM(reg_cents) AS tot_cents FROM reg)
        SELECT nat.n_regionkey AS regionkey, nat.c_nationkey AS nationkey,
               CAST(nat.nat_cents AS BIGINT) AS nat_cents,
               CAST((nat.nat_cents * 1000000 + reg.reg_cents // 2)
                    // reg.reg_cents AS BIGINT) AS share_of_region_e6,
               CAST((reg.reg_cents * 1000000 + tot.tot_cents // 2)
                    // tot.tot_cents AS BIGINT) AS region_share_of_total_e6
        FROM nat
        JOIN reg ON nat.n_regionkey = reg.n_regionkey
        CROSS JOIN tot
    """,
    tags=("analytics", "hierarchy", "shares", "orders"),
)
def hierarchical_revenue_shares(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Percent-of-parent across the geography hierarchy: each nation's
    share of its region's revenue AND each region's share of the total,
    on cent-grid integers with single display divisions — the
    drill-down report every BI layer renders, expressed as two
    cascading skinny aggregates rather than window tricks.

    Scale design: one star join (broadcast dims), then nation- and
    region-grain rollups (25 and 5 rows) and a 1-row total — the
    corpus-sized work is exactly one aggregate over orders.
    """
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    r = (
        orders.join(scaled_broadcast(cust, sf_dir, "customer"), orders["o_custkey"] == cust["c_custkey"])
        .join(F.broadcast(nation), cust["c_nationkey"] == nation["n_nationkey"])
        .select(
            "n_regionkey",
            "c_nationkey",
            F.floor(F.col("o_totalprice") * 100.0 + 0.5).cast("bigint").alias("cents"),
        )
    )
    nat = r.groupBy("n_regionkey", "c_nationkey").agg(F.sum("cents").alias("nat_cents"))
    reg = nat.groupBy("n_regionkey").agg(F.sum("nat_cents").alias("reg_cents"))
    tot = reg.agg(F.sum("reg_cents").alias("tot_cents"))
    return (
        nat.join(F.broadcast(reg), "n_regionkey")
        .crossJoin(F.broadcast(tot))
        .select(
            F.col("n_regionkey").alias("regionkey"),
            F.col("c_nationkey").alias("nationkey"),
            "nat_cents",
            int_ratio(F.col("nat_cents"), F.col("reg_cents"), 6).alias(
                "share_of_region_e6"
            ),
            int_ratio(F.col("reg_cents"), F.col("tot_cents"), 6).alias(
                "region_share_of_total_e6"
            ),
        )
    )


_ST_GAPS_MIN = (15, 30, 60)


def _session_sweep_oracle() -> str:
    parts = []
    for gap in _ST_GAPS_MIN:
        parts.append(f"""
        SELECT {gap} AS gap_minutes, COUNT(*) AS n_sessions,
               CAST(SUM(n_events) AS BIGINT) AS n_events,
               CAST((CAST(SUM(n_events) AS BIGINT) * 1000000 + COUNT(*) // 2)
                    // COUNT(*) AS BIGINT) AS mean_events_e6
        FROM (
            SELECT user_id, session_id, COUNT(*) AS n_events
            FROM (
                SELECT user_id,
                       SUM(is_new) OVER (PARTITION BY user_id
                                         ORDER BY ts ASC, event_id ASC
                                         ROWS UNBOUNDED PRECEDING) AS session_id
                FROM (
                    SELECT user_id, ts, event_id,
                           CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id
                                                        ORDER BY ts ASC, event_id ASC)
                                     > INTERVAL {gap} MINUTES
                                     OR LAG(ts) OVER (PARTITION BY user_id
                                                      ORDER BY ts ASC, event_id ASC)
                                        IS NULL
                                THEN 1 ELSE 0 END AS is_new
                    FROM events
                )
            )
            GROUP BY user_id, session_id
        )""")
    return " UNION ALL ".join(parts)


@register(
    "session_timeout_sweep",
    oracle=_session_sweep_oracle(),
    tags=("sessionization", "sweep", "window", "events"),
)
def session_timeout_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization operating-point sweep: session counts and mean
    session length at 15/30/60-minute inactivity gaps — the table that
    picks the timeout before `events_sessionize` hard-codes it (the
    same sweep pattern as `minhash_threshold_sweep`). Counts are
    integers; the mean is one display division.

    Scale design: three passes of the standard gaps-and-islands window
    (user-partitioned lag + running sum — each a user-keyed sort, no
    global order), each collapsing immediately to per-session counts
    and then a 1-row summary; the three 1-row summaries union.
    """
    ev = load_table(spark, sf_dir, "events")
    outs = []
    for gap in _ST_GAPS_MIN:
        wo = Window.partitionBy("user_id").orderBy(F.asc("ts"), F.asc("event_id"))
        lag = F.lag("ts").over(wo)
        is_new = F.when(
            lag.isNull()
            | (
                F.unix_timestamp("ts") - F.unix_timestamp(lag) > gap * 60
            ),
            1,
        ).otherwise(0)
        sess = ev.select(
            "user_id",
            F.sum(is_new)
            .over(wo.rowsBetween(Window.unboundedPreceding, 0))
            .alias("session_id"),
        )
        per = sess.groupBy("user_id", "session_id").agg(
            F.count("*").alias("n_events")
        )
        outs.append(
            per.agg(
                F.count("*").alias("n_sessions"),
                F.sum("n_events").alias("n_events"),
            ).select(
                F.lit(gap).cast("int").alias("gap_minutes"),
                "n_sessions",
                "n_events",
                int_ratio(F.col("n_events"), F.col("n_sessions"), 6).alias(
                    "mean_events_e6"
                ),
            )
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionAll(o)
    return out
