"""Structural invariants for the pipeline24-30 families: properties the
oracle-parity hash can't express — reconstruction round-trips, sketch
guarantees, pruning losslessness counts, statistic ranges."""

from __future__ import annotations

import duckdb

from multithreaded_map_reduce_library_spark.plans.registry import all_queries
from tests.conftest import SF_SMALL

_Q = all_queries()


def _docs_tokens():
    con = duckdb.connect()
    rows = con.execute(
        f"""SELECT doc_id, list_filter(string_split_regex(text, '[ \t\r\n]'),
                                       x -> x <> '')
            FROM '{SF_SMALL}/documents.parquet'"""
    ).fetchall()
    con.close()
    return dict(rows)


def test_span_corruption_roundtrip(spark):
    """Splicing the target span back over the sentinel must reproduce
    the original token sequence exactly — the property that makes the
    pair usable as a denoising example."""
    toks = _docs_tokens()
    rows = _Q["span_corruption_pairs"].fn(spark, SF_SMALL).collect()
    assert rows
    for r in rows:
        span = r.target.replace("<extra_id_0> ", "", 1).split(" ")
        rebuilt = r.corrupted.replace("<extra_id_0>", " ".join(span), 1).split()
        assert rebuilt == toks[r.doc_id], r.doc_id
        assert len(span) == 3


def test_bloom_guarantees(spark):
    [r] = _Q["bloom_filter_semijoin"].fn(spark, SF_SMALL).collect()
    assert r.n_false_neg == 0  # the Bloom guarantee
    assert r.n_bloom_pass >= r.n_true
    assert r.n_bloom_pass == r.n_true + r.n_false_pos
    # the filter must actually prune (FP rate well under the pass-all 100%)
    assert r.n_bloom_pass < r.n_lineitems


def test_prefix_filter_equals_allpairs(spark):
    """The pruned join must equal the naive all-pairs join computed
    independently in Python — the AllPairs prefix theorem, end to end."""
    toks = {k: set(map(str.lower, v)) for k, v in _docs_tokens().items()}
    expected = set()
    ids = sorted(toks)
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            inter = len(toks[a] & toks[b])
            union = len(toks[a] | toks[b])
            if 5 * inter >= 4 * union:
                expected.add((a, b))
    got = {
        (r.id_a, r.id_b)
        for r in _Q["prefix_filter_jaccard_join"].fn(spark, SF_SMALL).collect()
    }
    assert got == expected


def test_gini_range_and_pareto_consistency(spark):
    [r] = _Q["gini_revenue_concentration"].fn(spark, SF_SMALL).collect()
    assert 0 <= r.gini_e6 <= 1_000_000
    assert r.n_customers > 0 and r.total_rev_q > 0


def test_ols_and_theil_sen_cover_same_users(spark):
    ols = {r.user_id for r in _Q["ols_user_trend"].fn(spark, SF_SMALL).collect()}
    ts = {r.user_id for r in _Q["theil_sen_user_trend"].fn(spark, SF_SMALL).collect()}
    # OLS needs x-variance (>=2 distinct days) — exactly Theil-Sen's domain
    assert ols == ts


def test_cusum_picks_a_day(spark):
    [r] = _Q["cusum_changepoint_daily"].fn(spark, SF_SMALL).collect()
    assert r.n_days >= 1 and r.max_dev_e6 >= 0


def test_sorted_neighborhood_pairs_ordered(spark):
    rows = _Q["sorted_neighborhood_pairs"].fn(spark, SF_SMALL).collect()
    assert rows  # synthetic names repeat: near pairs must exist
    for r in rows:
        assert r.key_a != r.key_b
        assert 0 <= r.dist <= 4


def test_skipgram_symmetry(spark):
    """A +/-w window is symmetric: count(a,b) == count(b,a)."""
    rows = _Q["skipgram_training_pairs"].fn(spark, SF_SMALL).collect()
    c = {(r.center, r.context): r.n_pairs for r in rows}
    assert c
    for (a, b), n in c.items():
        assert c.get((b, a)) == n, (a, b)


def test_kcenter_distances_decrease(spark):
    """Greedy farthest-point: the pick distance is non-increasing
    round over round (each selection can only shrink min-distances)."""
    rows = sorted(
        _Q["kcenter_coreset_selection"].fn(spark, SF_SMALL).collect(),
        key=lambda r: r.rank,
    )
    assert [r.rank for r in rows] == [1, 2, 3, 4, 5]
    dists = [r.dist for r in rows[1:]]
    assert all(a >= b for a, b in zip(dists, dists[1:]))


def test_length_buckets_partition_docs(spark):
    rows = _Q["length_bucketed_batching"].fn(spark, SF_SMALL).collect()
    toks = _docs_tokens()
    n_nonempty = sum(1 for v in toks.values() if len(v) > 0)
    assert sum(r.n_docs for r in rows) == n_nonempty
    for r in rows:
        assert r.pad_bucketed <= r.pad_unbucketed


def test_position_attribution_conserves_money(spark):
    """Per purchase, allocated credits must sum to the purchase value in
    cents EXACTLY (largest-remainder invariant)."""
    rows = _Q["position_attribution_purchases"].fn(spark, SF_SMALL).collect()
    assert rows
    got: dict[int, int] = {}
    for r in rows:
        got[r.purchase_id] = got.get(r.purchase_id, 0) + r.credit_cents
    con = duckdb.connect()
    cents = dict(
        con.execute(
            f"""SELECT event_id, CAST(FLOOR(value * 100.0 + 0.5) AS BIGINT)
                FROM '{SF_SMALL}/events.parquet' WHERE event_type = 'purchase'"""
        ).fetchall()
    )
    con.close()
    for pid, total in got.items():
        assert total == cents[pid], pid


def test_bfs_layers_contiguous(spark):
    rows = _Q["bfs_copurchase_layers"].fn(spark, SF_SMALL).collect()
    layers = sorted({r.layer for r in rows})
    assert layers[0] == 0
    assert layers == list(range(len(layers)))  # no gaps
    assert sum(1 for r in rows if r.layer == 0) == 1  # single seed


def test_weekday_index_weighted_mean_is_one(spark):
    rows = _Q["weekday_seasonal_index"].fn(spark, SF_SMALL).collect()
    n_days = sum(r.n_w for r in rows)
    wmean = sum(r.n_w * r.seasonal_index_e6 for r in rows) / n_days / 1e6
    assert abs(wmean - 1.0) < 1e-4


def test_market_basket_bounds(spark):
    rows = _Q["market_basket_pairs"].fn(spark, SF_SMALL).collect()
    for r in rows:
        assert r.support >= 3
        assert r.part_a < r.part_b
        assert r.lift_e6 > 0


def test_calibration_bins_partition(spark):
    rows = _Q["logreg_calibration_bins"].fn(spark, SF_SMALL).collect()
    con = duckdb.connect()
    [(n_docs,)] = con.execute(
        f"SELECT COUNT(*) FROM '{SF_SMALL}/documents.parquet'"
    ).fetchall()
    con.close()
    assert sum(r.n_docs for r in rows) == n_docs
    for r in rows:
        assert 0 <= r.bin <= 9
        assert 0.0 <= r.frac_pos <= 1.0
        assert 0.0 <= r.mean_pred <= 1.0


def test_cms_overestimates(spark):
    """CMS inner product is a provable UPPER bound on the join size."""
    [r] = _Q["cms_join_size_estimate"].fn(spark, SF_SMALL).collect()
    assert r.est_join_size >= r.true_join_size > 0
    assert r.overestimate_e6 >= 1_000_000


def test_chi2_nonnegative(spark):
    [r] = _Q["chi2_event_weekday"].fn(spark, SF_SMALL).collect()
    assert r.chi2 >= 0.0
    assert r.dof == (5 - 1) * (7 - 1)


def test_churn_monotone_in_threshold(spark):
    rows = {r.inactive_days: r for r in _Q["churn_threshold_sweep"].fn(spark, SF_SMALL).collect()}
    assert rows[7].n_churned >= rows[14].n_churned >= rows[21].n_churned
    assert len({r.n_users for r in rows.values()}) == 1


def test_autocorrelation_bounds(spark):
    for r in _Q["daily_autocorrelation"].fn(spark, SF_SMALL).collect():
        assert -1_000_001 <= r.acf_e6 <= 1_000_001


def test_conditional_entropy_bounds(spark):
    import math

    rows = _Q["markov_conditional_entropy"].fn(spark, SF_SMALL).collect()
    assert rows
    for r in rows:
        assert -1e-9 <= r.cond_entropy_bits <= math.log2(5) + 1e-9


def test_quality_ensemble_keeps_exactly_100(spark):
    rows = _Q["quality_signal_rank_ensemble"].fn(spark, SF_SMALL).collect()
    assert sum(1 for r in rows if r.keep) == min(100, len(rows))


def test_seasonal_index_consistency(spark):
    """seasonal_adjusted_daily must equal raw/index computed from the
    weekday_seasonal_index query's own outputs."""
    idx = {
        r.weekday: r.seasonal_index_e6 / 1e6
        for r in _Q["weekday_seasonal_index"].fn(spark, SF_SMALL).collect()
    }
    adj = _Q["seasonal_adjusted_daily"].fn(spark, SF_SMALL).collect()
    import datetime

    for r in adj:
        wd = r.day.isoweekday() % 7 + 1  # Spark dayofweek: Sunday=1
        approx = r.v_e6 / idx[wd]
        # both inputs are e6-grid displays; compare relatively
        assert abs(approx - r.adjusted_e6) / abs(r.adjusted_e6) < 1e-4, r


def test_rendezvous_movers_only_land_on_new_shard(spark):
    """The HRW guarantee: adding shard 5 moves keys ONLY onto shard 5
    (an old shard can never start winning a key it previously lost)."""
    rows = _Q["rendezvous_shard_assignment"].fn(spark, SF_SMALL).collect()
    assert {r.shard for r in rows} <= set(range(6))
    for r in rows:
        if r.shard != 5:
            assert r.n_moved == 0, r
        else:
            assert r.n_moved == r.n_docs  # every doc on the new shard moved


def test_leakage_totals_match_pair_relation(spark):
    pairs = _Q["prefix_filter_jaccard_join"].fn(spark, SF_SMALL).count()
    audit = _Q["split_leakage_audit"].fn(spark, SF_SMALL).collect()
    assert sum(r.n_neardup_pairs for r in audit) == pairs


def test_mutual_nn_is_a_matching(spark):
    """Mutual-NN pairs form a partial matching: no vector appears in
    two pairs (its single NN can only be one vector)."""
    rows = _Q["mutual_nn_pairs"].fn(spark, SF_SMALL).collect()
    seen: set[int] = set()
    for r in rows:
        assert r.id_a < r.id_b
        assert r.id_a not in seen and r.id_b not in seen
        seen.add(r.id_a)
        seen.add(r.id_b)


def test_neyman_allocation_sums_to_budget(spark):
    rows = _Q["neyman_allocation_sample_sizes"].fn(spark, SF_SMALL).collect()
    assert sum(r.n_sample for r in rows) == 100


def test_lifecycle_snapshot_consistency(spark):
    rows = _Q["order_lifecycle_snapshot"].fn(spark, SF_SMALL).collect()
    assert rows
    for r in rows:
        assert r.n_lines >= 1
        assert r.ship_span_days >= 0


def test_content_signature_partition_invariant(spark):
    """The signature must not change under ANY repartitioning — the
    property that makes it a dataset identity rather than a layout
    artifact."""
    from pyspark.sql import functions as F

    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet")
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.col("doc_id").cast("string"), F.lit("|"), F.col("text"))),
            1,
            12,
        ),
        16,
        10,
    ).cast("bigint")
    sigs = set()
    for parts in (1, 7, 32):
        [row] = (
            docs.repartition(parts)
            .agg((F.sum(h) % (1 << 48)).alias("sig"))
            .collect()
        )
        sigs.add(row.sig)
    assert len(sigs) == 1
    [q] = _Q["corpus_content_signature"].fn(spark, SF_SMALL).collect()
    assert q.content_sig == sigs.pop()


def test_balanced_downsample_caps(spark):
    rows = _Q["class_balanced_downsample"].fn(spark, SF_SMALL).collect()
    min_class = min(r.n_lang for r in rows)
    for r in rows:
        assert r.n_kept == min(r.n_lang, 2 * min_class)


def test_negative_sampling_slots_sum(spark):
    rows = _Q["negative_sampling_table"].fn(spark, SF_SMALL).collect()
    assert sum(r.n_slots for r in rows) == 10000
    # smoothing: the most common token's slot share must be BELOW its
    # raw frequency share (0.75 flattens), the rarest's above
    tot_n = sum(r.n for r in rows)
    top = max(rows, key=lambda r: r.n)
    assert top.n_slots / 10000 < top.n / tot_n


def test_tv_drift_bounds(spark):
    for r in _Q["weekly_type_mix_tv_drift"].fn(spark, SF_SMALL).collect():
        assert 0 <= r.tv_max_e6 <= 1_000_000


def test_burrows_delta_nonnegative(spark):
    rows = _Q["burrows_delta_sources"].fn(spark, SF_SMALL).collect()
    assert rows
    for r in rows:
        assert r.delta_e6 >= 0
        assert r.source_a < r.source_b


def test_haar_level1_reconstruction(spark):
    """(a+d)/2 and (a-d)/2 must reconstruct the original pair — checked
    against the daily sums recomputed independently."""
    import duckdb as _dd

    con = _dd.connect()
    days = con.execute(
        f"""SELECT CAST(ts AS DATE) d,
                   SUM(CAST(FLOOR(value * 100.0 + 0.5) AS BIGINT))
            FROM '{SF_SMALL}/events.parquet' GROUP BY d ORDER BY d"""
    ).fetchall()
    con.close()
    vals = [v for _, v in days]
    rows = [
        r
        for r in _Q["haar_wavelet_daily"].fn(spark, SF_SMALL).collect()
        if r.level == 1
    ]
    for r in rows:
        v1 = (r.approx + r.detail) // 2
        v2 = (r.approx - r.detail) // 2
        assert v1 == vals[2 * (r.pos - 1)]
        assert v2 == vals[2 * (r.pos - 1) + 1]
