"""Round-4 operator invariants beyond oracle parity: properties that hold
for ANY input corpus, so they catch logic bugs the (single-dataset)
oracle comparison could coincidentally miss.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from multithreaded_map_reduce_library_spark.plans.registry import all_queries
from multithreaded_map_reduce_library_spark.sources.catalog import load_table

from .conftest import SF_SMALL


def test_heaps_fit_bounds_and_totals(spark):
    q = all_queries()["heaps_law_vocab_growth"]
    row = q.fn(spark, SF_SMALL).collect()[0]
    docs = load_table(spark, SF_SMALL, "documents")
    n_docs = docs.count()
    assert row["n_docs"] == n_docs
    # types can never exceed tokens; both positive for a non-empty corpus
    assert 0 < row["n_types"] <= row["n_tokens"]
    # Heaps exponent is a sublinear growth rate: 0 <= beta <= 1 for any
    # corpus scanned in a fixed order (V can't grow faster than n)
    assert 0 <= row["beta_e6"] <= 1_000_000
    # ln K recovers a positive K
    assert row["ln_k_e6"] > -20_000_000


def test_heaps_totals_match_direct_counts(spark):
    q = all_queries()["heaps_law_vocab_growth"]
    row = q.fn(spark, SF_SMALL).collect()[0]
    docs = load_table(spark, SF_SMALL, "documents")
    toks = docs.select(
        F.explode(
            F.filter(F.split(F.lower(F.col("text")), "[ \\t\\r\\n]"), lambda x: x != "")
        ).alias("tok")
    )
    assert row["n_tokens"] == toks.count()
    assert row["n_types"] == toks.distinct().count()


def test_prefix_sum_final_row_is_grand_total(spark):
    q = all_queries()["prefix_sum_distributed_revenue"]
    out = q.fn(spark, SF_SMALL)
    e = (
        load_table(spark, SF_SMALL, "events")
        .filter(F.col("event_type") == "purchase")
        .select(F.floor(F.col("value") * 100.0 + 0.5).cast("bigint").alias("cents"))
    )
    total = e.agg(F.sum("cents")).collect()[0][0]
    assert out.agg(F.max("cum_cents")).collect()[0][0] == total
    assert out.count() == e.count()


def test_prefix_sum_is_monotone_in_event_order(spark):
    q = all_queries()["prefix_sum_distributed_revenue"]
    out = q.fn(spark, SF_SMALL)
    e = load_table(spark, SF_SMALL, "events").filter(
        F.col("event_type") == "purchase"
    )
    joined = out.join(e.select("event_id", "ts", "value"), "event_id")
    rows = sorted(
        joined.collect(), key=lambda r: (r["ts"], r["event_id"])
    )
    prev = 0
    for r in rows:
        # purchase values are nonnegative -> running total never decreases
        assert r["cum_cents"] >= prev
        prev = r["cum_cents"]


def test_stream_wav_ingest_invariant_to_micro_batching(spark, tmp_path):
    """The streaming media-ingest decode is stateless, so its output must
    be identical whether the source drains in one micro-batch or one
    file at a time over a 4-chunk split source."""
    import os

    import duckdb

    q = all_queries()["stream_multimodal_wav_ingest"]
    base = sorted(tuple(r) for r in q.fn(spark, SF_SMALL).collect())

    d = tmp_path / "sf_split"
    d.mkdir()
    for t in (
        "region nation customer supplier part orders lineitem events documents"
    ).split():
        os.symlink(f"{SF_SMALL}/{t}.parquet", d / f"{t}.parquet")
    emb_dir = d / "embeddings.parquet"
    emb_dir.mkdir()
    con = duckdb.connect()
    src = f"{SF_SMALL}/embeddings.parquet"
    n = con.execute(f"SELECT COUNT(*) FROM read_parquet('{src}')").fetchone()[0]
    sz = (n + 3) // 4
    for i in range(4):
        con.execute(
            f"COPY (SELECT * FROM read_parquet('{src}') LIMIT {sz} OFFSET {i * sz})"
            f" TO '{emb_dir}/chunk{i}.parquet' (FORMAT PARQUET)"
        )
    os.environ["SPARK_GRAFT_STREAM_MAXFILES"] = "1"
    try:
        split = sorted(tuple(r) for r in q.fn(spark, str(d)).collect())
    finally:
        os.environ.pop("SPARK_GRAFT_STREAM_MAXFILES", None)
    assert split == base


# --------------------------------------------------------------------------
# Sobel edge energy + WAV quadrature bin (pipeline77)
# --------------------------------------------------------------------------


def _decode_rows(spark, payloads):
    """Run an Arrow kernel over literal binary payloads via a tiny DF."""
    from pyspark.sql.types import BinaryType, LongType, StructField, StructType

    schema = StructType(
        [StructField("asset_id", LongType(), False), StructField("payload", BinaryType(), True)]
    )
    return spark.createDataFrame(
        [(i, bytearray(p)) for i, p in enumerate(payloads)], schema
    )


def test_sobel_constant_image_has_zero_edge_energy(spark):
    import numpy as np

    from multithreaded_map_reduce_library_spark.functions.png import encode_png
    from multithreaded_map_reduce_library_spark.operators.multimodal import (
        image_sobel_energy,
    )

    flat = encode_png(np.full((8, 8), 123, dtype=np.uint8))
    out = image_sobel_energy(_decode_rows(spark, [flat])).collect()[0]
    assert out["edge_energy"] == 0 and out["edge_max"] == 0


def test_sobel_vertical_step_energy_closed_form(spark):
    import numpy as np

    from multithreaded_map_reduce_library_spark.functions.png import encode_png
    from multithreaded_map_reduce_library_spark.operators.multimodal import (
        image_sobel_energy,
    )

    # left half 0, right half 200: a pure vertical edge. For a step of
    # height D at column 4 of an 8-wide image, interior columns 3 and 4
    # see |gx| = 4D (kernel row sums 1+2+1), everything else 0.
    a = np.zeros((8, 8), dtype=np.uint8)
    a[:, 4:] = 200
    out = image_sobel_energy(_decode_rows(spark, [encode_png(a)])).collect()[0]
    # 6 interior rows x 2 columns x 4*200
    assert out["edge_energy"] == 6 * 2 * 4 * 200
    assert out["edge_max"] == 4 * 200


def _wav_bytes(samples):
    import struct

    import numpy as np

    pcm = np.asarray(samples, dtype="<i2").tobytes()
    n = len(pcm)
    return (
        b"RIFF" + struct.pack("<I", 36 + n) + b"WAVE" + b"fmt "
        + struct.pack("<IHHIIHH", 16, 1, 1, 16000, 32000, 2, 16)
        + b"data" + struct.pack("<I", n) + pcm
    )


def test_quadrature_pure_tone_concentrates_power(spark):
    from multithreaded_map_reduce_library_spark.operators.multimodal import (
        wav_quadrature_energy,
    )

    amp = 1000
    tone = [amp, 0, -amp, 0] * 16  # exact fs/4 cosine, 64 samples
    out = wav_quadrature_energy(_decode_rows(spark, [_wav_bytes(tone)])).collect()[0]
    assert out["re_q"] == 32 * amp and out["im_q"] == 0
    assert out["power_q"] == (32 * amp) ** 2
    assert out["energy"] == 32 * amp * amp
    # Parseval at a right-angle bin: bin power == (N/2) * energy for a
    # pure fs/4 tone (all signal energy lives in that bin)
    assert out["power_q"] == 32 * out["energy"]


def test_quadrature_dc_signal_has_zero_bin_power(spark):
    from multithreaded_map_reduce_library_spark.operators.multimodal import (
        wav_quadrature_energy,
    )

    out = wav_quadrature_energy(_decode_rows(spark, [_wav_bytes([700] * 64)])).collect()[0]
    assert out["re_q"] == 0 and out["im_q"] == 0 and out["power_q"] == 0
    assert out["energy"] == 64 * 700 * 700


# --------------------------------------------------------------------------
# Bloom FPR audit + k-core decomposition (pipeline78)
# --------------------------------------------------------------------------


def test_bloom_audit_count_identities(spark):
    from multithreaded_map_reduce_library_spark.plans.pipeline78 import (
        _K_HASH,
        _M_BITS,
    )

    q = all_queries()["bloom_fpr_audit"]
    row = q.fn(spark, SF_SMALL).collect()[0]
    n_cust = load_table(spark, SF_SMALL, "customer").count()
    # members/probes partition the customer key space (o_custkey ⊆ customers)
    assert row["n_members"] + row["n_probes"] == n_cust
    assert 0 < row["n_bits_set"] <= min(_M_BITS, _K_HASH * row["n_members"])
    assert 0 <= row["n_false_pos"] <= row["n_probes"]
    assert 0 <= row["fpr_e6"] <= 1_000_000
    # sized for a low-FPR regime: observed rate should stay well under 20%
    assert row["fpr_e6"] < 200_000


def test_kcore_every_node_meets_degree_and_is_subset(spark):
    from multithreaded_map_reduce_library_spark.plans.pipeline78 import _KCORE_K

    q = all_queries()["kcore_decomposition"]
    rows = q.fn(spark, SF_SMALL).collect()
    assert rows, "3-core should be non-empty on the test graph"
    core = {r["user_id"] for r in rows}
    for r in rows:
        # defining property: within-core degree >= k for every member
        assert r["core_degree"] >= _KCORE_K
    # the k-core is closed: recomputing degrees over the returned node set
    # via the BFS edge rule must reproduce core_degree exactly
    ev = load_table(spark, SF_SMALL, "events")
    s = (
        ev.where(F.col("event_type") == "purchase")
        .select("user_id", F.to_date("ts").alias("d"), F.hour("ts").alias("h"))
        .distinct()
    )
    a = s.select(F.col("user_id").alias("ua"), "d", "h")
    b = s.select(F.col("user_id").alias("ub"), "d", "h")
    p = (
        a.join(b, ["d", "h"])
        .where(F.col("ua") < F.col("ub"))
        .groupBy("ua", "ub")
        .agg(F.count("*").alias("c"))
        .where(F.col("c") >= 1)
        .collect()
    )
    from collections import defaultdict

    deg = defaultdict(int)
    for r in p:
        if r["ua"] in core and r["ub"] in core:
            deg[r["ua"]] += 1
            deg[r["ub"]] += 1
    for r in rows:
        assert deg[r["user_id"]] == r["core_degree"]


# --------------------------------------------------------------------------
# t-closeness audit + Page-Hinkley drift (pipeline79)
# --------------------------------------------------------------------------


def test_t_closeness_bounds_flag_and_python_replay(spark):
    rows = all_queries()["t_closeness_audit"].fn(spark, SF_SMALL).collect()
    assert rows
    ev = (
        load_table(spark, SF_SMALL, "events")
        .where(F.col("value").isNotNull())
        .select("event_type", F.least(F.lit(9), F.floor(F.col("value") / 20.0)).alias("b"))
        .collect()
    )
    from collections import Counter

    byc = Counter((r["event_type"], r["b"]) for r in ev)
    byg = Counter(r["b"] for r in ev)
    n_total = len(ev)
    for r in rows:
        assert 0 <= r["emd_e6"] <= 1_000_000
        assert r["t_ok"] == (r["emd_e6"] <= 200_000)
        # exact replay: integer cumulative-count EMD
        et, ncl = r["event_type"], r["n_class"]
        cum_c = cum_g = num = 0
        for b in range(9):  # boundaries 0..8
            cum_c += byc.get((et, b), 0)
            cum_g += byg.get(b, 0)
            num += abs(cum_c * n_total - cum_g * ncl)
        den = ncl * n_total * 9
        q, rem = divmod(num, den)
        expect = q * 10**6 + (rem * 10**6 + den // 2) // den
        assert r["emd_e6"] == expect
    assert sum(r["n_class"] for r in rows) == n_total


def test_page_hinkley_statistic_properties(spark):
    rows = sorted(
        all_queries()["page_hinkley_drift"].fn(spark, SF_SMALL).collect(),
        key=lambda r: r["day"],
    )
    assert rows
    # PH is nonnegative by construction (M_t minus its running min)
    assert all(r["ph_scaled"] >= 0 for r in rows)
    total = sum(r["cents"] for r in rows)
    n = len(rows)
    # last cumulative deviation telescopes: sum(c_i * n - total) == 0
    assert rows[-1]["m_scaled"] == 0
    # replay the recursion exactly (running min over observed M only)
    m = 0
    mmin = None
    for r in rows:
        m += r["cents"] * n - total
        mmin = m if mmin is None else min(mmin, m)
        assert r["m_scaled"] == m
        assert r["ph_scaled"] == m - mmin
        assert r["drift_alarm"] == ((m - mmin) * 100 > total * 10)


# --------------------------------------------------------------------------
# Conformal coverage + IPS off-policy value (pipeline80)
# --------------------------------------------------------------------------


def test_conformal_marginal_coverage_near_target(spark):
    rows = all_queries()["conformal_coverage_audit"].fn(spark, SF_SMALL).collect()
    assert rows
    n_test = sum(r["n_test"] for r in rows)
    n_cov = sum(r["n_covered"] for r in rows)
    # split-conformal marginal guarantee: overall coverage ~ 1-α = 0.90
    # (wide band: the guarantee is in expectation over splits)
    assert 0.80 <= n_cov / n_test <= 0.99
    qs = {r["qhat_cents"] for r in rows}
    assert len(qs) == 1 and min(qs) > 0  # one global quantile, positive


def test_conformal_qhat_is_kth_smallest_calibration_score(spark):
    import math

    from multithreaded_map_reduce_library_spark.plans.pipeline80 import (
        _bucket,
    )

    orders = load_table(spark, SF_SMALL, "orders")
    customer = load_table(spark, SF_SMALL, "customer")
    o = orders.join(
        customer.select(
            F.col("c_custkey").alias("o_custkey"), F.col("c_mktsegment").alias("seg")
        ),
        "o_custkey",
    ).select(
        "seg",
        F.floor(F.col("o_totalprice") * 100.0 + F.lit(0.5)).cast("bigint").alias("cents"),
        _bucket(F.col("o_orderkey")).alias("bkt"),
    )
    cal = [(r["seg"], r["cents"]) for r in o.where(F.col("bkt") < 50).collect()]
    from collections import defaultdict

    s = defaultdict(int)
    n = defaultdict(int)
    for seg, cents in cal:
        s[seg] += cents
        n[seg] += 1
    pred = {k: (s[k] * 1 + n[k] // 2) // n[k] for k in s}
    scores = sorted(abs(c - pred[seg]) for seg, c in cal)
    k = math.ceil((len(scores) + 1) * 90 / 100.0)
    expect_q = scores[k - 1]
    rows = all_queries()["conformal_coverage_audit"].fn(spark, SF_SMALL).collect()
    assert rows[0]["qhat_cents"] == expect_q


def test_ips_terms_sum_to_full_estimator(spark):
    rows = all_queries()["ips_policy_value"].fn(spark, SF_SMALL).collect()
    assert rows
    ev = (
        load_table(spark, SF_SMALL, "events")
        .where(F.col("value").isNotNull())
        .select(
            (F.col("user_id") % 10).alias("seg"),
            "event_type",
            F.floor(F.col("value") * 100.0 + F.lit(0.5)).cast("bigint").alias("cents"),
        )
        .collect()
    )
    from collections import defaultdict

    n_seg = defaultdict(int)
    n_click = defaultdict(int)
    click_cents = defaultdict(int)
    for r in ev:
        n_seg[r["seg"]] += 1
        if r["event_type"] == "click":
            n_click[r["seg"]] += 1
            click_cents[r["seg"]] += r["cents"]
    n_total = sum(n_seg.values())
    for r in rows:
        g = r["seg"]
        assert r["n_seg"] == n_seg[g] and r["n_target"] == n_click[g]
        assert r["target_cents"] == click_cents[g]
        # weight is the inverse propensity: >= 1 (clicks are a subset)
        assert r["ips_weight_e6"] >= 1_000_000
        num = click_cents[g] * n_seg[g]
        den = n_click[g] * n_total
        q, rem = divmod(num, den)
        assert r["ips_term_e2"] == q * 100 + (rem * 100 + den // 2) // den
    # IPS estimate of per-event reward: positive, and bounded by the max
    # logged reward (a sanity ceiling for a frequency-weighted average)
    est = sum(r["ips_term_e2"] for r in rows)
    assert 0 < est <= max(r["cents"] for r in ev) * 100


# --------------------------------------------------------------------------
# Fellegi-Sunter linkage + schema drift (pipeline81)
# --------------------------------------------------------------------------


def test_fellegi_sunter_weight_ordering_and_pair_count(spark):
    rows = all_queries()["fellegi_sunter_linkage"].fn(spark, SF_SMALL).collect()
    w = {(r["g_seg"], r["g_bal"]): r["weight_e6"] for r in rows}
    # agreement adds evidence: full agreement outranks partial outranks none
    assert w[(1, 1)] > w[(1, 0)] > w[(0, 0)]
    assert w[(1, 1)] > w[(0, 1)] > w[(0, 0)]
    # blocked pair count: sum of C(n_block, 2) over nation blocks
    from collections import Counter

    nk = Counter(
        r["c_nationkey"]
        for r in load_table(spark, SF_SMALL, "customer").select("c_nationkey").collect()
    )
    expect_pairs = sum(n * (n - 1) // 2 for n in nk.values())
    assert sum(r["n_pairs"] for r in rows) == expect_pairs


def test_schema_drift_profile_identities(spark):
    rows = all_queries()["schema_drift_detection"].fn(spark, SF_SMALL).collect()
    by = {(r["col"], r["metric"]): r for r in rows}
    orders = load_table(spark, SF_SMALL, "orders")
    n = orders.count()
    rc = by[("any", "row_count")]
    assert rc["val_a"] + rc["val_b"] == n
    # ndv of a snapshot can never exceed its row count
    for col in ["o_totalprice", "o_orderstatus", "o_orderpriority", "o_custkey"]:
        r = by[(col, "ndv")]
        assert 0 < r["val_a"] <= rc["val_a"] and 0 < r["val_b"] <= rc["val_b"]
    for r in rows:
        den = max(abs(r["val_a"]), abs(r["val_b"]), 1)
        num = abs(r["val_a"] - r["val_b"])
        assert r["rel_delta_e6"] == (num * 10**6 + den // 2) // den
        assert r["drift"] == (r["rel_delta_e6"] > 100_000)


# --------------------------------------------------------------------------
# Zone-map pruning + compaction planning (pipeline82)
# --------------------------------------------------------------------------


def test_zone_map_zones_partition_the_table(spark):
    rows = sorted(
        all_queries()["zone_map_pruning_audit"].fn(spark, SF_SMALL).collect(),
        key=lambda r: r["zone_id"],
    )
    n = load_table(spark, SF_SMALL, "orders").count()
    assert sum(r["n_rows"] for r in rows) == n
    assert [r["zone_id"] for r in rows] == list(range(len(rows)))
    # every zone but the last is exactly full
    assert all(r["n_rows"] == 500 for r in rows[:-1])
    import datetime

    lo = datetime.datetime(1996, 1, 1)
    hi = datetime.datetime(1997, 1, 1)
    for r in rows:
        assert r["min_date"] <= r["max_date"]
        assert r["pruned"] == (r["max_date"] < lo or r["min_date"] >= hi)


def test_compaction_bins_conserve_rows_and_replay(spark):
    rows = all_queries()["compaction_bin_packing"].fn(spark, SF_SMALL).collect()
    ev = load_table(spark, SF_SMALL, "events")
    assert sum(r["bin_rows"] for r in rows) == ev.count()
    daily = sorted(
        ev.groupBy(F.col("ts").cast("date").alias("day"))
        .agg(F.count("*").alias("n"))
        .collect(),
        key=lambda r: r["day"],
    )
    # replay cumulative packing
    from collections import defaultdict

    acc = 0
    bins = defaultdict(lambda: [0, 0])
    for d in daily:
        b = acc // 2000
        bins[b][0] += 1
        bins[b][1] += d["n"]
        acc += d["n"]
    got = {r["bin_id"]: (r["n_files"], r["bin_rows"]) for r in rows}
    assert got == {k: tuple(v) for k, v in bins.items()}
    for r in rows:
        assert r["fill_e6"] == (r["bin_rows"] * 10**6 + 1000) // 2000


# --------------------------------------------------------------------------
# Source LOO valuation + k-fold CV (pipeline83)
# --------------------------------------------------------------------------


def test_loo_contributions_are_consistent_with_direct_recompute(spark):
    rows = all_queries()["source_loo_contribution"].fn(spark, SF_SMALL).collect()
    assert len(rows) > 1
    nn = sum(r["n_docs"] for r in rows)
    gg = sum(r["n_good"] for r in rows)
    for r in rows:
        assert r["m_all_e6"] == (gg * 10**6 + nn // 2) // nn
        d = nn - r["n_docs"]
        assert r["m_without_e6"] == ((gg - r["n_good"]) * 10**6 + d // 2) // d
        assert r["contribution_e6"] == r["m_all_e6"] - r["m_without_e6"]
    # a source whose good-share beats the corpus average must contribute
    # positively, and vice versa (sign property of LOO)
    for r in rows:
        own = r["n_good"] / r["n_docs"]
        rest = (gg - r["n_good"]) / (nn - r["n_docs"])
        if own > rest:
            assert r["contribution_e6"] >= 0
        elif own < rest:
            assert r["contribution_e6"] <= 0


def test_kfold_covers_all_orders_and_mae_positive(spark):
    rows = all_queries()["kfold_cv_mae"].fn(spark, SF_SMALL).collect()
    assert sorted(r["fold"] for r in rows) == [0, 1, 2, 3, 4]
    n = load_table(spark, SF_SMALL, "orders").count()
    assert sum(r["n_test"] for r in rows) == n
    for r in rows:
        # a constant-per-segment model has irreducible error on real data
        assert r["mae_cents_e2"] > 0
    # folds are md5-balanced: no fold should hold more than half the data
    assert max(r["n_test"] for r in rows) < n / 2


# --------------------------------------------------------------------------
# Noisy release mechanism + sequential patterns (pipeline84)
# --------------------------------------------------------------------------


def test_noisy_release_noise_distribution_and_replay(spark):
    import hashlib
    import math

    rows = all_queries()["dp_noisy_release"].fn(spark, SF_SMALL).collect()
    assert rows
    for r in rows:
        assert r["n_noisy"] == r["n_true"] + r["noise"]

        def geom(which):
            key = f"{which}|{r['event_type']}|{r['day'].isoformat()}"
            h = int(hashlib.md5(key.encode()).hexdigest()[:8], 16)
            u = (h + 0.5) / 4294967296.0
            return math.floor(math.log(1.0 - u) / math.log(0.6))

        assert r["noise"] == geom("g1") - geom("g2")
    # symmetric mechanism: mean noise over many cells is near zero
    # (|mean| well under one unit per cell for hundreds of cells)
    noises = [r["noise"] for r in rows]
    assert abs(sum(noises)) < len(noises)


def test_sequential_patterns_support_and_containment(spark):
    rows = all_queries()["sequential_pattern_mining"].fn(spark, SF_SMALL).collect()
    assert rows
    for r in rows:
        assert r["n_users"] >= 3
        assert r["n_occurrences"] >= r["n_users"]
    # every reported trigram's bigram prefix must occur at least as often
    # (anti-monotone support — Apriori property on contiguous patterns)
    ev = sorted(
        load_table(spark, SF_SMALL, "events")
        .select("user_id", "ts", "event_id", "event_type")
        .collect(),
        key=lambda r: (r["user_id"], r["ts"], r["event_id"]),
    )
    from collections import Counter, defaultdict

    tri = Counter()
    by_user = defaultdict(list)
    for r in ev:
        by_user[r["user_id"]].append(r["event_type"])
    for u, seq in by_user.items():
        for i in range(len(seq) - 2):
            tri[(seq[i], seq[i + 1], seq[i + 2])] += 1
    for r in rows:
        assert tri[(r["e1"], r["e2"], r["e3"])] == r["n_occurrences"]


# --------------------------------------------------------------------------
# RANSAC trend fit + Mann-Kendall test (pipeline85)
# --------------------------------------------------------------------------


def _daily_cents(spark):
    ev = load_table(spark, SF_SMALL, "events")
    rows = (
        ev.where((F.col("event_type") == "purchase") & F.col("value").isNotNull())
        .groupBy(F.col("ts").cast("date").alias("day"))
        .agg(
            F.sum(F.floor(F.col("value") * 100.0 + F.lit(0.5)).cast("bigint")).alias("c")
        )
        .collect()
    )
    return [r["c"] for r in sorted(rows, key=lambda r: r["day"])]


def test_ransac_exactly_one_winner_and_inlier_replay(spark):
    rows = all_queries()["ransac_trend_fit"].fn(spark, SF_SMALL).collect()
    assert len(rows) == 8
    winners = [r for r in rows if r["is_best"]]
    assert len(winners) == 1
    top = max(r["n_inliers"] for r in rows)
    assert winners[0]["n_inliers"] == top
    # min-id tie-break among top scorers
    assert winners[0]["cand_id"] == min(
        r["cand_id"] for r in rows if r["n_inliers"] == top
    )
    y = _daily_cents(spark)
    n, total = len(y), sum(y)
    for r in rows:
        inl = sum(
            1
            for px in range(n)
            if abs((y[px] - r["y1"]) * (r["x2"] - r["x1"]) - (px - r["x1"]) * (r["y2"] - r["y1"]))
            * 10 * n
            <= total * abs(r["x2"] - r["x1"])
        )
        assert inl == r["n_inliers"]
        assert r["x1"] != r["x2"]  # sampled pairs are always distinct days


def test_mann_kendall_exact_replay(spark):
    import math

    row = all_queries()["mann_kendall_trend"].fn(spark, SF_SMALL).collect()[0]
    y = _daily_cents(spark)
    n = len(y)
    assert row["n"] == n
    s = sum(
        (1 if y[j] > y[i] else -1 if y[j] < y[i] else 0)
        for i in range(n)
        for j in range(i + 1, n)
    )
    assert row["s_stat"] == s
    from collections import Counter

    ties = sum(t * (t - 1) * (2 * t + 5) for t in Counter(y).values() if t > 1)
    var18 = n * (n - 1) * (2 * n + 5) - ties
    assert row["var18"] == var18
    zc = (s - 1.0) if s > 0 else (s + 1.0) if s < 0 else 0.0
    z = zc / math.sqrt(var18 / 18.0)
    assert row["z_e6"] == math.floor(z * 1e6 + 0.5)


# --------------------------------------------------------------------------
# Benford audit + histogram equalization (pipeline86)
# --------------------------------------------------------------------------


def test_benford_digits_partition_and_expected_shares(spark):
    import math

    rows = all_queries()["benford_first_digit_audit"].fn(spark, SF_SMALL).collect()
    digits = sorted(r["digit"] for r in rows)
    assert set(digits) <= set(range(1, 10))
    n = load_table(spark, SF_SMALL, "orders").where(F.col("o_totalprice") >= 1.0).count()
    assert sum(r["n"] for r in rows) == n
    for r in rows:
        expect = math.floor(math.log10(1.0 + 1.0 / r["digit"]) * 1e6 + 0.5)
        assert r["exp_e6"] == expect
        assert r["dev_e6"] == abs(r["obs_e6"] - r["exp_e6"])
    # Benford expected shares themselves sum to 1 (sanity of the formula)
    assert abs(sum(math.log10(1 + 1 / d) for d in range(1, 10)) - 1.0) < 1e-12


def test_histeq_flat_image_maps_to_zero_and_ramp_spreads(spark):
    import numpy as np

    from multithreaded_map_reduce_library_spark.functions.png import encode_png
    from multithreaded_map_reduce_library_spark.operators.multimodal import (
        image_hist_equalization,
    )

    flat = encode_png(np.full((8, 8), 200, dtype=np.uint8))
    # a perfect ramp: each of 16 buckets holds exactly 4 pixels
    ramp = encode_png(np.arange(64, dtype=np.uint8).reshape(8, 8) * 4)
    out = {
        r["asset_id"]: r
        for r in image_hist_equalization(_decode_rows(spark, [flat, ramp])).collect()
    }
    # flat image: N == cdf_min -> everything maps to 0
    assert out[0]["n_buckets_used"] == 1
    assert out[0]["eq_sum"] == 0 and out[0]["eq_wsum"] == 0
    # ramp: bucket k has cdf 4(k+1), cdf_min=4 -> map(k)=round(4k*15/60)=k
    r = out[1]
    assert r["n_buckets_used"] == 16
    expect_map = [round(4 * k * 15 / 60) for k in range(16)]
    px = [(i * 4) >> 4 for i in range(64)]
    assert r["eq_sum"] == sum(expect_map[b] for b in px)
    assert r["eq_wsum"] == sum(expect_map[b] * (i + 1) for i, b in enumerate(px))


# --------------------------------------------------------------------------
# WAV autocorrelation + decayed top-k (pipeline87)
# --------------------------------------------------------------------------


def test_autocorr_periodic_tone_peaks_at_its_period(spark):
    from multithreaded_map_reduce_library_spark.operators.multimodal import (
        wav_autocorrelation,
    )

    amp = 900
    # period-4 square-ish wave: [A, A, -A, -A] repeated
    wave = ([amp, amp, -amp, -amp] * 16)
    rows = wav_autocorrelation(_decode_rows(spark, [_wav_bytes(wave)])).collect()
    by_lag = {r["lag"]: r for r in rows}
    assert set(by_lag) == {1, 2, 4, 8, 16}
    # full-period lags align perfectly: acf == energy minus edge terms
    n = 64
    for lag in (4, 8, 16):
        assert by_lag[lag]["acf_raw"] == (n - lag) * amp * amp
    # half-period lag anti-correlates
    assert by_lag[2]["acf_raw"] == -(n - 2) * amp * amp
    dom = [r for r in rows if r["is_dominant"]]
    assert len(dom) == 1 and dom[0]["lag"] == 4  # smallest-lag tie-break


def test_decayed_topk_exact_bitshift_scores(spark):
    rows = all_queries()["decayed_topk_event_types"].fn(spark, SF_SMALL).collect()
    assert sorted(r["rank"] for r in rows) == list(range(1, len(rows) + 1))
    daily = (
        load_table(spark, SF_SMALL, "events")
        .groupBy("event_type", F.col("ts").cast("date").alias("day"))
        .agg(F.count("*").alias("cnt"))
        .collect()
    )
    last = max(r["day"] for r in daily)
    from collections import defaultdict

    score = defaultdict(int)
    total = defaultdict(int)
    for r in daily:
        age = (last - r["day"]).days
        total[r["event_type"]] += r["cnt"]
        if age <= 20:
            score[r["event_type"]] += r["cnt"] * (1 << (20 - age))
    for r in rows:
        assert r["score"] == score[r["event_type"]]
        assert r["n_total"] == total[r["event_type"]]
    # ranking is by decayed score (desc), name tie-break (asc)
    by_rank = sorted(rows, key=lambda r: r["rank"])
    for a, b in zip(by_rank, by_rank[1:]):
        assert a["score"] > b["score"] or (
            a["score"] == b["score"] and a["event_type"] < b["event_type"]
        )


# --------------------------------------------------------------------------
# RLE sort-order audit + sentence stats (pipeline88)
# --------------------------------------------------------------------------


def test_rle_runs_bounds_and_date_order_helps(spark):
    rows = all_queries()["rle_sort_order_audit"].fn(spark, SF_SMALL).collect()
    assert len(rows) == 4
    n = load_table(spark, SF_SMALL, "orders").count()
    by = {(r["col"], r["sort_order"]): r for r in rows}
    for r in rows:
        assert r["n_rows"] == n
        # runs bounded by [ndv, n]
        assert 1 <= r["n_runs"] <= n
        assert r["run_ratio_e6"] == (r["n_runs"] * 10**6 + n // 2) // n
    # key order is effectively random w.r.t. status: expect run counts
    # near the independence expectation; a 3-value column can't beat 1/3
    # of rows by much under random order, so by_key runs stay high
    assert by[("o_orderstatus", "by_key")]["n_runs"] > n // 4


def test_sentence_stats_replay_small_sample(spark):
    import re

    rows = all_queries()["sentence_length_stats"].fn(spark, SF_SMALL).collect()
    assert rows
    docs = load_table(spark, SF_SMALL, "documents").select("lang", "text").collect()
    from collections import defaultdict

    cnt = defaultdict(int)
    tok = defaultdict(int)
    long_c = defaultdict(int)
    for d in docs:
        for s in re.split(r"[.!?]+", d["text"]):
            if not s.strip():
                continue
            t = len(re.sub(r"[ \t\r\n]+", " ", s.strip()).split(" "))
            cnt[d["lang"]] += 1
            tok[d["lang"]] += t
            if t >= 12:
                long_c[d["lang"]] += 1
    for r in rows:
        g = r["lang"]
        assert r["n_sentences"] == cnt[g]
        assert r["n_tokens"] == tok[g]
        assert r["mean_len_e2"] == (tok[g] * 100 + cnt[g] // 2) // cnt[g]
        assert r["long_share_e6"] == (long_c[g] * 10**6 + cnt[g] // 2) // cnt[g]


# --------------------------------------------------------------------------
# Huber location + varint postings sizing (pipeline89)
# --------------------------------------------------------------------------


def test_huber_iteration_replay_and_bounds(spark):
    row = all_queries()["huber_location_daily"].fn(spark, SF_SMALL).collect()[0]
    y = _daily_cents(spark)
    n = len(y)
    assert row["n_days"] == n
    s = sum(y)
    mu = (s + n // 2) // n
    assert row["mean_cents"] == mu
    k = mu // 2
    assert row["k_cents"] == k
    m = mu
    for _ in range(3):
        m = (sum(min(max(v, m - k), m + k) for v in y) + n // 2) // n
    assert row["huber_cents"] == m
    assert row["shift_cents"] == mu - m
    # the Huber estimate stays inside the clip interval of the mean
    assert mu - k <= row["huber_cents"] <= mu + k


def test_varint_sizing_bounds_and_manual_spotcheck(spark):
    rows = all_queries()["postings_varint_size_estimate"].fn(spark, SF_SMALL).collect()
    assert rows
    for r in rows:
        assert r["df"] >= 50
        # varint never beats 1 byte/posting nor loses to 5
        assert r["df"] <= r["varint_bytes"] <= 5 * r["df"]
        assert r["raw_bytes"] == 8 * r["df"]
        assert r["ratio_e6"] == (r["varint_bytes"] * 10**6 + (r["raw_bytes"] // 2)) // r["raw_bytes"]
    # spot-check one token end to end
    import re

    docs = load_table(spark, SF_SMALL, "documents").select("doc_id", "text").collect()
    tok = rows[0]["tok"]
    ids = sorted(
        {d["doc_id"] for d in docs if tok in re.split(r"[ \t\r\n]+", d["text"].lower())}
    )
    def vb(g):
        return 1 if g < 128 else 2 if g < 16384 else 3 if g < 2097152 else 4 if g < 268435456 else 5

    prev = 0
    total = 0
    for i in ids:
        total += vb(i - prev)
        prev = i
    assert rows[0]["df"] == len(ids)
    assert rows[0]["varint_bytes"] == total


# --------------------------------------------------------------------------
# Matrix profile + SAX symbols (pipeline90)
# --------------------------------------------------------------------------


def test_matrix_profile_exact_replay(spark):
    rows = all_queries()["matrix_profile_daily"].fn(spark, SF_SMALL).collect()
    y = _daily_cents(spark)
    n = len(y)
    assert len(rows) == n - 2  # one row per length-3 window
    wins = [(y[i], y[i + 1], y[i + 2]) for i in range(n - 2)]

    def d2(a, b):
        return sum((x - z) ** 2 for x, z in zip(a, b))

    by = {r["i"]: r for r in rows}
    mins = {}
    for i in range(n - 2):
        cand = [(d2(wins[i], wins[j]), j) for j in range(n - 2) if abs(i - j) >= 3]
        mins[i] = min(cand)
        assert by[i]["mp"] == mins[i][0]
        assert by[i]["nn_j"] == mins[i][1]
    motifs = [r for r in rows if r["is_motif"]]
    assert len(motifs) == 1
    exp_i = min(range(n - 2), key=lambda i: (mins[i][0], i))
    assert motifs[0]["i"] == exp_i


def test_sax_words_cover_all_days_with_balanced_alphabet(spark):
    rows = all_queries()["sax_weekly_symbols"].fn(spark, SF_SMALL).collect()
    y = _daily_cents(spark)
    n = len(y)
    assert sum(r["n_days"] for r in rows) == n
    allword = "".join(r["sax_word"] for r in rows)
    assert len(allword) == n
    assert set(allword) <= set("abcd")
    from collections import Counter

    c = Counter(allword)
    # ntile(4) balances bucket sizes to within 1
    assert max(c.values()) - min(c.values()) <= 1
    for r in rows:
        assert len(r["sax_word"]) == r["n_days"] <= 7
