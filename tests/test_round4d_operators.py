"""Round-4 session-4 operator invariants: exact Python replays of the
experimentation queries (pipeline105) — properties independent of the
DuckDB oracle, so a cross-engine coincidence can't mask a shared logic
bug."""

from __future__ import annotations

import datetime
import math
from collections import defaultdict

from multithreaded_map_reduce_library_spark.plans.registry import all_queries
from multithreaded_map_reduce_library_spark.sources.catalog import load_table

from .conftest import SF_SMALL

_CUT = datetime.datetime(2024, 1, 16)


def _grid(x: float, k: int = 6) -> int:
    return math.floor(x * float(10**k) + 0.5)


def _per_user(spark):
    """(user_id -> [(ts, cents, event_type)]) replayed in plain Python."""
    ev = load_table(spark, SF_SMALL, "events").select(
        "user_id", "ts", "value", "event_type"
    ).collect()
    by_user = defaultdict(list)
    for r in ev:
        if r["value"] is None:
            continue
        by_user[r["user_id"]].append(
            (r["ts"], math.floor(r["value"] * 100.0 + 0.5), r["event_type"])
        )
    return by_user


def test_cuped_matches_python_replay(spark):
    row = all_queries()["cuped_adjusted_lift"].fn(spark, SF_SMALL).collect()[0]
    by_user = _per_user(spark)
    xs, ys, arms = [], [], []
    for uid, recs in by_user.items():
        xs.append(sum(c for ts, c, _ in recs if ts < _CUT))
        ys.append(sum(c for ts, c, _ in recs if ts >= _CUT))
        arms.append(uid % 2)
    n = len(xs)
    sx, sy = sum(xs), sum(ys)
    sxx = sum(x * x for x in xs)
    sxy = sum(x * y for x, y in zip(xs, ys))
    syy = sum(y * y for y in ys)
    cov = float(sxy) * n - float(sx) * sy
    vx = float(sxx) * n - float(sx) * sx
    vy = float(syy) * n - float(sy) * sy
    theta = cov / vx
    nt = sum(arms)
    nc = n - nt
    syt = sum(y for y, a in zip(ys, arms) if a)
    syc = sy - syt
    sxt = sum(x for x, a in zip(xs, arms) if a)
    sxc = sx - sxt
    diff_raw = float(syt) / nt - float(syc) / nc
    diff_x = float(sxt) / nt - float(sxc) / nc
    assert row["n_users"] == n and row["n_treat"] == nt and row["n_ctrl"] == nc
    assert row["theta_e6"] == _grid(theta)
    assert row["diff_raw_e6"] == _grid(diff_raw)
    assert row["diff_cuped_e6"] == _grid(diff_raw - theta * diff_x)
    assert row["var_reduction_e6"] == _grid((cov * cov) / (vx * vy))
    # rho^2 is a fraction of variance removed: 0 <= rho^2 <= 1
    assert 0 <= row["var_reduction_e6"] <= 10**6


def test_smd_matches_python_replay(spark):
    rows = {
        r["covariate"]: r
        for r in all_queries()["covariate_balance_smd"].fn(spark, SF_SMALL).collect()
    }
    assert set(rows) == {"ev_cnt", "val_cents", "n_types", "active_days"}
    by_user = _per_user(spark)
    cov_vals = defaultdict(lambda: ([], []))  # covariate -> (treat list, ctrl list)
    for uid, recs in by_user.items():
        pre = [(ts, c, et) for ts, c, et in recs if ts < _CUT]
        if not pre:
            continue
        covs = {
            "ev_cnt": len(pre),
            "val_cents": sum(c for _, c, _ in pre),
            "n_types": len({et for _, _, et in pre}),
            "active_days": len({ts.date() for ts, _, _ in pre}),
        }
        for k, v in covs.items():
            cov_vals[k][0 if uid % 2 == 1 else 1].append(v)
    for k, (tv, cv) in cov_vals.items():
        nt, nc = len(tv), len(cv)
        mean_t = float(sum(tv)) / nt
        mean_c = float(sum(cv)) / nc
        var_t = float(sum(v * v for v in tv)) / nt - mean_t * mean_t
        var_c = float(sum(v * v for v in cv)) / nc - mean_c * mean_c
        r = rows[k]
        assert (r["n_treat"], r["n_ctrl"]) == (nt, nc)
        assert r["mean_t_e6"] == _grid(mean_t)
        assert r["mean_c_e6"] == _grid(mean_c)
        if var_t + var_c == 0:
            assert r["smd_e6"] == 0
        else:
            smd = (mean_t - mean_c) / math.sqrt((var_t + var_c) / 2.0)
            assert r["smd_e6"] == _grid(smd)


# --------------------------------------------------------------------------
# brier_decomposition (pipeline106)
# --------------------------------------------------------------------------


def test_brier_decomposition_replay_and_identity(spark):
    row = all_queries()["brier_decomposition"].fn(spark, SF_SMALL).collect()[0]
    docs = load_table(spark, SF_SMALL, "documents").select("text", "lang").collect()
    pts = [
        (min(r["text"].count(" the "), 10), 1 if r["lang"] == "en" else 0) for r in docs
    ]
    n = len(pts)
    p = sum(o for _, o in pts)
    sq = sum((k - 10 * o) ** 2 for k, o in pts)
    assert (row["n_docs"], row["n_pos"]) == (n, p)

    def _ir(num, den, k):
        return (num * 10**k + den // 2) // den

    assert row["brier_e9"] == _ir(sq, 100 * n, 9)
    assert row["uncertainty_e9"] == _ir(p * (n - p), n * n, 9)
    bins = defaultdict(lambda: [0, 0])
    for k, o in pts:
        bins[k][0] += 1
        bins[k][1] += o
    srel = sum(
        math.floor(
            float((k * nk - 10 * pk) ** 2) / (100.0 * nk) * 1e9 + 0.5
        )
        for k, (nk, pk) in bins.items()
    )
    sres = sum(
        math.floor(
            (float(pk) * n - float(p) * nk) ** 2 / (float(nk) * n * n) * 1e9 + 0.5
        )
        for k, (nk, pk) in bins.items()
    )
    assert row["reliability_e9"] == (srel + n // 2) // n
    assert row["resolution_e9"] == (sres + n // 2) // n
    # Murphy identity BS = REL - RES + UNC, up to per-bin e9 quantization
    resid = row["brier_e9"] - (
        row["reliability_e9"] - row["resolution_e9"] + row["uncertainty_e9"]
    )
    assert abs(resid) <= len(bins) + 2


# --------------------------------------------------------------------------
# nelson_aalen_conversion (pipeline106)
# --------------------------------------------------------------------------


def test_nelson_aalen_replay_and_km_bound(spark):
    qs = all_queries()
    na = sorted(
        (r["t_hours"], r["n_risk"], r["d"], r["cumhaz_e6"], r["fh_survival_e6"])
        for r in qs["nelson_aalen_conversion"].fn(spark, SF_SMALL).collect()
    )
    # exact replay of the risk-set walk
    ev = load_table(spark, SF_SMALL, "events").select(
        "user_id", "ts", "event_type"
    ).collect()
    views, buys, t_end = {}, {}, max(r["ts"] for r in ev)
    for r in ev:
        if r["event_type"] == "view":
            views[r["user_id"]] = min(views.get(r["user_id"], r["ts"]), r["ts"])
        elif r["event_type"] == "purchase":
            buys[r["user_id"]] = min(buys.get(r["user_id"], r["ts"]), r["ts"])
    obs = []
    for uid, tv in views.items():
        tb = buys.get(uid)
        if tb is not None and tb > tv:
            obs.append((math.floor((tb - tv).total_seconds() / 3600), 1))
        else:
            obs.append((math.floor((t_end - tv).total_seconds() / 3600), 0))
    times = defaultdict(lambda: [0, 0])  # t -> [d, leaving]
    for t, c in obs:
        times[t][0] += c
        times[t][1] += 1
    n_risk, cum, expect = len(obs), 0, []
    for t in sorted(times):
        d, leaving = times[t]
        if d > 0:
            cum += (d * 10**6 + n_risk // 2) // n_risk
            expect.append(
                (t, n_risk, d, cum, math.floor(math.exp(-cum / 1e6) * 1e6 + 0.5))
            )
        n_risk -= leaving
    assert na == sorted(expect)
    # cumulative hazard is nondecreasing; exp(-H) >= KM product-limit
    km = {
        r["t_hours"]: r["survival_e6"]
        for r in qs["kaplan_meier_conversion"].fn(spark, SF_SMALL).collect()
    }
    for t, _, _, _, fh in na:
        if t in km:
            assert fh >= km[t] - 1  # 1e-6 grid slack


# --------------------------------------------------------------------------
# hdr_quantile_sketch / hdr_quantiles_by_type (pipeline107)
# --------------------------------------------------------------------------


def _hdr_bid(v: int) -> int:
    if v < 32:
        return v
    msb = v.bit_length() - 1
    return 64 * msb + (v >> (msb - 5))


def _hdr_lo_w(bid: int) -> tuple[int, int]:
    if bid < 32:
        return bid, 1
    msb, r = divmod(bid, 64)
    return r << (msb - 5), 1 << (msb - 5)


def test_hdr_sketch_matches_python_replay(spark):
    rows = all_queries()["hdr_quantile_sketch"].fn(spark, SF_SMALL).collect()
    ev = load_table(spark, SF_SMALL, "events").select("event_type", "value").collect()
    vals = [
        math.floor(r["value"] * 100.0 + 0.5)
        for r in ev
        if r["event_type"] == "purchase" and r["value"] is not None
    ]
    n = len(vals)
    sketch = defaultdict(int)
    for v in vals:
        sketch[_hdr_bid(v)] += 1
    svals = sorted(vals)
    by_q = {r["q"]: r for r in rows}
    assert set(by_q) == {50, 90, 95, 99}
    for q, r in by_q.items():
        t = (q * n + 99) // 100
        assert r["target_rank"] == t
        # estimate: first bucket whose cumulative count reaches t
        cum = 0
        for bid in sorted(sketch):
            cum += sketch[bid]
            if cum >= t:
                lo, w = _hdr_lo_w(bid)
                break
        assert (r["est_lo"], r["bucket_width"]) == (lo, w)
        assert r["exact_v"] == svals[t - 1]
        assert r["within"] is True
        # HDR guarantee: width <= lo/32 for the log range (exact below 32)
        assert r["est_lo"] < 32 or r["bucket_width"] * 32 <= r["est_lo"]
        assert r["n_buckets"] == len(sketch)
        assert r["n_distinct"] == len(set(vals))
    # mergeability: per-half sketches sum to the global sketch
    half = len(vals) // 2
    s1, s2 = defaultdict(int), defaultdict(int)
    for v in vals[:half]:
        s1[_hdr_bid(v)] += 1
    for v in vals[half:]:
        s2[_hdr_bid(v)] += 1
    merged = defaultdict(int)
    for s in (s1, s2):
        for k, c in s.items():
            merged[k] += c
    assert dict(merged) == dict(sketch)


def test_hdr_by_type_within_always_true(spark):
    rows = all_queries()["hdr_quantiles_by_type"].fn(spark, SF_SMALL).collect()
    assert len(rows) == 10  # 5 event types x 2 quantiles
    for r in rows:
        assert r["within"] is True
        assert r["est_lo"] <= r["exact_v"] < r["est_lo"] + r["bucket_width"]


# --------------------------------------------------------------------------
# repeated_ngram_audit / stream_hdr_quantiles_daily (pipeline108)
# --------------------------------------------------------------------------


def _shingles(text: str, n: int) -> list[str]:
    toks = [t for t in __import__("re").split(r"[ \t\r\n]", text) if t != ""]
    if len(toks) < n:
        return [" ".join(toks)]
    return [" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)]


def test_repeated_ngram_audit_replay(spark):
    rows = {
        r["max_rep_n"]: (r["n_docs"], r["share_e6"])
        for r in all_queries()["repeated_ngram_audit"].fn(spark, SF_SMALL).collect()
    }
    docs = load_table(spark, SF_SMALL, "documents").select("text").collect()
    hist = defaultdict(int)
    for r in docs:
        level = 0
        for n in (2, 4, 8, 16):
            sh = _shingles(r["text"], n)
            if len(sh) > len(set(sh)):
                level = n
        hist[level] += 1
    n_total = len(docs)
    assert rows == {
        k: (c, (c * 10**6 + n_total // 2) // n_total) for k, c in hist.items()
    }
    # shares add to ~1
    assert abs(sum(s for _, s in rows.values()) - 10**6) <= len(rows)


def test_stream_hdr_daily_matches_batch_replay(spark):
    rows = {
        r["day"]: r
        for r in all_queries()["stream_hdr_quantiles_daily"].fn(spark, SF_SMALL).collect()
    }
    ev = load_table(spark, SF_SMALL, "events").select("ts", "value").collect()
    by_day = defaultdict(list)
    for r in ev:
        if r["value"] is not None:
            by_day[r["ts"].date()].append(math.floor(r["value"] * 100.0 + 0.5))
    assert set(rows) == set(by_day)
    for day, vals in by_day.items():
        counters = defaultdict(int)
        for v in vals:
            counters[_hdr_bid(v)] += 1
        r = rows[day]
        assert r["n_events"] == len(vals)
        assert r["hdr_checksum"] == sum(c * (b + 1) for b, c in counters.items())
        for q, col in ((50, "p50_lo"), (95, "p95_lo")):
            t = (q * len(vals) + 99) // 100
            cum = 0
            for b in sorted(counters):
                cum += counters[b]
                if cum >= t:
                    lo, w = _hdr_lo_w(b)
                    break
            assert r[col] == lo
            # sketch bound: the true quantile lies in [lo, lo+w)
            exact = sorted(vals)[t - 1]
            assert lo <= exact < lo + w


# --------------------------------------------------------------------------
# graph_diameter_double_sweep / max_drawdown_daily (pipeline109)
# --------------------------------------------------------------------------


def test_double_sweep_matches_python_bfs(spark):
    row = all_queries()["graph_diameter_double_sweep"].fn(spark, SF_SMALL).collect()[0]
    ev = load_table(spark, SF_SMALL, "events").select(
        "user_id", "ts", "event_type"
    ).collect()
    slots = {(r["user_id"], r["ts"].date(), r["ts"].hour)
             for r in ev if r["event_type"] == "purchase"}
    pair_counts = defaultdict(int)
    by_slot = defaultdict(set)
    for uid, d, h in slots:
        by_slot[(d, h)].add(uid)
    for us in by_slot.values():
        us = sorted(us)
        for i in range(len(us)):
            for j in range(i + 1, len(us)):
                pair_counts[(us[i], us[j])] += 1
    adj = defaultdict(set)
    for (a, b), c in pair_counts.items():
        if c >= 2:
            adj[a].add(b)
            adj[b].add(a)

    def bfs(src, depth=8):
        dist = {src: 0}
        frontier = [src]
        for k in range(1, depth + 1):
            nxt = []
            for u in frontier:
                for v in adj[u]:
                    if v not in dist:
                        dist[v] = k
                        nxt.append(v)
            frontier = nxt
        return dist

    seed = min(adj)
    d1 = bfs(seed)
    ecc1 = max(d1.values())
    far = min(u for u, l in d1.items() if l == ecc1)
    d2 = bfs(far)
    assert (row["seed_node"], row["ecc_seed"], row["far_node"]) == (seed, ecc1, far)
    assert row["diameter_lb"] == max(d2.values())
    assert row["n_reached"] == len(d2)
    # double-sweep property: second eccentricity >= first
    assert row["diameter_lb"] >= row["ecc_seed"]


def test_max_drawdown_matches_python_replay(spark):
    row = all_queries()["max_drawdown_daily"].fn(spark, SF_SMALL).collect()[0]
    orders = load_table(spark, SF_SMALL, "orders").select(
        "o_orderdate", "o_totalprice"
    ).collect()
    daily = defaultdict(int)
    for r in orders:
        daily[r["o_orderdate"].date()] += math.floor(r["o_totalprice"] * 100.0 + 0.5)
    peak, mdd, trough_day, trough_v, peak_at_trough = 0, -1, None, None, None
    for day in sorted(daily):
        v = daily[day]
        peak = max(peak, v)
        if peak - v > mdd:
            mdd, trough_day, trough_v, peak_at_trough = peak - v, day, v, peak
    peak_day = min(d for d in daily if d <= trough_day and daily[d] == peak_at_trough)
    assert (row["peak_day"], row["trough_day"]) == (peak_day, trough_day)
    assert (row["peak_cents"], row["trough_cents"]) == (peak_at_trough, trough_v)
    assert row["max_drawdown_cents"] == mdd


# --------------------------------------------------------------------------
# rollup_lattice_cardinalities / watermark_lateness_audit (pipeline110)
# --------------------------------------------------------------------------


def test_rollup_lattice_replay(spark):
    rows = {
        r["gid"]: r
        for r in all_queries()["rollup_lattice_cardinalities"].fn(spark, SF_SMALL).collect()
    }
    assert set(rows) == set(range(8))
    orders = load_table(spark, SF_SMALL, "orders").select(
        "o_orderstatus", "o_orderpriority", "o_orderdate"
    ).collect()
    base = [(r["o_orderstatus"], r["o_orderpriority"], r["o_orderdate"].year)
            for r in orders]
    n_base = len(base)
    for gid in range(8):
        keep = [not (gid & 4), not (gid & 2), not (gid & 1)]
        cells = {tuple(v if k else None for v, k in zip(t, keep)) for t in base}
        r = rows[gid]
        assert r["n_cells"] == len(cells)
        # conservation: every grouping covers every base row exactly once
        assert r["n_rows_covered"] == n_base
        assert r["compression_e6"] == (len(cells) * 10**6 + n_base // 2) // n_base


def test_watermark_lateness_replay(spark):
    row = all_queries()["watermark_lateness_audit"].fn(spark, SF_SMALL).collect()[0]
    ev = load_table(spark, SF_SMALL, "events").select(
        "event_id", "user_id", "ts"
    ).collect()
    recs = sorted(
        (int(r["ts"].timestamp()) // 300, r["user_id"], r["event_id"],
         int(r["ts"].timestamp()))
        for r in ev
    )
    run_max, lates = -1, []
    for _, _, _, es in recs:
        run_max = max(run_max, es)
        lates.append(run_max - es)
    n = len(lates)
    assert row["n_events"] == n
    assert row["n_late"] == sum(1 for l in lates if l > 0)
    assert row["max_s"] == max(lates)
    s = sorted(lates)
    for q, col in ((50, "p50_s"), (95, "p95_s"), (99, "p99_s")):
        assert row[col] == s[(q * n + 99) // 100 - 1]
    # the 5-minute batch arrival model bounds lateness by one batch
    assert row["max_s"] < 300


# --------------------------------------------------------------------------
# mutual_information_type_weekday / kendall_tau_daily (pipeline111)
# --------------------------------------------------------------------------


def test_mutual_information_replay(spark):
    row = all_queries()["mutual_information_type_weekday"].fn(spark, SF_SMALL).collect()[0]
    ev = load_table(spark, SF_SMALL, "events").select("event_type", "ts").collect()
    epoch = datetime.date(1970, 1, 1)
    pts = [(r["event_type"], (r["ts"].date() - epoch).days % 7) for r in ev]
    n = len(pts)
    jd, mx, my = defaultdict(int), defaultdict(int), defaultdict(int)
    for x, y in pts:
        jd[(x, y)] += 1
        mx[x] += 1
        my[y] += 1
    mi = sum(
        math.floor((c / n) * math.log(c * n / (mx[x] * my[y])) * 1e9 + 0.5)
        for (x, y), c in jd.items()
    )
    hx = sum(math.floor(-(c / n) * math.log(c / n) * 1e9 + 0.5) for c in mx.values())
    hy = sum(math.floor(-(c / n) * math.log(c / n) * 1e9 + 0.5) for c in my.values())
    assert (row["n_events"], row["mi_e9"], row["hx_e9"], row["hy_e9"]) == (n, mi, hx, hy)
    hmin = min(hx, hy)
    assert row["nmi_e6"] == (mi * 10**6 + hmin // 2) // hmin
    # MI is nonnegative and bounded by both marginal entropies
    assert 0 <= row["mi_e9"] <= min(hx, hy) + len(jd)


def test_kendall_tau_replay(spark):
    row = all_queries()["kendall_tau_daily"].fn(spark, SF_SMALL).collect()[0]
    ev = load_table(spark, SF_SMALL, "events").select(
        "ts", "event_type", "value"
    ).collect()
    daily = defaultdict(lambda: [0, 0])
    for r in ev:
        d = daily[r["ts"].date()]
        d[0] += 1
        if r["event_type"] == "purchase":
            d[1] += math.floor(r["value"] * 100.0 + 0.5)
    series = [tuple(v) for _, v in sorted(daily.items())]
    c = d = tx = ty = txy = 0
    for i in range(len(series)):
        for j in range(i + 1, len(series)):
            de = series[i][0] - series[j][0]
            dr = series[i][1] - series[j][1]
            if de * dr > 0:
                c += 1
            elif de * dr < 0:
                d += 1
            elif de == 0 and dr == 0:
                txy += 1
            elif de == 0:
                tx += 1
            else:
                ty += 1
    n0 = len(series) * (len(series) - 1) // 2
    assert (row["concordant"], row["discordant"]) == (c, d)
    assert (row["ties_x"], row["ties_y"], row["ties_both"]) == (tx, ty, txy)
    tau = (c - d) / math.sqrt(float(n0 - tx - txy) * (n0 - ty - txy))
    assert row["tau_b_e6"] == math.floor(tau * 1e6 + 0.5)
    assert -(10**6) <= row["tau_b_e6"] <= 10**6


# --------------------------------------------------------------------------
# isotonic_calibration_fit / expected_calibration_error (pipeline112)
# --------------------------------------------------------------------------


def _forecast_bins(spark):
    docs = load_table(spark, SF_SMALL, "documents").select("text", "lang").collect()
    bins = defaultdict(lambda: [0, 0])
    for r in docs:
        k = min(r["text"].count(" the "), 10)
        bins[k][0] += 1
        bins[k][1] += 1 if r["lang"] == "en" else 0
    return dict(bins)


def test_isotonic_fit_matches_pava_and_is_monotone(spark):
    rows = sorted(
        (r["k"], r["n_k"], r["pos_k"], r["rate_e9"], r["fitted_e9"])
        for r in all_queries()["isotonic_calibration_fit"].fn(spark, SF_SMALL).collect()
    )
    bins = _forecast_bins(spark)
    assert [(k, n, p) for k, n, p, _, _ in rows] == [
        (k, *bins[k]) for k in sorted(bins)
    ]
    # fitted is monotone nondecreasing
    fitted = [f for *_, f in rows]
    assert fitted == sorted(fitted)
    # PAVA replay on exact rationals, then e9-compare to the minimax fit.
    # (PAVA pools on exact fractions; the query quantizes each interval
    # rate before max-min, so allow 1 grid ulp.)
    blocks = [
        [n, p] for k, (n, p) in sorted(bins.items())
    ]  # [weight, positives] per block
    stack = []
    for w, p in blocks:
        stack.append([w, p])
        while len(stack) >= 2 and stack[-2][1] * stack[-1][0] >= stack[-1][1] * stack[-2][0]:
            w2, p2 = stack.pop()
            stack[-1][0] += w2
            stack[-1][1] += p2
    # expand PAVA blocks back over the original bins
    expanded = []
    bi = 0
    for w, p in stack:
        acc = 0
        while acc < w:
            acc += blocks[bi][0]
            expanded.append((p, w))
            bi += 1
    assert len(expanded) == len(rows)
    for (k, n, p, _, fitted_e9), (bp, bw) in zip(rows, expanded):
        pava_e9 = (bp * 10**9 + bw // 2) // bw
        assert abs(fitted_e9 - pava_e9) <= 1
    # pool preservation: total positives match
    assert sum(p for _, p in stack) == sum(p for _, (n, p) in bins.items())


def test_ece_exact_replay(spark):
    row = all_queries()["expected_calibration_error"].fn(spark, SF_SMALL).collect()[0]
    bins = _forecast_bins(spark)
    n = sum(nk for nk, _ in bins.values())
    sg = sum(abs(k * nk - 10 * pk) for k, (nk, pk) in bins.items())
    assert row["n_docs"] == n
    assert row["n_bins"] == len(bins)
    assert row["ece_e9"] == (sg * 10**9 + (10 * n) // 2) // (10 * n)
    mce = max(
        (abs(k * nk - 10 * pk) * 10**9 + (10 * nk) // 2) // (10 * nk)
        for k, (nk, pk) in bins.items()
    )
    assert row["mce_e9"] == mce
    assert row["ece_e9"] <= row["mce_e9"]


# --------------------------------------------------------------------------
# survival_concordance_index / rmst_conversion (pipeline113)
# --------------------------------------------------------------------------


def _survival_obs(spark):
    ev = load_table(spark, SF_SMALL, "events").select(
        "user_id", "ts", "event_type"
    ).collect()
    views, buys, clicks = {}, {}, defaultdict(int)
    t_end = max(r["ts"] for r in ev)
    for r in ev:
        if r["event_type"] == "view":
            views[r["user_id"]] = min(views.get(r["user_id"], r["ts"]), r["ts"])
        elif r["event_type"] == "purchase":
            buys[r["user_id"]] = min(buys.get(r["user_id"], r["ts"]), r["ts"])
        elif r["event_type"] == "click":
            clicks[r["user_id"]] += 1
    obs = []
    for uid, tv in views.items():
        tb = buys.get(uid)
        # same constant score cap as the plan/oracle (pipeline113._SCORE_CAP)
        sc = min(clicks[uid], 4096)
        if tb is not None and tb > tv:
            obs.append((uid, sc, math.floor((tb - tv).total_seconds() / 3600), 1))
        else:
            obs.append((uid, sc, math.floor((t_end - tv).total_seconds() / 3600), 0))
    return obs


def test_c_index_matches_pairwise_replay(spark):
    row = all_queries()["survival_concordance_index"].fn(spark, SF_SMALL).collect()[0]
    obs = _survival_obs(spark)
    n_comp = conc2 = 0
    for ui, si, ti, ci in obs:
        if ci != 1:
            continue
        for uj, sj, tj, cj in obs:
            if uj == ui:
                continue
            if tj > ti or (tj == ti and cj == 0):
                n_comp += 1
                conc2 += 2 if si > sj else (1 if si == sj else 0)
    assert (row["n_users"], row["n_comparable"], row["conc2"]) == (
        len(obs), n_comp, conc2,
    )
    assert row["c_index_e6"] == (conc2 * 10**6 + n_comp) // (2 * n_comp)
    assert 0 <= row["c_index_e6"] <= 10**6


def test_rmst_matches_km_integral(spark):
    row = all_queries()["rmst_conversion"].fn(spark, SF_SMALL).collect()[0]
    obs = _survival_obs(spark)
    times = defaultdict(lambda: [0, 0])
    for _, _, t, c in obs:
        times[t][0] += c
        times[t][1] += 1
    n_risk, lq_cum, km = len(obs), 0, []
    for t in sorted(times):
        d, leaving = times[t]
        if d > 0 and n_risk > d:
            lq_cum += math.floor(math.log((n_risk - d) / n_risk) * 1e6 + 0.5)
            if t < 240:
                km.append((t, math.floor(math.exp(lq_cum / 1e6) * 1e6 + 0.5)))
        n_risk -= leaving
    if km:
        head = km[0][0]
        tail = 0
        for idx, (t, s) in enumerate(km):
            t_next = min(km[idx + 1][0] if idx + 1 < len(km) else 240, 240)
            tail += s * (t_next - t)
        expect = head * 10**6 + tail
    else:
        expect = 240 * 10**6
    assert row["rmst_e6_hours"] == expect
    assert row["n_steps"] == len(km)
    # RMST is bounded by the horizon
    assert 0 <= row["rmst_e6_hours"] <= 240 * 10**6


# --------------------------------------------------------------------------
# multimodal_wav_ulaw_roundtrip (pipeline114)
# --------------------------------------------------------------------------


def _ulaw_roundtrip(s16: int) -> int:
    m = min(abs(s16), 32635) + 132
    e = m.bit_length() - 1 - 7
    mant = (m >> (e + 3)) & 15
    mag = (((mant << 3) + 132) << e) - 132
    return -mag if s16 < 0 else mag


def test_ulaw_roundtrip_matches_python_replay(spark):
    rows = all_queries()["multimodal_wav_ulaw_roundtrip"].fn(spark, SF_SMALL).collect()
    emb = load_table(spark, SF_SMALL, "embeddings").select("vec_id", "embedding").collect()
    expect = {}
    for r in emb:
        s16 = [
            math.floor(max(-1.0, min(1.0, float(x))) * 32767.0 + 0.5)
            for x in r["embedding"]
        ]
        dec = [_ulaw_roundtrip(s) for s in s16]
        for f in range(len(dec) // 16):
            d = dec[f * 16 : (f + 1) * 16]
            o = s16[f * 16 : (f + 1) * 16]
            expect[(r["vec_id"], f)] = (
                sum(v * v for v in d),
                sum((a - b) ** 2 for a, b in zip(o, d)),
            )
    got = {(r["asset_id"], r["frame_idx"]): (r["energy"], r["err_energy"]) for r in rows}
    assert got == expect
    # companding is ~40 dB SNR: error energy is tiny vs signal energy
    tot_e = sum(e for e, _ in got.values())
    tot_err = sum(x for _, x in got.values())
    assert tot_err * 100 < tot_e


def test_ulaw_kernel_raises_on_pcm16_container(spark):
    import pytest as _pytest

    from multithreaded_map_reduce_library_spark.operators.multimodal import (
        embeddings_as_wav_assets,
        wav_ulaw_roundtrip_energy,
    )
    from pyspark.sql import functions as F

    emb = load_table(spark, SF_SMALL, "embeddings").limit(4)
    pcm16_assets = embeddings_as_wav_assets(emb)  # fmt code 1, not 7
    originals = emb.select(
        F.col("vec_id").alias("asset_id"),
        F.transform(
            F.col("embedding"),
            lambda x: F.floor(
                F.least(F.greatest(x.cast("double"), F.lit(-1.0)), F.lit(1.0))
                * 32767.0
                + F.lit(0.5)
            ).cast("int"),
        ).alias("s16"),
    )
    with _pytest.raises(Exception) as exc:
        wav_ulaw_roundtrip_energy(pcm16_assets, originals).collect()
    assert "mu-law" in str(exc.value) or "NotImplementedError" in str(exc.value)


# --------------------------------------------------------------------------
# voptimal_histogram_daily (pipeline115)
# --------------------------------------------------------------------------


def test_voptimal_matches_python_dp(spark):
    rows = sorted(
        (r["bucket_id"], r["start_day"], r["end_day"], r["n_days"], r["bucket_sse"])
        for r in all_queries()["voptimal_histogram_daily"].fn(spark, SF_SMALL).collect()
    )
    ev = load_table(spark, SF_SMALL, "events").select(
        "ts", "event_type", "value"
    ).collect()
    daily = defaultdict(int)
    for r in ev:
        if r["event_type"] == "purchase":
            daily[r["ts"].date()] += math.floor(r["value"] * 100.0 + 0.5)
    days = sorted(daily)
    v = [(daily[d] + 50) // 100 for d in days]
    n = len(v)
    P = [0] * (n + 1)
    Q = [0] * (n + 1)
    for i in range(1, n + 1):
        P[i] = P[i - 1] + v[i - 1]
        Q[i] = Q[i - 1] + v[i - 1] * v[i - 1]

    def cost(j, i):  # SSE of v[j..i-1] (prefix indices), rounded like the query
        return math.floor((Q[i] - Q[j]) - float(P[i] - P[j]) * (P[i] - P[j]) / (i - j) + 0.5)

    INF = float("inf")
    dp = [[INF] * (n + 1) for _ in range(5)]
    arg = [[0] * (n + 1) for _ in range(5)]
    for i in range(1, n + 1):
        dp[1][i] = cost(0, i)
    for k in range(2, 5):
        for i in range(k, n + 1):
            best, bj = INF, None
            for j in range(k - 1, i):
                c = dp[k - 1][j] + cost(j, i)
                if c < best or (c == best and (bj is None or j < bj)):
                    best, bj = c, j
            dp[k][i], arg[k][i] = best, bj
    e3 = arg[4][n]
    e2 = arg[3][e3]
    e1 = arg[2][e2]
    expect = []
    for bid, (s, e) in enumerate(
        [(1, e1), (e1 + 1, e2), (e2 + 1, e3), (e3 + 1, n)], start=1
    ):
        expect.append((bid, days[s - 1], days[e - 1], e - s + 1, cost(s - 1, e)))
    assert rows == expect
    # total cost is optimal: equals dp[4][n]
    assert sum(r[4] for r in rows) == dp[4][n]


# --------------------------------------------------------------------------
# weighted_shortest_paths / sql_modern_star_revenue (pipeline116)
# --------------------------------------------------------------------------


def test_weighted_sp_matches_python_bellman_ford(spark):
    rows = {
        r["user_id"]: r["dist"]
        for r in all_queries()["weighted_shortest_paths"].fn(spark, SF_SMALL).collect()
    }
    ev = load_table(spark, SF_SMALL, "events").select(
        "user_id", "ts", "event_type"
    ).collect()
    by_slot = defaultdict(set)
    for r in ev:
        if r["event_type"] == "purchase":
            by_slot[(r["ts"].date(), r["ts"].hour)].add(r["user_id"])
    pc = defaultdict(int)
    for us in by_slot.values():
        us = sorted(us)
        for i in range(len(us)):
            for j in range(i + 1, len(us)):
                pc[(us[i], us[j])] += 1
    adj = defaultdict(list)
    for (a, b), c in pc.items():
        if c >= 2:
            w = 11 - min(c, 10)
            adj[a].append((b, w))
            adj[b].append((a, w))
    src = min(adj)
    dist = {src: 0}
    for _ in range(8):
        nd = dict(dist)
        for u, d in dist.items():
            for v, w in adj[u]:
                if v not in nd or d + w < nd[v]:
                    nd[v] = d + w
        dist = nd
    assert rows == dist
    # weighted distance is bounded below by hop count (w >= 1)
    bfs = all_queries()["bfs_copurchase_layers"].fn(spark, SF_SMALL).collect()
    layers = {r["user_id"]: r["layer"] for r in bfs}
    for u, d in rows.items():
        if u in layers:
            assert d >= layers[u]


def test_sql_modern_star_matches_dataframe_twin(spark):
    rows = all_queries()["sql_modern_star_revenue"].fn(spark, SF_SMALL).collect()
    orders = load_table(spark, SF_SMALL, "orders").select(
        "o_orderstatus", "o_orderdate", "o_totalprice"
    ).collect()
    agg = defaultdict(int)
    for r in orders:
        agg[(r["o_orderstatus"], r["o_orderdate"].year)] += math.floor(
            r["o_totalprice"] * 100.0 + 0.5
        )
    expect = sorted((s, y, v) for (s, y), v in agg.items() if v > 0)
    assert [(r["status"], r["yr"], r["revenue_cents"]) for r in rows] == expect
    assert rows[0].asDict().keys() == {"status", "yr", "revenue_cents"}  # EXCEPT dropped n_orders


# --------------------------------------------------------------------------
# rake_keyphrases / pps_systematic_docs (pipeline117)
# --------------------------------------------------------------------------

_STOPWORDS = set(
    "the of and a to in is it that for on with as at by an be this was are "
    "from or has had not have but which you his her its their".split()
)


def test_rake_matches_python_replay(spark):
    rows = [
        (r["phrase"], r["n_occurrences"], r["score_e6"])
        for r in all_queries()["rake_keyphrases"].fn(spark, SF_SMALL).collect()
    ]
    docs = load_table(spark, SF_SMALL, "documents").select("doc_id", "text").collect()
    runs = []
    for r in docs:
        toks = [t.lower() for t in __import__("re").split(r"[ \t\r\n]", r["text"]) if t]
        cur = []
        for t in toks + ["the"]:  # sentinel stopword flushes the last run
            if t in _STOPWORDS:
                if cur and len(cur) <= 4:
                    runs.append(tuple(cur))
                cur = []
            else:
                cur.append(t)
    freq, deg = defaultdict(int), defaultdict(int)
    for ph in runs:
        for w in ph:
            freq[w] += 1
            deg[w] += len(ph)
    ws = {w: (deg[w] * 10**6 + freq[w] // 2) // freq[w] for w in freq}
    scores = defaultdict(int)
    occ = defaultdict(int)
    for ph in runs:
        s = sum(ws[w] for w in ph)
        key = " ".join(ph)
        scores[key] = max(scores[key], s)
        occ[key] += 1
    expect = sorted(
        ((k, occ[k], scores[k]) for k in scores), key=lambda x: (-x[2], x[0])
    )[:15]
    assert rows == expect


def test_pps_ht_estimate_properties(spark):
    row = all_queries()["pps_systematic_docs"].fn(spark, SF_SMALL).collect()[0]
    docs = load_table(spark, SF_SMALL, "documents").select(
        "doc_id", "n_chars", "text"
    ).collect()
    sizes = [(r["doc_id"], r["n_chars"],
              len([t for t in __import__("re").split(r"[ \t\r\n]", r["text"]) if t]))
             for r in sorted(docs, key=lambda r: r["doc_id"])]
    T = sum(s for _, s, _ in sizes)
    n = 20
    # replay the threshold-crossing walk
    cum, draws, ht = 0, 0, 0
    distinct = 0
    for _, sz, tk in sizes:
        lo, cum = cum, cum + sz

        def f(x):
            if 2 * x * n < T:
                return 0
            return min(n, (2 * x * n - T) // (2 * T) + 1)

        m = max(f(cum) - f(lo), 0)
        if m:
            distinct += 1
            draws += m
            ht += m * ((tk * T * 100 + (n * sz) // 2) // (n * sz))
    assert (row["n_draws"], row["n_distinct_docs"]) == (draws, distinct)
    assert row["ht_toks_e2"] == ht
    # exactly n thresholds land somewhere
    assert draws == n
    # PPS-by-size keeps a size-correlated total within a few percent
    assert row["rel_err_e6"] < 100_000


# --------------------------------------------------------------------------
# learned_index_audit / bitmap_container_stats (pipeline118)
# --------------------------------------------------------------------------


def test_learned_index_matches_python_ols(spark):
    row = all_queries()["learned_index_audit"].fn(spark, SF_SMALL).collect()[0]
    orders = load_table(spark, SF_SMALL, "orders").select(
        "o_orderkey", "o_orderstatus"
    ).collect()
    ks = sorted(r["o_orderkey"] for r in orders if r["o_orderstatus"] == "F")
    n = len(ks)
    sk = sum(ks)
    sr = n * (n - 1) // 2
    skr = sum(k * r for r, k in enumerate(ks))
    skk = sum(k * k for k in ks)
    b = (float(skr) * n - float(sk) * sr) / (float(skk) * n - float(sk) * sk)
    a = float(sr) / n - b * (float(sk) / n)
    errs = [abs(math.floor(a + b * k + 0.5) - r) for r, k in enumerate(ks)]
    assert row["n_keys"] == n
    assert row["max_err"] == max(errs)
    assert row["mean_abs_err_e6"] == (sum(errs) * 10**6 + n // 2) // n
    # the leaf search window is far smaller than binary search over n
    assert row["max_err"] < n // 10


def test_bitmap_containers_match_roaring_rule(spark):
    rows = {
        r["status"]: r
        for r in all_queries()["bitmap_container_stats"].fn(spark, SF_SMALL).collect()
    }
    orders = load_table(spark, SF_SMALL, "orders").select(
        "o_orderkey", "o_orderstatus"
    ).collect()
    chunks = defaultdict(set)
    for r in orders:
        chunks[(r["o_orderstatus"], r["o_orderkey"] // 65536)].add(r["o_orderkey"])
    per_status = defaultdict(list)
    for (s, _), keys in chunks.items():
        per_status[s].append(len(keys))
    for s, sizes in per_status.items():
        r = rows[s]
        assert r["n_chunks"] == len(sizes)
        assert r["n_array"] == sum(1 for x in sizes if x <= 4096)
        assert r["n_bitmap"] == sum(1 for x in sizes if x > 4096)
        assert r["n_keys"] == sum(sizes)
        bts = sum(2 * x if x <= 4096 else 8192 for x in sizes)
        assert r["roaring_bytes"] == bts
        assert r["naive_bytes"] == 8 * sum(sizes)
        assert r["compression_e6"] == (8 * sum(sizes) * 10**6 + bts // 2) // bts


# --------------------------------------------------------------------------
# stream_ewma_user_values / weighted_median_price (pipeline119)
# --------------------------------------------------------------------------


def test_stream_ewma_equals_batch_twin(spark):
    qs = all_queries()
    stream = {
        r["user_id"]: (r["n_events"], r["ewma_e4"])
        for r in qs["stream_ewma_user_values"].fn(spark, SF_SMALL).collect()
    }
    batch = {
        r["user_id"]: (r["n_events"], r["ewma_e4"])
        for r in qs["ewma_user_values"].fn(spark, SF_SMALL).collect()
    }
    # the streaming fold is bit-identical to the batch fold per user
    assert stream == batch


def test_weighted_median_matches_python_replay(spark):
    rows = {
        r["flag"]: (r["total_weight"], r["wmedian_price_cents"])
        for r in all_queries()["weighted_median_price"].fn(spark, SF_SMALL).collect()
    }
    li = load_table(spark, SF_SMALL, "lineitem").select(
        "l_returnflag", "l_extendedprice", "l_quantity"
    ).collect()
    agg = defaultdict(lambda: defaultdict(int))
    for r in li:
        agg[r["l_returnflag"]][math.floor(r["l_extendedprice"] * 100.0 + 0.5)] += int(
            r["l_quantity"]
        )
    for flag, prices in agg.items():
        wt = sum(prices.values())
        half = (wt + 1) // 2
        cum = 0
        for p in sorted(prices):
            cum += prices[p]
            if cum >= half:
                med = p
                break
        assert rows[flag] == (wt, med)
    # the weighted median is attained at an observed price
    for flag, (_, med) in rows.items():
        assert med in agg[flag]


# --------------------------------------------------------------------------
# graph_resilience_topk_removal / degree_assortativity (pipeline120)
# --------------------------------------------------------------------------


def _copurchase_adj(spark):
    ev = load_table(spark, SF_SMALL, "events").select(
        "user_id", "ts", "event_type"
    ).collect()
    by_slot = defaultdict(set)
    for r in ev:
        if r["event_type"] == "purchase":
            by_slot[(r["ts"].date(), r["ts"].hour)].add(r["user_id"])
    pc = defaultdict(int)
    for us in by_slot.values():
        us = sorted(us)
        for i in range(len(us)):
            for j in range(i + 1, len(us)):
                pc[(us[i], us[j])] += 1
    adj = defaultdict(set)
    for (a, b), c in pc.items():
        if c >= 2:
            adj[a].add(b)
            adj[b].add(a)
    return adj


def _components(adj):
    seen, comps = set(), []
    for n in adj:
        if n in seen:
            continue
        stack, comp = [n], set()
        while stack:
            u = stack.pop()
            if u in comp:
                continue
            comp.add(u)
            stack.extend(adj[u] - comp)
        seen |= comp
        comps.append(comp)
    return comps


def test_resilience_matches_python_replay(spark):
    row = all_queries()["graph_resilience_topk_removal"].fn(spark, SF_SMALL).collect()[0]
    adj = _copurchase_adj(spark)
    deg = {n: len(adj[n]) for n in adj}
    comps = _components(adj)
    assert row["n_nodes"] == len(adj)
    assert row["n_components_before"] == len(comps)
    assert row["largest_before"] == max(len(c) for c in comps)
    removed = set(
        sorted(deg, key=lambda n: (-deg[n], n))[:5]
    )
    adj2 = defaultdict(set)
    survivors = set(adj) - removed
    for u in survivors:
        for v in adj[u]:
            if v in survivors:
                adj2[u].add(v)
    edge_nodes = {u for u in adj2 if adj2[u]}
    comps2 = _components({u: adj2[u] for u in edge_nodes})
    iso = len(survivors - edge_nodes)
    assert row["n_components_after"] == len(comps2) + iso
    expect_largest = max([len(c) for c in comps2] + ([1] if iso else [0]))
    assert row["largest_after"] == expect_largest


def test_assortativity_matches_python_replay(spark):
    row = all_queries()["degree_assortativity"].fn(spark, SF_SMALL).collect()[0]
    adj = _copurchase_adj(spark)
    deg = {n: len(adj[n]) for n in adj}
    pairs = [(deg[u], deg[v]) for u in adj for v in adj[u]]
    m = len(pairs)
    sa = sum(a for a, _ in pairs)
    sb = sum(b for _, b in pairs)
    saa = sum(a * a for a, _ in pairs)
    sbb = sum(b * b for _, b in pairs)
    sab = sum(a * b for a, b in pairs)
    r = (float(sab) * m - float(sa) * sb) / math.sqrt(
        (float(saa) * m - float(sa) * sa) * (float(sbb) * m - float(sb) * sb)
    )
    assert row["n_directed_edges"] == m
    assert row["assortativity_e6"] == math.floor(r * 1e6 + 0.5)
    assert -(10**6) <= row["assortativity_e6"] <= 10**6


# --------------------------------------------------------------------------
# littles_law_audit / negbin_moment_fit (pipeline121)
# --------------------------------------------------------------------------


def test_littles_law_conservation_and_replay(spark):
    row = all_queries()["littles_law_audit"].fn(spark, SF_SMALL).collect()[0]
    assert row["conserved"] is True
    assert row["total_occupied_s"] == row["sweep_occupied_s"]
    ev = load_table(spark, SF_SMALL, "events").select("user_id", "ts").collect()
    by_user = defaultdict(list)
    for r in ev:
        by_user[r["user_id"]].append(int(r["ts"].timestamp()))
    spans = []
    for times in by_user.values():
        times.sort()
        s = e = times[0]
        for t in times[1:]:
            if t - e > 1800:
                spans.append((s, e))
                s = t
            e = t
        spans.append((s, e))
    total = sum(e - s for s, e in spans)
    t0 = min(s for s, _ in spans)
    t1 = max(e for _, e in spans)
    assert row["n_sessions"] == len(spans)
    assert row["total_occupied_s"] == total
    def _ir(num, den):
        return (num * 10**6 + den // 2) // den
    assert row["avg_concurrency_e6"] == _ir(total, t1 - t0)
    assert row["sessions_per_hour_e6"] == _ir(len(spans) * 3600, t1 - t0)
    assert row["mean_session_s_e6"] == _ir(total, len(spans))
    # Little's law L = lambda * W (up to e6 quantization of each factor)
    lam_w = row["sessions_per_hour_e6"] * row["mean_session_s_e6"] / (3600 * 10**6)
    assert abs(row["avg_concurrency_e6"] - lam_w) <= 2


def test_negbin_fit_matches_python_moments(spark):
    row = all_queries()["negbin_moment_fit"].fn(spark, SF_SMALL).collect()[0]
    ev = load_table(spark, SF_SMALL, "events").select("user_id").collect()
    cnt = defaultdict(int)
    for r in ev:
        cnt[r["user_id"]] += 1
    cs = list(cnt.values())
    n = len(cs)
    m = sum(cs) / n
    v = sum(c * c for c in cs) / n - m * m
    assert row["n_users"] == n
    assert row["mean_e6"] == math.floor(m * 1e6 + 0.5)
    assert row["var_e6"] == math.floor(v * 1e6 + 0.5)
    assert row["overdispersion_e6"] == math.floor(v / m * 1e6 + 0.5)
    assert row["p_hat_e6"] == math.floor(m / v * 1e6 + 0.5)
    assert row["r_hat_e6"] == math.floor(m * m / (v - m) * 1e6 + 0.5)
    # NB is only the right model when overdispersed
    assert row["overdispersion_e6"] > 10**6


# --------------------------------------------------------------------------
# fk_integrity_audit / pinball_loss_seasonal_naive (pipeline122)
# --------------------------------------------------------------------------


def test_fk_integrity_all_edges_clean(spark):
    rows = all_queries()["fk_integrity_audit"].fn(spark, SF_SMALL).collect()
    assert len(rows) == 5
    assert {r["fk_edge"] for r in rows} == {
        "lineitem->orders", "orders->customer", "customer->nation",
        "supplier->nation", "nation->region",
    }
    for r in rows:
        assert r["integrity_ok"] is True and r["n_orphans"] == 0
        assert r["n_child_rows"] > 0
    # spot-replay one edge in Python
    orders = load_table(spark, SF_SMALL, "orders").select("o_custkey").collect()
    custs = {
        r["c_custkey"]
        for r in load_table(spark, SF_SMALL, "customer").select("c_custkey").collect()
    }
    orphans = sum(1 for r in orders if r["o_custkey"] not in custs)
    by_edge = {r["fk_edge"]: r for r in rows}
    assert by_edge["orders->customer"]["n_child_rows"] == len(orders)
    assert by_edge["orders->customer"]["n_orphans"] == orphans


def test_pinball_loss_matches_python_replay(spark):
    rows = {
        r["q"]: r
        for r in all_queries()["pinball_loss_seasonal_naive"].fn(spark, SF_SMALL).collect()
    }
    ev = load_table(spark, SF_SMALL, "events").select(
        "ts", "event_type", "value"
    ).collect()
    daily = defaultdict(int)
    for r in ev:
        if r["event_type"] == "purchase":
            daily[r["ts"].date()] += math.floor(r["value"] * 100.0 + 0.5)
    days = sorted(daily)
    for q in (10, 50, 90):
        losses = []
        for i in range(7, len(days)):
            y, yhat = daily[days[i]], daily[days[i - 7]]
            if y >= yhat:
                losses.append((q * (y - yhat) * 100 + 50) // 100)
            else:
                losses.append(((100 - q) * (yhat - y) * 100 + 50) // 100)
        r = rows[q]
        assert r["n_days_scored"] == len(losses)
        assert r["total_pinball_e2"] == sum(losses)
        assert r["mean_pinball_e2"] == (sum(losses) + len(losses) // 2) // len(losses)
    # q=50 pinball is half the L1: symmetric in over/under forecast
    assert rows[50]["total_pinball_e2"] <= rows[10]["total_pinball_e2"] + rows[90]["total_pinball_e2"]


# --------------------------------------------------------------------------
# incremental_join_delta_algebra (pipeline123)
# --------------------------------------------------------------------------


def test_ivm_delta_algebra_replay(spark):
    row = all_queries()["incremental_join_delta_algebra"].fn(spark, SF_SMALL).collect()[0]
    assert row["conserved"] is True
    ev = load_table(spark, SF_SMALL, "events").select(
        "user_id", "ts", "event_type"
    ).collect()
    cut = datetime.date(2024, 1, 21)
    cb, cd, pb, pd = (defaultdict(int) for _ in range(4))
    for r in ev:
        base = r["ts"].date() < cut
        if r["event_type"] == "click":
            (cb if base else cd)[r["user_id"]] += 1
        elif r["event_type"] == "purchase":
            (pb if base else pd)[r["user_id"]] += 1
    users = (set(cb) | set(cd)) & (set(pb) | set(pd))
    j = lambda x, y: sum(x[u] * y[u] for u in users)  # noqa: E731
    assert row["n_matched_users"] == len(users)
    assert (row["j_bb"], row["j_bd"], row["j_db"], row["j_dd"]) == (
        j(cb, pb), j(cb, pd), j(cd, pb), j(cd, pd),
    )
    assert row["j_full"] == sum(
        (cb[u] + cd[u]) * (pb[u] + pd[u]) for u in users
    )
    assert row["j_bb"] + row["j_bd"] + row["j_db"] + row["j_dd"] == row["j_full"]


# --------------------------------------------------------------------------
# prefix_completion_counts / bh_fdr_weekday_effect (pipeline124)
# --------------------------------------------------------------------------


def test_prefix_completions_match_python_replay(spark):
    rows = [
        (r["prefix"], r["n_occurrences"], r["top_completion"], r["top_count"])
        for r in all_queries()["prefix_completion_counts"].fn(spark, SF_SMALL).collect()
    ]
    docs = load_table(spark, SF_SMALL, "documents").select("text").collect()
    per_tok = defaultdict(int)
    for r in docs:
        for t in __import__("re").split(r"[ \t\r\n]", r["text"]):
            t = t.lower()
            if len(t) >= 3:
                per_tok[t] += 1
    by_pfx = defaultdict(lambda: [0, None, 0])  # total, top tok, top count
    for t, c in per_tok.items():
        e = by_pfx[t[:3]]
        e[0] += c
        if c > e[2] or (c == e[2] and (e[1] is None or t < e[1])):
            e[1], e[2] = t, c
    expect = sorted(
        ((p, tot, tok, c) for p, (tot, tok, c) in by_pfx.items()),
        key=lambda x: (-x[1], x[0]),
    )[:10]
    assert rows == expect


def test_bh_fdr_step_up_consistency(spark):
    rows = sorted(
        all_queries()["bh_fdr_weekday_effect"].fn(spark, SF_SMALL).collect(),
        key=lambda r: r["bh_rank"],
    )
    assert [r["bh_rank"] for r in rows] == [1, 2, 3, 4, 5]
    # |z| is nonincreasing in rank; criticals strictly decreasing
    zs = [r["abs_z_e6"] for r in rows]
    assert zs == sorted(zs, reverse=True)
    crits = [r["z_crit_e6"] for r in rows]
    assert crits == sorted(crits, reverse=True)
    # step-up property: rejected set is a prefix of the ranking, and a
    # test is rejected iff some rank >= its own passes its critical
    kmax = 0
    for r in rows:
        if r["abs_z_e6"] >= r["z_crit_e6"]:
            kmax = r["bh_rank"]
    for r in rows:
        assert r["rejected"] == (r["bh_rank"] <= kmax)


# --------------------------------------------------------------------------
# agm_bound_triangle_audit / business_days_shipping (pipeline125)
# --------------------------------------------------------------------------


def test_agm_bound_replay_and_validity(spark):
    row = all_queries()["agm_bound_triangle_audit"].fn(spark, SF_SMALL).collect()[0]
    adj = _copurchase_adj(spark)
    edges = {(a, b) for a in adj for b in adj[a] if a < b}
    tris = 0
    for (x, y) in edges:
        for z in adj[y]:
            if y < z and (x, z) in edges:
                tris += 1
    assert row["m_edges"] == len(edges)
    assert row["n_triangles"] == tris
    m = len(edges)
    assert row["agm_bound"] == math.floor(m * math.sqrt(m) + 0.5)
    # the AGM bound is a genuine upper bound
    assert row["n_triangles"] <= row["agm_bound"]


def test_business_days_formula(spark):
    rows = {
        r["priority"]: r
        for r in all_queries()["business_days_shipping"].fn(spark, SF_SMALL).collect()
    }
    li = load_table(spark, SF_SMALL, "lineitem").select(
        "l_orderkey", "l_shipdate"
    ).collect()
    orders = {
        r["o_orderkey"]: (r["o_orderpriority"], r["o_orderdate"].date())
        for r in load_table(spark, SF_SMALL, "orders").select(
            "o_orderkey", "o_orderpriority", "o_orderdate"
        ).collect()
    }
    epoch = datetime.date(1970, 1, 1)

    def g(x):
        y = x + 3
        return 5 * (y // 7) + min(y % 7, 5)

    per = defaultdict(list)
    for r in li:
        pr, od = orders[r["l_orderkey"]]
        a = (od - epoch).days
        b = (r["l_shipdate"].date() - epoch).days
        if b >= a:
            per[pr].append(g(b) - g(a))
        # python-side truth check: weekday count by brute force on a sample
    # brute-force check the formula itself on a spread of date pairs
    for a in range(7305, 7340):
        for b in range(a, a + 20):
            brute = sum(
                1 for d in range(a, b) if (epoch + datetime.timedelta(days=d)).weekday() < 5
            )
            assert g(b) - g(a) == brute
    for pr, vals in per.items():
        r = rows[pr]
        assert r["n_lineitems"] == len(vals)
        assert r["mean_busdays_e6"] == (sum(vals) * 10**6 + len(vals) // 2) // len(vals)
        assert (r["min_busdays"], r["max_busdays"]) == (min(vals), max(vals))


# --------------------------------------------------------------------------
# apriori_brand_triples / front_coding_vocab_audit (pipeline126)
# --------------------------------------------------------------------------


def test_apriori_triples_match_bruteforce(spark):
    rows = [
        (r["x"], r["y"], r["z"], r["support"])
        for r in all_queries()["apriori_brand_triples"].fn(spark, SF_SMALL).collect()
    ]
    li = load_table(spark, SF_SMALL, "lineitem").select("l_orderkey", "l_partkey").collect()
    brands = {
        r["p_partkey"]: r["p_brand"]
        for r in load_table(spark, SF_SMALL, "part").select("p_partkey", "p_brand").collect()
    }
    baskets = defaultdict(set)
    for r in li:
        baskets[r["l_orderkey"]].add(brands[r["l_partkey"]])
    # brute-force all triples (no pruning) — a-priori must agree
    sup = defaultdict(int)
    for bs in baskets.values():
        bs = sorted(bs)
        for i in range(len(bs)):
            for j in range(i + 1, len(bs)):
                for k in range(j + 1, len(bs)):
                    sup[(bs[i], bs[j], bs[k])] += 1
    expect = sorted(
        ((x, y, z, s) for (x, y, z), s in sup.items() if s >= 40),
        key=lambda t: (-t[3], t[0], t[1], t[2]),
    )[:15]
    assert rows == expect


def test_front_coding_matches_python_replay(spark):
    row = all_queries()["front_coding_vocab_audit"].fn(spark, SF_SMALL).collect()[0]
    orders = load_table(spark, SF_SMALL, "orders").select("o_orderkey").collect()
    toks = sorted({f"order#{r['o_orderkey']:012d}" for r in orders})
    raw = sum(len(t) + 1 for t in toks)
    fc, lcps = 0, []
    prev = None
    for t in toks:
        lcp = 0
        if prev is not None:
            while lcp < min(len(t), len(prev), 24) and t[lcp] == prev[lcp]:
                lcp += 1
        lcps.append(lcp)
        fc += 2 + len(t) - lcp
        prev = t
    assert row["n_terms"] == len(toks)
    assert (row["raw_bytes"], row["front_coded_bytes"]) == (raw, fc)
    assert row["compression_e6"] == (raw * 10**6 + fc // 2) // fc
    assert row["mean_lcp_e6"] == (sum(lcps) * 10**6 + len(toks) // 2) // len(toks)
    # id-shaped sorted keys compress hard
    assert row["compression_e6"] > 3 * 10**6
