"""Round-14 statistical keys vs independent brute-force references:
r_kruskal_wallis against the textbook rank-sum H on numpy average
ranks, r_benjamini_hochberg against a direct step-up implementation,
r_bollinger_bands against pandas rolling moments, r_survival_km
against a hand-rolled product-limit estimator. Each reference is
computed from the raw parquet rows independently of the Spark plan."""

from __future__ import annotations

import numpy as np
import pytest

from bristle_spark.catalog import load_table
from bristle_spark.registry import all_specs

MONDAY = np.datetime64("2020-01-06")


def _avg_ranks(v: np.ndarray) -> np.ndarray:
    """Average (midrank) ranks, ties included — numpy only."""
    order = np.argsort(v, kind="stable")
    ranks = np.empty(len(v), dtype=np.float64)
    sv = v[order]
    i = 0
    while i < len(sv):
        j = i
        while j + 1 < len(sv) and sv[j + 1] == sv[i]:
            j += 1
        ranks[order[i : j + 1]] = (i + j) / 2.0 + 1.0
        i = j + 1
    return ranks


def test_kruskal_wallis_matches_textbook_h(spark, sf_dir):
    ev = (
        load_table(spark, sf_dir, "events")
        .selectExpr(
            "event_type",
            "CAST(floor(value * 100 + 0.5) AS BIGINT) AS vc",
            "CAST(ts AS DATE) AS day",
        )
        .collect()
    )
    by_type: dict[str, list] = {}
    for r in ev:
        dow = int((np.datetime64(r["day"]) - MONDAY).astype(int) % 7)
        by_type.setdefault(r["event_type"], []).append((r["vc"], dow))
    got = {
        r["event_type"]: r
        for r in all_specs()["r_kruskal_wallis"].fn(spark, sf_dir).collect()
    }
    assert got
    for et, rows in by_type.items():
        v = np.array([x[0] for x in rows], dtype=np.int64)
        g = np.array([x[1] for x in rows], dtype=np.int64)
        n = len(v)
        ranks = _avg_ranks(v)
        groups = sorted(set(g.tolist()))
        if len(groups) < 2 or n <= len(groups):
            assert et not in got
            continue
        h = 12.0 / (n * (n + 1)) * sum(
            ranks[g == gi].sum() ** 2 / (g == gi).sum() for gi in groups
        ) - 3 * (n + 1)
        _, counts = np.unique(v, return_counts=True)
        tie3 = int((counts**3 - counts).sum())
        h_corr = h / (1 - tie3 / (n**3 - n))
        row = got[et]
        assert row["n"] == n and row["k"] == len(groups)
        assert row["tie3"] == tie3
        # centi quantization of the per-group squares bounds the H
        # error by k quanta / (N(N+1)); 1e-4 is generous at sf0.001
        assert abs(row["h_stat"] - h) < 1e-4, et
        assert abs(row["h_corrected"] - h_corr) < 1e-4, et
        eps = (h_corr - (len(groups) - 1)) / (n - len(groups))
        assert abs(row["epsilon_sq"] - eps) < 1e-4, et


def test_benjamini_hochberg_matches_reference_stepup(spark, sf_dir):
    ev = (
        load_table(spark, sf_dir, "events")
        .selectExpr(
            "event_type",
            "CAST(hour(ts) AS BIGINT) AS hr",
            "CAST(floor(value * 100 + 0.5) AS BIGINT) - 5000 AS d",
        )
        .collect()
    )
    fam: dict[str, list] = {}
    for r in ev:
        fam.setdefault(r["event_type"], []).append((r["hr"], r["d"]))
    out = all_specs()["r_benjamini_hochberg"].fn(spark, sf_dir).collect()
    assert out
    by_key = {(r["event_type"], r["hr"]): r for r in out}
    for et, rows in fam.items():
        d = np.array([x[1] for x in rows], dtype=np.int64)
        hrs = np.array([x[0] for x in rows], dtype=np.int64)
        nn = len(d)
        if nn < 2:
            continue
        s2 = (d.astype(float).var() * nn) / (nn - 1)
        if s2 <= 0:
            continue
        ps = {}
        for h in sorted(set(hrs.tolist())):
            dh = d[hrs == h]
            if len(dh) < 2:
                continue
            diff = dh.mean() - d.mean()
            z2 = diff * diff * len(dh) / s2
            ps[h] = min(1.0, 1.0 / z2) if z2 > 0 else 1.0
        m = len(ps)
        ranked = sorted(ps.items(), key=lambda kv: (kv[1], kv[0]))
        k_max = max(
            (i for i, (_, p) in enumerate(ranked, 1) if p <= i * 0.05 / m),
            default=0,
        )
        for i, (h, p) in enumerate(ranked, 1):
            row = by_key[(et, h)]
            assert row["n_tests"] == m
            assert abs(row["p_cheb"] - p) < 1e-4, (et, h)
            assert row["p_rank"] == i, (et, h)
            assert row["rejected"] == int(i <= k_max), (et, h)


def test_bollinger_matches_pandas_rolling(spark, sf_dir):
    import pandas as pd

    ev = load_table(spark, sf_dir, "events").selectExpr(
        "event_type",
        "CAST(datediff(CAST(ts AS DATE), DATE '2020-01-01') AS BIGINT) AS day_idx",
        "CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents",
    ).toPandas()
    daily = (
        ev.groupby(["event_type", "day_idx"])["cents"].sum().reset_index()
    )
    out = all_specs()["r_bollinger_bands"].fn(spark, sf_dir).toPandas()
    assert len(out)
    for et, g in daily.groupby("event_type"):
        g = g.sort_values("day_idx").reset_index(drop=True)
        mean = g["cents"].rolling(7).mean()
        sd = g["cents"].rolling(7).std(ddof=0)
        sub = out[out.event_type == et].sort_values("day_idx").reset_index(drop=True)
        assert len(sub) == max(0, len(g) - 6)
        got_mid = sub["mid_band"].to_numpy()
        exp_mid = mean.dropna().to_numpy()
        assert np.allclose(got_mid, exp_mid, atol=1e-5)
        assert np.allclose(
            sub["upper_band"].to_numpy(),
            (mean + 2 * sd).dropna().to_numpy(),
            atol=1e-5,
        )
        x = g["cents"].to_numpy()[6:]
        assert (
            sub["breach_up"].to_numpy()
            == (x > (mean + 2 * sd).dropna().to_numpy()).astype(int)
        ).all()


def test_survival_km_matches_product_limit_reference(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders").selectExpr(
        "o_custkey",
        "CAST(o_orderdate AS DATE) AS od",
    ).toPandas()
    c = load_table(spark, sf_dir, "customer").selectExpr(
        "c_custkey", "c_mktsegment"
    ).toPandas()
    import pandas as pd

    o["od"] = pd.to_datetime(o["od"])
    hmax = o["od"].max()
    per = o.groupby("o_custkey")["od"].agg(["min", "max"]).reset_index()
    per = per.merge(c, left_on="o_custkey", right_on="c_custkey")
    per["bucket"] = ((per["max"] - per["min"]).dt.days // 30).astype(int)
    per["ev"] = ((hmax - per["max"]).dt.days > 365).astype(int)

    out = all_specs()["r_survival_km"].fn(spark, sf_dir).collect()
    assert out
    by_key = {(r["c_mktsegment"], r["bucket"]): r for r in out}
    for seg, g in per.groupby("c_mktsegment"):
        steps = (
            g.groupby("bucket")["ev"]
            .agg(d="sum", total="count")
            .sort_index()
        )
        at_risk = int(steps["total"].sum())
        surv = 1.0
        for bucket, row in steps.iterrows():
            d = int(row["d"])
            surv *= (at_risk - d) / at_risk
            got = by_key[(seg, int(bucket))]
            assert got["n_at_risk"] == at_risk, (seg, bucket)
            assert got["d_churned"] == d
            assert got["n_censored"] == int(row["total"]) - d
            assert abs(got["survival"] - surv) < 1e-6, (seg, bucket)
            # KM is monotone non-increasing and the censored never
            # drive it below zero
            assert 0.0 <= got["survival"] <= 1.0
            at_risk -= int(row["total"])


def test_sq8_quantize_matches_numpy_reference(spark, sf_dir):
    emb = (
        load_table(spark, sf_dir, "embeddings")
        .selectExpr("CAST(embedding AS array<double>) AS v")
        .collect()
    )
    X = np.array([r["v"] for r in emb], dtype=np.float64)
    out = {
        r["dim"]: r
        for r in all_specs()["l_sq8_quantize_error"].fn(spark, sf_dir).collect()
    }
    assert len(out) == 64
    for d in range(64):
        x = X[:, d]
        mn, mx = x.min(), x.max()
        scale = (mx - mn) / 255.0
        if mx == mn:
            code = np.zeros_like(x)
            ae = np.zeros_like(x)
        else:
            code = np.clip(np.floor((x - mn) / scale + 0.5), 0, 255)
            ae = np.abs(x - (mn + code * scale))
        pico = np.floor(ae * 1e12 + 0.5).astype(np.int64)
        row = out[d + 1]
        assert abs(row["dim_min"] - mn) < 1e-6
        assert abs(row["dim_max"] - mx) < 1e-6
        assert row["abs_err_pico_sum"] == int(pico.sum()), d
        assert row["abs_err_pico_max"] == int(pico.max()), d
        assert row["n_codes"] == len(np.unique(code)), d
        # SQ8 contract: error never exceeds half a quantization step
        assert ae.max() <= scale / 2 + 1e-12


def test_srm_check_matches_reference_chi2(spark, sf_dir):
    import hashlib

    ev = (
        load_table(spark, sf_dir, "events")
        .selectExpr("event_type", "CAST(user_id AS STRING) AS uid")
        .collect()
    )
    fam: dict[str, list] = {}
    for r in ev:
        h = int(hashlib.md5(r["uid"].encode()).hexdigest()[:15], 16)
        fam.setdefault(r["event_type"], []).append(h % 4)
    out = {
        r["event_type"]: r
        for r in all_specs()["r_srm_check"].fn(spark, sf_dir).collect()
    }
    for et, buckets in fam.items():
        counts = np.bincount(np.array(buckets), minlength=4)
        if (counts == 0).any():
            assert et not in out
            continue
        n = counts.sum()
        exp = n / 4.0
        chi2 = (((counts - exp) ** 2) / exp).sum()
        row = out[et]
        assert row["n"] == n
        assert abs(row["chi2"] - chi2) < 1e-5, et
        assert row["srm_detected"] == int(chi2 > 7.814728)
        assert row["o_min"] == counts.min() and row["o_max"] == counts.max()


def test_peak_detection_matches_reference(spark, sf_dir):
    import pandas as pd

    ev = load_table(spark, sf_dir, "events").selectExpr(
        "event_type",
        "CAST(datediff(CAST(ts AS DATE), DATE '2020-01-01') AS BIGINT) AS day_idx",
        "CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents",
    ).toPandas()
    daily = ev.groupby(["event_type", "day_idx"])["cents"].sum().reset_index()
    out = all_specs()["r_peak_detection"].fn(spark, sf_dir).collect()
    got = {(r["event_type"], r["day_idx"]): r["prominence"] for r in out}
    expected = {}
    for et, g in daily.groupby("event_type"):
        g = g.sort_values("day_idx").reset_index(drop=True)
        x = g["cents"].to_numpy()
        for i in range(3, len(x) - 3):
            flank = max(x[i - 3 : i].max(), x[i + 1 : i + 4].max())
            if x[i] > x[i - 1] and x[i] > x[i + 1] and x[i] - flank >= 2000:
                expected[(et, int(g["day_idx"][i]))] = int(x[i] - flank)
    assert got == expected
    # every reported peak strictly beats both neighbors by construction
    assert all(v >= 2000 for v in got.values())


def test_rolling_corr_matches_pandas_reference(spark, sf_dir):
    import pandas as pd

    ev = load_table(spark, sf_dir, "events").selectExpr(
        "event_type",
        "CAST(datediff(CAST(ts AS DATE), DATE '2020-01-01') AS BIGINT) AS day_idx",
        "CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents",
    ).toPandas()
    ev = ev[ev.event_type.isin(["click", "purchase"])]
    daily = (
        ev.pivot_table(
            index="day_idx", columns="event_type", values="cents",
            aggfunc="sum", fill_value=0,
        )
        .reindex(columns=["click", "purchase"], fill_value=0)
        .reset_index()
    )
    out = {r["day_idx"]: r for r in all_specs()["r_rolling_corr"].fn(spark, sf_dir).collect()}
    assert out
    days = daily["day_idx"].to_numpy()
    for i in range(len(days)):
        d = days[i]
        win = daily[(daily.day_idx >= d - 29) & (daily.day_idx <= d)]
        if len(win) < 30:
            assert d not in out
            continue
        a = win["click"].to_numpy(dtype=float)
        b = win["purchase"].to_numpy(dtype=float)
        if a.var() == 0 or b.var() == 0:
            assert d not in out
            continue
        ref = np.corrcoef(a, b)[0, 1]
        assert abs(out[d]["rolling_corr"] - ref) < 1e-6, d


def test_power_analysis_matches_closed_form(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events").selectExpr(
        "event_type",
        "CAST(floor(value * 100 + 0.5) AS BIGINT) AS vc",
    ).collect()
    fam: dict[str, list] = {}
    for r in ev:
        fam.setdefault(r["event_type"], []).append(r["vc"])
    out = {
        r["event_type"]: r
        for r in all_specs()["r_power_analysis"].fn(spark, sf_dir).collect()
    }
    z = 1.959964 + 0.841621
    for et, vals in fam.items():
        x = np.array(vals, dtype=float)
        n = len(x)
        if n < 2 or x.var(ddof=1) <= 0 or x.mean() <= 0:
            continue
        s2 = x.var(ddof=1)
        mde = z * np.sqrt(4 * s2 / n)
        nreq = int(np.ceil(4 * z * z * s2 / (0.01 * x.mean()) ** 2))
        row = out[et]
        assert row["n"] == n
        assert abs(row["s2_cents"] - s2) < 1e-3 * max(1.0, s2), et
        assert abs(row["mde_cents"] - mde) < 1e-4 * max(1.0, mde), et
        # the centi quantization can move n_required by at most a few
        # counts at the boundary; demand near-equality
        assert abs(row["n_required_1pct"] - nreq) <= 1, et


ALLEN_RELATIONS = {
    "equals", "starts", "started_by", "finishes", "finished_by",
    "meets", "met_by", "precedes", "preceded_by", "during",
    "contains", "overlaps", "overlapped_by",
}


def _allen(a1, a2, b1, b2):
    if a1 == b1 and a2 == b2:
        return "equals"
    if a1 == b1:
        return "starts" if a2 < b2 else "started_by"
    if a2 == b2:
        return "finishes" if a1 > b1 else "finished_by"
    if a2 == b1:
        return "meets"
    if b2 == a1:
        return "met_by"
    if a2 < b1:
        return "precedes"
    if b2 < a1:
        return "preceded_by"
    if a1 > b1 and a2 < b2:
        return "during"
    if a1 < b1 and a2 > b2:
        return "contains"
    if a1 < b1 < a2 < b2:
        return "overlaps"
    return "overlapped_by"


def test_allen_intervals_matches_pairwise_reference(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events").selectExpr(
        "user_id", "event_type", "unix_micros(ts) AS t"
    ).collect()
    iv: dict[tuple, list] = {}
    for r in ev:
        k = (r["user_id"], r["event_type"])
        iv.setdefault(k, [r["t"], r["t"]])
        iv[k][0] = min(iv[k][0], r["t"])
        iv[k][1] = max(iv[k][1], r["t"])
    by_user: dict[int, list] = {}
    for (u, et), (t1, t2) in iv.items():
        if t1 < t2:
            by_user.setdefault(u, []).append((et, t1, t2))
    expected: dict[tuple, int] = {}
    for u, spans in by_user.items():
        for ea, a1, a2 in spans:
            for eb, b1, b2 in spans:
                if ea < eb:
                    rel = _allen(a1, a2, b1, b2)
                    expected[(ea, eb, rel)] = expected.get((ea, eb, rel), 0) + 1
    out = all_specs()["r_allen_intervals"].fn(spark, sf_dir).collect()
    got = {(r["type_a"], r["type_b"], r["relation"]): r["n_pairs"] for r in out}
    assert got == expected
    assert set(r for _, _, r in got) <= ALLEN_RELATIONS
    # exhaustivity: the pairwise total equals sum over relations
    assert sum(got.values()) == sum(expected.values())


def test_temperature_mix_matches_closed_form(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").selectExpr("source").collect()
    from collections import Counter

    counts = Counter(r["source"] for r in docs)
    n_total = sum(counts.values())
    wq = {s: np.floor(np.sqrt(n / n_total) * 1e12 + 0.5) for s, n in counts.items()}
    wsum = sum(wq.values())
    out = {
        r["source"]: r
        for r in all_specs()["l_temperature_mix"].fn(spark, sf_dir).collect()
    }
    assert set(out) == set(counts)
    for s, n in counts.items():
        row = out[s]
        assert row["n_docs"] == n
        assert abs(row["p_natural"] - n / n_total) < 1e-6
        assert abs(row["weight"] - wq[s] / wsum) < 1e-6
        assert abs(row["boost"] - (wq[s] / wsum) / (n / n_total)) < 1e-5
    # temperature 0.5 compresses: every boost ordering is inverse to size
    ordered = sorted(counts, key=counts.get)
    boosts = [out[s]["boost"] for s in ordered]
    assert all(b1 >= b2 - 1e-9 for b1, b2 in zip(boosts, boosts[1:]))
    # weights sum to 1 up to rounding
    assert abs(sum(r["weight"] for r in out.values()) - 1.0) < 1e-4


def test_winsorize_matches_numpy_reference(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events").selectExpr(
        "event_type", "CAST(floor(value * 100 + 0.5) AS BIGINT) AS vc"
    ).collect()
    fam: dict[str, list] = {}
    for r in ev:
        fam.setdefault(r["event_type"], []).append(r["vc"])
    out = {
        r["event_type"]: r
        for r in all_specs()["r_winsorize"].fn(spark, sf_dir).collect()
    }
    for et, vals in fam.items():
        x = np.sort(np.array(vals, dtype=np.int64))
        n = len(x)
        r_lo = -(-50_000 * n // 1_000_000)   # ceil(p*n) in ppm
        r_hi = -(-950_000 * n // 1_000_000)
        lo, hi = int(x[r_lo - 1]), int(x[r_hi - 1])
        clamped = np.clip(x, lo, hi)
        row = out[et]
        assert (row["lo_cents"], row["hi_cents"]) == (lo, hi), et
        assert row["n_clamped_low"] == int((x < lo).sum())
        assert row["n_clamped_high"] == int((x > hi).sum())
        assert abs(row["winsor_mean_cents"] - clamped.mean()) < 1e-4, et
        # winsorized mean is bounded by the clamp interval
        assert lo <= row["winsor_mean_cents"] <= hi


def test_wav_silence_trim_matches_reference(spark, sf_dir):
    import hashlib

    docs = load_table(spark, sf_dir, "documents").selectExpr(
        "doc_id", "text"
    ).collect()
    out = {
        r["doc_id"]: r
        for r in all_specs()["m_wav_silence_trim"].fn(spark, sf_dir).collect()
    }
    assert len(out) == len(docs)
    for r in docs:
        t = r["text"]
        pad = hashlib.md5((t + "pad").encode()).digest()
        lead_pad, trail_pad = 16 + pad[0] % 64, 16 + pad[1] % 64
        pcm = b"".join(
            hashlib.md5((t + str(i)).encode()).digest() for i in range(16)
        )
        sig = np.frombuffer(pcm, dtype="<i2").astype(np.int64)
        v = np.concatenate(
            [np.zeros(lead_pad, np.int64), sig, np.zeros(trail_pad, np.int64)]
        )
        nz = v != 0
        lead = int(nz.argmax()) if nz.any() else len(v)
        trail = int(nz[::-1].argmax()) if nz.any() else 0
        w = v[lead : len(v) - trail]
        row = out[r["doc_id"]]
        assert row["n_total"] == len(v)
        assert (row["lead_zeros"], row["trail_zeros"]) == (lead, trail)
        assert row["n_trimmed"] == len(w)
        assert row["peak_trimmed"] == int(np.abs(w).max())
        rms = np.floor(np.sqrt((w * w).sum() / len(w)) * 1e6 + 0.5) / 1e6
        assert abs(row["rms_trimmed"] - rms) < 1e-9
        # the planted pad is always at least covered by the zero run
        assert lead >= lead_pad and trail >= trail_pad


def test_did_estimator_matches_reference(spark, sf_dir):
    import hashlib

    ev = load_table(spark, sf_dir, "events").selectExpr(
        "event_type",
        "CAST(user_id AS STRING) AS uid",
        "CAST(floor(value * 100 + 0.5) AS BIGINT) - 5000 AS d",
        "CAST(CASE WHEN CAST(ts AS DATE) >= DATE '2024-01-16' THEN 1 ELSE 0 END AS INT) AS post",
    ).collect()
    cells: dict[tuple, list] = {}
    for r in ev:
        treat = int(hashlib.md5(r["uid"].encode()).hexdigest()[:15], 16) % 2
        cells.setdefault((r["event_type"], treat, r["post"]), []).append(r["d"])
    out = {
        r["event_type"]: r
        for r in all_specs()["r_did_estimator"].fn(spark, sf_dir).collect()
    }
    types = {k[0] for k in cells}
    for et in types:
        arr = {}
        ok = True
        for treat in (0, 1):
            for post in (0, 1):
                v = np.array(cells.get((et, treat, post), []), dtype=float)
                if len(v) < 2 or v.var(ddof=1) <= 0:
                    ok = False
                arr[(treat, post)] = v
        if not ok:
            assert et not in out
            continue
        did = (arr[(1, 1)].mean() - arr[(1, 0)].mean()) - (
            arr[(0, 1)].mean() - arr[(0, 0)].mean()
        )
        se = np.sqrt(sum(a.var(ddof=1) / len(a) for a in arr.values()))
        row = out[et]
        assert row["n_t_post"] == len(arr[(1, 1)])
        assert abs(row["did_cents"] - did) < 1e-3, et
        assert abs(row["se_cents"] - se) < 1e-3, et
        assert abs(row["t_stat"] - did / se) < 1e-3, et
        assert row["significant"] == int(abs(did / se) > 1.959964)


def test_did_pretrend_matches_reference_ols(spark, sf_dir):
    import hashlib
    import pandas as pd

    ev = load_table(spark, sf_dir, "events").selectExpr(
        "event_type",
        "CAST(user_id AS STRING) AS uid",
        "CAST(datediff(CAST(ts AS DATE), DATE '2020-01-01') AS BIGINT) AS d",
        "CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents",
        "CAST(CASE WHEN CAST(ts AS DATE) < DATE '2024-01-16' THEN 1 ELSE 0 END AS INT) AS pre",
    ).toPandas()
    ev = ev[ev.pre == 1].copy()
    ev["treat"] = ev["uid"].map(
        lambda u: int(hashlib.md5(u.encode()).hexdigest()[:15], 16) % 2
    )
    daily = (
        ev.groupby(["event_type", "treat", "d"])["cents"].sum().reset_index()
    )
    out = {
        r["event_type"]: r
        for r in all_specs()["r_did_pretrend"].fn(spark, sf_dir).collect()
    }
    for et, g in daily.groupby("event_type"):
        slopes = {}
        ok = True
        for treat in (1, 0):
            a = g[g.treat == treat]
            if len(a) < 2 or a["d"].var() == 0:
                ok = False
                break
            slopes[treat] = np.polyfit(
                a["d"].to_numpy(float), a["cents"].to_numpy(float), 1
            )[0]
        if not ok:
            assert et not in out
            continue
        row = out[et]
        assert abs(row["slope_treat"] - slopes[1]) < 1e-3, et
        assert abs(row["slope_ctrl"] - slopes[0]) < 1e-3, et
        assert abs(row["pretrend_gap"] - (slopes[1] - slopes[0])) < 1e-3, et
