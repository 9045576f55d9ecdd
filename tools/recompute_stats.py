#!/usr/bin/env python3
"""Independent recomputation witness for the statistical queries.

The DuckDB oracle proves engine == oracle, but both sides were authored
together — a shared misunderstanding of a statistic's DEFINITION passes
the hash compare on both sides (the class ThirdSourceSpec closes for
pinned constants and formula helpers). This tool closes it for six
end-to-end statistical queries: each is recomputed from the RAW corpus
parquet with numpy/pandas textbook implementations (average-rank
Mann-Whitney U a la scipy, outer-product Kendall tau-b, direct
group-mean ANOVA, ddof=1 Welch, sorted-index Gini, rank-difference
Spearman) — none of which share code, literals, or algebra with the
engine's sufficient-statistics formulations — and compared to the
engine's Verify output for the same corpus.

Usage: python3 tools/recompute_stats.py <sfDir> <verifyOutDir>
Exit 0 iff every statistic matches (exact for integers, 1e-9 relative
for doubles).
"""
import sys, glob, os
import numpy as np
import pyarrow.parquet as pq


def load(sf_dir, table, cols):
    return pq.read_table(os.path.join(sf_dir, f"{table}.parquet"),
                         columns=cols)


def engine_row(out_dir, q):
    f = glob.glob(os.path.join(out_dir, q, "*.parquet"))
    assert f, f"no engine output for {q}"
    return pq.read_table(f[0]).to_pylist()[0]


def cents(decimal_col):
    # exact: DECIMAL(18,2) * 100 as integer cents
    return np.array([int(round(float(v) * 100)) for v in decimal_col],
                    dtype=np.int64)


def orders_customer(sf_dir):
    o = load(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_totalprice",
                                "o_orderdate", "o_orderpriority"])
    c = load(sf_dir, "customer", ["c_custkey", "c_nationkey",
                                  "c_mktsegment", "c_acctbal"])
    return o, c


def check(name, got, want, exact=False, tol=1e-9):
    if exact:
        ok = int(got) == int(want)
    else:
        denom = max(abs(float(want)), 1e-300)
        ok = abs(float(got) - float(want)) / denom <= tol
    print(f"  {'OK ' if ok else 'MISMATCH'} {name}: engine={got} independent={want}")
    return ok


def main(sf_dir, out_dir):
    o, c = orders_customer(sf_dir)
    ok = True

    cust_nat = dict(zip(c.column("c_custkey").to_pylist(),
                        c.column("c_nationkey").to_pylist()))
    cust_seg = dict(zip(c.column("c_custkey").to_pylist(),
                        c.column("c_mktsegment").to_pylist()))
    o_cust = np.array(o.column("o_custkey").to_pylist())
    o_cents = cents(o.column("o_totalprice").to_pylist())

    # --- q_kendall: per-nation (total spend cents, distinct customers),
    # tau-b via sign outer products over all nation pairs
    print("q_kendall")
    nk = np.array([cust_nat[k] for k in o_cust])
    nations = np.unique(nk)
    x = np.array([o_cents[nk == n].sum() for n in nations], dtype=object)
    y = np.array([len(set(o_cust[nk == n])) for n in nations])
    C = D = TX = TY = 0
    for i in range(len(nations)):
        for j in range(i + 1, len(nations)):
            dx, dy = x[i] - x[j], y[i] - y[j]
            if dx == 0: TX += 1
            if dy == 0: TY += 1
            if dx != 0 and dy != 0:
                if (dx > 0) == (dy > 0): C += 1
                else: D += 1
    npairs = len(nations) * (len(nations) - 1) // 2
    tau = (C - D) / np.sqrt(float(npairs - TX) * float(npairs - TY))
    e = engine_row(out_dir, "q_kendall")
    ok &= check("n_pairs", e["n_pairs"], npairs, exact=True)
    ok &= check("concordant", e["concordant"], C, exact=True)
    ok &= check("discordant", e["discordant"], D, exact=True)
    ok &= check("tied_x", e["tied_x"], TX, exact=True)
    ok &= check("tied_y", e["tied_y"], TY, exact=True)
    ok &= check("tau_b", e["tau_b"], tau)

    # --- q_mannwhitney: BUILDING vs MACHINERY order totals; scipy-style
    # average ranks, U_a = R_a - n_a(n_a+1)/2, z with tie correction
    print("q_mannwhitney")
    seg = np.array([cust_seg[k] for k in o_cust])
    va = np.sort(o_cents[seg == "BUILDING"])
    vb = np.sort(o_cents[seg == "MACHINERY"])
    pooled = np.concatenate([va, vb])
    grp = np.concatenate([np.zeros(len(va)), np.ones(len(vb))])
    order = np.argsort(pooled, kind="mergesort")
    sortedv = pooled[order]
    ranks = np.empty(len(pooled))
    i = 0
    tie_sum = 0
    while i < len(sortedv):
        j = i
        while j < len(sortedv) and sortedv[j] == sortedv[i]:
            j += 1
        t = j - i
        ranks[order[i:j]] = (i + 1 + j) / 2.0  # average of ranks i+1..j
        tie_sum += t * t * t - t
        i = j
    n_a, n_b = len(va), len(vb)
    r_a = ranks[grp == 0].sum()
    u_a = r_a - n_a * (n_a + 1) / 2.0
    n = n_a + n_b
    mu = n_a * n_b / 2.0
    sigma = np.sqrt(n_a * n_b / 12.0 * ((n + 1) - tie_sum / (n * (n - 1.0))))
    z = (u_a - mu) / sigma
    cliffs = 2.0 * u_a / (n_a * n_b) - 1.0
    e = engine_row(out_dir, "q_mannwhitney")
    ok &= check("n_a", e["n_a"], n_a, exact=True)
    ok &= check("n_b", e["n_b"], n_b, exact=True)
    ok &= check("u (2u==u2)", e["u2"], int(round(2 * u_a)), exact=True)
    ok &= check("u", e["u"], u_a)
    ok &= check("cliffs_delta", e["cliffs_delta"], cliffs)
    ok &= check("z", e["z"], z)

    # --- q_anova: one-way ANOVA of order cents by day-of-week
    print("q_anova")
    days = np.array([int(d.toordinal()) - 719163  # 1970-01-01 ordinal
                     for d in o.column("o_orderdate").to_pylist()])
    dow = days % 7
    v = o_cents.astype(float)
    groups = [v[dow == d] for d in range(7)]
    grand = v.mean()
    ss_between = sum(len(g) * (g.mean() - grand) ** 2 for g in groups if len(g))
    ss_total = ((v - grand) ** 2).sum()
    ss_within = ss_total - ss_between
    k = sum(1 for g in groups if len(g))
    f_stat = (ss_between / (k - 1)) / (ss_within / (len(v) - k))
    eta = ss_between / ss_total
    e = engine_row(out_dir, "q_anova")
    ok &= check("n", e["n"], len(v), exact=True)
    ok &= check("eta_sq", e["eta_sq"], eta, tol=1e-8)
    ok &= check("f_stat", e["f_stat"], f_stat, tol=1e-8)

    # --- q_spearman: customer acctbal cents vs total spend cents (0 for
    # no orders), row_number ranks tie-broken by custkey, rho from d^2
    print("q_spearman")
    ck = np.array(c.column("c_custkey").to_pylist())
    bal = cents(c.column("c_acctbal").to_pylist())
    spend_by = {}
    for k_, v_ in zip(o_cust, o_cents):
        spend_by[k_] = spend_by.get(k_, 0) + int(v_)
    spend = np.array([spend_by.get(k_, 0) for k_ in ck])
    r_bal = np.empty(len(ck), dtype=np.int64)
    r_bal[np.lexsort((ck, bal))] = np.arange(1, len(ck) + 1)
    r_spend = np.empty(len(ck), dtype=np.int64)
    r_spend[np.lexsort((ck, spend))] = np.arange(1, len(ck) + 1)
    d2 = int(((r_bal - r_spend) ** 2).sum())
    nn = len(ck)
    rho = 1.0 - 6.0 * d2 / (nn * (nn * nn - 1.0))
    e = engine_row(out_dir, "q_spearman")
    ok &= check("n", e["n"], nn, exact=True)
    ok &= check("sum_d2", e["sum_d2"], d2, exact=True)
    ok &= check("rho", e["rho"], rho)

    # --- q_welch: BUILDING vs MACHINERY, t / Welch-Satterthwaite df /
    # pooled-sd Cohen's d, all via numpy ddof=1
    print("q_welch")
    fa, fb = va.astype(float), vb.astype(float)
    ma, mb = fa.mean(), fb.mean()
    va_, vb_ = fa.var(ddof=1), fb.var(ddof=1)
    se2 = va_ / n_a + vb_ / n_b
    t = (ma - mb) / np.sqrt(se2)
    df = se2 ** 2 / ((va_ / n_a) ** 2 / (n_a - 1) + (vb_ / n_b) ** 2 / (n_b - 1))
    sp = np.sqrt(((n_a - 1) * va_ + (n_b - 1) * vb_) / (n_a + n_b - 2))
    d = (ma - mb) / sp
    e = engine_row(out_dir, "q_welch")
    # engine reports means in currency units (cents / 100), deliberately:
    # Distribution.scala welch select divides ma/mb by 100.0
    ok &= check("mean_a", e["mean_a"], ma / 100.0, tol=1e-10)
    ok &= check("mean_b", e["mean_b"], mb / 100.0, tol=1e-10)
    ok &= check("t_welch", e["t_welch"], t, tol=1e-8)
    ok &= check("df_welch", e["df_welch"], df, tol=1e-8)
    ok &= check("cohens_d", e["cohens_d"], d, tol=1e-8)

    # --- q_gini: per-customer spend, index formula over (v, custkey) sort
    print("q_gini")
    keys = sorted(spend_by)
    vv = np.array([spend_by[k_] for k_ in keys], dtype=np.int64)
    kk = np.array(keys)
    idx = np.lexsort((kk, vv))
    sv = vv[idx].astype(object)
    nn = len(sv)
    i1 = np.arange(1, nn + 1, dtype=object)
    gini = float(2 * (i1 * sv).sum() - (nn + 1) * sv.sum()) / float(nn * sv.sum())
    e = engine_row(out_dir, "q_gini")
    ok &= check("n_customers", e["n_customers"], nn, exact=True)
    ok &= check("total_cents", e["total_cents"], int(sv.sum()), exact=True)
    ok &= check("gini", e["gini"], gini)

    # --- q_kruskal: Kruskal-Wallis H over the 5 order priorities,
    # average ranks, tie correction C = 1 - sum(t^3-t)/(N^3-N)
    print("q_kruskal")
    pri = np.array([int(p[0]) for p in o.column("o_orderpriority").to_pylist()])
    vv = o_cents
    order = np.argsort(vv, kind="mergesort")
    sortedv = vv[order]
    ranks = np.empty(len(vv))
    i = 0
    tie_sum = 0
    while i < len(sortedv):
        j = i
        while j < len(sortedv) and sortedv[j] == sortedv[i]:
            j += 1
        t = j - i
        ranks[order[i:j]] = (i + 1 + j) / 2.0
        tie_sum += t * t * t - t
        i = j
    N = len(vv)
    h = 12.0 / (N * (N + 1.0)) * sum(
        ranks[pri == g].sum() ** 2 / (pri == g).sum()
        for g in range(1, 6)) - 3.0 * (N + 1.0)
    c_t = 1.0 - tie_sum / (N ** 3 - N)
    e = engine_row(out_dir, "q_kruskal")
    ok &= check("n", e["n"], N, exact=True)
    ok &= check("tie_term", e["tie_term"], tie_sum, tol=1e-12)
    ok &= check("h", e["h"], h, tol=1e-8)
    ok &= check("c_ties", e["c_ties"], c_t, tol=1e-12)
    ok &= check("h_adj", e["h_adj"], h / c_t, tol=1e-8)

    # --- q_levene: Brown-Forsythe W (median-centered), lower median per
    # group (the engine/oracle pick rank floor((n+1)/2) on integer cents)
    print("q_levene")
    groups = [np.sort(vv[pri == g]) for g in range(1, 6)]
    meds = [int(g[(len(g) + 1) // 2 - 1]) for g in groups]
    zs = [np.abs(g.astype(float) - m) for g, m in zip(groups, meds)]
    zbar = [z.mean() for z in zs]
    ns = [len(g) for g in groups]
    zgrand = sum(z.sum() for z in zs) / N
    k = 5
    num = (N - k) * sum(n_ * (m_ - zgrand) ** 2 for n_, m_ in zip(ns, zbar))
    den = (k - 1) * sum(((z - m_) ** 2).sum() for z, m_ in zip(zs, zbar))
    e = engine_row(out_dir, "q_levene")
    ok &= check("n", e["n"], N, exact=True)
    for gi in range(5):
        ok &= check(f"med{gi+1}", e[f"med{gi+1}"], meds[gi], exact=True)
    ok &= check("w", e["w"], num / den, tol=1e-8)

    # --- q_auc: rank AUC of order value predicting "has an R-flag
    # lineitem", average ranks over ties; u2 = 2U
    print("q_auc")
    li = load(sf_dir, "lineitem", ["l_orderkey", "l_returnflag"])
    rkeys = {k_ for k_, f_ in zip(li.column("l_orderkey").to_pylist(),
                                  li.column("l_returnflag").to_pylist())
             if f_ == "R"}
    okeys = o.column("o_orderkey").to_pylist()
    y = np.array([1 if k_ in rkeys else 0 for k_ in okeys])
    r_pos = ranks[y == 1].sum()  # same value column + ranks as kruskal
    n_pos, n_neg = int((y == 1).sum()), int((y == 0).sum())
    u_pos = r_pos - n_pos * (n_pos + 1) / 2.0
    e = engine_row(out_dir, "q_auc")
    ok &= check("n_pos", e["n_pos"], n_pos, exact=True)
    ok &= check("n_neg", e["n_neg"], n_neg, exact=True)
    ok &= check("u2", e["u2"], int(round(2 * u_pos)), exact=True)
    ok &= check("auc", e["auc"], u_pos / (n_pos * n_neg))

    # --- q_atkinson: epsilon=1/2 Atkinson over per-customer spend with
    # the DEFINED sqrt quantization floor(sqrt(y)*1000) (exactness device
    # shared by engine and oracle; the witness follows the definition)
    print("q_atkinson")
    ys = np.array([spend_by[k_] for k_ in sorted(spend_by)], dtype=np.int64)
    sr = sum(int(np.floor(np.sqrt(float(y_)) * 1000.0)) for y_ in ys)
    nn = len(ys)
    mean = ys.sum() / nn
    ede = (sr / (nn * 1000.0)) ** 2
    e = engine_row(out_dir, "q_atkinson")
    ok &= check("n", e["n"], nn, exact=True)
    ok &= check("mean_cents", e["mean_cents"], mean, tol=1e-12)
    ok &= check("ede_cents", e["ede_cents"], ede, tol=1e-12)
    ok &= check("atkinson", e["atkinson"], 1.0 - ede / mean, tol=1e-12)

    # --- q_theil_sen: median pairwise slope of daily revenue (lower
    # median), intercept = lower median of residuals y - slope*day
    print("q_theil_sen")
    days = np.array([int(d.toordinal()) - 719163
                     for d in o.column("o_orderdate").to_pylist()])
    by_day = {}
    for d_, v_ in zip(days, o_cents):
        by_day[int(d_)] = by_day.get(int(d_), 0) + int(v_)
    ds = np.array(sorted(by_day))
    ys_ = np.array([by_day[d_] for d_ in ds], dtype=float)
    ii, jj = np.triu_indices(len(ds), k=1)
    slopes = (ys_[jj] - ys_[ii]) / (ds[jj] - ds[ii])
    slopes.sort()
    np_ = len(slopes)
    med_slope = slopes[(np_ + 1) // 2 - 1]
    resid = np.sort(ys_ - med_slope * ds)
    intercept = resid[(len(resid) + 1) // 2 - 1]
    e = engine_row(out_dir, "q_theil_sen")
    ok &= check("n_days", e["n_days"], len(ds), exact=True)
    ok &= check("n_pairs", e["n_pairs"], np_, exact=True)
    ok &= check("slope_cents_per_day", e["slope_cents_per_day"], med_slope)
    ok &= check("intercept_cents", e["intercept_cents"], intercept)

    print("\nALL MATCH" if ok else "\nMISMATCHES FOUND")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
