#!/usr/bin/env python3
"""Independent recomputation witness for the time-series queries —
third companion to recompute_stats.py / recompute_graph.py, covering
the bench board's most expensive query (q_matrix_profile, a STAMP-style
discord search) plus lag-regression, trend, and cross-correlation.

Everything is recomputed from the raw orders parquet with plain python
ints (exact) and numpy — no SQL, no Spark, no shared algebra.

Usage: python3 tools/recompute_timeseries.py <sfDir> <verifyOutDir>
"""
import sys, glob, os
import numpy as np
import pyarrow.parquet as pq


def engine_rows(out_dir, q):
    f = glob.glob(os.path.join(out_dir, q, "*.parquet"))
    assert f, f"no engine output for {q}"
    return pq.read_table(f[0]).to_pylist()


def check(name, cond, detail=""):
    print(f"  {'OK ' if cond else 'MISMATCH'} {name}{' ' + detail if detail else ''}")
    return bool(cond)


def pearson_from_pairs(xs, ys):
    n = len(xs)
    sx, sy = sum(xs), sum(ys)
    sxx = sum(x * x for x in xs)
    syy = sum(y * y for y in ys)
    sxy = sum(x * y for x, y in zip(xs, ys))
    num = n * sxy - sx * sy
    den_x = n * sxx - sx * sx
    den_y = n * syy - sy * sy
    return n, num, den_x, den_y, sx, sy


def main(sf_dir, out_dir):
    o = pq.read_table(os.path.join(sf_dir, "orders.parquet"),
                      columns=["o_orderdate", "o_totalprice",
                               "o_orderpriority"])
    days = [int(d.toordinal()) - 719163 for d in o.column("o_orderdate").to_pylist()]
    cents = [int(round(float(v) * 100)) for v in o.column("o_totalprice").to_pylist()]
    prio = o.column("o_orderpriority").to_pylist()
    ok = True

    daily = {}
    daily_n = {}
    for d_, v_ in zip(days, cents):
        daily[d_] = daily.get(d_, 0) + v_
        daily_n[d_] = daily_n.get(d_, 0) + 1

    # --- q_matrix_profile: m=7 index-adjacent windows over the daily
    # series, exact integer squared distance, exclusion zone |i-j| >= 3,
    # nearest neighbor tie-broken by j, top-10 discords by (d2 DESC, day)
    print("q_matrix_profile")
    ds = sorted(daily)
    v = [daily[d_] for d_ in ds]
    W = np.array([[v[i + k] for k in range(7)] for i in range(len(v) - 6)],
                 dtype=np.float64)
    Wi = [[v[i + k] for k in range(7)] for i in range(len(v) - 6)]
    nw = len(Wi)
    best = []
    for i in range(nw):
        bd, bj = None, None
        for j in range(nw):
            if abs(i - j) < 3:
                continue
            d2 = sum((a - b) * (a - b) for a, b in zip(Wi[i], Wi[j]))
            if bd is None or d2 < bd or (d2 == bd and j < bj):
                bd, bj = d2, j
        best.append((ds[i], bd, bj + 1))  # tj is 1-based row_number
    top = sorted(best, key=lambda t: (-t[1], t[0]))[:10]
    # mp_d2 is a DOUBLE in the output schema: past 2^53 (reached at
    # sf0.01) the exact integer d2 is not representable, so compare the
    # correctly-rounded double of the exact value, not the int
    got = [(r["day"], r["mp_d2"], r["nn_rank"])
           for r in engine_rows(out_dir, "q_matrix_profile")]
    want = [(d_, float(b_), j_) for d_, b_, j_ in top]
    ok &= check("top-10 discords (day, d2, nn)", got == want,
                f"engine[0]={got[0]} independent[0]={want[0]}")

    # --- q_autocorr: per-priority lag-1 regression of daily revenue
    print("q_autocorr")
    pd_ = {}
    for d_, v_, p_ in zip(days, cents, prio):
        pd_.setdefault(p_, {})
        pd_[p_][d_] = pd_[p_].get(d_, 0) + v_
    e = {r["prio"]: r for r in engine_rows(out_dir, "q_autocorr")}
    for p_ in sorted(pd_):
        series = pd_[p_]
        xs, ys = [], []
        for d_ in sorted(series):
            if d_ + 1 in series:
                xs.append(series[d_]); ys.append(series[d_ + 1])
        n, num, den_x, den_y, sx, sy = pearson_from_pairs(xs, ys)
        slope = num / den_x
        intercept = (sy - slope * sx) / n
        corr = num / np.sqrt(float(den_x) * float(den_y))
        r = e[p_]
        ok &= check(f"{p_} n", r["n"] == n, f"engine={r['n']} ind={n}")
        ok &= check(f"{p_} slope", abs(r["slope"] - slope) <= 1e-9 * max(abs(slope), 1e-12))
        ok &= check(f"{p_} intercept", abs(r["intercept"] - intercept) <= 1e-6)
        ok &= check(f"{p_} corr", abs(r["corr"] - corr) <= 1e-9)

    # --- q_mann_kendall: weekly revenue trend, S statistic, tie-corrected
    # 18*variance, continuity-corrected z
    print("q_mann_kendall")
    weekly = {}
    for d_, v_ in zip(days, cents):
        w_ = (d_ * 86400000) // 604800000
        weekly[w_] = weekly.get(w_, 0) + v_
    ws = sorted(weekly)
    vals = [weekly[w_] for w_ in ws]
    S = sum((0 if vals[j] == vals[i] else (1 if vals[j] > vals[i] else -1))
            for i in range(len(vals)) for j in range(i + 1, len(vals)))
    from collections import Counter
    tie_term = sum(t * (t - 1) * (2 * t + 5) for t in Counter(vals).values())
    nwk = len(vals)
    var18 = nwk * (nwk - 1) * (2 * nwk + 5) - tie_term
    if var18 == 0: z = 0.0
    elif S > 0: z = (S - 1) / np.sqrt(var18 / 18.0)
    elif S < 0: z = (S + 1) / np.sqrt(var18 / 18.0)
    else: z = 0.0
    r = engine_rows(out_dir, "q_mann_kendall")[0]
    ok &= check("n_weeks", r["n_weeks"] == nwk, f"engine={r['n_weeks']} ind={nwk}")
    ok &= check("s", r["s"] == S, f"engine={r['s']} ind={S}")
    ok &= check("var18", r["var18"] == var18)
    ok &= check("z", abs(r["z"] - z) <= 1e-9 * max(abs(z), 1e-12))

    # --- q_xcorr: Pearson r of (day count, day+lag revenue) for lags -3..3
    print("q_xcorr")
    e = {r["lag"]: r for r in engine_rows(out_dir, "q_xcorr")}
    for lag in range(-3, 4):
        xs, ys = [], []
        for d_ in sorted(daily):
            if d_ + lag in daily:
                xs.append(daily_n[d_]); ys.append(daily[d_ + lag])
        n, num, den_x, den_y, _, _ = pearson_from_pairs(xs, ys)
        rr = num / np.sqrt(float(den_x) * float(den_y))
        ok &= check(f"lag {lag}", e[lag]["n"] == n and
                    abs(e[lag]["r"] - rr) <= 1e-9,
                    f"engine=({e[lag]['n']},{e[lag]['r']:.9f}) ind=({n},{rr:.9f})")

    print("\nALL MATCH" if ok else "\nMISMATCHES FOUND")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
