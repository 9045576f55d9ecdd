#!/usr/bin/env python3
"""Independent recomputation witness for the experimentation / ranking-
eval queries — seventh companion to recompute_stats.py: md5-arm A/B
lift, CUPED variance reduction, integer-pinned NDCG@10 (discounts
DERIVED here from round(1e16/log2(rank+1)), not copied), and the
Youden-J optimal threshold, all redone from raw parquet.

Usage: python3 tools/recompute_eval.py <sfDir> <verifyOutDir>
"""
import sys, glob, os, math, hashlib
import pyarrow.parquet as pq
import pyarrow.compute as pc


def engine_rows(out_dir, q):
    f = glob.glob(os.path.join(out_dir, q, "*.parquet"))
    assert f, f"no engine output for {q}"
    return pq.read_table(f[0]).to_pylist()


def check(name, cond, detail=""):
    print(f"  {'OK ' if cond else 'MISMATCH'} {name}{' ' + detail if detail else ''}")
    return bool(cond)


def main(sf_dir, out_dir):
    ok = True

    # --- q_ab_lift: md5('ab:'+user) parity arms over purchase events,
    # exact cent sums, relative lift of mean_b vs mean_a
    print("q_ab_lift")
    ev = pq.read_table(os.path.join(sf_dir, "events.parquet"),
                       columns=["user_id", "event_type", "value"])
    n = [0, 0]
    s = [0, 0]
    for u, k, v in zip(ev.column("user_id").to_pylist(),
                       ev.column("event_type").to_pylist(),
                       ev.column("value").to_pylist()):
        if k != "purchase":
            continue
        arm = int(hashlib.md5(f"ab:{u}".encode()).hexdigest()[:15], 16) % 2
        n[arm] += 1
        s[arm] += math.floor(float(v) * 100)
    ma, mb = s[0] / n[0], s[1] / n[1]
    r = engine_rows(out_dir, "q_ab_lift")[0]
    ok &= check("counts+sums", (r["n_a"], r["n_b"], r["sum_a"], r["sum_b"])
                == (n[0], n[1], s[0], s[1]),
                f"engine={r} independent=({n},{s})")
    ok &= check("lift", abs(r["lift"] - (mb - ma) / ma) <= 1e-12)

    # --- per-customer pre/post-1998 spend (shared by cuped and ndcg)
    o = pq.read_table(os.path.join(sf_dir, "orders.parquet"),
                      columns=["o_custkey", "o_orderdate", "o_totalprice"])
    pre, post = {}, {}
    cut = 10227  # 1998-01-01 as epoch day
    for c, d, p in zip(o.column("o_custkey").to_pylist(),
                       o.column("o_orderdate").to_pylist(),
                       o.column("o_totalprice").to_pylist()):
        cents = int(round(float(p) * 100))
        day = d.toordinal() - 719163
        pre.setdefault(c, 0); post.setdefault(c, 0)
        if day < cut:
            pre[c] += cents
        else:
            post[c] += cents

    # --- q_cuped: theta = cov(x,y)/var(x) on exact cleared-denominator
    # numerators; reduction = corr^2
    print("q_cuped")
    ks = sorted(pre)
    nn = len(ks)
    sx = sum(pre[k] for k in ks); sy = sum(post[k] for k in ks)
    sxy = sum(pre[k] * post[k] for k in ks)
    sxx = sum(pre[k] * pre[k] for k in ks)
    syy = sum(post[k] * post[k] for k in ks)
    cov_num = float(nn * sxy - sx * sy)
    varx_num = float(nn * sxx - sx * sx)
    vary_num = float(nn * syy - sy * sy)
    r = engine_rows(out_dir, "q_cuped")[0]
    ok &= check("n", r["n"] == nn)
    ok &= check("theta", abs(r["theta"] - cov_num / varx_num) <= 1e-12)
    ok &= check("reduction",
                abs(r["reduction"] - cov_num * cov_num / (varx_num * vary_num))
                <= 1e-12)

    # --- q_ndcg: pred = pre-98 spend ranks the top-10, rel = post-98
    # spend scores it; discounts DERIVED as round(1e16/log2(rk+1)) and
    # summed exactly as python ints
    print("q_ndcg")
    def disc(rk):
        return round(1e16 / math.log2(rk + 1))
    pt = sorted(ks, key=lambda k: (-pre[k], k))[:10]
    it = sorted(ks, key=lambda k: (-post[k], k))[:10]
    dcg_w = sum(post[k] * disc(rk + 1) for rk, k in enumerate(pt))
    idcg_w = sum(post[k] * disc(rk + 1) for rk, k in enumerate(it))
    hits = len(set(pt) & set(it))
    r = engine_rows(out_dir, "q_ndcg")[0]
    ok &= check("dcg", r["dcg"] == float(dcg_w) / 1e16,
                f"engine={r['dcg']} independent={float(dcg_w)/1e16}")
    ok &= check("idcg", r["idcg"] == float(idcg_w) / 1e16)
    ok &= check("ndcg", abs(r["ndcg"] - float(dcg_w) / float(idcg_w)) <= 1e-15)
    ok &= check("n_hits", r["n_hits"] == hits)

    # --- q_youden: label = order has an R-flag lineitem, score = order
    # cents; maximize tp*n_neg - fp*n_pos over thresholds (descending),
    # ties broken by the higher threshold
    print("q_youden")
    o2 = pq.read_table(os.path.join(sf_dir, "orders.parquet"),
                       columns=["o_orderkey", "o_totalprice"])
    li = pq.read_table(os.path.join(sf_dir, "lineitem.parquet"),
                       columns=["l_orderkey", "l_returnflag"])
    rkeys = {k for k, f_ in zip(li.column("l_orderkey").to_pylist(),
                                li.column("l_returnflag").to_pylist())
             if f_ == "R"}
    per = {}
    for k, p in zip(o2.column("o_orderkey").to_pylist(),
                    o2.column("o_totalprice").to_pylist()):
        v = int(round(float(p) * 100))
        a, b = per.get(v, (0, 0))
        if k in rkeys:
            per[v] = (a + 1, b)
        else:
            per[v] = (a, b + 1)
    n_pos = sum(a for a, _ in per.values())
    n_neg = sum(b for _, b in per.values())
    tp = fp = 0
    best = None  # (objective, v, tp, fp)
    for v in sorted(per, reverse=True):
        a, b = per[v]
        tp += a; fp += b
        obj = tp * n_neg - fp * n_pos
        if best is None or obj > best[0] or (obj == best[0] and v > best[1]):
            best = (obj, v, tp, fp)
    _, thr, btp, bfp = best
    r = engine_rows(out_dir, "q_youden")[0]
    ok &= check("threshold/confusion",
                (r["threshold"], r["tp"], r["fp"], r["fn"], r["tn"]) ==
                (thr, btp, bfp, n_pos - btp, n_neg - bfp),
                f"engine={r} independent=({thr},{btp},{bfp})")
    ok &= check("tpr/fpr/j",
                abs(r["tpr"] - btp / n_pos) <= 1e-15 and
                abs(r["fpr"] - bfp / n_neg) <= 1e-15 and
                abs(r["j"] - (btp / n_pos - bfp / n_neg)) <= 1e-15)

    print("\nALL MATCH" if ok else "\nMISMATCHES FOUND")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
