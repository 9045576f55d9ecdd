#!/usr/bin/env python3
"""Independent recomputation witness for the sketch / similarity
queries — sixth companion to recompute_stats.py: brute-force cosine
top-k, KMV distinct-count sketches (single and mergeable union),
simhash near-dup pairs, and winnowing fingerprint pairs, all redone
from raw parquet with hashlib + numpy.

Usage: python3 tools/recompute_sketch.py <sfDir> <verifyOutDir>
"""
import sys, glob, os, hashlib
import numpy as np
import pyarrow.parquet as pq


def engine_rows(out_dir, q):
    f = glob.glob(os.path.join(out_dir, q, "*.parquet"))
    assert f, f"no engine output for {q}"
    return pq.read_table(f[0]).to_pylist()


def check(name, cond, detail=""):
    print(f"  {'OK ' if cond else 'MISMATCH'} {name}{' ' + detail if detail else ''}")
    return bool(cond)


def md5hex(s):
    return hashlib.md5(s.encode()).hexdigest()


def h52(s):
    return int(md5hex(s)[:13], 16) / 4503599627370496.0


def main(sf_dir, out_dir):
    ok = True

    # --- q_knn_cosine: top-10 by cosine to vec 0 (double math, round 6)
    print("q_knn_cosine")
    emb = pq.read_table(os.path.join(sf_dir, "embeddings.parquet"),
                        columns=["vec_id", "label", "embedding"])
    ids = emb.column("vec_id").to_pylist()
    labels = emb.column("label").to_pylist()
    E = np.array(emb.column("embedding").to_pylist(), dtype=np.float64)
    qv = E[ids.index(0)]
    sims = E @ qv / (np.linalg.norm(E, axis=1) * np.linalg.norm(qv))
    scored = [(round(float(s), 6), i, l) for s, i, l in zip(sims, ids, labels)
              if i != 0]
    top = sorted(scored, key=lambda t: (-t[0], t[1]))[:10]
    got = [(r["cos_sim"], r["vec_id"], r["label"])
           for r in engine_rows(out_dir, "q_knn_cosine")]
    ok &= check("top-10 cosine", got == top,
                f"engine[0]={got[0]} independent[0]={top[0]}")

    # --- q_kmv: bottom-64 md5 52-bit uniforms over distinct orderkeys,
    # est = (k-1)/h_k
    print("q_kmv")
    o = pq.read_table(os.path.join(sf_dir, "orders.parquet"),
                      columns=["o_orderkey"])
    keys = sorted(set(o.column("o_orderkey").to_pylist()))
    hs = sorted((h52(str(k)), k) for k in keys)[:64]
    h_k = hs[-1][0]
    est = (len(hs) - 1.0) / h_k
    r = engine_rows(out_dir, "q_kmv")[0]
    ok &= check("k", r["k"] == len(hs))
    ok &= check("h_k", abs(r["h_k"] - h_k) <= 1e-15)
    ok &= check("est", abs(r["est"] - est) <= 1e-9)
    ok &= check("true_distinct", r["true_distinct"] == len(keys))
    ok &= check("rel_err", abs(r["rel_err"] - (est - len(keys)) / len(keys)) <= 1e-12)

    # --- q_kmv_union: mergeable bottom-16 sketches over md5(text)
    # fingerprints of two sources; merged sketch = bottom-16 of the union
    print("q_kmv_union")
    docs = pq.read_table(os.path.join(sf_dir, "documents.parquet"),
                         columns=["doc_id", "text", "source"])
    texts = docs.column("text").to_pylist()
    sources = docs.column("source").to_pylist()
    fps = {"src1": set(), "src2": set()}
    for t, s in zip(texts, sources):
        if s in fps:
            fps[s].add(md5hex(t))
    def sketch(fpset, k=16):
        return sorted((int(fp[:13], 16) / 4503599627370496.0, fp)
                      for fp in fpset)[:k]
    ska, skb = sketch(fps["src1"]), sketch(fps["src2"])
    mrg = sorted(set(ska) | set(skb))[:16]
    est_a = (len(ska) - 1.0) / ska[-1][0]
    est_b = (len(skb) - 1.0) / skb[-1][0]
    est_u = (len(mrg) - 1.0) / mrg[-1][0]
    true_u = len(fps["src1"] | fps["src2"])
    r = engine_rows(out_dir, "q_kmv_union")[0]
    ok &= check("k_union", r["k_union"] == len(mrg))
    ok &= check("est_a/b/union",
                abs(r["est_a"] - est_a) <= 1e-9 and
                abs(r["est_b"] - est_b) <= 1e-9 and
                abs(r["est_union"] - est_u) <= 1e-9,
                f"engine=({r['est_a']:.3f},{r['est_b']:.3f},{r['est_union']:.3f})")
    ok &= check("true_union", r["true_union"] == true_u)

    # --- q_simhash_pairs: 60-bit token-md5 simhash, 4x15-bit bands,
    # hamming <= 3
    print("q_simhash_pairs")
    dids = docs.column("doc_id").to_pylist()
    sig = {}
    for did, text in zip(dids, texts):
        votes = [0] * 60
        for tok in text.split(" "):
            h = int(md5hex(tok)[:15], 16)
            for b in range(60):
                votes[b] += 1 if (h >> b) & 1 else -1
        sig[did] = sum(1 << b for b in range(60) if votes[b] > 0)
    buckets = {}
    for did, s_ in sig.items():
        for band in range(4):
            buckets.setdefault((band, (s_ >> (band * 15)) & 32767), []).append(did)
    pairs = set()
    for ds in buckets.values():
        for i in range(len(ds)):
            for j in range(i + 1, len(ds)):
                a, b = min(ds[i], ds[j]), max(ds[i], ds[j])
                hm = bin(sig[a] ^ sig[b]).count("1")
                if hm <= 3:
                    pairs.add((a, b, hm))
    got = [(r["d1"], r["d2"], r["hamming"])
           for r in engine_rows(out_dir, "q_simhash_pairs")]
    ok &= check("hamming<=3 pairs", sorted(got) == sorted(pairs),
                f"({len(got)} engine vs {len(pairs)} independent)")

    # --- q_winnow_pairs: every-10th doc plus planted near-copies
    # (tokens dropped when md5('<base_id>|<tok>') starts with '0'),
    # 6-gram md5 fingerprints winnowed with window 8, df<=50 kept,
    # pairs sharing >= 2 fingerprints
    print("q_winnow_pairs")
    corpus = {did: t for did, t in zip(dids, texts) if did % 10 == 0}
    for did in sorted(corpus):
        if did % 20 == 0:
            kepttoks = [t for t in corpus[did].split(" ")
                        if md5hex(f"{did}|{t}")[0] != "0"]
            corpus[did + 30000000] = " ".join(kepttoks)
    doc_fps = {}
    for did, text in corpus.items():
        t = text.split(" ")
        m = len(t) - 5
        if m < 8:
            continue
        hs_ = [md5hex(" ".join(t[i:i + 6])) for i in range(m)]
        fps_ = {min(hs_[i:i + 8]) for i in range(m - 7)}
        doc_fps[did] = fps_
    dfc = {}
    for fset in doc_fps.values():
        for fp in fset:
            dfc[fp] = dfc.get(fp, 0) + 1
    shared = {}
    inv = {}
    for did in sorted(doc_fps):
        for fp in doc_fps[did]:
            if dfc[fp] <= 50:
                inv.setdefault(fp, []).append(did)
    for fp, ds in inv.items():
        for i in range(len(ds)):
            for j in range(i + 1, len(ds)):
                key = (ds[i], ds[j])
                shared[key] = shared.get(key, 0) + 1
    want = sorted((d1, d2, c) for (d1, d2), c in shared.items() if c >= 2)
    got = sorted((r["d1"], r["d2"], r["shared"])
                 for r in engine_rows(out_dir, "q_winnow_pairs"))
    ok &= check("winnow pairs", got == want,
                f"({len(got)} engine vs {len(want)} independent)")

    print("\nALL MATCH" if ok else "\nMISMATCHES FOUND")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
