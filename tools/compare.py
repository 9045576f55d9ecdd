#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle correctness check.

Usage: python3 tools/compare.py <sfDir> <verifyOutDir>

For each query result parquet in <verifyOutDir>/<name>/, runs the matching
SQL from <verifyOutDir>/oracle_sql.json in DuckDB (tables = parquet files in
<sfDir>), sorts columns by name, canonicalizes rows, and compares.
"""
import sys, json, glob, os
import duckdb
import pyarrow.parquet as pq

def canon(rows):
    out = []
    for r in rows:
        out.append(tuple(repr(v) for v in r))
    return sorted(out)

def corpus_stats(sf_dir):
    """Mirror of graft.tools.CorpusMarker.stats: per top-level *.parquet
    entry, (recursive file count, total bytes, max mtime floored to whole
    seconds — the precision Java and Python agree on exactly)."""
    tables = {}
    for e in sorted(os.listdir(sf_dir)):
        if not e.endswith(".parquet"):
            continue
        p = os.path.join(sf_dir, e)
        files = bytes_ = mtime = 0
        if os.path.isdir(p):
            for root, _, names in os.walk(p):
                for n in names:
                    st = os.stat(os.path.join(root, n))
                    files += 1
                    bytes_ += st.st_size
                    mtime = max(mtime, st.st_mtime_ns // 1_000_000_000)
        else:
            st = os.stat(p)
            files, bytes_, mtime = 1, st.st_size, st.st_mtime_ns // 1_000_000_000
        tables[e] = [files, bytes_, mtime]
    return tables

def check_marker(sf_dir, out_dir):
    """Refuse to pair a Verify output dir with the wrong corpus: the
    marker graft.Verify wrote must match stats recomputed from THIS
    compare's corpus argument (r12 stale-output-dir incident — a resumed
    compare paired outputs from a different scale factor)."""
    marker_path = os.path.join(out_dir, "corpus_marker.json")
    if not os.path.exists(marker_path):
        print(f"[ABORT] {out_dir} has no corpus_marker.json — stale or "
              "pre-marker Verify output; re-run graft.Verify into a fresh dir")
        return False
    marker = json.load(open(marker_path))
    actual = corpus_stats(sf_dir)
    if marker["tables"] != actual:
        print(f"[ABORT] corpus marker mismatch: outputs in {out_dir} were "
              f"computed from {marker.get('sf_dir')} whose stats differ from "
              f"{sf_dir} — re-run graft.Verify against this corpus")
        for t in sorted(set(marker["tables"]) | set(actual)):
            m, a = marker["tables"].get(t), actual.get(t)
            if m != a:
                print(f"  {t}: marker={m} actual={a}")
        return False
    return True

def main(sf_dir, out_dir):
    if not check_marker(sf_dir, out_dir):
        return 2
    # oracle_sql.json is written LAST by graft.Verify, so its absence
    # means the sweep died mid-run — refuse cleanly instead of a
    # json.load stack trace on a partial output dir
    if not os.path.exists(os.path.join(out_dir, "oracle_sql.json")):
        print(f"[ABORT] {out_dir} has no oracle_sql.json — the Verify run "
              "did not complete; re-run graft.Verify")
        return 2
    con = duckdb.connect()
    for t in ["region","nation","customer","supplier","part","orders",
              "lineitem","events","documents","embeddings"]:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.isdir(p):  # Spark-written (e.g. tools.Inflate output)
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}/*.parquet'")
        elif os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    only = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        if only is not None and name not in only:
            continue
        res_dir = os.path.join(out_dir, name)
        files = glob.glob(os.path.join(res_dir, "*.parquet"))
        if not files:
            print(f"[FAIL] {name}: no spark result parquet"); n_fail += 1; continue
        spark_tbl = pq.read_table(files[0])
        cols = sorted(spark_tbl.column_names)
        spark_rows = canon(zip(*[spark_tbl.column(c).to_pylist() for c in cols]))
        try:
            duck = con.execute(sql).fetch_arrow_table()
        except Exception as e:
            print(f"[FAIL] {name}: oracle SQL error: {e}"); n_fail += 1; continue
        dcols = sorted(duck.column_names)
        if cols != dcols:
            print(f"[FAIL] {name}: schema mismatch spark={cols} duck={dcols}"); n_fail += 1; continue
        duck_rows = canon(zip(*[duck.column(c).to_pylist() for c in dcols]))
        if spark_rows == duck_rows:
            print(f"[PASS] {name}: {len(spark_rows)} rows"); n_pass += 1
        else:
            print(f"[FAIL] {name}: rows spark={len(spark_rows)} duck={len(duck_rows)}")
            for i, (a, b) in enumerate(zip(spark_rows, duck_rows)):
                if a != b:
                    print(f"  first diff at {i}:\n   spark={a}\n   duck ={b}"); break
            n_fail += 1
    print(f"\n{n_pass} pass / {n_fail} fail")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
