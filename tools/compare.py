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

def main(sf_dir, out_dir):
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
