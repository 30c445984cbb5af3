#!/usr/bin/env python3
"""Local dev harness mimicking the driver's DuckDB-oracle compare.

Usage: sbt "runMain graft.Verify <sfDir> /tmp/graft_verify" && python3 tools/check_oracle.py <sfDir> /tmp/graft_verify

For each query dumped by graft.Verify, runs the oracle SQL in DuckDB over the
same parquet tables, sorts columns by name and rows by value, and compares
schema + values. Dev-only tooling — not part of the Scala library.
"""
import json, sys, glob, os
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def norm(df):
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df

def main(sf_dir, out_dir):
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_ok = n_bad = 0
    for name in sorted(os.listdir(out_dir)):
        d = os.path.join(out_dir, name)
        if not os.path.isdir(d):
            continue
        files = glob.glob(f"{d}/*.parquet")
        if not files:
            print(f"  {name}: NO OUTPUT"); n_bad += 1; continue
        spark_df = con.execute(f"SELECT * FROM '{d}/*.parquet'").fetchdf()
        if name not in oracle:
            print(f"  {name}: rows-only ({len(spark_df)} rows)")
            continue
        try:
            duck_df = con.execute(oracle[name]).fetchdf()
        except Exception as e:
            print(f"  {name}: ORACLE SQL ERROR: {e}"); n_bad += 1; continue
        s, o = norm(spark_df), norm(duck_df)
        if list(s.columns) != list(o.columns):
            print(f"  {name}: COLUMN MISMATCH spark={list(s.columns)} duck={list(o.columns)}"); n_bad += 1; continue
        if [str(t) for t in s.dtypes] != [str(t) for t in o.dtypes]:
            # the driver compares schemas too — a dtype mismatch is a FAILURE
            # here even when stringified values agree
            print(f"  {name}: DTYPE MISMATCH spark={list(map(str, s.dtypes))} duck={list(map(str, o.dtypes))}")
            n_bad += 1
            continue
        if len(s) != len(o):
            print(f"  {name}: ROWCOUNT MISMATCH spark={len(s)} duck={len(o)}"); n_bad += 1; continue
        try:
            eq = s.equals(o)
            if not eq:
                # fall back to stringified compare to tolerate dtype-width diffs
                eq = s.astype(str).equals(o.astype(str))
        except Exception:
            eq = False
        if eq:
            print(f"  {name}: OK ({len(s)} rows)"); n_ok += 1
        else:
            diff = (s.astype(str) != o.astype(str))
            bad_rows = diff.any(axis=1)
            print(f"  {name}: VALUE MISMATCH ({bad_rows.sum()}/{len(s)} rows differ)")
            print("   spark:", s[bad_rows].head(3).to_string())
            print("   duck :", o[bad_rows].head(3).to_string())
            n_bad += 1
    print(f"== {n_ok} ok, {n_bad} bad ==")
    return 1 if n_bad else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
