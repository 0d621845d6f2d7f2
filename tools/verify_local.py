#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Usage: python3 tools/verify_local.py <sfDir> <verifyOutDir>

Reads each <name>/ parquet written by graft.Verify, runs the matching
oracle SQL from oracle_sql.json in DuckDB over the same sfDir parquet
tables, and compares: row count, column names, and a hash of values with
columns sorted by name (rows sorted canonically too).
"""
import sys, json, glob, hashlib
import duckdb
import pyarrow.parquet as pq
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def canon(df: pd.DataFrame) -> str:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize dtypes: everything to string with stable float formatting
    def fmt(v):
        if v is None or v != v:
            return "NULL"
        if isinstance(v, float):
            return f"{v:.6f}"
        return str(v)
    rows = ["\x01".join(fmt(v) for v in row) for row in df.itertuples(index=False, name=None)]
    rows.sort()
    return hashlib.md5("\n".join(rows).encode()).hexdigest()

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    ok = fail = 0
    for name, sql in sorted(oracle.items()):
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"[FAIL] {name}: no spark output"); fail += 1; continue
        spark_df = pq.read_table(files).to_pandas()
        try:
            duck_df = con.execute(sql).df()
        except Exception as e:
            print(f"[FAIL] {name}: duckdb error: {e}"); fail += 1; continue
        problems = []
        if len(spark_df) != len(duck_df):
            problems.append(f"rows {len(spark_df)} vs {len(duck_df)}")
        if sorted(spark_df.columns) != sorted(duck_df.columns):
            problems.append(f"cols {sorted(spark_df.columns)} vs {sorted(duck_df.columns)}")
        elif canon(spark_df) != canon(duck_df):
            problems.append("value hash mismatch")
            merged = spark_df.reindex(sorted(spark_df.columns), axis=1)
            dd = duck_df.reindex(sorted(duck_df.columns), axis=1)
            for i in range(min(len(merged), len(dd))):
                a, b = merged.iloc[i].tolist(), dd.iloc[i].tolist()
                sa = [str(x) for x in a]; sb = [str(x) for x in b]
                if sa != sb:
                    problems.append(f"first diff row {i}: spark={a} duck={b}")
                    break
        if problems:
            print(f"[FAIL] {name}: " + "; ".join(problems)); fail += 1
        else:
            print(f"[ OK ] {name}: {len(spark_df)} rows"); ok += 1
    print(f"\n{ok} ok, {fail} fail")
    sys.exit(1 if fail else 0)

if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
