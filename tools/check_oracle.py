#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run graft.Verify output
against the DuckDB oracle SQL and compare per query (rows / schema / values).

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>
"""
import sys, os, json, glob
import duckdb
import pyarrow.parquet as pq
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def load_spark(outdir, name):
    files = glob.glob(f"{outdir}/{name}/*.parquet")
    if not files:
        return None
    return pq.read_table(files[0]).to_pandas()

def canon(df):
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    # normalize float noise
    for c in df.columns:
        if df[c].dtype == "float64":
            df[c] = df[c].round(9)
    return df

def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sfdir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracles = json.load(open(f"{outdir}/oracle_sql.json"))
    results = {}
    for name in sorted(os.listdir(outdir)):
        if not os.path.isdir(f"{outdir}/{name}"):
            continue
        spark_df = load_spark(outdir, name)
        if spark_df is None:
            results[name] = "NO_SPARK_OUTPUT"
            continue
        if name not in oracles:
            results[name] = f"ROWS_ONLY({len(spark_df)})"
            continue
        try:
            duck_df = con.execute(oracles[name]).fetchdf()
        except Exception as e:
            results[name] = f"ORACLE_SQL_ERROR: {str(e)[:200]}"
            continue
        a, b = canon(spark_df), canon(duck_df)
        if list(a.columns) != list(b.columns):
            results[name] = f"SCHEMA_MISMATCH spark={list(a.columns)} duck={list(b.columns)}"
        elif len(a) != len(b):
            results[name] = f"ROWCOUNT_MISMATCH spark={len(a)} duck={len(b)}"
        else:
            try:
                pd.testing.assert_frame_equal(a, b, check_dtype=False, check_exact=False, rtol=1e-9)
                results[name] = f"MATCH({len(a)})"
            except AssertionError as e:
                results[name] = "VALUE_MISMATCH: " + str(e).split("\n")[0][:150]
                # show first differing row
                neq = (a != b).any(axis=1)
                if neq.any():
                    i = neq.idxmax()
                    results[name] += f" | spark={a.iloc[i].to_dict()} duck={b.iloc[i].to_dict()}"
    ok = sum(1 for v in results.values() if v.startswith("MATCH") or v.startswith("ROWS_ONLY"))
    for k, v in results.items():
        print(f"{k}: {v}")
    print(f"\n{ok}/{len(results)} pass")

if __name__ == "__main__":
    main()
