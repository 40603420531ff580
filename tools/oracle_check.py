#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle compare.

Usage: python3 tools/oracle_check.py <sfDir> <verifyOutDir> [query ...]

Reads each <verifyOutDir>/<name> parquet (Spark result), runs the matching
SQL from <verifyOutDir>/oracle_sql.json in DuckDB with the sfDir parquet
tables registered as views, sorts columns by name, and compares row count,
schema-ish dtypes, and an order-insensitive hash of values.
"""
import sys, json, glob, os
import duckdb, pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # canonicalize values to strings for hashing
    return df

def value_hash(df: pd.DataFrame) -> str:
    import hashlib
    rows = []
    for _, row in df.iterrows():
        cells = []
        for v in row:
            if isinstance(v, float):
                cells.append(f"{v:.6f}")
            else:
                cells.append(str(v))
        rows.append("|".join(cells))
    rows.sort()
    return hashlib.md5("\n".join(rows).encode()).hexdigest()

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = n_skip = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        spark_dir = f"{out_dir}/{name}"
        files = glob.glob(f"{spark_dir}/*.parquet")
        if not files:
            print(f"[MISS] {name}: no spark output at {spark_dir}")
            n_fail += 1
            continue
        try:
            got = pd.concat([pd.read_parquet(f) for f in files])
            want = con.execute(sql).df()
        except Exception as e:
            print(f"[ERR ] {name}: {e}")
            n_fail += 1
            continue
        got, want = norm(got), norm(want)
        ok_rows = len(got) == len(want)
        ok_cols = list(got.columns) == list(want.columns)
        ok_hash = ok_rows and ok_cols and value_hash(got) == value_hash(want)
        if ok_hash:
            print(f"[OK  ] {name}: rows={len(got)}")
            n_pass += 1
        else:
            print(f"[FAIL] {name}: rows {len(got)} vs {len(want)}; "
                  f"cols {list(got.columns)} vs {list(want.columns)}")
            if ok_rows and ok_cols:
                merged = got.merge(want, how="outer", indicator=True)
                diff = merged[merged._merge != "both"]
                print(diff.head(10).to_string())
            n_fail += 1
    print(f"\npass={n_pass} fail={n_fail}")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
