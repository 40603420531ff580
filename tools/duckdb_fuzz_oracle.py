#!/usr/bin/env python3
"""DuckDB side of the random differential SQL fuzzer.

Usage: duckdb_fuzz_oracle.py <views.json> <queries.json> <out_dir>

views.json:   {"lineitem": "/path/to/lineitem.parquet", ...}
              (a value may be a directory of parquet files)
queries.json: [{"name": "q0", "sql": "SELECT ..."}, ...]

For each query, runs it against DuckDB views over the SAME parquet the
Spark side serves, and writes the result to <out_dir>/<name>.parquet.
Errors are recorded per query instead of aborting: a dialect gap on one
query must not hide a wrong ANSWER on another. A manifest.json maps
name -> {"status": "ok"|"error", "error": "..."} for the Spark side to
consume.
"""
import json
import os
import sys

import duckdb


def main() -> int:
    views_path, queries_path, out_dir = sys.argv[1], sys.argv[2], sys.argv[3]
    with open(views_path) as f:
        views = json.load(f)
    with open(queries_path) as f:
        queries = json.load(f)
    os.makedirs(out_dir, exist_ok=True)
    con = duckdb.connect()
    for name, path in views.items():
        src = f"{path}/*.parquet" if os.path.isdir(path) else path
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{src}')")
    manifest = {}
    for q in queries:
        out = os.path.join(out_dir, q["name"] + ".parquet")
        try:
            con.execute(
                f"COPY ({q['sql']}) TO '{out}' (FORMAT PARQUET)")
            manifest[q["name"]] = {"status": "ok"}
        except Exception as e:  # noqa: BLE001 - record, don't abort
            manifest[q["name"]] = {"status": "error", "error": str(e)[:500]}
    with open(os.path.join(out_dir, "manifest.json"), "w") as f:
        json.dump(manifest, f, indent=1)
    return 0


if __name__ == "__main__":
    sys.exit(main())
