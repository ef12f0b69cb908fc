#!/usr/bin/env python3
"""Record DuckDB wall-clock per oracle query, for the bench ratio column.

Dev tooling only (driver-side python); NOT part of the Scala library.
Times each oracle SQL from a graft.Verify dump against the same parquet
tables Bench reads, and merges the timings into tools/oracle_times.json
keyed by the scale-factor directory basename. graft.Bench reads that file
(when present for its sf) and emits spark_vs_duckdb per headline query.

Usage: python3 tools/time_oracle.py <sfDir> <verifyOutDir>
"""
import json
import os
import sys
import time

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]
OUT = os.path.join(os.path.dirname(__file__), "oracle_times.json")


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    times = {}
    for name, sql in sorted(oracle.items()):
        con.sql(sql).fetchall()  # warm the file cache / catalog
        t0 = time.perf_counter()
        con.sql(sql).fetchall()
        times[name] = round(time.perf_counter() - t0, 6)
        print(f"{name}: {times[name]}s")
    merged = {}
    if os.path.exists(OUT):
        merged = json.load(open(OUT))
    merged[os.path.basename(os.path.normpath(sf_dir))] = times
    json.dump(merged, open(OUT, "w"), indent=1, sort_keys=True)
    print(f"wrote {OUT}")


if __name__ == "__main__":
    main()
