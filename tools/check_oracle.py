#!/usr/bin/env python3
"""Local dev harness: compare graft.Verify parquet dumps against DuckDB
running SparkEntry.oracleSql on the same testdata tables.

Dev tooling only (driver-side python); NOT part of the Scala library.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>
"""
import json
import math
import os
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(rows, cols):
    """Sort columns by name, round floats, sort rows -> list of tuples."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])

    def cell(v):
        if isinstance(v, float):
            if math.isnan(v):
                return "NaN"
            return round(v, 6)
        if isinstance(v, list):
            return tuple(cell(x) for x in v)
        return v

    out = [tuple(cell(r[i]) for i in order) for r in rows]
    out.sort(key=lambda t: tuple(str(x) for x in t))
    return out


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    # manifest.json lists every query the Verify run ATTEMPTED: a name in
    # the manifest whose output dir is missing means the query crashed and
    # must FAIL; a name absent from the manifest was a deliberate subset
    # exclusion and is skipped. No manifest (pre-r8 dump) -> treat every
    # oracle name as attempted, so a crashed query can never read as a
    # silent skip.
    manifest_path = f"{out_dir}/manifest.json"
    attempted = (set(json.load(open(manifest_path)))
                 if os.path.exists(manifest_path) else set(oracle))
    n_pass = n_fail = n_skip = 0
    for name, sql in sorted(oracle.items()):
        if not os.path.isdir(f"{out_dir}/{name}"):
            if name in attempted:
                print(f"FAIL {name}: attempted but no output dir "
                      "(query crashed in graft.Verify)")
                n_fail += 1
            else:
                n_skip += 1
            continue
        try:
            got_rel = con.sql(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')")
            got_cols = got_rel.columns
            got = canon(got_rel.fetchall(), got_cols)
            exp_rel = con.sql(sql)
            exp_cols = exp_rel.columns
            exp = canon(exp_rel.fetchall(), exp_cols)
        except Exception as e:
            print(f"FAIL {name}: exception {e}")
            n_fail += 1
            continue
        if sorted(got_cols) != sorted(exp_cols):
            print(f"FAIL {name}: columns {sorted(got_cols)} != {sorted(exp_cols)}")
            n_fail += 1
        elif got != exp:
            n_fail += 1
            diff_a = [r for r in got if r not in set(exp)][:3]
            diff_b = [r for r in exp if r not in set(got)][:3]
            print(f"FAIL {name}: {len(got)} vs {len(exp)} rows;"
                  f" spark-only={diff_a} oracle-only={diff_b}")
        else:
            n_pass += 1
            print(f"PASS {name} ({len(got)} rows)")
    skipped = f", {n_skip} not dumped" if n_skip else ""
    print(f"== {n_pass} pass, {n_fail} fail{skipped} ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
