#!/usr/bin/env python3
"""Local stand-in for the driver's correctness pass (dev tool only —
the shipped library has no Python dependency).

Runs DuckDB on each oracle_sql.json entry against the raw testdata
parquet and compares (schema-insensitively: columns sorted by name,
rows sorted by all values) with the Spark result parquet produced by
`sbt "runMain graft.Verify <sfDir> <outDir>"`.

Usage: python3 scripts/local_verify.py <sfDir> <outDir>
"""
import json
import math
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                if math.isnan(v):
                    v = "NaN"
                else:
                    v = round(v, 9)
            vals.append(repr(v))
        out.append(tuple(vals))
    out.sort()
    return out


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            got_rel = con.sql(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
            got_cols = list(got_rel.columns)
            got = canon(got_rel.fetchall(), got_cols)
            exp_rel = con.sql(sql)
            exp_cols = list(exp_rel.columns)
            exp = canon(exp_rel.fetchall(), exp_cols)
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: exception {e}")
            n_fail += 1
            continue
        if sorted(got_cols) != sorted(exp_cols):
            print(f"FAIL {name}: columns {sorted(got_cols)} != {sorted(exp_cols)}")
            n_fail += 1
        elif got != exp:
            exp_set, got_set = set(exp), set(got)
            diff_g = [r for r in got if r not in exp_set][:3]
            diff_e = [r for r in exp if r not in got_set][:3]
            print(f"FAIL {name}: {len(got)} vs {len(exp)} rows; "
                  f"spark-only={diff_g} oracle-only={diff_e}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(got)} rows)")
            n_pass += 1
    # queries with no oracle → rows-only check
    for name in sorted(set(json.load(open(f"{out_dir}/queries.json"))
                           if False else [])):
        pass
    print(f"\n{n_pass} passed, {n_fail} failed")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
