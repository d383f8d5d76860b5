#!/usr/bin/env python3
"""Local stand-in for the driver's correctness pass (dev tool only —
the shipped library has no Python dependency).

Runs DuckDB on each oracle_sql.json entry against the raw testdata
parquet and compares (schema-insensitively: columns sorted by name,
rows sorted by all values) with the Spark result parquet produced by
`sbt "runMain graft.Verify <sfDir> <outDir>"`.

Usage: python3 scripts/local_verify.py <sfDir> <outDir> [query...]
(trailing query names restrict the compare — pair with the same
trailing names on graft.Verify for a targeted loop)
"""
import json
import math
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


class ArrayColumnError(Exception):
    """A LIST/STRUCT-typed output column. The driver's pandas row-sort
    cannot factorize these (unhashable ndarray) — the query must emit
    scalars (e.g. long form (id, j, value)) instead."""


def canon(rows, cols):
    # BIT-EXACT compare — the driver hash-matches exact values, so any
    # local rounding here would mask driver-red divergence (the r7
    # lesson: three queries passed a round(v, 9) local compare and
    # failed the driver's exact hash).
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if isinstance(v, (list, tuple, dict)):
                raise ArrayColumnError(
                    f"column '{cols[i]}' is array/struct-typed "
                    f"(sample {v!r:.60}); the driver harness crashes on "
                    "these — emit scalars (long form) instead")
            if isinstance(v, float) and math.isnan(v):
                v = "NaN"
            vals.append(repr(v))
        out.append(tuple(vals))
    out.sort()
    return out


def main(sf_dir, out_dir, only=()):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    if only:
        oracle = {k: v for k, v in oracle.items() if k in only}
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
    sys.exit(main(sys.argv[1], sys.argv[2], frozenset(sys.argv[3:])))
