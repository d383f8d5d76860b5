#!/usr/bin/env python3
"""Local stand-in for the driver's correctness pass (dev tool only —
the shipped library has no Python dependency).

READER FIDELITY (the round-8 postmortem): the driver reads the TWO
sides through DIFFERENT readers — the Spark result parquet via
pyarrow/pandas (`pd.read_parquet`), the oracle via duckdb's pandas
conversion (`con.sql(sql).df()`) — and hashes values column-sorted.
Those readers do not render types identically: a Spark DECIMAL column
becomes Python `decimal.Decimal` objects under pyarrow, while a DuckDB
DECIMAL (or the HUGEINT a bare `sum()` produces) becomes float64 under
duckdb→pandas. A previous version of this script read BOTH sides
through duckdb `fetchall()`, erasing exactly that asymmetry — it
green-lit six queries the driver rejected, two rounds running. This
version reproduces the driver's readers verbatim, and compares with a
TYPE-SENSITIVE canonical form (int 13623 != float 13623.0;
Decimal('-242.78...') != the nearest float64), so a certified surface
that would hash-mismatch under the driver fails HERE first.

Usage: python3 scripts/local_verify.py <sfDir> <outDir> [query...]
(trailing query names restrict the compare — pair with the same
trailing names on graft.Verify for a targeted loop)
"""
import datetime
import decimal
import json
import math
import sys

import duckdb
import numpy as np
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


class ArrayColumnError(Exception):
    """A LIST/STRUCT-typed output column. The driver's pandas row-sort
    cannot factorize these (unhashable ndarray) — the query must emit
    scalars (e.g. long form (id, j, value)) instead."""


def canon_cell(v, col):
    """Type-sensitive exact rendering of one cell — two cells hash
    equal under the driver only if they are the same VALUE in the same
    NUMERIC FAMILY. No rounding anywhere (the r7 lesson); no numeric
    cross-family equivalence (the r8 lesson: Decimal vs float64 and
    int64 vs float64 were exactly the driver-red classes)."""
    if v is None:
        return "null"
    if isinstance(v, (list, tuple, dict, np.ndarray)):
        raise ArrayColumnError(
            f"column '{col}' is array/struct-typed (sample "
            f"{str(v)[:60]!r}); the driver harness crashes on these — "
            "emit scalars (long form) instead")
    if isinstance(v, (bool, np.bool_)):
        return f"b:{bool(v)}"
    if isinstance(v, (int, np.integer)):
        return f"i:{int(v)}"
    if isinstance(v, (float, np.floating)):
        f = float(v)
        if math.isnan(f):
            return "f:nan"
        return f"f:{f!r}"
    if isinstance(v, decimal.Decimal):
        # exact decimal value (trailing-zero insensitive, like hash())
        return f"d:{v.normalize()}"
    if isinstance(v, pd.Timestamp):
        return f"t:{v.isoformat()}"
    if isinstance(v, datetime.datetime):
        return f"t:{pd.Timestamp(v).isoformat()}"
    if isinstance(v, datetime.date):
        return f"t:{pd.Timestamp(v).isoformat()}"
    if isinstance(v, (bytes, bytearray)):
        return f"x:{bytes(v).hex()}"
    if v is pd.NaT:
        return "null"
    return f"s:{v}"


def canon(df):
    """Column-name-sorted, row-sorted, type-sensitive table image."""
    cols = sorted(df.columns)
    out = []
    for row in df[cols].itertuples(index=False, name=None):
        vals = []
        for c, v in zip(cols, row):
            # pandas nulls: NaN floats stay 'f:nan' (a value both
            # readers produce for NULL doubles); NaT/None → null
            if v is pd.NaT or (v is None):
                vals.append("null")
            else:
                vals.append(canon_cell(v, c))
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
            # THE DRIVER'S SPARK-SIDE READER: pyarrow → pandas
            got_df = pd.read_parquet(f"{out_dir}/{name}")
            # THE DRIVER'S ORACLE-SIDE READER: duckdb → pandas
            exp_df = con.sql(sql).df()
            got = canon(got_df)
            exp = canon(exp_df)
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: exception {e}")
            n_fail += 1
            continue
        got_dt = {c: str(got_df[c].dtype) for c in got_df.columns}
        exp_dt = {c: str(exp_df[c].dtype) for c in exp_df.columns}
        if sorted(got_df.columns) != sorted(exp_df.columns):
            print(f"FAIL {name}: columns {sorted(got_df.columns)} != "
                  f"{sorted(exp_df.columns)}")
            n_fail += 1
        elif got != exp:
            exp_set, got_set = set(exp), set(got)
            diff_g = [r for r in got if r not in exp_set][:2]
            diff_e = [r for r in exp if r not in got_set][:2]
            dtd = {c: (got_dt[c], exp_dt.get(c)) for c in got_dt
                   if got_dt[c] != exp_dt.get(c)}
            print(f"FAIL {name}: {len(got)} vs {len(exp)} rows; "
                  f"dtype-diffs={dtd}; spark-only={diff_g} "
                  f"oracle-only={diff_e}")
            n_fail += 1
        else:
            if got_dt != exp_dt:
                # values render identically but pandas dtypes differ —
                # surface it; the driver's hash is over values, so this
                # is informational, not a red
                print(f"PASS {name} ({len(got)} rows) "
                      f"[dtype note: { {c: (got_dt[c], exp_dt[c]) for c in got_dt if got_dt[c] != exp_dt.get(c)} }]")
            else:
                print(f"PASS {name} ({len(got)} rows)")
            n_pass += 1
    print(f"\n{n_pass} passed, {n_fail} failed")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2], frozenset(sys.argv[3:])))
