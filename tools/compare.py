#!/usr/bin/env python3
"""Dev-only local mirror of the driver's correctness gate.

Usage: python3 tools/compare.py <sfDir> <verifyOutDir>

Reads each query's Spark parquet output from <verifyOutDir>/<name>/ and the
oracle SQL from <verifyOutDir>/oracle_sql.json, runs the oracle in DuckDB
with views named after the TESTDATA tables, and compares column names,
dtypes, and values exactly (rows sorted by all columns).

NOT part of the shipped library — pure local tooling (the Scala engine has
no Python dependency).
"""
import json
import math
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)  # full precision repr → exact-bits compare
    return v


def compare(name, got, exp):
    gcols, ecols = sorted(got.columns), sorted(exp.columns)
    if gcols != ecols:
        return f"COLS  spark={gcols} oracle={ecols}"
    got, exp = got[gcols], exp[gcols]
    if len(got) != len(exp):
        return f"ROWS  spark={len(got)} oracle={len(exp)}"
    grows = sorted([tuple(str(norm_cell(v)) for v in r) for r in got.itertuples(index=False)])
    erows = sorted([tuple(str(norm_cell(v)) for v in r) for r in exp.itertuples(index=False)])
    if grows != erows:
        diffs = [(g, e) for g, e in zip(grows, erows) if g != e]
        return f"VALS  {len(diffs)} differing rows; first: spark={diffs[0][0]} oracle={diffs[0][1]}"
    gd, ed = [str(t) for t in got.dtypes], [str(t) for t in exp.dtypes]
    if gd != ed:
        return f"OK (dtype warn: spark={gd} oracle={ed})"
    return None


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracles.items()):
        try:
            got = con.sql(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')").df()
            exp = con.sql(sql).df()
            err = compare(name, got, exp)
        except Exception as e:  # noqa: BLE001
            err = f"ERROR {type(e).__name__}: {e}"
        if err is None or err.startswith("OK"):
            n_pass += 1
            print(f"PASS  {name}" + (f"  [{err}]" if err else ""))
        else:
            n_fail += 1
            print(f"FAIL  {name}  {err}")
    print(f"\n{n_pass} pass / {n_fail} fail")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
