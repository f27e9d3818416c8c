#!/usr/bin/env python3
"""Local self-check mimicking the driver's t2 gate.

Usage: python3 scripts/check_oracle.py <verifyOutDir> <sfDir>

Reads <verifyOutDir>/oracle_sql.json, registers each fixture parquet as
a DuckDB view named after the table, runs each oracle SQL, and compares
against the Spark-written parquet in <verifyOutDir>/<name>/.

Compare semantics (mirrors the driver as documented): sort columns by
name, then compare row-by-row values (rows in the order each side
produced — every query must end in a deterministic ORDER BY).

Dev tooling only — the Scala library has no Python dependency.
"""
import json
import math
import os
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, 9)
    return v


def main(outdir, sfdir):
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")
    with open(f"{outdir}/oracle_sql.json") as f:
        oracle = json.load(f)

    only_dumped = "--only-dumped" in sys.argv
    failures = []
    for name in sorted(oracle):
        if only_dumped and not os.path.isdir(f"{outdir}/{name}"):
            continue
        sql = oracle[name]
        try:
            want = con.sql(sql)
            want_cols = sorted(want.columns)
            want_rows = [tuple(norm(v) for _, v in sorted(zip(want.columns, r)))
                         for r in want.fetchall()]
        except Exception as e:
            failures.append((name, f"oracle SQL failed: {e}"))
            continue
        try:
            got = con.sql(
                f"SELECT * FROM read_parquet('{outdir}/{name}/*.parquet')")
            got_cols = sorted(got.columns)
            got_rows = [tuple(norm(v) for _, v in sorted(zip(got.columns, r)))
                        for r in got.fetchall()]
        except Exception as e:
            failures.append((name, f"spark output unreadable: {e}"))
            continue
        if got_cols != want_cols:
            failures.append(
                (name, f"schema mismatch: spark={got_cols} oracle={want_cols}"))
            continue
        if len(got_rows) != len(want_rows):
            failures.append(
                (name, f"row count: spark={len(got_rows)} oracle={len(want_rows)}"))
            continue
        bad = None
        for i, (g, w) in enumerate(zip(got_rows, want_rows)):
            if g != w:
                bad = (i, g, w)
                break
        if bad:
            failures.append(
                (name, f"first diff at row {bad[0]}: spark={bad[1]} oracle={bad[2]}"))
            continue
        print(f"OK   {name}  ({len(got_rows)} rows)")

    for name, msg in failures:
        print(f"FAIL {name}: {msg}")
    print(f"\n{len(oracle) - len(failures)}/{len(oracle)} queries match")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
