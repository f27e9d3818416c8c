#!/usr/bin/env python3
"""Diff two Verify output dirs row-for-row (dev tooling).

Usage: python3 scripts/diff_dumps.py <dirA> <dirB>

Every query dir present in both is compared with DuckDB: same columns,
same row count, same values in emitted order. Used to check the
determinism claim: a dump at one shuffle width must equal a dump at
another bit-for-bit (every query ends in a total ORDER BY).
"""
import os
import sys

import duckdb


def main(a, b):
    con = duckdb.connect()
    names = sorted(set(os.listdir(a)) & set(os.listdir(b)))
    names = [n for n in names if os.path.isdir(os.path.join(a, n))]
    bad = []
    for n in names:
        try:
            d = con.sql(
                f"SELECT count(*) FROM ((SELECT * FROM read_parquet('{a}/{n}/*.parquet'))"
                f" EXCEPT ALL (SELECT * FROM read_parquet('{b}/{n}/*.parquet')))"
            ).fetchone()[0]
            d2 = con.sql(
                f"SELECT count(*) FROM ((SELECT * FROM read_parquet('{b}/{n}/*.parquet'))"
                f" EXCEPT ALL (SELECT * FROM read_parquet('{a}/{n}/*.parquet')))"
            ).fetchone()[0]
            if d or d2:
                bad.append((n, f"{d}+{d2} differing rows"))
        except Exception as e:
            bad.append((n, f"compare failed: {e}"))
    for n, msg in bad:
        print(f"DIFF {n}: {msg}")
    print(f"{len(names) - len(bad)}/{len(names)} dumps identical")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
