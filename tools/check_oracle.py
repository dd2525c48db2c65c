#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: run Verify's output
against DuckDB on the same tables and report per-query match.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir> [only]

`only` (optional): comma-separated query names, or `-name` entries to
EXCLUDE from the full set — used at sf>=1 where the handful of
deliberately-quadratic oracle queries (dd02/dd03/dd05/dd12, the ann
brute-force rescores) would run for hours in DuckDB while everything
else hash-checks in minutes.
"""
import json
import math
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(v):
    # sortable, exact-equality key: (type tag, canonical string)
    if v is None:
        return ("z", "none")
    if isinstance(v, float):
        return ("f", "NaN" if math.isnan(v) else repr(v))
    return (type(v).__name__, str(v))


def main(sf_dir, out_dir, only=None):
    import os
    con = duckdb.connect()
    for t in TABLES:
        # a table is either a bare file (driver fixtures) or a directory of
        # part files (ScaleData / production layouts)
        p = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(p):
            p = f"{p}/*.parquet"
        sel = f"SELECT * FROM '{p}'"
        if t == "events":
            # the driver fixture stores ts as TIMESTAMP(NANOS), which DuckDB
            # reads as TIMESTAMP; Spark-written scale fixtures carry the raw
            # BIGINT nanos (nanosAsLong round trip). Apply the same
            # nanos -> micros conversion the engine does (Tables.events:
            # timestamp_micros(ts div 1000)) so oracle SQL written against
            # TIMESTAMP semantics runs identically on both layouts.
            typ = con.sql(f"SELECT typeof(ts) FROM '{p}' LIMIT 1").fetchone()[0]
            if typ == "BIGINT":
                sel = f"SELECT * REPLACE (make_timestamp(ts // 1000) AS ts) FROM '{p}'"
        con.sql(f"CREATE VIEW {t} AS {sel}")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    if only:
        names = [n.strip() for n in only.split(",") if n.strip()]
        excluded = {n[1:] for n in names if n.startswith("-")}
        included = {n for n in names if not n.startswith("-")}
        oracle = {k: v for k, v in oracle.items()
                  if (not included or k in included) and k not in excluded}
    n_pass = n_fail = 0
    for name in sorted(oracle):
        sql = oracle[name]
        try:
            want = con.sql(sql).df()
        except Exception as e:
            print(f"FAIL {name}: oracle sql error: {e}")
            n_fail += 1
            continue
        try:
            got = con.sql(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'").df()
        except Exception as e:
            print(f"FAIL {name}: spark output unreadable: {e}")
            n_fail += 1
            continue
        wc = sorted(want.columns)
        gc = sorted(got.columns)
        if wc != gc:
            print(f"FAIL {name}: columns differ spark={gc} oracle={wc}")
            n_fail += 1
            continue
        want = want[wc]
        got = got[gc]
        if len(want) != len(got):
            print(f"FAIL {name}: rows spark={len(got)} oracle={len(want)}")
            n_fail += 1
            continue
        wrows = sorted(tuple(norm(v) for v in r) for r in want.itertuples(index=False))
        grows = sorted(tuple(norm(v) for v in r) for r in got.itertuples(index=False))
        if wrows != grows:
            bad = [(g, w) for g, w in zip(grows, wrows) if g != w][:3]
            print(f"FAIL {name}: value mismatch, first diffs: {bad}")
            n_fail += 1
            continue
        print(f"PASS {name} ({len(got)} rows)")
        n_pass += 1
    # rows-only queries (no oracle)
    import glob
    import os
    for d in sorted(os.listdir(out_dir)):
        p = os.path.join(out_dir, d)
        if os.path.isdir(p) and d not in oracle:
            try:
                n = con.sql(f"SELECT count(*) FROM '{p}/*.parquet'").fetchone()[0]
                print(f"ROWS {d}: {n} rows")
            except Exception as e:
                print(f"ROWS {d}: unreadable: {e}")
    print(f"== {n_pass} pass / {n_fail} fail ==")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2],
                  sys.argv[3] if len(sys.argv) > 3 else None))
