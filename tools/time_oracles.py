#!/usr/bin/env python3
"""Time the DuckDB oracle SQL of the benchmarked queries on the same
parquet tables — the DuckDB side of the Spark/DuckDB full-bench ratio
quoted in SCALING.md's closing evidence.

Usage: python3 tools/time_oracles.py <sfDir> <oracleJson> <benchJson> [out]

`benchJson` is a graft.Bench output line ({"queries": {name: sec}}):
only the queries present there AND carrying an oracle are timed, so the
two totals cover the identical matching set. Threads = 32 to mirror
local[32].
"""
import json
import sys
import time

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main(sf_dir, oracle_json, bench_json, out=None):
    import os
    con = duckdb.connect()
    con.sql("SET threads TO 32")
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(p):
            p = f"{p}/*.parquet"
        sel = f"SELECT * FROM '{p}'"
        if t == "events":
            typ = con.sql(f"SELECT typeof(ts) FROM '{p}' LIMIT 1").fetchone()[0]
            if typ == "BIGINT":
                sel = f"SELECT * REPLACE (make_timestamp(ts // 1000) AS ts) FROM '{p}'"
        con.sql(f"CREATE VIEW {t} AS {sel}")
    oracle = json.load(open(oracle_json))
    bench = json.load(open(bench_json))["queries"]
    times = {}
    for name in sorted(bench):
        if name not in oracle:
            print(f"SKIP {name}: no oracle (rows-only query)")
            continue
        t0 = time.time()
        con.sql(oracle[name]).fetchall()
        times[name] = time.time() - t0
        print(f"{name}: {times[name]:.2f}s")
    spark_total = sum(v for k, v in bench.items() if k in times)
    duck_total = sum(times.values())
    print(f"== matching set: {len(times)} queries; "
          f"spark {spark_total:.1f}s vs duckdb {duck_total:.1f}s = "
          f"{spark_total / duck_total:.2f}x ==")
    if out:
        json.dump(times, open(out, "w"))


if __name__ == "__main__":
    main(*sys.argv[1:])
