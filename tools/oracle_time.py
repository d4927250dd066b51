#!/usr/bin/env python3
"""Time every DuckDB oracle for the 2x-proxy decomposition in PERF.md.

Usage: python3 tools/oracle_time.py [sfDir] [oracle_sql.json] [runs]

Reads the oracle map a prior `graft.Verify` run dumped (driver_sim leaves
one at <outDir>/oracle_sql.json), creates views over the sf directory's
parquet tables, runs each oracle `runs` times single-threaded, and prints
per-query best-of-N seconds plus the total. Pair the numbers with a
`graft.Bench` capture from the same host to decompose the suite-level
ratio into batch-relational core vs the documented fixed floors
(streaming micro-batch machinery, in-query ML fits) that DuckDB's batch
replays do not pay.
"""
import json
import sys
import time

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main():
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    sql_path = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out/oracle_sql.json"
    runs = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    sql = json.load(open(sql_path))
    times = {}
    for name, q in sorted(sql.items()):
        con = duckdb.connect()
        # same spill config as driver_sim: the election-unrolling
        # oracles need larger-than-memory window state at big replicas
        import pathlib
        pathlib.Path("/tmp/duckdb_spill").mkdir(exist_ok=True)
        con.execute("SET temp_directory='/tmp/duckdb_spill'")
        con.execute("SET memory_limit='48GB'")
        for t in TABLES:
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
        best = None
        err = None
        for _ in range(runs):
            t0 = time.time()
            try:
                con.execute(q).fetchall()
            except Exception as e:  # noqa: BLE001 - record, keep timing others
                err = str(e).splitlines()[0]
                break
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        con.close()
        if err is not None:
            print(f"  FAIL {name}: {err}")
        else:
            times[name] = round(best, 3)
            print(f"  {times[name]:8.3f}  {name}")
    print(json.dumps({"sf": sf, "runs": runs,
                      "total": round(sum(times.values()), 2),
                      "queries": times}))


if __name__ == "__main__":
    main()
