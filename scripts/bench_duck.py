#!/usr/bin/env python3
"""Time every oracle SQL from a Verify dump in DuckDB over a testdata tier
— the baseline side of the engine-vs-DuckDB bench ratio at any tier.
Dev tool only (driver-side python). Prints per-query best-of-N seconds and
the total, as one JSON line.

Usage: bench_duck.py <sf_dir> <verify_out_dir> [reps=3] [threads=32]
"""
import json
import sys
import time

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main(sf_dir, out_dir, reps=3, threads=32):
    def fresh_con():
        con = duckdb.connect()
        con.sql(f"SET threads={threads}")
        # big-tier hygiene: bound the allocator below the box and give
        # the spill a directory, so a heavy oracle degrades to disk
        # instead of dying mid-allocation
        con.sql("SET memory_limit='80GB'")
        con.sql("SET temp_directory='/tmp/duck_spill'")
        for t in TABLES:
            con.sql(f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
        return con

    con = fresh_con()
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    best = {}
    failed = {}
    for name, sql in sorted(oracle.items()):
        for _ in range(reps):
            t0 = time.monotonic()
            try:
                con.sql(sql).fetchall()
            except Exception as e:  # record, keep benching the rest —
                # on a FRESH connection: an OOM'd one keeps failing tiny
                # allocations for every later query (observed cascade)
                failed[name] = f"{type(e).__name__}: {e}"[:200]
                print(f"[duck] FAIL {name}: {failed[name]}", file=sys.stderr)
                con.close()
                con = fresh_con()
                break
            dt = time.monotonic() - t0
            best[name] = min(best.get(name, float("inf")), dt)
        else:
            print(f"[duck] {name} {best[name]:.3f}s", file=sys.stderr)
    total = sum(best.values())
    print(json.dumps({
        "metric": "duckdb_total", "value": round(total, 3), "unit": "sec",
        "sf": sf_dir, "reps": reps, "failed": failed,
        "queries": {k: round(v, 3) for k, v in best.items()}}))


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2],
         int(sys.argv[3]) if len(sys.argv) > 3 else 3,
         int(sys.argv[4]) if len(sys.argv) > 4 else 32)
