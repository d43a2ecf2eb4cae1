#!/usr/bin/env python3
"""Time every oracle SQL from a Verify dump in DuckDB over a testdata tier
— the baseline side of the engine-vs-DuckDB bench ratio at any tier.
Dev tool only (driver-side python). Prints per-query best-of-N seconds and
the total, as one JSON line.

Each query runs in its OWN subprocess: a DuckDB out-of-memory error
poisons the whole process allocator (observed at the sf10 tier: after one
OOM even a fresh connection fails 2 KiB allocations), so in-process
failure isolation is not enough — the child dies alone and the sweep
continues.

Usage: bench_duck.py <sf_dir> <verify_out_dir> [reps=3] [threads=32] [mem=80GB] [timeout_s=900]
  mem: DuckDB memory_limit — lower it when another process (e.g. a large
  idle JVM) holds a chunk of the box.
  timeout_s: per-QUERY kill timer. The known-infeasible oracles at big
  tiers (recursive-CTE connected components, literal-replication ANN)
  grind until they fill the spill disk — tens of minutes each before
  dying on an IOException anyway; the timer bounds them and records an
  honest FAIL instead. Sized ~10x the slowest legitimate oracle.
"""
import json
import multiprocessing as mp
import os
import queue
import shutil
import sys
import time

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def run_one(sf_dir, sql, reps, threads, mem, out):
    """Child: time one oracle SQL, best of reps. Exits nonzero on error."""
    import duckdb
    con = duckdb.connect()
    con.sql(f"SET threads={threads}")
    # big-tier hygiene: bound the allocator below the box and give the
    # spill a directory, so a heavy oracle degrades to disk instead of
    # dying mid-allocation
    con.sql(f"SET memory_limit='{mem}'")
    con.sql("SET temp_directory='/tmp/duck_spill'")
    for t in TABLES:
        con.sql(f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    best = float("inf")
    try:
        # warm pass, recorded but DISCARDED from best: the first touch pays
        # parquet page-cache population + metadata, which swings the sweep
        # total up to 1.5x with host cache state (SCALE_STRESS round 16's
        # self-paired triplet). Timing only warmed reps makes duck_total
        # comparable round-over-round; the cold time still rides along.
        t0 = time.monotonic()
        con.sql(sql).fetchall()
        cold = time.monotonic() - t0
        for _ in range(reps):
            t0 = time.monotonic()
            con.sql(sql).fetchall()
            best = min(best, time.monotonic() - t0)
    except Exception as e:
        out.put(("err", f"{type(e).__name__}: {e}"[:200]))
        return
    out.put(("ok", best, cold))


def clear_spill():
    """Drop orphaned spill files between queries: a killed or crashed
    child leaves multi-GB temp storage behind, which starves every later
    query of spill headroom."""
    try:
        for f in os.listdir("/tmp/duck_spill"):
            try:
                os.unlink(os.path.join("/tmp/duck_spill", f))
            except OSError:
                pass
    except OSError:
        pass


def main(sf_dir, out_dir, reps=3, threads=32, mem="80GB", timeout_s=900):
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    best = {}
    cold = {}
    failed = {}
    ctx = mp.get_context("fork")
    for name, sql in sorted(oracle.items()):
        out = ctx.Queue()
        p = ctx.Process(target=run_one,
                        args=(sf_dir, sql, reps, threads, mem, out))
        p.start()
        p.join(timeout_s)
        timed_out = p.is_alive()
        if timed_out:
            p.terminate()
            p.join(30)
            if p.is_alive():
                p.kill()
                p.join()
            clear_spill()
        # Queue.empty() right after join() is unreliable (the feeder
        # thread may not have flushed); a bounded get() is the
        # documented-safe way to drain a possibly-present result
        try:
            res = out.get(timeout=5)
        except queue.Empty:
            res = None
        if res and res[0] == "ok":
            best[name] = res[1]
            cold[name] = res[2]
            print(f"[duck] {name} {best[name]:.3f}s (cold {cold[name]:.3f}s)",
                  file=sys.stderr)
        else:
            failed[name] = (f"timeout after {timeout_s}s" if timed_out
                            else res[1] if res else f"child died rc={p.exitcode}")
            print(f"[duck] FAIL {name}: {failed[name]}", file=sys.stderr)
            if not timed_out:
                clear_spill()
    total = sum(best.values())
    print(json.dumps({
        "metric": "duckdb_total", "value": round(total, 3), "unit": "sec",
        "sf": sf_dir, "reps": reps,
        "protocol": f"warm1-discarded+best-of-{reps}",
        "cold_total": round(sum(cold.values()), 3), "failed": failed,
        "queries": {k: round(v, 3) for k, v in best.items()}}))


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2],
         int(sys.argv[3]) if len(sys.argv) > 3 else 3,
         int(sys.argv[4]) if len(sys.argv) > 4 else 32,
         sys.argv[5] if len(sys.argv) > 5 else "80GB",
         int(sys.argv[6]) if len(sys.argv) > 6 else 900)
