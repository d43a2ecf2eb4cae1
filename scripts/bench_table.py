#!/usr/bin/env python3
"""Join an engine BENCH_LOCAL.json with a bench_duck.py JSON line into the
SCALE_STRESS markdown table (gate | engine s | task_sec | duck s | ratio),
sorted by ratio descending. Dev tool only (driver-side python).

Usage: bench_table.py <BENCH_LOCAL.json> <duck_log_or_json> [min_wall=0.0]
"""
import json
import sys


def main(bench_path, duck_path, min_wall=0.0):
    b = json.load(open(bench_path))
    duck_line = None
    for line in open(duck_path):
        if line.startswith("{") and "duckdb_total" in line:
            duck_line = json.loads(line)
    if duck_line is None:
        sys.exit("no duckdb_total line found")
    d = duck_line["queries"]
    rows = []
    for name, es in b["queries"].items():
        ds = d.get(name)
        pm = b.get("plan_metrics", {}).get(name, {})
        if ds is None or es < min_wall:
            continue
        rows.append((name, es, pm.get("task_sec"), ds, es / ds if ds > 0 else None))
    rows.sort(key=lambda r: -(r[4] or 0))
    print("| gate | engine s | engine task_sec | duck s | ratio |")
    print("|---|---|---|---|---|")
    for name, es, ts, ds, ratio in rows:
        ts_s = f"{ts:.1f}" if ts is not None else "-"
        ratio_s = f"{ratio:.2f}x" if ratio is not None else "-"
        print(f"| {name} | {es:.3f} | {ts_s} | {ds:.3f} | {ratio_s} |")
    et = sum(r[1] for r in rows)
    dt = sum(r[3] for r in rows)
    ratio_t = f"{et / dt:.2f}x" if dt > 0 else "-"
    print(f"\ntotals over {len(rows)} shared gates: engine {et:.1f} s, "
          f"duck {dt:.1f} s, ratio {ratio_t}")
    if duck_line.get("failed"):
        print("duck-infeasible/failed:", ", ".join(sorted(duck_line["failed"])))


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2],
         float(sys.argv[3]) if len(sys.argv) > 3 else 0.0)
