#!/usr/bin/env python3
"""Render the BASELINE.md per-query table from a Bench detail artifact and
a scripts/baseline.py DuckDB run, so doc and artifacts cannot drift.
Usage: baseline_table.py [BENCH_DETAIL.json] [duckdb.json] [FLOOR.json]"""
import json
import os
import sys

detail = json.load(open(sys.argv[1] if len(sys.argv) > 1 else "BENCH_DETAIL.json"))
duck = json.load(open(sys.argv[2] if len(sys.argv) > 2 else "/tmp/duckdb.json"))
floor_path = sys.argv[3] if len(sys.argv) > 3 else "FLOOR.json"
floor = json.load(open(floor_path)) if os.path.exists(floor_path) else None

dq = duck["queries"]
print("| query | spark | duckdb | ratio |")
print("|---|---|---|---|")
spark_total = 0.0        # every benched query (the headline number)
spark_paired = 0.0       # only queries with a DuckDB result — the ratio
duck_total = 0.0         # compares IDENTICAL query sets, never mismatched
for name, row in sorted(detail["queries"].items()):
    s = row["median_sec"]
    spark_total += s
    d = dq.get(name)
    if d is None or d < 0:
        print(f"| {name} | {s:.2f} | — | — |")
    else:
        spark_paired += s
        duck_total += d
        print(f"| {name} | {s:.2f} | {d:.3f} | {s / d:.1f}× |")
print()
if duck_total > 0:
    print(f"# spark_total={spark_total:.1f}s (all queries); paired subset "
          f"spark={spark_paired:.1f}s duckdb={duck_total:.1f}s "
          f"overall={spark_paired / duck_total:.1f}x")
else:
    print(f"# spark_total={spark_total:.1f}s; no DuckDB results to compare")
heavy = [(n, r["median_sec"], dq[n]) for n, r in detail["queries"].items()
         if dq.get(n, -1) >= 0.05]
if heavy:
    hs = sum(s for _, s, _ in heavy)
    hd = sum(d for _, _, d in heavy)
    print(f"# heavy(duckdb>=50ms): n={len(heavy)} spark={hs:.1f}s duckdb={hd:.1f}s "
          f"ratio={hs / hd:.1f}x")
    wins = sorted((n, s / d) for n, s, d in heavy if s / d < 1.3)
    print(f"# wins/near-wins (<1.3x): {wins}")
if heavy and floor and any(
        floor[k]["median_sec"] < 0
        for k in ("floor_batch", "floor_scan", "floor_stream")):
    # a failed floor measurement writes median_sec -1.0; refusing beats
    # silently inflating every query by |floor| in the adjusted ratio
    print("# FLOOR.json contains a failed measurement (median -1.0) — "
          "floor-adjusted ratios withheld")
elif heavy and floor:
    # Floor-adjusted MARGINAL ratio: subtract the measured same-session
    # per-query batch floor (FLOOR.json) from every Spark median — the
    # fixed job-submit/schedule/codegen cost a 1000-executor run pays
    # once per query regardless of data volume. DuckDB's floor is
    # microseconds, so no adjustment on its side. The streaming floor is
    # larger still and applies only to the readStream-driven queries;
    # subtracting the (smaller) batch floor everywhere is therefore the
    # CONSERVATIVE adjustment — the true marginal ratio is lower.
    fb = floor["floor_batch"]["median_sec"]
    fc = floor["floor_scan"]["median_sec"]
    fs = floor["floor_stream"]["median_sec"]
    hs_adj = sum(max(0.0, s - fc) for _, s, _ in heavy)
    hd = sum(d for _, _, d in heavy)
    print(f"# floor(no-scan)={fb:.3f}s floor(min-scan)={fc:.3f}s "
          f"floor(stream)={fs:.3f}s per query "
          f"(measured, {floor['timed_runs']} runs, same session)")
    print(f"# heavy floor-adjusted marginal: spark={hs_adj:.1f}s "
          f"duckdb={hd:.1f}s ratio={hs_adj / hd:.1f}x "
          f"(min-scan floor subtracted per query; streaming queries pay "
          f"the larger stream floor, so this adjustment is conservative)")
