#!/usr/bin/env python3
"""Measure the DuckDB baseline: run each oracle SQL on the given sf dir,
one warmup + one timed run (fetchall = full materialisation), print JSON.
Usage: scripts/baseline.py [sfdir] [oracle_sql.json path]"""
import json, sys, time
import duckdb

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
ORACLE = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_all/oracle_sql.json"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

con = duckdb.connect()
for t in TABLES:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")

oracle = json.load(open(ORACLE))
out = {}
for name in sorted(oracle):
    sql = oracle[name]
    try:
        con.execute(sql).fetchall()          # warmup
        t0 = time.time()
        con.execute(sql).fetchall()          # timed
        out[name] = round(time.time() - t0, 4)
    except Exception as e:
        out[name] = -1.0
        print(f"# {name} failed: {e}", file=sys.stderr)
print(json.dumps({"metric": "duckdb_total_warm_sec",
                  "value": round(sum(v for v in out.values() if v >= 0), 3),
                  "queries": out, "sf": SF}))
