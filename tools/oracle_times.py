#!/usr/bin/env python3
"""Dev tooling: DuckDB 32-thread oracle timings (min of 2 runs) of a
Verify dump's oracle_sql.json against an sf dir. Writes JSON to stdout.

Usage: python3 tools/oracle_times.py /root/testdata/sf0.1 /tmp/v_full/oracle_sql.json > /tmp/oracle_times.json
"""
import duckdb, json, sys, time

sf_dir, oracle_path = sys.argv[1], sys.argv[2]
con = duckdb.connect()
con.execute("SET threads TO 32")
for t in "region nation customer supplier part orders lineitem events documents embeddings".split():
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
oracle = json.load(open(oracle_path))
out = {}
for name, sql in oracle.items():
    best = None
    for _ in range(2):
        t0 = time.time(); con.execute(sql).fetchall(); dt = time.time() - t0
        best = dt if best is None else min(best, dt)
    out[name] = round(best, 4)
print(json.dumps(out))
