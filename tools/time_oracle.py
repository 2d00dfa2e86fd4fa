#!/usr/bin/env python3
"""Time the DuckDB oracle suite (the same 67 SQLs Verify dumps) at a
given scale dir — the comparison side of the Bench scaling story.

Usage: tools/time_oracle.py [sfdir] [oracle_sql.json] [threads]
Prints one JSON line: {"queries":{...},"sf":...,"n_queries":N,
"metric":"duckdb_total","value":sec,"unit":"sec"}.
"""
import sys, json, time
import duckdb

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
ORACLE = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out/oracle_sql.json"
THREADS = int(sys.argv[3]) if len(sys.argv) > 3 else 32

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

con = duckdb.connect()
con.sql(f"SET threads={THREADS}")
for t in TABLES:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")
oracle = json.load(open(ORACLE))

# warm the OS page cache so both engines are measured warm. hash(row)
# forces every column's data pages through decompression — a plain
# count(*) is answered from parquet row-group metadata and leaves the
# first timed queries paying cold-read I/O.
for t in TABLES:
    con.sql(f"SELECT sum(hash(t)) FROM {t} t").fetchall()

results = {}
for name in sorted(oracle):
    t0 = time.time()
    try:
        con.sql(oracle[name]).fetchall()
        results[name] = round(time.time() - t0, 3)
    except Exception as e:
        sys.stderr.write(f"{name} failed: {e}\n")
        results[name] = -1.0
qs = ",".join(f'"{k}":{v}' for k, v in results.items())
total = round(sum(v for v in results.values() if v >= 0), 3)
print(f'{{"queries":{{{qs}}},"sf":"{SF}","n_queries":{len(results)},'
      f'"metric":"duckdb_total","value":{total},"unit":"sec"}}')
