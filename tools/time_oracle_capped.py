#!/usr/bin/env python3
"""Per-query DuckDB oracle timing with a hard per-query wall cap.

Same measurement as time_oracle.py but each query runs in its own
subprocess (DuckDB's Python API can't be interrupted in-process), its
time is appended to a JSONL file as soon as it finishes, and a query
that exceeds the cap is recorded as -cap (a LOWER bound, clearly
distinguishable from a real time). Use at big SFs where one
pathological oracle SQL would otherwise hold the whole suite hostage.

Usage: tools/time_oracle_capped.py <sfdir> <oracle_sql.json> <threads> <cap_s> <out.jsonl> [query ...]
"""
import sys, json, time, subprocess, os

SF, ORACLE, THREADS, CAP, OUT = (
    sys.argv[1], sys.argv[2], int(sys.argv[3]), float(sys.argv[4]), sys.argv[5])
ONLY = set(sys.argv[6:])

oracle = json.load(open(ORACLE))
names = [n for n in sorted(oracle) if not ONLY or n in ONLY]

done = {}
if os.path.exists(OUT):
    for line in open(OUT):
        r = json.loads(line)
        done[r["name"]] = r["sec"]

CHILD = r'''
import sys, json, time
import duckdb
sf, threads, sql = sys.argv[1], int(sys.argv[2]), sys.stdin.read()
con = duckdb.connect()
con.sql(f"SET threads={threads}")
for t in ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")
t0 = time.time()
con.sql(sql).fetchall()
print(json.dumps({"sec": round(time.time() - t0, 3)}))
'''

with open(OUT, "a") as out:
    for name in names:
        if name in done:
            continue
        t0 = time.time()
        try:
            p = subprocess.run(
                [sys.executable, "-c", CHILD, SF, str(THREADS)],
                input=oracle[name], capture_output=True, text=True, timeout=CAP)
            # last stdout line: anything a site hook prints first is noise
            sec = (json.loads(p.stdout.strip().splitlines()[-1])["sec"]
                   if p.returncode == 0 else -1.0)
            if p.returncode != 0:
                sys.stderr.write(f"{name} failed: {p.stderr[-300:]}\n")
        except subprocess.TimeoutExpired:
            sec = -CAP  # lower bound: killed at the cap
        out.write(json.dumps({"name": name, "sec": sec}) + "\n")
        out.flush()
        print(f"{name}: {sec}", flush=True)

rows = [json.loads(l) for l in open(OUT)]
total_known = round(sum(r["sec"] for r in rows if r["sec"] >= 0), 3)
capped = [r["name"] for r in rows if r["sec"] < -1.0]
print(json.dumps({"n": len(rows), "total_of_completed": total_known,
                  "capped": capped, "cap_s": CAP}))
