#!/usr/bin/env python3
"""Per-query DuckDB oracle timing with a hard per-query wall cap.

Same measurement as time_oracle.py but each query runs in its own
subprocess (DuckDB's Python API can't be interrupted in-process) and its
time is appended to a JSONL file as soon as it finishes. Fairness vs the
warmed Spark bench: the CHILD warms every table the SQL references with a
data-touching `sum(hash(t))` pass BEFORE the timed region (count(*)-style
warms answer from parquet metadata and leave the first timed scan paying
cold-read I/O), and the parent's cap timer starts only after the child
reports READY, so import/view/warm setup never eats into the cap.

Each JSONL row carries an explicit status:
  ok      -> sec is the measured time
  capped  -> sec == cap (a LOWER bound; the child was killed)
  failed  -> sec is null; the name is listed in the summary

Usage: tools/time_oracle_capped.py <sfdir> <oracle_sql.json> <threads> <cap_s> <out.jsonl> [query ...]
"""
import sys, json, time, subprocess, os

SF, ORACLE, THREADS, CAP, OUT = (
    sys.argv[1], sys.argv[2], int(sys.argv[3]), float(sys.argv[4]), sys.argv[5])
ONLY = set(sys.argv[6:])

oracle = json.load(open(ORACLE))
names = [n for n in sorted(oracle) if not ONLY or n in ONLY]

done = set()
if os.path.exists(OUT):
    for line in open(OUT):
        done.add(json.loads(line)["name"])

CHILD = r'''
import sys, json, time, re
import duckdb
sf, threads, sql = sys.argv[1], int(sys.argv[2]), sys.stdin.read()
con = duckdb.connect()
con.sql(f"SET threads={threads}")
tables = ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]
for t in tables:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")
# warm pass OUTSIDE the timed region: touch the data pages (not just parquet
# metadata) of every table the query references, so the timed run measures
# compute, not cold I/O
for t in tables:
    if re.search(rf"\b{t}\b", sql):
        con.sql(f"SELECT sum(hash(t)) FROM {t} t").fetchall()
print("READY", flush=True)
t0 = time.time()
con.sql(sql).fetchall()
print(json.dumps({"sec": round(time.time() - t0, 3)}), flush=True)
'''

with open(OUT, "a") as out:
    for name in names:
        if name in done:
            continue
        p = subprocess.Popen(
            [sys.executable, "-c", CHILD, SF, str(THREADS)],
            stdin=subprocess.PIPE, stdout=subprocess.PIPE,
            stderr=subprocess.PIPE, text=True)
        p.stdin.write(oracle[name])
        p.stdin.close()
        p.stdin = None  # communicate() would flush the closed handle and throw
        # setup + warm runs uncapped; the cap clock starts at READY
        ready = p.stdout.readline().strip()
        status, sec = "ok", None
        if ready != "READY":
            p.wait()
            status = "failed"
            sys.stderr.write(f"{name} failed in setup: {p.stderr.read()[-300:]}\n")
        else:
            try:
                rest, err = p.communicate(timeout=CAP)
                if p.returncode == 0:
                    sec = json.loads(rest.strip().splitlines()[-1])["sec"]
                else:
                    status = "failed"
                    sys.stderr.write(f"{name} failed: {err[-300:]}\n")
            except subprocess.TimeoutExpired:
                p.kill()
                p.communicate()
                status, sec = "capped", CAP
        out.write(json.dumps({"name": name, "status": status, "sec": sec}) + "\n")
        out.flush()
        print(f"{name}: {status} {sec}", flush=True)

def norm(r):
    # tolerate pre-round-8 rows that encoded status in the sign of sec
    if "status" in r:
        return r
    s = r["sec"]
    if s >= 0:
        return {"name": r["name"], "status": "ok", "sec": s}
    if s == -1.0:
        return {"name": r["name"], "status": "failed", "sec": None}
    return {"name": r["name"], "status": "capped", "sec": -s}

rows = [norm(json.loads(l)) for l in open(OUT)]
print(json.dumps({
    "n": len(rows),
    "total_of_completed": round(sum(r["sec"] for r in rows if r["status"] == "ok"), 3),
    "capped": [r["name"] for r in rows if r["status"] == "capped"],
    "failed": [r["name"] for r in rows if r["status"] == "failed"],
    "cap_s": CAP,
}))
