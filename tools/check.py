#!/usr/bin/env python3
"""Local mirror of the driver's t2 correctness gate.

Usage: tools/check.py [sfdir] [outdir] [query-name ...]

Reads each SparkEntry result parquet from <outdir>/<name>/, runs the
matching oracle SQL from <outdir>/oracle_sql.json in DuckDB over the
same testdata parquets, and compares (schema, row count, sorted values).
Floats compared exactly AND with tolerance — exact mismatches are flagged
as hash-risk even when tolerance passes.
"""
import sys, os, json, glob, math
import duckdb

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
ONLY = set(sys.argv[3:])

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

con = duckdb.connect()
for t in TABLES:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")

oracle = json.load(open(f"{OUT}/oracle_sql.json"))
try:
    verify_errors = json.load(open(f"{OUT}/verify_errors.json"))
except Exception:
    verify_errors = {}

def norm(v):
    if isinstance(v, float):
        return v
    if hasattr(v, "timestamp"):  # datetime
        return v.isoformat()
    if isinstance(v, (bytes, bytearray)):
        return v.hex()
    return v

def key(row):
    return tuple((str(type(v)), str(v)) for v in row)

fails, risks, passes = [], [], []
names = sorted(oracle) if not ONLY else sorted(n for n in oracle if n in ONLY)
for name in names:
    resdir = f"{OUT}/{name}"
    if not glob.glob(f"{resdir}/*.parquet"):
        fails.append((name, "spark err: " + verify_errors.get(name, "result missing (no recorded error)")))
        continue
    try:
        spark_rel = con.sql(f"SELECT * FROM read_parquet('{resdir}/*.parquet')")
        spark_cols = list(spark_rel.columns)
        duck_rel = con.sql(oracle[name])
        duck_cols = list(duck_rel.columns)
        if sorted(spark_cols) != sorted(duck_cols):
            fails.append((name, f"columns differ: spark={sorted(spark_cols)} duck={sorted(duck_cols)}"))
            continue
        order = sorted(spark_cols)
        # The driver's compare hashes TYPED values — a HUGEINT column with
        # the same numbers as a BIGINT one hash-mismatches. Compare result
        # types per column so local green predicts driver green.
        s_types = dict(zip(spark_rel.columns, (str(t) for t in spark_rel.types)))
        d_types = dict(zip(duck_rel.columns, (str(t) for t in duck_rel.types)))
        bad_types = [(c, s_types[c], d_types[c]) for c in order
                     if s_types[c] != d_types[c]]
        if bad_types:
            c, st, dt = bad_types[0]
            fails.append((name, f"result type mismatch on {c}: spark={st} duck={dt}"
                                f" ({len(bad_types)} col(s) — driver hash would differ)"))
            continue
        s_rows = [tuple(norm(v) for v in r) for r in
                  spark_rel.project(", ".join(f'"{c}"' for c in order)).fetchall()]
        d_rows = [tuple(norm(v) for v in r) for r in
                  duck_rel.project(", ".join(f'"{c}"' for c in order)).fetchall()]
        if len(s_rows) != len(d_rows):
            fails.append((name, f"row count: spark={len(s_rows)} duck={len(d_rows)}"))
            continue
        s_rows.sort(key=key); d_rows.sort(key=key)
        exact = s_rows == d_rows
        ok_tol, first_bad = True, None
        for i, (sr, dr) in enumerate(zip(s_rows, d_rows)):
            for j, (a, b) in enumerate(zip(sr, dr)):
                if a == b:
                    continue
                if isinstance(a, float) and isinstance(b, float):
                    if math.isclose(a, b, rel_tol=1e-9, abs_tol=1e-9):
                        continue
                ok_tol = False
                first_bad = (i, order[j], a, b)
                break
            if not ok_tol:
                break
        if exact:
            passes.append((name, len(s_rows)))
        elif ok_tol:
            diffs = sum(1 for sr, dr in zip(s_rows, d_rows) if sr != dr)
            risks.append((name, f"{diffs}/{len(s_rows)} rows differ only in float ulps (HASH RISK)"))
        else:
            fails.append((name, f"value mismatch at row {first_bad[0]} col {first_bad[1]}: spark={first_bad[2]!r} duck={first_bad[3]!r}"))
    except Exception as e:
        fails.append((name, f"oracle error: {e}"))

for n, r in passes:
    print(f"PASS  {n} ({r} rows)")
for n, m in risks:
    print(f"RISK  {n}: {m}")
for n, m in fails:
    print(f"FAIL  {n}: {m}")
missing_oracle = set()
print(f"\n{len(passes)} pass, {len(risks)} risk, {len(fails)} fail, {len(names)} total oracle-checked")
sys.exit(1 if fails or risks else 0)
