#!/usr/bin/env python3
"""Generate driver-schema-compatible synthetic testdata at an arbitrary scale factor.

The driver's tables (/root/testdata/sf*) top out at sf0.1 (~17 MB). This
generator reproduces the same schemas, key linkage, and distribution shape
(word-salad documents with ~5% injected near-duplicates, 10-cluster Gaussian
embeddings, 30-day event stream) at sf1+ so the 67-query suite and Bench can
be exercised a decade of scale beyond the shipped data. Deterministic:
seed=42. Row counts follow the driver's convention (sf0.1 matches
/root/testdata/sf0.1 exactly):

  customer 150k*sf  supplier 10k*sf  part 200k*sf  orders 1.5M*sf
  lineitem 6M*sf    events 1M*sf     documents 50k*sf  embeddings 20k*sf

Usage: python3 tools/gen_sf.py <sf> <outdir>
"""
import sys, os, json
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SF = float(sys.argv[1])
OUT = sys.argv[2]
os.makedirs(OUT, exist_ok=True)
rng = np.random.default_rng(42)

def write(name, table):
    # Splittable row groups: Spark assigns a row group to the byte-range
    # split containing its midpoint, so a single-file table with one giant
    # row group is read by ONE task no matter the cluster size. ~24 groups
    # per table keeps every local[32] scan parallel (paired with
    # spark.sql.files.maxPartitionBytes=8m in the bench harness).
    pq.write_table(table, f"{OUT}/{name}.parquet", compression="snappy",
                   row_group_size=max(2048, table.num_rows // 24))
    print(f"{name}: {table.num_rows} rows")

def n(base):  # driver count at sf0.1 was base/10
    return max(1, int(round(base * SF)))

# ---- region / nation (fixed) ----
write("region", pa.table({
    "r_regionkey": pa.array(range(5), pa.int32()),
    "r_name": ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"],
}))
write("nation", pa.table({
    "n_nationkey": pa.array(range(25), pa.int32()),
    "n_name": [f"NATION_{i}" for i in range(25)],
    "n_regionkey": pa.array([i % 5 for i in range(25)], pa.int32()),
}))

# ---- customer ----
NC = n(150_000)
segments = np.array(["AUTOMOBILE", "BUILDING", "FURNITURE", "MACHINERY", "HOUSEHOLD"])
write("customer", pa.table({
    "c_custkey": pa.array(np.arange(NC), pa.int64()),
    "c_name": [f"Customer#{i:09d}" for i in range(NC)],
    "c_nationkey": pa.array(rng.integers(0, 25, NC), pa.int32()),
    "c_acctbal": np.round(rng.uniform(-1000, 10000, NC), 2),
    "c_mktsegment": segments[rng.integers(0, 5, NC)],
}))

# ---- supplier ----
NS = n(10_000)
write("supplier", pa.table({
    "s_suppkey": pa.array(np.arange(NS), pa.int64()),
    "s_name": [f"Supplier#{i:09d}" for i in range(NS)],
    "s_nationkey": pa.array(rng.integers(0, 25, NS), pa.int32()),
    "s_acctbal": np.round(rng.uniform(0, 10000, NS), 2),
}))

# ---- part ----
NP = n(200_000)
adjs = np.array(["large", "hot", "blue", "old", "cold", "small", "red", "green", "new", "dark"])
nouns = np.array(["ring", "bolt", "plate", "screw", "wheel", "gear", "pipe", "rod", "cap", "nut"])
types = np.array(["LARGE", "ECONOMY", "SMALL", "STANDARD", "MEDIUM", "PROMO"])
write("part", pa.table({
    "p_partkey": pa.array(np.arange(NP), pa.int64()),
    "p_name": np.char.add(np.char.add(adjs[rng.integers(0, 10, NP)], " "), nouns[rng.integers(0, 10, NP)]),
    "p_brand": np.array([f"Brand#{b}" for b in rng.integers(1, 26, NP)]),
    "p_type": types[rng.integers(0, len(types), NP)],
    "p_size": pa.array(rng.integers(1, 51, NP), pa.int32()),
    "p_retailprice": np.round(900.0 + np.arange(NP) * 0.1, 1),
}))

# ---- orders (day-granular timestamps over 1995-01-01..2001-08-01) ----
NO = n(1_500_000)
DAY_MS = 86_400_000
epoch_1995 = 788_918_400_000  # 1995-01-01 UTC in ms
n_days = 2405
statuses = np.array(["F", "O", "P"])
prios = np.array(["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"])
o_date_ms = epoch_1995 + rng.integers(0, n_days, NO) * DAY_MS
write("orders", pa.table({
    "o_orderkey": pa.array(np.arange(NO), pa.int64()),
    "o_custkey": pa.array(rng.integers(0, NC, NO), pa.int64()),
    "o_orderstatus": statuses[rng.integers(0, 3, NO)],
    "o_totalprice": np.round(rng.uniform(1000, 500000, NO), 2),
    "o_orderdate": pa.array(o_date_ms, pa.timestamp("ms")),
    "o_orderpriority": prios[rng.integers(0, 5, NO)],
}))

# ---- lineitem (orderkeys drawn uniformly from orders; written in chunks) ----
NL = n(6_000_000)
rflags = np.array(["A", "N", "R"])
lstat = np.array(["F", "O"])
li_schema = pa.schema([
    ("l_orderkey", pa.int64()), ("l_partkey", pa.int64()), ("l_suppkey", pa.int64()),
    ("l_linenumber", pa.int32()), ("l_quantity", pa.float64()),
    ("l_extendedprice", pa.float64()), ("l_discount", pa.float64()), ("l_tax", pa.float64()),
    ("l_returnflag", pa.string()), ("l_linestatus", pa.string()),
    ("l_shipdate", pa.timestamp("ms")),
])
writer = pq.ParquetWriter(f"{OUT}/lineitem.parquet", li_schema, compression="snappy")
CHUNK = 2_000_000
done = 0
while done < NL:
    c = min(CHUNK, NL - done)
    qty = rng.integers(1, 51, c).astype(np.float64)
    writer.write_table(row_group_size=250_000, table=pa.table({
        "l_orderkey": pa.array(rng.integers(0, NO, c), pa.int64()),
        "l_partkey": pa.array(rng.integers(0, NP, c), pa.int64()),
        "l_suppkey": pa.array(rng.integers(0, NS, c), pa.int64()),
        "l_linenumber": pa.array(rng.integers(1, 8, c), pa.int32()),
        "l_quantity": qty,
        "l_extendedprice": np.round(qty * rng.uniform(900, 2100, c), 2),
        "l_discount": np.round(rng.integers(0, 11, c) * 0.01, 2),
        "l_tax": np.round(rng.integers(0, 9, c) * 0.01, 2),
        "l_returnflag": rflags[rng.integers(0, 3, c)],
        "l_linestatus": lstat[rng.integers(0, 2, c)],
        "l_shipdate": pa.array(epoch_1995 + DAY_MS + rng.integers(0, n_days + 94, c) * DAY_MS,
                               pa.timestamp("ms")),
    }, schema=li_schema))
    done += c
writer.close()
print(f"lineitem: {NL} rows")

# ---- events (us timestamps matching the driver's pandas-written encoding,
# 30 days of 2024-01, sorted by ts; the ns-encoding read path is pinned by
# EventsTsEncodingSpec instead so builder bench data and driver gate data
# can't silently diverge again) ----
NE = n(1_000_000)
NU = n(1_500)
etypes = np.array(["click", "error", "purchase", "signup", "view"])
t0 = 1_704_067_200_000_000  # 2024-01-01 UTC us
span = 30 * 86_400 * 1_000_000
ts = np.sort(t0 + rng.integers(0, span, NE))
write("events", pa.table({
    "event_id": pa.array(np.arange(NE), pa.int64()),
    "ts": pa.array(ts, pa.timestamp("us")),
    "user_id": pa.array(rng.integers(0, NU, NE), pa.int64()),
    "event_type": etypes[rng.integers(0, 5, NE)],
    "value": np.round(rng.lognormal(3.0, 1.2, NE), 2),
    "props": [json.dumps({"k": int(k)}) for k in rng.integers(0, 100, NE)],
}))

# ---- documents (Zipfian word salad + ~4.5% near-dup mutated copies + ~0.2% exact) ----
# Vocabulary grows with the corpus (Heaps' law, V ~ 30 + 14*sqrt(ND)) and word
# frequencies are Zipf-Mandelbrot (1/(rank+2.7)^1.07). A fixed 30-word vocab
# saturates every 3-shingle's document frequency by sf10 (q35's df-64 cap then
# excludes ALL shingles => 0 candidate pairs in both engines) and makes simhash
# pair counts grow quadratically with corpus density. Scaling the vocab keeps
# shingle df, minhash band occupancy, and simhash density realistic across
# scale decades, so q34-q37/q45 measure real work at sf10+.
ND = n(50_000)
CORE = ("batch part spark line column order small sort fast value scan a hash slow "
        "query agg table stream filter big merge group the join vector key customer "
        "window data row").split()
V = int(30 + 14 * np.sqrt(ND))
vocab = np.array(CORE + [f"w{i:05d}" for i in range(V - len(CORE))])
ranks = np.arange(1, V + 1, dtype=np.float64)
zipf_p = 1.0 / (ranks + 2.7) ** 1.07
zipf_p /= zipf_p.sum()
langs = np.array(["en", "de", "es", "fr", "zh"])
lang_p = np.array([0.41, 0.1475, 0.1475, 0.1475, 0.1475])
doc_schema = pa.schema([
    ("doc_id", pa.int64()), ("text", pa.string()), ("lang", pa.string()),
    ("source", pa.string()), ("n_chars", pa.int64()),
])
dwriter = pq.ParquetWriter(f"{OUT}/documents.parquet", doc_schema, compression="snappy")
from collections import deque
recent = deque(maxlen=2000)  # dup sources: last 2000 texts, crossing chunk bounds
DCHUNK = 200_000
dwritten = 0
while dwritten < ND:
    c = min(DCHUNK, ND - dwritten)
    nw = rng.integers(10, 101, c)
    offs = np.concatenate(([0], np.cumsum(nw)))
    wordpool = vocab[rng.choice(V, int(offs[-1]), p=zipf_p)]
    texts = [" ".join(wordpool[offs[k]:offs[k + 1]]) for k in range(c)]
    r = rng.random(c)
    for k in range(c):
        i = dwritten + k
        if i > 100 and r[k] < 0.045:  # near-dup: copy a recent doc, mutate a few tail words
            words = recent[-int(rng.integers(1, min(2000, i) + 1))].split()
            for _ in range(int(rng.integers(1, 4))):
                words[int(rng.integers(len(words) // 2, len(words)))] = str(vocab[rng.integers(V)])
            texts[k] = " ".join(words)
        elif i > 100 and r[k] < 0.047:  # exact dup
            texts[k] = recent[-int(rng.integers(1, min(2000, i) + 1))]
        recent.append(texts[k])
    dwriter.write_table(row_group_size=max(2048, ND // 24), table=pa.table({
        "doc_id": pa.array(np.arange(dwritten, dwritten + c), pa.int64()),
        "text": texts,
        "lang": langs[rng.choice(5, c, p=lang_p)],
        "source": np.array([f"src{s}" for s in rng.integers(0, 20, c)]),
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    }, schema=doc_schema))
    dwritten += c
dwriter.close()
print(f"documents: {ND} rows (vocab={V})")

# ---- embeddings (10 Gaussian clusters in 64-dim) ----
NV = n(20_000)
DIM = 64
centroids = rng.normal(0, 0.5, (10, DIM))
labels = rng.integers(0, 10, NV)
vecs = (centroids[labels] + rng.normal(0, 0.15, (NV, DIM))).astype(np.float32)
# inject near-dup vector pairs (~2%): copy an earlier vector + tiny noise
ndup = NV // 50
dup_dst = rng.choice(np.arange(NV // 2, NV), ndup, replace=False)
dup_src = rng.integers(0, NV // 2, ndup)
vecs[dup_dst] = vecs[dup_src] + rng.normal(0, 0.005, (ndup, DIM)).astype(np.float32)
labels[dup_dst] = labels[dup_src]
write("embeddings", pa.table({
    "vec_id": pa.array(np.arange(NV), pa.int64()),
    "embedding": pa.array([v for v in vecs], pa.list_(pa.float32())),
    "label": pa.array(labels, pa.int32()),
}))
print("done")
