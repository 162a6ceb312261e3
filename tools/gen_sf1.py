#!/usr/bin/env python3
"""Generate a LOCAL sf1 dataset (10x sf0.1) for the scaling spot-bench.

The driver only ships sf{0.001,0.01,0.1}; this builds a third-decade
dataset at /tmp/graft_sf1 so the derived parameters (LSH band widths,
hot-band caps, histogram sizes) can be timed one decade further up.

Construction (seed fixed, fully reproducible):
  - Relational tables (customer/orders/lineitem/part/supplier/events):
    10 key-offset shards of sf0.1 - each shard is an independent copy,
    so join selectivities, value distributions and skew are EXACTLY
    the sf0.1 ones at 10x the rows. nation/region stay fixed-size.
  - documents: regenerated word-bag text (50k docs) by resampling the
    sf0.1 empirical (lang, source, word-count) rows and drawing words
    from the empirical word frequency - shard-copying text verbatim
    would manufacture 10x exact-dup clusters and corrupt the dedup
    benchmarks' candidate-pair counts. The sf0.1 exact-dup rate
    (~0.16%) is re-injected explicitly.
  - embeddings: 20k vectors drawn from per-(label, dim) gaussians
    fitted on sf0.1, ids aligned to the documents shard offsets
    (vec_id k of shard c = c*5000 + k, matching vec_id==doc_id).

This is NOT the driver's seed-42 data; timings against it measure
SCALING, not absolute parity with BENCH_r* numbers.
"""
import os
import sys

import duckdb
import numpy as np

SRC = "/root/testdata/sf0.1"
DST = sys.argv[1] if len(sys.argv) > 1 else "/tmp/graft_sf1"
COPIES = 10
SEED = 4242

os.makedirs(DST, exist_ok=True)
con = duckdb.connect()
con.execute(f"SET threads TO {os.cpu_count()}")


def shard(table, key_offsets, n=COPIES):
    """10 key-offset shards of an sf0.1 table."""
    cols = [r[0] for r in con.execute(
        f"DESCRIBE SELECT * FROM '{SRC}/{table}.parquet'").fetchall()]
    sel = ", ".join(
        f"{c} + c * {key_offsets[c]} AS {c}" if c in key_offsets else c
        for c in cols)
    con.execute(
        f"COPY (SELECT {sel} FROM '{SRC}/{table}.parquet', "
        f"range({n}) t(c) ORDER BY c) TO '{DST}/{table}.parquet' "
        f"(FORMAT PARQUET, COMPRESSION SNAPPY)")
    print(table, con.execute(
        f"SELECT count(*) FROM '{DST}/{table}.parquet'").fetchone()[0])


for t in ("nation", "region"):
    con.execute(f"COPY (SELECT * FROM '{SRC}/{t}.parquet') "
                f"TO '{DST}/{t}.parquet' (FORMAT PARQUET)")
shard("customer", {"c_custkey": 15000})
shard("orders", {"o_orderkey": 150000, "o_custkey": 15000})
shard("lineitem", {"l_orderkey": 150000, "l_partkey": 20000,
                   "l_suppkey": 1000})
shard("part", {"p_partkey": 20000})
shard("supplier", {"s_suppkey": 1000})
shard("events", {"event_id": 100000, "user_id": 1500})

# ---- documents: fresh word-bag text at 10x ----
rng = np.random.default_rng(SEED)
rows = con.execute(
    f"SELECT doc_id, text, lang, source FROM '{SRC}/documents.parquet' "
    "ORDER BY doc_id").fetchall()
words = []
counts = []
meta = []
for _, text, lang, source in rows:
    ws = text.split()
    words.extend(ws)
    counts.append(len(ws))
    meta.append((lang, source))
vocab, freq = np.unique(np.array(words), return_counts=True)
p = freq / freq.sum()
n_docs = len(rows) * COPIES
pick = rng.integers(0, len(rows), size=n_docs)  # resample (lang,src,len)
texts = []
for i in range(n_docs):
    k = counts[pick[i]]
    texts.append(" ".join(rng.choice(vocab, size=k, p=p)))
# re-inject the sf0.1 exact-dup rate
n_src = len(rows)
n_dup = int(round(n_docs * (1 - con.execute(
    f"SELECT count(DISTINCT text)::DOUBLE / count(*) "
    f"FROM '{SRC}/documents.parquet'").fetchone()[0])))
for j in rng.choice(n_docs, size=n_dup, replace=False):
    texts[j] = texts[int(rng.integers(0, n_docs))]
doc_ids = np.arange(n_docs, dtype=np.int64)
langs = [meta[pick[i]][0] for i in range(n_docs)]
sources = [meta[pick[i]][1] for i in range(n_docs)]
n_chars = np.array([len(t) for t in texts], dtype=np.int64)
import pyarrow as pa
import pyarrow.parquet as pq
pq.write_table(pa.table({
    "doc_id": doc_ids, "text": texts, "lang": langs,
    "source": sources, "n_chars": n_chars}),
    f"{DST}/documents.parquet", compression="snappy")
print("documents", n_docs)

# ---- embeddings: per-(label, dim) gaussians fitted on sf0.1 ----
emb = con.execute(
    f"SELECT label, embedding FROM '{SRC}/embeddings.parquet' "
    "ORDER BY vec_id").fetchall()
by_label = {}
for label, vec in emb:
    by_label.setdefault(label, []).append(vec)
stats = {l: (np.mean(v, axis=0), np.std(v, axis=0) + 1e-6)
         for l, v in ((l, np.array(v)) for l, v in by_label.items())}
labels_src = np.array([e[0] for e in emb])
n_vec_src = len(emb)
vec_ids = []
labels_out = []
vecs_out = []
for c in range(COPIES):
    lab = rng.choice(labels_src, size=n_vec_src)
    for k in range(n_vec_src):
        mu, sd = stats[int(lab[k])]
        vecs_out.append((mu + rng.standard_normal(mu.shape) * sd)
                        .astype(np.float32))
    vec_ids.extend((c * len(rows) + np.arange(n_vec_src)).tolist())
    labels_out.extend(int(x) for x in lab)
pq.write_table(pa.table({
    "vec_id": pa.array(vec_ids, type=pa.int64()),
    "embedding": pa.array([v.tolist() for v in vecs_out],
                          type=pa.list_(pa.float32())),
    "label": pa.array(labels_out, type=pa.int32())}),
    f"{DST}/embeddings.parquet", compression="snappy")
print("embeddings", len(vec_ids))
print("done ->", DST)
