#!/usr/bin/env python3
"""Deterministic 10x scale-up of an sf directory (r8 VERDICT #4).

/root/testdata tops out at sf0.1, so the bench's superlinearity
detector only ever saw a 10x step at toy absolute sizes. This script
builds a ~sf1 corpus locally (default target/sf1, ~6M lineitem rows)
by replicating every sf0.1 table 10x with SHIFTED KEYS, so the engine
can be measured on a second, larger 10x step. No RNG anywhere - a
rerun produces byte-identical data.

Replica construction (k = 0..9, k=0 is the identity):
- region/nation stay fixed (dimension tables, as in TPC-H).
- every other table shifts its keys by k * stride(key), where stride
  is the power of ten above the base max - replica key spaces are
  disjoint and FK relationships (orders->customer, lineitem->orders/
  part/supplier, events.user_id) stay consistent within a replica.
- timestamps are NOT shifted: replicas share the time range, i.e. the
  scaled corpus models 10x the traffic over the same period. Per-user
  spans (q36's grid) stay constant; per-hour groups get 10x denser.
- documents: replica k suffixes every word with a separator char (one
  provably absent from the base vocabulary) plus the replica id
  (word -> word<sep>k). The map is 1:1 per replica, so within-replica
  near-dup/shingle structure is exactly the base corpus's, while
  cross-replica token sets are fully DISJOINT - so dedup candidate
  pairs scale linearly at 10x instead of exploding into 45 same-text
  pairs per doc. (An earlier vocabulary-ROTATION scheme kept replicas
  exact-duplicate-free but left them sharing the same small token
  SPACE, which inflated every shingle's document frequency ~10x and
  made df-capped gates do 10x LESS pair work at sf1 - suffixing keeps
  per-shingle df equal to the base corpus.) Frequency multisets are
  preserved exactly (freq of w<sep>k in replica k = freq of w in
  base); the global vocabulary grows 10x with the data, which is the
  realistic shape. n_chars is recomputed from the rewritten text.
- embeddings: replica k rolls each vector by k positions (norm
  preserved; rotations of high-dim vectors are near-orthogonal, so
  cross-replica cosine structure stays unclustered) and shifts vec_id.

Usage: python3 tools/scale_up.py [src_dir] [dst_dir] [factor]
Defaults: /root/testdata/sf0.1 -> target/sf1, factor 10.
"""
import os
import sys

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq

SRC = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
DST = sys.argv[2] if len(sys.argv) > 2 else "target/sf1"
FACTOR = int(sys.argv[3]) if len(sys.argv) > 3 else 10

os.makedirs(DST, exist_ok=True)
con = duckdb.connect()


def stride(table, col):
    mx = con.sql(f"SELECT MAX({col}) FROM '{SRC}/{table}.parquet'").fetchone()[0]
    s = 1
    while s <= mx:
        s *= 10
    return s


def replicate(table, keys, passthrough_cols):
    """Union FACTOR copies with shifted key columns, preserve schema."""
    parts = []
    for k in range(FACTOR):
        shifted = ", ".join(
            f"{c} + {k * s} AS {c}" for c, s in keys.items())
        cols = ", ".join([shifted] + passthrough_cols) if shifted else \
            ", ".join(passthrough_cols)
        parts.append(f"SELECT {cols} FROM '{SRC}/{table}.parquet'")
    # column order must match the source schema exactly
    src_cols = [d[0] for d in con.sql(
        f"DESCRIBE SELECT * FROM '{SRC}/{table}.parquet'").fetchall()]
    ordered = ", ".join(src_cols)
    con.sql(f"COPY (SELECT {ordered} FROM ({' UNION ALL '.join(parts)})) "
            f"TO '{DST}/{table}.parquet' (FORMAT PARQUET)")
    n = con.sql(f"SELECT COUNT(*) FROM '{DST}/{table}.parquet'").fetchone()[0]
    print(f"{table}: {n} rows")


def copy_as_is(table):
    con.sql(f"COPY (SELECT * FROM '{SRC}/{table}.parquet') "
            f"TO '{DST}/{table}.parquet' (FORMAT PARQUET)")
    print(f"{table}: copied unchanged")


KC = stride("customer", "c_custkey")
KO = stride("orders", "o_orderkey")
KP = stride("part", "p_partkey")
KS = stride("supplier", "s_suppkey")
KE = stride("events", "event_id")
KU = stride("events", "user_id")
KD = stride("documents", "doc_id")
KV = stride("embeddings", "vec_id")

copy_as_is("region")
copy_as_is("nation")
replicate("customer", {"c_custkey": KC},
          ["c_name", "c_nationkey", "c_acctbal", "c_mktsegment"])
replicate("supplier", {"s_suppkey": KS}, ["s_name", "s_nationkey", "s_acctbal"])
replicate("part", {"p_partkey": KP},
          ["p_name", "p_brand", "p_type", "p_size", "p_retailprice"])
replicate("orders", {"o_orderkey": KO, "o_custkey": KC},
          ["o_orderstatus", "o_totalprice", "o_orderdate", "o_orderpriority"])
replicate("lineitem", {"l_orderkey": KO, "l_partkey": KP, "l_suppkey": KS},
          ["l_linenumber", "l_quantity", "l_extendedprice", "l_discount",
           "l_tax", "l_returnflag", "l_linestatus", "l_shipdate"])
replicate("events", {"event_id": KE, "user_id": KU},
          ["ts", "event_type", "value", "props"])

# -- documents: suffixed-token replicas --------------------------------
docs = con.sql(
    f"SELECT doc_id, text, lang, source FROM '{SRC}/documents.parquet' "
    "ORDER BY doc_id").fetchall()
used_chars = {c for _, text, _, _ in docs for c in (text or "")}
sep = next(c for c in "§¤¶¬^~|@" if c not in used_chars)

out = {"doc_id": [], "text": [], "lang": [], "source": [], "n_chars": []}
for k in range(FACTOR):
    for doc_id, text, lang, source in docs:
        words = (text or "").split(" ")
        if k == 0:
            new_text = text or ""
        else:
            new_text = " ".join(f"{w}{sep}{k}" if w else w for w in words)
        out["doc_id"].append(doc_id + k * KD)
        out["text"].append(new_text)
        out["lang"].append(lang)
        out["source"].append(source)
        out["n_chars"].append(len(new_text))
pq.write_table(pa.table({
    "doc_id": pa.array(out["doc_id"], pa.int64()),
    "text": pa.array(out["text"], pa.string()),
    "lang": pa.array(out["lang"], pa.string()),
    "source": pa.array(out["source"], pa.string()),
    "n_chars": pa.array(out["n_chars"], pa.int64()),
}), f"{DST}/documents.parquet")
print(f"documents: {len(out['doc_id'])} rows (sep {sep!r})")

# -- embeddings: rolled-vector replicas --------------------------------
embs = con.sql(
    f"SELECT vec_id, embedding, label FROM '{SRC}/embeddings.parquet' "
    "ORDER BY vec_id").fetchall()
eids, evecs, elabs = [], [], []
for k in range(FACTOR):
    for vec_id, emb, label in embs:
        v = list(emb)
        eids.append(vec_id + k * KV)
        evecs.append(v[k % len(v):] + v[:k % len(v)])
        elabs.append(label)
pq.write_table(pa.table({
    "vec_id": pa.array(eids, pa.int64()),
    "embedding": pa.array(evecs, pa.list_(pa.float32())),
    "label": pa.array(elabs, pa.int32()),
}), f"{DST}/embeddings.parquet")
print(f"embeddings: {len(eids)} rows")
print(f"done: {DST}")
