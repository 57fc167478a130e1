#!/usr/bin/env python3
"""Synthesize larger scale factors for the SCALE-TREND bench by K-fold
FK-consistent replication of the driver's sf0.1 testdata (bench-only
tooling — the library itself never touches this; see SURVEY §5).

Every int64 entity key space shifts by i*OFFSET per copy i, so joins stay
exactly as selective as the original; the 25-nation/5-region dims are
fixed (a bigger warehouse has more customers, not more nations); the
order/ship/event calendar is replicated VERBATIM (a bigger corpus has
more orders per day, not more days — the calendar-bounded design claim
this bench is meant to test). c_name gets a per-copy suffix so the
fuzzy-blocking density (er_clusters' deletion-variant blocks) stays
comparable to the original instead of 5 exact copies per block.

Usage: python3 tools/make_scale.py <K> <outdir>   # e.g. 5 scaledata/sf0.5
"""
import sys
import duckdb

K = int(sys.argv[1])
OUT = sys.argv[2]
SRC = "/root/testdata/sf0.1"
OFFSET = 10_000_000

import os
os.makedirs(OUT, exist_ok=True)

con = duckdb.connect()
con.execute(f"CREATE TABLE copies AS SELECT unnest(range({K})) AS i")

# The per-copy shift is only collision-free if every shifted key space
# fits under OFFSET. That holds for the driver's sf0.1 (max key ~600k)
# but NOT for arbitrary sources (o_orderkey passes 10M around sf~1.7) —
# silent collisions would corrupt the FK selectivity this bench is meant
# to hold constant, so fail loudly before writing anything.
SHIFTED_KEYS = {
    "customer": ["c_custkey"], "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"], "embeddings": ["vec_id"],
}
for table, keys in SHIFTED_KEYS.items():
    maxes = ", ".join(f"max({k})" for k in keys)
    row = con.execute(f"SELECT {maxes} FROM '{SRC}/{table}.parquet'").fetchone()
    for key, mx in zip(keys, row):
        assert mx is not None and mx < OFFSET, (
            f"{table}.{key} max={mx} >= OFFSET={OFFSET}: per-copy key "
            f"shift would collide across copies — raise OFFSET")

def rep(table, select):
    con.execute(
        f"COPY (SELECT {select} FROM '{SRC}/{table}.parquet', copies) "
        f"TO '{OUT}/{table}.parquet' (FORMAT PARQUET)")
    n = con.execute(f"SELECT count(*) FROM '{OUT}/{table}.parquet'").fetchone()[0]
    print(f"{table}: {n}")

def copy(table):
    con.execute(f"COPY (SELECT * FROM '{SRC}/{table}.parquet') "
                f"TO '{OUT}/{table}.parquet' (FORMAT PARQUET)")
    print(f"{table}: verbatim")

copy("region")
copy("nation")
rep("customer", f"""
  c_custkey + i*{OFFSET} AS c_custkey,
  CASE WHEN i = 0 THEN c_name ELSE c_name || ' ' || CAST(i AS VARCHAR) END AS c_name,
  c_nationkey, c_acctbal, c_mktsegment""")
rep("supplier", f"s_suppkey + i*{OFFSET} AS s_suppkey, s_name, s_nationkey, s_acctbal")
rep("part", f"p_partkey + i*{OFFSET} AS p_partkey, p_name, p_brand, p_type, p_size, p_retailprice")
rep("orders", f"""
  o_orderkey + i*{OFFSET} AS o_orderkey, o_custkey + i*{OFFSET} AS o_custkey,
  o_orderstatus, o_totalprice, o_orderdate, o_orderpriority""")
rep("lineitem", f"""
  l_orderkey + i*{OFFSET} AS l_orderkey, l_partkey + i*{OFFSET} AS l_partkey,
  l_suppkey + i*{OFFSET} AS l_suppkey, l_linenumber, l_quantity,
  l_extendedprice, l_discount, l_tax, l_returnflag, l_linestatus, l_shipdate""")
rep("events", f"""
  event_id + i*{OFFSET} AS event_id, ts, user_id + i*{OFFSET} AS user_id,
  event_type, value, props""")
rep("documents", f"""
  doc_id + i*{OFFSET} AS doc_id, text, lang, source, n_chars""")
rep("embeddings", f"""
  vec_id + i*{OFFSET} AS vec_id, embedding, label""")
print("done", OUT)
