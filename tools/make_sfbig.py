#!/usr/bin/env python3
"""Regenerate /tmp/sfbig — the 10x scale-probe corpus graft.ScaleProbe
reads (dev tooling; runs with the driver-side duckdb, not part of the
library).

Construction (deterministic): every sf0.1 table replicated R=10 times
with consistent key shifts.
- documents: filler tokens keyed by (md5(text), rep), so replicas of a
  doc are NOT near-dups (jaccard <= t/(t+102) < 0.5), exact-duplicate
  groups STAY near-dups per replica (identical text -> identical
  filler), and no filler token is shared across unrelated docs (no hot
  LSH band buckets). A synthesis that shared filler across a replica
  cohort put thousands of docs in one band bucket and made the bucket^2
  verify a 23-minute single-task straggler (round-4 session 3) — that
  pathology is now the deliberately-hot-bucket test in
  DegenerateInputSpec, guarded by Dedup.maxLshBucket.
- embeddings: one component bumped per replica — similar, never
  identical.

Usage: python3 tools/make_sfbig.py [sf_dir] [out_dir]
"""
import sys

import duckdb

sf = sys.argv[1] if len(sys.argv) > 1 else '/root/testdata/sf0.1'
out = sys.argv[2] if len(sys.argv) > 2 else '/tmp/sfbig'
R = 10

import os
os.makedirs(out, exist_ok=True)
con = duckdb.connect()

con.sql(f"""
COPY (
  SELECT doc_id + rep*1000000 AS doc_id,
    text || ' ' || array_to_string(
      [ 'r' || rep || substr(md5(text), 1, 8) || 'x' || j FOR j IN range(1, 52) ], ' ') AS text,
    lang, source, n_chars
  FROM '{sf}/documents.parquet' CROSS JOIN (SELECT unnest(range({R})) AS rep)
) TO '{out}/documents.parquet' (FORMAT PARQUET)""")
con.sql(f"""
COPY (
  SELECT event_id + rep*10000000 AS event_id, ts,
    user_id + rep*1000000 AS user_id, event_type, value, props
  FROM '{sf}/events.parquet' CROSS JOIN (SELECT unnest(range({R})) AS rep)
) TO '{out}/events.parquet' (FORMAT PARQUET)""")
con.sql(f"""
COPY (
  SELECT o_orderkey + rep*10000000 AS o_orderkey, o_custkey + rep*1000000 AS o_custkey,
    o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
  FROM '{sf}/orders.parquet' CROSS JOIN (SELECT unnest(range({R})) AS rep)
) TO '{out}/orders.parquet' (FORMAT PARQUET)""")
con.sql(f"""
COPY (
  SELECT l_orderkey + rep*10000000 AS l_orderkey, l_partkey + rep*1000000 AS l_partkey,
    l_suppkey + rep*100000 AS l_suppkey, l_linenumber, l_quantity, l_extendedprice,
    l_discount, l_tax, l_returnflag, l_linestatus, l_shipdate
  FROM '{sf}/lineitem.parquet' CROSS JOIN (SELECT unnest(range({R})) AS rep)
) TO '{out}/lineitem.parquet' (FORMAT PARQUET)""")
con.sql(f"""
COPY (
  SELECT c_custkey + rep*1000000 AS c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment
  FROM '{sf}/customer.parquet' CROSS JOIN (SELECT unnest(range({R})) AS rep)
) TO '{out}/customer.parquet' (FORMAT PARQUET)""")
con.sql(f"""
COPY (
  SELECT p_partkey + rep*1000000 AS p_partkey, * EXCLUDE (p_partkey)
  FROM '{sf}/part.parquet' CROSS JOIN (SELECT unnest(range({R})) AS rep)
) TO '{out}/part.parquet' (FORMAT PARQUET)""")
con.sql(f"""
COPY (
  SELECT vec_id + rep*1000000 AS vec_id,
    list_transform(embedding, (x, i) -> CASE WHEN i - 1 = rep % len(embedding)
      THEN CAST(x + 0.01 * (rep + 1) AS FLOAT) ELSE x END) AS embedding,
    label
  FROM '{sf}/embeddings.parquet' CROSS JOIN (SELECT unnest(range({R})) AS rep)
) TO '{out}/embeddings.parquet' (FORMAT PARQUET)""")
for t in ['nation', 'region', 'supplier']:
    con.sql(f"COPY (SELECT * FROM '{sf}/{t}.parquet') TO '{out}/{t}.parquet' (FORMAT PARQUET)")
for t in ['documents', 'events', 'orders', 'lineitem', 'customer', 'part', 'embeddings']:
    print(t, con.sql(f"SELECT count(*) FROM '{out}/{t}.parquet'").fetchone()[0])
