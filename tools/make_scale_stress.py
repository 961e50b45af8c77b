"""Synthesize a 10x (or Nx) scale-stress copy of an sf testdata dir.

The driver's round-end measurement may run at a larger, driver-generated
scale factor than the committed sf0.1, so optimizations must hold beyond
600k-row tables (round brief).  The real generator is the driver's
(seed=42, read-only under /root/testdata); this tool builds a
distribution-preserving surrogate by replicating each fact table K times
with key shifts:

- documents: doc_id += r*50000 per replica; replicas r>0 get a one-token
  suffix so they are near- (not exact-) duplicates of replica 0 -- a
  tens-of-percent near-dup fraction is exactly the load production dedup
  faces.
- embeddings: vec_id += r*50000; vectors unchanged (cross-replica
  distance-0 neighbors stress the hot-bucket caps).
- lineitem/orders: orderkey += r*1000000 (order-line join preserved;
  o_custkey untouched so dimension joins stay valid).
- events: event_id/user_id shifted (10x users, same per-user density).
- dimensions (customer/supplier/part/nation/region): copied as-is.

Usage: python tools/make_scale_stress.py [K] [out_dir]
Then:  SPARK_GRAFT_SF_DIR=<out_dir> python tools/measure_r08.py --tag ...

This is measurement tooling only: nothing in the query paths reads the
stress dir, and the output lives outside the repo by default.
"""
from __future__ import annotations

import os
import sys

import duckdb

SRC = "/root/testdata/sf0.1"
K = int(sys.argv[1]) if len(sys.argv) > 1 else 10
OUT = sys.argv[2] if len(sys.argv) > 2 else f"/tmp/sf_stress_{K}x"

DOC_SHIFT = 50_000
VEC_SHIFT = 50_000
ORD_SHIFT = 1_000_000
EVT_SHIFT = 1_000_000
USR_SHIFT = 10_000

os.makedirs(OUT, exist_ok=True)
con = duckdb.connect()
con.execute(f"SET threads={os.cpu_count()}")


def write(name: str, sql: str) -> None:
    dst = f"{OUT}/{name}.parquet"
    con.execute(
        f"COPY ({sql}) TO '{dst}' (FORMAT PARQUET, CODEC 'SNAPPY')")
    n = con.sql(f"SELECT count(*) FROM '{dst}'").fetchone()[0]
    print(f"{name}: {n} rows")


parts = " UNION ALL ".join(
    f"SELECT doc_id + {r * DOC_SHIFT} AS doc_id, "
    + ("text" if r == 0 else f"text || ' zq{r}x' AS text")
    + f", lang, source, n_chars FROM '{SRC}/documents.parquet'"
    for r in range(K))
write("documents", parts)

parts = " UNION ALL ".join(
    f"SELECT vec_id + {r * VEC_SHIFT} AS vec_id, embedding, label "
    f"FROM '{SRC}/embeddings.parquet'" for r in range(K))
write("embeddings", parts)

parts = " UNION ALL ".join(
    f"SELECT l_orderkey + {r * ORD_SHIFT} AS l_orderkey, l_partkey, "
    f"l_suppkey, l_linenumber, l_quantity, l_extendedprice, l_discount, "
    f"l_tax, l_returnflag, l_linestatus, l_shipdate "
    f"FROM '{SRC}/lineitem.parquet'" for r in range(K))
write("lineitem", parts)

parts = " UNION ALL ".join(
    f"SELECT o_orderkey + {r * ORD_SHIFT} AS o_orderkey, o_custkey, "
    f"o_orderstatus, o_totalprice, o_orderdate, o_orderpriority "
    f"FROM '{SRC}/orders.parquet'" for r in range(K))
write("orders", parts)

parts = " UNION ALL ".join(
    f"SELECT event_id + {r * EVT_SHIFT} AS event_id, ts, "
    f"user_id + {r * USR_SHIFT} AS user_id, event_type, value, props "
    f"FROM '{SRC}/events.parquet'" for r in range(K))
write("events", parts)

for dim in ("customer", "supplier", "part", "nation", "region"):
    write(dim, f"SELECT * FROM '{SRC}/{dim}.parquet'")

print(f"done: {OUT}")
