#!/usr/bin/env python3
"""Generate a K-times scale-up of /root/testdata/sf0.1 for scale smoke runs.

Each fact table is replicated K times with PRIMARY/FOREIGN KEYS OFFSET by a
per-table stride (next power of ten above the max key), so join
cardinalities scale like a real SF increase — replica i of orders
references replica i of customer, etc. Naive file duplication would
duplicate the keys themselves and inflate every join superlinearly by
construction, which measures nothing.

region/nation stay at 1x (fixed-size dimensions, FK targets).
documents keep their text verbatim across replicas, so dedup operators
see a 10x-denser duplicate field — the interesting stress.
events.ts is re-emitted as epoch nanos (BIGINT) — the LEGACY physical
type. The loader (graft.core.Tables.normalizeEventTs) dispatches on the
observed type, so scaled runs exercise the nanos-as-long path while the
driver's sf dirs exercise the native timestamp[us] path — both vintages
stay covered.

Usage: python3 tools/scale_gen.py [dst_dir] [K]
"""
import math
import os
import shutil
import sys

import duckdb

SRC = "/root/testdata/sf0.1"
DST = sys.argv[1] if len(sys.argv) > 1 else "target/scale10"
K = int(sys.argv[2]) if len(sys.argv) > 2 else 10


def stride(table, col):
    mx = duckdb.sql(
        f"SELECT max({col}) FROM '{SRC}/{table}.parquet'").fetchone()[0]
    return 10 ** math.ceil(math.log10(mx + 1))


CUST = stride("customer", "c_custkey")
SUPP = stride("supplier", "s_suppkey")
PART = stride("part", "p_partkey")
ORD = stride("orders", "o_orderkey")
DOC = stride("documents", "doc_id")
VEC = stride("embeddings", "vec_id")
EVT = stride("events", "event_id")
USR = stride("events", "user_id")
assert (K - 1) * DOC + DOC <= 10**8, "doc_id must stay within 8-digit padKey"

# replica-i SELECT per table; {i} is the replica index
TEMPLATES = {
    "customer": f"""SELECT c_custkey + {{i}}*{CUST} AS c_custkey, c_name,
        c_nationkey, c_acctbal, c_mktsegment FROM '{SRC}/customer.parquet'""",
    "supplier": f"""SELECT s_suppkey + {{i}}*{SUPP} AS s_suppkey, s_name,
        s_nationkey, s_acctbal FROM '{SRC}/supplier.parquet'""",
    "part": f"""SELECT p_partkey + {{i}}*{PART} AS p_partkey, p_name, p_brand,
        p_type, p_size, p_retailprice FROM '{SRC}/part.parquet'""",
    "orders": f"""SELECT o_orderkey + {{i}}*{ORD} AS o_orderkey,
        o_custkey + {{i}}*{CUST} AS o_custkey, o_orderstatus, o_totalprice,
        o_orderdate, o_orderpriority FROM '{SRC}/orders.parquet'""",
    "lineitem": f"""SELECT l_orderkey + {{i}}*{ORD} AS l_orderkey,
        l_partkey + {{i}}*{PART} AS l_partkey,
        l_suppkey + {{i}}*{SUPP} AS l_suppkey, l_linenumber, l_quantity,
        l_extendedprice, l_discount, l_tax, l_returnflag, l_linestatus,
        l_shipdate FROM '{SRC}/lineitem.parquet'""",
    "events": f"""SELECT event_id + {{i}}*{EVT} AS event_id,
        epoch_ns(ts) AS ts, user_id + {{i}}*{USR} AS user_id, event_type,
        value, props FROM '{SRC}/events.parquet'""",
    "documents": f"""SELECT doc_id + {{i}}*{DOC} AS doc_id, text, lang,
        source, n_chars FROM '{SRC}/documents.parquet'""",
    "embeddings": f"""SELECT vec_id + {{i}}*{VEC} AS vec_id, embedding,
        label FROM '{SRC}/embeddings.parquet'""",
}


def main():
    os.makedirs(DST, exist_ok=True)
    for t in ("region", "nation"):
        shutil.copyfile(f"{SRC}/{t}.parquet", f"{DST}/{t}.parquet")
        print(f"[scale_gen] {t}: copied 1x")
    for t, tpl in TEMPLATES.items():
        d = f"{DST}/{t}.parquet"
        shutil.rmtree(d, ignore_errors=True)
        os.makedirs(d)
        for i in range(K):
            duckdb.sql(f"COPY ({tpl.format(i=i)}) TO '{d}/part-{i:02d}.parquet'"
                       " (FORMAT PARQUET)")
        n = duckdb.sql(f"SELECT count(*) FROM '{d}/*.parquet'").fetchone()[0]
        print(f"[scale_gen] {t}: {K} replicas, {n} rows")


if __name__ == "__main__":
    main()
