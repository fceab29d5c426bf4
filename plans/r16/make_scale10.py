"""Build a deterministic 10x-scaled copy of sf0.1 in /tmp/witdb_sfscale1
(fact tables replicated with shifted keys over the same dims — the
standard scale-proof shape: facts grow, dims stay broadcast-sized).
DuckDB-only; no Spark needed. Seedless and deterministic: copy i shifts
keys by i * 10^9 so joins stay consistent within each copy."""
import os
import duckdb

SRC = "/root/testdata/sf0.1"
DST = "/tmp/witdb_sfscale1"
os.makedirs(DST, exist_ok=True)
con = duckdb.connect()
K = 1_000_000_000

# dims: straight copies
for t in ("region", "nation", "customer", "supplier", "part", "embeddings"):
    con.execute(
        f"COPY (SELECT * FROM '{SRC}/{t}.parquet') TO '{DST}/{t}.parquet' (FORMAT PARQUET)"
    )

# orders: 10 shifted copies (o_orderkey, o_custkey unchanged - same customers)
con.execute(f"""
COPY (
  SELECT o_orderkey + i*{K} AS o_orderkey, o_custkey, o_orderstatus,
         o_totalprice, o_orderdate, o_orderpriority
  FROM '{SRC}/orders.parquet', range(10) r(i)
  ORDER BY i, o_orderkey
) TO '{DST}/orders.parquet' (FORMAT PARQUET)
""")

# lineitem: 10 shifted copies (same parts/suppliers)
con.execute(f"""
COPY (
  SELECT l_orderkey + i*{K} AS l_orderkey, l_partkey, l_suppkey,
         l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax,
         l_returnflag, l_linestatus, l_shipdate
  FROM '{SRC}/lineitem.parquet', range(10) r(i)
  ORDER BY i, l_orderkey, l_linenumber
) TO '{DST}/lineitem.parquet' (FORMAT PARQUET)
""")

# documents: 10 shifted copies (doc_id strings get a suffix)
con.execute(f"""
COPY (
  SELECT doc_id + i*100000000 AS doc_id,
         text, lang, source, n_chars
  FROM '{SRC}/documents.parquet', range(10) r(i)
  ORDER BY i, doc_id
) TO '{DST}/documents.parquet' (FORMAT PARQUET)
""")

# events: copy as-is (not needed by the scale-proof queries)
con.execute(
    f"COPY (SELECT * FROM '{SRC}/events.parquet') TO '{DST}/events.parquet' (FORMAT PARQUET)"
)
for t in ("lineitem", "orders", "documents"):
    n, = con.execute(f"SELECT count(*) FROM '{DST}/{t}.parquet'").fetchone()
    print(t, n)
print("done ->", DST)
