"""Synthesize an sf1 dataset (10x sf0.1) for the self-run scaling
audit (BASELINE.md round-7): the container only ships
sf{0.001,0.01,0.1}, so sf1 is built by replicating sf0.1 ten times
with per-copy key shifts that keep every join self-consistent:

* each fact/dim key domain shifts by copy * 10^7 (l_orderkey with
  o_orderkey, o_custkey with c_custkey, l_partkey/p_partkey,
  l_suppkey/s_suppkey, doc_id, vec_id, event_id, user_id), so joins
  stay within a copy and aggregates scale exactly 10x;
* nation/region stay single-copy (copies keep their original small
  nationkeys — the dims are genuinely low-cardinality);
* documents get a per-copy ' r<k>' suffix (k>0) — texts are UNIQUE
  across copies but each base doc gains 9 near-duplicates at
  J ~ 0.95, making sf1 a near-dup-HEAVY corpus (a harder dedup
  workload than organic data, deliberately);
* embeddings get a deterministic per-copy nudge (+k*2e-3 on every
  component) — 10-way near-dup clusters at cos ~ 1.

The same parquet serves the Spark engine and the DuckDB oracle, so
scripts/check_oracles.py works unchanged against the output dir.

Usage: python scripts/make_sf1.py [out_dir]   (default /tmp/sf1)
"""

from __future__ import annotations

import os
import sys

import duckdb

SRC = "/root/testdata/sf0.1"
SHIFT = 10_000_000


def main() -> None:
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1"
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    con.execute("SET threads TO 32")

    def rep(table: str, select: str) -> None:
        src = f"read_parquet('{SRC}/{table}.parquet')"
        q = (f"COPY (SELECT {select} FROM {src}, range(10) t(k)) "
             f"TO '{out}/{table}.parquet' (FORMAT PARQUET)")
        con.execute(q)
        n = con.execute(
            f"SELECT COUNT(*) FROM read_parquet('{out}/{table}.parquet')"
        ).fetchone()[0]
        print(f"{table}: {n:,} rows")

    rep("lineitem",
        f"l_orderkey + k*{SHIFT} AS l_orderkey, "
        f"l_partkey + k*{SHIFT} AS l_partkey, "
        f"l_suppkey + k*{SHIFT} AS l_suppkey, "
        "l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax, "
        "l_returnflag, l_linestatus, l_shipdate")
    rep("orders",
        f"o_orderkey + k*{SHIFT} AS o_orderkey, "
        f"o_custkey + k*{SHIFT} AS o_custkey, "
        "o_orderstatus, o_totalprice, o_orderdate, o_orderpriority")
    rep("customer",
        f"c_custkey + k*{SHIFT} AS c_custkey, c_name, c_nationkey, "
        "c_acctbal, c_mktsegment")
    rep("part",
        f"p_partkey + k*{SHIFT} AS p_partkey, p_name, p_brand, p_type, "
        "p_size, p_retailprice")
    rep("supplier",
        f"s_suppkey + k*{SHIFT} AS s_suppkey, s_name, s_nationkey, "
        "s_acctbal")
    rep("events",
        f"event_id + k*{SHIFT} AS event_id, ts, "
        f"user_id + k*{SHIFT} AS user_id, event_type, value, props")
    rep("documents",
        f"doc_id + k*{SHIFT} AS doc_id, "
        "CASE WHEN k = 0 THEN text ELSE text || ' r' || k END AS text, "
        "lang, source, "
        "length(CASE WHEN k = 0 THEN text ELSE text || ' r' || k END) "
        "AS n_chars")
    rep("embeddings",
        f"vec_id + k*{SHIFT} AS vec_id, "
        "CAST(list_transform(embedding, "
        "x -> x + CAST(k AS FLOAT) * CAST(0.002 AS FLOAT)) "
        "AS FLOAT[]) AS embedding, label")
    # single-copy dims
    for t in ("nation", "region"):
        con.execute(
            f"COPY (SELECT * FROM read_parquet('{SRC}/{t}.parquet')) "
            f"TO '{out}/{t}.parquet' (FORMAT PARQUET)")
        print(f"{t}: single copy")


if __name__ == "__main__":
    main()
