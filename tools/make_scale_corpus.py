#!/usr/bin/env python
"""Synthesize an above-sf0.1 corpus for scale-trend measurement.

The driver fixtures stop at sf0.1 (TESTDATA.md), so the 100 TB growth
claims have only plan-shape + shuffle-byte evidence behind them
(VERDICT r12 "What's missing" #1). This tool manufactures a
``mult``-times corpus from sf0.1 by unioning key-shifted copies —
every copy gets a disjoint key range per entity table so joins stay
consistent within a copy and entity counts genuinely grow (a naive
row duplication would instead create degenerate duplicate keys).

Per-copy transforms keep the STATISTICS realistic rather than
manufacturing artificial near-duplicate clusters (which would grow
candidate-pair spaces quadratically and measure the corpus, not the
engine):

- documents: copy 0 is the original; later copies reverse / rotate /
  sort the word sequence — token multiset (language-id, quality,
  length stats) preserved, shingle sets decorrelated, so near-dup
  structure per copy matches the original instead of every doc
  gaining mult-1 clones. n_chars is recomputed.
- embeddings: dimension order is rolled by 17*copy (mod 64) — norms
  and the coordinate distribution are preserved, neighbor structure
  decorrelated across copies.
- facts (orders/lineitem/events): all entity FKs shift with their
  copy, so per-customer order counts, per-part line counts and
  per-user event rates stay constant — the realistic way a corpus
  grows 4x.
- region/nation: copied unchanged (dimensions that don't multiply).

Usage:
    python tools/make_scale_corpus.py [mult] [src_dir] [out_dir]
Defaults: mult=4, src=/root/testdata/sf0.1, out=.scale_corpus/x{mult}
"""

from __future__ import annotations

import os
import sys

import duckdb

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    mult = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    src = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    out = (
        sys.argv[3]
        if len(sys.argv) > 3
        else os.path.join(REPO, ".scale_corpus", f"x{mult}")
    )
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    con.execute(f"SET temp_directory='{os.path.join(REPO, '.tmp')}'")

    def shift(table: str, key: str) -> int:
        return (
            con.sql(f"SELECT max({key}) + 1 FROM '{src}/{table}.parquet'")
            .fetchone()[0]
        )

    def write(table: str, select_for_copy) -> None:
        parts = " UNION ALL ".join(select_for_copy(c) for c in range(mult))
        con.execute(
            f"COPY ({parts}) TO '{out}/{table}.parquet' (FORMAT PARQUET)"
        )
        n = con.sql(f"SELECT count(*) FROM '{out}/{table}.parquet'").fetchone()[0]
        print(f"{table}: {n} rows")

    # dimensions that don't multiply
    for t in ("region", "nation"):
        con.execute(
            f"COPY (SELECT * FROM '{src}/{t}.parquet') TO "
            f"'{out}/{t}.parquet' (FORMAT PARQUET)"
        )
        print(f"{t}: copied unchanged")

    s_cust = shift("customer", "c_custkey")
    s_supp = shift("supplier", "s_suppkey")
    s_part = shift("part", "p_partkey")
    s_ord = shift("orders", "o_orderkey")
    s_ev = shift("events", "event_id")
    s_user = shift("events", "user_id")
    s_doc = shift("documents", "doc_id")
    s_vec = shift("embeddings", "vec_id")

    write(
        "customer",
        lambda c: f"""SELECT c_custkey + {c * s_cust} AS c_custkey, c_name,
            c_nationkey, c_acctbal, c_mktsegment
            FROM '{src}/customer.parquet'""",
    )
    write(
        "supplier",
        lambda c: f"""SELECT s_suppkey + {c * s_supp} AS s_suppkey, s_name,
            s_nationkey, s_acctbal FROM '{src}/supplier.parquet'""",
    )
    write(
        "part",
        lambda c: f"""SELECT p_partkey + {c * s_part} AS p_partkey, p_name,
            p_brand, p_type, p_size, p_retailprice
            FROM '{src}/part.parquet'""",
    )
    write(
        "orders",
        lambda c: f"""SELECT o_orderkey + {c * s_ord} AS o_orderkey,
            o_custkey + {c * s_cust} AS o_custkey, o_orderstatus,
            o_totalprice, o_orderdate, o_orderpriority
            FROM '{src}/orders.parquet'""",
    )
    write(
        "lineitem",
        lambda c: f"""SELECT l_orderkey + {c * s_ord} AS l_orderkey,
            l_partkey + {c * s_part} AS l_partkey,
            l_suppkey + {c * s_supp} AS l_suppkey, l_linenumber,
            l_quantity, l_extendedprice, l_discount, l_tax, l_returnflag,
            l_linestatus, l_shipdate FROM '{src}/lineitem.parquet'""",
    )
    write(
        "events",
        lambda c: f"""SELECT event_id + {c * s_ev} AS event_id, ts,
            user_id + {c * s_user} AS user_id, event_type, value, props
            FROM '{src}/events.parquet'""",
    )

    def doc_text(c: int) -> str:
        w = "string_split(text, ' ')"
        if c % 4 == 0:
            return "text"
        if c % 4 == 1:
            return f"array_to_string(list_reverse({w}), ' ')"
        if c % 4 == 2:
            return (
                f"array_to_string(list_concat({w}[8:], {w}[1:7]), ' ')"
            )
        return f"array_to_string(list_sort({w}), ' ')"

    write(
        "documents",
        lambda c: f"""SELECT doc_id + {c * s_doc} AS doc_id,
            {doc_text(c)} AS text, lang, source,
            CAST(len({doc_text(c)}) AS BIGINT) AS n_chars
            FROM '{src}/documents.parquet'""",
    )

    def rolled(c: int) -> str:
        r = (17 * c) % 64
        if r == 0:
            return "embedding"
        return f"list_concat(embedding[{r + 1}:], embedding[1:{r}])"

    write(
        "embeddings",
        lambda c: f"""SELECT vec_id + {c * s_vec} AS vec_id,
            CAST({rolled(c)} AS FLOAT[]) AS embedding, label
            FROM '{src}/embeddings.parquet'""",
    )
    print(f"corpus at {out}")


if __name__ == "__main__":
    main()
