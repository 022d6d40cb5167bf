#!/usr/bin/env python
"""Generate a larger scale-factor fixture by deterministic replication
of an existing one (default: sf0.1 × 10 ≈ sf1), for the FOURTH point
on the scaling curve (bench.py fits slopes over sf0.001/0.01/0.1; this
adds a decade where broadcasts start degrading to shuffles).

Replication preserves the star schema's JOIN STRUCTURE — every copy
shifts each key family by a disjoint stride and regenerates dependent
attributes from the shifted key (Customer#<key> names), so foreign
keys keep resolving inside their copy and cross-copy keys never
collide (the TPC-H scaling model: key ranges grow, date ranges stay,
density grows). Workload-honesty perturbations, all deterministic:

- ``documents.text``: each copy rewrites a copy-dependent 20% of token
  positions (``w -> w_c<i>``), so copies are NOT high-similarity
  duplicates of each other — otherwise every dedup query would see a
  fabricated 10-way duplicate explosion that measures the generator,
  not the algorithm's scaling. Within-copy duplicate structure is
  preserved exactly (identical texts transform identically).
- ``documents.source`` is copy-tagged: a 10× corpus has 10× domains,
  so source-blocked pair generation (the n-gram Jaccard tier blocks
  on it) grows linearly — per-block density constant, more blocks —
  instead of inheriting residual cross-copy token overlap that a
  low 0.1-Jaccard candidate threshold would still pick up.
- ``embeddings.embedding``: small deterministic per-copy offsets, so
  ANN/cosine queries don't see 10 identical point clouds.
- ``events.user_id`` shifts per copy: per-user temporal density is
  UNCHANGED while the user population grows 10× — range joins scale
  linearly by construction, as they would in production.

Usage: python tools/gen_sfscale.py [dst_dir] [copies] [src_dir]
Defaults: /tmp/sfscale/sf1 10 /root/testdata/sf0.1
"""

from __future__ import annotations

import os
import sys
import time

SHIFTS = {
    "o_orderkey": 1_000_000,
    "o_custkey": 100_000,
    "l_partkey": 100_000,
    "l_suppkey": 10_000,
    "event_id": 1_000_000,
    "user_id": 1_000_000,
    "doc_id": 100_000,
    "vec_id": 100_000,
}


def main() -> None:
    dst = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sfscale/sf1"
    copies = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    src = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.1"

    import duckdb

    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()
    con.execute(f"CREATE TABLE copies AS SELECT unnest(range({copies})) AS cp")

    def gen(table: str, select: str, replicate: bool = True) -> None:
        t0 = time.perf_counter()
        src_rel = f"read_parquet('{src}/{table}.parquet')"
        q = (
            f"SELECT {select} FROM {src_rel} CROSS JOIN copies"
            if replicate
            else f"SELECT {select} FROM {src_rel}"
        )
        con.execute(
            f"COPY ({q}) TO '{dst}/{table}.parquet' (FORMAT PARQUET)"
        )
        n = con.execute(
            f"SELECT count(*) FROM read_parquet('{dst}/{table}.parquet')"
        ).fetchone()[0]
        print(f"{table}: {n} rows ({time.perf_counter() - t0:.1f}s)", flush=True)

    gen("region", "*", replicate=False)
    gen("nation", "*", replicate=False)
    gen(
        "customer",
        f"""
        c_custkey + cp * {SHIFTS['o_custkey']} AS c_custkey,
        'Customer#' || lpad(CAST(c_custkey + cp * {SHIFTS['o_custkey']} AS VARCHAR), 9, '0') AS c_name,
        c_nationkey, c_acctbal, c_mktsegment
        """,
    )
    gen(
        "supplier",
        f"""
        s_suppkey + cp * {SHIFTS['l_suppkey']} AS s_suppkey,
        'Supplier#' || lpad(CAST(s_suppkey + cp * {SHIFTS['l_suppkey']} AS VARCHAR), 9, '0') AS s_name,
        s_nationkey, s_acctbal
        """,
    )
    gen(
        "part",
        f"""
        p_partkey + cp * {SHIFTS['l_partkey']} AS p_partkey,
        p_name, p_brand, p_type, p_size, p_retailprice
        """,
    )
    gen(
        "orders",
        f"""
        o_orderkey + cp * {SHIFTS['o_orderkey']} AS o_orderkey,
        o_custkey + cp * {SHIFTS['o_custkey']} AS o_custkey,
        o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
        """,
    )
    gen(
        "lineitem",
        f"""
        l_orderkey + cp * {SHIFTS['o_orderkey']} AS l_orderkey,
        l_partkey + cp * {SHIFTS['l_partkey']} AS l_partkey,
        l_suppkey + cp * {SHIFTS['l_suppkey']} AS l_suppkey,
        l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax,
        l_returnflag, l_linestatus, l_shipdate
        """,
    )
    gen(
        "events",
        f"""
        event_id + cp * {SHIFTS['event_id']} AS event_id,
        ts,
        user_id + cp * {SHIFTS['user_id']} AS user_id,
        event_type, value, props
        """,
    )
    gen(
        "documents",
        f"""
        doc_id + cp * {SHIFTS['doc_id']} AS doc_id,
        array_to_string(
          list_transform(string_split(text, ' '),
            (w, i) -> CASE WHEN (i + cp) % 5 = 0
                           THEN w || '_c' || cp ELSE w END),
          ' ') AS text,
        lang,
        source || '_c' || cp AS source,
        length(array_to_string(
          list_transform(string_split(text, ' '),
            (w, i) -> CASE WHEN (i + cp) % 5 = 0
                           THEN w || '_c' || cp ELSE w END),
          ' ')) AS n_chars
        """,
    )
    gen(
        "embeddings",
        f"""
        vec_id + cp * {SHIFTS['vec_id']} AS vec_id,
        list_transform(embedding,
          (x, j) -> x + CAST(((j * 31 + cp * 17) % 11 - 5) AS FLOAT) * CAST(0.01 AS FLOAT)
        ) AS embedding,
        label
        """,
    )
    print(f"done -> {dst} (x{copies} of {src})")


if __name__ == "__main__":
    main()
