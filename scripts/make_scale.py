"""Deterministic scale-up generator: build an sfN-equivalent dataset from
an existing driver-generated SF directory by sharded replication.

The driver only ships sf{0.001,0.01,0.1}; the repo's 100 TB posture needs
MEASURED scaling evidence, so this script manufactures a larger SF with
the same distributional shape: ``--factor N`` writes N disjoint key-shifted
shards of the source tables (region/nation stay fixed, like TPC-H's
fixed-size dims). Each shard offsets every key domain by
``shard * (max_key + 1)``, so foreign keys stay consistent within a shard
and the result behaves exactly like a TPC-H instance N× the size: more
orders/customers/users, identical per-entity structure.

Two tables need more than key shifts to scale HONESTLY:

- ``documents``: verbatim replicas would plant N-way exact duplicates,
  blowing up every dedup/gram query quadratically (a 10× corpus does NOT
  have 10 copies of every doc). Shard r>0 suffixes every token with
  ``~r`` — a per-shard bijection on the vocabulary, so each shard keeps
  the source corpus's internal duplication structure while shards stay
  disjoint (the same reason TPC-H text columns re-randomize per row).
- ``embeddings``: shard r>0 nudges the first component by ``r * 1e-3`` so
  replicated vectors aren't exactly tied under cosine top-k.

Implemented in DuckDB (reads/writes single parquet files, no Spark session
to configure); deterministic — no RNG anywhere.

Usage:  python scripts/make_scale.py --src /root/testdata/sf0.1 \
            --out /root/repo/.bench/sf1 --factor 10
"""

from __future__ import annotations

import argparse
import os

import duckdb


def make_scale(src: str, out: str, factor: int) -> None:
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events documents embeddings"
    ).split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{src}/{t}.parquet')"
        )
    con.execute(f"CREATE VIEW shards AS SELECT UNNEST(range({factor})) AS r")

    # key-domain spans (offset unit per shard keeps shards disjoint)
    spans = {
        "cust": con.execute("SELECT MAX(c_custkey) + 1 FROM customer").fetchone()[0],
        "supp": con.execute("SELECT MAX(s_suppkey) + 1 FROM supplier").fetchone()[0],
        "part": con.execute("SELECT MAX(p_partkey) + 1 FROM part").fetchone()[0],
        "order": con.execute("SELECT MAX(o_orderkey) + 1 FROM orders").fetchone()[0],
        "event": con.execute("SELECT MAX(event_id) + 1 FROM events").fetchone()[0],
        "user": con.execute("SELECT MAX(user_id) + 1 FROM events").fetchone()[0],
        "doc": con.execute("SELECT MAX(doc_id) + 1 FROM documents").fetchone()[0],
        "vec": con.execute("SELECT MAX(vec_id) + 1 FROM embeddings").fetchone()[0],
    }

    def emit(table: str, select_sql: str) -> None:
        # Store each shard with the SOURCE table's row-group granularity
        # (r10): DuckDB's default ROW_GROUP_SIZE (122880) packed the 10×
        # documents/embeddings tables into ONE row group, and parquet
        # cannot split within a row group — every scan of those tables at
        # the scaled SF ran as ONE task, serializing the whole map
        # pipeline and polluting the scaling ratios with an artifact of
        # the generator, not the engine (a real 10× table is many files).
        # One row group per source-sized shard keeps the scaled layout
        # exactly as splittable per-shard as the driver's own files.
        n_src = con.execute(f"SELECT COUNT(*) FROM {table}").fetchone()[0]
        rgs = max(1, min(122880, n_src))
        con.execute(
            f"COPY ({select_sql}) TO '{out}/{table}.parquet' "
            f"(FORMAT PARQUET, ROW_GROUP_SIZE {rgs})"
        )
        n = con.execute(
            f"SELECT COUNT(*) FROM read_parquet('{out}/{table}.parquet')"
        ).fetchone()[0]
        print(f"  {table}: {n} rows")

    # fixed-size dims: copy verbatim
    emit("region", "SELECT * FROM region")
    emit("nation", "SELECT * FROM nation")

    emit(
        "customer",
        f"""SELECT c_custkey + r * {spans['cust']} AS c_custkey,
                   c_name, c_nationkey, c_acctbal, c_mktsegment
            FROM customer CROSS JOIN shards""",
    )
    emit(
        "supplier",
        f"""SELECT s_suppkey + r * {spans['supp']} AS s_suppkey,
                   s_name, s_nationkey, s_acctbal
            FROM supplier CROSS JOIN shards""",
    )
    emit(
        "part",
        f"""SELECT p_partkey + r * {spans['part']} AS p_partkey,
                   p_name, p_brand, p_type, p_size, p_retailprice
            FROM part CROSS JOIN shards""",
    )
    emit(
        "orders",
        f"""SELECT o_orderkey + r * {spans['order']} AS o_orderkey,
                   o_custkey + r * {spans['cust']} AS o_custkey,
                   o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
            FROM orders CROSS JOIN shards""",
    )
    emit(
        "lineitem",
        f"""SELECT l_orderkey + r * {spans['order']} AS l_orderkey,
                   l_partkey + r * {spans['part']} AS l_partkey,
                   l_suppkey + r * {spans['supp']} AS l_suppkey,
                   l_linenumber, l_quantity, l_extendedprice, l_discount,
                   l_tax, l_returnflag, l_linestatus, l_shipdate
            FROM lineitem CROSS JOIN shards""",
    )
    emit(
        "events",
        f"""SELECT event_id + r * {spans['event']} AS event_id, ts,
                   user_id + r * {spans['user']} AS user_id,
                   event_type, value, props
            FROM events CROSS JOIN shards""",
    )
    emit(
        "documents",
        f"""SELECT doc_id + r * {spans['doc']} AS doc_id,
                   CASE WHEN r = 0 THEN text
                        ELSE array_to_string(
                          list_transform(regexp_split_to_array(TRIM(text), '\\s+'),
                                         t -> t || '~' || r),
                          ' ')
                   END AS text,
                   lang, source,
                   CAST(length(CASE WHEN r = 0 THEN text
                        ELSE array_to_string(
                          list_transform(regexp_split_to_array(TRIM(text), '\\s+'),
                                         t -> t || '~' || r),
                          ' ') END) AS BIGINT) AS n_chars
            FROM documents CROSS JOIN shards""",
    )
    emit(
        "embeddings",
        f"""SELECT vec_id + r * {spans['vec']} AS vec_id,
                   list_transform(
                     list_zip(embedding, range(1, len(embedding) + 1)),
                     z -> CASE WHEN z[2] = 1
                               THEN CAST(z[1] + r * 0.001 AS FLOAT)
                               ELSE CAST(z[1] AS FLOAT) END
                   ) AS embedding,
                   label
            FROM embeddings CROSS JOIN shards""",
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default="/root/repo/.bench/sf1")
    ap.add_argument("--factor", type=int, default=10)
    a = ap.parse_args()
    print(f"scaling {a.src} x{a.factor} -> {a.out}")
    make_scale(a.src, a.out, a.factor)


if __name__ == "__main__":
    main()
