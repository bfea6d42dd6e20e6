"""Generate a scaled-up probe dataset from the driver's sf0.1 tables.

VERDICT r2 next-round #3: the bench feedback loop tops out at sf0.1
(600k lineitem); superlinear behaviors — LSH bucket skew, decontamination
gram volume, shuffle-partition sizing — only show at ~10×. This derives an
sf1-equivalent dataset by replicating sf0.1 REPLICAS× with shifted keys:

- fact keys (orderkey, event_id, doc_id, vec_id) offset per replica so
  joins/groupings see genuinely distinct entities;
- dimension foreign keys (custkey, partkey, suppkey, user_id) KEPT in the
  original key space, so dims stay dim-sized and fact/dim join fan-in grows
  10× per key — the realistic scale-up shape;
- document text perturbed on odd replicas (a replica token appended) while
  even replicas stay byte-identical — a heavy-duplication corpus that
  stresses LSH buckets with real near/exact dup clusters;
- event timestamps shifted by +REPLICA hours so the event-time span grows
  and windows see more keys per window.

Output: /root/repo/_scaleprobe/sf1/*.parquet (gitignored, disposable).
Run: python tools/gen_scale.py [replicas]
"""

from __future__ import annotations

import os
import sys

import duckdb

SRC = "/root/testdata/sf0.1"
DST = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "_scaleprobe", "sf1")


def main(replicas: int = 10) -> None:
    os.makedirs(DST, exist_ok=True)
    con = duckdb.connect()
    con.execute(f"SET threads TO {os.cpu_count()}")
    rng = f"generate_series(0, {replicas - 1})"

    def gen(table: str, select: str, row_group: int = 262144) -> None:
        out = os.path.join(DST, f"{table}.parquet")
        con.execute(
            f"COPY ({select}) TO '{out}' (FORMAT PARQUET, ROW_GROUP_SIZE {row_group})"
        )
        n = con.execute(f"SELECT count(*) FROM '{out}'").fetchone()[0]
        print(f"{table}: {n} rows -> {out}", flush=True)

    # dimensions pass through unchanged (dims stay dim-sized at scale)
    for t in ("region", "nation", "customer", "supplier", "part"):
        gen(t, f"SELECT * FROM '{SRC}/{t}.parquet'")

    gen(
        "orders",
        f"""
        SELECT o_orderkey + r.i * 1000000 AS o_orderkey, o_custkey,
               o_orderstatus, o_totalprice + r.i AS o_totalprice,
               o_orderdate, o_orderpriority
        FROM '{SRC}/orders.parquet', (SELECT unnest({rng}) AS i) r
        """,
    )
    gen(
        "lineitem",
        f"""
        SELECT l_orderkey + r.i * 1000000 AS l_orderkey, l_partkey, l_suppkey,
               l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax,
               l_returnflag, l_linestatus, l_shipdate
        FROM '{SRC}/lineitem.parquet', (SELECT unnest({rng}) AS i) r
        """,
    )
    gen(
        "events",
        f"""
        SELECT event_id + r.i * 10000000 AS event_id,
               ts + to_hours(r.i) AS ts, user_id, event_type, value, props
        FROM '{SRC}/events.parquet', (SELECT unnest({rng}) AS i) r
        """,
    )
    # small row groups for the wide-text / vector tables: a 50k-row table in
    # ONE row group would hand the whole scan to a single task (parquet
    # splits engage per row group) — real corpora have thousands of groups
    gen(
        "documents",
        f"""
        SELECT doc_id + r.i * 1000000 AS doc_id,
               CASE WHEN r.i % 2 = 1 THEN text || ' replica' || r.i
                    ELSE text END AS text,
               lang, source, n_chars
        FROM '{SRC}/documents.parquet', (SELECT unnest({rng}) AS i) r
        """,
        row_group=2048,
    )
    gen(
        "embeddings",
        f"""
        SELECT vec_id + r.i * 1000000 AS vec_id, embedding, label
        FROM '{SRC}/embeddings.parquet', (SELECT unnest({rng}) AS i) r
        """,
        row_group=2048,
    )

    # skew probe (VERDICT r5 #8): one hot supplier key owns ~20% of fact
    # rows (every 5th orderkey deterministically re-pointed at suppkey 1) —
    # the input for tools/bench_skew.py's salted-vs-plain join measurement.
    gen(
        "lineitem_skew",
        f"""
        SELECT l_orderkey, l_partkey,
               CASE WHEN l_orderkey % 5 = 0 THEN 1 ELSE l_suppkey END
                   AS l_suppkey,
               l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax,
               l_returnflag, l_linestatus, l_shipdate
        FROM '{DST}/lineitem.parquet'
        """,
    )


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 10)
