"""Build a full sf1-equivalent dataset (10x sf0.1) for the whole-
surface strict sweep + bench (VERDICT r4 item 1).

Unlike the earlier per-operator 10x sets (cold_star_scale.py /
sketch_scale.py, which scaled only orders/documents), EVERY fact and
entity table is replicated 10x with foreign keys shifted consistently
per replica, so joins stay referentially meaningful at scale:

- region/nation: fixed dimensions (TPC-H semantics) — symlinked.
- customer/supplier/part: 10x, primary keys shifted by i*span.
- orders: 10x, o_orderkey AND o_custkey shifted (replica i's orders
  reference replica i's customers).
- lineitem: 10x, l_orderkey/l_partkey/l_suppkey all shifted.
- events: 10x, event_id/user_id shifted (timestamps unchanged — 10x
  density per time window, the realistic scale-up).
- documents: 10x, doc_id shifted, TEXT UNCHANGED — every document
  gains 9 exact duplicates, which is a deliberate stress load for the
  dedup/LSH layer (candidate sets grow quadratically in dup-group
  size; the bucketed designs must absorb it).
- embeddings: 10x, vec_id shifted, vectors unchanged (ties in ANN
  broken by id — deterministic).

DuckDB does the replication (columnar read -> COPY parquet, no Spark
session needed). Usage:
    python scripts_dev/make_sf1.py [out_dir] [replicas]
Defaults: /tmp/sf1, 10 replicas (sf1). `replicas=100` builds an
sf10-equivalent (~2.3 GB) for the spot-check scaling curve.
"""

from __future__ import annotations

import os
import sys

import duckdb

SRC = "/root/testdata/sf0.1"
OUT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1"
REPLICAS = int(sys.argv[2]) if len(sys.argv) > 2 else 10

# table -> columns to shift by i * (max(pk_of_that_domain)+1)
# domain spans are computed from the PRIMARY table of each key domain.
DOMAINS = {
    "o_orderkey": ("orders", "o_orderkey"),
    "c_custkey": ("customer", "c_custkey"),
    "s_suppkey": ("supplier", "s_suppkey"),
    "p_partkey": ("part", "p_partkey"),
    "event_id": ("events", "event_id"),
    "user_id": ("events", "user_id"),
    "doc_id": ("documents", "doc_id"),
    "vec_id": ("embeddings", "vec_id"),
}

SHIFTS = {
    "customer": {"c_custkey": "c_custkey"},
    "supplier": {"s_suppkey": "s_suppkey"},
    "part": {"p_partkey": "p_partkey"},
    "orders": {"o_orderkey": "o_orderkey", "o_custkey": "c_custkey"},
    "lineitem": {
        "l_orderkey": "o_orderkey",
        "l_partkey": "p_partkey",
        "l_suppkey": "s_suppkey",
    },
    "events": {"event_id": "event_id", "user_id": "user_id"},
    "documents": {"doc_id": "doc_id"},
    "embeddings": {"vec_id": "vec_id"},
}

SYMLINK = ("region", "nation")


def main() -> None:
    os.makedirs(OUT, exist_ok=True)
    con = duckdb.connect()
    con.execute(f"SET threads={os.environ.get('MAKE_SF_THREADS', '8')}")

    spans: dict[str, int] = {}
    for dom, (table, col) in DOMAINS.items():
        spans[dom] = (
            con.execute(
                f"SELECT max({col}) + 1 FROM '{SRC}/{table}.parquet'"
            ).fetchone()[0]
        )

    for t in SYMLINK:
        dst = os.path.join(OUT, f"{t}.parquet")
        if not os.path.exists(dst):
            os.symlink(os.path.join(SRC, f"{t}.parquet"), dst)
        print(f"{t}: symlinked")

    for table, shifts in SHIFTS.items():
        dst = os.path.join(OUT, f"{table}.parquet")
        if os.path.exists(dst):
            print(f"{table}: exists, skipped")
            continue
        cols = [
            r[0]
            for r in con.execute(
                f"DESCRIBE SELECT * FROM '{SRC}/{table}.parquet'"
            ).fetchall()
        ]
        sel = []
        for c in cols:
            if c in shifts:
                span = spans[shifts[c]]
                sel.append(
                    f"CAST({c} + i * {span} AS BIGINT) AS {c}"
                )
            else:
                sel.append(c)
        con.execute(
            f"""
            COPY (
              SELECT {", ".join(sel)}
              FROM '{SRC}/{table}.parquet', range({REPLICAS}) t(i)
              ORDER BY i
            ) TO '{dst}' (FORMAT PARQUET)
            """
        )
        n = con.execute(f"SELECT count(*) FROM '{dst}'").fetchone()[0]
        print(f"{table}: {n} rows")


if __name__ == "__main__":
    main()
