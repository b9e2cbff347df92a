"""Synthesize a k-fold scale-up of an existing fixture dir for SCALING
measurements only (VERDICT r15 ask #7: at sf0.1 per-key times are
job-overhead-bound, so the 8-vs-32-core ratio cannot distinguish serial
from parallel code; probing needs more data per key).

NOT a bench/oracle fixture: the output lives under /tmp, is never read
by bench.py defaults, and no committed record keys on it. Keys are
shifted per replica so intra-replica joins (orders<->lineitem,
customer<->orders, doc/vec/event ids) stay consistent; dimension tables
(region, nation, part, supplier) are copied unshifted.

Usage: python scripts/gen_scaleup.py [--src /root/testdata/sf0.1]
           [--out /tmp/bristle_scaleup_x10] [--k 10]
"""

from __future__ import annotations

import argparse
import os

import duckdb


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default="/tmp/bristle_scaleup_x10")
    ap.add_argument("--k", type=int, default=10)
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)
    con = duckdb.connect()
    con.execute(f"SET threads TO {max(4, os.cpu_count() // 2)}")

    def src(t: str) -> str:
        return f"read_parquet('{args.src}/{t}.parquet')"

    def write(t: str, sql: str) -> None:
        con.execute(
            f"COPY ({sql}) TO '{args.out}/{t}.parquet' (FORMAT PARQUET)"
        )
        print("wrote", t)

    # replica index table
    con.execute(f"CREATE TEMP TABLE reps AS SELECT unnest(range({args.k})) AS r")

    for t in ("region", "nation", "part", "supplier"):
        write(t, f"SELECT * FROM {src(t)}")

    # key strides: next power of 10 above the max id keeps shifted keys
    # readable and collision-free
    def stride(tbl: str, col: str) -> int:
        m = con.execute(f"SELECT max({col}) FROM {src(tbl)}").fetchone()[0]
        s = 1
        while s <= m:
            s *= 10
        return s

    ck = stride("customer", "c_custkey")
    ok = stride("orders", "o_orderkey")
    write(
        "customer",
        f"SELECT * EXCLUDE (r) REPLACE (c_custkey + r * {ck} AS c_custkey) "
        f"FROM {src('customer')}, reps",
    )
    write(
        "orders",
        f"SELECT * EXCLUDE (r) REPLACE (o_orderkey + r * {ok} AS o_orderkey, "
        f"o_custkey + r * {ck} AS o_custkey) "
        f"FROM {src('orders')}, reps",
    )
    write(
        "lineitem",
        f"SELECT * EXCLUDE (r) REPLACE (l_orderkey + r * {ok} AS l_orderkey) "
        f"FROM {src('lineitem')}, reps",
    )
    dk = stride("documents", "doc_id")
    write(
        "documents",
        f"SELECT * EXCLUDE (r) REPLACE (doc_id + r * {dk} AS doc_id) "
        f"FROM {src('documents')}, reps",
    )
    vk = stride("embeddings", "vec_id")
    write(
        "embeddings",
        f"SELECT * EXCLUDE (r) REPLACE (vec_id + r * {vk} AS vec_id) "
        f"FROM {src('embeddings')}, reps",
    )
    ek = stride("events", "event_id")
    write(
        "events",
        f"SELECT * EXCLUDE (r) REPLACE (event_id + r * {ek} AS event_id) "
        f"FROM {src('events')}, reps",
    )
    print("done:", args.out)


if __name__ == "__main__":
    main()
