"""Synthesize an ~sf1 dataset (10x sf0.1) for the stress bench.

The driver ships sf{0.001,0.01,0.1}; the sf1 stress snapshot (round-3
verdict "next #6") needs 10x more rows to surface superlinear constant
factors (candidate-pair growth in jaccard/LSH, coverage recompute).  Each
fact table is replicated 10x with SHIFTED keys (primary and foreign keys
move together, so join fan-outs and per-key cardinalities stay realistic
instead of creating 10x hot keys); document text gets a per-copy suffix so
the dedup family sees near-duplicates rather than degenerate exact 10x
clones; dimension tables (nation/region) stay as-is.

Output: spark-warehouse/fixtures/sf1_synth/*.parquet (repo-local; name
contains "sf1" so bench.py reports sf=1).
"""

from __future__ import annotations

import os
import sys

import duckdb

SRC = "/root/testdata/sf0.1"
COPIES = 10

# table -> (key columns to shift, shift stride)
SHIFTS = {
    "customer": ({"c_custkey": 15000}, ""),
    "orders": ({"o_orderkey": 150000, "o_custkey": 15000}, ""),
    "lineitem": (
        {"l_orderkey": 150000, "l_partkey": 20000, "l_suppkey": 1000},
        "",
    ),
    "part": ({"p_partkey": 20000}, ""),
    "supplier": ({"s_suppkey": 1000}, ""),
    "events": ({"event_id": 100000, "user_id": 1000}, ""),
    "documents": (
        {"doc_id": 5000},
        ", text || ' c' || CAST(r.i AS VARCHAR) AS text",
    ),
    "embeddings": ({"vec_id": 2000}, ""),
}
COPY_ONLY = ("nation", "region")


def main(out_dir: str) -> None:
    os.makedirs(out_dir, exist_ok=True)
    con = duckdb.connect()
    for t in COPY_ONLY:
        con.sql(
            f"COPY (SELECT * FROM read_parquet('{SRC}/{t}.parquet'))"
            f" TO '{out_dir}/{t}.parquet' (FORMAT PARQUET)"
        )
        print(t, "copied")
    for t, (shifts, extra) in SHIFTS.items():
        repl = ", ".join(
            f"t.{col} + r.i * {stride} AS {col}" for col, stride in shifts.items()
        )
        replaced = f"* REPLACE ({repl}{extra})"
        con.sql(
            f"COPY (SELECT {replaced} FROM read_parquet('{SRC}/{t}.parquet') t,"
            f" range({COPIES}) r(i))"
            f" TO '{out_dir}/{t}.parquet' (FORMAT PARQUET)"
        )
        n = con.sql(
            f"SELECT COUNT(*) FROM read_parquet('{out_dir}/{t}.parquet')"
        ).fetchone()[0]
        print(t, n)


if __name__ == "__main__":
    out = (
        sys.argv[1]
        if len(sys.argv) > 1
        else os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "spark-warehouse",
            "fixtures",
            "sf1_synth",
        )
    )
    main(out)
