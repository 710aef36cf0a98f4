#!/usr/bin/env python
"""Synthesize a larger fixture by key-shifted replication of sf0.1.

The driver generates sf0.001/0.01/0.1; every scale claim in SCALE.md
beyond that is a slope extrapolation. This script manufactures a
second measured point (default 10× ⇒ "sf1": ~6M lineitem rows) by
unioning N key-shifted copies of sf0.1 — deterministic, derived
entirely from driver data, written to scratch space (never to
/root/testdata):

- every table's keys (primary + foreign) shift by copy·10⁷, far below
  the planted-id ranges (10¹²/3·10¹²) and above every fixture max, so
  referential joins stay exact per copy and copies never collide;
- region/nation are dimensions and copy once, unshifted (nationkeys
  are shared);
- document text gets a per-copy marker token prefixed for copies ≥ 1
  so the corpus does not become 10 exact clones of itself (which
  would cap away every ExactSubstr anchor and inflate every dedup
  family by construction); copy 0 stays verbatim, so natural
  duplicates survive;
- embeddings replicate verbatim (shifted vec_id): ANN ties broken by
  vec_id everywhere, so 10 identical vectors are a legitimate — and
  adversarial — tie-density stress;
- timestamps are untouched: 10× events in the same range = 10× rate,
  which is exactly the densification a window/sessionize stress
  wants.

Usage: python scripts/make_sf_scale.py [out_dir] [copies]
       (default /tmp/sfscale10 10)
"""

from __future__ import annotations

import os
import sys

import duckdb

SRC = "/root/testdata/sf0.1"
SHIFT = 10_000_000

#: table -> list of key columns to shift by copy*SHIFT
SHIFTS = {
    "customer": ["c_custkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "part": ["p_partkey"],
    "supplier": ["s_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
DIMENSIONS = ["region", "nation"]


def main() -> None:
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sfscale10"
    copies = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    for t in DIMENSIONS:
        con.execute(
            f"COPY (SELECT * FROM '{SRC}/{t}.parquet') "
            f"TO '{out}/{t}.parquet' (FORMAT PARQUET)"
        )
        print(f"# {t}: copied once")
    for t, keys in SHIFTS.items():
        cols = [
            c[0]
            for c in con.execute(
                f"DESCRIBE SELECT * FROM '{SRC}/{t}.parquet'"
            ).fetchall()
        ]
        sel = []
        for c in cols:
            if c in keys:
                sel.append(f"{c} + cp.c * {SHIFT} AS {c}")
            elif t == "documents" and c == "text":
                sel.append(
                    "CASE WHEN cp.c = 0 THEN text "
                    "ELSE 'cp' || cp.c || ' ' || text END AS text"
                )
            else:
                sel.append(c)
        con.execute(
            f"COPY (SELECT {', '.join(sel)} "
            f"FROM '{SRC}/{t}.parquet', "
            f"(SELECT UNNEST(range({copies})) AS c) AS cp) "
            f"TO '{out}/{t}.parquet' (FORMAT PARQUET)"
        )
        n = con.execute(
            f"SELECT COUNT(*) FROM '{out}/{t}.parquet'"
        ).fetchone()[0]
        print(f"# {t}: {n} rows ({copies} shifted copies)")


if __name__ == "__main__":
    main()
