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

Usage: python scripts/make_sf_scale.py [out_dir] [copies] [--skew]
       (default /tmp/sfscale10 10)

``--skew`` builds the ZIPF-HOT variant (round-9 verdict item 5): the
uniform replica plus one hot key per stress surface, each selected by
a deterministic base-key mod (SHIFT is a multiple of 100, so the same
base rows are hot in every copy — no RNG anywhere):

- ``orders``: o_orderkey % 100 == 7 → ``o_custkey = 1`` (~1% of all
  orders on ONE customer — per-customer top-k / argmax / revenue
  ranking skew);
- ``lineitem``: l_orderkey % 100 == 13 → ``l_partkey = 1`` (a hub part
  in the co-purchase graph — wedge fan-out stress for the triangle
  census); l_orderkey % 100 == 21 → ``l_extendedprice = 9999.99``
  (~1% of rows share ONE value — duplicated-first-key stress for the
  literal-boundary global rank, which its docstring concedes degrades
  toward fat partitions);
- ``events``: event_id % 100 == 3 → ``user_id = 1`` (one user owns
  ~1% of the stream — sessionize / transition-graph hub);
- ``documents``: doc_id % 100 == 11 → one fixed boilerplate text,
  IDENTICAL across copies (~1% of the corpus in one LSH band bucket /
  one shingle-df spike / one ExactSubstr hot gram — the caps' reason
  to exist);
- ``embeddings``: vec_id % 100 == 5 → the base vector of vec_id 1
  (~1% of vectors identical — one hot IVF cell / SRP bucket plus
  maximal tie density).

FK validity: custkey/partkey/user 1 exist in copy 0, so referential
joins stay exact.
"""

from __future__ import annotations

import os
import sys

import duckdb

SRC = "/root/testdata/sf0.1"
SHIFT = 10_000_000

#: ~60 tokens of fixed boilerplate — long enough that hot documents
#: carry full shingle/25-gram structure, identical in every copy.
HOT_TEXT = " ".join(f"hotboiler{i % 20} filler{i}" for i in range(30))

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


#: table -> {column: (predicate_sql, hot_value_sql)} applied AFTER the
#: key shift; predicates use the shifted column (SHIFT % 100 == 0, so
#: the same base rows are selected in every copy).
def _skew_rules(src: str) -> dict[str, dict[str, tuple[str, str]]]:
    return {
        "orders": {"o_custkey": ("o_orderkey % 100 = 7", "1")},
        "lineitem": {
            "l_partkey": ("l_orderkey % 100 = 13", "1"),
            "l_extendedprice": (
                "l_orderkey % 100 = 21", "CAST(9999.99 AS DOUBLE)"
            ),
        },
        "events": {"user_id": ("event_id % 100 = 3", "1")},
        "documents": {"text": ("doc_id % 100 = 11", f"'{HOT_TEXT}'")},
        "embeddings": {
            "embedding": (
                "vec_id % 100 = 5",
                f"(SELECT embedding FROM '{src}/embeddings.parquet' "
                "WHERE vec_id = 1)",
            )
        },
    }


def main() -> None:
    args = [a for a in sys.argv[1:] if a != "--skew"]
    skew = "--skew" in sys.argv[1:]
    out = args[0] if args else "/tmp/sfscale10"
    copies = int(args[1]) if len(args) > 1 else 10
    rules = _skew_rules(SRC) if skew else {}
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
                base = f"{c} + cp.c * {SHIFT}"
            elif t == "documents" and c == "text":
                base = (
                    "CASE WHEN cp.c = 0 THEN text "
                    "ELSE 'cp' || cp.c || ' ' || text END"
                )
            else:
                base = c
            hot_rule = rules.get(t, {}).get(c)
            if hot_rule is not None:
                pred, hot = hot_rule
                # predicate uses the UNSHIFTED source column; SHIFT is
                # a multiple of 100, so the selection is identical in
                # every copy — hot values are NOT shifted (one global
                # hot key, not one per copy)
                base = f"CASE WHEN {pred} THEN {hot} ELSE {base} END"
            sel.append(f"{base} AS {c}")
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
