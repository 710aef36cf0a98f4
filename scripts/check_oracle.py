#!/usr/bin/env python
"""Local replica of the driver's t2 correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` twin
on DuckDB over the same parquet tables, then compares row count,
column names, and an order-insensitive value hash (columns sorted by
name, floats canonicalized).

Round 8: the gate is also TYPE-sensitive, like the driver's. The
round-7 judge proved the driver hashes HUGEINT differently from
BIGINT (DuckDB types SUM(INTEGER) as INT128; plain-Python fetchall
erased the difference, which is why no driver-red ever reproduced
here). Every oracle is now DESCRIBEd and any HUGEINT / UHUGEINT /
DECIMAL final-output column is a failure — except the deliberate
``canary_hugeint_bare``, whose whole point is to carry one.

Usage: python scripts/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import math
import sys
import time

sys.path.insert(0, "/root/repo")

import duckdb  # noqa: E402

import __spark_entry__ as entry_mod  # noqa: E402
from pg2any_spark.schemas import FIXTURE_TABLES  # noqa: E402
from pg2any_spark.session import get_spark  # noqa: E402


from pg2any_spark.plans.queries import (  # noqa: E402
    BANNED_ORACLE_TYPE_PREFIXES as BANNED_ORACLE_TYPES,
    HUGEINT_ALLOWED,
)


def banned_type_cols(con, name, sql):
    if name in HUGEINT_ALLOWED:
        return []
    return [
        f"{col}:{typ}"
        for col, typ, *_ in con.execute(f"DESCRIBE {sql}").fetchall()
        if typ.upper().startswith(BANNED_ORACLE_TYPES)
    ]


def canon_cell(v):
    import decimal

    if v is None:
        return "NULL"
    if isinstance(v, decimal.Decimal):
        v = float(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # 12 significant digits: immune to fp noise, strict enough to
        # catch real value bugs.
        return f"{v:.12g}"
    if isinstance(v, bool):
        return str(int(v))
    return str(v)


def table_hash(rows, columns):
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    lines = sorted("\x1f".join(canon_cell(r[i]) for i in order) for r in rows)
    h = hashlib.sha256()
    for line in lines:
        h.update(line.encode())
        h.update(b"\n")
    return h.hexdigest()


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark(app_name="oracle-check")
    # Guardrails for synthetic large-SF batteries: a handful of oracles
    # are deliberately brute-force recall baselines (all-pairs cosine,
    # candidate x shingle intersections, transitive closures) that are
    # fine at driver SFs but explode at 10x+. A memory cap makes DuckDB
    # spill instead of OOMing the box, and an optional per-oracle
    # timeout (SPARK_GRAFT_ORACLE_TIMEOUT seconds) interrupts the query
    # and records a failure instead of wedging the whole battery.
    import os as _os

    oracle_timeout = float(_os.environ.get("SPARK_GRAFT_ORACLE_TIMEOUT", "0"))

    def fresh_con():
        c = duckdb.connect()
        c.execute(
            f"SET memory_limit='{_os.environ.get('SPARK_GRAFT_DUCK_MEM', '48GB')}'"
        )
        for t in FIXTURE_TABLES:
            c.execute(
                f"CREATE VIEW {t} AS "
                f"SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
            )
        return c

    con = fresh_con()

    def run_oracle(sql):
        nonlocal con
        if not oracle_timeout:
            res = con.execute(sql)
            return [d[0] for d in res.description], res.fetchall()
        import threading

        out, err = [], []
        this_con = con

        def work():
            try:
                res = this_con.execute(sql)
                out.append(([d[0] for d in res.description], res.fetchall()))
            except Exception as exc:  # noqa: BLE001
                err.append(exc)

        th = threading.Thread(target=work, daemon=True)
        th.start()
        th.join(oracle_timeout)
        if th.is_alive():
            this_con.interrupt()
            th.join(30)
            if th.is_alive():
                # The worker ignored the interrupt: the old connection
                # may still be in use by the stuck thread, so abandon
                # it and rebuild — running the next oracle on a
                # connection shared with a live worker is a race that
                # can crash the whole battery.
                con = fresh_con()
            raise TimeoutError(
                f"oracle exceeded {oracle_timeout:.0f}s (interrupted)"
            )
        if err:
            raise err[0]
        return out[0]

    queries = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    failures = []
    for name, fn in queries.items():
        if only and name not in only:
            continue
        t0 = time.time()
        # one crashing query must record a failure, not abort the gate
        try:
            sdf = fn(spark, sf_dir)
            srows = sdf.collect()
            scols = sdf.columns
        except Exception as exc:  # noqa: BLE001
            elapsed = time.time() - t0
            msg = str(exc).splitlines()[0][:200]
            failures.append((name, f"spark error: {msg}"))
            print(f"  ✗ {name}: SPARK ERROR {msg} [{elapsed:.1f}s]")
            continue
        elapsed = time.time() - t0
        if name not in oracles:
            print(f"  ~ {name}: rows={len(srows)} (rows-only, no oracle) [{elapsed:.1f}s]")
            if len(srows) == 0:
                failures.append((name, "0 rows"))
            continue
        try:
            dcols, drows = run_oracle(oracles[name])
        except Exception as exc:  # noqa: BLE001
            msg = str(exc).splitlines()[0][:200]
            failures.append((name, f"oracle error: {msg}"))
            print(f"  ✗ {name}: ORACLE ERROR {msg} [{elapsed:.1f}s]")
            continue
        problems = []
        banned = banned_type_cols(con, name, oracles[name])
        if banned:
            problems.append(f"oracle output typed driver-red: {banned}")
        if len(srows) != len(drows):
            problems.append(f"rowcount spark={len(srows)} duckdb={len(drows)}")
        if sorted(scols) != sorted(dcols):
            problems.append(f"cols spark={sorted(scols)} duckdb={sorted(dcols)}")
        else:
            sh, dh = table_hash(srows, scols), table_hash(drows, dcols)
            if sh != dh:
                problems.append("value-hash mismatch")
        if problems:
            failures.append((name, "; ".join(problems)))
            print(f"  ✗ {name}: {'; '.join(problems)} [{elapsed:.1f}s]")
        else:
            print(f"  ✓ {name}: rows={len(srows)} hash ok [{elapsed:.1f}s]")

    print()
    if failures:
        print(f"FAIL: {len(failures)} of {len(queries)} queries mismatch")
        for name, why in failures:
            print(f"  - {name}: {why}")
        sys.exit(1)
    print(f"OK: all {len(queries) if not only else len(only)} checked queries match")


if __name__ == "__main__":
    main()
