"""Query registry sanity at sf0.001 (full Spark-vs-DuckDB parity runs
via scripts/check_oracle.py at sf0.01 — the driver's t2 replica)."""

from __future__ import annotations

import pytest

from pg2any_spark.plans.queries import ORACLES, QUERIES


def test_oracles_subset_of_queries():
    assert set(ORACLES) <= set(QUERIES)


# single source of truth shared with scripts/check_oracle.py — the
# canary exemption and the banned-type list must never drift apart
from pg2any_spark.plans.queries import (
    BANNED_ORACLE_TYPE_PREFIXES as _BANNED_TYPE_PREFIXES,
    HUGEINT_ALLOWED as _HUGEINT_ALLOWED,
)


def test_oracle_output_types_never_hugeint():
    """DESCRIBE every oracle in DuckDB and assert no final-output
    column is HUGEINT / UHUGEINT / DECIMAL. DuckDB types SUM(INTEGER)
    as HUGEINT (INT128) while Spark emits BIGINT; the driver's result
    hash is type-sensitive, so a bare integer SUM in an oracle's final
    SELECT is an automatic driver-red regardless of values (all 13
    round-7 reds). CAST(... AS BIGINT) every integer aggregate output;
    CAST float operands to DOUBLE (a bare 2.5 literal is DECIMAL)."""
    import duckdb

    from pg2any_spark.schemas import FIXTURE_TABLES

    con = duckdb.connect()
    sf = "/root/testdata/sf0.001"
    for t in FIXTURE_TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')"
        )
    bad = []
    for name, sql in sorted(ORACLES.items()):
        if name in _HUGEINT_ALLOWED:
            continue
        cols = con.execute(f"DESCRIBE {sql}").fetchall()
        for col, typ, *_ in cols:
            if typ.upper().startswith(_BANNED_TYPE_PREFIXES):
                bad.append(f"{name}.{col}: {typ}")
    assert not bad, (
        "oracle final-SELECT columns with driver-red types "
        "(wrap in CAST(... AS BIGINT/DOUBLE)): " + "; ".join(bad)
    )


def test_registry_nonempty():
    assert len(QUERIES) >= 20


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_runs(spark, sf_dir, name):
    df = QUERIES[name](spark, sf_dir)
    rows = df.collect()
    # every query must produce a stable, named schema
    assert all(not c.startswith("_") for c in df.columns)
    # queries other than highly-selective filters should return data at
    # the smoke SF; allow empty only for the known-selective ones
    if name not in {"setop_lapsed_customers", "anti_join_unsold_parts"}:
        assert len(rows) > 0, f"{name} returned no rows at sf0.001"


def test_approx_distinct_within_tolerance(spark):
    """approx_distinct_parts is rows-only at the driver gate (sketches
    are engine-specific), so pin its accuracy here: HLL++ at rsd=0.01
    must land within 5·rsd of the exact distinct counts."""
    from pg2any_spark.plans.queries import QUERIES

    sf = "/root/testdata/sf0.01"
    approx = QUERIES["approx_distinct_parts"](spark, sf).collect()[0]
    exact = QUERIES["distinct_supplier_part_counts"](spark, sf).collect()[0]
    for a, e in (
        (approx["approx_parts"], exact["n_parts"]),
        (approx["approx_supps"], exact["n_supps"]),
    ):
        assert abs(a - e) <= 5 * 0.01 * e, (a, e)


def test_approx_percentile_within_rank_tolerance(spark):
    """approx_percentile is rows-only at the driver gate; pin accuracy
    here: the approx p50/p95 must land inside the exact p45–p55 /
    p90–p99 value band per group (rank-error contract)."""
    from pyspark.sql import functions as F

    from pg2any_spark.plans.queries import QUERIES
    from pg2any_spark.sources.fixtures import load_table

    sf = "/root/testdata/sf0.01"
    approx = {
        r["o_orderpriority"]: (r["p50"], r["p95"])
        for r in QUERIES["approx_percentile_order_value"](spark, sf).collect()
    }
    exact = {
        r["o_orderpriority"]: (r["p45"], r["p55"], r["p90"], r["p99"])
        for r in load_table(spark, "orders", sf)
        .groupBy("o_orderpriority")
        .agg(
            F.percentile("o_totalprice", 0.45).alias("p45"),
            F.percentile("o_totalprice", 0.55).alias("p55"),
            F.percentile("o_totalprice", 0.90).alias("p90"),
            F.percentile("o_totalprice", 0.99).alias("p99"),
        )
        .collect()
    }
    assert approx.keys() == exact.keys() and approx
    for k, (p50, p95) in approx.items():
        p45, p55, p90, p99 = exact[k]
        assert p45 <= p50 <= p55, (k, p50, p45, p55)
        assert p90 <= p95 <= p99, (k, p95, p90, p99)
