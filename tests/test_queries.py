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


class TestLateRound8Properties:
    """Cheap invariants on the late-round-8 queries at sf0.001 (the
    cross-engine value check is scripts/check_oracle.py; these pin the
    properties a hash can't express)."""

    def test_shard_striping_balances_doc_counts(self, spark, sf_dir):
        rows = QUERIES["shard_striped_by_size"](spark, sf_dir).collect()
        assert [r["shard"] for r in rows] == list(range(8))
        n_docs = [r["n_docs"] for r in rows]
        assert max(n_docs) - min(n_docs) <= 1  # striped deal property
        # largest-first striping: token totals spread ≪ a sorted split
        sums = [r["sum_tokens"] for r in rows]
        assert max(sums) - min(sums) < sum(sums) / len(sums) * 0.5

    def test_integrity_audit_rules_and_known_fixture_facts(self, spark, sf_dir):
        rows = {r["rule"]: r["n_violations"]
                for r in QUERIES["integrity_audit_orders"](spark, sf_dir).collect()}
        assert set(rows) == {
            "childless_orders", "dup_lineitem_pk", "null_lineitem_pk",
            "orphan_lineitems", "totalprice_mismatch_gt_1c",
        }
        # known fixture facts: referential integrity holds and keys are
        # non-NULL, but the synthetic generator REUSES linenumbers —
        # the audit genuinely catches that (1161 dup pairs at sf0.001)
        assert rows["orphan_lineitems"] == 0
        assert rows["null_lineitem_pk"] == 0
        assert rows["dup_lineitem_pk"] > 0

    def test_classifier_auc_is_a_valid_rational(self, spark, sf_dir):
        r = QUERIES["classifier_auc_exact"](spark, sf_dir).collect()[0]
        assert r["n_pos"] > 0 and r["n_neg"] > 0
        assert 0 <= r["auc_num"] <= r["auc_den"]
        assert r["auc"] == round(r["auc_num"] / r["auc_den"], 6)
        # the synthetic corpus draws marker words independently of the
        # lang label, so the honest verdict is "near-random classifier"
        # (≈0.44 at sf0.001) — exactly the failure this QA gate exists
        # to report; pin the band rather than a separation claim
        assert 0.3 < r["auc"] < 0.7

    def test_pmi_topk_is_sorted_and_supported(self, spark, sf_dir):
        rows = QUERIES["collocations_pmi_topk"](spark, sf_dir).collect()
        assert 0 < len(rows) <= 20
        keys = [(-r["pmi_s"], r["bg"]) for r in rows]
        assert keys == sorted(keys)
        assert all(r["c_bg"] >= 5 for r in rows)
        assert all(" " in r["bg"] for r in rows)

    def test_embedding_dim_stats_covers_every_dimension(self, spark, sf_dir):
        rows = QUERIES["embedding_dim_stats"](spark, sf_dir).collect()
        assert [r["dim"] for r in rows] == list(range(64))
        n = rows[0]["n"]
        assert all(r["n"] == n for r in rows)  # rectangular embeddings


class TestErFactorization:
    def test_matches_bruteforce_raw_pairs(self, spark, sf_dir):
        """The value-factorized blocked ER (round 11: group to
        (head, rec, count), analytic n_d0, weighted distinct-pair
        join) must equal the definitionally-direct computation: every
        raw record pair in a head block, full unbounded levenshtein,
        unit-weighted histogram. Pins the factorization algebra — the
        C(c,2) within-group d=0 term, the ca*cb cross weight, the
        salted unordered-bucket-pair join meeting each distinct pair
        exactly once — against the O(n^2) ground truth at sf0.001."""
        from pyspark.sql import functions as F

        from pg2any_spark.sources.fixtures import load_table

        got = {
            tuple(r)
            for r in QUERIES["er_blocked_fuzzy_parts"](spark, sf_dir).collect()
        }

        parts = load_table(spark, "part", sf_dir).select(
            F.col("p_partkey").alias("k"),
            F.concat_ws(" ", "p_name", "p_brand").alias("rec"),
            F.split(F.col("p_name"), " ").getItem(0).alias("head"),
        )
        a = parts.select("head", F.col("k").alias("ka"), F.col("rec").alias("ra"))
        b = parts.select(
            F.col("head").alias("hb"), F.col("k").alias("kb"),
            F.col("rec").alias("rb"),
        )
        d = F.levenshtein("ra", "rb")
        hist = (
            a.join(
                b,
                (F.col("head") == F.col("hb")) & (F.col("ka") < F.col("kb")),
            )
            .select("head", d.alias("d"))
            .groupBy("head")
            .agg(
                F.count(F.lit(1)).cast("long").alias("n_candidates"),
                F.sum((F.col("d") == 0).cast("long")).cast("long").alias("n_d0"),
                F.sum((F.col("d") == 1).cast("long")).cast("long").alias("n_d1"),
                F.sum((F.col("d") == 2).cast("long")).cast("long").alias("n_d2"),
                F.sum((F.col("d") <= 2).cast("long")).cast("long")
                .alias("n_matches"),
            )
        )
        want = {tuple(r) for r in hist.select(
            "head", "n_candidates", "n_d0", "n_d1", "n_d2", "n_matches"
        ).collect()}
        assert got == want
        # the fuzzy tier must be exercised, not vacuously zero
        assert any(r[3] > 0 or r[4] > 0 for r in got)
