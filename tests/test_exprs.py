"""eval_once (functions/exprs.py): the collapse barrier must be
value-identical for any input type AND actually stop the optimizer
from inlining the wrapped expression into each downstream reference —
the round-11 md5-per-aggregate-reference regression class."""

from __future__ import annotations

from pyspark.sql import functions as F

from pg2any_spark.functions.exprs import eval_once
from pg2any_spark.operators.dedup import minhash_signatures, simhash


def test_value_identity_across_types(spark):
    df = spark.range(5).select(
        F.col("id"),
        F.col("id").cast("double").alias("d"),
        F.concat(F.lit("s"), F.col("id")).alias("s"),
        F.array(F.col("id"), F.col("id") + 1).alias("arr"),
    )
    out = df.select(
        (eval_once(F.col("id") * 2) == F.col("id") * 2).alias("a"),
        (eval_once(F.col("d") / 3) == F.col("d") / 3).alias("b"),
        (eval_once(F.col("s")) == F.col("s")).alias("c"),
        (eval_once(F.col("arr")) == F.col("arr")).alias("d"),
    ).collect()
    for row in out:
        assert all(v is True for v in row), row


def test_null_values_pass_through(spark):
    df = spark.range(3).select(
        F.when(F.col("id") == 1, F.col("id")).alias("maybe")
    )
    got = [r[0] for r in df.select(eval_once(F.col("maybe"))).collect()]
    assert sorted(got, key=lambda x: (x is None, x)) == [1, None, None]


def test_barrier_blocks_inlining_in_aggregates(spark):
    """An eval_once-projected column referenced by many aggregate
    expressions must appear ONCE in the optimized plan, not once per
    reference (the simhash votes carried 60 md5 copies without it)."""
    df = spark.range(100).select(
        (F.col("id") % 10).alias("k"),
        eval_once(
            F.conv(F.substring(F.md5(F.col("id").cast("string")), 1, 8), 16, 10)
            .cast("long")
        ).alias("h"),
    )
    agg = df.groupBy("k").agg(
        *[
            F.sum(
                F.when(F.shiftright(F.col("h"), j).bitwiseAND(1) == 1, 1).otherwise(-1)
            ).alias(f"v{j}")
            for j in range(16)
        ]
    )
    plan = agg._jdf.queryExecution().optimizedPlan().toString()
    assert plan.count("md5") == 1, f"md5 duplicated in plan: {plan.count('md5')}"


def test_simhash_and_minhash_plans_hash_once(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    sh = simhash(docs, "doc_id", "text", 60)
    assert sh._jdf.queryExecution().optimizedPlan().toString().count("md5") == 1
    ms = minhash_signatures(docs, "doc_id", "text", 12, 3)
    # one md5 per digest half (h1, h2) — was 2 per hash function (24)
    assert ms._jdf.queryExecution().optimizedPlan().toString().count("md5") == 2


def test_simhash_values_unchanged_by_barrier(spark, sf_dir):
    """The barrier must not change fingerprints: recompute one doc's
    60-bit simhash with a barrier-free reference expression."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(50)
    got = {r["doc_id"]: r["simhash"] for r in simhash(docs, "doc_id", "text", 60).collect()}

    toks = docs.select(
        "doc_id",
        F.explode(F.split(F.trim(F.lower(F.col("text"))), r"\s+")).alias("tok"),
    ).select(
        "doc_id",
        F.conv(F.substring(F.md5("tok"), 1, 15), 16, 10).cast("long").alias("h"),
    )
    votes = toks.groupBy("doc_id").agg(
        *[
            F.sum(
                F.when(F.shiftright(F.col("h"), j).bitwiseAND(1) == 1, 1).otherwise(-1)
            ).alias(f"v{j}")
            for j in range(60)
        ]
    )
    fp = None
    for j in range(60):
        t = F.when(F.col(f"v{j}") > 0, F.lit(1 << j)).otherwise(F.lit(0))
        fp = t if fp is None else (fp + t)
    want = {
        r["doc_id"]: r["simhash"]
        for r in votes.select("doc_id", fp.cast("long").alias("simhash")).collect()
    }
    assert got == want
