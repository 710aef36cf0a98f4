"""Round-7 determinism rework: integer-exact flags, scaled-integer
LM/DSIR scores, floor quantization, and the scalable global rank.

These guard the EQUIVALENCE claims the round-7 rewrites rest on:
- quality_fail_int ⟺ exact-rational q < 2/5 (Fraction arithmetic);
- lm_bigram_scores_scaled / dsir_log_ratio_scaled reproduce their
  float twins to the 1e-6 floor quantum;
- quantize_int8(rounding="floor") matches the closed-form reference
  and stays in range;
- similarity.global_rank == the single-task Window.orderBy rank.
"""

from __future__ import annotations

from fractions import Fraction

import pytest
from pyspark.sql import Window, functions as F

from pg2any_spark.operators import sampling as SA
from pg2any_spark.operators import similarity as S
from pg2any_spark.operators import text as T

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


def _exact_quality_lt_04(text: str) -> bool:
    """quality < 2/5 in exact rational arithmetic (the spec the BIGINT
    cross-multiplication must reproduce). Tokenization mirrors
    text.tokens: split trim(lower(text)) on \\s+ — splitting '' yields
    [''], so the ratio denominator is >= 1 while token_count is 0."""
    import re

    toks = re.split(r"\s+", text.strip().lower())
    n_tok = 0 if text.strip() == "" else len(toks)
    n_den = max(len(toks), 1)
    stops = {"the", "a", "is", "and", "of"}
    n_stop = sum(1 for t in toks if t in stops)
    n_punct = sum(1 for c in text if c in ".,;:!?")
    n_chars = max(len(text), 1)
    q = (
        Fraction(1, 2) * min(Fraction(n_tok, 50), Fraction(1))
        + Fraction(3, 10) * min(Fraction(5 * n_stop, n_den), Fraction(1))
        + Fraction(1, 5) * (1 - min(Fraction(5 * n_punct, n_chars), Fraction(1)))
    )
    return q < Fraction(2, 5)


def test_quality_fail_int_matches_exact_rational(docs):
    rows = (
        docs.limit(80)
        .select("text", T.quality_fail_int(F.col("text")).alias("fq"))
        .collect()
    )
    for r in rows:
        assert r["fq"] == _exact_quality_lt_04(r["text"]), r["text"][:60]


def test_quality_fail_int_blank_and_edge(spark):
    df = spark.createDataFrame(
        [("",), ("   ",), ("the of and is a",), ("!!!!!!",)], "text string"
    )
    got = [r["fq"] for r in df.select(T.quality_fail_int(F.col("text")).alias("fq")).collect()]
    want = [_exact_quality_lt_04(t) for t in ["", "   ", "the of and is a", "!!!!!!"]]
    assert got == want


def test_lm_scaled_matches_float_twin(docs):
    """nll_sum / 1e6 / n_bigrams == unrounded mean within the floor
    quantum (each per-bigram term loses < 1e-6, so the count-weighted
    mean loses < 1e-6 too)."""
    base = docs.limit(200)
    f = T.lm_bigram_scores(base).select("doc_id", "avg_nll", "n_bigrams")
    s = T.lm_bigram_scores_scaled(base).select(
        "doc_id", F.col("nll_sum"), F.col("n_bigrams").alias("n2")
    )
    joined = f.join(s, "doc_id").collect()
    assert joined
    for r in joined:
        assert r["n_bigrams"] == r["n2"]
        approx = r["nll_sum"] / 1e6 / r["n_bigrams"]
        # avg_nll is rounded to 4dp; floor loss < 1e-6 per occurrence
        assert abs(approx - r["avg_nll"]) < 5.1e-5, r


def test_dsir_scaled_matches_float_twin(docs):
    f = SA.dsir_log_ratio(docs, F.col("source") == "src0")
    s = SA.dsir_log_ratio_scaled(docs, F.col("source") == "src0")
    joined = (
        f.select("doc_id", "avg_llr", "n_toks")
        .join(s.select("doc_id", "llr_sum", F.col("n_toks").alias("n2")), "doc_id")
        .collect()
    )
    assert joined
    for r in joined:
        assert r["n_toks"] == r["n2"]
        approx = r["llr_sum"] / 1e6 / r["n_toks"]
        assert abs(approx - r["avg_llr"]) < 2e-6, r


def test_quantize_floor_matches_reference(spark):
    """Column-API floor quantization == the closed-form python
    reference (same IEEE op order), codes within [-128, 127], and
    x = mx clamps to 127 (256 → LEAST 255)."""
    import math

    vals = [
        ([0.0, 1.0, 0.5, 0.123456], ),
        ([1.0, 0.0, 0.999999, 0.25], ),
        ([0.5, 0.5, 0.0, 1.0], ),
    ]
    df = spark.createDataFrame(vals, "embedding array<double>").withColumn(
        "vec_id", F.monotonically_increasing_id()
    )
    mins = [0.0, 0.0, 0.0, 0.0]
    maxes = [1.0, 1.0, 1.0, 1.0]
    out = {
        tuple(r["embedding"]): r["code"]
        for r in S.quantize_int8(df, mins, maxes, rounding="floor").collect()
    }
    for (v,) in vals:
        want = [
            max(0, min(255, math.floor((x - 0.0) * 256 / 1.0))) - 128
            for x in v
        ]
        assert out[tuple(v)] == want
        assert all(-128 <= c <= 127 for c in out[tuple(v)])


def test_np_quantize_floor_matches_column(spark):
    import numpy as np

    rng = np.random.default_rng(7)
    X = rng.random((50, 8))
    mn = X.min(axis=0)
    mx = X.max(axis=0)
    np_codes = S._np_quantize(X, mn, mx, rounding="floor")
    df = spark.createDataFrame(
        [(i, [float(x) for x in row]) for i, row in enumerate(X)],
        "vec_id long, embedding array<double>",
    )
    col_codes = {
        r["vec_id"]: r["code"]
        for r in S.quantize_int8(
            df, [float(m) for m in mn], [float(m) for m in mx], rounding="floor"
        ).collect()
    }
    for i in range(len(X)):
        assert list(np_codes[i]) == col_codes[i], i


def test_global_rank_matches_window(spark):
    df = spark.range(0, 5000).select(
        F.col("id"),
        (F.col("id") % 97).alias("k"),
    )
    order = [F.col("k").desc(), F.col("id")]
    want = {
        r["id"]: r["rank"]
        for r in df.withColumn(
            "rank", F.row_number().over(Window.orderBy(*order))
        ).collect()
    }
    got = {
        r["id"]: r["rank"]
        for r in S.global_rank(
            df, order, rank_col="rank", boundary_key=-F.col("k")
        ).collect()
    }
    assert got == want


def test_global_rank_no_single_task_window(spark):
    """The corpus-side ranking window must be PARTITIONED (by the
    range-partition id) — the whole point of global_rank. The only
    unpartitioned window allowed is the cumulative offset over the
    ≤ P per-partition counts (bounded by construction), which shows
    up as exactly one SinglePartition exchange fed by an aggregate."""
    df = spark.range(0, 1000).select(
        F.col("id"), (F.col("id") % 7).alias("k")
    )
    ranked = S.global_rank(
        df, [F.col("k").desc(), F.col("id")], boundary_key=-F.col("k")
    )
    plan = ranked._jdf.queryExecution().executedPlan().toString()
    # the row_number window over the data is partitioned by __pid
    assert "windowspecdefinition(__pid" in plan
    # one SinglePartition exchange total: the P-row offsets window
    assert plan.count("Exchange SinglePartition") <= 1


def test_brute_force_arrow_query_cap(spark):
    """The Arrow brute-force path collects the query matrix to the
    driver — past max_queries it must fail loudly (chunk or use an
    index), never silently OOM a 1000-executor driver."""
    import pytest as _pt

    from pg2any_spark.operators.similarity import brute_force_topk_arrow

    emb = spark.range(10).selectExpr(
        "id AS vec_id", "array(cast(id as double), 1.0d) AS embedding"
    )
    with _pt.raises(ValueError, match="max_queries"):
        brute_force_topk_arrow(emb, emb, k=2, max_queries=5)
    # under the cap the path works unchanged
    out = brute_force_topk_arrow(emb, emb.limit(3), k=2)
    assert out.count() == 6


def test_quality_fail_int_property(spark):
    """Hypothesis sweep: the BIGINT cross-multiplication equals the
    exact-rational spec on arbitrary ASCII text (word soups spanning
    the clamp regimes: blank, punctuation-only, stopword-dense, long),
    batched through ONE Spark job per example set."""
    from hypothesis import HealthCheck, given, settings, strategies as st

    word = st.sampled_from(
        ["the", "a", "is", "and", "of", "fox", "jumps", "x!", "?!",
         "word.", ",,,", "lorem", "ipsum", "a,b;c", "zz"]
    )
    texts = st.lists(
        st.lists(word, min_size=0, max_size=120).map(" ".join),
        min_size=1,
        max_size=24,
    )

    @given(texts)
    @settings(
        max_examples=12,
        deadline=None,
        suppress_health_check=[HealthCheck.too_slow],
    )
    def check(batch):
        df = spark.createDataFrame([(t,) for t in batch], "text string")
        got = [
            r["fq"]
            for r in df.select(
                T.quality_fail_int(F.col("text")).alias("fq")
            ).collect()
        ]
        assert got == [_exact_quality_lt_04(t) for t in batch]

    check()
