"""Deterministic sampling/splitting/mixing + duplicate-group
resolution (connected components).

The properties that matter for a training pipeline:
- split/sample decisions are pure functions of the row key
  (re-run-stable, growth-stable — no eval contamination);
- connected components resolves transitive duplicate chains, not just
  pairs.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from pg2any_spark.operators import dedup as D
from pg2any_spark.operators import sampling as SA


# ---------------------------------------------------------------------------
# connected components
# ---------------------------------------------------------------------------


def _cc_map(pairs_df):
    return {
        r["id"]: r["component"]
        for r in D.connected_components(pairs_df).collect()
    }


def test_cc_chain_resolves_transitively(spark):
    # A-B, B-C, C-D: one component rooted at min id, though A!~D.
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4)], "id_a long, id_b long"
    )
    comp = _cc_map(pairs)
    assert comp == {1: 1, 2: 1, 3: 1, 4: 1}


def test_cc_multiple_components(spark):
    pairs = spark.createDataFrame(
        [(10, 11), (11, 12), (20, 21), (30, 31), (31, 30)],
        "id_a long, id_b long",
    )
    comp = _cc_map(pairs)
    assert comp == {10: 10, 11: 10, 12: 10, 20: 20, 21: 20, 30: 30, 31: 30}


def test_cc_long_path_converges(spark):
    # path graph of 12 nodes: worst case for label propagation
    # (diameter 11) — still must converge within max_iter.
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(100, 111)], "id_a long, id_b long"
    )
    comp = _cc_map(pairs)
    assert set(comp.values()) == {100}


def test_dup_groups_sizes(spark):
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (7, 9)], "id_a long, id_b long"
    )
    rows = {
        r["group_id"]: (r["group_size"], r["max_member_id"])
        for r in D.dup_groups(pairs).collect()
    }
    assert rows == {1: (3, 3), 7: (2, 9)}


# ---------------------------------------------------------------------------
# deterministic split / sample / mix
# ---------------------------------------------------------------------------


def _docs(spark, n=400):
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 4).cast("string").alias("src"),
    )


def test_split_is_deterministic_and_exhaustive(spark):
    docs = _docs(spark)
    a = SA.assign_split(docs, "doc_id", eval_ppm=100_000, test_ppm=100_000)
    b = SA.assign_split(docs, "doc_id", eval_ppm=100_000, test_ppm=100_000)
    assert a.collect() == b.collect()
    counts = {r["split"]: r["n"] for r in a.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert sum(counts.values()) == 400
    assert set(counts) == {"train", "eval", "test"}
    # 10%/10%/80% within loose tolerance at n=400
    assert counts["train"] > counts["eval"]
    assert counts["train"] > counts["test"]


def test_split_stable_under_corpus_growth(spark):
    """A row's split never changes when more rows are added — the
    anti-contamination property randomSplit lacks."""
    small = SA.assign_split(_docs(spark, 100), "doc_id")
    big = SA.assign_split(_docs(spark, 400), "doc_id")
    small_map = {r["doc_id"]: r["split"] for r in small.collect()}
    big_map = {r["doc_id"]: r["split"] for r in big.collect()}
    for k, v in small_map.items():
        assert big_map[k] == v


def test_stratified_sample_respects_fractions(spark):
    docs = _docs(spark, 1000)
    out = SA.stratified_hash_sample(
        docs, "doc_id", "src", {"0": 1.0, "1": 0.0}, default_fraction=0.5
    )
    counts = {r["src"]: r["n"] for r in out.groupBy("src").agg(F.count("*").alias("n")).collect()}
    assert counts["0"] == 250          # fraction 1.0 keeps all
    assert "1" not in counts           # fraction 0.0 drops all
    for s in ("2", "3"):               # default 0.5 ± sampling noise
        assert 75 < counts[s] < 175


def test_stratified_sample_is_a_pure_filter(spark):
    """Plan check: no shuffle, no UDF — a single codegen'd
    Filter over the scan."""
    docs = _docs(spark, 100)
    out = SA.stratified_hash_sample(docs, "doc_id", "src", {"0": 0.5})
    plan = out._sc._jvm.PythonSQLUtils.explainString(
        out._jdf.queryExecution(), "simple"
    )
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan


def test_weighted_mix_union_and_provenance(spark):
    docs = _docs(spark, 200)
    mixed = SA.weighted_mix(
        {"all": (docs, 1.0), "half": (docs, 0.5)}, "doc_id"
    )
    counts = {
        r["mix_source"]: r["n"]
        for r in mixed.groupBy("mix_source").agg(F.count("*").alias("n")).collect()
    }
    assert counts["all"] == 200
    assert 60 < counts["half"] < 140
    # same hash, same salt -> "half" rows are a subset of "all" rows
    half_ids = {r["doc_id"] for r in mixed.filter("mix_source = 'half'").collect()}
    all_ids = {r["doc_id"] for r in mixed.filter("mix_source = 'all'").collect()}
    assert half_ids <= all_ids


class TestDecontaminate:
    def test_flags_holdout_fingerprints(self, spark):
        from pyspark.sql import functions as F

        from pg2any_spark.operators.sampling import assign_split, decontaminate_train

        # synthetic corpus big enough that ~2% lands in holdout
        docs = spark.range(3000).select(
            F.col("id").alias("doc_id"),
            F.concat(F.lit("text "), (F.col("id") % 500).cast("string")).alias("text"),
        )
        out = decontaminate_train(docs, "doc_id", "text").cache()
        try:
            tagged = assign_split(docs, "doc_id")
            n_train = tagged.filter("split = 'train'").count()
            assert out.count() == n_train  # all train rows come back, flagged
            # every contaminated row's fingerprint really is in the holdout
            holdout_fps = {
                r["fp"]
                for r in tagged.filter("split != 'train'")
                .select(F.md5(F.trim(F.regexp_replace(F.lower("text"), r"\s+", " "))).alias("fp"))
                .distinct()
                .collect()
            }
            for r in out.collect():
                assert (r["fp"] in holdout_fps) == r["contaminated"]
            assert out.filter("contaminated").count() > 0  # 6 dup groups of 500 keys
        finally:
            out.unpersist()


class TestTemperatureMix:
    def test_flattens_distribution(self, spark):
        """alpha=0.5 must downsample the dominant stratum hardest and
        keep small strata (nearly) whole; alpha=1 must be a uniform
        budget_frac cut."""
        from pyspark.sql import functions as F

        from pg2any_spark.operators.sampling import temperature_mix

        rows = [(i, "big" if i < 900 else "small") for i in range(1000)]
        df = spark.createDataFrame(rows, "doc_id long, src string")
        kept = temperature_mix(
            df, "doc_id", "src", alpha=0.5, budget_frac=0.5
        )
        got = {
            r["src"]: r["n"]
            for r in kept.groupBy("src").agg(F.count("*").alias("n")).collect()
        }
        # expected keep fractions: w = n^0.5; T = 500
        # big: 500*30/(30+10)/900 = 0.4167; small: 500*10/40/100 = 1.0 (capped)
        assert got["small"] == 100  # small stratum kept whole
        assert 330 <= got["big"] <= 420  # ~0.4167 * 900, hash noise
        # dominant stratum keep-rate < overall budget, small >> budget
        assert got["big"] / 900 < 0.5 < got["small"] / 100

    def test_alpha_one_is_uniform_budget(self, spark):
        from pg2any_spark.operators.sampling import temperature_mix

        rows = [(i, "a" if i % 3 else "b") for i in range(3000)]
        df = spark.createDataFrame(rows, "doc_id long, src string")
        kept = temperature_mix(df, "doc_id", "src", alpha=1.0, budget_frac=0.3)
        n = kept.count()
        assert abs(n - 900) < 90  # 30% of 3000 ± hash noise

    def test_null_stratum_not_dropped(self, spark):
        """Rows with a NULL stratum form a real stratum: they must be
        sampled at their computed keep-rate, not silently dropped by a
        null-rejecting equi-join."""
        from pg2any_spark.operators.sampling import temperature_mix

        rows = [(i, "a" if i < 500 else None) for i in range(1000)]
        df = spark.createDataFrame(rows, "doc_id long, src string")
        kept = temperature_mix(df, "doc_id", "src", alpha=1.0, budget_frac=0.5)
        n_null = kept.filter("src IS NULL").count()
        assert 200 <= n_null <= 300  # ~50% of 500 ± hash noise, never 0


class TestPackSequences:
    def test_contiguous_assignment_and_totals(self, spark):
        """Every document lands in the sequence where its token stream
        starts; per-group totals are preserved; sequences are
        contiguous from 0."""
        from pg2any_spark.operators.sampling import pack_sequences

        docs = [
            ("a", i, " ".join(["w"] * 100)) for i in range(1, 11)
        ] + [("b", 1, " ".join(["w"] * 50)), ("b", 2, "")]
        df = spark.createDataFrame(docs, "source string, doc_id long, text string")
        out = pack_sequences(df, budget=256).collect()
        by_group = {}
        for r in out:
            by_group.setdefault(r["source"], []).append(r)
        # group a: 10 docs x 100 tokens, so doc i starts at offset
        # 100*i and belongs to sequence floor(start / 256)
        a = {r["seq_id"]: (r["n_docs"], r["seq_tokens"]) for r in by_group["a"]}
        starts = [100 * i for i in range(10)]
        import collections
        want = collections.Counter(s // 256 for s in starts)
        assert {k: v[0] for k, v in a.items()} == dict(want)
        assert sum(v[1] for v in a.values()) == 1000
        assert min(a) == 0 and max(a) == max(want)
        b = {r["seq_id"]: r for r in by_group["b"]}
        assert b[0]["n_docs"] == 2 and b[0]["seq_tokens"] == 50  # empty doc = 0

    def test_single_shuffle_plan(self, spark, sf_dir):
        """The running-sum window and the per-sequence aggregate share
        one group partitioning (plus the output sort)."""
        from pg2any_spark.operators.sampling import pack_sequences
        from pg2any_spark.sources.fixtures import load_table

        df = pack_sequences(load_table(spark, "documents", sf_dir), budget=2048)
        sc = df.sparkSession.sparkContext
        plan = sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "simple"
        )
        assert plan.count("Exchange hashpartitioning") == 1, plan


# ---------------------------------------------------------------------------
# DSIR importance scores
# ---------------------------------------------------------------------------


class TestDsir:
    def _toy(self, spark):
        # target docs share the marker token "wiki"; raw-only docs
        # share "crawl". Mixed doc carries both.
        rows = [
            (1, "wiki facts wiki science", True),
            (2, "wiki history wiki math", True),
            (3, "crawl spam crawl ads", False),
            (4, "crawl junk crawl noise", False),
            (5, "wiki crawl", False),
        ]
        return spark.createDataFrame(rows, "doc_id long, text string, tgt boolean")

    def test_target_like_docs_score_highest(self, spark):
        df = self._toy(spark)
        scored = {
            r["doc_id"]: r["avg_llr"]
            for r in SA.dsir_log_ratio(df, F.col("tgt"), n_buckets=64).collect()
        }
        # target-marker docs above the mixed doc, mixed above raw-only
        assert min(scored[1], scored[2]) > scored[5] > max(scored[3], scored[4])

    def test_score_is_length_normalized(self, spark):
        # avg (not sum) over tokens: tripling a document's content
        # must not change its score — selection can't just prefer
        # long documents.
        df = spark.createDataFrame(
            [
                (1, "wiki facts", True),
                (2, "crawl spam", False),
                (3, "wiki facts wiki facts wiki facts", True),
            ],
            "doc_id long, text string, tgt boolean",
        )
        scored = {
            r["doc_id"]: r["avg_llr"]
            for r in SA.dsir_log_ratio(df, F.col("tgt"), n_buckets=64).collect()
        }
        assert abs(scored[1] - scored[3]) < 1e-12

    def test_weight_join_is_broadcast(self, spark):
        # the hashing trick's contract: the weight table is <=
        # n_buckets rows, so the scoring join must be broadcast —
        # never a corpus-sized shuffle on the feature key.
        plan = SA.dsir_log_ratio(
            self._toy(spark), F.col("tgt"), n_buckets=64
        )._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan


class TestUpsampleEpochs:
    def _df(self, spark):
        from pyspark.sql import Row

        return spark.createDataFrame(
            [Row(doc_id=i, src="x" if i < 50 else "y") for i in range(100)]
        )

    def test_whole_epochs_exact(self, spark):
        from pg2any_spark.operators.sampling import upsample_epochs

        out = upsample_epochs(
            self._df(spark), "doc_id", "src", {"x": 2.0, "y": 1.0}
        ).collect()
        per = {}
        for r in out:
            per.setdefault(r["doc_id"], []).append(r["epoch"])
        for i in range(50):
            assert sorted(per[i]) == [0, 1]
        for i in range(50, 100):
            assert per[i] == [0]

    def test_fractional_epochs_deterministic(self, spark):
        from pg2any_spark.operators.sampling import upsample_epochs

        df = self._df(spark)
        a = sorted(
            (r["doc_id"], r["epoch"])
            for r in upsample_epochs(df, "doc_id", "src", {"x": 1.5}).collect()
        )
        b = sorted(
            (r["doc_id"], r["epoch"])
            for r in upsample_epochs(df, "doc_id", "src", {"x": 1.5}).collect()
        )
        assert a == b
        counts = {}
        for i, _ in a:
            counts[i] = counts.get(i, 0) + 1
        x_total = sum(v for i, v in counts.items() if i < 50)
        # fractional half: between 50 (none extra) and 100 (all extra),
        # strictly both copies present somewhere at n=50
        assert 50 <= x_total <= 100
        assert {counts[i] for i in range(50)} <= {1, 2}
        # unmapped stratum gets default 1.0 epoch
        assert all(counts[i] == 1 for i in range(50, 100))


class TestChunkTokenWindows:
    def _docs(self, spark, texts):
        return spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
        )

    def test_short_doc_yields_single_chunk(self, spark):
        out = SA.chunk_token_windows(
            self._docs(spark, ["a b c"]), window=8, stride=4, min_tail=2
        ).collect()
        assert len(out) == 1
        assert out[0]["chunk_idx"] == 0
        assert out[0]["n_tokens"] == 3
        assert out[0]["chunk_text"] == "a b c"

    def test_windows_overlap_by_stride(self, spark):
        words = " ".join(str(i) for i in range(10))
        rows = (
            SA.chunk_token_windows(
                self._docs(spark, [words]), window=6, stride=4, min_tail=2
            )
            .orderBy("chunk_idx")
            .collect()
        )
        # starts 0, 4, 8 → lengths 6, 6, 2
        assert [r["chunk_idx"] for r in rows] == [0, 1, 2]
        assert rows[0]["chunk_text"] == "0 1 2 3 4 5"
        assert rows[1]["chunk_text"] == "4 5 6 7 8 9"
        assert rows[2]["chunk_text"] == "8 9"

    def test_tiny_tail_dropped(self, spark):
        words = " ".join(str(i) for i in range(9))  # starts 0,4,8; tail len 1
        rows = SA.chunk_token_windows(
            self._docs(spark, [words]), window=6, stride=4, min_tail=2
        ).collect()
        assert sorted(r["chunk_idx"] for r in rows) == [0, 1]

    def test_blank_doc_yields_nothing(self, spark):
        out = SA.chunk_token_windows(
            self._docs(spark, ["   ", "x y"]), window=4, stride=4
        ).collect()
        assert len(out) == 1 and out[0]["doc_id"] == 1


class TestStratifiedFixedN:
    def _docs(self, spark):
        rows = [(i, "big" if i < 90 else "small") for i in range(100)]
        return spark.createDataFrame(rows, "doc_id long, lang string")

    def test_exact_quota_and_small_stratum_kept_whole(self, spark):
        out = SA.stratified_fixed_n(self._docs(spark), "doc_id", "lang", 20)
        counts = {
            r["lang"]: r["n"]
            for r in out.groupBy("lang").agg(
                F.count(F.lit(1)).alias("n")
            ).collect()
        }
        assert counts == {"big": 20, "small": 10}

    def test_deterministic_and_grows_stably(self, spark):
        a = {r["doc_id"] for r in SA.stratified_fixed_n(
            self._docs(spark), "doc_id", "lang", 20).collect()}
        b = {r["doc_id"] for r in SA.stratified_fixed_n(
            self._docs(spark), "doc_id", "lang", 20).collect()}
        assert a == b
        # widening the quota only ADDS rows (hash order is a total
        # order per stratum)
        c = {r["doc_id"] for r in SA.stratified_fixed_n(
            self._docs(spark), "doc_id", "lang", 30).collect()}
        assert a <= c


def test_chunk_windows_cover_every_token(spark):
    """Coverage property: with min_tail <= window - stride + 1, the
    union of emitted [start, start+n_tokens) intervals covers [0, n)
    for every document — dropped tails are always inside the previous
    window's overlap."""
    from hypothesis import given, settings, strategies as st

    @given(st.lists(st.integers(1, 40), min_size=1, max_size=6),
           st.integers(2, 10), st.data())
    @settings(max_examples=10, deadline=None)
    def run(lengths, window, data):
        stride = data.draw(st.integers(1, window))
        min_tail = data.draw(st.integers(1, window - stride + 1))
        docs = spark.createDataFrame(
            [(i, " ".join(f"t{j}" for j in range(n)))
             for i, n in enumerate(lengths)],
            "doc_id long, text string",
        )
        rows = SA.chunk_token_windows(
            docs, window=window, stride=stride, min_tail=min_tail
        ).collect()
        covered = {}
        for r in rows:
            start = r["chunk_idx"] * stride
            covered.setdefault(r["doc_id"], set()).update(
                range(start, start + r["n_tokens"])
            )
        for i, n in enumerate(lengths):
            assert covered.get(i, set()) == set(range(n)), (
                i, n, window, stride, min_tail
            )

    run()


class TestLeakageSafeSplit:
    """Group-representative splitting: near-dup pairs never straddle
    the split boundary."""

    def test_grouped_split_has_zero_leakage(self, spark, sf_dir):
        from pg2any_spark.plans.queries import QUERIES

        r = QUERIES["split_leakage_probe"](spark, sf_dir).collect()[0]
        assert r["leak_pairs_grouped"] == 0
        # the corpus carries planted near-dup mutations, so the naive
        # id-keyed split must demonstrably leak at 10%/10% eval/test
        assert r["leak_pairs_naive"] > 0
        assert r["n_pairs"] >= r["leak_pairs_naive"]
        assert r["n_dup_groups"] > 0

    def test_split_counts_partition_corpus(self, spark, sf_dir):
        from pg2any_spark.plans.queries import QUERIES
        from pg2any_spark.plans.queries_ml import _mutated_corpus

        rows = QUERIES["split_leakage_safe"](spark, sf_dir).collect()
        n = _mutated_corpus(spark, sf_dir).count()
        assert sum(r["n_docs"] for r in rows) == n
        assert {r["split"] for r in rows} <= {"train", "eval", "test"}
