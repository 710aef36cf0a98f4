from __future__ import annotations

from pyspark.sql import Row, functions as F

from pg2any_spark.operators import text as T


def _one(spark, text, col):
    df = spark.createDataFrame([Row(text=text)])
    return df.select(col.alias("v")).collect()[0]["v"]


def test_token_count(spark):
    assert _one(spark, "a b  c", T.token_count(F.col("text"))) == 3
    assert _one(spark, "   ", T.token_count(F.col("text"))) == 0
    assert _one(spark, "", T.token_count(F.col("text"))) == 0


def test_bpe_ish_tokens(spark):
    # words, digit runs, punctuation each count
    assert _one(spark, "ab3 c!", T.bpe_ish_token_count(F.col("text"))) == 4


def test_quality_bounds(spark):
    for s in ["", "the and of is a " * 20, "!!!???..."]:
        v = _one(spark, s, T.quality_score(F.col("text")))
        assert 0.0 <= v <= 1.0


def test_fingerprint_normalizes_whitespace(spark):
    a = _one(spark, "Hello   World", T.fingerprint(F.col("text")))
    b = _one(spark, "  hello world ", T.fingerprint(F.col("text")))
    assert a == b


def test_lang_id(spark):
    assert _one(spark, "der hund und die katze ist", T.lang_id(F.col("text"))) == "de"
    assert _one(spark, "xyz qqq", T.lang_id(F.col("text"))) == "und"
    # tie between en and de markers -> alphabetical winner (de)
    assert _one(spark, "the der", T.lang_id(F.col("text"))) == "de"


def test_rolling_fingerprint(spark):
    # reference value: fold over "abc def" with h = (h*131 + code) % (2^31-1)
    h = 0
    for ch in "abc def":
        h = (h * 131 + ord(ch)) % 2_147_483_647
    assert _one(spark, "ABC   def ", T.rolling_fingerprint(F.col("text"))) == h
    assert _one(spark, "", T.rolling_fingerprint(F.col("text"))) == 0
    # order-sensitive (unlike a bag-of-chars hash)
    a = _one(spark, "ab", T.rolling_fingerprint(F.col("text")))
    b = _one(spark, "ba", T.rolling_fingerprint(F.col("text")))
    assert a != b


class TestWordNgrams:
    def test_ngram_edges(self, spark):
        from pyspark.sql import Row, functions as F

        from pg2any_spark.operators.text import word_ngrams

        df = spark.createDataFrame(
            [
                Row(i=1, text="a b c d"),
                Row(i=2, text="one two"),  # fewer than n tokens
                Row(i=3, text="   "),      # blank
                Row(i=4, text="x Y  z"),   # case + multi-space
            ]
        )
        rows = {r["i"]: r["g"] for r in df.select("i", word_ngrams(F.col("text"), 3).alias("g")).collect()}
        assert rows[1] == ["a b c", "b c d"]
        assert rows[2] == []
        assert rows[3] == []
        assert rows[4] == ["x y z"]


class TestTfidf:
    def test_known_corpus(self, spark):
        """3-doc corpus with hand-computable scores: 'common' appears in
        every doc (idf=0), 'rare' in one (idf=ln 3)."""
        import math

        from pg2any_spark.operators.text import tfidf_top_terms

        docs = spark.createDataFrame(
            [
                (1, "common rare rare"),
                (2, "common mid"),
                (3, "common mid"),
            ],
            "doc_id long, text string",
        )
        out = {
            (r["doc_id"], r["term"]): (r["tf"], r["tfidf"], r["rnk"])
            for r in tfidf_top_terms(docs, "doc_id", "text", k=2).collect()
        }
        ln3 = round(math.log(3.0), 6)
        ln15 = round(math.log(1.5), 6)
        # doc 1: rare tf=2 idf=ln3 ranks first; common idf=0 second
        assert out[(1, "rare")] == (2, round(2 * math.log(3.0), 6), 1)
        assert out[(1, "common")][1] == 0.0 and out[(1, "common")][2] == 2
        # docs 2/3: mid (idf=ln 1.5) beats common (idf=0)
        assert out[(2, "mid")] == (1, ln15, 1)
        assert out[(3, "mid")] == (1, ln15, 1)
        assert ln3 > 0

    def test_blank_docs_excluded(self, spark):
        from pg2any_spark.operators.text import tfidf_top_terms

        docs = spark.createDataFrame(
            [(1, "alpha beta"), (2, "   "), (3, "")],
            "doc_id long, text string",
        )
        out = tfidf_top_terms(docs, "doc_id", "text", k=5).collect()
        # blank docs contribute nothing AND don't inflate n_docs:
        # idf = ln(1/1) = 0 for terms of the only real doc
        assert {r["doc_id"] for r in out} == {1}
        assert all(r["tfidf"] == 0.0 for r in out)


class TestPiiRedaction:
    def test_redacts_all_classes(self, spark):
        from pg2any_spark.operators.text import pii_counts, redact_pii
        from pyspark.sql import functions as F

        df = spark.createDataFrame(
            [("mail bob.smith+x@corp.example.org from 192.168.1.200 "
              "or call +1 415-555-0142 today",)],
            "text string",
        )
        c = pii_counts(F.col("text"))
        row = df.select(
            redact_pii(F.col("text")).alias("red"),
            c["n_emails"].alias("e"), c["n_ips"].alias("i"),
            c["n_phones"].alias("p"),
        ).collect()[0]
        assert "[EMAIL]" in row["red"] and "[IP]" in row["red"]
        assert "[PHONE]" in row["red"]
        assert "bob.smith" not in row["red"]
        assert "192.168" not in row["red"]
        assert (row["e"], row["i"], row["p"]) == (1, 1, 1)

    def test_clean_text_untouched(self, spark):
        from pg2any_spark.operators.text import redact_pii
        from pyspark.sql import functions as F

        df = spark.createDataFrame([("no pii here at all",)], "text string")
        assert df.select(
            redact_pii(F.col("text")).alias("r")
        ).collect()[0]["r"] == "no pii here at all"


class TestRepetitionStats:
    def test_known_values(self, spark):
        from pg2any_spark.operators.text import repetition_stats, word_ngrams
        from pyspark.sql import functions as F

        # "a b a b a b": 2-grams = [a b, b a, a b, b a, a b] ->
        # total 5, distinct 2, modal "a b" x3
        df = spark.createDataFrame(
            [("a b a b a b",), ("w x y z",), ("",)], "text string"
        ).withColumn("g", word_ngrams(F.col("text"), 2))
        s = repetition_stats(F.col("g"))
        rows = df.select(
            "text",
            s["dup_ngram_frac"].alias("dup"),
            s["top_ngram_share"].alias("top"),
        ).collect()
        got = {r["text"]: (r["dup"], r["top"]) for r in rows}
        assert got["a b a b a b"] == (round(3 / 5, 6), round(3 / 5, 6))
        assert got["w x y z"] == (0.0, round(1 / 3, 6))
        assert got[""] == (0.0, 0.0)


class TestLmBigramScores:
    def test_uniform_text_scores_lower_than_rare(self, spark):
        from pyspark.sql import Row

        from pg2any_spark.operators.text import lm_bigram_scores

        df = spark.createDataFrame(
            [
                Row(doc_id=1, text="a b a b a b a b"),
                Row(doc_id=2, text="a b a b a b a b"),
                Row(doc_id=3, text="q r s t u v w x"),
            ]
        )
        out = {r["doc_id"]: r for r in lm_bigram_scores(df).collect()}
        assert out[1]["n_bigrams"] == 7
        # the repeated "a b" pattern is high-probability; the one-off
        # rare-bigram doc must score a strictly higher mean NLL
        assert out[3]["avg_nll"] > out[1]["avg_nll"]
        assert out[1]["avg_nll"] == out[2]["avg_nll"]

    def test_short_docs_excluded(self, spark):
        from pyspark.sql import Row

        from pg2any_spark.operators.text import lm_bigram_scores

        df = spark.createDataFrame(
            [Row(doc_id=1, text="solo"), Row(doc_id=2, text="two tokens here")]
        )
        ids = {r["doc_id"] for r in lm_bigram_scores(df).collect()}
        assert ids == {2}

    def test_matches_handcomputed_probability(self, spark):
        import math

        from pyspark.sql import Row

        from pg2any_spark.operators.text import lm_bigram_scores

        # corpus: one doc "x y x y" -> bigrams: x y (2), y x (1)
        # V = 2, alpha=0.5; c(x)=2, c(y)=1 as histories
        df = spark.createDataFrame([Row(doc_id=1, text="x y x y")])
        row = lm_bigram_scores(df).collect()[0]
        p_xy = (2 + 0.5) / (2 + 0.5 * 2)
        p_yx = (1 + 0.5) / (1 + 0.5 * 2)
        expected = -(2 * math.log(p_xy) + math.log(p_yx)) / 3
        assert abs(row["avg_nll"] - round(expected, 4)) < 1e-9


class TestVocabGrowth:
    def test_counts_new_words_once(self, spark):
        from pyspark.sql import Row

        from pg2any_spark.operators.text import vocab_growth

        df = spark.createDataFrame(
            [
                Row(doc_id=0, text="a b c"),
                Row(doc_id=1, text="a b d"),
                Row(doc_id=2, text="a e"),
                Row(doc_id=3, text="a"),
            ]
        )
        out = {r["bucket"]: r for r in vocab_growth(df, buckets=4).collect()}
        assert out[0]["new_words"] == 3
        assert out[1]["new_words"] == 1
        assert out[2]["new_words"] == 1
        assert out[3]["new_words"] == 0
        assert out[3]["cum_vocab"] == 5
        assert all(out[b]["n_docs"] == 1 for b in range(4))


class TestLearnBpeMerges:
    def test_handcomputed_merge_sequence(self, spark):
        from pyspark.sql import Row

        from pg2any_spark.operators.text import learn_bpe_merges

        # words: aaab x2, ab x1
        # r1: (a,a)=4 beats (a,b)=3 -> aa
        # r2: aaab=[aa,a,b]: (aa,a)=2, (a,b)=2; ab: (a,b)=1 -> a.b wins 3
        # r3: aaab=[aa,ab], ab=[ab]: (aa,ab)=2 -> aaab fully merges
        df = spark.createDataFrame(
            [Row(doc_id=1, text="aaab aaab"), Row(doc_id=2, text="ab")]
        )
        got = [
            (r["merge_round"], r["pair"], r["new_symbol"], r["n_occurrences"])
            for r in learn_bpe_merges(df, rounds=3).collect()
        ]
        assert got == [
            (1, "a.a", "aa", 4),
            (2, "a.b", "ab", 3),
            (3, "aa.ab", "aaab", 2),
        ]

    def test_stops_when_no_pairs_remain(self, spark):
        from pyspark.sql import Row

        from pg2any_spark.operators.text import learn_bpe_merges

        df = spark.createDataFrame([Row(doc_id=1, text="ab")])
        got = learn_bpe_merges(df, rounds=5).collect()
        assert len(got) == 1
        assert (got[0]["pair"], got[0]["n_occurrences"]) == ("a.b", 1)

    def test_tie_breaks_to_lexically_smaller_pair(self, spark):
        from pyspark.sql import Row

        from pg2any_spark.operators.text import learn_bpe_merges

        # xy and ab both occur once -> a.b < x.y lexically
        df = spark.createDataFrame([Row(doc_id=1, text="xy ab")])
        got = learn_bpe_merges(df, rounds=1).collect()
        assert got[0]["pair"] == "a.b"

    def test_apply_merges_roundtrip(self, spark):
        from pyspark.sql import Row

        from pg2any_spark.operators.text import (
            apply_bpe_merges,
            learn_bpe_merges,
        )

        df = spark.createDataFrame(
            [Row(doc_id=1, text="aaab aaab"), Row(doc_id=2, text="ab")]
        )
        merges = [r["pair"] for r in learn_bpe_merges(df, rounds=3).collect()]
        out = {
            r["doc_id"]: (r["n_chars_tok"], r["n_bpe_tokens"])
            for r in apply_bpe_merges(df, merges).collect()
        }
        # after [a.a, a.b, aa.ab]: aaab -> 1 token, ab -> 1 token
        assert out[1] == (8, 2)
        assert out[2] == (2, 1)

    def test_merge_never_crosses_symbol_boundary(self, spark):
        """Regression: pair (a,b) must not match inside [ca, b] — a
        substring replace on the delimited encoding merged 'a.b'
        against the SUFFIX of symbol 'ca', corrupting the dictionary
        and hiding round 3's true merge."""
        from pyspark.sql import Row

        from pg2any_spark.operators.text import (
            apply_bpe_merges,
            learn_bpe_merges,
        )

        df = spark.createDataFrame([Row(doc_id=1, text="ca ca ca cab ab")])
        got = [
            (r["merge_round"], r["pair"], r["n_occurrences"])
            for r in learn_bpe_merges(df, rounds=4).collect()
        ]
        assert got == [(1, "c.a", 4), (2, "a.b", 1), (3, "ca.b", 1)]
        out = apply_bpe_merges(df, [p for _, p, _ in got]).collect()[0]
        # cab -> [ca, b] -> merge 3 -> [cab]; ab -> [ab]; ca -> [ca]
        assert (out["n_chars_tok"], out["n_bpe_tokens"]) == (11, 5)

    def test_dot_words_excluded_from_token_counts(self, spark):
        from pyspark.sql import Row

        from pg2any_spark.operators.text import apply_bpe_merges

        df = spark.createDataFrame([Row(doc_id=1, text="ab u.s. cd")])
        out = apply_bpe_merges(df, []).collect()[0]
        # u.s. is untokenizable under the dot-free symbol model: both
        # counts cover only 'ab' and 'cd'
        assert (out["n_chars_tok"], out["n_bpe_tokens"]) == (4, 4)


class TestLmBroadcastFallback:
    """broadcast_counts=False is the web-scale form: no broadcast hint
    on the bigram/history count joins (a hint is honored regardless of
    size — at billions of bigrams it would OOM the driver), leaving
    AQE free to plan (skew-split) sort-merge joins. Results must be
    identical to the broadcast form."""

    def _docs(self, spark):
        return spark.read.parquet("/root/testdata/sf0.001/documents.parquet")

    def test_no_hint_form_respects_broadcast_budget(self, spark):
        # Past the broadcast budget (simulated with threshold=-1, the
        # "bigram vocab too big" regime) the hint-free form must plan
        # sort-merge joins; the hinted form ignores the budget — which
        # is exactly why it cannot be the only form.
        prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            df = T.lm_bigram_scores(
                self._docs(spark), materialize=False, broadcast_counts=False
            )
            plan = df._jdf.queryExecution().executedPlan().toString()
            assert "SortMergeJoin" in plan
            assert "BroadcastHashJoin" not in plan
            hinted = T.lm_bigram_scores(self._docs(spark), materialize=False)
            hplan = hinted._jdf.queryExecution().executedPlan().toString()
            assert "BroadcastHashJoin" in hplan  # hint overrides budget
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)

    def test_no_hint_form_still_broadcasts_when_small(self, spark):
        # Under the budget Catalyst's size estimate picks broadcast on
        # its own — dropping the hint does not sacrifice the small case.
        df = T.lm_bigram_scores(
            self._docs(spark), materialize=False, broadcast_counts=False
        )
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan

    def test_fallback_results_identical(self, spark):
        docs = self._docs(spark)
        bc = {
            r["doc_id"]: (r["n_bigrams"], r["avg_nll"])
            for r in T.lm_bigram_scores(docs, materialize=False).collect()
        }
        smj = {
            r["doc_id"]: (r["n_bigrams"], r["avg_nll"])
            for r in T.lm_bigram_scores(
                docs, materialize=False, broadcast_counts=False
            ).collect()
        }
        assert bc == smj


def test_apply_bpe_zero_token_doc_emits_zero_counts(spark):
    # A doc whose words are all empty or dot-bearing tokenizes to 0
    # BPE tokens (the operator emits the row with 0/0); consumers that
    # must match the DuckDB oracle's drop-the-doc semantics filter
    # n_bpe_tokens > 0 — pinned here so the contract stays visible
    # (see bpe_tokenize_docs).
    docs = spark.createDataFrame(
        [Row(doc_id=1, text="hello hello"), Row(doc_id=2, text=". .. a.b")]
    )
    out = {r["doc_id"]: r for r in T.apply_bpe_merges(docs, ["l.l"]).collect()}
    assert out[2]["n_bpe_tokens"] == 0 and out[2]["n_chars_tok"] == 0
    assert out[1]["n_bpe_tokens"] == 8  # h e ll o  x2
    assert out[1]["n_chars_tok"] == 10


# ---------------------------------------------------------------------------
# naive Bayes (hashed multinomial)
# ---------------------------------------------------------------------------


class TestNaiveBayes:
    def _toy(self, spark):
        rows = [
            (1, "the cat sat on the mat", "en"),
            (2, "the dog ate the bone", "en"),
            (3, "der hund und die katze", "de"),
            (4, "die sonne und der mond", "de"),
            (5, "the cat und the dog", "en"),  # mixed, en-leaning
        ]
        return spark.createDataFrame(rows, "doc_id long, text string, lang string")

    def test_self_classification_recovers_labels(self, spark):
        scores = T.nb_hashed_scores(self._toy(spark), "lang", n_buckets=256)
        pred = {
            r["doc_id"]: r["predicted"]
            for r in T.nb_predict(scores).collect()
        }
        assert pred == {1: "en", 2: "en", 3: "de", 4: "de", 5: "en"}

    def test_one_score_row_per_doc_class(self, spark):
        scores = T.nb_hashed_scores(self._toy(spark), "lang", n_buckets=256)
        assert scores.count() == 5 * 2
        # scores are log-probabilities: strictly negative
        assert scores.filter(F.col("score") >= 0).count() == 0

    def test_scoring_join_is_broadcast(self, spark):
        plan = (
            T.nb_hashed_scores(self._toy(spark), "lang", n_buckets=256)
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "BroadcastHashJoin" in plan


class TestGopherRules:
    def _flags(self, spark, text):
        from pyspark.sql import Row, functions as F

        from pg2any_spark.operators.text import gopher_rules

        df = spark.createDataFrame([Row(t=text)])
        rules = gopher_rules("t")
        row = df.select(
            *[c.alias(n) for n, c in rules.items()]
        ).collect()[0]
        return row.asDict()

    def test_clean_doc_passes(self, spark):
        text = "the a " + "apple banana " * 30
        flags = self._flags(spark, text.strip())
        assert not any(flags.values()), flags

    def test_each_defect_fires_its_rule(self, spark):
        base = "the a " + "apple banana " * 30
        cases = {
            "fail_words": "the a apple",
            "fail_bullet": "- aaa\n- bbb",
            "fail_ellipsis": base.strip() + "...",
            "fail_symbol": base + "# " * 10,
            "fail_alpha": base + "42 " * 40,
            "fail_mwl": "the a " + "xy " * 60,
            "fail_stop": "apple banana " * 30,
        }
        for rule, text in cases.items():
            flags = self._flags(spark, text.strip())
            assert flags[rule], (rule, flags)


class TestCleanUnicode:
    def _one(self, spark, raw):
        from pg2any_spark.operators.text import clean_unicode
        from pyspark.sql import functions as F

        df = spark.createDataFrame([(raw,)], "t string")
        return df.select(clean_unicode(F.col("t")).alias("z")).collect()[0]["z"]

    def test_legacy_newlines_normalize(self, spark):
        assert self._one(spark, "a\r\nb\rc\nd") == "a\nb\nc\nd"

    def test_zero_width_stripped_before_collapse(self, spark):
        # ' ​ ' must collapse to ONE space — rule order matters —
        # while zero-widths with no neighbouring space just vanish
        assert self._one(spark, "a ​ b‌‍﻿c") == "a bc"
        assert self._one(spark, "x ​​ y") == "x y"

    def test_nbsp_tabs_and_runs_collapse(self, spark):
        assert self._one(spark, "a b  \t c") == "a b c"

    def test_spaces_hugging_newlines_and_blank_runs(self, spark):
        assert self._one(spark, "a \n  b\n\n\n\n\nc") == "a\nb\n\nc"

    def test_trim(self, spark):
        assert self._one(spark, "  x  ") == "x"
