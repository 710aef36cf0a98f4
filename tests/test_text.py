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
