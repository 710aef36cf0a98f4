from __future__ import annotations

import math

import pytest
from pyspark.sql import Row

from pg2any_spark.operators import retrieval as R
from pg2any_spark.plans.queries_retrieval import (
    retrieval_bm25_topk,
    source_quota_cap,
)

SF_DIR = "/root/testdata/sf0.001"


def docs_df(spark, rows):
    return spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in rows]
    )


class TestPostings:
    def test_dl_and_tf(self, spark):
        df = docs_df(spark, [(1, "a b a"), (2, "b"), (3, "   ")])
        got = {
            (r["doc_id"], r["term"]): (r["dl"], r["tf"])
            for r in R.doc_postings(df, "doc_id", "text").collect()
        }
        # blank doc 3 excluded entirely; dl rides the grouping key
        assert got == {(1, "a"): (3, 2), (1, "b"): (3, 1), (2, "b"): (1, 1)}


class TestBm25:
    CORPUS = [
        (1, "spark joins hash tables"),
        (2, "hash hash hash join join"),
        (3, "sorting and merging only"),
        (4, "join"),
    ]

    def test_ranking_favors_matching_terms(self, spark):
        out = R.bm25_topk(
            docs_df(spark, self.CORPUS), [("q", ["hash", "join"])], k=4
        ).collect()
        by_rank = [r["doc_id"] for r in sorted(out, key=lambda r: r["rnk"])]
        # doc 2 hits both terms repeatedly -> first; doc 3 never appears
        assert by_rank[0] == 2
        assert 3 not in by_rank
        hits = {r["doc_id"]: r["n_terms_hit"] for r in out}
        assert hits[2] == 2 and hits[4] == 1

    def test_hand_computed_score(self, spark):
        # single-term query, uniform doc lengths: the formula collapses
        # to idf * tf*(k1+1)/(tf + k1) — check one cell by hand
        df = docs_df(spark, [(1, "x y"), (2, "x x"), (3, "y y")])
        out = {
            r["doc_id"]: r["bm25"]
            for r in R.bm25_topk(df, [("q", ["x"])], k=3).collect()
        }
        idf = math.log((3 - 2 + 0.5) / (2 + 0.5) + 1.0)
        tf1 = idf * (1 * 2.2) / (1 + 1.2)  # dl == avgdl
        tf2 = idf * (2 * 2.2) / (2 + 1.2)
        assert out[1] == pytest.approx(round(tf1, 6), abs=1e-6)
        assert out[2] == pytest.approx(round(tf2, 6), abs=1e-6)

    def test_salted_equals_unsalted(self, spark):
        from pg2any_spark.sources.fixtures import load_table

        docs = load_table(spark, "documents", SF_DIR)
        qs = [("qa", ["hash", "join"]), ("qb", ["window", "agg", "sort"])]
        plain = R.bm25_topk(docs, qs, k=7).collect()
        salted = R.bm25_topk(docs, qs, k=7, num_salts=5).collect()
        key = lambda r: (r["query_id"], r["rnk"])  # noqa: E731
        assert sorted(map(tuple, plain), key=lambda t: (t[0], t[1])) == sorted(
            map(tuple, salted), key=lambda t: (t[0], t[1])
        )
        assert {key(r) for r in plain} == {key(r) for r in salted}

    def test_too_wide_query_raises(self, spark):
        with pytest.raises(ValueError, match="wider"):
            R.bm25_topk(
                docs_df(spark, self.CORPUS), [("q", ["a", "b", "c", "d", "e"])]
            )


class TestRegistryQueries:
    def test_bm25_registry_shape(self, spark):
        out = retrieval_bm25_topk(spark, SF_DIR).collect()
        qids = {r["query_id"] for r in out}
        assert len(qids) == 6
        for q in qids:
            ranks = sorted(r["rnk"] for r in out if r["query_id"] == q)
            assert ranks == list(range(1, len(ranks) + 1))
            assert len(ranks) <= 10

    def test_quota_cap_binds(self, spark):
        out = source_quota_cap(spark, SF_DIR).collect()
        assert len(out) == 20
        for r in out:
            assert r["n_kept"] == min(12, r["n_docs"])
            assert 0 < r["kept_chars"]


class TestHybridRRF:
    def test_both_lists_beat_single_list(self, spark):
        """A candidate ranked in BOTH towers must outscore one holding
        the same rank in only one tower: 1/(60+r) twice > once."""
        from pyspark.sql import Row

        from pg2any_spark.operators.retrieval import hybrid_rrf_topk

        # doc 0 probes; doc 1 is a near-identical text AND embedding
        # (both towers), doc 2 only shares text (lexical only), doc 3
        # only points the same way (semantic only)
        docs = spark.createDataFrame(
            [
                Row(doc_id=0, text="alpha beta gamma delta epsilon zeta"),
                Row(doc_id=1, text="alpha beta gamma delta epsilon eta"),
                Row(doc_id=2, text="alpha beta gamma delta theta iota"),
                Row(doc_id=3, text="unrelated words entirely different here now"),
            ]
        )
        emb = spark.createDataFrame(
            [
                Row(vec_id=0, embedding=[1.0, 0.0, 0.0, 0.0]),
                Row(vec_id=1, embedding=[0.99, 0.1, 0.0, 0.0]),
                Row(vec_id=2, embedding=[0.0, 0.0, 1.0, 0.0]),
                Row(vec_id=3, embedding=[0.98, 0.15, 0.0, 0.0]),
            ]
        )
        out = hybrid_rrf_topk(docs, emb, query_mod=50, k=3).collect()
        by_rank = {r["rank"]: r for r in out if r["query_id"] == 0}
        assert by_rank[1]["neighbor_id"] == 1  # in both towers
        assert by_rank[1]["r_sem"] is not None
        assert by_rank[1]["r_lex"] is not None
        # single-tower candidates trail the dual-tower one
        assert by_rank[1]["rrf"] > by_rank[2]["rrf"]
        singles = {r["neighbor_id"] for k, r in by_rank.items() if k > 1}
        assert singles == {2, 3}

    def test_rank_is_dense_per_query(self, spark):
        from pg2any_spark.operators.retrieval import hybrid_rrf_topk
        from pg2any_spark.sources.fixtures import load_table

        docs = load_table(spark, "documents", "/root/testdata/sf0.001")
        emb = load_table(spark, "embeddings", "/root/testdata/sf0.001")
        out = hybrid_rrf_topk(docs, emb, query_mod=50, k=10).collect()
        per_q = {}
        for r in out:
            per_q.setdefault(r["query_id"], []).append(r["rank"])
        assert per_q and all(
            sorted(v) == list(range(1, len(v) + 1)) for v in per_q.values()
        )
