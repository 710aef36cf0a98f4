from __future__ import annotations

from pyspark.sql import Row

from pg2any_spark.operators import dedup as D


def docs(spark, rows):
    return spark.createDataFrame([Row(id=i, text=t) for i, t in rows])


def test_exact_dedup_keeps_min_id(spark):
    df = docs(spark, [(1, "hello world"), (5, "Hello   WORLD"), (2, "other doc")])
    out = {r["id"] for r in D.exact_dedup(df, "id").collect()}
    assert out == {1, 2}


def test_minhash_identical_signatures(spark):
    df = docs(spark, [(1, "a b c d e f g"), (2, "a b c d e f g")])
    sigs = D.minhash_signatures(df, "id", num_hashes=4).collect()
    by_id = {r["id"]: tuple(r[f"mh{i}"] for i in range(4)) for r in sigs}
    assert by_id[1] == by_id[2]


def test_lsh_finds_exact_duplicate(spark):
    df = docs(
        spark,
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "the quick brown fox jumps over the lazy dog"),
            (3, "completely different text about spark engines here"),
        ],
    )
    pairs = {(r["id_a"], r["id_b"]) for r in D.lsh_candidate_pairs(df, "id").collect()}
    assert (1, 2) in pairs
    assert all(p == (1, 2) for p in pairs)


def test_ngram_jaccard_extremes(spark):
    corpus = docs(
        spark,
        [
            (1, "a b c d e"),
            (2, "a b c d e"),
            (3, "x y z w v"),
        ],
    )
    pairs = spark.createDataFrame([Row(id_a=1, id_b=2), Row(id_a=1, id_b=3)])
    out = {(r["id_a"], r["id_b"]): r["jaccard"] for r in D.ngram_jaccard(corpus, pairs, "id").collect()}
    assert out[(1, 2)] == 1.0
    assert out[(1, 3)] == 0.0


def test_simhash_deterministic_and_close(spark):
    df = docs(
        spark,
        [
            (1, "spark engine batch window join hash"),
            (2, "spark engine batch window join hash"),
        ],
    )
    fps = {r["id"]: r["simhash"] for r in D.simhash(df, "id").collect()}
    assert fps[1] == fps[2]
    assert 0 <= fps[1] < (1 << 32)


def test_simhash_wide_60bit(spark):
    # 60-bit fingerprints: identical docs collide exactly, the value
    # stays in [0, 2^60), and the pigeonhole join still finds the pair
    df = docs(
        spark,
        [
            (1, "spark engine batch window join hash"),
            (2, "spark engine batch window join hash"),
            (3, "zzz yyy xxx www vvv uuu"),
        ],
    )
    fps = D.simhash(df, "id", bits=60)
    vals = {r["id"]: r["simhash"] for r in fps.collect()}
    assert vals[1] == vals[2]
    assert 0 <= vals[1] < (1 << 60)
    pairs = {
        (r["id_a"], r["id_b"], r["hamming"])
        for r in D.simhash_hamming_pairs(
            fps, "id", max_distance=3, bits=60
        ).collect()
    }
    assert (1, 2, 0) in pairs
    assert all(a != 3 and b != 3 for a, b, _ in pairs)
    # blocking width changes bucket resolution, never the pair set:
    # any 4 disjoint slices of <=3 differing bits leave one slice
    # clean, so 32-bit-slice blocking of the same 60-bit fingerprints
    # must return identical output (the round-11 bits-param fix made
    # the 15-bit slices real engine-side; this pins the recall
    # equivalence its docstring claims)
    narrow = {
        (r["id_a"], r["id_b"], r["hamming"])
        for r in D.simhash_hamming_pairs(
            fps, "id", max_distance=3, bits=32
        ).collect()
    }
    assert narrow == pairs


def test_simhash_hamming_pairs(spark):
    df = docs(
        spark,
        [
            (1, "spark engine batch window join hash merge sort"),
            (2, "spark engine batch window join hash merge sorted"),
            (3, "qqq www eee rrr ttt yyy uuu iii"),
        ],
    )
    fps = D.simhash(df, "id")
    pairs = {(r["id_a"], r["id_b"]) for r in D.simhash_hamming_pairs(fps, "id", max_distance=8).collect()}
    assert (1, 2) in pairs


class TestLexicalSemanticAgreement:
    def test_planted_classes_detected_as_designed(self, spark, sf_dir):
        """Ground-truth agreement: lexical_only pairs must be invisible
        to the cosine detector (negated embeddings), semantic_only
        pairs invisible to LSH (reversed shingles), and 'both' pairs
        near-fully caught by each; the all-row Jaccard sits strictly
        between 0 and 1."""
        from pg2any_spark.operators.dedup import lexical_semantic_agreement
        from pg2any_spark.sources.cdc_gen import synth_paired_neardup_corpus

        corpus = synth_paired_neardup_corpus(spark, sf_dir)
        rows = {
            r["variant"]: r
            for r in lexical_semantic_agreement(corpus).collect()
        }
        both, lex, sem = (
            rows["both"], rows["lexical_only"], rows["semantic_only"]
        )
        assert sem["n_lexical"] == 0 and sem["n_semantic"] == sem["n_pairs"]
        assert lex["n_semantic"] == 0 and lex["n_lexical"] == lex["n_pairs"]
        # scaled embeddings have cosine exactly 1 -> all caught;
        # LSH is probabilistic per banding, so near-full
        assert both["n_semantic"] == both["n_pairs"]
        assert both["n_lexical"] >= both["n_pairs"] * 0.9
        assert both["n_both"] == both["n_lexical"]
        allr = rows["all"]
        assert allr["n_pairs"] == (
            both["n_pairs"] + lex["n_pairs"] + sem["n_pairs"]
        )
        assert 0 < allr["pair_jaccard"] < 1


class TestIncrementalIndex:
    def test_incoming_matches_corpus_duplicate(self, spark):
        corpus = docs(
            spark,
            [
                (1, "the quick brown fox jumps over the lazy dog"),
                (2, "completely different text about spark engines here"),
            ],
        )
        incoming = docs(
            spark,
            [
                (101, "the quick brown fox jumps over the lazy dog"),
                (102, "nothing like anything in the corpus at all zebra"),
            ],
        )
        index = D.lsh_index(corpus, "id")
        out = {
            (r["incoming_id"], r["corpus_id"])
            for r in D.incremental_lsh_matches(index, incoming, "id").collect()
        }
        assert (101, 1) in out
        assert all(a == 101 for a, _ in out)

    def test_incoming_never_pairs_with_itself(self, spark):
        corpus = docs(spark, [(1, "a b c d e f g h")])
        incoming = docs(
            spark,
            [(101, "x y z w v u t s"), (102, "x y z w v u t s")],
        )
        index = D.lsh_index(corpus, "id")
        # identical incoming docs match each other lexically, but the
        # incremental probe only reports incoming-vs-INDEX matches
        assert D.incremental_lsh_matches(index, incoming, "id").count() == 0

    def test_index_probe_equals_full_selfjoin_restriction(self, spark):
        """Probing the index must equal the corpus∪incoming self-join
        restricted to cross pairs — the incremental path is an
        optimization, not a semantics change."""
        corpus = docs(
            spark,
            [
                (1, "alpha beta gamma delta epsilon zeta"),
                (2, "one two three four five six seven"),
            ],
        )
        incoming = docs(
            spark,
            [
                (101, "alpha beta gamma delta epsilon zeta"),
                (102, "one two three four five six seven eight"),
            ],
        )
        index = D.lsh_index(corpus, "id")
        inc = {
            (r["incoming_id"], r["corpus_id"])
            for r in D.incremental_lsh_matches(index, incoming, "id").collect()
        }
        full = {
            (r["id_b"], r["id_a"])
            for r in D.lsh_candidate_pairs(
                corpus.unionByName(incoming), "id"
            ).collect()
            if r["id_a"] <= 2 and r["id_b"] >= 101
        }
        assert inc == full


class TestHotBandKeyCap:
    """The boilerplate (hot band key) cap: quadratic pair output from
    template families is bounded and REPORTED, while genuine near-dup
    neighborhoods below the cap are untouched."""

    def corpus(self, spark):
        rows = [(i, f"unique document number {i} talks about topic {i} only") for i in range(20)]
        rows += [(100 + i, "all rights reserved standard licence header text here") for i in range(15)]
        # a genuine near-dup pair, bucket size 2 (< cap)
        rows += [
            (300, "spark engines process large corpora with partitioned joins"),
            (301, "spark engines process large corpora with partitioned joins"),
        ]
        return docs(spark, rows)

    def test_cap_bounds_pair_output_and_reports(self, spark):
        df = self.corpus(spark)
        uncapped = D.lsh_candidate_pairs(df, "id").collect()
        capped = D.lsh_candidate_pairs(df, "id", hot_key_cap=5).collect()
        clique = {(a, b) for a, b in
                  ((100 + i, 100 + j) for i in range(15) for j in range(15))
                  if a < b}
        un = {(r["id_a"], r["id_b"]) for r in uncapped}
        cp = {(r["id_a"], r["id_b"]) for r in capped}
        # without the cap the template family is quadratic: all 105 pairs
        assert clique <= un
        # with the cap every clique pair is gone...
        assert not (clique & cp)
        # ...and exactly the clique was dropped — nothing else
        assert cp == un - clique
        # the genuine near-dup neighborhood (size 2 < cap) survives
        assert (300, 301) in cp
        # and the cap is reported, never silent: every band of the
        # template family shows up as a hot key with its member count
        idx = D.lsh_index(df, "id")
        hot = D.hot_band_keys(idx, 5).collect()
        assert len(hot) == 4  # one per band (identical texts, 4 bands)
        assert all(r["n_ids"] == 15 for r in hot)

    def test_incremental_probe_honors_cap(self, spark):
        df = self.corpus(spark)
        index = D.lsh_index(df, "id")
        incoming = docs(
            spark,
            [(900, "all rights reserved standard licence header text here"),
             (901, "spark engines process large corpora with partitioned joins")],
        )
        out = D.incremental_lsh_matches(index, incoming, "id", hot_key_cap=5)
        got = {(r["incoming_id"], r["corpus_id"]) for r in out.collect()}
        # the boilerplate probe matches nothing (its keys are hot)...
        assert not any(i == 900 for i, _ in got)
        # ...the genuine near-dup probe still matches both neighbors
        assert {(901, 300), (901, 301)} <= got


class TestLineDedup:
    def test_cross_doc_line_kept_only_in_min_id(self, spark):
        from pyspark.sql import Row

        lines = spark.createDataFrame(
            [Row(id=1, pos=0, line="unique one"),
             Row(id=1, pos=1, line="shared footer"),
             Row(id=2, pos=0, line="unique two"),
             Row(id=2, pos=1, line="shared footer"),
             Row(id=3, pos=0, line="shared footer")],
        )
        out = {(r["id"], r["pos"]): r["kept"]
               for r in D.line_dedup(lines, "id").collect()}
        assert out[(1, 1)] is True   # owner (min id) keeps it
        assert out[(2, 1)] is False
        assert out[(3, 0)] is False
        assert out[(1, 0)] and out[(2, 0)]  # unique lines untouched

    def test_intra_doc_repeat_is_not_cross_doc_dup(self, spark):
        from pyspark.sql import Row

        lines = spark.createDataFrame(
            [Row(id=5, pos=0, line="la la la"),
             Row(id=5, pos=1, line="la la la")],
        )
        out = D.line_dedup(lines, "id").collect()
        # both copies live in the owner doc: line dedup is cross-doc;
        # intra-doc repetition is the repetition screen's job
        assert all(r["kept"] for r in out)

    def test_doc_line_table_chunks_in_order(self, spark):
        from pyspark.sql import Row

        df = spark.createDataFrame(
            [Row(id=1, text="a b c d e f g h i j k l m")]
        )
        rows = sorted(
            (r["pos"], r["line"])
            for r in D.doc_line_table(df, "id", words_per_line=5).collect()
        )
        assert rows == [(0, "a b c d e"), (1, "f g h i j"), (2, "k l m")]


class TestRepeatedSpans:
    def test_planted_copy_spans(self, spark):
        # doc 2 copies an 12-token passage from doc 1; doc 3 is clean
        passage = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"
        corpus = docs(spark, [
            (1, f"start one two {passage} end tail words here now"),
            (2, f"{passage} completely different continuation of text"),
            (3, "totally original content with no repeated passages at all ok"),
        ])
        out = {r["id"]: r for r in
               D.repeated_span_report(corpus, "id", k=10).collect()}
        # the 12-token passage yields 3 consecutive dup 10-gram
        # positions -> one merged span of 12 tokens in each doc
        assert out[1]["n_dup_spans"] == 1
        assert out[1]["longest_span_tokens"] == 12
        assert out[2]["n_dup_spans"] == 1
        assert out[2]["longest_span_tokens"] == 12
        assert out[3]["n_dup_spans"] == 0
        assert out[3]["dup_token_frac"] == 0.0

    def test_short_docs_report_zero(self, spark):
        corpus = docs(spark, [(1, "too short"), (2, "")])
        out = {r["id"]: r for r in
               D.repeated_span_report(corpus, "id", k=10).collect()}
        assert out[1]["n_dup_spans"] == 0 and out[2]["n_dup_spans"] == 0
        assert out[2]["n_tokens"] == 0

    def test_overlapping_windows_union_not_double_counted(self, spark):
        # doc 1: 12 tokens; gram@0 repeats in doc 2, gram@2 repeats in
        # doc 3, gram@1 is unique. The two marked windows overlap, so
        # they must merge into ONE span of 12 tokens (frac exactly 1.0)
        # — a unit-gap island rule would report 20/12.
        t = [f"w{i}" for i in range(12)]
        corpus = docs(spark, [
            (1, " ".join(t)),
            (2, " ".join(t[0:10])),
            (3, " ".join(t[2:12])),
        ])
        out = {r["id"]: r for r in
               D.repeated_span_report(corpus, "id", k=10).collect()}
        assert out[1]["n_dup_spans"] == 1
        assert out[1]["longest_span_tokens"] == 12
        assert out[1]["dup_token_frac"] == 1.0


class TestHammingPairs:
    def test_variable_slices_never_degenerate(self, spark):
        """bits=4 / distance=2 forces variable slice widths (2,1,1) —
        a fixed ceil width would create an always-zero block and
        silently degrade to the all-pairs scan. Candidates must still
        contain every pair within distance (pigeonhole), verified
        against a brute-force reference."""
        from itertools import combinations

        from pyspark.sql import Row

        from pg2any_spark.operators.dedup import hamming_pairs

        fps = [(i, i % 16) for i in range(16)]
        df = spark.createDataFrame([Row(id=i, fp=f) for i, f in fps])
        got = {
            (r["id_a"], r["id_b"]): r["hamming"]
            for r in hamming_pairs(df, "id", "fp", bits=4, max_distance=2).collect()
        }
        want = {
            (a, b): bin(fa ^ fb).count("1")
            for (a, fa), (b, fb) in combinations(fps, 2)
            if bin(fa ^ fb).count("1") <= 2
        }
        assert got == want

    def test_rejects_impossible_blocking(self, spark):
        import pytest as _pt
        from pyspark.sql import Row

        from pg2any_spark.operators.dedup import hamming_pairs

        df = spark.createDataFrame([Row(id=1, fp=3)])
        with _pt.raises(ValueError, match="non-empty pigeonhole"):
            hamming_pairs(df, "id", "fp", bits=2, max_distance=5)
        with _pt.raises(ValueError, match="bits"):
            hamming_pairs(df, "id", "fp", bits=64, max_distance=3)

    def test_simhash_delegation_preserves_default_blocks(self, spark):
        """simhash_hamming_pairs(max_distance=3) must produce exactly
        the old hardcoded 4x8-bit blocking's result (32/4 = 8-bit
        slices are the variable-slice layout for those parameters)."""
        from pyspark.sql import Row

        from pg2any_spark.operators.dedup import simhash_hamming_pairs

        fps = [Row(id=1, simhash=0b1010), Row(id=2, simhash=0b1011),
               Row(id=3, simhash=0xFFFF00FF)]
        df = spark.createDataFrame(fps)
        out = {(r["id_a"], r["id_b"]): r["hamming"]
               for r in simhash_hamming_pairs(df, "id").collect()}
        assert out == {(1, 2): 1}


class TestExactSubstring:
    """exact_substring_spans: true per-pair repeated substrings via
    diagonal seed-chaining — and the chain-decoy failure mode of the
    k-gram coverage report it corrects."""

    def _mk(self, spark):
        span = " ".join(f"s{i}" for i in range(12))  # 12-token repeat
        u = [f"u{i}" for i in range(30)]
        fill = [f"f{i}" for i in range(40)]
        return docs(spark, [
            # true pair: 12-token exact repeat
            (1, " ".join(fill[0:4]) + " " + span + " " + " ".join(fill[4:7])),
            (2, " ".join(fill[7:12]) + " " + span + " " + " ".join(fill[12:14])),
            # chain decoy: doc 3 holds u0..u29; doc 4 repeats u0..u11,
            # doc 5 repeats u8..u29 (22 tokens) — coverage on doc 3
            # chains 0..29, but no 30-token substring repeats anywhere
            (3, " ".join(u)),
            (4, " ".join(fill[14:18]) + " " + " ".join(u[0:12])),
            (5, " ".join(fill[18:22]) + " " + " ".join(u[8:30])),
        ])

    def test_true_pair_span_exact_length(self, spark):
        out = D.exact_substring_spans(
            self._mk(spark), "id", k=5, min_len=10, max_occ=8
        )
        by_pair = {(r["id_a"], r["id_b"]): r for r in out.collect()}
        assert by_pair[(1, 2)]["longest_span"] == 12
        assert by_pair[(1, 2)]["n_spans"] == 1

    def test_decoy_chain_reports_per_pair_not_union(self, spark):
        corpus = self._mk(spark)
        out = {(r["id_a"], r["id_b"]): r for r in D.exact_substring_spans(
            corpus, "id", k=5, min_len=15, max_occ=8
        ).collect()}
        # true per-pair maxima: (3,5) shares 22 tokens >= 15; (3,4)
        # shares only 12 < 15 and must NOT appear
        assert out[(3, 5)]["longest_span"] == 22
        assert (3, 4) not in out
        # ... while the coverage report over-merges doc 3 to a
        # 30-token "span" that repeats nowhere as a whole — the
        # documented failure this operator exists to fix
        cov = {r["id"]: r["longest_span_tokens"] for r in
               D.repeated_span_report(corpus, "id", k=5).collect()}
        assert cov[3] == 30

    def test_within_doc_repeat_found_on_diagonal(self, spark):
        body = " ".join(f"s{i}" for i in range(10))
        corpus = docs(spark, [
            (1, body + " gapa gapb gapc gapd gape gapf " + body),
        ])
        out = D.exact_substring_spans(
            corpus, "id", k=5, min_len=10, max_occ=8
        ).collect()
        assert len(out) == 1
        r = out[0]
        assert (r["id_a"], r["id_b"]) == (1, 1)
        assert r["longest_span"] == 10

    def test_occurrence_cap_drops_hot_gram_and_reports(self, spark):
        hot = " ".join(f"h{i}" for i in range(6))
        rows = [(i, f"lead{i}a lead{i}b " + hot + f" tail{i}") for i in range(10)]
        corpus = docs(spark, rows)
        out = D.exact_substring_spans(
            corpus, "id", k=5, min_len=5, max_occ=4
        ).collect()
        assert out == []  # every hot anchor capped away
        rep = D.exact_substring_hot_grams(
            corpus, "id", k=5, max_occ=4
        ).collect()[0]
        # grams: per doc 5 positional 5-grams, 2 fully inside `hot`
        # shared by all 10 docs -> 2 hot hashes with 10 occurrences
        assert rep["n_hot_grams"] == 2
        assert rep["hot_occurrences"] == 20
        assert rep["n_eligible_grams"] == 0

    def test_gap_breaks_chain(self, spark):
        # two 8-token shared blocks separated by differing 6-token
        # gaps: same diagonal, anchor jump 14 > k=5 -> two islands,
        # neither reaching min_len=20
        b1 = " ".join(f"a{i}" for i in range(8))
        b2 = " ".join(f"b{i}" for i in range(8))
        corpus = docs(spark, [
            (1, b1 + " g1 g2 g3 g4 g5 g6 " + b2),
            (2, b1 + " h1 h2 h3 h4 h5 h6 " + b2),
        ])
        out = {(r["id_a"], r["id_b"]): r for r in D.exact_substring_spans(
            corpus, "id", k=5, min_len=8, max_occ=8
        ).collect()}
        r = out[(1, 2)]
        assert r["n_spans"] == 2 and r["longest_span"] == 8
        none20 = D.exact_substring_spans(
            corpus, "id", k=5, min_len=20, max_occ=8
        ).collect()
        assert none20 == []


class TestExactSubstringExcise:
    def test_later_occurrence_excised_earlier_kept(self, spark):
        span = " ".join(f"s{i}" for i in range(12))
        fill = [f"f{i}" for i in range(20)]
        corpus = docs(spark, [
            (1, " ".join(fill[0:3]) + " " + span + " " + " ".join(fill[3:5])),
            (2, " ".join(fill[5:9]) + " " + span + " " + fill[9]),
            (3, " ".join(fill[10:16])),  # clean
        ])
        out = {r["id"]: r for r in D.exact_substring_excise(
            corpus, "id", k=5, min_len=10, max_occ=8
        ).collect()}
        # doc 1 (earlier) keeps everything
        assert out[1]["excised_tokens"] == 0
        assert out[1]["kept_tokens"] == out[1]["n_tokens"] == 17
        # doc 2 loses exactly the 12-token span, nothing else
        assert out[2]["n_tokens"] == 17
        assert out[2]["excised_tokens"] == 12
        assert out[2]["kept_tokens"] == 5
        assert out[2]["n_excised_spans"] == 1
        assert out[3]["excised_tokens"] == 0
        # the digest is of the kept stream in position order
        import hashlib
        want = hashlib.md5(
            (" ".join(fill[5:9]) + " " + fill[9]).encode()
        ).hexdigest()
        assert out[2]["kept_digest"] == want

    def test_whole_doc_excised_digest_of_empty(self, spark):
        body = " ".join(f"w{i}" for i in range(10))
        corpus = docs(spark, [(1, body), (2, body)])
        out = {r["id"]: r for r in D.exact_substring_excise(
            corpus, "id", k=5, min_len=10, max_occ=8
        ).collect()}
        assert out[2]["kept_tokens"] == 0
        import hashlib
        assert out[2]["kept_digest"] == hashlib.md5(b"").hexdigest()
        assert out[1]["kept_tokens"] == 10

    def test_overlapping_excisions_merge(self, spark):
        # doc 3 copies [0:12] from doc 1 and [6:18] from doc 2 — the
        # two excision intervals overlap and must merge into ONE
        # 18-token removal, not double-count
        u = [f"u{i}" for i in range(18)]
        corpus = docs(spark, [
            (1, " ".join(u[0:12])),
            (2, " ".join(u[6:18])),
            (3, " ".join(u)),
        ])
        out = {r["id"]: r for r in D.exact_substring_excise(
            corpus, "id", k=5, min_len=12, max_occ=8
        ).collect()}
        assert out[3]["excised_tokens"] == 18
        assert out[3]["n_excised_spans"] == 1
        assert out[3]["kept_tokens"] == 0

    def test_below_threshold_survives(self, spark):
        shared = " ".join(f"s{i}" for i in range(8))
        corpus = docs(spark, [
            (1, shared + " x1 x2"),
            (2, shared + " y1 y2"),
        ])
        out = {r["id"]: r for r in D.exact_substring_excise(
            corpus, "id", k=5, min_len=20, max_occ=8
        ).collect()}
        assert out[1]["excised_tokens"] == 0
        assert out[2]["excised_tokens"] == 0


class TestContainmentPairs:
    def test_wrapper_pair_found_with_low_jaccard(self, spark):
        big = " ".join(f"w{i}" for i in range(40))
        small = " ".join(f"w{i}" for i in range(10, 22))  # slice of big
        other = " ".join(f"x{i}" for i in range(30))
        corpus = docs(spark, [(1, big), (2, small), (3, other)])
        out = {(r["id_a"], r["id_b"]): r for r in D.containment_pairs(
            corpus, "id", n=3, max_df=8, min_overlap_pct=80
        ).collect()}
        r = out[(1, 2)]
        assert r["overlap_c6"] == 1_000_000  # fully contained
        # Jaccard = 10/38 — far below any Jaccard dedup threshold
        assert r["jaccard_c6"] < 350_000
        assert (1, 3) not in out and (2, 3) not in out

    def test_df_cap_drops_boilerplate_candidates(self, spark):
        # a shingle shared by 12 docs exceeds max_df=8: no candidates
        # from it, so no pair survives despite full containment
        shared = "b0 b1 b2 b3 b4"
        corpus = docs(spark, [(i, shared) for i in range(12)])
        out = D.containment_pairs(
            corpus, "id", n=3, max_df=8, min_overlap_pct=80
        ).collect()
        assert out == []

    def test_threshold_is_exact_cross_multiplication(self, spark):
        # 4 of 5 shingles shared = overlap exactly 0.8 -> kept (>=)
        a = "t0 t1 t2 t3 t4 t5 t6"   # shingles: 5
        b = "t0 t1 t2 t3 t4 t5 zz"   # shares 4 of its 5
        corpus = docs(spark, [(1, a), (2, b)])
        out = D.containment_pairs(
            corpus, "id", n=3, max_df=8, min_overlap_pct=80
        ).collect()
        assert len(out) == 1
        assert out[0]["overlap_c6"] == 800_000

    def test_df_cap_reports_hot_shingles(self, spark):
        # 12 copies of one 5-token text -> 3 distinct 3-gram shingles,
        # each with df=12 > max_df=8: all hot, none eligible — and the
        # mandatory report says exactly that (no silent caps).
        shared = "b0 b1 b2 b3 b4"
        corpus = docs(spark, [(i, shared) for i in range(12)])
        rep = D.containment_hot_shingles(
            corpus, "id", n=3, max_df=8
        ).collect()[0]
        assert rep["n_hot_shingles"] == 3
        assert rep["hot_occurrences"] == 36
        assert rep["n_eligible_shingles"] == 0

    def test_report_counts_eligible_and_hot(self, spark):
        # two docs share a rare slice (eligible, df=2) while ten docs
        # share a hot 5-token block (hot, df=10)
        hot = "h0 h1 h2 h3 h4"
        rare = " ".join(f"r{i}" for i in range(6))
        corpus = docs(
            spark,
            [(i, hot) for i in range(10)]
            + [(100, rare), (101, rare)],
        )
        rep = D.containment_hot_shingles(
            corpus, "id", n=3, max_df=8
        ).collect()[0]
        assert rep["n_hot_shingles"] == 3      # the 3 hot 3-grams
        assert rep["hot_occurrences"] == 30
        assert rep["n_eligible_shingles"] == 4  # rare's 4 3-grams, df=2
