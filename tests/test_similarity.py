from __future__ import annotations

import pytest
from pyspark.sql import Row, functions as F

from pg2any_spark.operators import similarity as S


def vecs(spark, rows):
    return spark.createDataFrame(
        [Row(vec_id=i, embedding=[float(x) for x in v]) for i, v in rows]
    )


def test_bruteforce_identical_vector_ranks_first(spark):
    df = vecs(
        spark,
        [
            (1, [1, 0, 0, 0]),
            (2, [1, 0, 0, 0]),
            (3, [0, 1, 0, 0]),
            (4, [0.9, 0.1, 0, 0]),
        ],
    )
    q = df.filter("vec_id = 1")
    out = S.brute_force_topk(df, q, k=2).collect()
    ranked = {r["rank"]: (r["neighbor_id"], r["cos_sim"]) for r in out}
    assert ranked[1] == (2, 1.0)
    assert ranked[2][0] == 4


def test_cosine_scale_invariant(spark):
    df = vecs(spark, [(1, [1, 2, 3, 4]), (2, [0.5, 1, 1.5, 2])])
    q = df.filter("vec_id = 1")
    out = S.brute_force_topk(df, q, k=1).collect()
    assert out[0]["neighbor_id"] == 2
    assert out[0]["cos_sim"] == pytest.approx(1.0)


def test_srp_bucket_scale_invariant(spark):
    df = vecs(spark, [(1, [1.0] * 8 + [0.0] * 56), (2, [0.5] * 8 + [0.0] * 56)])
    out = S.with_srp_bucket(df, dim=64, num_planes=8).collect()
    buckets = {r["vec_id"]: r["bucket"] for r in out}
    assert buckets[1] == buckets[2]


def test_lsh_topk_subset_of_bruteforce_space(spark):
    df = vecs(
        spark,
        [(i, [float((i * 7 + j * 3) % 5 - 2) for j in range(64)]) for i in range(20)],
    )
    q = df.filter("vec_id = 0")
    out = S.lsh_topk(df, q, dim=64, num_planes=4, k=5).collect()
    assert all(r["query_id"] == 0 and r["neighbor_id"] != 0 for r in out)
    assert len(out) <= 5


class TestIVF:
    def test_assignment_deterministic_and_complete(self, spark, sf_dir):
        from pg2any_spark.sources.fixtures import load_table

        emb = load_table(spark, "embeddings", sf_dir)
        cents = S.ivf_centroids(emb, num_centroids=8)
        assert len(cents) == 8
        assigned = S._normalized(emb, "vec_id", "vec_id", "embedding", "v").withColumn(
            "cell", S.ivf_assign(F.col("v"), cents)
        )
        rows = assigned.collect()
        cent_ids = {cid for cid, _ in cents}
        assert all(r["cell"] in cent_ids for r in rows)
        # a centroid's own vector must land in its own cell
        own = {r["vec_id"]: r["cell"] for r in rows if r["vec_id"] in cent_ids}
        assert own == {cid: cid for cid in cent_ids}

    def test_recall_vs_bruteforce(self, spark, sf_dir):
        """IVF with nprobe=2 of 8 cells must recover a reasonable share
        of the exact top-5 (loose floor — recall depends on data)."""
        from pg2any_spark.sources.fixtures import load_table

        emb = load_table(spark, "embeddings", sf_dir)
        q = emb.filter("vec_id % 100 = 0")
        exact = S.brute_force_topk(emb, q, k=5).collect()
        approx = S.ivf_topk(emb, q, k=5, num_centroids=8, nprobe=2).collect()
        exact_pairs = {(r["query_id"], r["neighbor_id"]) for r in exact}
        approx_pairs = {(r["query_id"], r["neighbor_id"]) for r in approx}
        recall = len(exact_pairs & approx_pairs) / len(exact_pairs)
        assert recall >= 0.2, f"recall {recall:.2f} suspiciously low"
        # every query returns at least one candidate
        assert {r["query_id"] for r in approx} == {r["query_id"] for r in exact}


class TestHotBucketSalting:
    """Two-phase salted top-k (hot LSH bucket / IVF cell defense)."""

    def _skewed(self, spark, n=60):
        # every vector points (almost) the same way → ONE srp bucket
        return vecs(
            spark,
            [(i, [1.0] * 32 + [0.001 * (i % 7)] * 32) for i in range(n)],
        )

    def test_ranked_topk_salted_equals_single_phase(self, spark):
        import random

        random.seed(3)
        rows = [
            (q, n, round(random.uniform(-1, 1), 6))
            for q in range(4)
            for n in range(50)
        ]
        sims = spark.createDataFrame(
            rows, "query_id long, neighbor_id long, cos_sim double"
        )
        plain = sorted(map(tuple, S.ranked_topk(sims, 5, None).collect()))
        salted = sorted(map(tuple, S.ranked_topk(sims, 5, 8).collect()))
        assert plain == salted and len(plain) == 20

    def test_lsh_topk_salted_parity_on_skewed_corpus(self, spark):
        df = self._skewed(spark)
        q = df.filter("vec_id < 3")
        base = sorted(
            map(tuple, S.lsh_topk(df, q, k=4, salt_threshold=None).collect())
        )
        # threshold of 5 forces the two-phase path (bucket holds all 60)
        salted = sorted(
            map(tuple, S.lsh_topk(df, q, k=4, salt_threshold=5).collect())
        )
        assert base == salted and len(base) == 12

    def test_ivf_topk_salted_parity_on_skewed_corpus(self, spark):
        df = self._skewed(spark, n=40)
        q = df.filter("vec_id < 2")
        base = sorted(
            map(
                tuple,
                S.ivf_topk(df, q, k=3, num_centroids=4, salt_threshold=None).collect(),
            )
        )
        salted = sorted(
            map(
                tuple,
                S.ivf_topk(df, q, k=3, num_centroids=4, salt_threshold=5).collect(),
            )
        )
        assert base == salted and len(base) == 6

    def test_uniform_data_keeps_single_window_plan(self, spark):
        df = vecs(
            spark,
            [(i, [float((i * 7 + j * 3) % 5 - 2) for j in range(64)]) for i in range(20)],
        )
        q = df.filter("vec_id = 0")
        # default threshold (100k) far above 20 rows → single-phase plan
        plan = S.lsh_topk(df, q, dim=64, num_planes=4, k=5)._jdf.queryExecution().optimizedPlan().toString()
        assert plan.count("Window [") == 1
        # forced two-phase plan carries the extra salt window
        plan2 = S.lsh_topk(df, q, dim=64, num_planes=4, k=5, salt_threshold=1)._jdf.queryExecution().optimizedPlan().toString()
        assert plan2.count("Window [") == 2


class TestKmeansRefine:
    def test_one_step_means_and_membership(self, spark):
        # 4 seeds (ids 0-3) on distinct axes; later vectors sit near a
        # known axis, so their cell and the refined mean are predictable
        base = [
            (0, [1.0, 0.0, 0.0, 0.0]),
            (1, [0.0, 1.0, 0.0, 0.0]),
            (2, [0.0, 0.0, 1.0, 0.0]),
            (3, [0.0, 0.0, 0.0, 1.0]),
            (4, [1.0, 0.0, 0.0, 0.0]),  # → cell 0
            (5, [0.0, 1.0, 0.0, 0.0]),  # → cell 1
        ]
        df = vecs(spark, base)
        out = S.kmeans_refine(df, num_centroids=4).collect()
        # membership: every vector lands in exactly one cell
        assert sum(r["n_members"] for r in out if r["pos"] == 0) == len(base)
        by_cell = {(r["cell"], r["pos"]): r for r in out}
        assert by_cell[(0, 0)]["n_members"] == 2
        assert by_cell[(0, 0)]["coord"] == 1.0  # mean of two unit-x vectors
        assert by_cell[(2, 2)]["n_members"] == 1


class TestInt8Quantization:
    def test_roundtrip_error_bounded(self, spark):
        """Reconstruction error is bounded by half a quantization step
        per dimension; codes stay in [-128, 127]."""
        import math

        from pg2any_spark.operators.similarity import (
            dequantize_int8,
            dim_min_max,
            quantize_int8,
        )
        from pyspark.sql import functions as F

        rows = [(i, [math.sin(i * 7 + d) * (d + 1) for d in range(8)])
                for i in range(20)]
        df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
        mins, maxes = dim_min_max(df)
        assert len(mins) == 8 and all(mins[d] <= maxes[d] for d in range(8))
        deq = dequantize_int8(quantize_int8(df, mins, maxes), mins, maxes)
        out = deq.select(
            "vec_id",
            F.expr(
                "aggregate(zip_with(embedding, embedding_deq, (a, b) -> abs(a - b)),"
                " cast(0.0 as double), (acc, x) -> greatest(acc, x))"
            ).alias("max_err"),
            F.expr("aggregate(code, true, (acc, c) -> acc and c >= -128 and c <= 127)")
            .alias("codes_in_range"),
        ).collect()
        for d in range(8):
            step = (maxes[d] - mins[d]) / 255
            assert step >= 0
        max_step = max((maxes[d] - mins[d]) / 255 for d in range(8))
        assert all(r["codes_in_range"] for r in out)
        assert all(r["max_err"] <= max_step / 2 + 1e-9 for r in out)

    def test_constant_dimension_codes_to_zero(self, spark):
        from pg2any_spark.operators.similarity import (
            dim_min_max,
            quantize_int8,
        )

        df = spark.createDataFrame(
            [(1, [5.0, 1.0]), (2, [5.0, 3.0])],
            "vec_id long, embedding array<double>",
        )
        mins, maxes = dim_min_max(df)
        codes = {r["vec_id"]: r["code"]
                 for r in quantize_int8(df, mins, maxes).collect()}
        assert codes[1][0] == 0 and codes[2][0] == 0  # constant dim
        assert codes[1][1] == -128 and codes[2][1] == 127  # full range

    def test_recall_report_bounds(self, spark, sf_dir):
        from pg2any_spark.operators.similarity import quantized_recall_report
        from pg2any_spark.sources.fixtures import load_table

        emb = load_table(spark, "embeddings", sf_dir)
        rows = quantized_recall_report(emb, query_mod=20, k=5).collect()
        assert rows and all(0 <= r["recall_at_k"] <= 1 for r in rows)
        # int8 against 64 dims should barely lose neighbors
        assert sum(r["recall_at_k"] for r in rows) / len(rows) >= 0.8


class TestInt8NumpyParity:
    @staticmethod
    def _np_codes(mat, mins, maxes):
        import numpy as np

        mn, mx = np.asarray(mins), np.asarray(maxes)
        span = mx - mn
        with np.errstate(divide="ignore", invalid="ignore"):
            scaled = (mat - mn) / span * 255
        # numpy rounds half-to-even; the engine contract is half-up,
        # so emulate it explicitly
        codes = np.floor(scaled + 0.5).astype("int64") - 128
        codes = np.clip(codes, -128, 127)
        codes[:, span == 0] = 0
        return codes

    def test_spark_codes_match_numpy_reference(self, spark):
        """Spark's codegen quantization must agree cell-for-cell with
        an independent numpy implementation across random data with
        negatives, constants, and extreme magnitudes."""
        import numpy as np

        from pg2any_spark.operators.similarity import dim_min_max, quantize_int8

        rng = np.random.default_rng(7)
        mat = rng.normal(0, 100, (50, 6))
        mat[:, 2] = 3.25  # constant dimension
        mat[:, 4] *= 1e6  # extreme magnitudes
        rows = [(i, [float(x) for x in mat[i]]) for i in range(50)]
        df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
        mins, maxes = dim_min_max(df)
        assert mins == [float(m) for m in mat.min(axis=0)]
        want = self._np_codes(mat, mins, maxes)
        got = {r["vec_id"]: r["code"] for r in quantize_int8(df, mins, maxes).collect()}
        for i in range(50):
            assert got[i] == list(want[i]), f"row {i}: {got[i]} != {list(want[i])}"

    def test_np_quantize_matches_spark(self, spark):
        """operators.similarity._np_quantize (the IVF-PQ closure's
        vectorized quantizer) must stay byte-identical to
        quantize_int8's codegen output — the PQ family's integer-exact
        cross-engine guarantee rides on the three implementations
        (Spark expression, oracle SQL, numpy) never drifting."""
        import numpy as np

        from pg2any_spark.operators.similarity import (
            _np_quantize,
            dim_min_max,
            quantize_int8,
        )

        rng = np.random.default_rng(11)
        mat = rng.normal(0, 100, (50, 6))
        mat[:, 2] = 3.25  # constant dimension
        mat[:, 4] *= 1e6  # extreme magnitudes
        rows = [(i, [float(x) for x in mat[i]]) for i in range(50)]
        df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
        mins, maxes = dim_min_max(df)
        want = _np_quantize(
            mat, np.asarray(mins, dtype=np.float64), np.asarray(maxes, dtype=np.float64)
        )
        got = {r["vec_id"]: r["code"] for r in quantize_int8(df, mins, maxes).collect()}
        for i in range(50):
            assert got[i] == list(want[i]), f"row {i}: {got[i]} != {list(want[i])}"


class TestKnnLabel:
    def test_majority_vote_and_tiebreak(self, spark):
        from pyspark.sql import Row

        from pg2any_spark.operators.similarity import knn_label

        # 3 corpus vectors near +x with label 1, 2 near +y with label 0;
        # query on +x must take label 1 by 3-2 vote
        corpus = spark.createDataFrame(
            [
                Row(vec_id=1, embedding=[1.0, 0.0], label=1),
                Row(vec_id=2, embedding=[0.9, 0.1], label=1),
                Row(vec_id=3, embedding=[0.8, 0.2], label=1),
                Row(vec_id=4, embedding=[0.0, 1.0], label=0),
                Row(vec_id=5, embedding=[0.1, 0.9], label=0),
            ]
        )
        q = spark.createDataFrame([Row(vec_id=100, embedding=[1.0, 0.05], label=9)])
        out = knn_label(corpus, q, k=5).collect()
        assert len(out) == 1
        assert out[0]["pred_label"] == 1
        assert out[0]["votes"] == 3

    def test_tie_breaks_to_smaller_label(self, spark):
        from pyspark.sql import Row

        from pg2any_spark.operators.similarity import knn_label

        corpus = spark.createDataFrame(
            [
                Row(vec_id=1, embedding=[1.0, 0.0], label=7),
                Row(vec_id=2, embedding=[0.0, 1.0], label=3),
            ]
        )
        q = spark.createDataFrame(
            [Row(vec_id=100, embedding=[1.0, 1.0], label=0)]
        )
        out = knn_label(corpus, q, k=2).collect()[0]
        assert out["votes"] == 1
        assert out["pred_label"] == 3


# ---------------------------------------------------------------------------
# product quantization
# ---------------------------------------------------------------------------


class TestPQ:
    def _clustered(self, spark):
        # 8-dim vectors, m=2 subspaces of 4: ids 0/1 seed the books;
        # 2 and 3 sit exactly on those seeds' subvectors, crosswise.
        rows = [
            (0, [0, 0, 0, 0, 9, 9, 9, 9]),
            (1, [5, 5, 5, 5, 1, 1, 1, 1]),
            (2, [0, 0, 0, 0, 1, 1, 1, 1]),  # sub0 like seed0, sub1 like seed1
            (3, [5, 5, 5, 5, 9, 9, 9, 9]),  # sub0 like seed1, sub1 like seed0
        ]
        return vecs(spark, rows)

    def test_encode_picks_nearest_codeword_per_subspace(self, spark):
        df = self._clustered(spark)
        mins, maxes = S.dim_min_max(df)
        codes = S.quantize_int8(df, mins, maxes).select("vec_id", "code")
        books = S.pq_codebooks(codes, m=2, num_codewords=2)
        enc = {
            r["vec_id"]: list(r["pqcode"])
            for r in S.pq_encode(codes, books).collect()
        }
        assert enc[0] == [0, 0] and enc[1] == [1, 1]
        assert enc[2] == [0, 1] and enc[3] == [1, 0]

    def test_adc_distance_is_exact_integer_lut_sum(self, spark):
        # a vector that IS a seed: ADC distance to itself-as-neighbor
        # equals 0 through the codebooks, and all distances are ints.
        df = self._clustered(spark)
        out = S.pq_adc_topk(df, m=2, k=3, num_codewords=2, query_mod=1)
        rows = out.collect()
        assert rows and all(isinstance(r["adc_d2"], int) for r in rows)
        best = {
            r["query_id"]: r["neighbor_id"] for r in rows if r["rank"] == 1
        }
        # query 0's nearest through the books is vec 2 (same codeword
        # pair distance 0 on sub0; sub1 codeword = seed1's, which vec 2
        # matches exactly) — and symmetrically for the others.
        assert best[2] == 0 or best[0] == 2

    def test_encode_is_shuffle_free(self, spark):
        df = self._clustered(spark)
        mins, maxes = S.dim_min_max(df)
        codes = S.quantize_int8(df, mins, maxes).select("vec_id", "code")
        books = S.pq_codebooks(codes, m=2, num_codewords=2)
        plan = (
            S.pq_encode(codes, books)
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "Exchange" not in plan


class TestSemDedup:
    def test_min_id_exemplar_survives(self, spark):
        df = vecs(
            spark,
            [
                (1, [1, 0, 0, 0]),
                (2, [1, 0, 0, 0]),        # exact dup of 1 -> dropped
                (3, [0, 1, 0, 0]),        # orthogonal -> kept
                (4, [0.9999, 0.01, 0, 0]),  # cos ~0.99995 to 1 -> dropped
            ],
        )
        out = {
            r["id"]: r["dropped"]
            for r in S.semdedup_flags(df, num_centroids=2).collect()
        }
        assert out == {1: False, 2: True, 3: False, 4: True}

    def test_planted_copies_all_dropped(self, spark):
        from pyspark.sql import functions as F

        from pg2any_spark.sources.fixtures import load_table

        emb = load_table(spark, "embeddings", "/root/testdata/sf0.001")
        dbl = F.transform(F.col("embedding"), lambda x: x.cast("double"))
        base = emb.select("vec_id", dbl.alias("embedding")).unionByName(
            emb.select(
                (F.col("vec_id") + 100000).alias("vec_id"),
                F.transform(dbl, lambda x: x * 0.5).alias("embedding"),
            )
        )
        flags = S.semdedup_flags(base, num_centroids=16).collect()
        # a 0.5-scaled copy normalizes to a bit-identical unit vector:
        # same cell as its original, cosine exactly 1.0 -> every copy
        # (the larger id of its pair) must be dropped
        copies = {r["id"]: r["dropped"] for r in flags if r["id"] >= 100000}
        assert copies and all(copies.values())


class TestSemanticDecontaminate:
    def test_planted_contaminant_found_with_best_match(self, spark):
        import math

        # dim-4 unit-ish vectors; eval 100 = exact scaled copy of
        # train 1; eval 101 close to train 2; train 3 orthogonal
        train = vecs(spark, [
            (1, [1.0, 0.0, 0.0, 0.0]),
            (2, [0.0, 1.0, 0.0, 0.0]),
            (3, [0.0, 0.0, 1.0, 0.0]),
        ])
        eps = 0.05
        n = math.sqrt(1 + eps * eps)
        ev = vecs(spark, [
            (100, [0.5, 0.0, 0.0, 0.0]),
            (101, [eps / n, 1.0 / n, 0.0, 0.0]),
        ])
        out = {
            r["train_id"]: (r["eval_id"], r["cos_sim"])
            for r in S.semantic_decontaminate(
                train, ev, dim=4, num_planes=6, threshold=0.95
            ).collect()
        }
        assert out[1] == (100, 1.0)
        assert 2 in out and out[2][0] == 101 and out[2][1] >= 0.95
        assert 3 not in out

    def test_tie_breaks_to_smallest_eval_id(self, spark):
        train = vecs(spark, [(1, [1.0, 0.0, 0.0, 0.0])])
        ev = vecs(spark, [
            (200, [2.0, 0.0, 0.0, 0.0]),
            (100, [0.5, 0.0, 0.0, 0.0]),
        ])
        out = S.semantic_decontaminate(
            train, ev, dim=4, num_planes=6, threshold=0.95
        ).collect()
        assert len(out) == 1
        assert out[0]["eval_id"] == 100  # both cos 1.0 → smallest id


class TestGlobalRank:
    """global_rank's boundaries are plan literals (approxQuantile),
    NOT a RangePartitioner sample — the sampled form corrupted ~97% of
    ranks the moment the output was composed with a harmless 1-row
    cross join (the two branches' range exchanges sampled different
    boundaries). These tests pin exactness bare, under composition,
    and for the descending boundary_key form."""

    def _table(self, spark, n=500):
        from pyspark.sql import Row

        # values deliberately collide (x % 37) so pids carry ties
        return spark.createDataFrame(
            [Row(id=i, x=float((i * 7919) % 37)) for i in range(n)]
        )

    def _truth(self, spark, df, desc=False):
        from pyspark.sql import Window

        key = F.col("x").desc() if desc else F.col("x")
        w = Window.orderBy(key, "id")
        return {
            r["id"]: r["r"]
            for r in df.withColumn("r", F.row_number().over(w)).collect()
        }

    def test_exact_and_composition_stable(self, spark):
        df = self._table(spark)
        t = self._truth(spark, df)
        g = S.global_rank(df, [F.col("x"), F.col("id")], rank_col="r")
        assert {r["id"]: r["r"] for r in g.collect()} == t
        # the regression shape: a 1-row broadcast cross join must not
        # perturb a single rank
        n1 = F.broadcast(df.agg(F.count(F.lit(1)).alias("__n")))
        joined = {r["id"]: r["r"] for r in g.join(n1).collect()}
        assert joined == t

    def test_descending_via_boundary_key(self, spark):
        df = self._table(spark)
        t = self._truth(spark, df, desc=True)
        g = S.global_rank(
            df,
            [F.col("x").desc(), F.col("id")],
            rank_col="r",
            boundary_key=-F.col("x"),
        )
        assert {r["id"]: r["r"] for r in g.collect()} == t

    def test_sortorder_boundary_key_raises(self, spark):
        df = self._table(spark, n=10)
        with pytest.raises(TypeError, match="SortOrder"):
            S.global_rank(df, [F.col("x").desc(), F.col("id")])

    def test_string_boundary_key_raises(self, spark):
        df = self._table(spark, n=10).withColumn("s", F.lit("a"))
        with pytest.raises(TypeError, match="numeric"):
            S.global_rank(df, [F.col("s"), F.col("id")])


class TestGlobalDistribution:
    def test_matches_window_functions_odd_sizes(self, spark):
        """NTILE / PERCENT_RANK / CUME_DIST closed forms must equal
        Spark's own window functions cell-for-cell, including the
        awkward n % buckets ≠ 0 bucket sizing, tiny n < buckets, and
        n = 1 (PERCENT_RANK's 0/0 guard)."""
        from pyspark.sql import Row, Window

        for n, b in [(17, 5), (100, 10), (3, 10), (1, 10), (10, 10)]:
            df = spark.createDataFrame(
                [Row(id=i, x=float((i * 31) % 13)) for i in range(n)]
            )
            got = {
                r["id"]: (r["decile"], r["pct_rank"], r["cume"])
                for r in S.global_distribution(
                    df, [F.col("x"), F.col("id")], buckets=b
                ).collect()
            }
            w = Window.orderBy("x", "id")
            want = {
                r["id"]: (r["decile"], r["pct_rank"], r["cume"])
                for r in df.select(
                    "id",
                    F.ntile(b).over(w).alias("decile"),
                    F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
                    F.round(F.cume_dist().over(w), 6).alias("cume"),
                ).collect()
            }
            assert got == want, (n, b)


class TestGlobalRunningSum:
    def test_matches_window_prefix_sum_and_survives_composition(self, spark):
        from pyspark.sql import Row, Window

        df = spark.createDataFrame(
            [Row(id=i, x=float((i * 13) % 7), v=(i % 9) + 1) for i in range(400)]
        ).repartition(8)
        got_frame = S.global_running_sum(
            df, [F.col("x"), F.col("id")], "v", running_col="run"
        )
        w = (
            Window.orderBy("x", "id")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        want = {
            r["id"]: r["run"]
            for r in df.withColumn("run", F.sum("v").over(w)).collect()
        }
        assert {r["id"]: r["run"] for r in got_frame.collect()} == want
        # the global_rank regression shape: 1-row cross join must not
        # perturb the prefix sums
        one = F.broadcast(df.agg(F.count(F.lit(1)).alias("__n")))
        assert {r["id"]: r["run"] for r in got_frame.join(one).collect()} == want


class TestPagerankScaled:
    def test_mass_conservation_and_sink_behavior(self, spark):
        """On a simple known graph the scaled-integer ranks must obey
        PageRank's qualitative facts: a node every walk funnels into
        outranks the sources, totals stay <= scale (dangling mass only
        LEAKS, never appears), and a re-run is bit-identical."""
        from pyspark.sql import Row

        from pg2any_spark.operators.graph import pagerank_scaled

        # star: 1..4 all point at 0; 0 points at 1
        edges = spark.createDataFrame(
            [Row(src=i, dst=0, cnt=1) for i in range(1, 5)]
            + [Row(src=0, dst=1, cnt=1)]
        )
        r = {x["k"]: x["pagerank"] for x in pagerank_scaled(edges, 3).collect()}
        assert set(r) == {0, 1, 2, 3, 4}
        assert r[0] > r[1] > r[2] == r[3] == r[4]
        assert sum(r.values()) <= 10**12
        r2 = {x["k"]: x["pagerank"] for x in pagerank_scaled(edges, 3).collect()}
        assert r == r2

    def test_empty_graph_is_empty(self, spark):
        from pg2any_spark.operators.graph import pagerank_scaled

        edges = spark.createDataFrame([], "src long, dst long, cnt long")
        assert pagerank_scaled(edges, 3).count() == 0


class TestTriangleCensusCap:
    """triangle_census degree_cap: hub-wedge guardrail with the
    mandatory n_capped_nodes report."""

    def _edges(self, spark):
        from pyspark.sql import Row

        # triangle among low-degree nodes 1-2-3, plus hub 100 wired to
        # 20 leaves (degree 20) and to node 1 (making hub triangles
        # impossible but hub wedges huge)
        rows = [Row(u=1, v=2), Row(u=1, v=3), Row(u=2, v=3)]
        rows += [Row(u=min(100, 200 + i), v=max(100, 200 + i))
                 for i in range(20)]
        rows += [Row(u=1, v=100)]
        return spark.createDataFrame(rows)

    def test_uncapped_reports_zero_capped(self, spark):
        from pg2any_spark.operators.graph import triangle_census

        r = triangle_census(self._edges(spark)).collect()[0]
        assert r["n_triangles"] == 1
        assert r["n_capped_nodes"] == 0
        # hub degree 21 -> 210 wedges at one node dominate
        assert r["n_wedges"] >= 210

    def test_cap_excludes_hub_keeps_low_degree_triangles(self, spark):
        from pg2any_spark.operators.graph import triangle_census

        r = triangle_census(self._edges(spark), degree_cap=5).collect()[0]
        # the 1-2-3 triangle survives (all degrees <= 3+1), the hub is
        # reported capped, and full-graph structure columns unchanged
        assert r["n_triangles"] == 1
        assert r["n_capped_nodes"] == 1
        assert r["n_nodes"] == 24 and r["n_edges"] == 24
        un = triangle_census(self._edges(spark)).collect()[0]
        assert (r["n_nodes"], r["n_edges"], r["n_wedges"]) == (
            un["n_nodes"], un["n_edges"], un["n_wedges"])

    def test_cap_drops_triangles_through_hubs(self, spark):
        from pyspark.sql import Row

        from pg2any_spark.operators.graph import triangle_census

        # triangle 1-2-3 where node 3 is also a hub (degree > cap)
        rows = [Row(u=1, v=2), Row(u=1, v=3), Row(u=2, v=3)]
        rows += [Row(u=3, v=300 + i) for i in range(10)]
        edges = spark.createDataFrame(rows)
        un = triangle_census(edges).collect()[0]
        assert un["n_triangles"] == 1 and un["n_capped_nodes"] == 0
        capped = triangle_census(edges, degree_cap=5).collect()[0]
        assert capped["n_triangles"] == 0  # deterministic lower bound
        assert capped["n_capped_nodes"] == 1
        # capped numerator over full-graph wedges would understate the
        # true coefficient — the capped row reports NULL instead
        assert capped["clustering_coeff"] is None
        assert un["clustering_coeff"] is not None


class TestExactAuc:
    def test_hand_computed_with_ties(self, spark):
        """pos scores [3,2,2], neg [1,2,0]: U = 3 + 2.5 + 2.5 = 8 →
        auc_num = 2U = 16, auc_den = 2·3·3 = 18, auc = 8/9."""
        df = spark.createDataFrame(
            [(3, True), (2, True), (2, True), (1, False), (2, False), (0, False)],
            "s long, y boolean",
        )
        row = S.exact_auc_report(df, "s", "y").collect()[0]
        assert (row["n_pos"], row["n_neg"]) == (3, 3)
        assert (row["auc_num"], row["auc_den"]) == (16, 18)
        assert row["auc"] == round(16 / 18, 6)

    def test_perfect_and_inverted_ranking(self, spark):
        perfect = spark.createDataFrame(
            [(10, True), (11, True), (1, False), (2, False)], "s long, y boolean"
        )
        r = S.exact_auc_report(perfect, "s", "y").collect()[0]
        assert (r["auc_num"], r["auc_den"], r["auc"]) == (8, 8, 1.0)
        inverted = spark.createDataFrame(
            [(1, True), (2, True), (10, False), (11, False)], "s long, y boolean"
        )
        r = S.exact_auc_report(inverted, "s", "y").collect()[0]
        assert (r["auc_num"], r["auc"]) == (0, 0.0)

    def test_single_class_yields_null_auc(self, spark):
        df = spark.createDataFrame([(1, True), (2, True)], "s long, y boolean")
        r = S.exact_auc_report(df, "s", "y").collect()[0]
        assert r["n_neg"] == 0 and r["auc_den"] == 0 and r["auc"] is None


class TestMarginMining:
    def test_hub_discount_hand_case(self, spark):
        """The ratio margin discounts hubs: an isolated mutual pair
        (x_iso·y_iso = 1, orthogonal to everything) scores margin
        4·1e6/(1e6+1e6) = 2.0, while x_a's equally-perfect cosine to
        the hub y_hub (which also attracts x_b at 0.8) is discounted
        to 4e6/(1.6e6+1.8e6) ≈ 1.176."""
        def df(rows):
            return spark.createDataFrame(rows, "vec_id long, embedding array<double>")

        src_full = df([(0, [1.0, 0.0, 0.0, 0.0]),
                       (1, [0.8, 0.6, 0.0, 0.0]),
                       (2, [0.0, 0.0, 1.0, 0.0])])
        tgt = df([(10, [1.0, 0.0, 0.0, 0.0]),   # hub: close to 0 AND 1
                  (11, [0.0, 0.0, 1.0, 0.0]),   # isolated partner of 2
                  (12, [0.6, 0.8, 0.0, 0.0])])
        out = {r["src_id"]: r for r in
               S.margin_mining(src_full, tgt, src_full, k=2).collect()}
        assert out[2]["tgt_id"] == 11 and out[2]["margin"] == 2.0
        assert out[0]["tgt_id"] == 10 and abs(out[0]["margin"] - 4e6 / 3.4e6) < 1e-5
        assert out[2]["margin"] > out[0]["margin"]  # hub discounted
        assert out[0]["cos_sim"] == 1.0 and out[2]["cos_sim"] == 1.0

    def test_overlapping_id_spaces_keep_id_equal_pairs(self, spark):
        """Cross-SET mining must not drop id-equal pairs: two corpora
        both numbering from 0 — the (0, 0) pair is the best candidate
        and must survive (exclude_self=False underneath)."""
        def df(rows):
            return spark.createDataFrame(rows, "vec_id long, embedding array<double>")

        src = df([(0, [1.0, 0.0]), (1, [0.0, 1.0])])
        tgt = df([(0, [1.0, 0.0]), (1, [0.6, 0.8])])  # tgt 0 == src 0
        out = {r["src_id"]: r for r in
               S.margin_mining(src, tgt, src, k=2).collect()}
        assert out[0]["tgt_id"] == 0 and out[0]["cos_sim"] == 1.0
