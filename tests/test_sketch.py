"""Count-min sketch: determinism, overestimate-only, bounded cells."""

from __future__ import annotations

from pyspark.sql import functions as F

from pg2any_spark.operators.sketch import cms_estimate, count_min_cells


def _counts(spark):
    # skewed zipf-ish key frequencies, enough keys to force collisions
    # at width=32
    rows = [(f"k{i}", (i % 97) + 1) for i in range(400)]
    return spark.createDataFrame(rows, "key string, n long")


def test_cells_bounded_and_deterministic(spark):
    tc = _counts(spark)
    cells = count_min_cells(tc, "key", weight_col="n", depth=4, width=32)
    got = cells.collect()
    assert len(got) <= 4 * 32
    assert {r["i"] for r in got} == {0, 1, 2, 3}
    again = count_min_cells(tc, "key", weight_col="n", depth=4, width=32)
    assert sorted(map(tuple, got)) == sorted(map(tuple, again.collect()))


def test_estimate_never_underestimates(spark):
    tc = _counts(spark)
    cells = count_min_cells(tc, "key", weight_col="n", depth=4, width=32)
    est = cms_estimate(cells, tc.select("key"), "key", depth=4, width=32)
    joined = tc.join(est, "key").collect()
    assert len(joined) == 400
    assert all(r["cms_n"] >= r["n"] for r in joined)


def test_row_feed_equals_weighted_feed(spark):
    # building from raw occurrences or pre-aggregated counts must give
    # byte-identical cells (mergeability in practice)
    rows = spark.createDataFrame(
        [(k,) for k in ["a", "a", "a", "b", "b", "c"]], "key string"
    )
    tc = rows.groupBy("key").agg(F.count(F.lit(1)).alias("n"))
    c1 = count_min_cells(rows, "key", depth=2, width=8)
    c2 = count_min_cells(tc, "key", weight_col="n", depth=2, width=8)
    assert sorted(map(tuple, c1.collect())) == sorted(map(tuple, c2.collect()))


def test_sketches_merge_cellwise(spark):
    # union-then-sketch == sketch-then-add: the 100 TB sharding story
    half1 = spark.createDataFrame([(f"k{i}", 3) for i in range(50)],
                                  "key string, n long")
    half2 = spark.createDataFrame([(f"k{i}", 5) for i in range(25, 75)],
                                  "key string, n long")
    whole = half1.unionByName(half2)
    direct = count_min_cells(whole, "key", weight_col="n", depth=3, width=16)
    merged = (
        count_min_cells(half1, "key", weight_col="n", depth=3, width=16)
        .unionByName(count_min_cells(half2, "key", weight_col="n",
                                     depth=3, width=16))
        .groupBy("i", "bucket").agg(F.sum("n").cast("long").alias("n"))
    )
    assert sorted(map(tuple, direct.collect())) == sorted(
        map(tuple, merged.collect())
    )


class TestHistogramQuantiles:
    def _cells(self, spark, vals, lo=0.0, hi=100.0, bins=10):
        from pg2any_spark.operators.sketch import histogram_cells

        df = spark.createDataFrame([(float(v),) for v in vals], "v double")
        return histogram_cells(df, "v", lo, hi, bins=bins)

    def test_estimate_within_one_bin_of_exact(self, spark):
        from pg2any_spark.operators.sketch import histogram_quantiles

        vals = list(range(100))  # uniform 0..99, bins of width 10
        cells = self._cells(spark, vals)
        got = {
            r["q"]: r["est"]
            for r in histogram_quantiles(
                cells, [0.1, 0.5, 0.9], 0.0, 100.0, bins=10
            ).collect()
        }
        import numpy as np

        for q in (0.1, 0.5, 0.9):
            exact = float(np.quantile(vals, q))
            assert abs(got[q] - exact) <= 10.0, (q, got[q], exact)

    def test_out_of_range_clamps_to_edge_bins(self, spark):
        cells = {
            r["bucket"]: r["n"]
            for r in self._cells(spark, [-50.0, -1.0, 150.0]).collect()
        }
        assert cells == {0: 2, 9: 1}

    def test_nulls_dropped_not_bucketed(self, spark):
        """floor(NULL) would survive least/greatest as a NULL bucket
        row that the quantile cumulative window orders FIRST (nulls
        first asc), inflating total_n — NULL values must not bucket."""
        from pg2any_spark.operators.sketch import (
            histogram_cells, histogram_quantiles,
        )

        vals = [float(v) for v in range(100)]
        df = spark.createDataFrame(
            [(v,) for v in vals] + [(None,)] * 10, "v double"
        )
        cells = histogram_cells(df, "v", 0.0, 100.0, bins=10)
        got = cells.collect()
        assert all(r["bucket"] is not None for r in got)
        assert sum(r["n"] for r in got) == 100
        est = {
            r["q"]: r["est"]
            for r in histogram_quantiles(
                cells, [0.5], 0.0, 100.0, bins=10
            ).collect()
        }
        import numpy as np

        assert abs(est[0.5] - float(np.quantile(vals, 0.5))) <= 10.0

    def test_cells_merge_equals_direct(self, spark):
        from pyspark.sql import functions as F

        a = self._cells(spark, range(0, 60))
        b = self._cells(spark, range(40, 100))
        merged = (
            a.unionByName(b).groupBy("bucket")
            .agg(F.sum("n").cast("long").alias("n"))
        )
        direct = self._cells(spark, list(range(0, 60)) + list(range(40, 100)))
        assert sorted(map(tuple, merged.collect())) == sorted(
            map(tuple, direct.collect())
        )


class TestKmv:
    def _keys(self, spark, groups):
        # groups: {name: n_distinct}; each key appears twice so
        # DISTINCT matters
        rows = []
        for g, n in groups.items():
            for i in range(n):
                rows += [(g, f"{g}-key-{i}")] * 2
        return spark.createDataFrame(rows, "grp string, key string")

    def test_below_k_is_exact(self, spark):
        from pg2any_spark.operators.sketch import kmv_cells, kmv_distinct

        df = self._keys(spark, {"a": 30})
        cells = kmv_cells(df, "key", ["grp"], k=128)
        got = kmv_distinct(cells, ["grp"], k=128).collect()
        assert got[0]["kmv_est"] == 30.0

    def test_estimate_within_tolerance(self, spark):
        from pg2any_spark.operators.sketch import kmv_cells, kmv_distinct

        df = self._keys(spark, {"a": 5000})
        cells = kmv_cells(df, "key", ["grp"], k=128)
        est = kmv_distinct(cells, ["grp"], k=128).collect()[0]["kmv_est"]
        # ~1/sqrt(k) ≈ 8.8%; allow 4 sigma
        assert abs(est - 5000) / 5000 < 0.36, est

    def test_cells_merge_by_retaking_k_min(self, spark):
        from pyspark.sql import Window
        from pyspark.sql import functions as F

        from pg2any_spark.operators.sketch import kmv_cells

        a = self._keys(spark, {"g": 400})
        b = spark.createDataFrame(
            [("g", f"g-key-{i}") for i in range(300, 700)],
            "grp string, key string",
        )
        whole = a.unionByName(b)
        direct = kmv_cells(whole, "key", ["grp"], k=64)
        merged_pool = (
            kmv_cells(a, "key", ["grp"], k=64)
            .unionByName(kmv_cells(b, "key", ["grp"], k=64))
            .select("grp", "h").distinct()
        )
        w = Window.partitionBy("grp").orderBy("h")
        remerged = (
            merged_pool.withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") <= 64)
        )
        assert sorted(map(tuple, direct.collect())) == sorted(
            map(tuple, remerged.collect())
        )


class TestBloom:
    def _df(self, spark, keys):
        return spark.createDataFrame([(k,) for k in keys], "gram string")

    def test_no_false_negatives(self, spark):
        from pg2any_spark.operators.sketch import bloom_cells, bloom_probe

        keys = [f"gram-{i}" for i in range(300)]
        cells = bloom_cells(self._df(spark, keys), "gram")
        got = {
            r["gram"]: r["bloom_hit"]
            for r in bloom_probe(cells, self._df(spark, keys), "gram").collect()
        }
        assert all(got[k] == 1 for k in keys)

    def test_fp_rate_within_theory(self, spark):
        """m=64Ki, k=4, n=300 inserted → (1 − e^{-kn/m})^k ≈ 1e-8;
        probing 1000 absent keys must yield ~0 false positives (allow
        a couple for hash-collision luck)."""
        from pg2any_spark.operators.sketch import bloom_cells, bloom_probe

        cells = bloom_cells(
            self._df(spark, [f"in-{i}" for i in range(300)]), "gram"
        )
        absent = self._df(spark, [f"out-{i}" for i in range(1000)])
        fp = sum(
            r["bloom_hit"]
            for r in bloom_probe(cells, absent, "gram").collect()
        )
        assert fp <= 2, fp

    def test_cells_merge_by_union_distinct(self, spark):
        from pg2any_spark.operators.sketch import bloom_cells, bloom_probe

        a = [f"a-{i}" for i in range(100)]
        b = [f"b-{i}" for i in range(100)]
        direct = bloom_cells(self._df(spark, a + b), "gram")
        merged = (
            bloom_cells(self._df(spark, a), "gram")
            .unionByName(bloom_cells(self._df(spark, b), "gram"))
            .distinct()
        )
        assert sorted(r["pos"] for r in direct.collect()) == sorted(
            r["pos"] for r in merged.collect()
        )
        got = {
            r["gram"]: r["bloom_hit"]
            for r in bloom_probe(merged, self._df(spark, a + b), "gram").collect()
        }
        assert all(v == 1 for v in got.values())

    def test_probe_carry_cols_keep_duplicate_keys_apart(self, spark):
        from pg2any_spark.operators.sketch import bloom_cells, bloom_probe

        cells = bloom_cells(self._df(spark, ["shared"]), "gram")
        probes = spark.createDataFrame(
            [(1, "shared"), (2, "shared"), (2, "absent-key")],
            "doc_id long, gram string",
        )
        rows = {
            (r["doc_id"], r["gram"]): r["bloom_hit"]
            for r in bloom_probe(
                cells, probes, "gram", carry_cols=["doc_id"]
            ).collect()
        }
        assert rows[(1, "shared")] == 1 and rows[(2, "shared")] == 1
        assert rows[(2, "absent-key")] == 0


class TestMisraGries:
    """exact_heavy_hitters must be EXACT (the MG stage only prunes):
    pin the superset guarantee on adversarial layouts and the final
    equality against a naive full groupBy."""

    def _stream(self, spark, spec, parts=8):
        # spec: list of (key, count); interleave rows so no partition
        # sees a clean run of one key
        rows = []
        for key, cnt in spec:
            rows.extend([key] * cnt)
        rows = [rows[i::7] for i in range(7)]  # deterministic shuffle
        flat = [x for chunk in rows for x in chunk]
        from pyspark.sql import Row

        return spark.createDataFrame(
            [Row(token=x) for x in flat]
        ).repartition(parts)

    def _naive(self, spark, df, k):
        from pyspark.sql import functions as F

        n = df.count()
        return {
            r["token"]: r["c"]
            for r in df.groupBy("token").agg(F.count("*").alias("c")).collect()
            if r["c"] * k > n
        }

    def test_equals_naive_on_zipf_like(self, spark):
        from pg2any_spark.operators.sketch import exact_heavy_hitters

        spec = [(f"t{i}", max(1, 3000 // (i + 1))) for i in range(200)]
        df = self._stream(spark, spec)
        k = 50
        got = {
            r["token"]: r["n_occ"]
            for r in exact_heavy_hitters(df, "token", k).collect()
        }
        assert got == self._naive(spark, df, k)
        # n_total is the corpus size on every row
        row = exact_heavy_hitters(df, "token", k).first()
        assert row["n_total"] == df.count()

    def test_no_heavy_hitters_is_empty_not_error(self, spark):
        from pg2any_spark.operators.sketch import exact_heavy_hitters

        spec = [(f"u{i}", 2) for i in range(500)]  # uniform: no key > n/50
        df = self._stream(spark, spec)
        assert exact_heavy_hitters(df, "token", 50).count() == 0

    def test_candidates_bounded_per_partition(self, spark):
        from pg2any_spark.operators.sketch import misra_gries_candidates

        spec = [(f"v{i}", 5) for i in range(2000)]
        df = self._stream(spark, spec, parts=4)
        k = 20
        # ≤ (k-1) per partition → ≤ 4*(k-1) total, vs 2000 distinct keys
        assert misra_gries_candidates(df, "token", k).count() <= 4 * (k - 1)

    def test_k_below_two_raises(self, spark):
        import pytest as _pytest

        from pg2any_spark.operators.sketch import misra_gries_candidates

        df = self._stream(spark, [("a", 3)], parts=1)
        with _pytest.raises(ValueError):
            misra_gries_candidates(df, "token", 1)

    def test_null_key_heavy_hitter_is_exact(self, spark):
        """NULL is a legal key (a corrupt feed's missing field is
        often THE heavy hitter): candidate generation must count it
        and the recount must null-safe-match it."""
        from pyspark.sql import Row

        from pg2any_spark.operators.sketch import exact_heavy_hitters

        rows = [Row(token=None)] * 120 + [
            Row(token=f"t{i}") for i in range(80)
        ]
        df = spark.createDataFrame(rows, "token string").repartition(4)
        out = exact_heavy_hitters(df, "token", 2).collect()  # > n/2
        assert len(out) == 1
        assert out[0]["token"] is None
        assert out[0]["n_occ"] == 120 and out[0]["n_total"] == 200
