"""Temporal operators: as-of join tie/unmatched semantics, range
bucketing boundaries, interval join edges."""

from __future__ import annotations

import datetime

from pyspark.sql import Row, functions as F

from pg2any_spark.operators.temporal import asof_join, bucketize, interval_join


def T(s):
    return datetime.datetime(2026, 1, 1, 0, 0, s)


class TestAsofJoin:
    def mk(self, spark):
        left = spark.createDataFrame(
            [Row(k=1, ts=T(10), lid=100), Row(k=1, ts=T(20), lid=101),
             Row(k=2, ts=T(5), lid=200)],
            "k int, ts timestamp, lid int",
        )
        right = spark.createDataFrame(
            [Row(k=1, ts=T(10), rid=1), Row(k=1, ts=T(15), rid=2),
             Row(k=3, ts=T(1), rid=9)],
            "k int, ts timestamp, rid int",
        )
        return left, right

    def test_inclusive_backward(self, spark):
        left, right = self.mk(spark)
        out = asof_join(left, right, on="ts", by=["k"], right_cols=["rid"])
        got = {r["lid"]: r["rid"] for r in out.collect()}
        # lid=100 at t10 matches rid=1 at t10 (inclusive);
        # lid=101 at t20 matches rid=2 at t15; k=2 unmatched -> NULL
        assert got == {100: 1, 101: 2, 200: None}

    def test_strict_backward(self, spark):
        left, right = self.mk(spark)
        out = asof_join(
            left, right, on="ts", by=["k"], right_cols=["rid"], inclusive=False
        )
        got = {r["lid"]: r["rid"] for r in out.collect()}
        # strict: t10 right row no longer visible to t10 left row
        assert got == {100: None, 101: 2, 200: None}

    def test_left_columns_preserved(self, spark):
        left, right = self.mk(spark)
        out = asof_join(left, right, on="ts", by=["k"], right_cols=["rid"])
        assert out.columns == ["k", "ts", "lid", "rid"]
        assert out.count() == 3  # left-outer: every left row survives


class TestBucketize:
    def test_boundaries(self, spark):
        df = spark.createDataFrame(
            [(0.0,), (99.9,), (100.0,), (150.0,), (200.0,), (1e9,)], "v double"
        )
        out = df.select(bucketize(F.col("v"), [100.0, 200.0]).alias("b")).collect()
        assert [r["b"] for r in out] == [0, 0, 1, 1, 2, 2]


class TestIntervalJoin:
    def test_window_edges(self, spark):
        p = spark.createDataFrame(
            [Row(user=1, p_ts=T(0), pid=1)], "user int, p_ts timestamp, pid int"
        )
        e = spark.createDataFrame(
            [Row(u=1, e_ts=T(0), eid=10),   # gap 0: in
             Row(u=1, e_ts=T(30), eid=11),  # gap 30s: in (max)
             Row(u=1, e_ts=T(31), eid=12),  # gap 31s: out
             Row(u=2, e_ts=T(1), eid=13)],  # other key: out
            "u int, e_ts timestamp, eid int",
        )
        out = interval_join(
            p, e, by=["user"], left_ts="p_ts", right_ts="e_ts",
            max_gap_seconds=30, right_by=["u"],
        )
        assert sorted(r["eid"] for r in out.collect()) == [10, 11]
