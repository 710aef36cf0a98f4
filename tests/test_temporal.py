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


class TestRangeJoinBinned:
    """Keyless binned range join vs a brute-force reference join."""

    def _sides(self, spark):
        from pyspark.sql import functions as F

        left = spark.createDataFrame(
            [(i, f"2026-01-01 00:{i:02d}:00") for i in range(0, 50)],
            "l_id long, l_ts_s string",
        ).select("l_id", F.to_timestamp("l_ts_s").alias("l_ts"))
        right = spark.createDataFrame(
            [(100 + i, f"2026-01-01 00:{i:02d}:30") for i in range(0, 50)],
            "r_id long, r_ts_s string",
        ).select("r_id", F.to_timestamp("r_ts_s").alias("r_ts"))
        return left, right

    def test_matches_bruteforce(self, spark):
        from pg2any_spark.operators.temporal import range_join_binned

        left, right = self._sides(spark)
        got = {
            (r["l_id"], r["r_id"])
            for r in range_join_binned(
                left, right, "l_ts", "r_ts", max_gap_seconds=150
            ).collect()
        }
        lt = {r["l_id"]: r["l_ts"] for r in left.collect()}
        rt = {r["r_id"]: r["r_ts"] for r in right.collect()}
        want = {
            (li, ri)
            for li in lt
            for ri in rt
            if 0 <= (rt[ri] - lt[li]).total_seconds() <= 150
        }
        assert got == want
        assert got  # non-trivial

    def test_boundary_inclusive(self, spark):
        from pyspark.sql import functions as F

        from pg2any_spark.operators.temporal import range_join_binned

        left = spark.createDataFrame(
            [("2026-01-01 00:00:00",)], "l_ts_s string"
        ).select(F.to_timestamp("l_ts_s").alias("l_ts"))
        right = spark.createDataFrame(
            [("2026-01-01 00:00:00",), ("2026-01-01 00:01:00",),
             ("2026-01-01 00:01:00.000001",)],
            "r_ts_s string",
        ).select(F.to_timestamp("r_ts_s").alias("r_ts"))
        out = range_join_binned(left, right, "l_ts", "r_ts", 60).collect()
        # gap=0 and gap=60s match; 60s+1us does not
        assert len(out) == 2

    def test_no_cartesian_in_plan(self, spark):
        from pg2any_spark.operators.temporal import range_join_binned

        left, right = self._sides(spark)
        df = range_join_binned(left, right, "l_ts", "r_ts", 150)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "simple"
        )
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan


class TestScd2:
    def _events(self, spark):
        """key 1: insert@10, update@20, delete@30; key 2: insert@15."""
        rows = [
            ("c", 10, {"id": "1", "v": "a"}, None),
            ("u", 20, {"id": "1", "v": "b"}, {"id": "1"}),
            ("d", 30, None, {"id": "1"}),
            ("c", 15, {"id": "2", "v": "x"}, None),
        ]
        return spark.createDataFrame(
            [(op, lsn, after, before) for op, lsn, after, before in rows],
            "op string, lsn long, after map<string,string>, before map<string,string>",
        )

    def test_history_intervals(self, spark):
        from pyspark.sql.types import (
            LongType, StringType, StructField, StructType,
        )

        from pg2any_spark.operators.scd2 import scd2_from_events

        schema = StructType(
            [StructField("id", LongType()), StructField("v", StringType())]
        )
        hist = scd2_from_events(self._events(spark), schema, ["id"])
        got = {
            (r["id"], r["v"]): (r["valid_from_lsn"], r["valid_to_lsn"], r["is_current"])
            for r in hist.collect()
        }
        assert got == {
            (1, "a"): (10, 20, False),
            (1, "b"): (20, 30, False),  # closed by the delete
            (2, "x"): (15, None, True),
        }

    def test_snapshot_matches_destructive_apply(self, spark):
        """Snapshot at the max LSN must equal the apply operator's
        final state (deletes leave no current version)."""
        from pyspark.sql.types import (
            LongType, StringType, StructField, StructType,
        )

        from pg2any_spark.operators.scd2 import scd2_from_events, scd2_snapshot_at

        schema = StructType(
            [StructField("id", LongType()), StructField("v", StringType())]
        )
        hist = scd2_from_events(self._events(spark), schema, ["id"])
        snap = {
            (r["id"], r["v"]) for r in scd2_snapshot_at(hist, 99).collect()
        }
        assert snap == {(2, "x")}
        mid = {(r["id"], r["v"]) for r in scd2_snapshot_at(hist, 25).collect()}
        assert mid == {(1, "b"), (2, "x")}


class TestGapfill:
    def test_carry_runs_before_zero_fill(self, spark):
        """A column in BOTH fill_zero and carry_cols carries the last
        real observation across gaps (never a just-filled zero), and a
        genuinely observed zero is treated as real, not as a gap."""
        from pyspark.sql import functions as F

        from pg2any_spark.operators.timeseries import gapfill_daily

        facts = spark.createDataFrame(
            [("k", "2026-01-01", 5.0), ("k", "2026-01-02", 0.0),
             ("k", "2026-01-04", 7.0)],
            "key string, day_s string, v double",
        ).select("key", F.to_date("day_s").alias("day"), "v")
        out = gapfill_daily(
            facts, ["key"], "day",
            fill_zero={"v": F.lit(0.0)}, carry_cols=["v"],
        )
        got = {str(r["day"]): r["v"] for r in out.collect()}
        # Jan 3 is the only gap: carried from Jan 2's REAL zero
        assert got == {"2026-01-01": 5.0, "2026-01-02": 0.0,
                       "2026-01-03": 0.0, "2026-01-04": 7.0}
        # separate carry column: gap day carries 0.0 (the real obs),
        # proving the carry source is the observation, not the fill
        facts2 = facts.withColumn("carried", F.col("v"))
        out2 = gapfill_daily(
            facts2, ["key"], "day",
            fill_zero={"v": F.lit(0.0)}, carry_cols=["carried"],
        )
        got2 = {str(r["day"]): r["carried"] for r in out2.collect()}
        assert got2["2026-01-03"] == 0.0 and got2["2026-01-04"] == 7.0

    def test_range_join_rejects_nonpositive_gap(self, spark):
        import pytest as _pytest

        from pg2any_spark.operators.temporal import range_join_binned

        df = spark.range(1).selectExpr("current_timestamp() AS ts")
        with _pytest.raises(ValueError):
            range_join_binned(df, df, "ts", "ts", 0)


class TestScd2CrossOperatorConsistency:
    def test_snapshot_at_end_equals_destructive_apply(self, spark, sf_dir):
        """The SCD2 history and the destructive apply are two views of
        the SAME event stream: time travel to the end of the stream
        must reproduce the apply operator's final table exactly (on the
        real customer fixture, full column set)."""
        from pg2any_spark.operators.apply import apply_changes
        from pg2any_spark.operators.scd2 import scd2_from_events, scd2_snapshot_at
        from pg2any_spark.sources.cdc_gen import synth_customer_events
        from pg2any_spark.sources.fixtures import load_table

        events = synth_customer_events(spark, sf_dir)
        cust = load_table(spark, "customer", sf_dir)
        hist = scd2_from_events(events, cust.schema, ["c_custkey"])
        snap = {
            tuple(r) for r in scd2_snapshot_at(hist, 1 << 60)
            .select(*[f.name for f in cust.schema.fields]).collect()
        }
        applied = {
            tuple(r) for r in apply_changes(
                events, cust.schema, ["c_custkey"], table="customer",
                scan_for_truncate=False,
            ).select(*[f.name for f in cust.schema.fields]).collect()
        }
        assert snap == applied and len(snap) > 0

    def test_versions_partition_each_key_timeline(self, spark, sf_dir):
        """Interval sanity on the real fixture: per key, versions are
        contiguous (each valid_to equals the next valid_from), never
        overlap, and at most one is open."""
        from pyspark.sql import functions as F

        from pg2any_spark.operators.scd2 import scd2_from_events
        from pg2any_spark.sources.cdc_gen import synth_customer_events
        from pg2any_spark.sources.fixtures import load_table

        events = synth_customer_events(spark, sf_dir)
        cust = load_table(spark, "customer", sf_dir)
        hist = scd2_from_events(events, cust.schema, ["c_custkey"])
        from pyspark.sql import Window

        w = Window.partitionBy("c_custkey").orderBy("valid_from_lsn")
        checked = hist.withColumn("__next_from", F.lead("valid_from_lsn").over(w))
        # every closed version's valid_to == the next version's start
        # (a delete closes the last version and its valid_to has no
        # successor row, so only rows WITH a successor are constrained)
        bad = checked.filter(
            F.col("__next_from").isNotNull()
            & (F.col("valid_to_lsn") != F.col("__next_from"))
        ).count()
        assert bad == 0
        multi_open = (
            hist.filter("is_current").groupBy("c_custkey").count()
            .filter("count > 1").count()
        )
        assert multi_open == 0


class TestMadAnomaly:
    def test_planted_outliers_found_robustly(self, spark):
        """A tight cluster + extreme outliers: MAD must flag exactly
        the planted outliers — including the case where the outliers
        are extreme enough to drag a mean/stddev screen into missing
        them (the robustness argument for MAD)."""
        from pyspark.sql import Row

        from pg2any_spark.operators.timeseries import mad_anomaly_report

        rows = [Row(k="a", v=100.0 + (i % 7) * 0.1) for i in range(50)]
        rows += [Row(k="a", v=10_000.0), Row(k="a", v=-5_000.0)]
        rows += [Row(k="b", v=1.0)] * 10  # zero-MAD group: no anomalies
        df = spark.createDataFrame(rows)
        out = {
            r["k"]: r for r in mad_anomaly_report(df, "k", "v").collect()
        }
        assert out["a"]["n_events"] == 52
        assert out["a"]["n_anomalies"] == 2
        # zero MAD: |v - med| = 0 is NOT > 0 — no anomalies, no crash
        assert out["b"]["n_anomalies"] == 0 and out["b"]["mad_x4"] == 0
        # med of group a: 26th/27th of 52 sorted values are both
        # 100.3 → median 10030 cents → ×2 = 20060 (a robust median —
        # the outlier-dragged MEAN would sit near 196.15)
        assert out["a"]["med_x2"] == 20060
