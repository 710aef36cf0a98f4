"""CDC apply operator semantics, mirroring the reference's scenario
matrix (FIXTURES.md §3; reference chaos scenarios + replica-identity
tests)."""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import Row, functions as F

from pg2any_spark.operators.apply import (
    ReplicaIdentityError,
    apply_changes,
    split_key_changing_updates,
)
from pg2any_spark.schemas import CHANGE_EVENT_SCHEMA, T1_SCHEMA
from pg2any_spark.sources.cdc_gen import synth_customer_events
from pg2any_spark.sources.fixtures import load_table

TS = datetime.datetime(2026, 1, 1)


def ev(op, lsn, after=None, before=None, table="t1", identity="default", txid=1):
    return Row(
        op=op,
        schema="public",
        table=table,
        txid=txid,
        lsn=lsn,
        commit_ts=TS,
        before=before,
        after=after,
        key_columns=["id"],
        replica_identity=identity,
    )


def t1_after(id_, val, col1="u1", col2="u2"):
    return {"id": str(id_), "val": str(val), "col1": col1, "col2": col2}


def make_events(spark, rows):
    return spark.createDataFrame(rows, CHANGE_EVENT_SCHEMA)


def state(df):
    return {r["id"]: (r["val"], r["col1"], r["col2"]) for r in df.collect()}


class TestInsertUpdateDelete:
    def test_insert_only(self, spark):
        events = make_events(spark, [ev("c", i, t1_after(i, i * 10)) for i in range(1, 101)])
        out = apply_changes(events, T1_SCHEMA, ["id"])
        assert out.count() == 100
        st = state(out)
        assert st[7] == (70, "u1", "u2")

    def test_update_last_writer_wins(self, spark):
        events = make_events(
            spark,
            [
                ev("c", 1, t1_after(1, 5)),
                ev("u", 2, t1_after(1, 6), before={"id": "1"}),
                ev("u", 3, t1_after(1, 7), before={"id": "1"}),
            ],
        )
        out = apply_changes(events, T1_SCHEMA, ["id"])
        assert state(out)[1][0] == 7

    def test_delete_removes_row(self, spark):
        events = make_events(
            spark,
            [
                ev("c", 1, t1_after(1, 5)),
                ev("c", 2, t1_after(2, 6)),
                ev("d", 3, before={"id": "1"}),
            ],
        )
        out = apply_changes(events, T1_SCHEMA, ["id"])
        assert set(state(out)) == {2}

    def test_reinsert_after_delete(self, spark):
        events = make_events(
            spark,
            [
                ev("c", 1, t1_after(1, 5)),
                ev("d", 2, before={"id": "1"}),
                ev("c", 3, t1_after(1, 99)),
            ],
        )
        out = apply_changes(events, T1_SCHEMA, ["id"])
        assert state(out)[1][0] == 99

    def test_apply_over_base_table(self, spark):
        base = spark.createDataFrame(
            [Row(id=1, val=1, col1="a", col2="b"), Row(id=2, val=2, col1="c", col2="d")],
            T1_SCHEMA,
        )
        events = make_events(
            spark,
            [
                ev("u", 10, t1_after(1, 100, "a", "b"), before={"id": "1"}),
                ev("c", 11, t1_after(3, 3, "e", "f")),
            ],
        )
        out = apply_changes(events, T1_SCHEMA, ["id"], base=base)
        st = state(out)
        assert st == {1: (100, "a", "b"), 2: (2, "c", "d"), 3: (3, "e", "f")}

    def test_idempotent_redelivery(self, spark):
        rows = [
            ev("c", 1, t1_after(1, 5)),
            ev("u", 2, t1_after(1, 6), before={"id": "1"}),
        ]
        events = make_events(spark, rows + rows)  # duplicate delivery
        out = apply_changes(events, T1_SCHEMA, ["id"])
        assert out.count() == 1
        assert state(out)[1][0] == 6


class TestToastMerge:
    """apply_changes(toast_merge=True): UNCHANGED_TOAST sentinel cells
    resolve to the latest event that actually set the column, falling
    back to the replica's stored row — the reference's partial UPDATE
    SET semantics (sql_renderer.rs:205-234)."""

    def test_sentinel_resolves_from_base_row(self, spark):
        from pg2any_spark.schemas import UNCHANGED_TOAST

        base = spark.createDataFrame(
            [Row(id=1, val=1, col1="stored1", col2="stored2"),
             Row(id=2, val=2, col1="c", col2="d")],
            T1_SCHEMA,
        )
        # a single update whose col1 was never re-sent: merge from base
        events = make_events(
            spark,
            [ev("u", 10, t1_after(1, 100, UNCHANGED_TOAST, "x"),
                before={"id": "1"})],
        )
        out = apply_changes(events, T1_SCHEMA, ["id"], base=base,
                            toast_merge=True)
        st = state(out)
        assert st == {1: (100, "stored1", "x"), 2: (2, "c", "d")}

    def test_sentinel_resolves_from_earlier_event(self, spark):
        from pg2any_spark.schemas import UNCHANGED_TOAST

        events = make_events(
            spark,
            [
                ev("c", 1, t1_after(1, 5, "from-insert", "b")),
                ev("u", 2, t1_after(1, 6, "explicit-set", "b"),
                   before={"id": "1"}),
                ev("u", 3, t1_after(1, 7, UNCHANGED_TOAST, "b"),
                   before={"id": "1"}),
            ],
        )
        out = apply_changes(events, T1_SCHEMA, ["id"], toast_merge=True)
        # latest SET wins over older sets; sentinel never overwrites
        assert state(out) == {1: (7, "explicit-set", "b")}

    def test_explicit_null_is_not_unchanged(self, spark):
        from pg2any_spark.schemas import UNCHANGED_TOAST

        base = spark.createDataFrame(
            [Row(id=1, val=1, col1="stored1", col2="stored2")], T1_SCHEMA
        )
        events = make_events(
            spark,
            [ev("u", 10,
                {"id": "1", "val": "9", "col1": None,
                 "col2": UNCHANGED_TOAST},
                before={"id": "1"})],
        )
        out = apply_changes(events, T1_SCHEMA, ["id"], base=base,
                            toast_merge=True)
        # col1 explicitly set to NULL stays NULL; col2 merges from base
        assert state(out) == {1: (9, None, "stored2")}

    def test_delete_then_reinsert_ignores_pre_delete_values(self, spark):
        from pg2any_spark.schemas import UNCHANGED_TOAST

        events = make_events(
            spark,
            [
                ev("c", 1, t1_after(1, 5, "old-life", "b")),
                ev("d", 2, before=t1_after(1, 5, "old-life", "b")),
                ev("c", 3, t1_after(1, 6, "new-life", "b")),
                ev("u", 4, t1_after(1, 7, UNCHANGED_TOAST, "b"),
                   before={"id": "1"}),
            ],
        )
        out = apply_changes(events, T1_SCHEMA, ["id"], toast_merge=True)
        # the re-insert re-established col1; sentinel resolves to it
        assert state(out) == {1: (7, "new-life", "b")}

    def test_key_changing_update_with_sentinel_refused(self, spark):
        # the stored value lives under the OLD key; the delete+insert
        # decomposition re-homes the row, so the fallback join would
        # silently NULL the column — must refuse instead
        from pg2any_spark.schemas import UNCHANGED_TOAST

        events = make_events(
            spark,
            [
                ev("c", 1, t1_after(1, 5, "blob", "b")),
                ev("u", 2,
                   {"id": "2", "val": "6", "col1": UNCHANGED_TOAST,
                    "col2": "b"},
                   before={"id": "1"}),
            ],
        )
        with pytest.raises(ValueError, match="unchanged-TOAST"):
            apply_changes(events, T1_SCHEMA, ["id"],
                          split_key_updates=True, toast_merge=True)

    def test_matches_default_path_without_sentinels(self, spark):
        base = spark.createDataFrame(
            [Row(id=1, val=1, col1="a", col2="b"),
             Row(id=2, val=2, col1="c", col2="d")],
            T1_SCHEMA,
        )
        events = make_events(
            spark,
            [
                ev("u", 10, t1_after(1, 100, "a", "b"), before={"id": "1"}),
                ev("c", 11, t1_after(3, 3, "e", "f")),
                ev("d", 12, before={"id": "2"}),
            ],
        )
        plain = apply_changes(events, T1_SCHEMA, ["id"], base=base)
        merged = apply_changes(events, T1_SCHEMA, ["id"], base=base,
                               toast_merge=True)
        assert state(plain) == state(merged)


class TestBinaryColumns:
    def test_bytea_base64_roundtrips_to_binary_destination(self, spark):
        import base64

        from pyspark.sql.types import (
            BinaryType, LongType, StructField, StructType,
        )

        schema = StructType(
            [StructField("id", LongType(), False),
             StructField("blob", BinaryType(), True)]
        )
        payload = b"\x00\x01\xfe binary!"
        b64 = base64.b64encode(payload).decode("ascii")
        events = make_events(
            spark, [ev("c", 1, {"id": "1", "blob": b64})]
        )
        out = apply_changes(events, schema, ["id"]).collect()
        assert out[0]["blob"] == payload


    def test_bytea_hex_text_form_decodes(self, spark):
        """Text-protocol bytea arrives in PG's hex text form
        '\\x<hex>' (the wire default); it must decode to the same
        bytes as the base64 path, not be mis-unbase64d to garbage."""
        from pyspark.sql.types import (
            BinaryType, LongType, StructField, StructType,
        )

        schema = StructType(
            [StructField("id", LongType(), False),
             StructField("blob", BinaryType(), True)]
        )
        payload = b"\x00\x01\xfe binary!"
        hex_text = "\\x" + payload.hex()
        events = make_events(
            spark, [ev("c", 1, {"id": "1", "blob": hex_text})]
        )
        out = apply_changes(events, schema, ["id"]).collect()
        assert out[0]["blob"] == payload

    def test_bytea_escape_form_errors_loudly(self, spark):
        """A server running bytea_output='escape' produces
        backslash-octal text ('abc\\000def'), which is neither PG hex
        nor valid base64 — unbase64 would silently yield garbage
        bytes. The decode must hard-error instead (fail-loud
        doctrine), and NULL bytea must still pass through as NULL."""
        import pytest
        from pyspark.sql.types import (
            BinaryType, LongType, StructField, StructType,
        )

        schema = StructType(
            [StructField("id", LongType(), False),
             StructField("blob", BinaryType(), True)]
        )
        events = make_events(
            spark, [ev("c", 1, {"id": "1", "blob": "abc\\000def"})]
        )
        with pytest.raises(Exception, match="bytea|escape"):
            apply_changes(events, schema, ["id"]).collect()

        null_events = make_events(spark, [ev("c", 1, {"id": "1"})])
        out = apply_changes(null_events, schema, ["id"]).collect()
        assert out[0]["blob"] is None


class TestTruncate:
    def test_truncate_clears_base_and_prior_events(self, spark):
        base = spark.createDataFrame([Row(id=9, val=9, col1="x", col2="y")], T1_SCHEMA)
        events = make_events(
            spark,
            [
                ev("c", 1, t1_after(1, 1)),
                ev("t", 5),
                ev("c", 6, t1_after(2, 2)),
            ],
        )
        out = apply_changes(events, T1_SCHEMA, ["id"], base=base)
        assert set(state(out)) == {2}


class TestReplicaIdentity:
    def test_nothing_identity_raises(self, spark):
        events = make_events(
            spark,
            [ev("d", 1, before={"id": "1"}, identity="nothing")],
        )
        with pytest.raises(ReplicaIdentityError):
            apply_changes(events, T1_SCHEMA, ["id"], check_replica_identity=True)

    def test_full_identity_delete(self, spark):
        events = make_events(
            spark,
            [
                ev("c", 1, t1_after(1, 5)),
                ev(
                    "d",
                    2,
                    before={"id": "1", "val": "5", "col1": "u1", "col2": "u2"},
                    identity="full",
                ),
            ],
        )
        out = apply_changes(events, T1_SCHEMA, ["id"])
        assert out.count() == 0


class TestKeyChangingUpdate:
    def test_key_change_moves_row(self, spark):
        events = make_events(
            spark,
            [
                ev("c", 1, t1_after(1, 5)),
                ev("u", 2, t1_after(2, 5), before={"id": "1"}),
            ],
        )
        out = apply_changes(events, T1_SCHEMA, ["id"], split_key_updates=True)
        assert set(state(out)) == {2}

    def test_split_preserves_order(self, spark):
        events = make_events(
            spark,
            [
                ev("c", 1, t1_after(1, 5)),
                ev("u", 2, t1_after(2, 7), before={"id": "1"}),
                ev("u", 3, t1_after(2, 8), before={"id": "2"}),
            ],
        )
        out = apply_changes(events, T1_SCHEMA, ["id"], split_key_updates=True)
        assert state(out) == {2: (8, "u1", "u2")}


class TestSynthCustomerScenario:
    def test_matches_sql_oracle(self, spark, sf_dir):
        events = synth_customer_events(spark, sf_dir)
        cust = load_table(spark, "customer", sf_dir)
        out = apply_changes(events, cust.schema, ["c_custkey"])
        expected = cust.filter(F.col("c_custkey") % 7 != 0).withColumn(
            "c_acctbal",
            F.when(F.col("c_custkey") % 3 == 0, F.col("c_acctbal") + 1000).otherwise(
                F.col("c_acctbal")
            ),
        )
        assert out.count() == expected.count()
        diff = out.exceptAll(expected.select(*[f.name for f in cust.schema.fields]))
        assert diff.count() == 0


class TestRandomizedReplay:
    """Differential test: random interleaved event streams applied by
    the distributed operator must equal an independent sequential
    Python replay (sort by lsn, apply one-by-one onto a dict) — the
    simplest possible executable spec of last-writer-wins."""

    @pytest.mark.parametrize("seed", [1, 7, 42])
    def test_apply_equals_sequential_replay(self, spark, seed):
        import random

        rng = random.Random(seed)
        keys = list(range(1, 31))
        events, lsns = [], iter(range(1, 10_000))
        for _ in range(250):
            k = rng.choice(keys)
            op = rng.choices(["c", "u", "d"], weights=[3, 4, 2])[0]
            lsn = next(lsns)
            if op == "d":
                events.append(ev("d", lsn, before={"id": str(k)}))
            else:
                events.append(
                    ev(op, lsn, t1_after(k, rng.randrange(1000)), {"id": str(k)})
                )

        # sequential spec replay
        replica: dict[str, dict] = {}
        for e in sorted(events, key=lambda e: e.lsn):
            if e.op == "d":
                replica.pop(e.before["id"], None)
            else:
                replica[e.after["id"]] = e.after

        # distributed apply over a SHUFFLED event order (order must not
        # matter — the reduction keys on lsn, not arrival order)
        rng.shuffle(events)
        got = state(
            apply_changes(
                make_events(spark, events), T1_SCHEMA, ["id"],
                scan_for_truncate=False,
            )
        )
        want = {
            int(k): (int(v["val"]), v["col1"], v["col2"])
            for k, v in replica.items()
        }
        assert got == want


class TestSchemaDrift:
    """The MAP<STRING,STRING> envelope carries whatever columns the
    publisher sends (the reference's RowData is schema-dynamic per
    event, SURVEY §1.3) — the apply boundary must tolerate columns
    appearing mid-stream: unknown keys are ignored under the old
    destination schema and surface as typed values (NULL for
    pre-drift rows) once the destination schema is widened."""

    def _drift_events(self, spark):
        pre = ev("c", 1, t1_after(1, 10))
        post = Row(
            op="c", schema="public", table="t1", txid=2, lsn=2, commit_ts=TS,
            before=None,
            after={"id": "2", "val": "20", "col1": "u1", "col2": "u2",
                   "extra": "99"},
            key_columns=["id"], replica_identity="default",
        )
        return make_events(spark, [pre, post])

    def test_unknown_column_ignored_under_old_schema(self, spark):
        out = apply_changes(self._drift_events(spark), T1_SCHEMA, ["id"])
        assert set(out.columns) == {"id", "val", "col1", "col2"}
        assert state(out) == {1: (10, "u1", "u2"), 2: (20, "u1", "u2")}

    def test_widened_schema_backfills_null(self, spark):
        from pyspark.sql.types import IntegerType, StructField, StructType

        widened = StructType(
            list(T1_SCHEMA.fields) + [StructField("extra", IntegerType(), True)]
        )
        out = apply_changes(self._drift_events(spark), widened, ["id"])
        got = {r["id"]: r["extra"] for r in out.collect()}
        assert got == {1: None, 2: 99}


class TestApplyEquivalenceProperty:
    """apply_changes == a naive single-threaded LWW replay, for
    arbitrary op scripts in arbitrary DELIVERY order — the property
    the distributed max-LSN reduction must share with the reference's
    sequential consumer loop."""

    def _events_df(self, spark, script, order):
        import datetime

        from pg2any_spark.schemas import CHANGE_EVENT_SCHEMA

        ts = datetime.datetime(2026, 1, 1)
        rows = []
        for lsn, (op, k, v) in enumerate(script):
            before = {"id": str(k)} if op in ("u", "d") else None
            after = {"id": str(k), "v": v} if op in ("c", "u") else None
            rows.append(
                (op, "public", "t", lsn, lsn, ts, before, after,
                 ["id"], "default")
            )
        rows = [rows[i] for i in order]  # delivery order ≠ LSN order
        return spark.createDataFrame(rows, CHANGE_EVENT_SCHEMA)

    def _replay(self, script):
        state = {}
        for op, k, v in script:  # script is already in LSN order
            if op == "d":
                state.pop(k, None)
            else:
                state[k] = v
        return {(k, v) for k, v in state.items()}

    def test_matches_sequential_replay(self, spark):
        from hypothesis import HealthCheck, given, settings, strategies as st

        from pg2any_spark.operators.apply import apply_changes
        from pyspark.sql.types import (
            IntegerType, StringType, StructField, StructType,
        )

        dest = StructType([
            StructField("id", IntegerType()),
            StructField("v", StringType()),
        ])

        @st.composite
        def scripts(draw):
            n = draw(st.integers(1, 10))
            script = [
                (draw(st.sampled_from(["c", "u", "d"])),
                 draw(st.integers(1, 4)),
                 draw(st.text(
                     alphabet=st.sampled_from("abcxyz"), min_size=1,
                     max_size=3)))
                for _ in range(n)
            ]
            order = draw(st.permutations(range(n)))
            return script, list(order)

        @given(scripts())
        @settings(
            max_examples=12, deadline=None,
            suppress_health_check=[HealthCheck.too_slow],
        )
        def run(case):
            script, order = case
            events = self._events_df(spark, script, order)
            got = {
                (r["id"], r["v"])
                for r in apply_changes(
                    events, dest, ["id"], table="t",
                    scan_for_truncate=False,
                ).collect()
            }
            assert got == self._replay(script)

        run()


def test_bytea_corrupt_hex_errors_loudly(spark):
    """A '\\x'-prefixed value whose body is not well-formed hex (bad
    digits or odd length) must hard-error, not silently become NULL
    via unhex."""
    import pytest
    from pyspark.sql.types import BinaryType, LongType, StructField, StructType

    schema = StructType(
        [StructField("id", LongType(), False),
         StructField("blob", BinaryType(), True)]
    )
    for bad in ("\\xZZ12", "\\xABC"):
        events = make_events(spark, [ev("c", 1, {"id": "1", "blob": bad})])
        with pytest.raises(Exception, match="bytea|escape"):
            apply_changes(events, schema, ["id"]).collect()
