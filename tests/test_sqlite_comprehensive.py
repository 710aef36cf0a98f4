"""Comprehensive SQLite destination matrix — mirror of the reference's
``pg2any-lib/tests/sqlite_comprehensive_tests.rs`` (1180-LoC DML
matrix) against the LIVE sink: empty strings, NULLs, unicode/special
characters (incl. injection shapes — everything is parameterized),
megabyte values, numeric precision extremes, constraint-violation
atomicity, missing-key hard errors, multi-table independence, invalid
paths, and the full CRUD cycle across batches.

The reference runs these through its SQLiteDestination +
``execute_sql_batch_with_hook``; here the equivalent unit is
``apply_batch_to_sqlite`` (winner-per-key reduction in Spark, one
SQLite transaction carrying data + progress)."""

from __future__ import annotations

import datetime
import sqlite3

import pytest
from pyspark.sql import Row
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from pg2any_spark.schemas import CHANGE_EVENT_SCHEMA
from pg2any_spark.sinks.sqlite_sink import PROGRESS_TABLE, apply_batch_to_sqlite

TS = datetime.datetime(2026, 1, 1)

#: comprehensive_test mirror: reference's table has id / text_field /
#: nullable_field / int_field / real_field / json_field
COMP_SCHEMA = StructType(
    [
        StructField("id", LongType(), False),
        StructField("text_field", StringType(), True),
        StructField("nullable_field", StringType(), True),
        StructField("int_field", LongType(), True),
        StructField("real_field", DoubleType(), True),
        StructField("json_field", StringType(), True),
    ]
)


def ev(op, lsn, after=None, before=None, table="comprehensive_test"):
    return Row(
        op=op, schema="main", table=table, txid=123, lsn=lsn,
        commit_ts=TS, before=before, after=after,
        key_columns=["id"], replica_identity="default",
    )


def batch(spark, events):
    return spark.createDataFrame(events, CHANGE_EVENT_SCHEMA)


def q(db, sql):
    with sqlite3.connect(db) as c:
        return c.execute(sql).fetchall()


def apply_(spark, db, events, batch_id=0):
    apply_batch_to_sqlite(
        batch(spark, events), batch_id, db, "comprehensive_test",
        COMP_SCHEMA, ["id"],
    )


class TestComprehensiveValues:
    def test_empty_strings_preserved(self, spark, tmp_path):
        """reference: test_sqlite_empty_string_handling — empty string
        is a VALUE, not NULL."""
        db = str(tmp_path / "t.db")
        apply_(spark, db, [ev("c", 100, {"id": "1", "text_field": "",
                                         "nullable_field": ""})])
        rows = q(db, "SELECT text_field, nullable_field, int_field "
                     "FROM comprehensive_test WHERE id = 1")
        assert rows == [("", "", None)]

    def test_null_values_preserved(self, spark, tmp_path):
        """reference: test_sqlite_null_value_handling — absent map keys
        land as SQL NULL in every affinity."""
        db = str(tmp_path / "t.db")
        apply_(spark, db, [ev("c", 100, {"id": "1", "text_field": "test"})])
        rows = q(db, "SELECT nullable_field, int_field, real_field "
                     "FROM comprehensive_test WHERE id = 1")
        assert rows == [(None, None, None)]

    def test_unicode_special_chars_and_injection_shapes(self, spark, tmp_path):
        """reference: test_sqlite_unicode_and_special_characters — plus
        quote/injection payloads: the sink is parameterized end to end,
        so hostile VALUES are data, never SQL."""
        db = str(tmp_path / "t.db")
        text = "\U0001f680 Hello 世界! Special chars: "\
               "áéíóú ñüç"
        js = '{"emoji": "\U0001f600", "chinese": "你好"}'
        inject = "'); DROP TABLE comprehensive_test; --"
        apply_(spark, db, [
            ev("c", 100, {"id": "1", "text_field": text, "json_field": js}),
            ev("c", 101, {"id": "2", "text_field": inject,
                          "nullable_field": 'quote " and \\ backslash'}),
        ])
        rows = dict(
            (r[0], (r[1], r[2], r[3]))
            for r in q(db, "SELECT id, text_field, json_field, "
                           "nullable_field FROM comprehensive_test")
        )
        assert rows[1][0] == text and rows[1][1] == js
        assert rows[2][0] == inject
        assert rows[2][2] == 'quote " and \\ backslash'

    def test_megabyte_values_roundtrip(self, spark, tmp_path):
        """reference: test_sqlite_large_data_handling — 1 MiB text and
        a ~1 MB JSON value survive the text envelope intact."""
        db = str(tmp_path / "t.db")
        big = "A" * (1024 * 1024)
        bigjs = '{"data": "%s", "nested": {"more_data": "%s"}}' % (
            "B" * 500_000, "C" * 500_000)
        apply_(spark, db, [ev("c", 100, {"id": "1", "text_field": big,
                                         "json_field": bigjs})])
        rows = q(db, "SELECT length(text_field), length(json_field) "
                     "FROM comprehensive_test WHERE id = 1")
        assert rows[0][0] == 1024 * 1024
        assert rows[0][1] > 1_000_000

    def test_numeric_precision_extremes(self, spark, tmp_path):
        """reference: test_sqlite_numeric_precision — i64 min/max, pi
        at full double precision, DBL_MAX and DBL_MIN magnitudes."""
        db = str(tmp_path / "t.db")
        cases = {
            1: ("9223372036854775807", None),
            2: ("-9223372036854775808", None),
            3: (None, "3.141592653589793"),
            4: (None, "1.7976931348623157e308"),
            5: (None, "2.2250738585072014e-308"),
        }
        apply_(spark, db, [
            ev("c", 100 + i, {"id": str(i), "int_field": iv, "real_field": rv})
            for i, (iv, rv) in cases.items()
        ])
        got = {r[0]: (r[1], r[2]) for r in q(
            db, "SELECT id, int_field, real_field FROM comprehensive_test")}
        assert got[1][0] == 9223372036854775807
        assert got[2][0] == -9223372036854775808
        assert abs(got[3][1] - 3.141592653589793) < 1e-15
        assert got[4][1] == 1.7976931348623157e308
        assert got[5][1] == 2.2250738585072014e-308


class TestComprehensiveFailureModes:
    def test_constraint_violation_rolls_back_whole_batch(self, spark, tmp_path):
        """reference: test_sqlite_constraint_violations — a mid-batch
        constraint error must leave NO partial rows and NO progress
        advance (the atomic pre-commit-hook contract S10)."""
        db = str(tmp_path / "t.db")
        with sqlite3.connect(db) as c:
            c.execute(
                'CREATE TABLE "comprehensive_test" (id, text_field, '
                "nullable_field, int_field CHECK (int_field IS NULL OR "
                "int_field < 100), real_field, json_field, "
                'PRIMARY KEY ("id"))'
            )
        with pytest.raises(sqlite3.IntegrityError):
            apply_(spark, db, [
                ev("c", 100, {"id": "1", "int_field": "5"}),
                ev("c", 101, {"id": "2", "int_field": "500"}),  # violates
            ])
        assert q(db, "SELECT COUNT(*) FROM comprehensive_test") == [(0,)]
        assert q(db, f"SELECT COUNT(*) FROM {PROGRESS_TABLE}") == [(0,)]

    def test_missing_key_value_raises(self, spark, tmp_path):
        """reference: test_sqlite_missing_key_columns_error — an event
        whose images carry no key value must fail loudly, not write a
        NULL-keyed row or silently match nothing."""
        db = str(tmp_path / "t.db")
        with pytest.raises(ValueError, match="NULL key"):
            apply_(spark, db, [ev("c", 100, {"text_field": "orphan"})])
        with pytest.raises(ValueError, match="NULL key"):
            apply_(spark, db, [ev("d", 101, before={"text_field": "x"})])
        # nothing landed, progress untouched
        assert q(db, "SELECT COUNT(*) FROM comprehensive_test") == [(0,)]
        assert q(db, f"SELECT COUNT(*) FROM {PROGRESS_TABLE}") == [(0,)]

    def test_invalid_path_fails_loudly(self, spark, tmp_path):
        """reference: test_sqlite_file_permissions_and_paths."""
        with pytest.raises(sqlite3.OperationalError):
            apply_(spark, "/nonexistent/dir/that/cannot/exist/x.db",
                   [ev("c", 100, {"id": "1"})])


class TestComprehensiveLifecycle:
    def test_two_tables_one_db_independent_progress(self, spark, tmp_path):
        """reference: test_sqlite_concurrent_operations — two tables in
        one database file keep independent data and progress rows."""
        db = str(tmp_path / "t.db")
        apply_batch_to_sqlite(
            batch(spark, [ev("c", 100, {"id": "1", "text_field": "a"})]),
            0, db, "comprehensive_test", COMP_SCHEMA, ["id"],
        )
        apply_batch_to_sqlite(
            batch(spark, [ev("c", 100, {"id": "7", "text_field": "b"},
                             table="other_table")]),
            5, db, "other_table", COMP_SCHEMA, ["id"],
        )
        assert q(db, "SELECT id FROM comprehensive_test") == [(1,)]
        assert q(db, "SELECT id FROM other_table") == [(7,)]
        prog = dict(q(db, f"SELECT sink_table, last_batch_id FROM {PROGRESS_TABLE}"))
        assert prog == {"comprehensive_test": 0, "other_table": 5}

    def test_complete_crud_cycle_across_batches(self, spark, tmp_path):
        """reference: test_sqlite_complete_crud_cycle — insert, update,
        delete in successive micro-batches; final state + progress."""
        db = str(tmp_path / "t.db")
        apply_(spark, db, [
            ev("c", 100, {"id": "1", "text_field": "v1"}),
            ev("c", 101, {"id": "2", "text_field": "v1"}),
        ], batch_id=0)
        apply_(spark, db, [
            ev("u", 200, {"id": "1", "text_field": "v2"},
               before={"id": "1"}),
        ], batch_id=1)
        apply_(spark, db, [
            ev("d", 300, before={"id": "2"}),
        ], batch_id=2)
        rows = q(db, "SELECT id, text_field FROM comprehensive_test")
        assert rows == [(1, "v2")]
        assert q(db, f"SELECT last_batch_id FROM {PROGRESS_TABLE} "
                     "WHERE sink_table = 'comprehensive_test'") == [(2,)]
