"""literal_table: createDataFrame parity (values, schema incl.
nullability) and the fallback paths — the round-11 optimization that
replaces pickled-row local tables with Catalyst literals must be a
drop-in equivalent everywhere it is used (boundary intervals, query
terms, planted fixture rows, WAL Relation frames)."""

from __future__ import annotations

import pytest
from pyspark.sql import Row

from pg2any_spark.functions.localtable import literal_table


@pytest.fixture(scope="module")
def spark():
    from pg2any_spark.session import get_spark

    s = get_spark(app_name="test-localtable")
    s.sparkContext.setLogLevel("ERROR")
    return s


CASES = [
    # mixed types, nulls, quoting hazards
    ([(1, None, "a'b\"c\\d"), (2, 2.5, None)], "i int, d double, s string"),
    # Row objects + binary payloads (the WAL-frame shape)
    (
        [
            Row(segment_id=0, seq=0, wal_lsn=0, frame=bytearray(b"\x00\xffR")),
            Row(segment_id=1, seq=7, wal_lsn=9, frame=bytearray(b"")),
        ],
        "segment_id int, seq long, wal_lsn long, frame binary",
    ),
    # single-column doubles (the quantile-probe shape)
    ([(q / 10.0,) for q in range(1, 10)], "q double"),
    # boundary-interval shape with open ends as NULLs
    (
        [(0, None, 1.5), (1, 1.5, 7.25), (2, 7.25, None)],
        "__pid int, __lo double, __hi double",
    ),
    ([(None,)], "s string"),
]


@pytest.mark.parametrize("rows,schema", CASES)
def test_parity_with_createdataframe(spark, rows, schema):
    ref = spark.createDataFrame(rows, schema)
    lit = literal_table(spark, rows, schema)
    assert lit.schema == ref.schema
    assert sorted(map(tuple, lit.collect())) == sorted(
        map(tuple, ref.collect())
    )


def test_empty_and_oversize_fall_back(spark):
    assert literal_table(spark, [], "x int").count() == 0
    big = [(i,) for i in range(50)]
    out = literal_table(spark, big, "x int", max_literal_rows=10)
    assert sorted(r["x"] for r in out.collect()) == list(range(50))


def test_arity_mismatch_raises(spark):
    with pytest.raises(ValueError, match="arity"):
        literal_table(spark, [(1, 2)], "x int")


def test_no_python_eval_in_plan(spark):
    """The point of the rewrite: the rows travel as Catalyst literals
    (a Generate/explode over Range), not as pickled Python rows — no
    Python evaluation node anywhere. The union's EMPTY typed arm still
    plans as a zero-partition ExistingRDD scan (no tasks), which is
    fine; what must NOT appear is the rows themselves behind an RDD
    scan, i.e. the plan must contain the literal explode."""
    plan = literal_table(
        spark, [(1, 2.0)], "a int, b double"
    )._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan
    assert "explode" in plan and "Range" in plan
