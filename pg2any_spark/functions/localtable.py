"""Driver-literal local tables (round-11 optimization, guide §4.1).

``spark.createDataFrame(py_rows, ...)`` plans a Scan-ExistingRDD whose
partitions deserialize PICKLED Python rows on executors: even a 32-row
boundary table runs a defaultParallelism-task stage through the Python
serializer (measured on local[32]: 7-43 task-seconds per evaluation vs
0.1-0.9 for the literal form below — and broadcast-subtree re-planning
evaluates such tables several times per query). For the small local
tables the engine actually builds (quantile boundary intervals, query
term lists, planted fixture rows), the rows are driver constants, so
they can be embedded as Catalyst LITERALS: one array-of-structs explode,
pure JVM codegen, no Python worker anywhere and no pickle payload in
the task closure.

``literal_table`` is the drop-in replacement, falling back to
``createDataFrame`` above ``max_literal_rows`` (giant expression trees
would shift the cost to the analyzer — the same cliff
``_ranged_by_literal_boundaries`` documents for CASE chains).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.types import StructType

#: Above this row count the literal expression tree stops being cheap
#: to analyze and the pickled-row path wins back; boundary tables
#: (<=1025 rows at 1024 partitions) and planted fixtures (<=35 rows)
#: sit far below it.
MAX_LITERAL_ROWS = 2048


def literal_table(
    spark: SparkSession,
    rows: list,
    schema,
    max_literal_rows: int = MAX_LITERAL_ROWS,
) -> DataFrame:
    """``spark.createDataFrame(rows, schema)`` as a pure-JVM literal
    plan for small driver-side row lists (``schema``: DDL string or
    StructType). Result-identical: every cell is
    ``lit(value).cast(field type)``, nulls included."""
    # The empty typed relation fixes the result's nullability to the
    # schema's (literals alone would mark fields non-null). It must be
    # JVM-only: ``createDataFrame([], schema)`` plans a
    # Scan-ExistingRDD with defaultParallelism EMPTY pickled
    # partitions, and every evaluation (broadcast subtrees re-evaluate
    # several times per query) schedules 32 tasks that each pay a
    # Python-runner roundtrip for zero rows — measured 7.7 task-seconds
    # per evaluation in token_budget_selection. An empty ``range``
    # projected to null-literal casts is the same analyzed schema with
    # no Python anywhere; the rare non-nullable-field schema keeps the
    # exact-parity createDataFrame path.
    struct = schema if isinstance(schema, StructType) else StructType.fromDDL(schema)
    if all(f.nullable for f in struct.fields):
        empty = spark.range(0, 0, 1, 1).select(
            *(
                F.lit(None).cast(f.dataType).alias(f.name)
                for f in struct.fields
            )
        )
    else:
        empty = spark.createDataFrame([], struct)
    if not rows:
        return empty
    if len(rows) > max_literal_rows:
        return spark.createDataFrame(rows, struct)
    structs = []
    for r in rows:
        vals = r if isinstance(r, (list, tuple)) else (r,)
        if len(vals) != len(struct.fields):
            raise ValueError(
                f"literal_table: row arity {len(vals)} != schema arity "
                f"{len(struct.fields)}"
            )
        structs.append(
            F.struct(
                *(
                    F.lit(bytes(v) if isinstance(v, bytearray) else v)
                    .cast(f.dataType)
                    .alias(f.name)
                    for v, f in zip(vals, struct.fields)
                )
            )
        )
    lit_df = (
        spark.range(0, 1, 1, 1)
        .select(F.explode(F.array(*structs)).alias("__row"))
        .select("__row.*")
    )
    return empty.unionByName(lit_df)
