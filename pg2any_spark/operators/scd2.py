"""Type-2 slowly-changing-dimension (SCD2) history from a CDC stream.

The reference applies CDC events destructively — the destination holds
only the latest row state (``consumer.rs:42-101`` apply loop). The
warehouse-side pattern the same event stream enables is the SCD2
history table: every version of every row, with an LSN validity
interval, so any past state is a ``valid_from <= X < valid_to`` slice.
This operator is that build, Spark-first:

- inserts/updates each OPEN a version (the typed after-image) at their
  LSN; the NEXT event on the same key closes it (``lead`` over the
  per-key LSN order);
- deletes close the prior version and open nothing;
- a version with no successor is current (``valid_to IS NULL``).

Cost shape: exactly ONE shuffle (partition by key for the ``lead``
window) over the event stream — same as the destructive apply's
reduction. No joins: the before/after images carry everything. At
100 TB the history build is therefore no more expensive than the
latest-state apply; it just keeps the losers the ``max_by`` reduction
discards.

Text-rendered values are typed via the same ``typed_from_map`` cast
path the apply operator uses, so both views of the stream agree.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F
from pyspark.sql.types import StructType

from pg2any_spark.operators.apply import _cast_text
from pg2any_spark.schemas import OP_DELETE, OP_INSERT, OP_UPDATE


def scd2_from_events(
    events: DataFrame,
    schema: StructType,
    key_cols: list[str],
    order_col: str = "lsn",
) -> DataFrame:
    """Build the SCD2 history table from CHANGE_EVENT_SCHEMA events.

    Returns one row per (key, version): the typed row image plus
    ``valid_from_lsn``, ``valid_to_lsn`` (NULL = still open) and
    ``is_current``. Events must carry distinct ``order_col`` values per
    key (true for LSNs); TRUNCATE events are not supported here —
    filter them out or use the destructive apply.
    """
    ev = events.filter(F.col("op").isin(OP_INSERT, OP_UPDATE, OP_DELETE))
    # key from whichever image has it: after for c/u, before for d
    key_exprs = [
        F.coalesce(
            _cast_text(F.col("after").getItem(k), schema[k].dataType),
            _cast_text(F.col("before").getItem(k), schema[k].dataType),
        ).alias(k)
        for k in key_cols
    ]
    w = Window.partitionBy(*key_cols).orderBy("valid_from_lsn")
    versioned = (
        ev.select(
            *key_exprs,
            F.col("op"),
            F.col(order_col).alias("valid_from_lsn"),
            F.col("after"),
        )
        .withColumn("valid_to_lsn", F.lead("valid_from_lsn").over(w))
        .filter(F.col("op") != OP_DELETE)
    )
    non_key = [f for f in schema.fields if f.name not in key_cols]
    return versioned.select(
        *key_cols,
        *[
            _cast_text(F.col("after").getItem(f.name), f.dataType).alias(f.name)
            for f in non_key
        ],
        "valid_from_lsn",
        "valid_to_lsn",
        F.col("valid_to_lsn").isNull().alias("is_current"),
    )


def open_versions_as_events(history: DataFrame, schema: StructType) -> DataFrame:
    """Re-render a history's OPEN versions as pseudo insert events
    (op='c' at their original ``valid_from_lsn``), so an incremental
    batch can recompute intervals for touched keys by running
    ``scd2_from_events`` over (open version ∪ new events). Text
    rendering matches the CDC wire model (cast-to-string round-trips
    exactly for Spark's string↔double/long casts)."""
    cols = [f.name for f in schema.fields]
    after = F.map_from_arrays(
        F.array(*[F.lit(c) for c in cols]),
        F.array(*[F.col(c).cast("string") for c in cols]),
    )
    return history.filter(F.col("is_current")).select(
        F.lit(OP_INSERT).alias("op"),
        F.col("valid_from_lsn").alias("lsn"),
        F.lit(None).cast("map<string,string>").alias("before"),
        after.alias("after"),
    )


def scd2_snapshot_at(history: DataFrame, lsn: int) -> DataFrame:
    """Time-travel: the table state as of ``lsn`` from an SCD2 history —
    a pure filter, so Catalyst pushes it into the history scan."""
    return history.filter(
        (F.col("valid_from_lsn") <= lsn)
        & (F.col("valid_to_lsn").isNull() | (F.col("valid_to_lsn") > lsn))
    ).drop("valid_from_lsn", "valid_to_lsn", "is_current")
