"""Temporal join operators: as-of join, range bucketing, interval join.

Beyond-reference surface: operators Spark's DataFrame API does not
ship directly, built as compositions of built-in ops (no Python in the
row path, no per-key loops):

- **as-of join** — "for each left row, the latest right row at or
  before it, per key". Implemented with the union + sorted
  carry-forward trick: tag sides, union, one window per key ordered by
  (time, side) carrying the last non-null right payload forward, keep
  left rows. Exactly ONE shuffle (partition by key) and one sort —
  the same cost as a sort-merge join, with none of the range-join
  blowup. DuckDB's native ``ASOF JOIN`` is the oracle.
- **range bucketing** — arbitrary-boundary banding as a pure
  expression (count of boundaries ≤ value against a literal sorted
  array): turns a "value BETWEEN lo AND hi" dimension join into a
  shuffle-free projection. The SQL oracle keeps the join form.
- **interval join** — pairs within a bounded time window, per key:
  equi-join on the key plus a range filter. Catalyst plans the
  equi-part as a hash/sort-merge join; the interval bound keeps the
  per-key pair count linear-ish for sparse matches.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: list[str],
    right_cols: list[str],
    inclusive: bool = True,
) -> DataFrame:
    """Backward as-of join: attach to each left row the most recent
    right row with ``right.on <= left.on`` (``<`` when
    ``inclusive=False``), matched per ``by`` keys. Unmatched left rows
    keep NULL right columns (left-outer semantics).

    Right rows must be unique per (by, on) — pre-reduce with a
    deterministic pick (e.g. ``max_by``) if they are not; ties would
    otherwise be carry-order-dependent.
    """
    # side ordering controls tie behavior at equal timestamps:
    # right-before-left = inclusive, left-before-right = strict.
    right_side = 0 if inclusive else 2
    lpay = F.struct(*[F.col(c) for c in left.columns]).alias("__lpay")
    rpay = F.struct(*[F.col(c) for c in right_cols]).alias("__rpay")

    l_tagged = left.select(
        *[F.col(c) for c in by],
        F.col(on).alias("__t"),
        F.lit(1).alias("__side"),
        lpay,
        F.lit(None).cast(
            "struct<" + ",".join(
                f"{c}:{right.schema[c].dataType.simpleString()}" for c in right_cols
            ) + ">"
        ).alias("__rpay"),
    )
    r_tagged = right.select(
        *[F.col(c) for c in by],
        F.col(on).alias("__t"),
        F.lit(right_side).alias("__side"),
        F.lit(None).cast(
            "struct<" + ",".join(
                f"{c}:{left.schema[c].dataType.simpleString()}" for c in left.columns
            ) + ">"
        ).alias("__lpay"),
        rpay,
    )
    w = (
        Window.partitionBy(*by)
        .orderBy("__t", "__side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = l_tagged.unionByName(r_tagged).withColumn(
        "__rv", F.last("__rpay", ignorenulls=True).over(w)
    )
    return carried.filter(F.col("__side") == 1).select(
        *[F.col(f"__lpay.{c}").alias(c) for c in left.columns],
        *[F.col(f"__rv.{c}").alias(c) for c in right_cols],
    )


def bucketize(value: Column, boundaries: list[float]) -> Column:
    """0-based band index for arbitrary sorted boundaries: the count
    of boundaries ≤ value. Shuffle-free replacement for a
    ``value >= lo AND value < hi`` range-dimension join."""
    bounds = F.array(*[F.lit(float(b)) for b in boundaries])
    return F.size(F.filter(bounds, lambda b: b <= value))


def interval_join(
    left: DataFrame,
    right: DataFrame,
    by: list[str],
    left_ts: str,
    right_ts: str,
    max_gap_seconds: int,
    right_by: list[str] | None = None,
) -> DataFrame:
    """Pairs (left, right) with the same keys and
    ``left_ts <= right_ts <= left_ts + max_gap_seconds``.

    ``right_by`` renames the key columns on the right side — required
    for self-joins, where identically-named columns from the same
    lineage are ambiguous."""
    right_by = right_by or by
    cond = None
    for lk, rk in zip(by, right_by):
        c = left[lk] == right[rk]
        cond = c if cond is None else (cond & c)
    # microsecond precision — truncating to seconds would disagree
    # with interval arithmetic at the window edges. cast("timestamp")
    # is a no-op on TIMESTAMP and legalizes TIMESTAMP_NTZ inputs
    # (unix_micros rejects NTZ; session TZ is pinned UTC).
    lt = F.unix_micros(left[left_ts].cast("timestamp"))
    rt = F.unix_micros(right[right_ts].cast("timestamp"))
    cond = cond & (rt >= lt) & (rt <= lt + max_gap_seconds * 1_000_000)
    return left.join(right, cond)


def range_join_binned(
    left: DataFrame,
    right: DataFrame,
    left_ts: str,
    right_ts: str,
    max_gap_seconds: int,
) -> DataFrame:
    """KEYLESS bounded range join: all pairs with
    ``left_ts <= right_ts <= left_ts + max_gap_seconds``, no equi-key.

    Without keys, Catalyst can only plan a pure range predicate as a
    broadcast-nested-loop / cartesian — O(|L|·|R|) comparisons, the
    classic 100 TB never-finishes shape. This operator makes it an
    EQUI-join on a time bin: bucket both sides by ``gap``-sized bins;
    a right row at time r can only match left rows in bin
    ``floor(r/gap)`` or the one before, so exploding the right side
    into those two candidate bins and hash-joining on the bin key
    touches only temporally-adjacent pairs. Comparisons drop to
    O(pairs-within-2·gap); the exact predicate filters the remainder.
    (The same trick range-join hints apply in other engines, expressed
    with plain DataFrame ops.)

    Bins inherit time skew — a hot bin (traffic spike) makes one hash
    bucket large. AQE's skew-join splitting (on in ``session.get_spark``)
    re-splits oversized partitions at runtime.

    Column names must be disjoint between the two sides (rename before
    calling for self-joins); the helper columns are dropped on return.
    """
    if max_gap_seconds <= 0:
        # gap 0 would make every bin NULL (x / 0) and silently match
        # nothing; exact-timestamp pairing is an equi-join, not a
        # range join — make the misuse loud.
        raise ValueError("range_join_binned requires max_gap_seconds > 0")
    gap_us = max_gap_seconds * 1_000_000
    lus = F.unix_micros(left[left_ts].cast("timestamp"))
    rus = F.unix_micros(right[right_ts].cast("timestamp"))
    l_binned = left.withColumn("__lus", lus).withColumn(
        "__bin", F.floor(F.col("__lus") / gap_us)
    )
    r_bin = F.floor(F.col("__rus") / gap_us)
    r_binned = right.withColumn("__rus", rus).withColumn(
        "__bin", F.explode(F.array(r_bin, r_bin - 1))
    )
    return (
        l_binned.join(r_binned, "__bin")
        .filter(
            (F.col("__rus") >= F.col("__lus"))
            & (F.col("__rus") <= F.col("__lus") + gap_us)
        )
        .drop("__bin", "__lus", "__rus")
    )
