"""Time-series regularization: calendar gap-fill + carry-forward.

Sparse per-key daily aggregates (orders per priority, metrics per
host, revenue per region) need a dense calendar before window math
(rolling means, period-over-period) is meaningful. The Spark-first
shape:

- the per-key calendar SPINE is ``sequence(min_day, max_day)`` from a
  per-key min/max aggregate, exploded — |keys| + |days| rows, built
  from one small agg, never a cross join against a calendar table;
- the fill is a left join of spine ⟕ facts on (key, day) — equi-join,
  hash-partitioned on the same key the downstream windows use, so the
  shuffle is reused;
- carry-forward is ``last(value, ignorenulls)`` over the per-key date
  window — one pass, no self-join.

At 100 TB the spine is dwarfed by the fact table; the single (key,
day) shuffle is the floor cost of ANY per-key time-series operation.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F


def gapfill_daily(
    facts: DataFrame,
    key_cols: list[str],
    day_col: str,
    fill_zero: dict[str, Column] | None = None,
    carry_cols: list[str] | None = None,
) -> DataFrame:
    """Densify per-key daily facts onto each key's [min, max] calendar.

    ``fill_zero`` maps column name → zero literal for gap rows (counts,
    sums); ``carry_cols`` are filled with the most recent earlier value
    (last observation carried forward; leading gaps stay NULL).

    Carry runs BEFORE zero-fill: a column named in both therefore
    carries the last real observation across gaps, not a just-filled
    zero — and a genuine observed zero is still a real observation
    (gap-ness is keyed on the join's NULL, never on the value).
    """
    spine = (
        facts.groupBy(*key_cols)
        .agg(F.min(day_col).alias("__lo"), F.max(day_col).alias("__hi"))
        .select(
            *key_cols,
            F.explode(F.sequence(F.col("__lo"), F.col("__hi"))).alias(day_col),
        )
    )
    dense = spine.join(facts, [*key_cols, day_col], "left")
    if carry_cols:
        w = (
            Window.partitionBy(*key_cols)
            .orderBy(day_col)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        for name in carry_cols:
            dense = dense.withColumn(
                name, F.last(name, ignorenulls=True).over(w)
            )
    for name, zero in (fill_zero or {}).items():
        dense = dense.withColumn(name, F.coalesce(F.col(name), zero))
    return dense
