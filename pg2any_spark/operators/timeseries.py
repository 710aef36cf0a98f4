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


def mad_anomaly_report(
    df: DataFrame,
    key_col: str,
    value_col: str,
    k: int = 3,
    decimals: int = 2,
) -> DataFrame:
    """Robust per-group anomaly accounting by Median Absolute
    Deviation: a value is anomalous iff ``|v − median| > k · MAD`` —
    the outlier screen that, unlike mean/stddev, is not itself dragged
    by the outliers it hunts (50% breakdown point).

    Cross-engine exactness by construction: values are scaled to
    BIGINT at ``decimals`` places first, so every median/MAD is an
    interpolation between exact integers — a dyadic rational both
    engines represent bit-identically whatever interpolation formula
    they use (lo+(hi−lo)/2 ≡ (lo+hi)/2 for exact inputs) — and the
    anomaly compare is exact-IEEE on exact operands. The report emits
    the medians ×2 and MADs ×4 as BIGINTs: no float column leaves the
    operator.

    Scale: two grouped exact percentiles (per-group multiset
    materialization — at 100 TB swap ``approx_percentile``'s t-digest,
    same contract as the percentile query family) + one broadcast
    join of the ≤|groups|-row stats back onto the stream."""
    scale = 10**decimals
    v = df.select(
        F.col(key_col),
        F.round(F.col(value_col) * scale, 0).cast("bigint").alias("__v"),
    )
    med = v.groupBy(key_col).agg(
        F.expr("percentile(cast(__v as double), 0.5)").alias("__m")
    )
    dev = v.join(F.broadcast(med), key_col).withColumn(
        "__d", F.abs(F.col("__v").cast("double") - F.col("__m"))
    )
    mad = dev.groupBy(key_col).agg(
        F.expr("percentile(__d, 0.5)").alias("__mad")
    )
    return (
        dev.join(F.broadcast(mad), key_col)
        .groupBy(key_col, "__m", "__mad")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            F.sum(
                F.when(
                    F.col("__d") > F.lit(k) * F.col("__mad"), 1
                ).otherwise(0)
            )
            .cast("bigint")
            .alias("n_anomalies"),
        )
        .select(
            key_col,
            "n_events",
            "n_anomalies",
            (F.col("__m") * 2).cast("bigint").alias("med_x2"),
            (F.col("__mad") * 4).cast("bigint").alias("mad_x4"),
        )
    )
