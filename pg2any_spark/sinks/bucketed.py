"""Bucketed replica tables: co-located, shuffle-free joins.

The reference replicates into row stores whose value is point lookups;
a Spark replica's value is analytics, and the dominant analytics cost
is the join shuffle. Bucketing is the storage-side fix: write both
sides pre-hash-partitioned (and optionally pre-sorted) on the join
key into the same number of buckets, and every subsequent equi-join or
aggregation on that key plans with ZERO Exchange — the shuffle was
paid once at write time and amortizes over every downstream query.

At 100 TB this is the difference between re-shuffling the fact table
for every orders⋈lineitem query and never shuffling it again. Rules:

- both sides must bucket on the join key with the SAME bucket count;
- bucket count sets write parallelism AND downstream task count —
  size it so one bucket fits an executor (e.g. 1024+ at 100 TB);
- ``sortBy`` on the key upgrades the join to a merge of pre-sorted
  runs (no sort stage either) — consumed only when each bucket is ONE
  file (``write_bucketed`` guarantees this by co-partitioning the
  write) and ``spark.sql.legacy.bucketedTableScan.outputOrdering`` is
  on; without it the join is still shuffle-free, just re-sorted
  per-bucket;
- bucketed tables require the table catalog (``saveAsTable``), not
  bare ``parquet(path)`` — bucket metadata lives in the catalog.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    num_buckets: int,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
    fmt: str = "parquet",
) -> None:
    """Write ``df`` as a bucketed (optionally sorted) catalog table."""
    # one file per bucket: co-partition the write on the bucket key so
    # each task owns whole buckets. With multiple files per bucket the
    # read side must re-sort (Spark won't merge sorted runs), which
    # forfeits the sortBy; with one file the join is sort-free too.
    prepared = df.repartition(num_buckets, *[df[c] for c in bucket_cols])
    writer = prepared.write.format(fmt).mode(mode).bucketBy(num_buckets, *bucket_cols)
    writer = writer.sortBy(*(sort_cols or bucket_cols))
    writer.saveAsTable(table)


def colocated_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    left_on: str,
    right_on: str,
    how: str = "inner",
) -> DataFrame:
    """Join two bucketed tables on their bucket keys. When both tables
    bucket on their key with equal bucket counts, the plan contains no
    Exchange for either side (verify with ``.explain``; pinned in
    tests/test_bucketed.py)."""
    left = spark.table(left_table)
    right = spark.table(right_table)
    return left.join(right, left[left_on] == right[right_on], how)
