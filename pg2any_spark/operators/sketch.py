"""Mergeable frequency sketches for corpus-scale statistics.

The reference never aggregates — it replicates — but a training-data
pipeline needs frequency answers ("how often does this token /
n-gram / domain occur across 100 TB?") where the exact distinct-key
table is itself too large to hold, let alone broadcast. The
count-min sketch (Cormode & Muthukrishnan 2005) is the standard
answer: ``depth`` hash rows × ``width`` counters; point estimate =
min over rows; overestimates only, never under. Two properties make
it Spark-native:

- **mergeable**: cell-wise addition, so partial sketches from every
  partition combine map-side — the shuffle carries at most
  ``depth × width`` rows TOTAL, independent of corpus size;
- **deterministic**: hashes are md5-prefix parses (the engine-wide
  cross-engine idiom), so re-runs, backfills, and the DuckDB oracle
  produce bit-identical cells — estimates are reproducible, not
  "approximately similar".

Here the sketch is a tall DataFrame ``(i, bucket, n)`` rather than a
driver-side array: it stays distributed, persists as parquet,
unions with the next shard's sketch, and joins against probe keys —
no collect anywhere.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def _cms_bucket(key: Column, i: Column | int, width: int) -> Column:
    """Row-``i`` counter index of ``key``: an 8-hex md5 prefix of the
    salted key, parsed base-16, mod ``width`` — the same cross-engine
    hash family every dedup/sampling operator uses."""
    salted = F.concat(
        (F.lit(i) if isinstance(i, int) else i).cast("string"),
        F.lit("|"),
        key.cast("string"),
    )
    h = F.conv(F.substring(F.md5(salted), 1, 8), 16, 10).cast("long")
    return (h % width).cast("int")


def count_min_cells(
    df: DataFrame,
    key_col: str,
    weight_col: str | None = None,
    depth: int = 4,
    width: int = 1024,
) -> DataFrame:
    """Build the sketch: one ``(i, bucket, n)`` row per non-empty
    counter (≤ depth × width rows regardless of input size).

    Feed raw occurrences (``weight_col=None`` counts rows) or
    pre-aggregated ``(key, count)`` pairs (``weight_col`` sums) — the
    cells are identical, so build from whichever is narrower. Partial
    aggregation combines per-partition cells before the shuffle, the
    whole point of the sketch at scale.
    """
    w = F.col(weight_col) if weight_col else F.lit(1)
    rows = df.select(
        F.col(key_col).alias("_k"),
        w.alias("_w"),
        F.explode(F.array(*[F.lit(i) for i in range(depth)])).alias("i"),
    ).select(
        "i",
        _cms_bucket(F.col("_k"), F.col("i"), width).alias("bucket"),
        "_w",
    )
    return (
        rows.groupBy("i", "bucket")
        .agg(F.sum("_w").cast("long").alias("n"))
    )


def histogram_cells(
    df: DataFrame,
    value_col: str,
    lo: float,
    hi: float,
    bins: int = 256,
) -> DataFrame:
    """Fixed-edge histogram of ``value_col``: one ``(bucket, n)`` row
    per non-empty bin (≤ ``bins`` rows regardless of input size).
    Out-of-range values clamp into the edge bins, so the histogram is
    total. NULLs are dropped before bucketing — floor(NULL) survives
    least/greatest as a NULL bucket row, which the quantile cumulative
    window would order FIRST (nulls-first asc), silently inflating
    total_n and skewing every estimate. Like the count-min cells:
    mergeable by cell-wise addition, partial-agg'd map-side, and
    deterministic — bucketing is one scalar expression, so shards,
    re-runs, and the oracle agree."""
    v = F.col(value_col).cast("double")
    bucket = F.least(
        F.greatest(
            F.floor((v - lo) / (hi - lo) * bins).cast("int"), F.lit(0)
        ),
        F.lit(bins - 1),
    )
    return (
        df.filter(F.col(value_col).isNotNull())
        .select(bucket.alias("bucket"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )


def histogram_quantiles(
    cells: DataFrame,
    quantiles: list[float],
    lo: float,
    hi: float,
    bins: int = 256,
) -> DataFrame:
    """Quantile estimates from histogram cells: for each q, find the
    first bin whose cumulative count reaches q·N and interpolate
    linearly inside it — the classic mergeable-histogram quantile
    (error ≤ one bin width), the deterministic counterpart to
    ``approx_percentile``'s rows-only sketch. Everything after the
    cell build runs on ≤ ``bins`` rows: the cumulative window, the
    per-quantile min-bin lookup, and the interpolation are all
    broadcast-sized."""
    from pyspark.sql import Window

    # ``cells`` (≤ bins rows, corpus-sized lineage) feeds four
    # subtrees, but all four sit in ONE action over a byte-identical
    # scan→histogram-agg→Exchange subtree — AQE shuffle-stage reuse
    # runs the corpus scan once and the consumers replay ≤ bins-row
    # reduce sides (the 4 scans in the static plan TEXT are lineage
    # re-prints, not executions). A persist here measured net-slower
    # (hist_quantile_order_value 0.62 s vs 0.46 s, batch-7
    # re-measurement, identical output).
    total = cells.agg(F.sum("n").alias("total_n"))
    cum = (
        cells.withColumn(
            "cum", F.sum("n").over(Window.orderBy("bucket"))
        )
        .crossJoin(F.broadcast(total))
    )
    from pg2any_spark.functions.localtable import literal_table

    qs = literal_table(
        cells.sparkSession, [(q,) for q in quantiles], "q double"
    )
    hits = (
        qs.join(F.broadcast(cum), F.col("cum") >= F.col("q") * F.col("total_n"))
        .groupBy("q")
        .agg(F.min("bucket").alias("bucket"))
    )
    width = (hi - lo) / bins
    est = (
        hits.join(F.broadcast(cum), ["bucket"])
        .select(
            "q",
            F.round(
                F.lit(lo)
                + F.col("bucket") * width
                + (F.col("q") * F.col("total_n") - (F.col("cum") - F.col("n")))
                / F.col("n")
                * width,
                4,
            ).alias("est"),
        )
    )
    return est


#: KMV hash space: 15 hex digits of md5 = 60 bits, exactly
#: representable as a double (and always positive in a signed parse).
KMV_SPACE = float(16**15)


def kmv_cells(
    df: DataFrame,
    key_col: str,
    group_cols: list[str],
    k: int = 128,
    partial: bool = True,
) -> DataFrame:
    """K-minimum-values distinct-count sketch (Bar-Yossef et al.
    2002): per group, the ``k`` smallest DISTINCT md5-hash values of
    the key — ``(group…, rk, h)`` rows, ≤ k per group. The third
    member of the sketch family (count-min = frequency, histogram =
    quantiles, KMV = cardinality), with the same two scale
    properties: mergeable (union two shards' cells and re-take the k
    smallest) and deterministic (md5 order, so shards/re-runs/the
    oracle agree on every cell).

    ``partial=True`` (default) inserts a MAP-SIDE partial k-min
    (Arrow batch: per-group sort + head(k) on the partition's own
    rows) before the global distinct+rank, so the shuffle carries at
    most k × partitions rows per group instead of the full
    distinct-hash table — the selection is order-stat-stable, so the
    global k smallest are always inside the union of per-partition k
    smallest and the result is bit-identical. Without it, a
    billion-distinct-key group funnels its whole hash table into one
    rank-window task — the exact blowup the sketch exists to avoid.
    Turn it off only for tiny inputs where the Arrow stage costs more
    than it saves."""
    from pyspark.sql import Window

    h = F.conv(
        F.substring(F.md5(F.col(key_col).cast("string")), 1, 15), 16, 10
    ).cast("long")
    hashed = df.select(*group_cols, h.alias("h"))
    if partial:
        import pandas as pd

        gcols = list(group_cols)

        def kmin(batches: "Iterator[pd.DataFrame]"):
            for pdf in batches:
                if len(pdf):
                    yield (
                        pdf.drop_duplicates()
                        .sort_values([*gcols, "h"])
                        .groupby(gcols, sort=False)
                        .head(k)
                    )

        hashed = hashed.mapInPandas(kmin, hashed.schema)
    dedup = hashed.distinct()
    w = Window.partitionBy(*group_cols).orderBy("h")
    return (
        dedup.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
    )


def kmv_distinct(
    cells: DataFrame, group_cols: list[str], k: int = 128
) -> DataFrame:
    """Cardinality estimate from KMV cells: with fewer than k distinct
    hashes the sketch IS the exact answer; otherwise the k-th smallest
    hash ``h_k`` estimates density — (k−1) · SPACE / h_k. One exact
    integer aggregate per group, then a single fixed-order scalar
    expression, rounded to 2dp."""
    agg = cells.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n_seen"), F.max("h").alias("hk")
    )
    est = F.when(
        F.col("n_seen") < k, F.col("n_seen").cast("double")
    ).otherwise(
        F.round(F.lit(float(k - 1)) * KMV_SPACE / F.col("hk"), 2)
    )
    return agg.select(*group_cols, est.alias("kmv_est"))


def bloom_cells(
    df: DataFrame,
    key_col: str,
    m_bits: int = 65_536,
    k: int = 4,
) -> DataFrame:
    """Build a Bloom filter over ``key_col`` as its SET-BIT table:
    one ``(pos)`` row per set bit (≤ ``m_bits`` rows regardless of
    input size) — the MEMBERSHIP sketch completing the family next to
    count-min (frequency), the fixed-edge histogram (quantiles), and
    KMV (cardinality). Same engineering contract as the others:

    - **mergeable**: set-bit tables union+distinct cell-wise, so
      shards and increments combine map-side;
    - **deterministic**: the ``k`` bit positions are the engine-wide
      md5-prefix hash family (salt = hash index), so re-runs and the
      DuckDB oracle reproduce the filter bit for bit;
    - **no-false-negative**: a key that was inserted always probes
      present; absent keys collide with probability
      ≈ (1 − e^{-kn/m})^k.

    Sizing: m/n ≈ 14.4 bits/key with k = 10 gives ~0.1% FP; the
    defaults (m = 64 Ki, k = 4) target fixture-scale corpora — at
    100 TB raise ``m_bits`` (the table is ≤ m rows of one int, so
    even 2^32 bits is a 4-billion-row-max — in practice density-bound
    — parquet table that joins by ``pos``; broadcast it while it
    fits, bucket it when it doesn't)."""
    fan = df.select(
        F.explode(F.array(*[F.lit(i) for i in range(k)])).alias("i"),
        F.col(key_col).alias("__k"),
    ).select(_cms_bucket(F.col("__k"), F.col("i"), m_bits).alias("pos"))
    return fan.distinct()


def bloom_probe(
    cells: DataFrame,
    probes: DataFrame,
    key_col: str,
    m_bits: int = 65_536,
    k: int = 4,
    carry_cols: list[str] | None = None,
) -> DataFrame:
    """Probe keys against a Bloom set-bit table: a key tests PRESENT
    iff all ``k`` of its bit positions are set. Probes fan out ×k,
    LEFT-join the (≤ m-row, broadcast) cell table, and present =
    (matched bits == k) folds them back. ``carry_cols`` ride along in
    the group (e.g. the probing doc's id, so duplicate keys from
    different docs stay distinct rows). Returns one row per distinct
    (carry_cols…, key_col): (…, key_col, bloom_hit int)."""
    carry = carry_cols or []
    # duplicate probe rows would double the fan and break the
    # "all k rows matched" fold — the contract is per DISTINCT key
    fan = probes.select(*carry, key_col).distinct().select(
        *carry,
        key_col,
        F.explode(F.array(*[F.lit(i) for i in range(k)])).alias("i"),
    ).select(
        *carry,
        key_col,
        _cms_bucket(F.col(key_col), F.col("i"), m_bits).alias("pos"),
    )
    marked = fan.join(
        F.broadcast(cells.withColumn("__set", F.lit(1))), ["pos"], "left"
    )
    return marked.groupBy(*carry, key_col).agg(
        (F.sum(F.coalesce(F.col("__set"), F.lit(0))) == k)
        .cast("int")
        .alias("bloom_hit")
    )


def cms_estimate(
    cells: DataFrame, probes: DataFrame, key_col: str,
    depth: int = 4, width: int = 1024,
) -> DataFrame:
    """Point-estimate each probe key against the sketch: min over the
    ``depth`` counters the key hashes to. Probes fan out ×depth, join
    the ≤ depth×width cell table (broadcast by size), and a per-key
    min folds them back — a missing cell means no occurrence ever
    landed there, i.e. counter value 0."""
    fan = probes.select(
        key_col,
        F.explode(F.array(*[F.lit(i) for i in range(depth)])).alias("i"),
    ).select(
        key_col, "i",
        _cms_bucket(F.col(key_col), F.col("i"), width).alias("bucket"),
    )
    joined = fan.join(F.broadcast(cells), ["i", "bucket"], "left").select(
        key_col, F.coalesce(F.col("n"), F.lit(0)).alias("n")
    )
    return joined.groupBy(key_col).agg(F.min("n").alias("cms_n"))


# ---------------------------------------------------------------------------
# Misra-Gries heavy hitters: bounded-memory candidates + exact recount
# ---------------------------------------------------------------------------


def misra_gries_candidates(df: DataFrame, key_col: str, k: int) -> DataFrame:
    """Per-partition Misra-Gries summaries (Misra & Gries 1982,
    mergeable form per Agarwal et al., "Mergeable Summaries"): at most
    k−1 candidate keys PER PARTITION, independent of the partition's
    cardinality — the bounded-memory first pass of exact heavy-hitter
    detection.

    Superset guarantee (pigeonhole): if a key's GLOBAL count exceeds
    n/k, then in at least one partition its local count exceeds that
    partition's n_p/k (otherwise the total could not exceed n/k), and
    Misra-Gries never evicts a key whose local count exceeds n_p/k.
    The union of per-partition candidates therefore contains every
    global heavy hitter; an exact recount of the candidates filters it
    to exactly them. Works the same across micro-batches: any
    partitioning of the stream preserves the argument.

    The per-batch update is the summary MERGE: add the batch's exact
    value counts, then if more than k−1 counters remain subtract the
    k-th largest counter value from all and drop the non-positive —
    total decrement stays ≤ n_p/k. Python touches one dict entry per
    DISTINCT key per Arrow batch (value_counts is vectorized), not one
    per row."""
    if k < 2:
        raise ValueError(f"misra_gries_candidates: k must be ≥ 2, got {k}")

    def summarize(batches):
        import pandas as pd

        # NULL is a legal key and can be a heavy hitter (a corrupt
        # feed's missing field usually IS one) — count it under the
        # sentinel None instead of letting value_counts drop it
        counters: dict = {}
        for pdf in batches:
            col = pdf[key_col]
            n_null = int(col.isna().sum())
            if n_null:
                counters[None] = counters.get(None, 0) + n_null
            for key, cnt in col.value_counts().items():
                counters[key] = counters.get(key, 0) + int(cnt)
            if len(counters) > k - 1:
                m = sorted(counters.values(), reverse=True)[k - 1]
                counters = {
                    key: c - m for key, c in counters.items() if c > m
                }
        yield pd.DataFrame({key_col: list(counters)}, dtype=object)

    return df.select(key_col).mapInPandas(
        summarize, schema=f"{key_col} {df.schema[key_col].dataType.simpleString()}"
    )


def exact_heavy_hitters(df: DataFrame, key_col: str, k: int) -> DataFrame:
    """EXACT keys with global count strictly above n/k, in two
    bounded passes — the 100 TB shape of "which tokens/domains/grams
    dominate the corpus" where a full groupBy's distinct-key shuffle
    is the thing being avoided:

    1. candidate generation: ``misra_gries_candidates`` (map-side,
       ≤ k−1 keys per partition, superset of the answer);
    2. exact recount: broadcast-semi-join the tiny candidate set back
       onto the corpus and count only those keys — the shuffle carries
       ≤ (k−1)·P keys, not the vocabulary.

    Returns (key, n_occ, n_total) for exactly the keys with
    ``n_occ · k > n_total`` — deterministic, engine-checkable output
    (unlike the sketch estimates, there is nothing approximate in the
    result; the approximation lives only in the pruning pass)."""
    cands = misra_gries_candidates(df, key_col, k).distinct()
    return candidate_recount(df, key_col, cands, k)


def candidate_recount(
    df: DataFrame, key_col: str, cands: DataFrame, k: int
) -> DataFrame:
    """Exact recount + threshold filter for a (tiny, broadcastable)
    candidate key set, in ONE corpus pass: left-join the broadcast
    candidate flags and group by (matched, candidate key) —
    ≤ |cands|+1 groups, all non-candidate rows collapsing into the
    (false, NULL) group — then derive both the per-candidate counts
    and the grand total from the persisted group table. The former
    shape ran the recount and the total count as two separate corpus
    scans (three with candidate generation).

    eqNullSafe: a NULL candidate must match NULL corpus keys — a
    plain equi-join would drop the NULL group even when it is the
    heaviest hitter. A NULL *candidate* groups as (true, NULL), which
    cannot collide with the non-candidate (false, NULL) group.

    ``groups`` is deliberately NOT persisted: its two consumers share
    the identical aggregate exchange inside one action, which AQE's
    shuffle-stage reuse already executes once — measured on the
    integrity-audit twin of this shape, a persist only replaced the
    reused stage with fixed-partition cache reads (56 → 543 tasks)."""
    flagged = cands.select(F.col(key_col).alias("__cand")).withColumn(
        "__isc", F.lit(True)
    )
    groups = (
        df.join(
            F.broadcast(flagged),
            F.col(key_col).eqNullSafe(F.col("__cand")),
            "left",
        )
        .groupBy(
            F.coalesce(F.col("__isc"), F.lit(False)).alias("__isc"),
            F.col("__cand"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("__n"))
    )
    total = F.broadcast(
        groups.agg(F.sum("__n").cast("long").alias("n_total"))
    )
    return (
        groups.filter(F.col("__isc"))
        .select(
            F.col("__cand").alias(key_col),
            F.col("__n").alias("n_occ"),
        )
        .join(total)
        .filter(F.col("n_occ") * k > F.col("n_total"))
        .select(key_col, "n_occ", "n_total")
    )
