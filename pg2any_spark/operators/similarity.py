"""Similarity search over embedding columns (array<float>).

Two paths, per the ANN playbook:

- **brute force** (baseline / verify): query-set × corpus join with an
  exact cosine; correct at any recall, O(|Q|·|C|) — only for small
  query sets or final re-ranking.
- **LSH-bucketed** (scale path): sign-random-projection buckets
  (hyperplanes derived deterministically from md5, so the DuckDB
  oracle can reproduce them); candidates share a bucket, exact cosine
  re-rank inside the bucket. The join is bucket-keyed, never all-pairs.

All vector math is JVM-side (``zip_with``/``aggregate`` fold — one
deterministic left-to-right summation order, which keeps fp results
reproducible across runs and engines at ROUND(…, 6) granularity).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

from pg2any_spark.caching import managed_persist

NUM_PLANES = 16


def _as_double(vec: Column) -> Column:
    return F.transform(vec, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


def cosine(a: Column, b: Column) -> Column:
    a, b = _as_double(a), _as_double(b)
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def _normalized(
    df: DataFrame, id_col: str, id_alias: str, vec_col: str, vec_alias: str
) -> DataFrame:
    """Project (id_alias, unit-vector) — the (vector, norm) pair is
    bound ONCE as a lambda variable (transform over a single-element
    struct array, the ``word_shingles`` trick) so the norm computes
    once per vector. The previous form materialized ``__n`` in an
    intermediate projection, but CollapseProject inlines that
    projection into the transform lambda and the engine re-evaluates
    the norm per ELEMENT — O(d²) per vector, measured 3.5× slower at
    sf0.1 (0.74 s → 0.21 s for the corpus normalize pass,
    bit-identical output)."""
    v = _as_double(F.col(vec_col))
    bound = F.struct(v.alias("v"), l2_norm(v).alias("n"))
    unit = F.element_at(
        F.transform(
            F.array(bound),
            lambda s: F.transform(s["v"], lambda x: x / s["n"]),
        ),
        1,
    )
    return df.select(F.col(id_col).alias(id_alias), unit.alias(vec_alias))


def ranked_topk(sims: DataFrame, k: int, num_salts: int | None = None) -> DataFrame:
    """Rank candidate (query_id, neighbor_id, cos_sim) rows to top-k
    per query — optionally in TWO phases to defeat hot-key skew.

    Single-phase: one window over ``query_id``. If one query has
    millions of candidates (a hot LSH bucket / IVF cell at corpus
    scale), ALL of them shuffle into one task — the classic straggler.

    Two-phase (``num_salts`` = S): phase 1 ranks within
    ``(query_id, pmod(neighbor_id, S))`` — S parallel tasks per hot
    query — and keeps each salt's top-k; phase 2 ranks the ≤ S·k
    survivors per query. Exact same result as single-phase: every
    global top-k row is necessarily in its salt partition's top-k, and
    the (cos_sim desc, neighbor_id asc) tiebreak is total, so the
    final ordering is identical. Deterministic salt (id-derived, not
    random) keeps reruns and oracles reproducible.
    """
    order = [F.col("cos_sim").desc(), F.col("neighbor_id")]
    if num_salts and num_salts > 1:
        w1 = Window.partitionBy(
            "query_id", F.pmod(F.col("neighbor_id"), F.lit(num_salts))
        ).orderBy(*order)
        sims = (
            sims.withColumn("__salt_rank", F.row_number().over(w1))
            .filter(F.col("__salt_rank") <= k)
            .drop("__salt_rank")
        )
    w = Window.partitionBy("query_id").orderBy(*order)
    return sims.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def global_rank(
    df: DataFrame,
    order_cols: list[Column],
    rank_col: str = "rank",
    num_partitions: int | None = None,
    boundary_key: Column | None = None,
) -> DataFrame:
    """Exact global ROW_NUMBER over a TOTAL order without the
    single-task ``Window.orderBy()`` plan: range-repartition on the
    order keys, rank within each (now key-disjoint, key-ordered)
    partition, then add broadcast cumulative partition offsets — the
    classic scalable global rank (one range shuffle + one ≤ P-row
    collect, vs every row through one task).

    ``order_cols`` must define a total order (include a unique
    tiebreak column) — otherwise ranks of equal keys depend on
    partition-internal order. Boundary assignment is driven by
    ``boundary_key`` — a PLAIN numeric/temporal expression that
    ascends along the total order (equal order-prefixes must share a
    key value). It defaults to ``order_cols[0]``, which then must be
    a plain ascending column of such a type (a ``.desc()`` SortOrder
    raises — pass e.g. ``boundary_key=-key`` instead; if a descending
    key can be NULL, coalesce it below the domain first: NULL keys
    always land in the first partition, which matches Spark's default
    NULLS FIRST only for ascending order). Returns ``df`` +
    ``rank_col`` (1-based).

    Why boundaries are PLAN LITERALS, not ``repartitionByRange``: the
    rank branch and the offsets branch each traverse the input, and
    Catalyst does NOT guarantee their two range exchanges reuse one
    physical stage — measured concretely, composing the output with a
    harmless 1-row broadcast cross join made the branches sample
    DIFFERENT boundaries and corrupted ~97% of ranks (offsets from one
    partitioning, row_numbers from another). RangePartitioner's
    reservoir sample depends on runtime stage shape, input split
    count, and intra-partition order, none of which survive plan
    composition or task retry. So instead: one explicit
    ``approxQuantile`` pass computes P−1 interior boundaries of the
    first order key ONCE, and ``__pid`` comes from a broadcast join
    against the ≤P-row half-open-interval table built from those
    driver-collected literals — both branches, any retry, any
    surrounding plan compute identical pids by construction. Rows
    equal on the first key land in one pid, so cross-pid order stays
    total.

    Scale shape: the boundary pass is a column-pruned quantile-sketch
    scan; then ONE hash exchange on ``__pid`` co-locates each range;
    the offsets side is a cumulative window over the ≤ P per-partition
    counts (a SinglePartition exchange of ≤ P rows — bounded by
    construction), broadcast-joined back. Exactness never depends on
    boundary quality — skewed or duplicate boundaries only unbalance
    partitions (a heavily-duplicated first key degrades toward fewer,
    fatter partitions; add a higher-resolution first key if that
    bites)."""
    ranged = _ranged_by_literal_boundaries(
        df, order_cols, boundary_key, num_partitions, "global_rank"
    )
    w = Window.partitionBy("__pid").orderBy(*order_cols)
    woff = Window.orderBy("__pid").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = (
        ranged.groupBy("__pid")
        .agg(F.count(F.lit(1)).alias("__cnt"))
        .select(
            "__pid",
            F.coalesce(F.sum("__cnt").over(woff), F.lit(0)).alias("__offset"),
        )
    )
    return (
        ranged.withColumn("__r", F.row_number().over(w))
        .join(F.broadcast(offsets), "__pid")
        .withColumn(rank_col, (F.col("__offset") + F.col("__r")).cast("long"))
        .drop("__pid", "__r", "__offset")
    )


def _ranged_by_literal_boundaries(
    df: DataFrame,
    order_cols: list[Column],
    boundary_key: Column | None,
    num_partitions: int | None,
    caller: str,
) -> DataFrame:
    """Shared range-bucketing stage of the global rank / running-sum
    family: ``df`` + an order-aligned ``__pid`` column assigned by a
    BROADCAST INNER JOIN against the ≤P-row half-open-interval table
    built from the approxQuantile boundary literals (each row matches
    exactly one interval), hash-repartitioned so each pid is
    co-located. See ``global_rank`` for why the boundaries must be
    plan literals rather than a ``repartitionByRange`` sample — and
    the comment below for why the assignment is a JOIN rather than a
    per-row expression (both expression forms are measured dead
    ends)."""
    spark = df.sparkSession
    parts = num_partitions or int(
        spark.conf.get("spark.sql.shuffle.partitions", "32")
    )
    key = boundary_key if boundary_key is not None else order_cols[0]
    if str(key).rstrip("'>").endswith(("NULLS FIRST", "NULLS LAST")):
        raise TypeError(
            f"{caller}: boundary key is a SortOrder (asc()/desc()); "
            "pass a plain ascending expression via boundary_key= "
            "(e.g. the negated column for a descending order)"
        )
    keyed = df.withColumn("__gr_key", key.cast("double"))
    ktype = df.select(key.alias("__k")).schema["__k"].dataType.simpleString()
    if not (
        ktype in ("boolean", "date")
        or ktype.startswith(("tinyint", "smallint", "int", "bigint",
                             "float", "double", "decimal", "timestamp"))
    ):
        raise TypeError(
            f"{caller}: first order column must be numeric/temporal "
            f"(drives boundary assignment), got {ktype}"
        )
    bounds: list[float] = []
    if parts > 1:
        probs = [i / parts for i in range(1, parts)]
        bounds = sorted(set(keyed.approxQuantile("__gr_key", probs, 0.001)))
    # Bucket assignment is a BROADCAST INTERVAL JOIN against the ≤P-row
    # boundary table — each row matches exactly ONE half-open interval
    # (b_{i-1}, b_i], NULL keys land in bucket 0 (Spark's asc NULLS
    # FIRST). Measured dead ends for the per-row expression forms: a
    # P-term CASE chain StackOverflows the ANALYZER at P=512, and the
    # array-literal filter() HOF (python OR SQL-string lambda) hits a
    # Catalyst lambda-binding internal error once the two rank/offset
    # branches share the projection. The tiny join is plan-visible,
    # O(P) JVM predicate evals per row, and has no expression-size
    # cliff at cluster partition counts.
    intervals = [
        (
            i,
            bounds[i - 1] if i > 0 else None,
            bounds[i] if i < len(bounds) else None,
        )
        for i in range(len(bounds) + 1)
    ]
    # literal_table, not createDataFrame (round-11, guide §4.1): the
    # pickled-row scan ran a defaultParallelism-task Python
    # deserialization stage PER EVALUATION of this broadcast subtree —
    # measured 7-43 task-seconds for the 32-row table vs <1 for the
    # literal form.
    from pg2any_spark.functions.localtable import literal_table

    bnd = literal_table(
        spark, intervals, "__pid int, __lo double, __hi double"
    )
    cond = (
        F.col("__lo").isNull() | (F.col("__gr_key") > F.col("__lo"))
    ) & (
        F.col("__hi").isNull()
        | (F.col("__gr_key") <= F.col("__hi"))
        | F.col("__gr_key").isNull()
    )
    # Round-12 A/B toggle (temporary): SPARK_GRAFT_GR_REPARTITION=1
    # restores the pre-round-11 explicit repartition. The round-11
    # removal reasoned that the window branch's partitionBy("__pid")
    # plans its own exchange — true, but WITHOUT the shared repartition
    # exchange the rank/sum branch and the offsets branch no longer
    # share a scan→Exchange subtree, so the ENTIRE upstream lineage
    # (e.g. token_budget's LM scoring) is evaluated once per branch.
    # With it, AQE ReusedExchange runs the upstream exactly once.
    # Buckets (hence results) are identical either way: __pid comes
    # from the broadcast literal-boundary join alone.
    out = keyed.join(F.broadcast(bnd), cond, "inner").drop(
        "__gr_key", "__lo", "__hi"
    )
    import os as _os

    if _os.environ.get("SPARK_GRAFT_GR_REPARTITION", "0") == "1":
        out = out.repartition(parts, "__pid")
    return out


def global_running_sum(
    df: DataFrame,
    order_cols: list[Column],
    value_col: str,
    running_col: str = "running",
    num_partitions: int | None = None,
    boundary_key: Column | None = None,
) -> DataFrame:
    """Exact global PREFIX SUM of ``value_col`` over a TOTAL order —
    the scalable form of ``SUM(x) OVER (ORDER BY ... ROWS UNBOUNDED
    PRECEDING)``, which Spark otherwise plans as a single-partition
    window. Same construction (and the same literal-boundary safety
    argument) as ``global_rank``: order-aligned deterministic ``__pid``
    buckets, a within-bucket running sum, and broadcast cumulative
    per-bucket TOTALS added as offsets. Inclusive of the current row;
    exact for integral values (the driver of token-budget /
    quota-style cutoffs — prefer integer units over floats, whose
    global sum would be order-sensitive anyway)."""
    ranged = _ranged_by_literal_boundaries(
        df, order_cols, boundary_key, num_partitions, "global_running_sum"
    )
    w = (
        Window.partitionBy("__pid")
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    woff = Window.orderBy("__pid").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = (
        ranged.groupBy("__pid")
        .agg(F.sum(value_col).alias("__tot"))
        .select(
            "__pid",
            F.coalesce(F.sum("__tot").over(woff), F.lit(0)).alias("__offset"),
        )
    )
    return (
        ranged.withColumn("__rs", F.sum(value_col).over(w))
        .join(F.broadcast(offsets), "__pid")
        .withColumn(
            running_col, (F.col("__offset") + F.col("__rs")).cast("long")
        )
        .drop("__pid", "__rs", "__offset")
    )


def global_distribution(
    df: DataFrame,
    order_cols: list[Column],
    buckets: int = 10,
    rank_col: str | None = None,
) -> DataFrame:
    """Distribution window functions (NTILE / PERCENT_RANK /
    CUME_DIST) over a TOTAL order, without the single-partition
    ``Window.orderBy()`` plan: ``global_rank`` supplies the exact
    1-based rank ``r`` via a range shuffle, a broadcast 1-row count
    supplies ``n``, and each function is its closed form over (r, n):

    - ``pct_rank`` = (r−1)/(n−1) — exactly the division PERCENT_RANK
      performs internally, so the doubles are bit-identical.
    - ``cume``     = r/n — valid because ``order_cols`` must be a
      TOTAL order (unique tiebreak), so no row has peers and
      CUME_DIST degenerates to rank/n.
    - ``decile``   = the SQL-standard NTILE bucket: with
      (q, rem) = divmod(n, buckets), the first ``rem`` buckets hold
      q+1 rows. Pure integer arithmetic on (r, n).

    Scale shape: one range exchange + broadcast joins — the same plan
    family as ``global_rank``; nothing funnels through one task."""
    rc = rank_col or "__gdist_r"
    ranked = global_rank(df, order_cols, rank_col=rc)
    n_df = F.broadcast(df.agg(F.count(F.lit(1)).alias("__n")))
    out = ranked.join(n_df)  # 1-row broadcast cross join
    r, n = F.col(rc), F.col("__n")
    b = F.lit(buckets)
    q = F.floor(n / b).cast("long")
    rem = n % b
    big = rem * (q + 1)  # rows living in the (q+1)-sized buckets
    decile = (
        F.when(r <= big, F.floor((r - 1) / (q + 1)) + 1)
        .otherwise(rem + F.floor((r - 1 - big) / q) + 1)
        .cast("int")
    )
    pct = F.when(n > 1, F.round((r - 1) / (n - 1), 6)).otherwise(F.lit(0.0))
    out = (
        out.withColumn("decile", decile)
        .withColumn("pct_rank", pct)
        .withColumn("cume", F.round(r / n, 6))
        .drop("__n")
    )
    return out if rank_col else out.drop(rc)


def exact_auc_report(
    df: DataFrame,
    score_col: str,
    label_col: str,
    num_partitions: int | None = None,
) -> DataFrame:
    """EXACT ROC AUC of an integer-valued classifier score against a
    boolean label — the Mann-Whitney rank-sum form with the standard
    tie correction (ties contribute 1/2), emitted as a BIGINT rational
    so the cross-engine compare never touches rank-average floats:

        auc = auc_num / auc_den,
        auc_num = Σ_s  np(s) · (2·cum_nn_below(s) + nn(s))   (= 2·U)
        auc_den = 2 · n_pos · n_neg

    Scale shape (the distributed-AUC classic): ONE map-side-combinable
    ``groupBy(score)`` collapses the corpus to its score histogram —
    never a per-row global rank — and the strictly-below negative
    prefix comes from ``global_running_sum`` over that histogram, so
    nothing funnels through a single task even when the score domain
    is large. The quality-classifier QA gate of a curation pipeline
    (is the filter actually ranking good docs above bad ones?).

    Returns ONE row: (n_pos, n_neg, auc_num, auc_den, auc) — ``auc``
    is the single rounded division of the two exact BIGINTs (NULL when
    one class is absent).
    """
    hist = df.groupBy(F.col(score_col).alias("__s")).agg(
        F.sum(F.col(label_col).cast("long")).alias("__np"),
        F.sum((~F.col(label_col)).cast("long")).alias("__nn"),
    )
    run = global_running_sum(
        hist,
        [F.col("__s")],
        "__nn",
        running_col="__cum_nn",
        num_partitions=num_partitions,
    )
    contrib = run.select(
        "__np",
        "__nn",
        (
            F.col("__np")
            * (2 * (F.col("__cum_nn") - F.col("__nn")) + F.col("__nn"))
        ).alias("__num2"),
    )
    out = (
        contrib.agg(
            F.sum("__np").cast("long").alias("n_pos"),
            F.sum("__nn").cast("long").alias("n_neg"),
            F.sum("__num2").cast("long").alias("auc_num"),
        )
        .withColumn(
            "auc_den", (2 * F.col("n_pos") * F.col("n_neg")).cast("long")
        )
        .withColumn(
            "auc",
            F.when(
                F.col("auc_den") > 0,
                F.round(
                    F.col("auc_num").cast("double")
                    / F.col("auc_den").cast("double"),
                    6,
                ),
            ),
        )
    )
    return out


def max_key_count(df: DataFrame, key: str) -> int:
    """Size of the largest key group — the skew statistic that decides
    two-phase ranking. One map-side-combinable aggregate; the histogram
    itself never exceeds the key cardinality (≤ 2^planes buckets /
    num_centroids cells), so the driver sees a single row."""
    row = df.groupBy(key).count().agg(F.max("count").alias("m")).first()
    return int(row["m"] or 0)


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    exclude_self: bool = True,
) -> DataFrame:
    """Exact cosine top-k neighbors for each query vector.

    Vectors are L2-normalized *before* the pair join (once per vector,
    not once per pair — at |Q|·|C| pairs that is the dominant cost),
    so the pair stage is a single dot-product fold. The query side is
    broadcast: it is the small side by construction, which turns the
    cross join into a broadcast nested loop with no shuffle of the
    corpus.

    ``exclude_self`` (default) drops id-equal pairs — correct when
    queries are drawn FROM the corpus (the ANN-recall harnesses).
    Pass ``False`` for cross-SET search (e.g. bitext mining), where
    the two populations may legitimately reuse id values and an
    id-equal pair is a real candidate, not a self-match.

    Returns (query_id, neighbor_id, cos_sim, rank). Ranking uses the
    rounded similarity with id tiebreak — fully deterministic.
    """
    q = F.broadcast(_normalized(queries, id_col, "query_id", vec_col, "q_vec"))
    c = _normalized(corpus, id_col, "neighbor_id", vec_col, "c_vec")
    pairs = c.crossJoin(q)
    if exclude_self:
        pairs = pairs.filter(F.col("query_id") != F.col("neighbor_id"))
    sims = (
        pairs
        .select(
            "query_id",
            "neighbor_id",
            F.round(dot(F.col("q_vec"), F.col("c_vec")), 6).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id")
    )
    return sims.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def margin_mining(
    src_queries: DataFrame,
    tgt: DataFrame,
    src_full: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 4,
) -> DataFrame:
    """Margin-based bitext mining (the ratio-margin criterion of
    parallel-corpus construction): for each source-side query, its
    best target-side neighbor scored by

        margin(x, y) = cos(x, y) / ((a_x + a_y) / 2)

    where ``a_x`` is the mean top-k cosine of x into the target set
    and ``a_y`` the mean top-k cosine of y back into the FULL source
    set — the margin discounts "hub" vectors that are everyone's
    nearest neighbor, the failure mode of raw-cosine mining.

    Exactness: the k-NN means are SUMS of 1e6-quantized BIGINT cosines
    (each cosine rounded to 6dp first, so the integers are identical
    in any engine), making the margin ONE division of exact integers —
    ``(n_ax + n_ay)·c6(x,y) / (ax_sum + ay_sum)`` — rounded once at
    the output. ``n_ax``/``n_ay`` are the ACTUAL neighbor counts
    (``= k`` whenever the opposing set has ≥ k members): a population
    smaller than k would otherwise inflate the margin by the missing
    terms' share (round-8 advisor finding).

    Scale shape: two ``brute_force_topk`` passes (query sides
    broadcast — the sampled queries and the ≤|Q| best-candidate set),
    map-side top-k each, then broadcast-joinable |Q|-row margins. For
    corpus-scale mining swap the brute-force passes for the IVF/LSH
    candidate generators — the margin algebra is unchanged. Both
    passes run ``exclude_self=False``: the two populations are
    distinct SETS, so an id-equal pair (two corpora both numbering
    from 0) is a legitimate — often the best — candidate, not a
    self-match.

    Returns (src_id, tgt_id, cos_sim, margin) ordered by src_id.
    """
    c6 = lambda col: F.round(col * 1_000_000).cast("long")  # noqa: E731
    fwd = brute_force_topk(
        tgt, src_queries, id_col, vec_col, k=k, exclude_self=False
    )
    # Four consumers traverse the forward pass (ax, best, the
    # candidate-id collect feeding the backward pass, and the final
    # join); unpersisted, each re-ran the brute-force scan of tgt
    # (8 scans of the embeddings table in the query plan).
    fwd6 = managed_persist(fwd.withColumn("c6", c6(F.col("cos_sim"))))
    ax = fwd6.groupBy("query_id").agg(
        F.sum("c6").alias("ax_sum"),
        F.count(F.lit(1)).cast("long").alias("n_ax"),
    )
    best = fwd6.filter(F.col("rank") == 1).select(
        "query_id", "neighbor_id", "cos_sim", "c6"
    )
    cands = (
        best.select(F.col("neighbor_id").alias(id_col))
        .distinct()
        .join(tgt, id_col)
    )
    bwd = brute_force_topk(
        src_full, cands, id_col, vec_col, k=k, exclude_self=False
    )
    ay = (
        bwd.withColumn("c6", c6(F.col("cos_sim")))
        .groupBy(F.col("query_id").alias("__tid"))
        .agg(
            F.sum("c6").alias("ay_sum"),
            F.count(F.lit(1)).cast("long").alias("n_ay"),
        )
    )
    return (
        best.join(F.broadcast(ax), "query_id")
        .join(F.broadcast(ay), best["neighbor_id"] == F.col("__tid"))
        .select(
            F.col("query_id").alias("src_id"),
            F.col("neighbor_id").alias("tgt_id"),
            "cos_sim",
            F.round(
                (F.col("n_ax") + F.col("n_ay")).cast("double") * F.col("c6")
                / (F.col("ax_sum") + F.col("ay_sum")),
                6,
            ).alias("margin"),
        )
        .orderBy("src_id")
    )


# ---------------------------------------------------------------------------
# LSH: sign random projections with md5-derived hyperplanes
# ---------------------------------------------------------------------------


def _plane_sign(plane: int, dim: int) -> int:
    """Deterministic ±1 hyperplane component — derived from md5 so the
    oracle SQL can regenerate the identical planes."""
    import hashlib

    digit = hashlib.md5(f"{plane}:{dim}".encode()).hexdigest()[0]
    return 1 if int(digit, 16) >= 8 else -1


def plane_matrix(num_planes: int, dim: int) -> list[list[int]]:
    return [[_plane_sign(p, d) for d in range(dim)] for p in range(num_planes)]


def srp_bucket(vec: Column, planes: list[list[int]]) -> Column:
    """Sign-random-projection bucket id: bit p = (v · plane_p) > 0."""
    v = _as_double(vec)
    bucket = F.lit(0).cast("long")
    for p, signs in enumerate(planes):
        proj = F.aggregate(
            F.zip_with(
                v,
                F.array(*[F.lit(float(s)) for s in signs]),
                lambda x, s: x * s,
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bucket = bucket + F.when(proj > 0, F.lit(1 << p)).otherwise(F.lit(0))
    return bucket


def with_srp_bucket(
    df: DataFrame,
    vec_col: str = "embedding",
    dim: int = 64,
    num_planes: int = NUM_PLANES,
) -> DataFrame:
    return df.withColumn(
        "bucket", srp_bucket(F.col(vec_col), plane_matrix(num_planes, dim))
    )


def with_srp_bucket_arrow(
    df: DataFrame,
    vec_col: str,
    dim: int = 64,
    num_planes: int = 8,
    out_col: str = "bucket",
    _emit_unit: bool = False,
) -> DataFrame:
    """SRP bucket assignment, Arrow path: one (batch × dim) @ (dim ×
    planes) matmul per Arrow batch instead of planes × dim interpreted
    lambda evaluations per row. Semantics match ``srp_bucket`` up to
    fp summation order in the projection — a sign can only flip when
    |v · plane| is at rounding noise, the same tolerance the DuckDB
    oracle's unordered SUM already implies. Scales embarrassingly:
    no shuffle, no driver state beyond the (planes × dim) ±1 matrix.

    Public output adds ONLY ``out_col`` (matching ``with_srp_bucket``);
    ``_emit_unit`` is the private fused path for callers that also
    need the normalized vector (``_bucketed_normalized``) and pays the
    normalization cost only there.
    """
    import numpy as np

    from pyspark.sql.types import (
        ArrayType,
        DoubleType,
        LongType,
        StructField,
        StructType,
    )

    planes_t = [
        [float(_plane_sign(p, d)) for p in range(num_planes)] for d in range(dim)
    ]
    weights_l = [1 << p for p in range(num_planes)]
    # copy the fields — StructType.add mutates in place, which would
    # corrupt df's cached schema
    extra = [StructField(out_col, LongType())]
    if _emit_unit:
        extra.append(StructField("__unit", ArrayType(DoubleType())))
    schema = StructType(list(df.schema.fields) + extra)

    def tag(batches):
        p_mat = np.array(planes_t, dtype=np.float64)  # (dim, planes)
        weights = np.array(weights_l, dtype=np.int64)
        for pdf in batches:
            if len(pdf):
                v = np.stack(
                    [np.asarray(a, dtype=np.float64) for a in pdf[vec_col]]
                )  # (m, dim)
                pdf[out_col] = ((v @ p_mat) > 0.0) @ weights
                if _emit_unit:
                    norms = np.linalg.norm(v, axis=1)
                    norms[norms == 0.0] = 1.0
                    pdf["__unit"] = list(v / norms[:, None])
            else:
                pdf[out_col] = np.array([], dtype=np.int64)
                if _emit_unit:
                    pdf["__unit"] = []
            yield pdf

    return df.mapInPandas(tag, schema)


def _bucketed_normalized(
    df: DataFrame,
    id_col: str,
    id_alias: str,
    vec_col: str,
    vec_alias: str,
    dim: int,
    num_planes: int,
) -> DataFrame:
    """(id, bucket, unit-vector) in one Arrow pass — bucket from the
    raw vector (sign of a projection is scale-invariant, and the
    oracle buckets raw embeddings), normalization vectorized in the
    same batch so no per-element lambda survives in the plan."""
    tagged = with_srp_bucket_arrow(
        df.select(F.col(id_col).alias(id_alias), F.col(vec_col).alias("__raw")),
        "__raw",
        dim,
        num_planes,
        _emit_unit=True,
    )
    return tagged.select(id_alias, "bucket", F.col("__unit").alias(vec_alias))


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    num_planes: int = 8,
    k: int = 5,
    salt_threshold: int | None = 100_000,
    num_salts: int = 32,
) -> DataFrame:
    """ANN top-k: candidates from the query's SRP bucket, exact cosine
    re-rank inside the bucket. Recall < 1.0 by design; the bucket join
    replaces the O(|Q|·|C|) cross join. The query side is broadcast
    (it is small by construction), so the corpus never shuffles — the
    bucket join is a map-side hash probe per corpus partition.

    Hot-bucket defense: when the largest corpus bucket exceeds
    ``salt_threshold`` rows (a near-degenerate hyperplane split or an
    embedding-collapsed corpus), the final per-query ranking switches
    to the two-phase salted form (``ranked_topk``) so no single task
    ranks a whole hot bucket. Below the threshold the plan is the
    unchanged single-window form. ``salt_threshold=None`` disables the
    check (and the histogram pass) entirely."""
    q = _bucketed_normalized(
        queries, id_col, "query_id", vec_col, "q_vec", dim, num_planes
    )
    c = _bucketed_normalized(
        corpus, id_col, "neighbor_id", vec_col, "c_vec", dim, num_planes
    )
    salts = None
    if salt_threshold is not None:
        # persist: the bucket histogram and the join both consume the
        # SRP projection — without persist it would run twice
        c = managed_persist(c)
        if max_key_count(c, "bucket") > salt_threshold:
            salts = num_salts
    sims = (
        c.join(F.broadcast(q), "bucket")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(dot(F.col("q_vec"), F.col("c_vec")), 6).alias("cos_sim"),
        )
    )
    return ranked_topk(sims, k, salts)


def cosine_near_dup_pairs(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    num_planes: int = 8,
    threshold: float = 0.95,
    materialize: bool = True,
) -> DataFrame:
    """Embedding near-duplicate pairs: SRP-bucket blocking + exact
    cosine threshold inside buckets (id_a < id_b).

    ``materialize=True`` persists the bucketed+normalized vectors so
    the SRP projection pipeline executes once, not once per self-join
    side (same rationale as ``dedup.lsh_candidate_pairs``)."""
    tagged = _bucketed_normalized(
        corpus, id_col, "id", vec_col, "vec", dim, num_planes
    )
    if materialize:
        tagged = managed_persist(tagged)
    a = tagged.select(
        F.col("id").alias("id_a"), F.col("vec").alias("vec_a"), "bucket"
    )
    b = tagged.select(
        F.col("id").alias("id_b"), F.col("vec").alias("vec_b"), "bucket"
    )
    return (
        a.join(b, "bucket")
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            F.round(dot(F.col("vec_a"), F.col("vec_b")), 6).alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= threshold)
        .distinct()
    )


def semantic_decontaminate(
    train: DataFrame,
    eval_df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    num_planes: int = 8,
    threshold: float = 0.95,
) -> DataFrame:
    """Semantic decontamination: flag train vectors whose embedding is
    near-identical (cosine ≥ threshold) to ANY eval/benchmark vector —
    the embedding-space complement of the n-gram overlap check
    (``sampling.decontaminate_ngram_overlap``), catching paraphrases
    and re-renderings that share no 8-gram. Returns one row per
    contaminated train vector: ``(train_id, eval_id, cos_sim)`` with
    ``eval_id`` the best match (highest cosine, smallest id on ties —
    deterministic, so re-runs and the oracle agree).

    Scale shape: both sides SRP-bucket in one Arrow pass, candidates
    come from the bucket equi-join (never train × eval), and the eval
    side of a real pipeline is tiny (benchmarks), so Spark broadcasts
    it under AQE; the argmax is a per-train-id window over the few
    surviving pairs."""
    from pyspark.sql import Window

    t = _bucketed_normalized(
        train, id_col, "train_id", vec_col, "vec_t", dim, num_planes
    )
    e = _bucketed_normalized(
        eval_df, id_col, "eval_id", vec_col, "vec_e", dim, num_planes
    )
    pairs = (
        t.join(e, "bucket")
        .select(
            "train_id",
            "eval_id",
            F.round(dot(F.col("vec_t"), F.col("vec_e")), 6).alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= threshold)
    )
    w = Window.partitionBy("train_id").orderBy(
        F.col("cos_sim").desc(), F.col("eval_id")
    )
    return (
        pairs.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )


def semdedup_flags(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    num_centroids: int = 16,
    threshold: float = 0.95,
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023): semantic dedup by clustering then
    within-cluster cosine pruning. Returns ``(cell, id, dropped)`` —
    one row per corpus vector; ``dropped`` marks every vector that has
    a near-duplicate (6dp-rounded cosine ≥ threshold) with a SMALLER
    id in the same cluster, i.e. each ε-neighborhood keeps its min-id
    exemplar (the paper keeps one random member; min-id is the
    deterministic equivalent both engines reproduce).

    Cluster assignment reuses the deterministic IVF centroids
    (`ivf_centroids`; numpy argmax-first ≡ the 9dp min-cid tiebreak,
    same kernel doctrine as `ivf_topk_arrow`), so the index is
    reproducible and shared with the ANN family. The pair scan is one
    gram matmul PER CELL inside `applyInPandas` — never all-pairs and
    never an interpreted per-element fold: the cluster count bounds
    the quadratic term exactly as in the paper, and the only shuffle
    is the partition-by-cell that the group-map requires. At corpus
    scale, size ``num_centroids`` so cells stay ~√corpus (the paper's
    own assumption that a cluster fits a worker); a runaway cell is
    the same hot-key shape the LSH path caps via
    `dedup.hot_band_keys`."""
    import numpy as np
    import pandas as pd

    cents = sorted(ivf_centroids(corpus, id_col, vec_col, num_centroids))
    c_ids = np.array([cid for cid, _ in cents], dtype=np.int64)
    c_mat = np.array([cv for _, cv in cents], dtype=np.float64)

    def assign(batches):
        for pdf in batches:
            ids = pdf[id_col].to_numpy(dtype=np.int64)
            if not len(ids):
                continue
            mat = np.stack(pdf["__v"].to_numpy())
            norms = np.linalg.norm(mat, axis=1)
            norms[norms == 0.0] = 1.0
            mat = mat / norms[:, None]
            cells = c_ids[np.argmax(np.round(mat @ c_mat.T, 9), axis=1)]
            yield pd.DataFrame(
                {"cell": cells, "id": ids, "v": list(mat)}
            )

    def prune(pdf: pd.DataFrame) -> pd.DataFrame:
        order = np.argsort(pdf["id"].to_numpy(dtype=np.int64))
        ids = pdf["id"].to_numpy(dtype=np.int64)[order]
        mat = np.stack(pdf["v"].to_numpy()[order])
        sims = np.round(mat @ mat.T, 6)
        # dropped[j] = some i < j (ids ascending) with sims[i, j] >= t
        near = np.triu(sims >= threshold, k=1)
        return pd.DataFrame(
            {
                "cell": pdf["cell"].iloc[0],
                "id": ids,
                "dropped": near.any(axis=0),
            }
        )

    tagged = corpus.select(
        F.col(id_col), _as_double(F.col(vec_col)).alias("__v")
    ).mapInPandas(assign, "cell long, id long, v array<double>")
    return tagged.groupBy("cell").applyInPandas(
        prune, "cell long, id long, dropped boolean"
    )


# ---------------------------------------------------------------------------
# IVF: inverted-file cells around deterministic centroids
# ---------------------------------------------------------------------------


def _lit_vec(v: list[float]) -> Column:
    return F.array(*[F.lit(float(x)) for x in v])


def ivf_centroids(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    num_centroids: int = 16,
) -> list[tuple[int, list[float]]]:
    """Deterministic centroid seed: the ``num_centroids`` lowest-id
    vectors, L2-normalized, collected to the driver (k × dim floats —
    a few KB regardless of corpus size).

    Deterministic seeding keeps the whole index reproducible across
    engines (the DuckDB oracle regenerates identical cells). A
    production index would refine these with k-means (MLlib KMeans or
    Lloyd iterations in DataFrame ops) — refinement changes recall,
    not the operator's shape.
    """
    rows = _normalized(
        corpus.orderBy(id_col).limit(num_centroids), id_col, "cid", vec_col, "cvec"
    ).collect()
    return [(r["cid"], list(r["cvec"])) for r in rows]


def _cell_ranking(vec: Column, centroids: list[tuple[int, list[float]]]) -> Column:
    """Array of (sim, -cid) structs, sorted best-first. Lexicographic
    struct order = max similarity, then min centroid id — the
    deterministic tiebreak the oracle reproduces. Similarities rounded
    to 9dp so cross-engine fp noise cannot flip the argmax."""
    entries = F.array(
        *[
            F.struct(
                F.round(dot(vec, _lit_vec(cv)), 9).alias("s"),
                F.lit(-cid).cast("long").alias("nc"),
            )
            for cid, cv in centroids
        ]
    )
    return F.reverse(F.array_sort(entries))


def ivf_assign(vec: Column, centroids: list[tuple[int, list[float]]]) -> Column:
    """Nearest-centroid cell id for a unit vector."""
    return -_cell_ranking(vec, centroids)[0]["nc"]


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    num_centroids: int = 16,
    nprobe: int = 2,
    salt_threshold: int | None = 100_000,
    num_salts: int = 32,
) -> DataFrame:
    """ANN top-k via an IVF index: corpus vectors are assigned to their
    nearest centroid's cell; each query probes its ``nprobe`` nearest
    cells and exact-reranks only those candidates.

    Scale shape: the corpus side is one pass to assign cells (the
    centroid table is a plan literal — no join, no shuffle), then the
    candidate join shuffles on cell id; cells ≈ |corpus|/k vectors, so
    the pair count drops from |Q|·|C| to |Q|·nprobe·|C|/k. Cell skew
    (hot centroids) is the operational risk at 100 TB: the candidate
    join's skewed partitions are split by AQE skew-join, and when the
    largest cell exceeds ``salt_threshold`` the per-query ranking
    switches to the two-phase salted form (``ranked_topk``) so no
    single task ranks a hot cell's full candidate set. More centroids
    remain the structural fix (smaller cells); salting keeps the job
    from degenerating meanwhile.
    """
    cents = ivf_centroids(corpus, id_col, vec_col, num_centroids)
    c = _normalized(corpus, id_col, "neighbor_id", vec_col, "c_vec").withColumn(
        "cell", ivf_assign(F.col("c_vec"), cents)
    )
    salts = None
    if salt_threshold is not None:
        c = managed_persist(c)  # histogram + join share the assignment pass
        if max_key_count(c, "cell") > salt_threshold:
            salts = num_salts
    q = (
        _normalized(queries, id_col, "query_id", vec_col, "q_vec")
        .withColumn(
            "probe", F.explode(F.slice(_cell_ranking(F.col("q_vec"), cents), 1, nprobe))
        )
        .withColumn("cell", -F.col("probe")["nc"])
        .drop("probe")
    )
    sims = (
        q.join(c, "cell")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(dot(F.col("q_vec"), F.col("c_vec")), 6).alias("cos_sim"),
        )
    )
    return ranked_topk(sims, k, salts)


def kmeans_refine(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    num_centroids: int = 16,
) -> DataFrame:
    """One Lloyd refinement step over the deterministic IVF seeds —
    the centroid *training* path ``ivf_centroids`` points at: assign
    every vector to its nearest seed (same 9dp-rounded argmax and
    min-cid tiebreak as ``ivf_assign``), then recompute each cell's
    centroid as the member mean per dimension.

    Returns (cell, pos, coord, n_members) — the refined centroid
    matrix in long form. Fully distributed: assignment is a plan
    literal (no join), the mean is one map-side-combinable aggregate
    whose shuffle carries ≤ cells × dims rows. Iterating = calling
    again with the previous output as seeds; dimension means sum
    through DECIMAL(28,12) so partition order cannot move the rounded
    coordinate (oracle-reproducible).
    """
    import numpy as np

    cents = sorted(ivf_centroids(corpus, id_col, vec_col, num_centroids))
    c_ids = np.array([cid for cid, _ in cents], dtype=np.int64)
    c_mat = np.array([cv for _, cv in cents], dtype=np.float64)

    # Arrow assignment: one (batch × dim) @ (dim × cells) matmul per
    # Arrow batch instead of a cells × dim literal expression tree —
    # same 9dp rounding and min-cid tiebreak as ivf_assign (argmax over
    # ascending cids), so the oracle's assignment CTE still matches.
    def assign(batches):
        for pdf in batches:
            if len(pdf):
                v = np.stack(pdf["vec"].to_numpy())
                norms = np.linalg.norm(v, axis=1)
                norms[norms == 0.0] = 1.0
                v = v / norms[:, None]
                pdf["vec"] = list(v)
                pdf["cell"] = c_ids[np.argmax(np.round(v @ c_mat.T, 9), axis=1)]
            else:
                pdf["cell"] = np.array([], dtype=np.int64)
            yield pdf

    raw = corpus.select(_as_double(F.col(vec_col)).alias("vec"))
    assigned = raw.mapInPandas(assign, "vec array<double>, cell long")
    ex = assigned.select("cell", F.posexplode("vec").alias("pos", "x"))
    return (
        ex.groupBy("cell", "pos")
        .agg(
            F.round(
                F.sum(F.col("x").cast("decimal(28,12)")).cast("double")
                / F.count(F.lit(1)),
                6,
            ).alias("coord"),
            F.count(F.lit(1)).alias("n_members"),
        )
        .orderBy("cell", "pos")
    )


# ---------------------------------------------------------------------------
# Arrow-vectorized brute force (the fast exact path)
# ---------------------------------------------------------------------------


def _collect_queries(df, max_queries: int, opname: str):
    """Driver-side query collect with a HARD pre-bounded footprint:
    at most ``max_queries + 1`` rows ever cross to the driver (the
    LIMIT bounds the transfer itself, not just a post-hoc check —
    a guard placed after a plain collect() would OOM inside the
    collect it documents preventing). Shared by every Arrow ANN path
    that closes a query matrix over its tasks."""
    rows = df.limit(max_queries + 1).collect()
    if len(rows) > max_queries:
        raise ValueError(
            f"{opname}: |Q| exceeds max_queries = {max_queries}; the "
            "query matrix is collected to the driver and closed over "
            "every task — chunk the query side (union per-chunk top-k) "
            "or use the LSH/IVF scale paths"
        )
    return rows


def brute_force_topk_arrow(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    max_queries: int = 65_536,
) -> DataFrame:
    """Exact cosine top-k, Arrow path: the query matrix (|Q| × dim) is
    collected once and closed over; each corpus partition computes one
    numpy matmul and pre-prunes to its local top-k per query before the
    shuffle (map-side top-k), so the final window ranks only
    |partitions| · |Q| · k rows — never the |Q| · |C| pair set.

    Same contract and determinism as `brute_force_topk` (rounded
    similarity, id tiebreak); ~10-100× faster per pair than the
    expression-fold path because the inner loop is one BLAS call per
    Arrow batch instead of an interpreted lambda per element.

    The collected query matrix is the one driver-side structure here,
    so |Q| is HARD-CAPPED at ``max_queries`` (64Ki × 64 dims ≈ 32 MB —
    comfortably inside any driver/closure budget): a modulo-derived
    query set grows linearly with the corpus, and silently collecting
    it would OOM the driver at 100×. Past the cap, fail loudly — the
    scale paths are the LSH/IVF indexes, or chunk the query side and
    union the per-chunk top-k (exactness composes: each query's global
    top-k is independent of the other queries).
    """
    import numpy as np
    import pandas as pd

    q_rows = _collect_queries(
        _normalized(queries, id_col, "query_id", vec_col, "q_vec"),
        max_queries, "brute_force_topk_arrow",
    )
    if not q_rows:
        schema = "query_id long, neighbor_id long, cos_sim double, rank int"
        return corpus.sparkSession.createDataFrame([], schema)
    q_ids = np.array([r["query_id"] for r in q_rows], dtype=np.int64)
    q_mat = np.array([r["q_vec"] for r in q_rows], dtype=np.float64)  # (nq, dim)

    out_schema = "query_id long, neighbor_id long, cos_sim double"

    def score(batches):
        for pdf in batches:
            ids = pdf[id_col].to_numpy(dtype=np.int64)
            c_mat = np.stack(pdf["__v"].to_numpy())  # (m, dim)
            norms = np.linalg.norm(c_mat, axis=1)
            norms[norms == 0.0] = 1.0
            sims = np.round((c_mat / norms[:, None]) @ q_mat.T, 6)  # (m, nq)
            frames = []
            for j in range(len(q_ids)):
                col = sims[:, j]
                mask = ids != q_ids[j]
                cand_idx = np.nonzero(mask)[0]
                if not len(cand_idx):
                    continue
                # local top-k by (sim desc, id asc): lexsort keys are
                # applied last-key-primary
                order = np.lexsort((ids[cand_idx], -col[cand_idx]))[:k]
                pick = cand_idx[order]
                frames.append(
                    pd.DataFrame(
                        {
                            "query_id": q_ids[j],
                            "neighbor_id": ids[pick],
                            "cos_sim": col[pick],
                        }
                    )
                )
            if frames:
                yield pd.concat(frames, ignore_index=True)

    c = corpus.select(
        F.col(id_col), _as_double(F.col(vec_col)).alias("__v")
    )
    sims = c.mapInPandas(score, out_schema)
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id")
    )
    return sims.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def ivf_topk_arrow(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    num_centroids: int = 16,
    nprobe: int = 2,
    max_queries: int = 65_536,
) -> DataFrame:
    """IVF top-k, Arrow path — semantics identical to `ivf_topk` (same
    centroids, same 9dp assignment rounding, same tiebreaks) with the
    per-row work done in numpy instead of a 16×64-literal expression
    tree: per corpus partition, one matmul against the centroid matrix
    assigns cells (argmax-first ≡ min-cid tiebreak because centroid
    ids are ascending), then each query scores only the rows whose
    cell is in its probe set and pre-prunes to a local top-k before
    the shuffle.

    One pass over the corpus, no join: the probe table (|Q| × nprobe)
    lives in the task closure. Use the cell-join form instead when the
    query set itself is too large to broadcast.
    """
    import numpy as np
    import pandas as pd

    cents = sorted(ivf_centroids(corpus, id_col, vec_col, num_centroids))
    c_ids = np.array([cid for cid, _ in cents], dtype=np.int64)
    c_mat = np.array([cv for _, cv in cents], dtype=np.float64)

    q_rows = _collect_queries(
        _normalized(queries, id_col, "query_id", vec_col, "q_vec"),
        max_queries, "ivf_topk_arrow",
    )
    if not q_rows:
        schema = "query_id long, neighbor_id long, cos_sim double, rank int"
        return corpus.sparkSession.createDataFrame([], schema)
    q_ids = np.array([r["query_id"] for r in q_rows], dtype=np.int64)
    q_mat = np.array([r["q_vec"] for r in q_rows], dtype=np.float64)
    q_sims = np.round(q_mat @ c_mat.T, 9)
    probe_sets = [
        set(c_ids[np.lexsort((c_ids, -q_sims[j]))[:nprobe]]) for j in range(len(q_ids))
    ]

    out_schema = "query_id long, neighbor_id long, cos_sim double"

    def score(batches):
        for pdf in batches:
            ids = pdf[id_col].to_numpy(dtype=np.int64)
            mat = np.stack(pdf["__v"].to_numpy())
            norms = np.linalg.norm(mat, axis=1)
            norms[norms == 0.0] = 1.0
            mat = mat / norms[:, None]
            cells = c_ids[np.argmax(np.round(mat @ c_mat.T, 9), axis=1)]
            frames = []
            for j in range(len(q_ids)):
                mask = np.isin(cells, list(probe_sets[j])) & (ids != q_ids[j])
                cand = np.nonzero(mask)[0]
                if not len(cand):
                    continue
                sims = np.round(mat[cand] @ q_mat[j], 6)
                order = np.lexsort((ids[cand], -sims))[:k]
                pick = cand[order]
                frames.append(
                    pd.DataFrame(
                        {
                            "query_id": q_ids[j],
                            "neighbor_id": ids[pick],
                            "cos_sim": sims[order],
                        }
                    )
                )
            if frames:
                yield pd.concat(frames, ignore_index=True)

    c = corpus.select(F.col(id_col), _as_double(F.col(vec_col)).alias("__v"))
    sims = c.mapInPandas(score, out_schema)
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id")
    )
    return sims.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


# ---------------------------------------------------------------------------
# int8 scalar quantization: the embedding-storage scale path
# ---------------------------------------------------------------------------


def dim_min_max(df: DataFrame, vec_col: str = "embedding") -> tuple[list, list]:
    """Per-dimension corpus min/max, as two driver-side lists.

    ``posexplode → groupBy(pos).agg(min, max)``: the explode is
    streamed straight into a partially-aggregated hash agg (never
    materialized), so the shuffle carries only dim rows PER PARTITION
    and the driver collects 2×dim scalars — bounded by construction,
    same class as the IVF centroids. (The first cut used 2×dim wide
    column aggregates instead; at dim=64 that is 128 generated agg
    expressions and Janino paid ~4 s compiling the stage —
    data-independent, but pure overhead on every plan that embeds it.)
    """
    rows = (
        df.select(F.posexplode(vec_col).alias("pos", "x"))
        .groupBy("pos")
        .agg(F.min("x").alias("mn"), F.max("x").alias("mx"))
        .collect()
    )
    if not rows:
        raise ValueError(
            f"dim_min_max: no non-null '{vec_col}' row to derive the "
            "dimensionality from (empty corpus?)"
        )
    by_pos = {r["pos"]: r for r in rows}
    dim = max(by_pos) + 1
    return (
        [float(by_pos[i]["mn"]) for i in range(dim)],
        [float(by_pos[i]["mx"]) for i in range(dim)],
    )


def quantize_int8(
    df: DataFrame,
    mins: list,
    maxes: list,
    vec_col: str = "embedding",
    code_col: str = "code",
    rounding: str = "round",
) -> DataFrame:
    """Scalar int8 quantization against per-dimension [min, max]:
    ``code_i = round((x_i - mn_i) / (mx_i - mn_i) * 255) - 128``,
    clamped to [-128, 127]; constant dimensions (mx == mn) code to 0.

    This is the 4× embedding-storage compression a 100 TB vector
    corpus ships with (float32 → int8); reconstruction error is
    bounded by half a quantization step per dimension. Pure codegen:
    the corpus stats enter as literal arrays, the transform is a
    higher-order function — no shuffle, no Python.

    ``rounding="floor"`` (round 7) uses the tie-free form
    ``min(255, floor((x - mn) * 256 / (mx - mn)))``: every op is a
    single IEEE -,*,/ over identical inputs and floor of an identical
    double is identical in every engine — whereas ROUND's half-case
    resolution is engine-specific (Spark rounds the double's shortest
    decimal repr, other engines its exact binary value), the round-6
    driver-red class. Equal-width cells; x = mx lands on 256 exactly
    and clamps to 255.
    """
    if rounding not in ("round", "floor"):
        raise ValueError(f"quantize_int8: unknown rounding {rounding!r}")
    mn = F.array(*[F.lit(float(m)) for m in mins])
    mx = F.array(*[F.lit(float(m)) for m in maxes])
    zipped = F.arrays_zip(F.col(vec_col).alias("x"), mn.alias("mn"), mx.alias("mx"))
    if rounding == "floor":
        # GREATEST(0, …) clamp: in-corpus x is >= mn by construction,
        # but the operator's contract allows quantizing vectors not
        # drawn from the corpus that produced the stats (queries) —
        # without it a below-min component escapes the int8 range and
        # the Column/SQL forms diverge from _np_quantize's clip
        quant = lambda t: (  # noqa: E731
            F.greatest(
                F.lit(0),
                F.least(
                    F.lit(255),
                    F.floor(
                        (t["x"] - t["mn"]) * 256 / (t["mx"] - t["mn"])
                    ).cast("int"),
                ),
            )
            - 128
        )
    else:
        quant = lambda t: F.greatest(  # noqa: E731
            F.lit(-128),
            F.least(
                F.lit(127),
                F.round(
                    (t["x"] - t["mn"]) / (t["mx"] - t["mn"]) * 255
                ).cast("int")
                - 128,
            ),
        )
    code = F.transform(
        zipped,
        lambda t: F.when(t["mx"] > t["mn"], quant(t)).otherwise(F.lit(0)),
    )
    return df.withColumn(code_col, code)


def dequantize_int8(
    df: DataFrame,
    mins: list,
    maxes: list,
    code_col: str = "code",
    vec_col: str = "embedding_deq",
) -> DataFrame:
    """Reconstruct doubles from int8 codes (midpoint of the code's
    quantization cell): ``x'_i = (code_i + 128) / 255 * (mx - mn) + mn``."""
    mn = F.array(*[F.lit(float(m)) for m in mins])
    mx = F.array(*[F.lit(float(m)) for m in maxes])
    zipped = F.arrays_zip(F.col(code_col).alias("c"), mn.alias("mn"), mx.alias("mx"))
    deq = F.transform(
        zipped,
        lambda t: (t["c"] + 128).cast("double") / 255 * (t["mx"] - t["mn"])
        + t["mn"],
    )
    return df.withColumn(vec_col, deq)


def quantized_recall_report(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_mod: int = 50,
    k: int = 5,
) -> DataFrame:
    """Recall@k of int8-quantized ANN vs exact float search — the QA
    number that decides whether the 4× storage cut is free. Queries
    are every ``query_mod``-th vector; both searches use the same
    brute-force ranking (rounded cosine, id tiebreak), so the only
    difference IS the quantization. Returns one row per query:
    (query_id, n_overlap, recall_at_k).

    Scale shape: the quantization stats are 2×dim scalars; both
    searches are the map-side-top-k brute force (the exact baseline
    operator); the overlap join is k·|Q| rows.
    """
    dbl = F.transform(vec_col, lambda x: x.cast("double"))
    base = emb.select(F.col(id_col), dbl.alias(vec_col))
    mins, maxes = dim_min_max(base, vec_col)
    deq = dequantize_int8(
        quantize_int8(base, mins, maxes, vec_col), mins, maxes
    ).select(id_col, F.col("embedding_deq").alias(vec_col))
    queries_f = base.filter(F.col(id_col) % query_mod == 0)
    queries_q = deq.filter(F.col(id_col) % query_mod == 0)
    exact = brute_force_topk(base, queries_f, id_col, vec_col, k).select(
        "query_id", "neighbor_id"
    )
    quant = brute_force_topk(deq, queries_q, id_col, vec_col, k).select(
        "query_id", F.col("neighbor_id").alias("q_neighbor_id")
    )
    overlap = exact.join(
        quant,
        (exact.query_id == quant.query_id)
        & (exact.neighbor_id == quant.q_neighbor_id),
    ).groupBy(exact.query_id).agg(F.count(F.lit(1)).alias("n_overlap"))
    return (
        exact.select("query_id").distinct()
        .join(overlap, "query_id", "left")
        .select(
            "query_id",
            F.coalesce("n_overlap", F.lit(0)).alias("n_overlap"),
            F.round(
                F.coalesce("n_overlap", F.lit(0)).cast("double") / k, 6
            ).alias("recall_at_k"),
        )
        .orderBy("query_id")
    )


# ---------------------------------------------------------------------------
# kNN majority-vote labeling
# ---------------------------------------------------------------------------


def knn_label(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    k: int = 5,
) -> DataFrame:
    """Label each query vector by majority vote of its k cosine-nearest
    labeled corpus vectors — the standard kNN classifier / weak-labeler
    shape a curation pipeline uses to propagate labels (or quality
    tiers) from a small annotated set onto an unlabeled corpus.

    Returns (query_id, pred_label, votes). Ties break to the smallest
    label, and the vote count is over the deterministic top-k from
    ``brute_force_topk_arrow`` (rounded sims, id tiebreak), so the
    output is engine-reproducible. The neighbor→label join carries
    |Q|·k rows against the corpus label table keyed on id; AQE
    broadcasts whichever side fits (at corpus scale the |Q|·k side is
    the small one). Swap in ``ivf_topk_arrow`` for the same vote logic
    at corpus scale where exact top-k is too hot.
    """
    knn = brute_force_topk_arrow(corpus, queries, id_col, vec_col, k)
    labels = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(label_col).alias("nbr_label")
    )
    votes = (
        knn.join(labels, "neighbor_id")
        .groupBy("query_id", "nbr_label")
        .agg(F.count(F.lit(1)).alias("votes"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("votes").desc(), F.col("nbr_label")
    )
    return (
        votes.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select("query_id", F.col("nbr_label").alias("pred_label"), "votes")
    )


# ---------------------------------------------------------------------------
# product quantization (integer-exact ADC over the int8 code space)
# ---------------------------------------------------------------------------


def pq_codebooks(
    codes: DataFrame,
    id_col: str = "vec_id",
    code_col: str = "code",
    m: int = 4,
    num_codewords: int = 16,
) -> list[list[list[int]]]:
    """Deterministic PQ codebooks over int8-quantized vectors:
    ``books[sub][cid]`` is the (dim/m)-int codeword, seeded from the
    ``num_codewords`` lowest-id vectors' subvectors with ``cid`` = the
    seed's rank (same deterministic-seed doctrine as
    ``ivf_centroids`` — refinement changes recall, not shape).
    Driver-side data is m × K × (dim/m) SMALL ints by construction.

    Working in the int8 code space (``quantize_int8`` output) is what
    makes the whole PQ index *bit-reproducible across engines*: every
    distance below is an integer sum — no float folds, no rounding
    hazards, no margin gates needed.
    """
    rows = codes.orderBy(id_col).limit(num_codewords).select(code_col).collect()
    if not rows:
        raise ValueError("pq_codebooks: empty corpus")
    dim = len(rows[0][code_col])
    if dim % m != 0:
        raise ValueError(f"pq_codebooks: dim {dim} not divisible by m={m}")
    sd = dim // m
    return [
        [list(r[code_col][s * sd : (s + 1) * sd]) for r in rows]
        for s in range(m)
    ]


def pq_encode(
    df: DataFrame,
    books: list[list[list[int]]],
    code_col: str = "code",
    out_col: str = "pqcode",
) -> DataFrame:
    """Attach the m-byte PQ code: per subspace, the argmin-distance
    codeword id (integer distances; numpy ``argmin`` returns the FIRST
    minimum, so ties break to the lowest cid — a total order,
    deterministic with no rounding step).

    Vectorized numpy over Arrow batches (``mapInPandas``): per batch,
    ONE broadcasted ``(n, K, sd)`` integer subtract-square-sum per
    subspace — the same Arrow-BLAS doctrine as the brute-force ANN
    scan. Still a pure projection: NO join and NO shuffle — the
    corpus-side cost model that survives 100 TB (same shape as
    ``ivf_assign``). Expression-only alternatives both lose: unrolled
    per-codeword subtrees cost ~10 s of Janino compile per plan at
    m×K=64, and higher-order functions are interpreted (no codegen) at
    ~5 ms/row. The output is m small ints per vector: a dim·4-byte
    float vector compresses to m bytes (64× at dim=64, m=4 — the
    reason PQ is the standard memory layout for billion-vector
    indexes)."""
    import numpy as np
    from pyspark.sql.types import ArrayType, IntegerType, StructField, StructType

    m = len(books)
    sd = len(books[0][0])
    B = np.asarray(books, dtype=np.int64)  # m × K × sd
    # NOT df.schema.add(...): DataFrame.schema is cached and .add
    # mutates it in place, corrupting df's own column list.
    out_schema = StructType(
        list(df.schema.fields)
        + [StructField(out_col, ArrayType(IntegerType()))]
    )

    def enc(batches):
        for pdf in batches:
            if len(pdf) == 0:
                pdf[out_col] = []
                yield pdf
                continue
            X = np.stack([np.asarray(v, dtype=np.int64) for v in pdf[code_col]])
            out = np.empty((X.shape[0], m), dtype=np.int32)
            for s in range(m):
                sub = X[:, s * sd : (s + 1) * sd]  # n × sd
                d2 = ((sub[:, None, :] - B[s][None, :, :]) ** 2).sum(axis=2)
                out[:, s] = d2.argmin(axis=1)  # first min → lowest cid
            pdf[out_col] = list(out)
            yield pdf

    return df.mapInPandas(enc, out_schema)


def pq_adc_topk(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    m: int = 4,
    k: int = 5,
    num_codewords: int = 16,
    query_mod: int = 50,
    rounding: str = "round",
) -> DataFrame:
    """Asymmetric-distance (ADC) top-k over the PQ-compressed corpus:
    queries keep their full int8 vectors, corpus vectors are looked up
    through their m codeword ids, distance = Σ_sub d²(query subvector,
    neighbor's codeword). Every arithmetic step is integer, so ranks
    (and the DuckDB oracle) are exact — tie-break on neighbor id.

    The textbook ADC split: each query PREcomputes its m×K distance
    lookup table once (``qlut[s][cid]``), so the per-pair cost in the
    |corpus|×|Q| scan is exactly m array lookups + a sum — no
    arithmetic against codewords in the hot loop. Scale shape: corpus
    side is encode (projection, no shuffle) once; the search is a
    broadcast nested loop of |Q| query LUTs against the m-byte codes —
    the corpus never re-shuffles and never rehydrates floats. This is
    brute-force ADC, the PQ baseline; composing with the IVF cell
    pruning (``ivf_topk``) gives IVF-PQ, cutting candidates by cells
    probed. Returns (query_id, neighbor_id, adc_d2, rank).
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql.types import ArrayType, LongType, StructField, StructType

    mins, maxes = dim_min_max(corpus, vec_col)
    codes = quantize_int8(corpus, mins, maxes, vec_col, rounding=rounding).select(
        id_col, "code"
    )
    books = pq_codebooks(codes, id_col, "code", m, num_codewords)
    sd = len(books[0][0])
    B = np.asarray(books, dtype=np.int64)  # m × K × sd
    enc = pq_encode(codes, books).select(
        F.col(id_col).alias("neighbor_id"), "pqcode"
    )

    qin = codes.filter(F.col(id_col) % query_mod == 0).select(
        F.col(id_col).alias("query_id"), "code"
    )
    lut_schema = StructType(
        [
            qin.schema["query_id"],
            StructField("qlut", ArrayType(ArrayType(LongType()))),
        ]
    )

    def lut_fn(batches):
        # qlut[s][cid] = d²(query subvector s, codeword cid): each
        # query pays its m×K table ONCE here, so the |corpus|×|Q|
        # scan below does no codeword arithmetic at all.
        for pdf in batches:
            if len(pdf) == 0:
                yield pd.DataFrame({"query_id": [], "qlut": []})
                continue
            X = np.stack([np.asarray(v, dtype=np.int64) for v in pdf["code"]])
            luts = np.stack(
                [
                    ((X[:, None, s * sd : (s + 1) * sd] - B[s][None, :, :]) ** 2)
                    .sum(axis=2)
                    for s in range(m)
                ],
                axis=1,
            )  # n × m × K
            yield pd.DataFrame(
                {"query_id": pdf["query_id"], "qlut": [l.tolist() for l in luts]}
            )

    q = F.broadcast(qin.mapInPandas(lut_fn, lut_schema))
    # unrolled m-term lookup sum: plain element_at chains stay inside
    # whole-stage codegen (an F.aggregate over F.sequence would drop
    # the whole pair scan to interpreted evaluation).
    adc = sum(
        (
            F.element_at(
                F.element_at(F.col("qlut"), s + 1),
                F.element_at(F.col("pqcode"), s + 1).cast("int") + 1,
            )
            for s in range(1, m)
        ),
        F.element_at(
            F.element_at(F.col("qlut"), 1),
            F.element_at(F.col("pqcode"), 1).cast("int") + 1,
        ),
    )
    sims = (
        enc.crossJoin(q)
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", adc.alias("adc_d2"))
    )
    w = Window.partitionBy("query_id").orderBy("adc_d2", "neighbor_id")
    return sims.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k
    )


def _np_quantize(X, mn, mx, rounding="round"):
    """Vectorized int8 quantization, identical to ``quantize_int8``'s
    formula INCLUDING the rounding mode. ``"round"``: Spark's F.round
    and DuckDB's ROUND are half-up for the non-negative operand here,
    while numpy's round() is half-to-even — so round via
    floor(v + 0.5) (NOT bit-identical to half-up when v + 0.5 rounds
    up through the double representation — one reason the round mode
    is driver-fragile). ``"floor"``: the round-7 tie-free form —
    floor((X − mn)·256/rng) clamped to 255; identical IEEE op order to
    the SQL/Column forms, so bit-identical everywhere."""
    import numpy as np

    rng = mx - mn
    safe = np.where(rng > 0, rng, 1.0)
    if rounding == "floor":
        c = np.clip(np.floor((X - mn) * 256.0 / safe), 0, 255).astype(np.int64) - 128
    else:
        v = (X - mn) / safe * 255.0
        c = np.clip(np.floor(v + 0.5).astype(np.int64) - 128, -128, 127)
    return np.where(rng > 0, c, 0)


def ivfpq_topk(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    m: int = 4,
    k: int = 5,
    num_centroids: int = 16,
    nprobe: int = 2,
    num_codewords: int = 16,
    query_mod: int = 50,
    rounding: str = "round",
    max_queries: int = 65_536,
) -> DataFrame:
    """IVF-PQ top-k — the composition ``pq_adc_topk``'s docstring
    points at, and the standard billion-vector index layout: IVF cell
    pruning cuts the candidate set to nprobe/cells of the corpus, and
    PQ asymmetric distance ranks those candidates through m-byte codes
    — the scan touches neither the full corpus nor any float vector.

    Determinism composes from its parts: cell assignment is the
    9dp-rounded argmax with min-cid tiebreak (``ivf_topk_arrow``),
    distances are integer ADC sums (``pq_adc_topk``), ranks tie-break
    on neighbor id. Scale shape: ONE corpus pass (a single
    ``mapInPandas`` normalizes → assigns the cell, quantizes → PQ
    encodes, then scores only the queries probing that row's cell with
    a local top-k) — the closure carries centroids + codebooks +
    per-query LUTs + probe sets (all ≲ |Q|·m·K ints), and the final
    window ranks ≤ |partitions|·|Q|·k rows. Use a cell-keyed join
    form when the query set outgrows the closure.
    """
    import numpy as np
    import pandas as pd

    mins, maxes = dim_min_max(corpus, vec_col)
    mn = np.asarray(mins, dtype=np.float64)
    mx = np.asarray(maxes, dtype=np.float64)
    dim = len(mins)
    if dim % m != 0:
        raise ValueError(f"ivfpq_topk: dim {dim} not divisible by m={m}")
    sd = dim // m

    cents = sorted(ivf_centroids(corpus, id_col, vec_col, num_centroids))
    c_ids = np.array([cid for cid, _ in cents], dtype=np.int64)
    c_mat = np.array([cv for _, cv in cents], dtype=np.float64)

    # codebooks: the num_codewords lowest-id vectors' int8 subvectors
    # (pq_codebooks' seed doctrine, quantized driver-side)
    seed_rows = (
        corpus.select(id_col, vec_col).orderBy(id_col).limit(num_codewords).collect()
    )
    if not seed_rows:
        raise ValueError("ivfpq_topk: empty corpus")
    seeds = _np_quantize(
        np.array([r[vec_col] for r in seed_rows], dtype=np.float64), mn, mx,
        rounding=rounding,
    )
    B = np.stack([seeds[:, s * sd : (s + 1) * sd] for s in range(m)])  # m×K×sd

    q_rows = _collect_queries(
        corpus.filter(F.col(id_col) % query_mod == 0).select(id_col, vec_col),
        max_queries, "ivfpq_topk",
    )
    if not q_rows:
        return corpus.sparkSession.createDataFrame(
            [], "query_id long, neighbor_id long, adc_d2 long, rank int"
        )
    q_ids = np.array([r[id_col] for r in q_rows], dtype=np.int64)
    Qv = np.array([r[vec_col] for r in q_rows], dtype=np.float64)
    qn = np.linalg.norm(Qv, axis=1)
    qn[qn == 0.0] = 1.0
    q_sims = np.round((Qv / qn[:, None]) @ c_mat.T, 9)
    probe_sets = [
        np.array(sorted(c_ids[np.lexsort((c_ids, -q_sims[j]))[:nprobe]]))
        for j in range(len(q_ids))
    ]
    Qc = _np_quantize(Qv, mn, mx, rounding=rounding)
    luts = np.stack(
        [
            ((Qc[:, None, s * sd : (s + 1) * sd] - B[s][None, :, :]) ** 2).sum(axis=2)
            for s in range(m)
        ],
        axis=1,
    )  # nq × m × K

    out_schema = "query_id long, neighbor_id long, adc_d2 long"
    sub_idx = np.arange(m)

    def score(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            ids = pdf[id_col].to_numpy(dtype=np.int64)
            X = np.stack(pdf["__v"].to_numpy())
            nn = np.linalg.norm(X, axis=1)
            nn[nn == 0.0] = 1.0
            cells = c_ids[np.argmax(np.round((X / nn[:, None]) @ c_mat.T, 9), axis=1)]
            C = _np_quantize(X, mn, mx, rounding=rounding)
            codes = np.stack(
                [
                    ((C[:, None, s * sd : (s + 1) * sd] - B[s][None, :, :]) ** 2)
                    .sum(axis=2)
                    .argmin(axis=1)
                    for s in range(m)
                ],
                axis=1,
            )  # n × m
            frames = []
            for j in range(len(q_ids)):
                mask = np.isin(cells, probe_sets[j]) & (ids != q_ids[j])
                cand = np.nonzero(mask)[0]
                if not len(cand):
                    continue
                adc = luts[j][sub_idx[None, :], codes[cand]].sum(axis=1)
                order = np.lexsort((ids[cand], adc))[:k]
                pick = cand[order]
                frames.append(
                    pd.DataFrame(
                        {
                            "query_id": q_ids[j],
                            "neighbor_id": ids[pick],
                            "adc_d2": adc[order],
                        }
                    )
                )
            if frames:
                yield pd.concat(frames, ignore_index=True)

    c = corpus.select(F.col(id_col), _as_double(F.col(vec_col)).alias("__v"))
    sims = c.mapInPandas(score, out_schema)
    w = Window.partitionBy("query_id").orderBy("adc_d2", "neighbor_id")
    return sims.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def truncated_recall_report(
    emb: DataFrame,
    trunc_dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_mod: int = 50,
    k: int = 5,
) -> DataFrame:
    """Recall@k of TRUNCATED-dimension ANN vs the full-dimension exact
    search — the QA gate on Matryoshka-style prefix truncation
    (Kusupati et al. 2022: nested representations whose leading dims
    carry most of the signal; serving indexes keep dim/4 and re-rank).
    Both searches share the brute-force ranking (rounded cosine, id
    tiebreak), so the report isolates pure truncation loss — cosine is
    scale-invariant, so slicing needs no renormalization step.

    Scale shape: truncation is a per-row ``slice`` (no stats pass at
    all — cheaper than quantization); everything else is the map-side
    top-k brute force; the overlap join is k·|Q| rows."""
    dbl = F.transform(vec_col, lambda x: x.cast("double"))
    base = emb.select(F.col(id_col), dbl.alias(vec_col))
    trunc = base.select(
        id_col, F.slice(vec_col, 1, trunc_dim).alias(vec_col)
    )
    exact = brute_force_topk(
        base, base.filter(F.col(id_col) % query_mod == 0), id_col, vec_col, k
    ).select("query_id", "neighbor_id")
    small = brute_force_topk(
        trunc, trunc.filter(F.col(id_col) % query_mod == 0), id_col, vec_col, k
    ).select("query_id", F.col("neighbor_id").alias("t_neighbor_id"))
    overlap = exact.join(
        small,
        (exact.query_id == small.query_id)
        & (exact.neighbor_id == small.t_neighbor_id),
    ).groupBy(exact.query_id).agg(F.count(F.lit(1)).alias("n_overlap"))
    return (
        exact.select("query_id").distinct()
        .join(overlap, "query_id", "left")
        .select(
            "query_id",
            F.coalesce("n_overlap", F.lit(0)).cast("long").alias("n_overlap"),
            F.round(
                F.coalesce("n_overlap", F.lit(0)).cast("double") / k, 6
            ).alias("recall_at_k"),
        )
        .orderBy("query_id")
    )
