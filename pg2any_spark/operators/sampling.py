"""Deterministic sampling / splitting / mixing for training-data prep.

The reference replicates tables verbatim and never samples; a
pretraining pipeline built on this engine needs three more moves, and
all three must be *deterministic functions of the row* — not RNG —
so that re-runs, backfills, and the DuckDB oracle all agree:

- **hash bucketing**: row -> stable bucket in [0, buckets), from the
  md5 of a key. No state, no shuffle, embarrassingly parallel.
- **train/eval/test split**: bucket thresholds over the hash. A row's
  split never changes when the corpus grows (crucial: eval
  contamination is forever), unlike ``df.randomSplit``.
- **weighted source mixing**: per-source keep-fractions via the same
  hash thresholds — downsample over-represented sources (the
  Common-Crawl-vs-Wikipedia mix knob) in one narrow pass.

Scale (100 TB): the sampling/splitting/mixing operators are pure
projections/filters — no shuffle, no UDF, whole-stage-codegen'd;
filters sit directly on the scan so Parquet row-group pruning still
applies upstream. The one exception is ``pack_sequences`` (sequence
assembly, not sampling): it needs a per-group running sum, so it pays
exactly one partition-by-group shuffle, reused by its aggregate.
"""

from __future__ import annotations

from typing import Mapping

from pyspark.sql import Column, DataFrame, functions as F

from pg2any_spark.caching import managed_persist

#: Modulus for hash bucketing: fits in a signed 32-bit parse of an
#: 8-hex-digit md5 prefix, large enough for 0.01% split granularity.
HASH_MOD = 1_000_000


def hash_bucket(key: Column, buckets: int = HASH_MOD, salt: str = "") -> Column:
    """Stable bucket in [0, buckets) from md5 of the key (+ salt).

    Cross-engine: DuckDB equivalent is
    ``CAST(('0x' || substr(md5(key), 1, 8)) AS BIGINT) % buckets``.
    The salt namespaces independent decisions (split vs mix) so they
    are statistically independent of each other.
    """
    h = F.conv(F.substring(F.md5(F.concat(key.cast("string"), F.lit(salt))), 1, 8), 16, 10)
    return (h.cast("long") % buckets).alias("bucket")


def assign_split(
    df: DataFrame,
    key_col: str,
    eval_ppm: int = 10_000,
    test_ppm: int = 10_000,
    salt: str = "split",
) -> DataFrame:
    """Add a ``split`` column ('train' | 'eval' | 'test') keyed on the
    md5 of ``key_col``. ppm = parts-per-million of HASH_MOD, so the
    default is 1% eval / 1% test / 98% train. Deterministic: adding
    documents later never reassigns an existing row."""
    b = hash_bucket(F.col(key_col), HASH_MOD, salt)
    split = (
        F.when(b < eval_ppm, F.lit("eval"))
        .when(b < eval_ppm + test_ppm, F.lit("test"))
        .otherwise(F.lit("train"))
    )
    return df.withColumn("split", split)


def stratified_hash_sample(
    df: DataFrame,
    key_col: str,
    strata_col: str,
    fractions: Mapping[str, float],
    default_fraction: float = 1.0,
    salt: str = "mix",
) -> DataFrame:
    """Keep a per-stratum deterministic fraction of rows: a row
    survives iff hash_bucket(key) < fraction * HASH_MOD for its
    stratum. The deterministic analogue of ``df.sampleBy`` —
    reproducible across runs and engines, and a pure filter (no
    shuffle, no RNG state)."""
    b = hash_bucket(F.col(key_col), HASH_MOD, salt)
    threshold = None
    for stratum, frac in sorted(fractions.items()):
        t = F.when(F.col(strata_col) == stratum, F.lit(int(frac * HASH_MOD)))
        threshold = t if threshold is None else threshold.when(
            F.col(strata_col) == stratum, F.lit(int(frac * HASH_MOD))
        )
    threshold = (
        threshold.otherwise(F.lit(int(default_fraction * HASH_MOD)))
        if threshold is not None
        else F.lit(int(default_fraction * HASH_MOD))
    )
    return df.filter(b < threshold)


def stratified_fixed_n(
    df: DataFrame,
    key_col: str,
    strata_col: str,
    n: int,
    salt: str = "fixn",
) -> DataFrame:
    """Keep EXACTLY ``n`` rows per stratum (or all, if the stratum is
    smaller): rank rows inside each stratum by their md5 hash (key as
    tiebreak) and keep rank ≤ n. The fixed-size counterpart to
    ``stratified_hash_sample``'s fixed-fraction filter — "50 eval docs
    per language" style draws, where the quota must be exact however
    skewed the strata. Deterministic: the hash order is a pure
    function of the key, so the same rows survive on every run, on
    every engine, and when the corpus grows only the hash-largest
    stragglers rotate out.

    Cost: one shuffle (partition by stratum for the rank window) —
    and a window partition CANNOT be skew-split (AQE skew handling
    applies to joins/rebalance, not windows), so a giant stratum
    serializes into one task. For million-row strata, pre-reduce with
    ``stratified_hash_sample`` (a shuffle-free filter sized to a few×n
    survivors) before ranking, or prefer the fraction filter
    outright."""
    from pyspark.sql import Window

    h = F.md5(F.concat(F.col(key_col).cast("string"), F.lit(salt)))
    w = Window.partitionBy(strata_col).orderBy(h, F.col(key_col))
    return (
        df.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") <= n)
        .drop("__rk")
    )


def upsample_epochs(
    df: DataFrame,
    key_col: str,
    strata_col: str,
    epochs: Mapping[str, float],
    default_epochs: float = 1.0,
    salt: str = "epochs",
) -> DataFrame:
    """Replicate rows to hit FRACTIONAL per-stratum epoch counts — the
    upsampling half of corpus mixing (e.g. "2.5 epochs of Wikipedia,
    1 epoch of Common Crawl"). Every row gets ``floor(e)`` copies,
    plus one more iff its hash bucket clears the fractional
    remainder — so a 2.5-epoch source emits each row 2 or 3 times,
    deterministically (the SAME rows get the extra copy on every
    run/engine — no RNG), averaging e epochs exactly in expectation.

    Adds an ``epoch`` column (0-based copy index) via
    ``explode(sequence(...))`` — a narrow per-row fan-out, no shuffle,
    no driver involvement; downstream packing/shuffling sees the
    copies as ordinary rows. Strata absent from ``epochs`` get
    ``default_epochs``."""
    b = hash_bucket(F.col(key_col), HASH_MOD, salt)
    whole = None
    frac_th = None
    for stratum, e in sorted(epochs.items()):
        w, f = int(e), int(round((e - int(e)) * HASH_MOD))
        cond = F.col(strata_col) == stratum
        whole = (
            F.when(cond, F.lit(w)) if whole is None else whole.when(cond, F.lit(w))
        )
        frac_th = (
            F.when(cond, F.lit(f))
            if frac_th is None
            else frac_th.when(cond, F.lit(f))
        )
    dw = int(default_epochs)
    dfr = int(round((default_epochs - dw) * HASH_MOD))
    whole = F.lit(dw) if whole is None else whole.otherwise(F.lit(dw))
    frac_th = F.lit(dfr) if frac_th is None else frac_th.otherwise(F.lit(dfr))
    n_copies = whole + (b < frac_th).cast("int")
    return (
        df.withColumn("__n_copies", n_copies)
        .filter(F.col("__n_copies") >= 1)
        .withColumn(
            "epoch",
            F.explode(F.sequence(F.lit(0), F.col("__n_copies") - 1)),
        )
        .drop("__n_copies")
    )


def weighted_mix(
    sources: Mapping[str, tuple[DataFrame, float]],
    key_col: str,
    salt: str = "mix",
) -> DataFrame:
    """Union heterogeneous corpora with per-source keep-fractions and
    a ``mix_source`` provenance column. ``sources`` maps a source name
    to (DataFrame, fraction in [0, 1]). Schemas must align by name."""
    out = None
    for name, (df, frac) in sorted(sources.items()):
        b = hash_bucket(F.col(key_col), HASH_MOD, salt)
        part = df.filter(b < int(frac * HASH_MOD)).withColumn(
            "mix_source", F.lit(name)
        )
        out = part if out is None else out.unionByName(part)
    if out is None:
        raise ValueError("weighted_mix requires at least one source")
    return out


def decontaminate_train(
    df: DataFrame,
    key_col: str,
    text_col: str,
    eval_ppm: int = 10_000,
    test_ppm: int = 10_000,
) -> DataFrame:
    """Eval-set decontamination: flag train rows whose normalized
    content fingerprint also appears in the eval/test splits — the
    leakage check every pretraining pipeline must run before the eval
    numbers mean anything.

    Returns the train rows with a ``contaminated`` boolean. The
    holdout fingerprint set is produced by an aggregate (distinct) and
    joined back with a left join; at the default 2% holdout the set is
    small enough that AQE turns the join into a broadcast — the train
    side never shuffles. Both the split and the fingerprint are pure
    functions of the row (md5), so the whole check is deterministic
    and oracle-reproducible.
    """
    from pg2any_spark.operators.text import fingerprint

    tagged = assign_split(df, key_col, eval_ppm, test_ppm).withColumn(
        "fp", fingerprint(F.col(text_col))
    )
    holdout = (
        tagged.filter(F.col("split") != "train")
        .select("fp")
        .distinct()
        .withColumn("__held", F.lit(True))
    )
    return (
        tagged.filter(F.col("split") == "train")
        .join(holdout, "fp", "left")
        .withColumn("contaminated", F.coalesce(F.col("__held"), F.lit(False)))
        .drop("__held")
    )


def decontaminate_ngram_overlap(
    df: DataFrame,
    key_col: str,
    text_col: str,
    n: int = 8,
    eval_ppm: int = 10_000,
    test_ppm: int = 10_000,
) -> DataFrame:
    """N-gram-overlap decontamination: flag train rows sharing ANY word
    n-gram with the eval/test holdout — the stricter industry-standard
    screen (fingerprints only catch whole-document leaks; n-gram
    overlap catches quoted passages and templated near-copies).

    Plan shape: holdout n-grams are a distinct aggregate over 2% of
    the corpus (broadcast-sized); train docs explode to (doc, gram),
    LEFT SEMI join against the broadcast gram set, and the distinct
    contaminated-id set flags back onto the un-exploded train rows.
    The full train corpus is never shuffled — only its contaminated
    id set (tiny by construction) crosses stages.
    """
    from pg2any_spark.operators.text import word_ngrams

    grams = word_ngrams(F.col(text_col), n)
    tagged = assign_split(df, key_col, eval_ppm, test_ppm)
    holdout_grams = (
        tagged.filter(F.col("split") != "train")
        .select(F.explode(grams).alias("gram"))
        .distinct()
    )
    train = tagged.filter(F.col("split") == "train")
    # no forced broadcast: the distinct 8-grams of 2% of a 100 TB
    # corpus are NOT driver-sized. AQE promotes the join to broadcast
    # when the set is actually small (the fixture case) and keeps a
    # shuffle join when it is not.
    contaminated = (
        train.select(F.col(key_col), F.explode(grams).alias("gram"))
        .join(holdout_grams, "gram", "left_semi")
        .select(key_col)
        .distinct()
        .withColumn("__c", F.lit(True))
    )
    return (
        train.join(contaminated, key_col, "left")
        .withColumn("contaminated", F.coalesce(F.col("__c"), F.lit(False)))
        .drop("__c")
    )


def temperature_mix(
    df: DataFrame,
    key_col: str,
    strata_col: str,
    alpha: float = 0.5,
    budget_frac: float = 0.5,
    salt: str = "tmix",
) -> DataFrame:
    """Temperature-balanced corpus sampling: the standard multilingual/
    multi-domain mixing rule where a stratum's draw probability is
    proportional to ``n^alpha``. ``alpha < 1`` flattens the size
    distribution — small languages/domains are upweighted relative to
    their raw share, the big one stops dominating.

    With corpus budget ``T = budget_frac · N``, a stratum of size n_s
    gets expected take ``t_s = T · n_s^alpha / Σ n^alpha`` and keep
    fraction ``min(1, t_s / n_s)``, realized as the usual
    deterministic md5-hash filter (no RNG, reproducible, growth-
    stable). The per-stratum thresholds come from one tiny aggregate
    broadcast back onto the corpus — the corpus itself never shuffles.
    Thresholds are floored to integer bucket space so the comparison
    is exact cross-engine.
    """
    n_col = F.count(F.lit(1))
    counts = df.groupBy(strata_col).agg(n_col.alias("__n"))
    totals = counts.agg(
        F.sum("__n").alias("__total"),
        F.sum(F.pow(F.col("__n").cast("double"), F.lit(alpha))).alias("__wsum"),
    )
    thresholds = (
        counts.crossJoin(F.broadcast(totals))
        .withColumn(
            "__keep",
            F.least(
                F.lit(1.0),
                F.lit(budget_frac)
                * F.col("__total")
                * F.pow(F.col("__n").cast("double"), F.lit(alpha))
                / (F.col("__wsum") * F.col("__n")),
            ),
        )
        .select(
            strata_col,
            F.floor(F.col("__keep") * HASH_MOD).cast("long").alias("__thr"),
        )
    )
    b = hash_bucket(F.col(key_col), HASH_MOD, salt)
    # null-safe equality: a NULL stratum is a real stratum (it got a
    # threshold row above); a plain equi-join would silently drop it
    thr = thresholds.withColumnRenamed(strata_col, "__stratum")
    return (
        df.join(
            F.broadcast(thr),
            F.col(strata_col).eqNullSafe(F.col("__stratum")),
        )
        .filter(b < F.col("__thr"))
        .drop("__thr", "__stratum")
    )


def pack_sequences(
    docs: DataFrame,
    budget: int,
    group_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Concatenate-and-chunk sequence packing (the GPT-style
    pre-training pack): within each ``group_col`` stream, documents are
    concatenated in ``id_col`` order and the token stream is split
    into ``budget``-sized training sequences; a document belongs to
    the sequence where it STARTS. Returns one row per (group, seq_id):
    n_docs, first_doc, seq_tokens (tokens of documents starting in the
    sequence) and fill_ratio.

    Plan shape: ONE shuffle (partition by group for the running-sum
    window), reused by the per-sequence aggregate — the assignment is
    a closed-form function of the cumulative token count, never a
    sequential fold, which is what keeps packing parallel over a
    100 TB corpus (each group packs independently; groups = sources /
    shards / languages).
    """
    from pyspark.sql import Window

    from pg2any_spark.operators.text import token_count

    w = (
        Window.partitionBy(group_col)
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    d = (
        docs.select(group_col, id_col, token_count(F.col(text_col)).alias("n_tok"))
        .withColumn("cum_tok", F.sum("n_tok").over(w))
        .withColumn(
            "seq_id",
            F.floor((F.col("cum_tok") - F.col("n_tok")) / F.lit(budget)),
        )
    )
    return (
        d.groupBy(group_col, "seq_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min(id_col).alias("first_doc"),
            F.sum("n_tok").alias("seq_tokens"),
        )
        .select(
            group_col,
            "seq_id",
            "n_docs",
            "first_doc",
            "seq_tokens",
            F.round(F.col("seq_tokens").cast("double") / budget, 6).alias(
                "fill_ratio"
            ),
        )
        .orderBy(group_col, "seq_id")
    )


def chunk_token_windows(
    docs: DataFrame,
    window: int = 64,
    stride: int = 48,
    min_tail: int = 16,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Context-window chunking: split each document's token stream
    into overlapping ``window``-token training examples advancing by
    ``stride`` (overlap = window - stride, the standard
    long-document-to-context-length move). Tail fragments shorter
    than ``min_tail`` are dropped unless they are the document's ONLY
    chunk (a short document still yields one example).

    Coverage guarantee: every token of every document appears in at
    least one emitted chunk whenever ``min_tail <= window - stride + 1``
    (a droppable tail is then always shorter than the overlap, so the
    previous window already covers it — pinned by a property test).
    The defaults satisfy it; configs that violate it trade tail
    coverage for fewer fragments, deliberately.

    Returns one row per (doc, chunk): ``chunk_idx`` (0-based stride
    ordinal), ``n_tokens``, ``chunk_text``.

    Scale (100 TB): a pure projection — tokenize, generate the start
    offsets with ``sequence`` (closed form, ≤ ceil(len/stride) per
    row), ``slice`` each window out. No shuffle, no UDF; fan-out is
    bounded by window/stride (< 1.4× the corpus tokens here), and each
    chunk row is independent so downstream packing/sharding
    repartitions freely.
    """
    from pg2any_spark.operators.text import tokens

    d = (
        docs.filter(F.trim(F.col(text_col)) != "")
        .select(id_col, tokens(F.col(text_col)).alias("t"))
        .withColumn("n", F.size("t"))
        .select(
            id_col, "t", "n",
            F.explode(
                F.sequence(F.lit(0), F.col("n") - 1, F.lit(stride))
            ).alias("start"),
        )
        .withColumn("ct", F.slice("t", F.col("start") + 1, window))
        .withColumn("n_tokens", F.size("ct"))
        .filter((F.col("start") == 0) | (F.col("n_tokens") >= min_tail))
    )
    return d.select(
        id_col,
        F.expr(f"start div {stride}").cast("int").alias("chunk_idx"),
        F.col("n_tokens").cast("int").alias("n_tokens"),
        F.array_join("ct", " ").alias("chunk_text"),
    )


# ---------------------------------------------------------------------------
# DSIR: data selection via importance resampling (hashed n-gram LLR)
# ---------------------------------------------------------------------------


def dsir_log_ratio(
    df: DataFrame,
    is_target: Column,
    id_col: str = "doc_id",
    text_col: str = "text",
    alpha: float = 1.0,
    n_buckets: int = 4096,
    materialize: bool = True,
) -> DataFrame:
    """Per-document importance score for target-distribution data
    selection (DSIR, Xie et al. 2023, arXiv:2302.03169): score(x) =
    mean over tokens of log P_target(f)/P_raw(f), where f is the
    token's hashed feature bucket and both distributions are add-α
    smoothed bucket frequencies — target estimated from the rows where
    ``is_target`` holds, raw from the whole corpus. Selecting the
    top-scoring documents importance-resamples the raw corpus toward
    the target distribution (the Pile-toward-Wikipedia curation move).

    The reference engine replicates rows and never scores them; this
    is part of the beyond-reference training-data surface
    (BASELINE.json north star), same family as ``weighted_mix``.

    Scale (100 TB): the hashing trick is what makes DSIR unboundedly
    scalable where the bigram LM (text.lm_bigram_scores) is not — the
    feature space is FIXED at ``n_buckets`` regardless of corpus size,
    so the weight table is always broadcastable (vs a corpus-sized
    bigram vocabulary that forces ``broadcast_counts=False`` SMJ at
    web scale). One corpus-sized shuffle (token stream → per-(doc,
    bucket) counts, map-side combined); everything downstream of it is
    bounded by n_buckets rows or is a broadcast join back onto the
    doc-feature table. The md5 bucket hash is the same cross-engine
    ``hash_bucket`` primitive the split/mix operators use, so the
    whole score is DuckDB-oracle-able.

    Returns (id_col, n_toks, avg_llr) with avg_llr UNROUNDED — callers
    round and must classify the cell in the output-margin gate
    (tests/test_threshold_margins.py).
    """
    from pg2any_spark.operators.text import tokens

    base = (
        df.filter(F.trim(F.col(text_col)) != "")
        .select(
            F.col(id_col),
            is_target.cast("boolean").alias("is_tgt"),
            F.explode(tokens(F.col(text_col))).alias("tok"),
        )
        .filter(F.col("tok") != "")
    )
    docfeat = (
        base.select(
            id_col,
            "is_tgt",
            hash_bucket(F.col("tok"), n_buckets).alias("f"),
        )
        .groupBy(id_col, "f")
        .agg(F.count(F.lit(1)).alias("n"), F.first("is_tgt").alias("is_tgt"))
    )
    # docfeat fans out to raw counts, target counts, totals AND the
    # scoring join — persist once (same fan-out argument as
    # text.lm_bigram_scores / tfidf_top_terms).
    if materialize:
        docfeat = managed_persist(docfeat)
    rawc = docfeat.groupBy("f").agg(F.sum("n").alias("c_raw"))
    tgtc = (
        docfeat.filter(F.col("is_tgt"))
        .groupBy("f")
        .agg(F.sum("n").alias("c_tgt"))
    )
    tot = docfeat.agg(
        F.sum("n").alias("n_raw"),
        F.sum(F.when(F.col("is_tgt"), F.col("n")).otherwise(F.lit(0))).alias(
            "n_tgt"
        ),
    )
    denom = float(alpha) * n_buckets
    weights = (
        rawc.join(tgtc, "f", "left")
        .crossJoin(F.broadcast(tot))
        .select(
            "f",
            (
                F.log(
                    (
                        F.coalesce(F.col("c_tgt"), F.lit(0)).cast("double")
                        + F.lit(float(alpha))
                    )
                    / (F.col("n_tgt").cast("double") + F.lit(denom))
                )
                - F.log(
                    (F.col("c_raw").cast("double") + F.lit(float(alpha)))
                    / (F.col("n_raw").cast("double") + F.lit(denom))
                )
            ).alias("llr"),
        )
    )
    # weights has <= n_buckets rows BY CONSTRUCTION — the broadcast
    # hint is unconditionally safe (the whole point of the hashing
    # trick), unlike the LM's vocab-sized count tables.
    return (
        docfeat.join(F.broadcast(weights), "f")
        .groupBy(id_col)
        .agg(
            F.sum("n").alias("n_toks"),
            (
                F.sum(F.col("n").cast("double") * F.col("llr"))
                / F.sum("n").cast("double")
            ).alias("avg_llr"),
        )
    )


def dsir_log_ratio_scaled(
    df: DataFrame,
    is_target: Column,
    id_col: str = "doc_id",
    text_col: str = "text",
    alpha: float = 1.0,
    n_buckets: int = 4096,
    scale: int = 1_000_000,
    materialize: bool = True,
) -> DataFrame:
    """``dsir_log_ratio`` with the per-feature log-likelihood ratio
    quantized to a scaled BIGINT BEFORE the per-document aggregation
    (round-7 determinism form, same rationale as
    ``text.lm_bigram_scores_scaled``): ``llr_s = floor(scale · llr)``
    per feature — the llr's inputs are single IEEE op chains over
    exact integers, so the only cross-engine noise is a ≤1-ulp ln()
    difference, absorbed by the 1e-6 floor quantum except within
    ~1e-10 of a boundary — then ``llr_sum = Σ n·llr_s`` (BIGINT,
    order-independent). Rank keys and thresholds downstream become
    either pure integer comparisons or a single exact-input division.

    Returns (id_col, n_toks, llr_sum) — both aggregates BIGINT."""
    from pg2any_spark.operators.text import tokens

    base = (
        df.filter(F.trim(F.col(text_col)) != "")
        .select(
            F.col(id_col),
            is_target.cast("boolean").alias("is_tgt"),
            F.explode(tokens(F.col(text_col))).alias("tok"),
        )
        .filter(F.col("tok") != "")
    )
    docfeat = (
        base.select(
            id_col,
            "is_tgt",
            hash_bucket(F.col("tok"), n_buckets).alias("f"),
        )
        .groupBy(id_col, "f")
        .agg(F.count(F.lit(1)).alias("n"), F.first("is_tgt").alias("is_tgt"))
    )
    if materialize:
        docfeat = managed_persist(docfeat)
    rawc = docfeat.groupBy("f").agg(F.sum("n").alias("c_raw"))
    tgtc = (
        docfeat.filter(F.col("is_tgt"))
        .groupBy("f")
        .agg(F.sum("n").alias("c_tgt"))
    )
    tot = docfeat.agg(
        F.sum("n").alias("n_raw"),
        F.sum(F.when(F.col("is_tgt"), F.col("n")).otherwise(F.lit(0))).alias(
            "n_tgt"
        ),
    )
    denom = float(alpha) * n_buckets
    weights = (
        rawc.join(tgtc, "f", "left")
        .crossJoin(F.broadcast(tot))
        .select(
            "f",
            F.floor(
                F.lit(float(scale))
                * (
                    F.log(
                        (
                            F.coalesce(F.col("c_tgt"), F.lit(0)).cast("double")
                            + F.lit(float(alpha))
                        )
                        / (F.col("n_tgt").cast("double") + F.lit(denom))
                    )
                    - F.log(
                        (F.col("c_raw").cast("double") + F.lit(float(alpha)))
                        / (F.col("n_raw").cast("double") + F.lit(denom))
                    )
                )
            )
            .cast("long")
            .alias("llr_s"),
        )
    )
    return (
        docfeat.join(F.broadcast(weights), "f")
        .groupBy(id_col)
        .agg(
            F.sum("n").alias("n_toks"),
            F.sum(F.col("n") * F.col("llr_s")).alias("llr_sum"),
        )
    )
