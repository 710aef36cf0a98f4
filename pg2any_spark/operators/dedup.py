"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard.

Training-data-pipeline surface (BASELINE.json north star). Scale
design (100 TB):

- **exact**: fingerprint = md5(normalized text); groupBy fingerprint
  keeping the min id is a map-side-combinable aggregate — the shuffle
  carries one row per distinct fingerprint.
- **MinHash+LSH**: shingle → k independent min-hashes in ONE
  aggregation pass (k ``min`` aggs, all partial-aggregated before the
  shuffle) → band keys → self-join per band. No O(n²) pair
  enumeration; the only join is on band buckets, exactly the
  shingle→minhash→band→bucket-join factoring LSH exists for.
- **SimHash**: exploded token votes reduce with 32 map-side-combinable
  ``sum`` aggs; fingerprint assembled post-agg.
- **n-gram Jaccard**: for *candidate pairs only* (from LSH) — the
  exact verify stage; set sizes via distinct-shingle joins.

Cross-engine determinism: all hashing is md5 (string min over hex is a
valid min-wise hash ordering); integer hashes via base-16 parse of the
md5 prefix — both reproducible in DuckDB for the oracle gate.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from pg2any_spark.caching import managed_persist
from pg2any_spark.functions.exprs import eval_once

from pg2any_spark.operators.text import normalize_text, tokens as tokens_

DEFAULT_NUM_HASHES = 12
DEFAULT_BANDS = 4  # 12 hashes / 4 bands = 3 rows per band
SIMHASH_BITS = 32


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------


def exact_dedup(df: DataFrame, id_col: str, text_col: str = "text") -> DataFrame:
    """Keep the min-id row per exact (normalized) content fingerprint."""
    fp = F.md5(normalize_text(F.col(text_col))).alias("fingerprint")
    return (
        df.select(F.col(id_col), fp)
        .groupBy("fingerprint")
        .agg(F.min(id_col).alias(id_col))
        .select(id_col, "fingerprint")
    )


# ---------------------------------------------------------------------------
# shingling
# ---------------------------------------------------------------------------


def word_shingles(toks: Column, n: int = 3) -> Column:
    """Word n-gram shingles over a token array; texts shorter than n
    words yield one whole-text shingle.

    The token array is bound ONCE as a lambda variable (``transform``
    over a single-element array, the same trick as
    ``text.word_ngrams``) so every per-gram ``element_at`` and the
    short-text branch reference the bound variable. The previous form
    referenced the ``toks`` column directly from inside the transform
    lambdas, which the engine re-evaluated per reference once the
    projection collapsed into the Generate — measured 8.4× slower at
    sf0.1 (exploded corpus shingles 4.1 s → 0.5 s, identical rows; in
    ``dedup_containment`` the cached shingle build ran 4.1 s + 9.1 s
    PER TASK in the two codegen spans of the explode stage)."""

    def grams(t: Column) -> Column:
        idx = F.sequence(F.lit(1), F.size(t) - (n - 1))
        return F.transform(
            idx,
            lambda i: F.concat_ws(
                " ", *[F.element_at(t, i + j) for j in range(n)]
            ),
        )

    return F.element_at(
        F.transform(
            F.array(toks),
            lambda t: F.when(F.size(t) >= n, grams(t)).otherwise(
                F.array(F.concat_ws(" ", t))
            ),
        ),
        1,
    )


def exploded_shingles(
    df: DataFrame, id_col: str, text_col: str = "text", n: int = 3
) -> DataFrame:
    """(id, shingle) rows. Repartitions by id first: text corpora often
    arrive in few large files, and the explode is the CPU-heavy stage —
    spreading it across the cluster costs one cheap shuffle of raw
    text and removes the single-partition bottleneck."""
    spark = df.sparkSession
    return (
        df.repartition(spark.sparkContext.defaultParallelism, F.col(id_col))
        .select(
            F.col(id_col),
            F.split(F.trim(F.lower(F.col(text_col))), r"\s+").alias("__toks"),
        )
        .select(F.col(id_col), F.explode(word_shingles(F.col("__toks"), n)).alias("shingle"))
    )


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------


#: Largest prime below 2^32 — modulus for double-hash MinHash.
MINHASH_PRIME = 4_294_967_291


def minhash_signatures(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    num_hashes: int = DEFAULT_NUM_HASHES,
    shingle_n: int = 3,
) -> DataFrame:
    """One row per document with columns mh0..mh{k-1} (BIGINT).

    One md5 per shingle; the k min-wise hashes are Kirsch-Mitzenmacher
    combinations h_i = (h1 + i·h2) mod p of the digest's two 32-bit
    halves — k independent-enough permutations at 1/k the hashing
    cost, all map-side combinable, reproducible in any engine with md5
    and base-16 parsing.
    """
    sh = exploded_shingles(df, id_col, text_col, shingle_n)
    digest = F.md5(F.col("shingle"))
    # eval_once: the k min-aggregates below reference h1/h2 2k times;
    # without the barrier CollapseProject inlines the md5+conv chain
    # into every reference (measured 5.3 s → 0.8 s at sf0.1, identical
    # signatures).
    hashed = sh.select(
        F.col(id_col),
        eval_once(
            F.conv(F.substring(digest, 1, 8), 16, 10).cast("long")
        ).alias("h1"),
        eval_once(
            F.conv(F.substring(digest, 9, 8), 16, 10).cast("long")
        ).alias("h2"),
    )
    aggs = [
        F.min((F.col("h1") + F.lit(i) * F.col("h2")) % F.lit(MINHASH_PRIME)).alias(
            f"mh{i}"
        )
        for i in range(num_hashes)
    ]
    return hashed.groupBy(id_col).agg(*aggs)


def lsh_band_keys(
    sigs: DataFrame,
    id_col: str,
    num_hashes: int = DEFAULT_NUM_HASHES,
    bands: int = DEFAULT_BANDS,
) -> DataFrame:
    """(id, band_idx, band_key) — band key = md5 of its signature rows."""
    rows_per_band = num_hashes // bands
    entries = []
    for b in range(bands):
        cols = [f"mh{b * rows_per_band + j}" for j in range(rows_per_band)]
        entries.append(
            F.struct(
                F.lit(b).alias("band_idx"),
                F.md5(F.concat_ws("|", *cols)).alias("band_key"),
            )
        )
    return sigs.select(
        F.col(id_col), F.explode(F.array(*entries)).alias("band")
    ).select(id_col, "band.band_idx", "band.band_key")


def hot_band_keys(index: DataFrame, cap: int) -> DataFrame:
    """(band_idx, band_key, n_ids) for every band bucket with more than
    ``cap`` members — the boilerplate report that accompanies a capped
    LSH join, so a cap is never silent.

    By construction this table is tiny (a key needs > ``cap`` docs to
    appear), so callers can aggregate or even collect it: at web scale
    the hot keys are licence headers, cookie banners, and navigation
    boilerplate — template families, not document near-duplicates.
    """
    return (
        index.groupBy("band_idx", "band_key")
        .agg(F.count(F.lit(1)).alias("n_ids"))
        .filter(F.col("n_ids") > cap)
    )


def join_band_tables(
    probe: DataFrame,
    index: DataFrame,
    id_col: str,
    out_probe: str = "incoming_id",
    out_index: str = "corpus_id",
    index_lt_probe: bool = False,
    hot_key_cap: int | None = None,
) -> DataFrame:
    """The ONE (band_idx, band_key)-keyed equi-join all LSH matching
    paths share (batch self-join, incremental probe, streaming probe) —
    band-key semantics changes (skew hints, key-prefix columns) land
    here once.

    ``index_lt_probe=True`` is the self-join form: only pairs with
    index id < probe id survive (each unordered pair once, never a
    self-pair). ``False`` is the cross-probe form: ids must differ, so
    a document redelivered by an at-least-once source is never
    reported as a near-duplicate of itself.

    ``hot_key_cap`` is the structural defense against boilerplate band
    keys: a bucket shared by c documents emits O(c^2) pairs, and AQE
    skew-splitting only spreads that output over tasks — it cannot
    shrink it. A band key exceeding the cap is a template family
    (licence header, cookie banner), not a near-dup neighborhood, so
    BOTH join sides drop it before the join: the hot-key set is tiny
    by construction (count > cap each), aggregated from the index side
    and applied as a broadcast anti-join — one small shuffle, no
    corpus-sized state. Pair output per key is then bounded by cap^2.
    Callers MUST surface ``hot_band_keys(index, cap)`` alongside the
    capped pairs (see ``dedup_lsh_hot_cap``) — capping is a reported
    policy, never a silent truncation.
    """
    if hot_key_cap is not None:
        hot = F.broadcast(
            hot_band_keys(index, hot_key_cap).select("band_idx", "band_key")
        )
        index = index.join(hot, ["band_idx", "band_key"], "left_anti")
        probe = probe.join(hot, ["band_idx", "band_key"], "left_anti")
    cond = (F.col("i.band_idx") == F.col("x.band_idx")) & (
        F.col("i.band_key") == F.col("x.band_key")
    )
    if index_lt_probe:
        cond = cond & (F.col(f"x.{id_col}") < F.col(f"i.{id_col}"))
    else:
        cond = cond & (F.col(f"i.{id_col}") != F.col(f"x.{id_col}"))
    return (
        probe.alias("i")
        .join(index.alias("x"), cond)
        .select(
            F.col(f"i.{id_col}").alias(out_probe),
            F.col(f"x.{id_col}").alias(out_index),
        )
    )


def lsh_candidate_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    num_hashes: int = DEFAULT_NUM_HASHES,
    bands: int = DEFAULT_BANDS,
    shingle_n: int = 3,
    materialize: bool = True,
    hot_key_cap: int | None = None,
) -> DataFrame:
    """Distinct (id_a < id_b) pairs sharing ≥1 LSH band.

    The join is per (band_idx, band_key) bucket — never all-pairs.
    Skewed buckets (very common shingle sets) are handled by AQE's
    skew-join splitting at scale; ``hot_key_cap`` additionally drops
    buckets whose PAIR OUTPUT would be quadratic in members (see
    ``join_band_tables`` — report the dropped keys via
    ``hot_band_keys`` when capping).

    ``materialize=True`` persists the band-key table before the
    self-join. Catalyst does not reuse the exchange across the two
    join sides here (the shingle→md5→k-min pipeline — the expensive
    part — would execute twice; measured ~2× at sf0.1). The persisted
    table is tiny relative to the corpus (``bands`` short rows per
    document, no text), so MEMORY_AND_DISK is safe at any scale; the
    cache entry lives until the session drops it or the caller
    ``unpersist()``s the returned plan's source.
    """
    sigs = minhash_signatures(df, id_col, text_col, num_hashes, shingle_n)
    bands_df = lsh_band_keys(sigs, id_col, num_hashes, bands)
    if materialize:
        bands_df = managed_persist(bands_df)
    return (
        join_band_tables(
            bands_df, bands_df, id_col,
            out_probe="id_b", out_index="id_a", index_lt_probe=True,
            hot_key_cap=hot_key_cap,
        )
        .select("id_a", "id_b")
        .distinct()
    )


# ---------------------------------------------------------------------------
# incremental dedup against a persisted LSH index
# ---------------------------------------------------------------------------


def lsh_index(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    num_hashes: int = DEFAULT_NUM_HASHES,
    bands: int = DEFAULT_BANDS,
    shingle_n: int = 3,
) -> DataFrame:
    """(id, band_idx, band_key) index table for a corpus.

    This is the *stored artifact* incremental dedup joins new batches
    against: ``bands`` short rows per document, no text — a few
    hundred bytes/doc, so a 100 TB corpus indexes into low-TB parquet
    partitioned by ``band_key`` prefix. Built once, appended per
    ingest batch; never recomputed.
    """
    sigs = minhash_signatures(df, id_col, text_col, num_hashes, shingle_n)
    return lsh_band_keys(sigs, id_col, num_hashes, bands)


def incremental_lsh_matches(
    index: DataFrame,
    incoming: DataFrame,
    id_col: str,
    text_col: str = "text",
    num_hashes: int = DEFAULT_NUM_HASHES,
    bands: int = DEFAULT_BANDS,
    shingle_n: int = 3,
    hot_key_cap: int | None = None,
) -> DataFrame:
    """Near-dup matches of a NEW batch against an existing corpus index.

    Returns distinct ``(incoming_id, corpus_id)`` pairs sharing ≥1 LSH
    band. Only the incoming batch is shingled/hashed — per-batch cost
    is O(|batch|) + one join keyed on (band_idx, band_key), never a
    corpus re-scan and never all-pairs. This is the shape a continuous
    ingest pipeline needs: the index table is the accumulated state,
    each micro-batch probes it and then appends its own band keys
    (appending is idempotent for matching purposes — band rows are
    deterministic and matches are DISTINCT pairs). A document
    redelivered with the id it was indexed under is NOT reported as
    its own duplicate (ids must differ in the probe join).

    Skewed band buckets (boilerplate-heavy shingle sets) split via AQE
    skew-join handling, same as ``lsh_candidate_pairs``.
    """
    inc = lsh_index(incoming, id_col, text_col, num_hashes, bands, shingle_n)
    return join_band_tables(inc, index, id_col, hot_key_cap=hot_key_cap).distinct()


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


def _token_hash(tok: Column, bits: int = 32) -> Column:
    """``bits``-bit integer hash from the md5 hex prefix
    (cross-engine: DuckDB parses the same prefix). ``bits`` must be a
    multiple of 4 (whole hex chars) and ≤ 60 so the value fits a
    BIGINT with headroom."""
    if bits % 4 or not 0 < bits <= 60:
        raise ValueError(f"_token_hash: bits must be a multiple of 4 in 4..60, got {bits}")
    return F.conv(F.substring(F.md5(tok), 1, bits // 4), 16, 10).cast("long")


def simhash(
    df: DataFrame, id_col: str, text_col: str = "text", bits: int = SIMHASH_BITS
) -> DataFrame:
    """Per-document SimHash fingerprint over the token multiset.

    Exploded tokens → per-bit ±1 votes → ``bits`` map-side-combinable
    sums → fingerprint assembled from vote signs.

    ``bits`` sizes the SCALE CEILING of the downstream pigeonhole
    block join, not just the similarity resolution: blocking a
    ``bits``-bit fingerprint into ``d+1`` slices gives
    ``2^(bits/(d+1))`` possible keys per slice, and once the corpus
    outgrows that key space, bucket occupancy — and the verify join's
    pair count — grows linearly in corpus size (quadratic total work).
    32 bits / distance 3 saturates its 256-key slices around 10⁵ docs
    (measured on the 10× fixture); use 60 bits (32k keys per slice)
    for web-scale corpora — see ``dedup_simhash_wide_near_pairs``.
    """
    spark = df.sparkSession
    # eval_once: the ``bits`` vote sums below reference h once per bit;
    # without the barrier CollapseProject inlines the md5+conv token
    # hash into every vote expression — md5 re-ran 60× per token row
    # (measured 6.9 s → 1.0 s at sf0.1, identical fingerprints).
    toks = (
        df.repartition(spark.sparkContext.defaultParallelism, F.col(id_col))
        .select(
            F.col(id_col),
            F.explode(F.split(F.trim(F.lower(F.col(text_col))), r"\s+")).alias("tok"),
        )
        .withColumn("h", eval_once(_token_hash(F.col("tok"), bits=max(32, bits))))
    )
    votes = toks.groupBy(id_col).agg(
        *[
            F.sum(
                F.when(F.shiftright(F.col("h"), j).bitwiseAND(1) == 1, 1).otherwise(-1)
            ).alias(f"v{j}")
            for j in range(bits)
        ]
    )
    fp = None
    for j in range(bits):
        term = F.when(F.col(f"v{j}") > 0, F.lit(1 << j)).otherwise(F.lit(0))
        fp = term if fp is None else (fp + term)
    return votes.select(F.col(id_col), fp.cast("long").alias("simhash"))


def simhash_hamming_pairs(
    fps: DataFrame,
    id_col: str,
    max_distance: int = 3,
    materialize: bool = True,
    bits: int = 32,
) -> DataFrame:
    """Near-dup pairs by SimHash Hamming distance.

    Scale path: pigeonhole blocking + in-block verify — delegates to
    the generalized ``hamming_pairs`` over the ``simhash`` column
    (for the defaults, distance 3 over 32 bits, that is exactly 4
    disjoint 8-bit blocks). ``bits`` must match the width the
    fingerprints were built with (``simhash(..., bits=N)``): it sets
    the slice widths, hence the block-key cardinality that is the
    scale ceiling of the blocked join — a 60-bit fingerprint blocked
    as if 32-bit still returns the exact pair set (any 4 disjoint
    slices of ≤3 differing bits leave one slice clean), but keeps the
    narrow form's 256-key slice saturation instead of the 32,768-key
    resolution the width was chosen for. Delegation also fixes the
    former hardcoded-4-block form, which silently missed pairs for
    ``max_distance > 3`` (pigeonhole needs ``max_distance + 1``
    blocks)."""
    return hamming_pairs(
        fps, id_col, "simhash", bits=bits, max_distance=max_distance,
        materialize=materialize,
    )


# ---------------------------------------------------------------------------
# duplicate-group resolution (connected components over near-dup pairs)
# ---------------------------------------------------------------------------


def connected_components(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iter: int = 25,
) -> DataFrame:
    """Resolve near-dup *pairs* into duplicate *groups*: returns
    (id, component) where component = min id reachable in the pair
    graph. The step a dedup pipeline needs after LSH/SimHash pair
    generation — keeping one survivor per transitive group, not per
    pair (A~B, B~C must retire two of {A,B,C} even if A!~C).

    Algorithm: iterated min-label propagation. Each round every node
    takes the min label among itself and its neighbors; converges in
    O(graph diameter) rounds. Near-dup graphs are star-like (diameter
    2-4), so this beats the O(log n)-round large-star/small-star
    variant (Kiveris et al., "Connected Components in MapReduce")
    in practice while using the same shuffle primitives; each round is
    one shuffle join + one map-side-combinable min aggregate.

    Scale notes (100 TB): lineage is truncated every round with
    ``localCheckpoint`` (replace with a reliable checkpoint dir on a
    real cluster); convergence is detected with a count aggregate on
    the changed set, which AQE compiles to a near-free partial count.

    Raises ``RuntimeError`` if the loop exhausts ``max_iter`` rounds
    while labels are still moving — a silent early stop would return
    *wrong components* (a >max_iter-hop chain would split into several
    groups), which downstream dedup would act on. Graph diameter, not
    size, drives rounds: raise ``max_iter`` for pathological chains.
    """
    from pyspark import StorageLevel

    edges = pairs.select(
        F.col(id_a).alias("src"), F.col(id_b).alias("dst")
    ).unionByName(pairs.select(F.col(id_b).alias("src"), F.col(id_a).alias("dst")))
    # The edge table is STATIC across rounds — it needs reuse, not the
    # lineage truncation the per-round labels need. localCheckpoint
    # stores DESERIALIZED rows and unrolls whole partitions as Java
    # objects (MemoryStore.putIteratorAsValues), which OOMs an 8 GB
    # heap on clique-heavy graphs (measured: the 10× fixture's
    # replication cliques produce 31M pairs / 63M directed edges —
    # exactly the shape popular boilerplate creates at corpus scale).
    # A SERIALIZED spillable cache unrolls incrementally as bytes and
    # degrades to disk instead of dying.
    edges = managed_persist(
        edges.distinct(), StorageLevel.MEMORY_AND_DISK
    )
    edges.count()  # materialize once, before the iteration

    labels = (
        edges.select(F.col("src").alias("id"))
        .distinct()
        .select("id", F.col("id").alias("component"))
        .localCheckpoint(eager=True)
    )
    converged = False
    for _ in range(max_iter):
        neighbor_min = (
            edges.join(labels, edges.src == labels.id)
            .groupBy("dst")
            .agg(F.min("component").alias("nbr_min"))
        )
        new_labels = (
            labels.join(neighbor_min, labels.id == neighbor_min.dst, "left")
            .select(
                "id",
                F.least(
                    F.col("component"), F.coalesce(F.col("nbr_min"), F.col("component"))
                ).alias("component"),
                (F.col("nbr_min") < F.col("component")).alias("__changed"),
            )
            .localCheckpoint(eager=True)
        )
        n_changed = new_labels.filter(F.col("__changed")).limit(1).count()
        labels = new_labels.drop("__changed")
        if n_changed == 0:
            converged = True
            break
    if not converged:
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} rounds; "
            "labels are still propagating (chain longer than max_iter hops). "
            "Returning now would yield wrong duplicate groups — raise "
            "max_iter or pre-split the graph."
        )
    return labels


def dup_groups(pairs: DataFrame) -> DataFrame:
    """Group-level dedup summary: one row per duplicate group (size
    >= 2) with the canonical survivor (min id), member count, and max
    member id. Singleton documents (no near-dup pair) are not groups."""
    cc = connected_components(pairs)
    return (
        cc.groupBy("component")
        .agg(
            F.count(F.lit(1)).alias("group_size"),
            F.max("id").alias("max_member_id"),
        )
        .select(
            F.col("component").alias("group_id"),
            "group_size",
            "max_member_id",
        )
    )


# ---------------------------------------------------------------------------
# n-gram Jaccard (exact verify for candidate pairs)
# ---------------------------------------------------------------------------


def ngram_jaccard(
    corpus: DataFrame,
    pairs: DataFrame,
    id_col: str,
    text_col: str = "text",
    n: int = 3,
    materialize: bool = True,
) -> DataFrame:
    """Exact Jaccard similarity of distinct shingle sets for each
    (id_a, id_b) pair. Joins shingle sets only for candidate pairs —
    the verify stage after LSH, not an all-pairs scan.

    ``materialize=True`` persists the distinct-shingle table, which
    this plan consumes three times (both join sides + set sizes);
    without it the explode/distinct pipeline runs 3×. Shingle rows ≈
    corpus tokens, so this is the one cache here that is NOT small —
    MEMORY_AND_DISK spills gracefully, and at 100 TB the verify stage
    should anyway run on the candidate-pair *subset* of the corpus
    (join ``corpus`` to the pair ids first), keeping the cached set
    proportional to candidates, not the corpus.
    """
    sh = exploded_shingles(corpus, id_col, text_col, n).distinct()
    if materialize:
        sh = managed_persist(sh)
    sizes = sh.groupBy(id_col).agg(F.count("*").alias("set_size"))
    a = sh.select(F.col(id_col).alias("id_a"), "shingle")
    b = sh.select(F.col(id_col).alias("id_b"), F.col("shingle").alias("shingle"))
    inter = (
        pairs.join(a, "id_a")
        .join(b, ["id_b", "shingle"])
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("n_inter"))
    )
    sa = sizes.select(F.col(id_col).alias("id_a"), F.col("set_size").alias("size_a"))
    sb = sizes.select(F.col(id_col).alias("id_b"), F.col("set_size").alias("size_b"))
    return (
        pairs.join(inter, ["id_a", "id_b"], "left")
        .join(sa, "id_a")
        .join(sb, "id_b")
        .select(
            "id_a",
            "id_b",
            F.round(
                F.coalesce(F.col("n_inter"), F.lit(0))
                / (F.col("size_a") + F.col("size_b") - F.coalesce(F.col("n_inter"), F.lit(0))),
                6,
            ).alias("jaccard"),
        )
    )


def lexical_semantic_agreement(
    corpus: DataFrame,
    num_hashes: int = 12,
    bands: int = 4,
    threshold: float = 0.95,
) -> DataFrame:
    """Agreement between lexical (MinHash-LSH) and semantic
    (embedding-cosine) near-dup detection over a planted-pair corpus
    (``sources.cdc_gen.synth_paired_neardup_corpus``: columns id,
    orig_id, variant, text, embedding; ids disjoint by construction).

    For each planted (original, variant) pair, flags whether the LSH
    candidate join surfaces it and whether the embedding cosine clears
    ``threshold``, then aggregates per variant class (+ an ``all``
    rollup row): pair counts, per-detector counts, and the Jaccard of
    the two detectors' pair sets. This is the dedup-strategy QA report
    a training-data pipeline runs before choosing its dedup stack —
    lexical misses paraphrases, semantic misses meaning-flips; the
    numbers say how much.

    Cost shape: LSH is the bucketed band join (never all-pairs); the
    semantic check is pair-restricted (|planted| rows); the rollup is
    a tiny aggregate. Scales like the LSH operator itself.
    """
    from pg2any_spark.operators.similarity import cosine

    lex = lsh_candidate_pairs(
        corpus.select("id", "text"), "id", "text",
        num_hashes=num_hashes, bands=bands,
    ).withColumn("lexical", F.lit(1))
    planted = corpus.filter(F.col("variant") != "orig").select(
        "orig_id",
        F.col("id").alias("id_b"),
        "variant",
        F.col("embedding").alias("emb_b"),
    )
    # join on the explicit orig_id — the original's corpus id comes
    # from ITS row, so nothing here depends on the id encoding
    orig = corpus.filter(F.col("variant") == "orig").select(
        "orig_id",
        F.col("id").alias("id_a"),
        F.col("embedding").alias("emb_a"),
    )
    flags = (
        planted.join(orig, "orig_id")
        .withColumn(
            "semantic",
            (F.round(cosine(F.col("emb_a"), F.col("emb_b")), 6)
             >= threshold).cast("int"),
        )
        .join(lex.select("id_a", "id_b", "lexical"), ["id_a", "id_b"], "left")
        .withColumn("lexical", F.coalesce("lexical", F.lit(0)))
    )
    agg = flags.rollup("variant").agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.sum("lexical").alias("n_lexical"),
        F.sum("semantic").alias("n_semantic"),
        F.sum(F.col("lexical") * F.col("semantic")).alias("n_both"),
    )
    union_sz = F.col("n_lexical") + F.col("n_semantic") - F.col("n_both")
    return agg.select(
        F.coalesce("variant", F.lit("all")).alias("variant"),
        "n_pairs", "n_lexical", "n_semantic", "n_both",
        F.when(union_sz > 0,
               F.round(F.col("n_both").cast("double") / union_sz, 6))
        .alias("pair_jaccard"),
    ).orderBy("variant")


# ---------------------------------------------------------------------------
# C4-style cross-document line dedup
# ---------------------------------------------------------------------------


def doc_line_table(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    words_per_line: int = 10,
) -> DataFrame:
    """(id, pos, line) pseudo-line table: consecutive
    ``words_per_line``-token chunks of each document, in order.

    Web corpora carry real newlines; the fixture text does not, so the
    line structure is derived deterministically from token positions —
    the downstream dedup is line-representation-agnostic (feed it real
    ``split(text, '\\n')`` lines in production). Pure projection +
    explode, no shuffle."""
    w = words_per_line
    base = df.filter(F.trim(F.col(text_col)) != "").select(
        F.col(id_col), tokens_(F.col(text_col)).alias("__t")
    )
    # ceil(n/w) as pure integer arithmetic — (n + w−1) div w — so no
    # float division exists anywhere in line construction (round-7
    # determinism rule; the oracle uses idx // w, same integer family)
    n_lines = F.expr(f"CAST((size(__t) + {w - 1}) DIV {w} AS INT)")
    gram = lambda i: F.concat_ws(" ", F.slice(F.col("__t"), i * w + 1, w))  # noqa: E731
    return base.select(
        F.col(id_col),
        F.posexplode(F.transform(F.sequence(F.lit(0), n_lines - 1), gram)).alias(
            "pos", "line"
        ),
    ).select(id_col, "pos", "line")


def line_dedup(lines: DataFrame, id_col: str, line_col: str = "line") -> DataFrame:
    """C4-style cross-document line dedup: a line occurring in more
    than one document survives only in the minimum-id document (the
    deterministic stand-in for "first crawled"); every other
    occurrence is marked ``kept=false``.

    Scale shape: owner resolution is a map-side-combinable ``min``
    aggregate over line fingerprints — the shuffle carries one row per
    DISTINCT line — and the verdict join is keyed on the fingerprint
    with exactly one owner row per key, so a boilerplate footer
    repeated in a billion documents costs a billion JOIN ROWS (linear,
    AQE-splittable skew), never a pair explosion. Text never shuffles
    twice: the fingerprint is 32 hex chars regardless of line length.
    """
    # Both the owners aggregate and the verdict join traverse the
    # fingerprinted line table; unpersisted, each re-ran the line
    # construction (explode + md5 over every document — the plan
    # scanned the corpus 4×: 2 traversals × the 2-branch line union).
    with_fp = managed_persist(
        lines.withColumn("__fp", F.md5(F.col(line_col)))
    )
    owners = with_fp.groupBy("__fp").agg(F.min(id_col).alias("__owner"))
    return (
        with_fp.join(owners, "__fp")
        .withColumn("kept", F.col(id_col) == F.col("__owner"))
        .drop("__fp", "__owner")
    )


# ---------------------------------------------------------------------------
# repeated-span (substring-level) dedup
# ---------------------------------------------------------------------------


def repeated_span_report(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    k: int = 10,
) -> DataFrame:
    """Per-document repeated-SPAN report: maximal runs of token
    positions whose ``k``-gram occurs more than once in the corpus —
    the span/substring-level dedup mode (the "exact substring"
    formulation popularized for LM training data), approximated on
    k-gram granularity so it stays a groupBy, not a suffix array.

    Returns (id, n_tokens, n_dup_spans, dup_token_frac,
    longest_span_tokens); docs shorter than ``k`` tokens report zero
    spans.

    Scale shape: one explode to (id, pos, gram); occurrence counts are
    a map-side-combinable aggregate shuffling ONE row per distinct
    gram; marked positions come back via a semi-join on the gram text
    (skewed boilerplate grams split under AQE — fan-out is linear in
    occurrence count, the span merge is per-document). Runs merge with
    a gaps-and-islands pass (lag + running sum over one per-document
    sort) — no self-join, no quadratic pair output at any duplication
    density. Two marked positions whose k-token windows overlap or
    touch (gap <= k) fold into ONE span, so covered-token counts are
    a true UNION — ``dup_token_frac`` can never exceed 1.0 (a plain
    unit-gap island rule double-counts overlapping windows).
    """
    from pyspark.sql import Window

    from pg2any_spark.operators.text import token_count, word_ngrams

    base = df.select(
        F.col(id_col), F.col(text_col), token_count(F.col(text_col)).alias("__n")
    )
    grams = base.select(
        F.col(id_col),
        F.posexplode(word_ngrams(F.col(text_col), k)).alias("pos", "gram"),
    ).filter(F.col("gram") != "")
    dup = (
        grams.groupBy("gram")
        .agg(F.count(F.lit(1)).alias("__c"))
        .filter(F.col("__c") >= 2)
        .select("gram")
    )
    marked = grams.join(dup, "gram", "left_semi")
    w = Window.partitionBy(id_col).orderBy("pos")
    islands = (
        marked.withColumn(
            "__new",
            F.when(
                F.col("pos") - F.lag("pos").over(w) > F.lit(k), 1
            ).otherwise(0),
        )
        .withColumn(
            "__isl",
            F.sum("__new").over(
                w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ),
        )
        .groupBy(id_col, "__isl")
        .agg(
            (F.max("pos") - F.min("pos") + F.lit(k)).alias("__covered"),
        )
    )
    per_doc = islands.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_dup_spans"),
        F.sum("__covered").alias("__cov"),
        F.max("__covered").alias("longest_span_tokens"),
    )
    return (
        base.join(per_doc, id_col, "left")
        .select(
            F.col(id_col),
            F.col("__n").alias("n_tokens"),
            F.coalesce("n_dup_spans", F.lit(0)).alias("n_dup_spans"),
            F.round(
                F.coalesce(F.col("__cov"), F.lit(0))
                / F.greatest(F.col("__n"), F.lit(1)).cast("double"),
                6,
            ).alias("dup_token_frac"),
            F.coalesce("longest_span_tokens", F.lit(0)).cast("int").alias(
                "longest_span_tokens"
            ),
        )
    )


def hamming_pairs(
    fps: DataFrame,
    id_col: str,
    fp_col: str,
    bits: int,
    max_distance: int,
    materialize: bool = True,
) -> DataFrame:
    """Generalized blocked Hamming near-pair search: block on
    ``max_distance + 1`` disjoint CONTIGUOUS bit-slices — any pair
    within the distance agrees exactly on at least one slice
    (pigeonhole) — then verify the exact distance inside blocks.
    Slices partition ``[0, bits)`` as ``[i·bits/n, (i+1)·bits/n)``
    (variable widths), so no slice can run past the fingerprint and
    degenerate into an always-equal key (a fixed ceil width would,
    e.g. bits=4 / distance=2, turning the blocked join into the
    all-pairs scan it exists to avoid). The fingerprint must fit
    ``bits`` LOW bits of a BIGINT with the sign bit clear (≤ 63), and
    ``bits`` must be ≥ ``max_distance + 1`` so every slice is
    non-empty."""
    if not 0 < bits <= 63:
        raise ValueError(f"hamming_pairs: bits must be in 1..63, got {bits}")
    n_blocks = max_distance + 1
    if bits < n_blocks:
        raise ValueError(
            f"hamming_pairs: need bits >= max_distance + 1 "
            f"({bits} < {n_blocks}) for non-empty pigeonhole blocks"
        )
    # Blocking is ONE pass over ``fps`` — an explode of the ≤(d+1)-entry
    # (block_idx, block_key) struct array — never a union of per-block
    # branches: a union re-evaluates the ENTIRE upstream lineage once
    # per block (the fingerprints here are the expensive part — a
    # 60-agg SimHash reduce or an Arrow-batched image decode), which
    # the round-11 plan audit measured as 7 duplicated ArrowEvalPython
    # pipelines in ``media_phash_near_dup`` and 4 duplicated 60-column
    # aggregates in ``dedup_simhash_wide_near_pairs``. Same rows out,
    # exactly one evaluation of the fingerprint plan per input row.
    entries = []
    for blk in range(n_blocks):
        lo = blk * bits // n_blocks
        hi = (blk + 1) * bits // n_blocks
        key = F.shiftright(F.col(fp_col), lo).bitwiseAND((1 << (hi - lo)) - 1)
        entries.append(
            F.struct(
                F.lit(blk).alias("block_idx"),
                key.cast("long").alias("block_key"),
            )
        )
    blocked = fps.select(
        F.col(id_col),
        F.col(fp_col),
        F.explode(F.array(*entries)).alias("__blk"),
    ).select(
        F.col(id_col),
        F.col(fp_col),
        F.col("__blk.block_idx").alias("block_idx"),
        F.col("__blk.block_key").alias("block_key"),
    )
    if materialize:
        blocked = managed_persist(blocked)
    a, b = blocked.alias("a"), blocked.alias("b")
    dist = F.bit_count(F.col(f"a.{fp_col}").bitwiseXOR(F.col(f"b.{fp_col}")))
    return (
        a.join(
            b,
            (F.col("a.block_idx") == F.col("b.block_idx"))
            & (F.col("a.block_key") == F.col("b.block_key"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            dist.alias("hamming"),
        )
        .filter(F.col("hamming") <= max_distance)
        .distinct()
    )


# ---------------------------------------------------------------------------
# exact-substring dedup (Lee et al. 2022 "Deduplicating Training Data
# Makes Language Models Better", the ExactSubstr mode) — distributed
# seed-and-chain approximation of the suffix-array longest-repeat scan
# ---------------------------------------------------------------------------


def _exact_substr_grams(
    df: DataFrame, id_col: str, text_col: str, k: int
) -> DataFrame:
    """(id, pos, h): md5 of each positional k-gram. The hash is taken
    immediately after the gram string is formed, so only 32-byte
    digests enter any shuffle — never the ~6·k-char gram text.

    Repartitions by id first (round-11, guide §2.5 input skew — the
    same rationale as ``exploded_shingles``): text corpora arrive in
    few large files, and the gram+md5 expansion is the CPU-dominant
    stage of the ExactSubstr family; without the spread it ran as a
    single 6.4 s task at sf0.1 (one scan split), leaving 31 cores
    idle. The shuffle moves raw text once; everything downstream reads
    the cached digest table."""
    from pg2any_spark.operators.text import word_ngrams

    spark = df.sparkSession
    return (
        df.repartition(spark.sparkContext.defaultParallelism, F.col(id_col))
        .select(
            F.col(id_col),
            F.posexplode(word_ngrams(F.col(text_col), k)).alias("pos", "gram"),
        )
        .select(id_col, "pos", F.md5("gram").alias("h"))
    )


def exact_substring_spans(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    k: int = 25,
    min_len: int = 50,
    max_occ: int = 8,
) -> DataFrame:
    """TRUE exact repeated substrings of ≥ ``min_len`` tokens between
    document pairs — the ExactSubstr dedup criterion, distributed.

    ``repeated_span_report`` (the k-gram COVERAGE report) unions
    duplicate evidence across all partners, so a document whose
    positions are covered by k-grams duplicated against DIFFERENT
    sources chains into one long "span" that repeats nowhere as a
    whole. This operator instead chains anchors per occurrence PAIR on
    the match DIAGONAL — the seed-and-extend identity from sequence
    alignment: occurrences (A, p) and (B, q) of the same k-gram lie on
    diagonal ``p − q``; two anchors on the same (A, B, diagonal) whose
    positions differ by ≤ k overlap-or-touch, and a maximal chain of
    such anchors covering [p_min, p_max + k − 1] is EXACTLY a repeated
    substring (every position is inside some matching k-gram aligned
    at the same offset). A suffix array finds the same spans on one
    node; the anchor chain is the shuffle-native form, exact for every
    repeat of length ≥ k (spans between min_len and k cannot occur
    since min_len ≥ k; repeats shorter than k are invisible — the
    standard ExactSubstr threshold semantics).

    Returns one row per (id_a, id_b) pair — cross-document with
    id_a < id_b, within-document with id_a = id_b and the earlier
    occurrence as the chain position — carrying ``n_spans``,
    ``longest_span`` and ``span_tokens`` (token lengths of the maximal
    spans ≥ min_len).

    Scale shape: gram hashes aggregate map-side to one row per
    distinct hash; eligible hashes (2 ≤ occurrences ≤ ``max_occ``)
    semi-join back; the pair join is per-hash bounded at
    ``max_occ·(max_occ−1)/2`` — NEVER quadratic in corpus size.
    Ultra-frequent grams (site boilerplate — the same pathology
    ``lsh_candidate_pairs`` caps with ``hot_key_cap``) are DROPPED by
    the cap, which is also what the reference ExactSubstr
    implementation effectively does by deduplicating the most frequent
    repeats first; ``exact_substring_hot_grams`` is the mandatory
    companion report of how many hashes the cap silenced. The chain
    merge is gaps-and-islands per (pair, diagonal) — windows
    partitioned by pair, no global sort anywhere.
    """
    from pyspark.sql import Window

    # NOT persisted (round-11 batch-7 rule, re-measured session 2):
    # the gram pipeline is traversed by the eligible-hash aggregate
    # and BOTH self-join sides, but all three consumers sit in ONE
    # action over a byte-identical scan→gram→Exchange subtree, so AQE
    # shuffle-stage reuse runs the posexplode+md5 map side once and
    # each consumer replays the map output; the cache materialization
    # both duplicated that work and pinned the cached partitioning
    # (persist-on vs persist-off measured 1.80 vs 1.49 s for
    # dedup_exact_substring, 1.08 vs 0.78 s for the excise twin,
    # identical results). Same reasoning for ``eligible`` below.
    grams = _exact_substr_grams(df, id_col, text_col, k)
    eligible = (
        grams.groupBy("h")
        .agg(F.count(F.lit(1)).alias("__c"))
        .filter((F.col("__c") >= 2) & (F.col("__c") <= max_occ))
        .select("h")
    )
    ge = grams.join(eligible, "h", "left_semi")
    a = ge.select(
        F.col("h"), F.col(id_col).alias("id_a"), F.col("pos").alias("pa")
    )
    b = ge.select(
        F.col("h").alias("__hb"), F.col(id_col).alias("id_b"),
        F.col("pos").alias("pb"),
    )
    pairs = a.join(
        b,
        (F.col("h") == F.col("__hb"))
        & (
            (F.col("id_a") < F.col("id_b"))
            | ((F.col("id_a") == F.col("id_b")) & (F.col("pa") < F.col("pb")))
        ),
    ).select("id_a", "id_b", "pa", (F.col("pa") - F.col("pb")).alias("diag"))
    w = Window.partitionBy("id_a", "id_b", "diag").orderBy("pa")
    spans = (
        pairs.withColumn(
            "__new",
            F.when(F.col("pa") - F.lag("pa").over(w) > F.lit(k), 1).otherwise(0),
        )
        .withColumn(
            "__isl",
            F.sum("__new").over(
                w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ),
        )
        .groupBy("id_a", "id_b", "diag", "__isl")
        .agg((F.max("pa") - F.min("pa") + F.lit(k)).alias("__len"))
        .filter(F.col("__len") >= min_len)
    )
    return (
        spans.groupBy("id_a", "id_b")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_spans"),
            F.max("__len").cast("long").alias("longest_span"),
            F.sum("__len").cast("long").alias("span_tokens"),
        )
        .orderBy("id_a", "id_b")
    )


def exact_substring_hot_grams(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    k: int = 25,
    max_occ: int = 8,
) -> DataFrame:
    """Mandatory companion report for ``exact_substring_spans``: how
    many distinct k-gram hashes the occurrence cap dropped, and the
    total occurrences they carried — the operator's coverage loss made
    visible instead of silent (same convention as ``hot_band_keys``)."""
    grams = _exact_substr_grams(df, id_col, text_col, k)
    counts = grams.groupBy("h").agg(F.count(F.lit(1)).alias("__c"))
    return counts.agg(
        F.sum((F.col("__c") > max_occ).cast("long"))
        .cast("long")
        .alias("n_hot_grams"),
        F.sum(
            F.when(F.col("__c") > max_occ, F.col("__c")).otherwise(F.lit(0))
        )
        .cast("long")
        .alias("hot_occurrences"),
        F.sum(
            ((F.col("__c") >= 2) & (F.col("__c") <= max_occ)).cast("long")
        )
        .cast("long")
        .alias("n_eligible_grams"),
    )


def exact_substring_excise(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    k: int = 25,
    min_len: int = 50,
    max_occ: int = 8,
) -> DataFrame:
    """ExactSubstr DEDUP, not just detection: excise the LATER
    occurrence of every exact repeated substring ≥ ``min_len`` tokens
    (Lee et al. 2022 remove duplicated spans rather than documents —
    the half of the method ``exact_substring_spans`` reports on).

    "Later" is the deterministic total order the span finder already
    imposes: in a pair the occurrence in ``id_b`` (id_a < id_b, or the
    higher position within one document). Excision is computed against
    the ORIGINAL corpus in one pass — the standard single-pass
    approximation of cluster-wise all-but-one removal (a chain
    A→B→C excises B's and C's copies independently; both go, the
    difference is only which donor each is attributed to).

    Returns one row per document: ``n_tokens`` (original),
    ``kept_tokens``, ``excised_tokens``, ``n_excised_spans`` (merged
    covered intervals) and ``kept_digest`` (md5 of the kept token
    stream in position order; md5('') =
    d41d8cd98f00b204e9800998ecf8427e for a fully-excised document,
    matching the oracle) — the digest
    makes the excised text itself, not just its size, cross-engine
    checkable.

    Scale shape: everything up to the span islands is
    ``exact_substring_spans``; the b-side intervals then merge with a
    per-document gaps-and-islands window, and kept positions come from
    one per-document range join (position BETWEEN interval bounds —
    equi on the document id, interval count per doc bounded by
    spans). The digest is one ordered aggregation per document. No
    stage exceeds per-document work; no global sort.
    """
    from pyspark.sql import Window

    from pg2any_spark.operators.text import tokens

    # NOT persisted — same batch-7 re-measurement as
    # exact_substring_spans: all gram/eligible consumers share one
    # action and byte-identical scan→Exchange subtrees, so AQE
    # shuffle-stage reuse covers them (persist-on vs -off measured
    # 1.08 vs 0.78 s for the excise query, identical results).
    grams = _exact_substr_grams(df, id_col, text_col, k)
    eligible = (
        grams.groupBy("h")
        .agg(F.count(F.lit(1)).alias("__c"))
        .filter((F.col("__c") >= 2) & (F.col("__c") <= max_occ))
        .select("h")
    )
    ge = grams.join(eligible, "h", "left_semi")
    a = ge.select(
        F.col("h"), F.col(id_col).alias("id_a"), F.col("pos").alias("pa")
    )
    b = ge.select(
        F.col("h").alias("__hb"), F.col(id_col).alias("id_b"),
        F.col("pos").alias("pb"),
    )
    pairs = a.join(
        b,
        (F.col("h") == F.col("__hb"))
        & (
            (F.col("id_a") < F.col("id_b"))
            | ((F.col("id_a") == F.col("id_b")) & (F.col("pa") < F.col("pb")))
        ),
    ).select("id_a", "id_b", "pa", (F.col("pa") - F.col("pb")).alias("diag"))
    w = Window.partitionBy("id_a", "id_b", "diag").orderBy("pa")
    ex = (
        pairs.withColumn(
            "__new",
            F.when(F.col("pa") - F.lag("pa").over(w) > F.lit(k), 1).otherwise(0),
        )
        .withColumn(
            "__isl",
            F.sum("__new").over(
                w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ),
        )
        .groupBy("id_a", "id_b", "diag", "__isl")
        .agg(
            (F.min("pa") - F.col("diag")).alias("s"),
            (F.max("pa") - F.col("diag") + F.lit(k) - 1).alias("e"),
            (F.max("pa") - F.min("pa") + F.lit(k)).alias("__len"),
        )
        .filter(F.col("__len") >= min_len)
        .select(F.col("id_b").alias("__id"), "s", "e")
    )
    # merge overlapping/adjacent excision intervals per document
    wd = Window.partitionBy("__id").orderBy("s", "e")
    prev_max_e = F.max("e").over(
        wd.rowsBetween(Window.unboundedPreceding, -1)
    )
    # cov is traversed by both the kept-position anti-join and the
    # n_excised_spans count, but both consumers sit in one action and
    # the pairs-join map stages are byte-identical, so AQE
    # shuffle-stage reuse covers the re-print the static plan shows
    # (18 SortMergeJoins in plan TEXT ≠ 18 executions); the persist
    # measured net-slower (batch-7 re-measurement, excise 1.08 vs
    # 0.78 s with all three caches removed).
    cov = (
        ex.withColumn(
            "__new",
            F.when(
                F.col("s") > F.coalesce(prev_max_e, F.lit(-2)) + 1, 1
            ).otherwise(0),
        )
        .withColumn(
            "__isl",
            F.sum("__new").over(
                wd.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ),
        )
        .groupBy("__id", "__isl")
        .agg(F.min("s").alias("cs"), F.max("e").alias("ce"))
    )
    tokpos = df.select(
        F.col(id_col),
        F.posexplode(
            F.when(F.trim(F.col(text_col)) == "", F.array().cast("array<string>"))
            .otherwise(tokens(F.col(text_col)))
        ).alias("pos", "tok"),
    )
    kept = tokpos.join(
        cov,
        (tokpos[id_col] == cov["__id"])
        & (F.col("pos") >= F.col("cs"))
        & (F.col("pos") <= F.col("ce")),
        "left_anti",
    )
    per_doc_kept = kept.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("long").alias("kept_tokens"),
        F.md5(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct(F.col("pos"), F.col("tok")))
                    ),
                    lambda x: x["tok"],
                ),
                " ",
            )
        ).alias("kept_digest"),
    )
    n_spans = cov.groupBy(F.col("__id").alias(id_col)).agg(
        F.count(F.lit(1)).cast("long").alias("n_excised_spans")
    )
    # n_tokens needs no explode or shuffle: it is size(tokens(text))
    # per document row. The former groupBy over tokpos re-ran the
    # corpus token posexplode (a second full scan) to count what the
    # un-exploded array already knows. Row membership is identical:
    # tokpos emits no rows for trim-empty/NULL text, so those docs
    # were absent from base — the filter reproduces that exactly.
    base = df.filter(F.trim(F.col(text_col)) != "").select(
        F.col(id_col),
        F.size(tokens(F.col(text_col))).cast("long").alias("n_tokens"),
    )
    return (
        base.join(per_doc_kept, id_col, "left")
        .join(n_spans, id_col, "left")
        .select(
            F.col(id_col),
            "n_tokens",
            F.coalesce("kept_tokens", F.lit(0)).cast("long").alias("kept_tokens"),
            (F.col("n_tokens") - F.coalesce("kept_tokens", F.lit(0)))
            .cast("long")
            .alias("excised_tokens"),
            F.coalesce("n_excised_spans", F.lit(0))
            .cast("long")
            .alias("n_excised_spans"),
            F.coalesce(
                "kept_digest", F.md5(F.lit(""))
            ).alias("kept_digest"),
        )
        .orderBy(id_col)
    )


def containment_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    n: int = 3,
    max_df: int = 8,
    min_overlap_pct: int = 80,
) -> DataFrame:
    """Asymmetric near-dup detection by the OVERLAP COEFFICIENT
    (containment of the smaller shingle set: |A∩B| / min(|A|,|B|)) —
    the case Jaccard-keyed dedup structurally misses: a short document
    swallowed by a long one (quote pages, wrapper boilerplate around a
    syndicated article) has Jaccard ≈ |small|/|large| ≈ 0 but
    containment ≈ 1. MinHash-LSH bands approximate JACCARD, so such
    pairs never band-collide either; candidates here come instead from
    shared RARE shingles (2 ≤ document frequency ≤ ``max_df``) — any
    pair with high containment of a non-boilerplate document shares
    many rare shingles, and the df cap bounds the pair fan-out at
    C(max_df, 2) per shingle, the same guardrail shape as
    ``exact_substring_spans``. Exact verify then counts the full
    intersection for candidates only (candidate-proportional, never
    all-pairs).

    Returns (id_a, id_b, n_inter, size_a, size_b, overlap_c6,
    jaccard_c6) for pairs with overlap ≥ ``min_overlap_pct``% — the
    threshold compares as pure BIGINT cross-multiplication, and both
    scaled ratios are floored integer divisions (BIGINT-exact on any
    engine).

    The df cap is POLICY, and ``containment_hot_shingles`` is its
    mandatory companion report (``hot_band_keys`` convention): a
    boilerplate-wrapped pair whose every shared shingle is hot never
    surfaces here, and the report makes that coverage loss visible
    instead of silent.
    """
    # sh is NOT persisted (round-11 batch-7 re-measurement): its four
    # consumers (rare, both candidate-join sides, sets) live in one
    # action over a byte-identical explode→distinct subtree, which AQE
    # shuffle-stage reuse runs once; the cache measured net-slower
    # (dedup_containment 3.12 s persisted vs 2.20 s without, identical
    # pairs).
    sh = exploded_shingles(df, id_col, text_col, n).distinct()
    rare = (
        sh.groupBy("shingle")
        .agg(F.count(F.lit(1)).alias("__df"))
        .filter((F.col("__df") >= 2) & (F.col("__df") <= max_df))
        .select("shingle")
    )
    shr = sh.join(rare, "shingle", "left_semi")
    cand = (
        shr.select(F.col(id_col).alias("id_a"), "shingle")
        .join(
            shr.select(
                F.col(id_col).alias("id_b"),
                F.col("shingle").alias("__shb"),
            ),
            (F.col("shingle") == F.col("__shb"))
            & (F.col("id_a") < F.col("id_b")),
        )
        .select("id_a", "id_b")
        .distinct()
    )
    # Exact verify by in-row set intersection (round-11 optimization,
    # guide §2.3/§2.4): each doc's distinct-shingle set is collected
    # ONCE (the same groupBy(id) pass that previously produced only
    # set_size now also carries the array), candidate pairs attach both
    # arrays by two id-keyed joins, and |A∩B| is a single
    # array_intersect per pair. The former row-level form expanded each
    # pair by all of doc a's shingles, shuffled that widest
    # intermediate by (id_b, shingle) for the matching join, then paid
    # a third exchange to re-aggregate per pair — three corpus-scale
    # exchanges and a giant hash aggregate replaced by joins that move
    # each candidate doc's set once per pair it appears in. Arrays are
    # per-document and documents are bounded (the same bound the
    # row-expansion relied on), and sh is distinct per (id, shingle) so
    # size(array_intersect) counts exactly the rows the aggregate did.
    sets = sh.groupBy(id_col).agg(
        F.collect_list("shingle").alias("__set"),
        F.count(F.lit(1)).alias("set_size"),
    )
    inter = (
        cand.join(
            sets.select(
                F.col(id_col).alias("id_a"),
                F.col("__set").alias("__sa"),
                F.col("set_size").alias("size_a"),
            ),
            "id_a",
        )
        .join(
            sets.select(
                F.col(id_col).alias("id_b"),
                F.col("__set").alias("__sb"),
                F.col("set_size").alias("size_b"),
            ),
            "id_b",
        )
        .withColumn(
            "n_inter",
            F.size(F.array_intersect("__sa", "__sb")).cast("long"),
        )
        .drop("__sa", "__sb")
    )
    mn = F.least(F.col("size_a"), F.col("size_b"))
    return (
        inter
        .filter(F.col("n_inter") * 100 >= mn * min_overlap_pct)
        .select(
            "id_a",
            "id_b",
            "n_inter",
            F.col("size_a").cast("long").alias("size_a"),
            F.col("size_b").cast("long").alias("size_b"),
            F.expr("CAST(n_inter * 1000000 AS BIGINT) DIV least(size_a, size_b)")
            .cast("long")
            .alias("overlap_c6"),
            F.expr(
                "CAST(n_inter * 1000000 AS BIGINT) DIV "
                "(size_a + size_b - n_inter)"
            )
            .cast("long")
            .alias("jaccard_c6"),
        )
        .orderBy("id_a", "id_b")
    )


def containment_hot_shingles(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    n: int = 3,
    max_df: int = 8,
) -> DataFrame:
    """Mandatory companion report for ``containment_pairs``: how many
    distinct shingles the document-frequency cap (df > ``max_df``)
    excluded from candidate generation, the occurrence mass they
    carried, and the eligible-shingle count — the operator's coverage
    loss made visible instead of silent (same convention as
    ``hot_band_keys`` / ``exact_substring_hot_grams``; a cap is policy,
    never silent truncation). One row."""
    sh = exploded_shingles(df, id_col, text_col, n).distinct()
    counts = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("__df"))
    return counts.agg(
        F.sum((F.col("__df") > max_df).cast("long"))
        .cast("long")
        .alias("n_hot_shingles"),
        F.sum(
            F.when(F.col("__df") > max_df, F.col("__df")).otherwise(F.lit(0))
        )
        .cast("long")
        .alias("hot_occurrences"),
        F.sum(
            ((F.col("__df") >= 2) & (F.col("__df") <= max_df)).cast("long")
        )
        .cast("long")
        .alias("n_eligible_shingles"),
    )
