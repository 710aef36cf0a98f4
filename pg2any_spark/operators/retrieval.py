"""Full-text retrieval over the document corpus: inverted-index
postings and Okapi BM25 top-k ranking.

The shape mirrors what a training-data pipeline needs from retrieval
(targeted corpus probes, contamination look-ups, eval-set neighbor
audits) re-expressed Spark-first:

- The postings list is ONE map-side-combinable aggregate over the
  exploded token stream; document length rides along functionally
  (computed per doc BEFORE the explode) so no corpus-sized dl join is
  ever needed.
- The query set is tiny by construction, so every query-side join is
  a broadcast: postings are filtered to query terms FIRST (the
  inverted-index probe — candidate volume is docs-containing-a-term,
  never the corpus), and the per-term document frequencies derived
  from that filtered slice form a ≤|query vocab| row table, also
  broadcast.
- Per-(query, doc) score assembly is a pivot-by-term-position into a
  FIXED-ORDER scalar sum, so both engines add the per-term scores in
  the same textual order and the score is reproducible bit-for-bit
  (the same doctrine as the tfidf operator's per-row expression).
- Top-k per query uses the same two-phase salted ranking as the ANN
  family (`similarity.ranked_topk`): a hot query term at corpus scale
  (millions of candidate docs) fans phase 1 across
  ``(query, pmod(doc_id, S))`` salt groups before the final ≤ S·k
  reduce, exact by the total (score desc, doc_id) tiebreak.

At 100 TB: tokenize+postings is a single shuffle keyed on
(doc, term) with partial aggregation; candidate generation touches
only the probed terms' postings (predicate pushdown via the broadcast
semi-join); nothing corpus-sized ever crosses a second shuffle.

Reference scope note: the reference engine (isdaniel/pg2any) has no
retrieval surface — this belongs to the engine's LLM-data-pipeline
extension mandate, alongside dedup/ANN/quality.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

from pg2any_spark.functions.exprs import eval_once
from pg2any_spark.operators.text import tokens

#: BM25 free parameters (Robertson et al.; the Lucene defaults).
K1 = 1.2
B = 0.75

#: Widest query the fixed-order pivot supports; queries() instances
#: stay well under it.  Raising it just adds pivot columns.
MAX_QUERY_TERMS = 4


def doc_postings(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """``(doc_id, dl, term, tf)`` postings with document length
    attached. ``dl`` is computed per document BEFORE the explode and
    carried through the aggregate as a grouping column (it is
    functionally dependent on the doc id), so downstream scoring
    never joins a corpus-sized length table."""
    toked = docs.where(F.trim(F.col(text_col)) != "").select(
        F.col(id_col).alias("doc_id"),
        tokens(F.col(text_col)).alias("__toks"),
    )
    return (
        toked.select(
            "doc_id",
            F.size("__toks").alias("dl"),
            F.explode("__toks").alias("term"),
        )
        .groupBy("doc_id", "dl", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )


def _idf(n_docs: Column, df: Column) -> Column:
    """BM25+ smoothed idf — ln((N - df + 0.5)/(df + 0.5) + 1), always
    positive; operand order matches the oracle text exactly."""
    return F.log(
        ((n_docs - df).cast("double") + F.lit(0.5))
        / (df.cast("double") + F.lit(0.5))
        + F.lit(1.0)
    )


def bm25_topk(
    docs: DataFrame,
    queries: list[tuple[str, list[str]]],
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 10,
    k1: float = K1,
    b: float = B,
    num_salts: int | None = None,
) -> DataFrame:
    """Okapi BM25 top-``k`` documents per query.

    Returns ``(query_id, rnk, doc_id, n_terms_hit, tf_total, bm25)``
    with ``bm25`` rounded to 6dp and ranking tie-broken on the
    rounded score then ``doc_id`` (both engines agree on the order by
    construction: every score input is an exact integer statistic and
    the per-term scores combine in a fixed textual order).
    """
    spark = docs.sparkSession
    terms = [
        (qid, pos, t)
        for qid, ts in queries
        for pos, t in enumerate(ts)
    ]
    if any(pos >= MAX_QUERY_TERMS for _, pos, _ in terms):
        raise ValueError(f"queries wider than {MAX_QUERY_TERMS} terms")
    from pg2any_spark.functions.localtable import literal_table

    qterms = literal_table(
        spark, terms, "query_id string, pos int, term string"
    )

    # corpus stats straight off the base table: two exact integer
    # aggregates, map-side combinable, NO shuffle of the postings.
    stats = (
        docs.where(F.trim(F.col(text_col)) != "")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.size(tokens(F.col(text_col)))).alias("sum_dl"),
        )
    )

    # Inverted-index probe, pushed BELOW the postings aggregate: the
    # query vocabulary is a driver-side literal list, so the term
    # filter applies to the exploded token stream itself and the
    # (doc, term) aggregate — the one corpus-sized shuffle the old
    # post-then-semi-join form paid — now shuffles ONLY query-term
    # occurrences (guide §2.3). tf, dl (computed per doc BEFORE the
    # explode, unaffected by the filter), df, n_docs and sum_dl are
    # all unchanged, so scores are identical. The candidate table
    # feeds two consumers (dft + scoring) in ONE action over a
    # byte-identical subtree, so AQE shuffle-stage reuse covers it; a
    # persist here measured net-slower (1.75 s vs 1.36 s at sf0.1,
    # batch-7 re-measurement, identical output).
    qvocab = sorted({t for _, _, t in terms})
    toked = docs.where(F.trim(F.col(text_col)) != "").select(
        F.col(id_col).alias("doc_id"),
        tokens(F.col(text_col)).alias("__toks"),
    )
    cand = (
        toked.select(
            "doc_id",
            F.size("__toks").alias("dl"),
            F.explode("__toks").alias("term"),
        )
        .filter(F.col("term").isin(qvocab))
        .groupBy("doc_id", "dl", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    dft = cand.groupBy("term").agg(F.count(F.lit(1)).alias("df"))

    avgdl = F.col("sum_dl").cast("double") / F.col("n_docs")
    scored = (
        cand.join(F.broadcast(qterms), "term")
        .join(F.broadcast(dft), "term")
        .crossJoin(F.broadcast(stats))
        .select(
            "query_id",
            "pos",
            "doc_id",
            "tf",
            # eval_once: the MAX_QUERY_TERMS pivot aggregates below
            # reference s once per term slot; the barrier keeps the
            # idf/tf chain from being inlined (hence re-evaluated)
            # into each of them.
            eval_once(
                _idf(F.col("n_docs"), F.col("df"))
                * (F.col("tf").cast("double") * F.lit(k1 + 1.0))
                / (
                    F.col("tf").cast("double")
                    + F.lit(k1)
                    * (
                        F.lit(1.0)
                        - F.lit(b)
                        + F.lit(b) * F.col("dl").cast("double") / avgdl
                    )
                )
            ).alias("s"),
        )
    )

    # fixed-order per-(query, doc) combine: pivot each term position to
    # its own column, then add left-to-right — never a float SUM().
    pivots = [
        F.max(F.when(F.col("pos") == i, F.col("s"))).alias(f"__s{i}")
        for i in range(MAX_QUERY_TERMS)
    ]
    g = scored.groupBy("query_id", "doc_id").agg(
        *pivots,
        F.count(F.lit(1)).cast("int").alias("n_terms_hit"),
        F.sum("tf").cast("bigint").alias("tf_total"),
    )
    score = F.coalesce(F.col("__s0"), F.lit(0.0))
    for i in range(1, MAX_QUERY_TERMS):
        score = score + F.coalesce(F.col(f"__s{i}"), F.lit(0.0))
    g = g.select(
        "query_id",
        "doc_id",
        "n_terms_hit",
        "tf_total",
        F.round(score, 6).alias("bm25"),
    )

    order = [F.col("bm25").desc(), F.col("doc_id")]
    if num_salts and num_salts > 1:
        w1 = Window.partitionBy(
            "query_id", F.pmod(F.col("doc_id"), F.lit(num_salts))
        ).orderBy(*order)
        g = (
            g.withColumn("__salt_rank", F.row_number().over(w1))
            .filter(F.col("__salt_rank") <= k)
            .drop("__salt_rank")
        )
    w = Window.partitionBy("query_id").orderBy(*order)
    return (
        g.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("query_id", "rnk", "doc_id", "n_terms_hit", "tf_total", "bm25")
    )


def lexical_jaccard_topk(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    query_mod: int = 50,
    k: int = 10,
    n: int = 3,
) -> DataFrame:
    """Lexical doc-to-doc retrieval: for each probe document
    (``id % query_mod = 0``), the top-``k`` corpus documents by exact
    3-gram-shingle Jaccard, generated through the shingle INVERTED
    INDEX — a probe's candidates are only the documents sharing ≥ 1
    shingle with it (broadcast semi-ish join on the tiny probe
    shingle set), never an all-pairs scan. Jaccard is the single
    exact-integer division ``|∩| / (|A|+|B|−|∩|)`` rounded to 6dp;
    ranking tie-breaks on the rounded score then neighbor id."""
    from pg2any_spark.caching import managed_persist
    from pg2any_spark.operators.dedup import exploded_shingles

    base = docs.where(F.trim(F.col(text_col)) != "")
    # three consumers traverse the distinct-shingle table (probe side,
    # candidate join, set sizes); without the persist the whole
    # explode→distinct pipeline runs three times — the same
    # multi-traversal rationale as ngram_jaccard's materialize flag
    sh = managed_persist(exploded_shingles(base, id_col, text_col, n).distinct())
    sizes = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("set_size"))
    probe = (
        sh.filter(F.col(id_col) % query_mod == 0)
        .select(F.col(id_col).alias("query_id"), "shingle")
    )
    inter = (
        F.broadcast(probe)
        .join(
            sh.select(F.col(id_col).alias("neighbor_id"), "shingle"),
            "shingle",
        )
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .groupBy("query_id", "neighbor_id")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    sq = sizes.select(
        F.col(id_col).alias("query_id"), F.col("set_size").alias("size_q")
    )
    sn = sizes.select(
        F.col(id_col).alias("neighbor_id"), F.col("set_size").alias("size_n")
    )
    jac = (
        inter.join(F.broadcast(sq), "query_id")
        .join(sn, "neighbor_id")
        .select(
            "query_id",
            "neighbor_id",
            F.round(
                F.col("n_inter").cast("double")
                / (F.col("size_q") + F.col("size_n") - F.col("n_inter")),
                6,
            ).alias("jaccard"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("jaccard").desc(), F.col("neighbor_id")
    )
    return jac.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k
    )


def hybrid_rrf_topk(
    docs: DataFrame,
    emb: DataFrame,
    query_mod: int = 50,
    k: int = 10,
    c: int = 60,
) -> DataFrame:
    """Hybrid retrieval by Reciprocal Rank Fusion (Cormack et al.
    2009): fuse the SEMANTIC ranking (exact cosine over the embedding
    column — the dense retriever) with the LEXICAL ranking
    (shingle-Jaccard through the inverted index — the sparse
    retriever) as ``rrf = Σ 1/(c + rank)`` over the lists that
    contain the candidate. The standard two-tower + BM25-ish fusion a
    retrieval-augmented pipeline runs, with both towers' ranks exact
    and the fusion arithmetic two fixed-order IEEE divisions — fully
    engine-checkable.

    Scale: each tower is its own bounded top-k (map-side pruned
    cosine; inverted-index Jaccard); the fusion input is ≤ 2·|Q|·k
    rows — a full outer join of two tiny lists."""
    from pg2any_spark.operators.similarity import brute_force_topk_arrow

    sem = (
        brute_force_topk_arrow(
            emb, emb.filter(F.col("vec_id") % query_mod == 0), k=k
        )
        .select("query_id", "neighbor_id", F.col("rank").alias("r_sem"))
    )
    lex = lexical_jaccard_topk(
        docs, query_mod=query_mod, k=k
    ).select("query_id", "neighbor_id", F.col("rank").alias("r_lex"))
    fused = sem.join(lex, ["query_id", "neighbor_id"], "full_outer")
    rrf = F.round(
        F.coalesce(F.lit(1.0) / (F.lit(c) + F.col("r_sem")), F.lit(0.0))
        + F.coalesce(F.lit(1.0) / (F.lit(c) + F.col("r_lex")), F.lit(0.0)),
        6,
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("rrf").desc(), F.col("neighbor_id")
    )
    return (
        fused.withColumn("rrf", rrf)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "neighbor_id",
            F.col("r_sem").cast("int").alias("r_sem"),
            F.col("r_lex").cast("int").alias("r_lex"),
            "rrf",
            "rank",
        )
    )
