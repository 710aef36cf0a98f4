"""Retrieval + corpus-curation queries: BM25 top-k over an inverted
index, and the per-source quota cap a web-scale pipeline applies
before mixing (RefinedWeb/Gopher-style domain caps).

These extend the LLM-data-pipeline surface (no reference analogue —
the reference is a CDC engine); oracles are portable SQL per the
round-6 dialect doctrine (UNNEST over split arrays, no list slicing,
every float literal CAST to DOUBLE)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from pg2any_spark.operators.retrieval import bm25_topk
from pg2any_spark.plans.queries import query
from pg2any_spark.sources.fixtures import load_table

#: The fixed probe-query set for the BM25 registry query. Terms come
#: from the synthetic corpus vocabulary so every query has matches at
#: every SF.
BM25_QUERIES: list[tuple[str, list[str]]] = [
    ("q_hash_join", ["hash", "join"]),
    ("q_sort_merge_join", ["sort", "merge", "join"]),
    ("q_window_agg", ["window", "agg"]),
    ("q_fast_table_scan", ["fast", "table", "scan"]),
    ("q_stream_batch", ["stream", "batch"]),
    ("q_slow_vector_query", ["slow", "vector", "query"]),
]

_BM25_VALUES = ",\n        ".join(
    f"('{qid}', {pos}, '{t}')"
    for qid, ts in BM25_QUERIES
    for pos, t in enumerate(ts)
)


@query(
    "retrieval_bm25_topk",
    oracle=f"""
    WITH q(query_id, pos, term) AS (
        VALUES {_BM25_VALUES}
    ),
    base AS (SELECT doc_id, text FROM documents WHERE trim(text) <> ''),
    toked AS (
        SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS t
        FROM base
    ),
    tf AS (
        SELECT doc_id, dl, term, COUNT(*) AS tf
        FROM (SELECT doc_id, len(t) AS dl, unnest(t) AS term FROM toked)
        GROUP BY doc_id, dl, term
    ),
    stats AS (
        SELECT COUNT(*) AS n_docs, SUM(len(t)) AS sum_dl FROM toked
    ),
    dft AS (
        SELECT term, COUNT(*) AS df FROM tf
        WHERE term IN (SELECT DISTINCT term FROM q)
        GROUP BY term
    ),
    sc AS (
        SELECT q.query_id, q.pos, tf.doc_id, tf.tf,
               ln((CAST(stats.n_docs - dft.df AS DOUBLE)
                   + CAST(0.5 AS DOUBLE))
                  / (CAST(dft.df AS DOUBLE) + CAST(0.5 AS DOUBLE))
                  + CAST(1.0 AS DOUBLE))
               * (CAST(tf.tf AS DOUBLE) * CAST(2.2 AS DOUBLE))
               / (CAST(tf.tf AS DOUBLE)
                  + CAST(1.2 AS DOUBLE)
                    * (CAST(1.0 AS DOUBLE) - CAST(0.75 AS DOUBLE)
                       + CAST(0.75 AS DOUBLE) * CAST(tf.dl AS DOUBLE)
                         / (CAST(stats.sum_dl AS DOUBLE) / stats.n_docs)))
               AS s
        FROM tf
        JOIN q ON tf.term = q.term
        JOIN dft ON tf.term = dft.term
        CROSS JOIN stats
    ),
    g AS (
        SELECT query_id, doc_id,
               COALESCE(MAX(CASE WHEN pos = 0 THEN s END),
                        CAST(0.0 AS DOUBLE))
             + COALESCE(MAX(CASE WHEN pos = 1 THEN s END),
                        CAST(0.0 AS DOUBLE))
             + COALESCE(MAX(CASE WHEN pos = 2 THEN s END),
                        CAST(0.0 AS DOUBLE))
             + COALESCE(MAX(CASE WHEN pos = 3 THEN s END),
                        CAST(0.0 AS DOUBLE)) AS score,
               CAST(COUNT(*) AS INTEGER) AS n_terms_hit,
               CAST(SUM(tf) AS BIGINT) AS tf_total
        FROM sc GROUP BY query_id, doc_id
    )
    SELECT query_id, rnk, doc_id, n_terms_hit, tf_total, bm25
    FROM (
        SELECT query_id, doc_id, n_terms_hit, tf_total,
               ROUND(score, 6) AS bm25,
               ROW_NUMBER() OVER (
                   PARTITION BY query_id
                   ORDER BY ROUND(score, 6) DESC, doc_id
               ) AS rnk
        FROM g
    )
    WHERE rnk <= 10
    ORDER BY query_id, rnk
    """,
)
def retrieval_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Okapi BM25 top-10 per probe query over the document corpus
    (`retrieval.bm25_topk`) — the corpus-lookup primitive behind
    contamination probes and eval-neighbor audits. Inverted-index
    probe (postings filtered to query terms via broadcast semi-join),
    broadcast df/stats, fixed-order per-term score combine, and the
    two-phase salted ranking (num_salts=8) that survives a hot term
    at corpus scale — exactness of the salted path is part of what
    the oracle checks."""
    docs = load_table(spark, "documents", sf_dir)
    return bm25_topk(
        docs, BM25_QUERIES, k=10, num_salts=8
    ).orderBy("query_id", "rnk")


@query(
    "source_quota_cap",
    oracle="""
    WITH ranked AS (
        SELECT source, doc_id, n_chars,
               ROW_NUMBER() OVER (
                   PARTITION BY source
                   ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
               ) AS rn
        FROM documents
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(CASE WHEN rn <= 12 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_kept,
           CAST(SUM(CASE WHEN rn <= 12 THEN doc_id ELSE 0 END) AS BIGINT)
               AS kept_docid_sum,
           CAST(SUM(CASE WHEN rn <= 12 THEN n_chars ELSE 0 END) AS BIGINT)
               AS kept_chars
    FROM ranked
    GROUP BY source
    ORDER BY source
    """,
)
def source_quota_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source quota cap (RefinedWeb/Gopher-style domain cap): keep
    at most 12 documents per source, chosen by a deterministic
    hash-order shuffle (md5 of the doc id — uniform, reproducible,
    engine-portable), and report per-source kept counts + exact
    integer checksums of the kept set. One shuffle keyed on source;
    at corpus scale a mega-domain is ranked with the same two-phase
    salt trick as top-k (every kept row is in its salt group's top-12
    under the total (md5, doc_id) order)."""
    docs = load_table(spark, "documents", sf_dir)
    h = F.md5(F.encode(F.col("doc_id").cast("string"), "UTF-8"))
    w = Window.partitionBy("source").orderBy(h.asc(), F.col("doc_id").asc())
    ranked = docs.withColumn("rn", F.row_number().over(w))
    kept = F.col("rn") <= 12
    return (
        ranked.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum(F.when(kept, 1).otherwise(0)).cast("bigint").alias("n_kept"),
            F.sum(F.when(kept, F.col("doc_id")).otherwise(F.lit(0)))
            .cast("bigint")
            .alias("kept_docid_sum"),
            F.sum(F.when(kept, F.col("n_chars")).otherwise(F.lit(0)))
            .cast("bigint")
            .alias("kept_chars"),
        )
        .orderBy("source")
    )


@query(
    "retrieval_hybrid_rrf",
    oracle="""
    WITH q AS (
        SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
        FROM embeddings WHERE vec_id % 50 = 0
    ),
    c AS (SELECT vec_id AS neighbor_id, embedding::DOUBLE[] AS cv
          FROM embeddings),
    sims AS (
        SELECT query_id, neighbor_id,
               ROUND(list_cosine_similarity(qv, cv), 6) AS cos_sim
        FROM q CROSS JOIN c
        WHERE query_id <> neighbor_id
    ),
    sem AS (
        SELECT query_id, neighbor_id, rnk AS r_sem FROM (
            SELECT query_id, neighbor_id,
                   ROW_NUMBER() OVER (
                       PARTITION BY query_id
                       ORDER BY cos_sim DESC, neighbor_id
                   ) AS rnk
            FROM sims
        ) WHERE rnk <= 10
    ),
    toked AS (
        SELECT doc_id,
               string_split_regex(trim(lower(text)), '\\s+') AS t
        FROM documents WHERE trim(text) <> ''
    ),
    sh AS (
        SELECT DISTINCT doc_id,
               unnest(CASE WHEN len(t) >= 3
                           THEN list_transform(
                                    generate_series(1, len(t) - 2),
                                    i -> concat_ws(' ', t[i], t[i+1], t[i+2]))
                           ELSE [array_to_string(t, ' ')] END) AS shingle
        FROM toked
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS set_size FROM sh GROUP BY doc_id),
    probe AS (
        SELECT doc_id AS query_id, shingle FROM sh WHERE doc_id % 50 = 0
    ),
    inter AS (
        SELECT p.query_id, s.doc_id AS neighbor_id, COUNT(*) AS n_inter
        FROM probe p
        JOIN sh s ON s.shingle = p.shingle AND s.doc_id <> p.query_id
        GROUP BY 1, 2
    ),
    lexj AS (
        SELECT i.query_id, i.neighbor_id,
               ROUND(CAST(i.n_inter AS DOUBLE)
                     / (sq.set_size + sn.set_size - i.n_inter), 6) AS jac
        FROM inter i
        JOIN sizes sq ON sq.doc_id = i.query_id
        JOIN sizes sn ON sn.doc_id = i.neighbor_id
    ),
    lex AS (
        SELECT query_id, neighbor_id, rnk AS r_lex FROM (
            SELECT query_id, neighbor_id,
                   ROW_NUMBER() OVER (
                       PARTITION BY query_id
                       ORDER BY jac DESC, neighbor_id
                   ) AS rnk
            FROM lexj
        ) WHERE rnk <= 10
    ),
    fused AS (
        SELECT COALESCE(s.query_id, l.query_id) AS query_id,
               COALESCE(s.neighbor_id, l.neighbor_id) AS neighbor_id,
               CAST(s.r_sem AS INT) AS r_sem,
               CAST(l.r_lex AS INT) AS r_lex,
               ROUND(COALESCE(CAST(1.0 AS DOUBLE) / (60 + s.r_sem),
                              CAST(0.0 AS DOUBLE))
                   + COALESCE(CAST(1.0 AS DOUBLE) / (60 + l.r_lex),
                              CAST(0.0 AS DOUBLE)), 6) AS rrf
        FROM sem s
        FULL OUTER JOIN lex l
          ON l.query_id = s.query_id AND l.neighbor_id = s.neighbor_id
    )
    SELECT query_id, neighbor_id, r_sem, r_lex, rrf, rank
    FROM (
        SELECT query_id, neighbor_id, r_sem, r_lex, rrf,
               CAST(ROW_NUMBER() OVER (
                   PARTITION BY query_id ORDER BY rrf DESC, neighbor_id
               ) AS INT) AS rank
        FROM fused
    )
    WHERE rank <= 10
    ORDER BY query_id, rank
    """,
)
def retrieval_hybrid_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid dense+sparse retrieval fused by Reciprocal Rank Fusion
    (``retrieval.hybrid_rrf_topk``): the semantic tower is the exact
    cosine top-10 over the embedding column (``vec_id = doc_id`` — the
    fixture correspondence the agreement query pins), the lexical
    tower is 3-gram-shingle Jaccard top-10 through the shingle
    inverted index, and each candidate scores
    ``Σ 1/(60 + rank)`` over the lists containing it. Both towers'
    ranks are exact integers; the fusion is two fixed-order IEEE
    divisions — so the hybrid list is engine-checkable bit-for-bit,
    unlike typical score-interpolation hybrids whose weights are
    tuning folklore. Scale: each tower prunes to k before fusion; the
    fusion joins two ≤|Q|·k lists."""
    from pg2any_spark.operators.retrieval import hybrid_rrf_topk

    docs = load_table(spark, "documents", sf_dir)
    emb = load_table(spark, "embeddings", sf_dir)
    return (
        hybrid_rrf_topk(docs, emb, query_mod=50, k=10)
        .withColumn("rank", F.col("rank").cast("int"))
        .orderBy("query_id", "rank")
    )
