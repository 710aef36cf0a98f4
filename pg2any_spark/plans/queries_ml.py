"""Training-data-pipeline queries: dedup, similarity, text analysis,
multimodal — registered into the same driver-facing registry.

Oracle-parity rules (learned the hard way, see scripts/check_oracle.py):
- every hash is md5; integer hashes parse the md5 hex prefix base-16
  (Spark ``conv(...,16,10)`` ≡ DuckDB ``CAST('0x'||… AS BIGINT)``);
- DuckDB DECIMAL literals infect arithmetic — force DOUBLE operands;
- DuckDB ``regexp_replace`` needs ``'g'`` for replace-all; anchored
  patterns (^…) are single-match in both engines;
- mutations use anchored regex (not list slicing — DuckDB's
  out-of-range slice returns NULL, Spark's returns []).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from pg2any_spark.operators import dedup as D
from pg2any_spark.operators import graph as G
from pg2any_spark.operators import multimodal as M
from pg2any_spark.operators import sampling as SA
from pg2any_spark.operators import similarity as S
from pg2any_spark.operators import text as T
from pg2any_spark.operators import timeseries as TS
from pg2any_spark.caching import managed_persist
from pg2any_spark.plans.queries import _fresh_workdir, query
from pg2any_spark.sources.fixtures import load_table

# shared SQL fragments ------------------------------------------------------

_TOKS = "string_split_regex(trim(lower(text)), '\\s+')"
_DROP2 = r"regexp_replace(text, '^\s*\S+\s+\S+\s+', '')"  # drop first 2 words

_SHINGLE_SQL = f"""
    CASE WHEN len({_TOKS}) >= 3
         THEN list_transform(generate_series(1, len({_TOKS}) - 2),
                             i -> concat_ws(' ', {_TOKS}[i], {_TOKS}[i+1], {_TOKS}[i+2]))
         ELSE [array_to_string({_TOKS}, ' ')] END
"""

_RECRAWL_CORPUS = """
    SELECT doc_id AS id, text FROM documents
    UNION ALL
    SELECT doc_id + 100000 AS id, text FROM documents
"""

_MUTATED_CORPUS = f"""
    SELECT doc_id AS id, text FROM documents
    UNION ALL
    SELECT doc_id + 100000 AS id, {_DROP2} AS text FROM documents
"""


def _recrawl_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir).select("doc_id", "text")
    return docs.selectExpr("doc_id AS id", "text").unionByName(
        docs.selectExpr("doc_id + 100000 AS id", "text")
    )


def _mutated_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus plus near-duplicate copies (first two words dropped)."""
    docs = load_table(spark, "documents", sf_dir).select("doc_id", "text")
    mutated = docs.select(
        (F.col("doc_id") + 100000).alias("id"),
        F.regexp_replace("text", r"^\s*\S+\s+\S+\s+", "").alias("text"),
    )
    return docs.selectExpr("doc_id AS id", "text").unionByName(mutated)


#: Bigram-LM per-doc scoring chain as WITH-clause CTE bodies (compose as
#: ``WITH {_LM_CTES}, ...``), ending in ``lm(doc_id, avg_nll)``.
#:
#: Deliberately BORING portable SQL (round-6 rewrite): the three driver-red
#: oracles were the only ones using ``list_transform(generate_series(...))``
#: bigram construction and bare DECIMAL smoothing literals (``c_bg + 0.5``
#: infects the division with version-dependent DECIMAL arithmetic —
#: this module's own rule #2). This chain uses only constructs with green
#: driver rows — lateral ``UNNEST(range(...))`` + single-element list
#: indexing (dedup_repeated_spans) and scalar ``unnest`` (dedup_minhash_lsh)
#: — and casts every float operand to DOUBLE explicitly, mirroring the
#: Spark side's count-weighted mean (operators.text.lm_bigram_scores).
def _lm_ctes(rounded: bool = True) -> str:
    """Build the chain; ``rounded=False`` yields the UNROUNDED per-doc
    mean for the threshold/output margin gate
    (tests/test_threshold_margins.py) — same fragment, so the gate can
    never drift from the oracles."""
    mean = (
        "SUM(CAST(d.n AS DOUBLE) *"
        " (-ln((CAST(c.c_bg AS DOUBLE) + CAST(0.5 AS DOUBLE))"
        " / (CAST(h.c_w1 AS DOUBLE)"
        " + CAST(0.5 AS DOUBLE) * CAST(voc.v AS DOUBLE)))))"
        " / CAST(SUM(d.n) AS DOUBLE)"
    )
    avg_nll = f"ROUND({mean}, 4)" if rounded else mean
    return f"""
    lm_toks AS (
        SELECT doc_id, {_TOKS} AS t FROM documents WHERE trim(text) <> ''
    ),
    lm_bgp AS (
        SELECT doc_id,
               t[CAST(r.i + 1 AS INTEGER)] AS w1,
               t[CAST(r.i + 1 AS INTEGER)] || ' ' ||
               t[CAST(r.i + 2 AS INTEGER)] AS bg
        FROM lm_toks, UNNEST(range(len(t) - 1)) AS r(i)
        WHERE len(t) >= 2
    ),
    lm_docbg AS (
        SELECT doc_id, bg, w1, COUNT(*) AS n
        FROM lm_bgp GROUP BY doc_id, bg, w1
    ),
    lm_bgc AS (SELECT bg, SUM(n) AS c_bg FROM lm_docbg GROUP BY bg),
    lm_hist AS (SELECT w1, SUM(n) AS c_w1 FROM lm_docbg GROUP BY w1),
    lm_voc AS (
        SELECT COUNT(DISTINCT tok) AS v FROM (
            SELECT unnest({_TOKS}) AS tok FROM documents
            WHERE trim(text) <> ''
        ) WHERE tok <> ''
    ),
    lm AS (
        SELECT d.doc_id,
               {avg_nll} AS avg_nll
        FROM lm_docbg d
        JOIN lm_bgc c ON c.bg = d.bg
        JOIN lm_hist h ON h.w1 = d.w1
        CROSS JOIN lm_voc voc
        GROUP BY d.doc_id
    )
"""


_LM_CTES = _lm_ctes(rounded=True)
#: Unrounded twin for the margin gate.
_LM_RAW_CTES = _lm_ctes(rounded=False)


#: Per-document integer quality measurements (the exact BIGINTs
#: ``operators.text.quality_ints`` mirrors) as a WITH-clause CTE body
#: ending in ``q_ints(doc_id, n_tok, n_den, n_stop, n_punct, n_chars)``.
_QINTS_CTE = f"""
    q_ints AS (
        SELECT doc_id,
               CAST(CASE WHEN trim(text) = '' THEN 0
                         ELSE len({_TOKS}) END AS BIGINT) AS n_tok,
               CAST(len({_TOKS}) AS BIGINT) AS n_den,
               CAST(len(list_filter({_TOKS},
                        t -> list_contains(['the','a','is','and','of'], t)))
                    AS BIGINT) AS n_stop,
               CAST(length(text)
                    - length(regexp_replace(text, '[.,;:!?]', '', 'g'))
                    AS BIGINT) AS n_punct,
               CAST(length(text) AS BIGINT) AS n_chars
        FROM documents
    )
"""


def _fq_int_sql(q: str) -> str:
    """``quality < 0.4`` as the exact BIGINT cross-multiplication over
    a ``q_ints``-shaped relation aliased ``q`` — the SQL twin of
    ``operators.text.quality_fail_int`` (see its derivation)."""
    tg = f"GREATEST({q}.n_den, 1)"
    lg = f"GREATEST({q}.n_chars, 1)"
    return (
        f"(LEAST({q}.n_tok, 50) * {tg} * {lg}"
        f" + 30 * LEAST(5 * {q}.n_stop, {tg}) * {lg}"
        f" + 20 * {tg} * ({lg} - LEAST(5 * {q}.n_punct, {lg})))"
        f" < 40 * {tg} * {lg}"
    )


#: Bigram-gram construction + exact per-doc integer repetition counts,
#: ending in ``rep_i(doc_id, n_grams, n_distinct)`` (docs with < 2
#: tokens absent — callers LEFT JOIN + treat as unflagged).
_REP_INT_CTES = f"""
    g AS (
        SELECT doc_id,
               t[CAST(r.i + 1 AS INTEGER)] || ' ' ||
               t[CAST(r.i + 2 AS INTEGER)] AS gram
        FROM (SELECT doc_id, {_TOKS} AS t
              FROM documents WHERE trim(text) <> '') toks,
             UNNEST(range(len(t) - 1)) AS r(i)
        WHERE len(t) >= 2
    ),
    per AS (SELECT doc_id, gram, COUNT(*) AS c FROM g GROUP BY doc_id, gram),
    rep_i AS (
        SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_grams,
               CAST(COUNT(*) AS BIGINT) AS n_distinct
        FROM per GROUP BY doc_id
    )
"""

#: ``dup_frac > 0.2`` over ``rep_i``, exact in BIGINTs:
#: (n_grams − n_distinct)/n_grams > 1/5  ⟺  5·(n_grams − n_distinct) > n_grams.
_FR_INT = "5 * (rep_i.n_grams - rep_i.n_distinct) > rep_i.n_grams"

#: Scaled-integer bigram-LM chain (same count CTEs as ``_LM_CTES``, but
#: the per-bigram nll floors to a BIGINT at scale 1e6 BEFORE any
#: aggregation — the Spark twin is ``text.lm_bigram_scores_scaled``;
#: see its docstring for why this is the cross-engine-stable form).
#: Ends in ``lm_i(doc_id, n_bg, nll_sum)``;
#: ``avg_nll > θ  ⟺  nll_sum > θ·1e6·n_bg`` in pure BIGINTs.
_LM_INT_CTES = f"""
    lm_toks AS (
        SELECT doc_id, {_TOKS} AS t FROM documents WHERE trim(text) <> ''
    ),
    lm_bgp AS (
        SELECT doc_id,
               t[CAST(r.i + 1 AS INTEGER)] AS w1,
               t[CAST(r.i + 1 AS INTEGER)] || ' ' ||
               t[CAST(r.i + 2 AS INTEGER)] AS bg
        FROM lm_toks, UNNEST(range(len(t) - 1)) AS r(i)
        WHERE len(t) >= 2
    ),
    lm_docbg AS (
        SELECT doc_id, bg, w1, COUNT(*) AS n
        FROM lm_bgp GROUP BY doc_id, bg, w1
    ),
    lm_bgc AS (SELECT bg, SUM(n) AS c_bg FROM lm_docbg GROUP BY bg),
    lm_hist AS (SELECT w1, SUM(n) AS c_w1 FROM lm_docbg GROUP BY w1),
    lm_voc AS (
        SELECT COUNT(DISTINCT tok) AS v FROM (
            SELECT unnest({_TOKS}) AS tok FROM documents
            WHERE trim(text) <> ''
        ) WHERE tok <> ''
    ),
    lm_i AS (
        SELECT d.doc_id,
               CAST(SUM(d.n) AS BIGINT) AS n_bg,
               CAST(SUM(d.n * CAST(FLOOR(CAST(1000000 AS DOUBLE) *
                    -ln((CAST(c.c_bg AS DOUBLE) + CAST(0.5 AS DOUBLE))
                        / (CAST(h.c_w1 AS DOUBLE)
                           + CAST(0.5 AS DOUBLE) * CAST(voc.v AS DOUBLE))))
                    AS BIGINT)) AS BIGINT) AS nll_sum
        FROM lm_docbg d
        JOIN lm_bgc c ON c.bg = d.bg
        JOIN lm_hist h ON h.w1 = d.w1
        CROSS JOIN lm_voc voc
        GROUP BY d.doc_id
    )
"""

#: ``avg_nll > 3.595`` over ``lm_i`` in pure BIGINTs (θ·1e6 = 3595000).
_FM_INT = "lm_i.nll_sum > 3595000 * lm_i.n_bg"


def _lm_scaled_spark(docs: DataFrame) -> DataFrame:
    """(doc_id, n_bg, nll_sum) Spark twin of ``lm_i``."""
    return T.lm_bigram_scores_scaled(docs).select(
        "doc_id",
        F.col("n_bigrams").alias("n_bg"),
        "nll_sum",
    )


def _fm_int_col() -> F.Column:
    """Spark twin of ``_FM_INT`` (NULL-safe: gram-less docs unflagged)."""
    return F.coalesce(
        F.col("nll_sum") > F.lit(3595000).cast("long") * F.col("n_bg"),
        F.lit(False),
    )


def _rep_int_cols() -> tuple[F.Column, F.Column]:
    """(n_grams, n_distinct) BIGINTs over a materialized ``__grams``
    column — Spark twin of ``rep_i`` (0/0 for gram-less docs)."""
    return (
        F.size("__grams").cast("long"),
        F.size(F.array_distinct("__grams")).cast("long"),
    )




# ---------------------------------------------------------------------------
# text analysis
# ---------------------------------------------------------------------------


@query(
    "text_stats_documents",
    oracle=f"""
    SELECT doc_id,
           CASE WHEN trim(text) = '' THEN 0 ELSE len({_TOKS}) END AS n_tokens,
           len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\\s]')) AS n_tokens_bpe,
           ROUND((length(text) - length(regexp_replace(text, '[.,;:!?]', '', 'g')))
                 / greatest(length(text), 1), 6) AS punct_ratio,
           ROUND(len(list_filter({_TOKS},
                     t -> list_contains(['the','a','is','and','of'], t)))
                 / greatest(len({_TOKS}), 1), 6) AS stopword_ratio_en,
           md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fingerprint
    FROM documents
    """,
)
def text_stats_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counts (whitespace + BPE-ish), punctuation/stopword
    ratios, content fingerprint — all JVM-side projections."""
    docs = load_table(spark, "documents", sf_dir)
    t = F.col("text")
    return docs.select(
        "doc_id",
        T.token_count(t).alias("n_tokens"),
        T.bpe_ish_token_count(t).alias("n_tokens_bpe"),
        F.round(T.punct_ratio(t), 6).alias("punct_ratio"),
        F.round(T.stopword_ratio(t, T.LANG_MARKERS["en"]), 6).alias("stopword_ratio_en"),
        T.fingerprint(t).alias("fingerprint"),
    )


@query(
    "doc_fingerprint_rolling",
    oracle="""
    SELECT doc_id,
           list_reduce(
               list_prepend(CAST(0 AS BIGINT),
                   list_transform(
                       regexp_extract_all(
                           trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), '.'),
                       c -> CAST(ascii(c) AS BIGINT))),
               (acc, x) -> (acc * 131 + x) % 2147483647) AS rolling_fp
    FROM documents
    """,
)
def doc_fingerprint_rolling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rabin-Karp polynomial rolling-hash fingerprint per document —
    the brief's 'document fingerprinting (rolling hash)' item as a
    codegen'd higher-order aggregate (no UDF, no shuffle)."""
    docs = load_table(spark, "documents", sf_dir)
    return docs.select(
        "doc_id", T.rolling_fingerprint(F.col("text")).alias("rolling_fp")
    )


def _lang_score_sql(lang: str) -> str:
    markers = ", ".join(f"'{m}'" for m in T.LANG_MARKERS[lang])
    return f"len(list_filter({_TOKS}, t -> list_contains([{markers}], t)))"


@query(
    "lang_id_documents",
    oracle=f"""
    WITH scored AS (
        SELECT doc_id, lang,
               {_lang_score_sql("de")} AS s_de,
               {_lang_score_sql("en")} AS s_en,
               {_lang_score_sql("es")} AS s_es,
               {_lang_score_sql("fr")} AS s_fr
        FROM documents
    )
    SELECT doc_id, lang,
           CASE WHEN greatest(s_de, s_en, s_es, s_fr) < 1 THEN 'und'
                WHEN s_de = greatest(s_de, s_en, s_es, s_fr) THEN 'de'
                WHEN s_en = greatest(s_en, s_es, s_fr) THEN 'en'
                WHEN s_es = greatest(s_es, s_fr) THEN 'es'
                ELSE 'fr' END AS lang_pred
    FROM scored
    """,
)
def lang_id_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-marker language ID (argmax, alphabetical tiebreak)."""
    docs = load_table(spark, "documents", sf_dir)
    return docs.select("doc_id", "lang", T.lang_id(F.col("text")).alias("lang_pred"))


# ---------------------------------------------------------------------------
# dedup
# ---------------------------------------------------------------------------


@query(
    "dedup_exact_recrawl",
    oracle=f"""
    WITH corpus AS ({_RECRAWL_CORPUS})
    SELECT md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fingerprint,
           min(id) AS id
    FROM corpus GROUP BY fingerprint
    """,
)
def dedup_exact_recrawl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup of a 2× re-crawled corpus — survivors are the
    original min ids; the aggregate shuffles one row per fingerprint."""
    corpus = _recrawl_corpus(spark, sf_dir)
    return D.exact_dedup(corpus, "id", "text").select("fingerprint", "id")


def _minhash_sig_sql(k: int) -> str:
    """Double-hash MinHash (mirrors operators.dedup.minhash_signatures):
    one md5 per shingle, mh_i = (h1 + i*h2) mod p."""
    prime = 4_294_967_291
    return ",\n           ".join(
        f"min((h1 + {i} * h2) % {prime}) AS mh{i}" for i in range(k)
    )


def _band_sql(bands: int, rows: int, extra_cols: str = "") -> str:
    """Band-key table SQL over a ``sig`` CTE; ``extra_cols`` carries
    side-channel columns (e.g. ``"side, "``) through the bands."""
    parts = []
    for b in range(bands):
        cols = ", ".join(f"mh{b * rows + j}" for j in range(rows))
        parts.append(
            f"SELECT id, {extra_cols}{b} AS band_idx, "
            f"md5(concat_ws('|', {cols})) AS band_key FROM sig"
        )
    return "\n    UNION ALL ".join(parts)


@query(
    "dedup_minhash_lsh",
    oracle=f"""
    WITH corpus AS ({_MUTATED_CORPUS}),
    sh AS (
        SELECT id, unnest({_SHINGLE_SQL}) AS shingle FROM corpus
    ),
    hashed AS (
        SELECT id,
               CAST(('0x' || substr(md5(shingle), 1, 8)) AS BIGINT) AS h1,
               CAST(('0x' || substr(md5(shingle), 9, 8)) AS BIGINT) AS h2
        FROM sh
    ),
    sig AS (
        SELECT id, {_minhash_sig_sql(12)}
        FROM hashed GROUP BY id
    ),
    bands AS (
        {_band_sql(4, 3)}
    )
    SELECT DISTINCT a.id AS id_a, b.id AS id_b
    FROM bands a JOIN bands b
      ON a.band_idx = b.band_idx AND a.band_key = b.band_key AND a.id < b.id
    """,
)
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash+LSH candidate pairs over corpus ∪ near-dup mutations
    (12 hashes, 4 bands × 3 rows): shingle → minhash → band →
    bucket-join — never an all-pairs comparison."""
    corpus = _mutated_corpus(spark, sf_dir)
    return D.lsh_candidate_pairs(corpus, "id", "text", num_hashes=12, bands=4)


#: Rank-tercile CCNet bucketing over the ``lm`` CTE — shared by the main
#: sampling query and its nll bisection probe.
_PPLX_BUCKET_CTES = f"""
    {_LM_CTES},
    ranked AS (
        SELECT d.doc_id, d.lang, lm.avg_nll,
               ROW_NUMBER() OVER (PARTITION BY d.lang
                                  ORDER BY lm.avg_nll, d.doc_id) AS rn,
               COUNT(*) OVER (PARTITION BY d.lang) AS n
        FROM documents d JOIN lm ON lm.doc_id = d.doc_id
    ),
    bucketed AS (
        SELECT lang, doc_id, avg_nll,
               CASE WHEN rn * 3 <= n THEN 'head'
                    WHEN rn * 3 <= 2 * n THEN 'middle'
                    ELSE 'tail' END AS bucket,
               CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
                    AS BIGINT) % 100 AS h
        FROM ranked
    )
"""


@query(
    "perplexity_bucket_sampling",
    oracle=f"""
    WITH {_LM_INT_CTES},
    ranked AS (
        SELECT d.doc_id, d.lang,
               ROW_NUMBER() OVER (
                   PARTITION BY d.lang
                   ORDER BY CAST(lm_i.nll_sum AS DOUBLE)
                            / CAST(lm_i.n_bg AS DOUBLE),
                            d.doc_id) AS rn,
               COUNT(*) OVER (PARTITION BY d.lang) AS n
        FROM documents d JOIN lm_i ON lm_i.doc_id = d.doc_id
    ),
    bucketed AS (
        SELECT lang, doc_id,
               CASE WHEN rn * 3 <= n THEN 'head'
                    WHEN rn * 3 <= 2 * n THEN 'middle'
                    ELSE 'tail' END AS bucket,
               CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
                    AS BIGINT) % 100 AS h
        FROM ranked
    )
    SELECT lang, bucket,
           COUNT(*) AS n_docs,
           CAST(SUM(CASE bucket WHEN 'head' THEN 1
                                WHEN 'middle' THEN CASE WHEN h < 50 THEN 1 ELSE 0 END
                                ELSE CASE WHEN h < 10 THEN 1 ELSE 0 END END)
                AS BIGINT) AS n_kept
    FROM bucketed
    GROUP BY lang, bucket ORDER BY lang, bucket
    """,
)
def perplexity_bucket_sampling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet head/middle/tail corpus curation: per language, rank
    documents by LM perplexity and cut RANK terciles (head = most
    fluent third), then hash-sample each bucket at its keep rate
    (head 1.0 / middle 0.5 / tail 0.1 — the CCNet quality-mix knob).
    Rank-based terciles are deliberately threshold-literal-free: the
    cut depends only on the ordering (avg_nll, doc_id — fully
    deterministic tiebreak), so the flip-margin hazard class the
    round-4 funnel hit cannot exist here. One window per language
    over the per-doc LM table; the sampling decision is the same
    md5-hash filter as operators.sampling (no RNG, re-run stable).

    Round 6: output is counts-only — the rounded float min/max nll
    cells moved to ``perplexity_probe_nll`` so a driver-side float
    divergence cannot red-flag the sampling decision itself (the
    round-5 driver row was hash-red with rows/schema green; the two
    surfaces are now separately attributable).

    Round 7 (still red in r6): the rank KEY was the remaining float
    surface — ordering by raw avg_nll lets a sub-1e-12 engine
    difference swap two near-equal docs across a tercile boundary.
    The key is now the single IEEE division of two exact BIGINTs from
    the scale-1e6 floored LM chain (``text.lm_bigram_scores_scaled``):
    identical integer inputs → bit-identical key in every engine.
    ``perplexity_probe_nll`` intentionally stays on the OLD float
    chain to keep monitoring that surface."""
    lm = _lm_scaled_spark(load_table(spark, "documents", sf_dir))
    docs = load_table(spark, "documents", sf_dir)
    from pyspark.sql import Window

    key = F.col("nll_sum").cast("double") / F.col("n_bg").cast("double")
    ranked = (
        docs.select("doc_id", "lang")
        .join(lm, "doc_id")
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("lang").orderBy(key.asc(), F.col("doc_id"))
            ),
        )
        .withColumn("n", F.count(F.lit(1)).over(Window.partitionBy("lang")))
    )
    bucketed = ranked.select(
        "lang",
        "doc_id",
        F.when(F.col("rn") * 3 <= F.col("n"), "head")
        .when(F.col("rn") * 3 <= 2 * F.col("n"), "middle")
        .otherwise("tail")
        .alias("bucket"),
        SA.hash_bucket(F.col("doc_id"), buckets=100).alias("h"),
    )
    keep = (
        F.when(F.col("bucket") == "head", F.lit(1))
        .when(F.col("bucket") == "middle", (F.col("h") < 50).cast("int"))
        .otherwise((F.col("h") < 10).cast("int"))
    )
    return (
        bucketed.groupBy("lang", "bucket")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(keep).alias("n_kept"),
        )
        .orderBy("lang", "bucket")
    )


def _pplx_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(lang, doc_id, avg_nll, bucket, h) rank-tercile bucketing shared
    by ``perplexity_bucket_sampling`` and its nll probe."""
    from pyspark.sql import Window

    docs = load_table(spark, "documents", sf_dir)
    lm = T.lm_bigram_scores(docs).select("doc_id", "avg_nll")
    ranked = (
        docs.select("doc_id", "lang")
        .join(lm, "doc_id")
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("lang").orderBy("avg_nll", "doc_id")
            ),
        )
        .withColumn(
            "n", F.count(F.lit(1)).over(Window.partitionBy("lang"))
        )
    )
    h = SA.hash_bucket(F.col("doc_id"), buckets=100)
    return ranked.select(
        "lang",
        "doc_id",
        "avg_nll",
        F.when(F.col("rn") * 3 <= F.col("n"), "head")
        .when(F.col("rn") * 3 <= 2 * F.col("n"), "middle")
        .otherwise("tail")
        .alias("bucket"),
        h.alias("h"),
    )


@query(
    "perplexity_probe_nll",
    oracle=f"""
    WITH {_PPLX_BUCKET_CTES}
    SELECT lang, bucket,
           ROUND(MIN(avg_nll), 4) AS min_nll,
           ROUND(MAX(avg_nll), 4) AS max_nll
    FROM bucketed
    GROUP BY lang, bucket ORDER BY lang, bucket
    """,
)
def perplexity_probe_nll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-bisection probe (round 6): ONLY the rounded float
    min/max nll cells that used to ride along in
    ``perplexity_bucket_sampling``. If this row is red while the
    counts-only main query is green, the driver-side divergence is in
    the LM float surface (smoothed-quotient arithmetic / AVG
    summation); if both are green the round-5 red is localized to the
    retired DuckDB-dialect constructs (the old oracle built bigrams
    via list_transform(generate_series(...)) with bare DECIMAL
    smoothing literals — see _LM_CTES)."""
    return (
        _pplx_bucketed(spark, sf_dir)
        .groupBy("lang", "bucket")
        .agg(
            F.round(F.min("avg_nll"), 4).alias("min_nll"),
            F.round(F.max("avg_nll"), 4).alias("max_nll"),
        )
        .orderBy("lang", "bucket")
    )


@query(
    "dedup_repeated_spans",
    oracle=f"""
    WITH corpus AS ({_MUTATED_CORPUS}),
    base AS (
        SELECT id,
               CASE WHEN trim(text) = '' THEN 0 ELSE len({_TOKS}) END
                   AS n_tokens
        FROM corpus
    ),
    toks AS (SELECT id, {_TOKS} AS t FROM corpus WHERE trim(text) <> ''),
    g AS (
        SELECT id, CAST(r.i AS INTEGER) AS pos,
               array_to_string(t[(r.i + 1):(r.i + 10)], ' ') AS gram
        FROM toks, UNNEST(range(len(t) - 9)) AS r(i)
        WHERE len(t) >= 10
    ),
    dup AS (SELECT gram FROM g GROUP BY gram HAVING COUNT(*) >= 2),
    m AS (SELECT g.id, g.pos FROM g JOIN dup USING (gram)),
    flg AS (
        SELECT id, pos,
               CASE WHEN pos - LAG(pos)
                        OVER (PARTITION BY id ORDER BY pos) > 10
                    THEN 1 ELSE 0 END AS new_span
        FROM m
    ),
    isl AS (
        SELECT id, pos,
               SUM(new_span) OVER (PARTITION BY id ORDER BY pos
                                   ROWS UNBOUNDED PRECEDING) AS grp
        FROM flg
    ),
    sp AS (
        SELECT id, grp, MAX(pos) - MIN(pos) + 10 AS covered
        FROM isl GROUP BY id, grp
    ),
    pd AS (
        SELECT id, COUNT(*) AS n_dup_spans, SUM(covered) AS cov,
               MAX(covered) AS longest
        FROM sp GROUP BY id
    )
    SELECT b.id, b.n_tokens,
           COALESCE(pd.n_dup_spans, 0) AS n_dup_spans,
           ROUND(COALESCE(pd.cov, 0)
                 / CAST(GREATEST(b.n_tokens, 1) AS DOUBLE), 6)
               AS dup_token_frac,
           CAST(COALESCE(pd.longest, 0) AS INT) AS longest_span_tokens
    FROM base b LEFT JOIN pd ON pd.id = b.id
    """,
)
def dedup_repeated_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Span/substring-level dedup report over corpus ∪ near-dup
    mutations: maximal runs of token positions whose 10-gram occurs
    more than once in the corpus (the "deduplicating training data"
    exact-substring mode, approximated on k-gram granularity so it
    stays a distributed groupBy + gaps-and-islands window instead of
    a suffix array). Each mutated copy shares its whole suffix with
    its original, so the report shows near-total span coverage on
    those pairs plus whatever natural repetition the corpus carries —
    the signal a curation pipeline uses to excise copied passages
    rather than drop whole documents (operators.dedup.
    repeated_span_report)."""
    corpus = _mutated_corpus(spark, sf_dir)
    return D.repeated_span_report(corpus, "id", "text", k=10)


#: Footer line appended (as its own pseudo-line) to every even-id
#: document in the line-dedup query — the C4 "same line on every page
#: of a crawl" pathology.
_FOOTER_LINE = (
    "copyright this site all rights reserved terms privacy cookies contact"
)

#: C4 pseudo-line table + per-line keep verdicts as WITH-clause CTE
#: bodies, ending in ``c4_k(doc_id, pos, line, kept)`` — shared by
#: ``line_dedup_c4`` and its two bisection probes.
#:
#: Round-6 portable rewrite: the round-5 red oracle built lines by
#: out-of-bounds list slicing (``t[a:b]`` with b past the end — exactly
#: the dialect edge this module's header warns about) and digested them
#: through ``string_agg(... ORDER BY ...) FILTER``; no green oracle uses
#: either construct. Lines are now rebuilt by grouping indexed tokens
#: (lateral UNNEST(range()) + single-element indexing, both
#: driver-green constructs) and the kept-digest aggregates over a
#: pre-filtered CTE instead of FILTER.
_C4_LINE_CTES = f"""
    c4_toks AS (
        SELECT doc_id, {_TOKS} AS t FROM documents WHERE trim(text) <> ''
    ),
    c4_tokpos AS (
        SELECT doc_id, CAST(r.i AS INTEGER) AS idx,
               t[CAST(r.i + 1 AS INTEGER)] AS tok
        FROM c4_toks, UNNEST(range(len(t))) AS r(i)
    ),
    c4_chunk AS (
        SELECT doc_id, CAST(idx // 10 AS INTEGER) AS pos,
               string_agg(tok, ' ' ORDER BY idx) AS line
        FROM c4_tokpos GROUP BY doc_id, CAST(idx // 10 AS INTEGER)
    ),
    c4_lines AS (
        SELECT doc_id, pos, line FROM c4_chunk
        UNION ALL
        SELECT doc_id, 1000000 AS pos, '{_FOOTER_LINE}' AS line
        FROM documents WHERE doc_id % 2 = 0
    ),
    c4_own AS (
        SELECT line AS oline, MIN(doc_id) AS owner FROM c4_lines GROUP BY line
    ),
    c4_k AS (
        SELECT l.doc_id, l.pos, l.line, (l.doc_id = o.owner) AS kept
        FROM c4_lines l JOIN c4_own o ON o.oline = l.line
    )
"""


@query(
    "line_dedup_c4",
    oracle=f"""
    WITH {_C4_LINE_CTES},
    kept_lines AS (SELECT doc_id, pos, line FROM c4_k WHERE kept),
    dig AS (
        SELECT doc_id, md5(string_agg(line, ' | ' ORDER BY pos)) AS kept_digest
        FROM kept_lines GROUP BY doc_id
    )
    SELECT k.doc_id,
           COUNT(*) AS n_lines,
           CAST(SUM(CAST(kept AS INT)) AS BIGINT) AS n_kept,
           ROUND(SUM(CAST(kept AS INT)) / CAST(COUNT(*) AS DOUBLE), 6)
               AS kept_frac,
           MAX(d.kept_digest) AS kept_digest
    FROM c4_k k LEFT JOIN dig d ON d.doc_id = k.doc_id
    GROUP BY k.doc_id
    """,
)
def line_dedup_c4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4-style cross-document line dedup: documents chunk into
    deterministic 10-token pseudo-lines, a boilerplate footer line is
    planted on every even-id document, and each distinct line survives
    only in its minimum-id document. Per doc: line counts, retained
    fraction, and an md5 digest of the rebuilt (kept, position-ordered)
    text — the operator a crawl-cleaning pipeline runs before any
    document-level dedup. Owner resolution shuffles one row per
    distinct line (map-side-combined min); the verdict join fans out
    linearly in line count, never quadratically (see
    operators.dedup.line_dedup)."""
    flagged = _c4_flagged_lines(spark, sf_dir)
    kept_sorted = F.array_sort(
        F.collect_list(F.when(F.col("kept"), F.struct("pos", "line")))
    )
    return flagged.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.sum(F.col("kept").cast("int")).alias("n_kept"),
        F.round(
            F.sum(F.col("kept").cast("int")) / F.count(F.lit(1)), 6
        ).alias("kept_frac"),
        F.when(
            F.sum(F.col("kept").cast("int")) > 0,
            F.md5(
                F.array_join(
                    F.transform(kept_sorted, lambda s: s["line"]), " | "
                )
            ),
        ).alias("kept_digest"),
    )


def _c4_flagged_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, pos, line, kept) verdict table for the C4 line-dedup
    scenario (pseudo-lines + planted even-id footer), shared by
    ``line_dedup_c4`` and its bisection probes."""
    docs = load_table(spark, "documents", sf_dir)
    lines = D.doc_line_table(docs, "doc_id").unionByName(
        docs.filter(F.col("doc_id") % 2 == 0).select(
            "doc_id",
            F.lit(1000000).alias("pos"),
            F.lit(_FOOTER_LINE).alias("line"),
        )
    )
    return D.line_dedup(lines, "doc_id")


@query(
    "line_dedup_probe_counts",
    oracle=f"""
    WITH {_C4_LINE_CTES}
    SELECT doc_id,
           COUNT(*) AS n_lines,
           CAST(SUM(CAST(kept AS INT)) AS BIGINT) AS n_kept
    FROM c4_k GROUP BY doc_id
    """,
)
def line_dedup_probe_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-bisection probe (round 6): ONLY the integer line/keep
    counts of ``line_dedup_c4`` — no digest, no rounded fraction. Red
    here means the driver divergence is in line CONSTRUCTION or
    ownership (which lines exist / who owns them); green here with a
    red digest probe pins it to the ordered-aggregation construct."""
    return _c4_flagged_lines(spark, sf_dir).groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.sum(F.col("kept").cast("int")).alias("n_kept"),
    )


@query(
    "line_dedup_probe_digest",
    oracle=f"""
    WITH {_C4_LINE_CTES},
    kept_lines AS (SELECT doc_id, pos, line FROM c4_k WHERE kept)
    SELECT doc_id,
           md5(string_agg(line, ' | ' ORDER BY pos)) AS kept_digest
    FROM kept_lines GROUP BY doc_id
    """,
)
def line_dedup_probe_digest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-bisection probe (round 6): ONLY the md5 digest of each
    document's kept, position-ordered line text (docs with zero kept
    lines drop out). Red here with green counts isolates the driver
    divergence to ordered string aggregation over the kept lines."""
    flagged = _c4_flagged_lines(spark, sf_dir).filter(F.col("kept"))
    kept_sorted = F.array_sort(F.collect_list(F.struct("pos", "line")))
    return flagged.groupBy("doc_id").agg(
        F.md5(
            F.array_join(F.transform(kept_sorted, lambda s: s["line"]), " | ")
        ).alias("kept_digest"),
    )


@query(
    "line_dedup_probe_nlines",
    oracle=f"""
    WITH c4_toks AS (
        SELECT doc_id, {_TOKS} AS t FROM documents WHERE trim(text) <> ''
    ),
    c4_tokpos AS (
        SELECT doc_id, CAST(r.i AS INTEGER) AS idx
        FROM c4_toks, UNNEST(range(len(t))) AS r(i)
    )
    SELECT doc_id, COUNT(DISTINCT CAST(idx // 10 AS INTEGER)) AS n_lines
    FROM c4_tokpos GROUP BY doc_id
    """,
)
def line_dedup_probe_nlines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-bisection probe (round 7, third level): ONLY each
    document's constructed pseudo-line COUNT — no footer, no dedup, no
    line text. ``line_dedup_probe_counts`` was the one round-6 red
    whose kept-content sibling (digest) was green, so the divergence
    must live in line construction arithmetic or in the rows only the
    counts probe includes; this isolates the construction count (now
    pure integer division on both sides)."""
    docs = load_table(spark, "documents", sf_dir)
    return (
        D.doc_line_table(docs, "doc_id")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_lines"))
    )


@query(
    "line_dedup_probe_footer",
    oracle=f"""
    WITH {_C4_LINE_CTES}
    SELECT COUNT(*) AS n_footer_rows,
           CAST(SUM(CAST(kept AS INT)) AS BIGINT) AS n_footer_kept,
           MIN(doc_id) AS footer_owner
    FROM c4_k WHERE line = '{_FOOTER_LINE}'
    """,
)
def line_dedup_probe_footer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-bisection probe (round 7, third level): ONLY the planted
    footer line's ownership row — how many documents carry it, how
    many keep it (must be 1), and the min-id owner. Isolates the
    even-id planting and min-id ownership reduction of
    ``line_dedup_c4`` away from all tokenization."""
    return (
        _c4_flagged_lines(spark, sf_dir)
        .filter(F.col("line") == _FOOTER_LINE)
        .agg(
            F.count(F.lit(1)).alias("n_footer_rows"),
            F.sum(F.col("kept").cast("int")).alias("n_footer_kept"),
            F.min("doc_id").alias("footer_owner"),
        )
    )


#: Synthetic boilerplate planted into the hot-band-key query: 30 ids
#: carrying the identical template (a licence-header stand-in) — one
#: LSH bucket per band with 30 members, the quadratic-pair-output
#: pathology the cap exists for.
_BOILERPLATE_TEXT = (
    "this page is provided under the standard terms of use and all "
    "rights are reserved by the site operator"
)
_BOILERPLATE_COPIES = 30
_HOT_KEY_CAP = 10


@query(
    "dedup_lsh_hot_cap",
    oracle=f"""
    WITH corpus AS (
        SELECT doc_id AS id, text FROM documents
        UNION ALL
        SELECT 1000000000000 + CAST(r.i AS BIGINT), '{_BOILERPLATE_TEXT}'
        FROM range({_BOILERPLATE_COPIES}) r(i)
    ),
    sh AS (
        SELECT id, unnest({_SHINGLE_SQL}) AS shingle FROM corpus
    ),
    hashed AS (
        SELECT id,
               CAST(('0x' || substr(md5(shingle), 1, 8)) AS BIGINT) AS h1,
               CAST(('0x' || substr(md5(shingle), 9, 8)) AS BIGINT) AS h2
        FROM sh
    ),
    sig AS (
        SELECT id, {_minhash_sig_sql(12)}
        FROM hashed GROUP BY id
    ),
    bands AS (
        {_band_sql(4, 3)}
    ),
    cnt AS (
        SELECT band_idx, band_key, COUNT(*) AS n_ids
        FROM bands GROUP BY band_idx, band_key
    ),
    hot AS (SELECT band_idx, band_key FROM cnt WHERE n_ids > {_HOT_KEY_CAP}),
    kept AS (
        SELECT b.id, b.band_idx, b.band_key
        FROM bands b
        LEFT JOIN hot h
          ON h.band_idx = b.band_idx AND h.band_key = b.band_key
        WHERE h.band_key IS NULL
    ),
    capped AS (
        SELECT DISTINCT a.id AS id_a, b.id AS id_b
        FROM kept a JOIN kept b
          ON a.band_idx = b.band_idx AND a.band_key = b.band_key
         AND a.id < b.id
    ),
    uncapped AS (
        SELECT DISTINCT a.id AS id_a, b.id AS id_b
        FROM bands a JOIN bands b
          ON a.band_idx = b.band_idx AND a.band_key = b.band_key
         AND a.id < b.id
    )
    SELECT 'capped_pairs' AS metric, CAST(COUNT(*) AS BIGINT) AS value
    FROM capped
    UNION ALL
    SELECT 'hot_keys', CAST(COUNT(*) AS BIGINT) FROM hot
    UNION ALL
    SELECT 'uncapped_pairs', CAST(COUNT(*) AS BIGINT) FROM uncapped
    ORDER BY metric
    """,
)
def dedup_lsh_hot_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hot-band-key capping demo/QA: the corpus plus 30 copies of a
    boilerplate template (the licence-header pathology). Without the
    cap the template's four band buckets emit C(30,2) pairs each-ish —
    quadratic in family size, the one LSH cost AQE skew-splitting
    cannot shrink because it is OUTPUT, not partitioning. With
    ``hot_key_cap=10`` both join sides anti-join the (tiny, broadcast)
    hot-key set first, so pair output per key is bounded by cap^2 and
    the dropped keys are REPORTED (`hot_keys`), never silently
    truncated. uncapped_pairs is computed alongside as the QA
    contrast; real pipelines run only the capped join + the report."""
    docs = load_table(spark, "documents", sf_dir).select(
        F.col("doc_id").alias("id"), "text"
    )
    planted = (
        spark.range(_BOILERPLATE_COPIES)
        .select(
            (F.col("id") + F.lit(1_000_000_000_000)).alias("id"),
            F.lit(_BOILERPLATE_TEXT).alias("text"),
        )
    )
    corpus = docs.unionByName(planted)
    idx = managed_persist(
        D.lsh_index(corpus, "id", "text", num_hashes=12, bands=4)
    )
    hot = D.hot_band_keys(idx, _HOT_KEY_CAP).select("band_idx", "band_key")
    hot_n = hot.agg(F.count(F.lit(1)).cast("long").alias("value"))
    # Round-11 optimization (guide §2.4): ONE band self-join feeds both
    # pair metrics. The capped join is by construction the uncapped
    # join restricted to non-hot buckets, so running join_band_tables
    # twice duplicated the corpus-sized self-join + distinct; instead
    # the single join carries a per-bucket hot flag (LEFT join against
    # the tiny broadcast hot-key set — the flag is a property of the
    # bucket, so flagging one side covers the pair) and the two counts
    # are conditional COUNT(DISTINCT pair) over the same stream.
    # Identical sets to the two-join form: a pair reachable via any
    # non-hot bucket still counts as capped. Production pipelines keep
    # the anti-join form (never materializing hot-bucket pairs); this
    # QA query materializes them anyway for the uncapped contrast.
    flagged = idx.join(
        F.broadcast(hot.withColumn("__hot", F.lit(True))),
        ["band_idx", "band_key"],
        "left",
    ).withColumn("__hot", F.coalesce(F.col("__hot"), F.lit(False)))
    pairs = (
        flagged.alias("i")
        .join(
            idx.alias("x"),
            (F.col("i.band_idx") == F.col("x.band_idx"))
            & (F.col("i.band_key") == F.col("x.band_key"))
            & (F.col("x.id") < F.col("i.id")),
        )
        .select(
            F.col("x.id").alias("id_a"),
            F.col("i.id").alias("id_b"),
            F.col("i.__hot").alias("__hot"),
        )
    )
    pair = F.struct(F.col("id_a"), F.col("id_b"))
    counts = pairs.agg(
        F.count_distinct(F.when(~F.col("__hot"), pair))
        .cast("long")
        .alias("__capped"),
        F.count_distinct(pair).cast("long").alias("__uncapped"),
    )
    # stack() unpivots the one-row aggregate into the two metric rows
    # in a single evaluation — a unionByName of two selects from
    # ``counts`` would re-run the whole join+aggregate subtree once
    # per branch (Catalyst does not share subtrees across union arms).
    return (
        counts.selectExpr(
            "stack(2, 'capped_pairs', __capped, "
            "'uncapped_pairs', __uncapped) AS (metric, value)"
        )
        .unionByName(hot_n.select(F.lit("hot_keys").alias("metric"), "value"))
        .orderBy("metric")
    )


def _simhash_votes_sql(bits: int) -> str:
    return ",\n               ".join(
        f"SUM(CASE WHEN (h >> {j}) & 1 = 1 THEN 1 ELSE -1 END) AS v{j}"
        for j in range(bits)
    )


def _simhash_fp_sql(bits: int) -> str:
    return " + ".join(
        f"(CASE WHEN v{j} > 0 THEN {1 << j} ELSE 0 END)" for j in range(bits)
    )


@query(
    "dedup_simhash",
    oracle=f"""
    WITH tok AS (
        SELECT doc_id, unnest({_TOKS}) AS tok FROM documents
    ),
    hashed AS (
        SELECT doc_id, CAST(('0x' || substr(md5(tok), 1, 8)) AS BIGINT) AS h FROM tok
    ),
    votes AS (
        SELECT doc_id,
               {_simhash_votes_sql(32)}
        FROM hashed GROUP BY doc_id
    )
    SELECT doc_id, CAST({_simhash_fp_sql(32)} AS BIGINT) AS simhash FROM votes
    """,
)
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """32-bit SimHash fingerprints (token votes via 32 map-side
    combinable sums)."""
    docs = load_table(spark, "documents", sf_dir)
    return D.simhash(docs, "doc_id", "text", bits=32)


@query(
    "dedup_ngram_jaccard",
    oracle=f"""
    WITH corpus AS ({_MUTATED_CORPUS}),
    sh AS (
        SELECT DISTINCT id, unnest({_SHINGLE_SQL}) AS shingle FROM corpus
    ),
    sizes AS (SELECT id, count(*) AS set_size FROM sh GROUP BY id),
    pairs AS (
        SELECT doc_id AS id_a, doc_id + 100000 AS id_b FROM documents
    ),
    inter AS (
        SELECT p.id_a, p.id_b, count(*) AS n_inter
        FROM pairs p
        JOIN sh a ON a.id = p.id_a
        JOIN sh b ON b.id = p.id_b AND b.shingle = a.shingle
        GROUP BY p.id_a, p.id_b
    )
    SELECT p.id_a, p.id_b,
           ROUND(COALESCE(i.n_inter, 0) /
                 (sa.set_size + sb.set_size - COALESCE(i.n_inter, 0)), 6) AS jaccard
    FROM pairs p
    LEFT JOIN inter i ON i.id_a = p.id_a AND i.id_b = p.id_b
    JOIN sizes sa ON sa.id = p.id_a
    JOIN sizes sb ON sb.id = p.id_b
    """,
)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 3-gram Jaccard for (original, mutated-copy) pairs — the
    verify stage that would follow LSH candidate generation."""
    corpus = _mutated_corpus(spark, sf_dir)
    docs = load_table(spark, "documents", sf_dir)
    pairs = docs.select(
        F.col("doc_id").alias("id_a"), (F.col("doc_id") + 100000).alias("id_b")
    )
    return D.ngram_jaccard(corpus, pairs, "id", "text", n=3)


@query(
    "dedup_simhash_near_pairs",
    oracle=f"""
    WITH corpus AS ({_MUTATED_CORPUS}),
    tok AS (
        SELECT id, unnest({_TOKS}) AS tok FROM corpus
    ),
    hashed AS (
        SELECT id, CAST(('0x' || substr(md5(tok), 1, 8)) AS BIGINT) AS h FROM tok
    ),
    votes AS (
        SELECT id,
               {_simhash_votes_sql(32)}
        FROM hashed GROUP BY id
    ),
    fp AS (
        SELECT id, CAST({_simhash_fp_sql(32)} AS BIGINT) AS simhash FROM votes
    ),
    blocked AS (
        SELECT id, simhash, b.blk AS block_idx,
               (simhash >> (b.blk * 8)) & 255 AS block_key
        FROM fp, (SELECT unnest(generate_series(0, 3)) AS blk) b
    )
    SELECT DISTINCT a.id AS id_a, b.id AS id_b,
           bit_count(xor(a.simhash, b.simhash)) AS hamming
    FROM blocked a
    JOIN blocked b ON a.block_idx = b.block_idx
                  AND a.block_key = b.block_key AND a.id < b.id
    WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
    """,
)
def dedup_simhash_near_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs on corpus ∪ mutations via pigeonhole
    blocking (4 × 8-bit blocks), Hamming ≤ 3 verify inside blocks.
    The 32-bit fingerprint's 256-key slices saturate around 10⁵ docs
    (bucket occupancy — hence verify-pair count — then grows linearly
    in corpus size); ``dedup_simhash_wide_near_pairs`` is the same
    operator at web-scale block resolution."""
    corpus = _mutated_corpus(spark, sf_dir)
    fps = D.simhash(corpus, "id", "text", bits=32)
    return D.simhash_hamming_pairs(fps, "id", max_distance=3)


@query(
    "dedup_simhash_wide_near_pairs",
    oracle=f"""
    WITH corpus AS ({_MUTATED_CORPUS}),
    tok AS (
        SELECT id, unnest({_TOKS}) AS tok FROM corpus
    ),
    hashed AS (
        SELECT id, CAST(('0x' || substr(md5(tok), 1, 15)) AS BIGINT) AS h FROM tok
    ),
    votes AS (
        SELECT id,
               {_simhash_votes_sql(60)}
        FROM hashed GROUP BY id
    ),
    fp AS (
        SELECT id, CAST({_simhash_fp_sql(60)} AS BIGINT) AS simhash FROM votes
    ),
    blocked AS (
        SELECT id, simhash, b.blk AS block_idx,
               (simhash >> (b.blk * 15)) & 32767 AS block_key
        FROM fp, (SELECT unnest(generate_series(0, 3)) AS blk) b
    )
    SELECT DISTINCT a.id AS id_a, b.id AS id_b,
           bit_count(xor(a.simhash, b.simhash)) AS hamming
    FROM blocked a
    JOIN blocked b ON a.block_idx = b.block_idx
                  AND a.block_key = b.block_key AND a.id < b.id
    WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
    """,
)
def dedup_simhash_wide_near_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs at WEB-SCALE block resolution: a 60-bit
    fingerprint (15 hex chars of the token md5, BIGINT-safe in both
    engines) pigeonhole-blocked into 4 × 15-bit slices — 32,768 keys
    per slice vs the 32-bit variant's 256. Block-key cardinality is
    the scale ceiling of blocked Hamming search: once corpus size
    outgrows keys-per-slice, expected bucket occupancy grows linearly
    and the in-block verify join quadratically — the zipf/10× skew leg
    measured the 32-bit form's verify stage dominating its runtime at
    ~5×10⁵ docs while this form's buckets stay sparse until ~10⁷. Same
    corpus, same distance bound, same operator
    (``operators.dedup.simhash_hamming_pairs``); a 60-bit Hamming ≤ 3
    is also a sharper near-dup criterion, so pair output is a strict
    high-precision subset of the 32-bit variant's."""
    corpus = _mutated_corpus(spark, sf_dir)
    fps = D.simhash(corpus, "id", "text", bits=60)
    return D.simhash_hamming_pairs(fps, "id", max_distance=3, bits=60)


# ---------------------------------------------------------------------------
# similarity search
# ---------------------------------------------------------------------------

_COS_ORACLE = """
    WITH q AS (
        SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
        FROM embeddings WHERE vec_id % 50 = 0
    ),
    c AS (SELECT vec_id AS neighbor_id, embedding::DOUBLE[] AS cv FROM embeddings),
    sims AS (
        SELECT query_id, neighbor_id,
               ROUND(list_cosine_similarity(qv, cv), 6) AS cos_sim
        FROM q CROSS JOIN c
        WHERE query_id <> neighbor_id
    ),
    ranked AS (
        SELECT query_id, neighbor_id, cos_sim,
               ROW_NUMBER() OVER (
                   PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id
               ) AS rank
        FROM sims
    )
    SELECT query_id, neighbor_id, cos_sim, rank FROM ranked WHERE rank <= 5
"""


@query("ann_cosine_topk_bruteforce", oracle=_COS_ORACLE)
def ann_cosine_topk_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-5 for every 50th vector — the correctness
    baseline ANN re-rankers are measured against. Arrow path: one
    numpy matmul per partition with map-side top-k pruning."""
    emb = load_table(spark, "embeddings", sf_dir)
    queries = emb.filter(F.col("vec_id") % 50 == 0)
    return S.brute_force_topk_arrow(emb, queries, k=5).select(
        "query_id", "neighbor_id", "cos_sim", "rank"
    )


def _srp_planes_sql(num_planes: int) -> str:
    """Plane table: md5-derived ±1 signs, identical to
    operators.similarity.plane_matrix."""
    return f"""
        SELECT p.p, d.d,
               CASE WHEN CAST(('0x' || substr(md5(p.p || ':' || d.d), 1, 1)) AS INT) >= 8
                    THEN 1.0::DOUBLE ELSE -1.0::DOUBLE END AS sign
        FROM (SELECT unnest(generate_series(0, {num_planes - 1})) AS p) p,
             (SELECT unnest(generate_series(0, 63)) AS d) d
    """


_LSH_BUCKET_SQL = f"""
    planes AS ({_srp_planes_sql(8)}),
    buckets AS (
        SELECT e.vec_id,
               SUM(CASE WHEN pr.proj > 0 THEN CAST(pow(2, pr.p) AS BIGINT) ELSE 0 END) AS bucket
        FROM embeddings e
        JOIN (
            SELECT e2.vec_id, pl.p,
                   SUM((e2.embedding::DOUBLE[])[pl.d + 1] * pl.sign) AS proj
            FROM embeddings e2, planes pl
            GROUP BY e2.vec_id, pl.p
        ) pr ON pr.vec_id = e.vec_id
        GROUP BY e.vec_id
    )
"""


@query(
    "ann_lsh_topk",
    oracle=f"""
    WITH {_LSH_BUCKET_SQL},
    q AS (
        SELECT b.vec_id AS query_id, e.embedding::DOUBLE[] AS qv, b.bucket
        FROM buckets b JOIN embeddings e ON e.vec_id = b.vec_id
        WHERE b.vec_id % 50 = 0
    ),
    c AS (
        SELECT b.vec_id AS neighbor_id, e.embedding::DOUBLE[] AS cv, b.bucket
        FROM buckets b JOIN embeddings e ON e.vec_id = b.vec_id
    ),
    sims AS (
        SELECT q.query_id, c.neighbor_id,
               ROUND(list_cosine_similarity(q.qv, c.cv), 6) AS cos_sim
        FROM q JOIN c ON q.bucket = c.bucket
        WHERE q.query_id <> c.neighbor_id
    ),
    ranked AS (
        SELECT query_id, neighbor_id, cos_sim,
               ROW_NUMBER() OVER (
                   PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id
               ) AS rank
        FROM sims
    )
    SELECT query_id, neighbor_id, cos_sim, rank FROM ranked WHERE rank <= 5
    """,
)
def ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN top-5 via sign-random-projection buckets (8 md5-derived
    hyperplanes) + exact re-rank inside the bucket — the scale path
    (bucket join replaces the cross join)."""
    emb = load_table(spark, "embeddings", sf_dir)
    queries = emb.filter(F.col("vec_id") % 50 == 0)
    return S.lsh_topk(emb, queries, num_planes=8, k=5).select(
        "query_id", "neighbor_id", "cos_sim", "rank"
    )


@query(
    "embedding_near_dup",
    oracle=f"""
    WITH base AS (
        SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
        UNION ALL
        SELECT vec_id + 100000,
               list_transform(embedding::DOUBLE[], x -> x * 0.5)
        FROM embeddings
    ),
    planes AS ({_srp_planes_sql(8)}),
    buckets AS (
        SELECT pr.vec_id,
               SUM(CASE WHEN pr.proj > 0 THEN CAST(pow(2, pr.p) AS BIGINT) ELSE 0 END) AS bucket
        FROM (
            SELECT b2.vec_id, pl.p, SUM(b2.v[pl.d + 1] * pl.sign) AS proj
            FROM base b2, planes pl
            GROUP BY b2.vec_id, pl.p
        ) pr
        GROUP BY pr.vec_id
    )
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           ROUND(list_cosine_similarity(ba.v, bb.v), 6) AS cos_sim
    FROM buckets a
    JOIN buckets b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
    JOIN base ba ON ba.vec_id = a.vec_id
    JOIN base bb ON bb.vec_id = b.vec_id
    WHERE ROUND(list_cosine_similarity(ba.v, bb.v), 6) >= 0.95
    """,
)
def embedding_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (corpus ∪ scaled copies:
    cosine-invariant, so every copy pair is a guaranteed near-dup) via
    SRP-bucket blocking + exact threshold."""
    emb = load_table(spark, "embeddings", sf_dir)
    dbl = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    base = emb.select(F.col("vec_id"), dbl.alias("embedding")).unionByName(
        emb.select(
            (F.col("vec_id") + 100000).alias("vec_id"),
            F.transform(dbl, lambda x: x * 0.5).alias("embedding"),
        )
    )
    return S.cosine_near_dup_pairs(base, num_planes=8, threshold=0.95).select(
        "id_a", "id_b", "cos_sim"
    )


@query(
    "semdedup_cells",
    oracle="""
    WITH base AS (
        SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
        UNION ALL
        SELECT vec_id + 100000,
               list_transform(embedding::DOUBLE[], x -> x * 0.5)
        FROM embeddings
    ),
    nrm AS (
        SELECT vec_id,
               list_transform(v, x -> x / sqrt(list_dot_product(v, v))) AS v
        FROM base
    ),
    cent AS (SELECT vec_id AS cid, v AS cv FROM nrm ORDER BY vec_id LIMIT 16),
    assign AS (
        SELECT vec_id, cid AS cell FROM (
            SELECT n.vec_id, c.cid,
                   ROW_NUMBER() OVER (
                       PARTITION BY n.vec_id
                       ORDER BY ROUND(list_dot_product(n.v, c.cv), 9) DESC, c.cid
                   ) AS rn
            FROM nrm n CROSS JOIN cent c
        ) WHERE rn = 1
    ),
    dropped AS (
        SELECT DISTINCT sb.vec_id
        FROM assign sa
        JOIN assign sb ON sa.cell = sb.cell AND sa.vec_id < sb.vec_id
        JOIN nrm na ON na.vec_id = sa.vec_id
        JOIN nrm nb ON nb.vec_id = sb.vec_id
        WHERE ROUND(list_dot_product(na.v, nb.v), 6) >= CAST(0.95 AS DOUBLE)
    )
    SELECT a.cell,
           CAST(COUNT(*) AS BIGINT) AS n_vecs,
           CAST(SUM(CASE WHEN d.vec_id IS NOT NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_dropped,
           CAST(SUM(CASE WHEN d.vec_id IS NOT NULL THEN a.vec_id ELSE 0 END)
                AS BIGINT) AS dropped_id_sum
    FROM assign a LEFT JOIN dropped d ON d.vec_id = a.vec_id
    GROUP BY a.cell ORDER BY a.cell
    """,
)
def semdedup_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup (Abbas et al. 2023) per-cluster prune report
    (`similarity.semdedup_flags`): corpus ∪ 0.5-scaled copies (scaled
    copies normalize to bit-identical unit vectors, so every copy is
    a guaranteed within-cell exact near-dup — planted ground truth),
    k-means-cell blocking bounds the pair scan, each ε-neighborhood
    keeps its min-id exemplar. Per cell: vector count, dropped count,
    exact integer checksum of the dropped ids."""
    emb = load_table(spark, "embeddings", sf_dir)
    dbl = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    base = emb.select(F.col("vec_id"), dbl.alias("embedding")).unionByName(
        emb.select(
            (F.col("vec_id") + 100000).alias("vec_id"),
            F.transform(dbl, lambda x: x * 0.5).alias("embedding"),
        )
    )
    flags = S.semdedup_flags(base, num_centroids=16, threshold=0.95)
    return (
        flags.groupBy("cell")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_vecs"),
            F.sum(F.when(F.col("dropped"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_dropped"),
            F.sum(F.when(F.col("dropped"), F.col("id")).otherwise(F.lit(0)))
            .cast("bigint")
            .alias("dropped_id_sum"),
        )
        .orderBy("cell")
    )


_GOPHER_STOP_SQL = " + ".join(
    "(CASE WHEN list_contains(string_split_regex(trim(lower(t)), '\\s+'), "
    f"'{s}') THEN 1 ELSE 0 END)"
    for s in ("the", "a", "and", "of", "to")
)


@query(
    "gopher_quality_rules",
    oracle=f"""
    WITH aug AS (
        SELECT doc_id, lang,
               CASE doc_id % 5
                   WHEN 1 THEN '- ' || text
                        || chr(10) || '- filler item'
                        || chr(10) || '- filler item'
                        || chr(10) || '- filler item'
                   WHEN 2 THEN text || repeat(' 42', 40)
                   WHEN 3 THEN text || repeat(' #', 20)
                   WHEN 4 THEN text || ' ...'
                   ELSE text END AS t
        FROM documents
    ),
    m AS (
        SELECT lang,
               len(string_split_regex(trim(lower(t)), '\\s+')) AS n_words,
               length(regexp_replace(t, '\\s', '', 'g')) AS chars,
               length(t) - length(replace(t, '#', '')) AS n_hash,
               CAST((length(t) - length(replace(t, '...', ''))) / 3 AS BIGINT)
                   AS n_ell,
               len(string_split(t, chr(10))) AS n_lines,
               len(list_filter(string_split(t, chr(10)),
                               x -> x LIKE '- %')) AS n_bullet,
               len(list_filter(string_split(t, chr(10)),
                               x -> x LIKE '%...')) AS n_ell_lines,
               len(list_filter(string_split_regex(trim(lower(t)), '\\s+'),
                               x -> regexp_matches(x, '[a-zA-Z]'))) AS n_alpha,
               {_GOPHER_STOP_SQL} AS n_stop
        FROM aug
    ),
    f AS (
        SELECT lang,
               (n_words < 50 OR n_words > 100000) AS fail_words,
               (chars < 3 * n_words OR chars > 10 * n_words) AS fail_mwl,
               (10 * (n_hash + n_ell) > n_words) AS fail_symbol,
               (10 * n_bullet > 9 * n_lines) AS fail_bullet,
               (10 * n_ell_lines > 3 * n_lines) AS fail_ellipsis,
               (5 * n_alpha < 4 * n_words) AS fail_alpha,
               (n_stop < 2) AS fail_stop
        FROM m
    )
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(CASE WHEN fail_words THEN 1 ELSE 0 END) AS BIGINT)
               AS n_fail_words,
           CAST(SUM(CASE WHEN fail_mwl THEN 1 ELSE 0 END) AS BIGINT)
               AS n_fail_mwl,
           CAST(SUM(CASE WHEN fail_symbol THEN 1 ELSE 0 END) AS BIGINT)
               AS n_fail_symbol,
           CAST(SUM(CASE WHEN fail_bullet THEN 1 ELSE 0 END) AS BIGINT)
               AS n_fail_bullet,
           CAST(SUM(CASE WHEN fail_ellipsis THEN 1 ELSE 0 END) AS BIGINT)
               AS n_fail_ellipsis,
           CAST(SUM(CASE WHEN fail_alpha THEN 1 ELSE 0 END) AS BIGINT)
               AS n_fail_alpha,
           CAST(SUM(CASE WHEN fail_stop THEN 1 ELSE 0 END) AS BIGINT)
               AS n_fail_stop,
           CAST(SUM(CASE WHEN NOT (fail_words OR fail_mwl OR fail_symbol
                                   OR fail_bullet OR fail_ellipsis
                                   OR fail_alpha OR fail_stop)
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_pass
    FROM f GROUP BY lang ORDER BY lang
    """,
)
def gopher_quality_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher rule-battery report (`text.gopher_rules`, Rae et al.
    2021 §A1.1): per-language counts of documents failing each of the
    seven structural quality rules. Every threshold is an exact
    integer comparison (10·n_sym > n_words, never a float ratio), so
    the flags are bit-stable across engines with no flip-margin
    hazard. The fixture corpus contains none of the defect shapes, so
    four are planted deterministically from doc_id (bullet-wrapped,
    numeric-flood, symbol-flood, ellipsis-tail — BOTH engines build
    the same string); word-count and stopword rules fire on natural
    corpus variation. Pure projection + one map-side-combinable
    aggregate."""
    docs = load_table(spark, "documents", sf_dir)
    mod = F.col("doc_id") % 5
    aug = (
        F.when(
            mod == 1,
            F.concat(
                F.lit("- "),
                F.col("text"),
                F.lit("\n- filler item\n- filler item\n- filler item"),
            ),
        )
        .when(mod == 2, F.concat(F.col("text"), F.lit(" 42" * 40)))
        .when(mod == 3, F.concat(F.col("text"), F.lit(" #" * 20)))
        .when(mod == 4, F.concat(F.col("text"), F.lit(" ...")))
        .otherwise(F.col("text"))
    )
    flags = T.gopher_rules("__t")
    pass_col = None
    for c in flags.values():
        pass_col = c if pass_col is None else (pass_col | c)
    aggs = [F.count(F.lit(1)).cast("bigint").alias("n_docs")]
    for name, c in flags.items():
        aggs.append(
            F.sum(F.when(c, 1).otherwise(0)).cast("bigint").alias(f"n_{name}")
        )
    aggs.append(
        F.sum(F.when(~pass_col, 1).otherwise(0)).cast("bigint").alias("n_pass")
    )
    return (
        docs.withColumn("__t", aug)
        .groupBy("lang")
        .agg(*aggs)
        .orderBy("lang")
    )


@query(
    "upsample_epochs_by_source",
    oracle="""
    WITH b AS (
        SELECT source, doc_id,
               CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || 'epochs'),
                                    1, 8)) AS BIGINT) % 1000000 AS bucket,
               CAST(substr(source, 4, 10) AS INTEGER) % 4 AS k
        FROM documents
    ),
    n AS (
        SELECT source, doc_id,
               (CASE WHEN k >= 2 THEN 2 ELSE 1 END
                + CASE WHEN k % 2 = 1 AND bucket < 500000
                       THEN 1 ELSE 0 END) AS n_copies
        FROM b
    ),
    e AS (
        SELECT source, doc_id, CAST(r.i AS BIGINT) AS epoch
        FROM n, UNNEST(range(n_copies)) AS r(i)
    )
    SELECT source,
           CAST(SUM(CASE WHEN epoch = 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_docs,
           CAST(COUNT(*) AS BIGINT) AS n_emitted,
           CAST(SUM(doc_id) AS BIGINT) AS emitted_docid_sum
    FROM e GROUP BY source ORDER BY source
    """,
)
def upsample_epochs_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fractional-epoch upsampling report (`sampling.upsample_epochs`):
    each source is replicated to 1.0/1.5/2.0/2.5 epochs (derived from
    its source number), the fractional remainder chosen by the same
    deterministic hash-bucket machinery as the split/mix family — the
    SAME rows get the extra copy on every run and in both engines.
    Per source: doc count, emitted row count, exact checksum over the
    replicated stream. The fan-out is a narrow explode — no shuffle
    until the reporting aggregate."""
    docs = load_table(spark, "documents", sf_dir).select("source", "doc_id")
    epochs = {f"src{k}": 1.0 + (k % 4) * 0.5 for k in range(20)}
    up = SA.upsample_epochs(docs, "doc_id", "source", epochs)
    return (
        up.groupBy("source")
        .agg(
            F.sum(F.when(F.col("epoch") == 0, 1).otherwise(0))
            .cast("bigint")
            .alias("n_docs"),
            F.count(F.lit(1)).cast("bigint").alias("n_emitted"),
            F.sum("doc_id").cast("bigint").alias("emitted_docid_sum"),
        )
        .orderBy("source")
    )


_IVF_NRM_SQL = """
    nrm AS (
        SELECT vec_id,
               list_transform(embedding::DOUBLE[],
                   x -> x / sqrt(list_dot_product(embedding::DOUBLE[],
                                                  embedding::DOUBLE[]))) AS v
        FROM embeddings
    ),
    cent AS (SELECT vec_id AS cid, v AS cv FROM nrm ORDER BY vec_id LIMIT 16)
"""

#: Shared IVF cell index CTEs over {_IVF_NRM_SQL}'s nrm/cent:
#: ``assign`` (every vector's nearest cell — 9dp-rounded dot, min-cid
#: tiebreak) and ``probes`` (each query's nprobe=2 nearest cells).
#: One copy so the assignment tiebreak can never drift between the
#: IVF and IVF-PQ oracles.
_IVF_ASSIGN_PROBES_SQL = """
    assign AS (
        SELECT vec_id, cid AS cell FROM (
            SELECT n.vec_id, c.cid,
                   ROW_NUMBER() OVER (
                       PARTITION BY n.vec_id
                       ORDER BY ROUND(list_dot_product(n.v, c.cv), 9) DESC, c.cid
                   ) AS rn
            FROM nrm n CROSS JOIN cent c
        ) WHERE rn = 1
    ),
    probes AS (
        SELECT vec_id AS query_id, cid AS cell FROM (
            SELECT n.vec_id, c.cid,
                   ROW_NUMBER() OVER (
                       PARTITION BY n.vec_id
                       ORDER BY ROUND(list_dot_product(n.v, c.cv), 9) DESC, c.cid
                   ) AS rn
            FROM nrm n CROSS JOIN cent c
            WHERE n.vec_id % 50 = 0
        ) WHERE rn <= 2
    )
"""


@query(
    "ann_ivf_topk",
    oracle=f"""
    WITH {_IVF_NRM_SQL},
    {_IVF_ASSIGN_PROBES_SQL},
    sims AS (
        SELECT p.query_id, a.vec_id AS neighbor_id,
               ROUND(list_dot_product(qn.v, cn.v), 6) AS cos_sim
        FROM probes p
        JOIN assign a ON a.cell = p.cell
        JOIN nrm qn ON qn.vec_id = p.query_id
        JOIN nrm cn ON cn.vec_id = a.vec_id
        WHERE p.query_id <> a.vec_id
    ),
    ranked AS (
        SELECT query_id, neighbor_id, cos_sim,
               ROW_NUMBER() OVER (
                   PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id
               ) AS rank
        FROM sims
    )
    SELECT query_id, neighbor_id, cos_sim, rank FROM ranked WHERE rank <= 5
    """,
)
def ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN top-5 via an IVF index (16 deterministic centroids, 2-cell
    probe) — the second scale path next to LSH. The corpus is assigned
    to cells in one shuffle-free pass (centroids are plan literals);
    candidates come from a cell-keyed join."""
    emb = load_table(spark, "embeddings", sf_dir)
    queries = emb.filter(F.col("vec_id") % 50 == 0)
    return S.ivf_topk_arrow(emb, queries, k=5, num_centroids=16, nprobe=2).select(
        "query_id", "neighbor_id", "cos_sim", "rank"
    )


@query(
    "embedding_centroids_by_label",
    oracle="""
    SELECT label, CAST(r.i AS INTEGER) AS pos,
           ROUND(CAST(SUM(CAST(e.embedding[r.i + 1] AS DECIMAL(28,12)))
                      AS DOUBLE) / COUNT(*), 6) AS coord,
           COUNT(*) AS n_vectors
    FROM embeddings e, UNNEST(range(len(e.embedding))) AS r(i)
    GROUP BY label, pos
    ORDER BY label, pos
    """,
)
def embedding_centroids_by_label(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label centroid of the embedding column (vector aggregation
    in long form): posexplode → one map-side-combinable mean per
    (label, dimension). The shuffle carries ≤ labels × dims rows
    regardless of corpus size — the aggregation shape for class
    prototypes / cluster summaries over 100 TB of embeddings.
    Dimension sums go through DECIMAL(28,12) so fp summation order
    cannot move the rounded coordinate on either engine."""
    emb = load_table(spark, "embeddings", sf_dir)
    ex = emb.select(
        "label",
        F.posexplode(F.col("embedding").cast("array<double>")).alias("pos", "x"),
    )
    return (
        ex.groupBy("label", "pos")
        .agg(
            F.round(
                F.sum(F.col("x").cast("decimal(28,12)")).cast("double")
                / F.count(F.lit(1)),
                6,
            ).alias("coord"),
            F.count(F.lit(1)).alias("n_vectors"),
        )
        .orderBy("label", "pos")
    )


@query(
    "ivf_kmeans_refined_centroids",
    oracle=f"""
    WITH {_IVF_NRM_SQL},
    assign AS (
        SELECT vec_id, cid AS cell FROM (
            SELECT n.vec_id, c.cid,
                   ROW_NUMBER() OVER (
                       PARTITION BY n.vec_id
                       ORDER BY ROUND(list_dot_product(n.v, c.cv), 9) DESC, c.cid
                   ) AS rn
            FROM nrm n CROSS JOIN cent c
        ) WHERE rn = 1
    ),
    joined AS (
        -- explicit equi-join BEFORE the lateral unnest: the former
        -- comma-join form (FROM assign a, nrm n, UNNEST(...) WHERE
        -- n.vec_id = a.vec_id) defeated DuckDB's join recognition and
        -- evaluated as a filtered CROSS PRODUCT — >550 s at the 10x
        -- fixture (20k vectors) vs 3.7 s for this form, the whole
        -- cause of the round-10 battery's 240 s oracle timeout
        SELECT a.cell, n.v FROM assign a JOIN nrm n ON n.vec_id = a.vec_id
    )
    SELECT j.cell, CAST(r.i AS INTEGER) AS pos,
           ROUND(CAST(SUM(CAST(j.v[r.i + 1] AS DECIMAL(28,12)))
                      AS DOUBLE) / COUNT(*), 6) AS coord,
           COUNT(*) AS n_members
    FROM joined j, UNNEST(range(len(j.v))) AS r(i)
    GROUP BY j.cell, pos
    ORDER BY j.cell, pos
    """,
)
def ivf_kmeans_refined_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One Lloyd step over the deterministic IVF seeds
    (``similarity.kmeans_refine``) — the centroid-training operator
    that upgrades the IVF index from seeded to refined. Assignment is
    a plan literal (no join/shuffle); the per-cell dimension means are
    one map-side-combinable aggregate."""
    emb = load_table(spark, "embeddings", sf_dir)
    return S.kmeans_refine(emb, num_centroids=16)


@query(
    "token_hist_by_lang",
    oracle="""
    WITH t AS (
        SELECT lang,
               CASE WHEN trim(text) = '' THEN 0
                    ELSE len(string_split_regex(trim(lower(text)), '\\s+'))
               END AS n_tok,
               len(regexp_extract_all(lower(text),
                   '[a-z]+|[0-9]+|[^a-z0-9\\s]')) AS n_bpe
        FROM documents
    )
    SELECT lang, COUNT(*) AS n_docs,
           CAST(SUM(n_tok) AS BIGINT) AS total_tokens,
           ROUND(quantile_cont(n_tok, 0.5), 4) AS p50_tokens,
           ROUND(quantile_cont(n_tok, 0.9), 4) AS p90_tokens,
           CAST(SUM(n_bpe) AS BIGINT) AS total_bpe_tokens
    FROM t GROUP BY lang ORDER BY lang
    """,
)
def token_hist_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-count accounting per language — the corpus-budget numbers
    a pretraining data pipeline reports (docs, whitespace tokens,
    exact p50/p90 token lengths, BPE-ish word-piece estimate). Exact
    percentiles for oracle parity; at 100 TB swap to
    ``approx_percentile`` (t-digest, map-side combinable)."""
    docs = load_table(spark, "documents", sf_dir)
    t = docs.select(
        "lang",
        T.token_count(F.col("text")).alias("n_tok"),
        T.bpe_ish_token_count(F.col("text")).alias("n_bpe"),
    )
    return (
        t.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tok").cast("bigint").alias("total_tokens"),
            F.round(F.expr("percentile(n_tok, 0.5)"), 4).alias("p50_tokens"),
            F.round(F.expr("percentile(n_tok, 0.9)"), 4).alias("p90_tokens"),
            F.sum("n_bpe").cast("bigint").alias("total_bpe_tokens"),
        )
        .orderBy("lang")
    )


# ---------------------------------------------------------------------------
# CDC output projections
# ---------------------------------------------------------------------------


@query(
    "cdc_debezium_envelope",
    oracle="""
    WITH ev AS (
        SELECT 'c' AS op, c_custkey, CAST(c_custkey % 1000 AS BIGINT) AS txid,
               CAST(c_custkey AS BIGINT) AS lsn,
               CAST(c_acctbal AS DOUBLE) AS after_acctbal
        FROM customer
        UNION ALL
        SELECT 'u', c_custkey, CAST(2000 AS BIGINT),
               CAST(c_custkey + 10000000 AS BIGINT),
               CAST(c_acctbal AS DOUBLE) + 1000.0
        FROM customer WHERE c_custkey % 3 = 0
        UNION ALL
        SELECT 'd', c_custkey, CAST(3000 AS BIGINT),
               CAST(c_custkey + 20000000 AS BIGINT), NULL
        FROM customer WHERE c_custkey % 7 = 0
    )
    SELECT 'cdc.public.customer' AS topic,
           '{"c_custkey":"' || CAST(c_custkey AS VARCHAR) || '"}' AS key,
           op, lsn, txid,
           epoch_ms(TIMESTAMP '2026-01-01 00:00:00') AS ts_ms,
           'cdc.public.customer.Envelope' AS envelope_name,
           after_acctbal
    FROM ev
    """,
)
def cdc_debezium_envelope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Debezium-style Kafka envelope projection over the synthesized
    customer event stream (reference ``kafka.rs:215-292``) — the
    entire Kafka sink payload path as one JVM-side projection.

    Field-comparison form: the comparable fields are re-extracted from
    the *produced JSON text* (``get_json_object``), so the oracle
    verifies what the envelope actually encodes — topic routing, key
    JSON, op/lsn/txid ordering metadata, commit ts_ms, schema-block
    name, and a data column riding inside ``after``. ``after_acctbal``
    is cast back to double: the JSON carries Java's shortest-roundtrip
    rendering, so value equality (not string-format parity) is the
    correct cross-engine contract. Raw (topic, key, value) output
    remains available via ``functions.envelope.to_debezium``.
    """
    from pg2any_spark.functions.envelope import to_debezium
    from pg2any_spark.sources.cdc_gen import synth_customer_events

    env = to_debezium(synth_customer_events(spark, sf_dir))
    return env.select(
        "topic",
        "key",
        F.get_json_object("value", "$.payload.op").alias("op"),
        F.get_json_object("value", "$.payload.source.lsn").cast("long").alias("lsn"),
        F.get_json_object("value", "$.payload.source.txId").cast("long").alias("txid"),
        F.get_json_object("value", "$.payload.ts_ms").cast("long").alias("ts_ms"),
        F.get_json_object("value", "$.schema.name").alias("envelope_name"),
        F.get_json_object("value", "$.payload.after.c_acctbal")
        .cast("double")
        .alias("after_acctbal"),
    )


# ---------------------------------------------------------------------------
# multimodal
# ---------------------------------------------------------------------------


@query(
    "media_metadata",
    oracle="""
    SELECT doc_id AS asset_id,
           CASE WHEN doc_id % 3 = 0 THEN 'image'
                WHEN doc_id % 3 = 1 THEN 'audio'
                ELSE 'video' END AS media_type,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           md5(text) AS payload_md5,
           CAST(doc_id % 640 + 16 AS INTEGER) AS width,
           CAST(doc_id % 480 + 16 AS INTEGER) AS height,
           ROUND(CAST(n_chars AS DOUBLE) * 10.0, 2) AS duration_ms,
           CASE WHEN doc_id % 3 = 0 THEN 'png'
                WHEN doc_id % 3 = 1 THEN 'flac'
                ELSE 'h264' END AS codec
    FROM documents
    """,
)
def media_metadata_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary media column + typed metadata, no decode: byte length +
    content hash stay JVM-side; payload pruned when unused."""
    return M.media_metadata(M.synth_media(spark, sf_dir))


@query(
    "media_image_features",
    oracle="""
    WITH img AS (
        SELECT doc_id AS asset_id, text FROM documents WHERE doc_id % 3 = 0
    ),
    h AS (
        SELECT asset_id, md5(text) AS hx,
               octet_length(encode(text)) AS n_bytes
        FROM img
    ),
    b AS (
        SELECT asset_id, n_bytes, hx,
               list_transform(range(16), i ->
                   (strpos('0123456789abcdef',
                           substr(hx, CAST(2 * i + 1 AS INTEGER), 1)) - 1) * 16
                 + (strpos('0123456789abcdef',
                           substr(hx, CAST(2 * i + 2 AS INTEGER), 1)) - 1)
               ) AS dg
        FROM h
    )
    SELECT asset_id,
           CAST(n_bytes AS INTEGER) AS n_bytes,
           CAST(16 + dg[1] * 4 AS INTEGER) AS fake_width,
           CAST(16 + dg[2] * 4 AS INTEGER) AS fake_height,
           ROUND(list_sum(dg) / 4080.0, 6) AS brightness,
           hx AS payload_md5
    FROM b
    """,
)
def media_image_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batched mapInPandas feature extraction over image
    payloads. The fake decoder is a pure function of ``md5(payload)``
    (``multimodal._fake_image_features``), so the oracle reproduces it
    byte-for-byte in SQL: hex digits → digest bytes via strpos,
    width/height from bytes 0/1, brightness = mean(digest)/255."""
    return M.extract_image_features(M.synth_media(spark, sf_dir), fake=True)


@query(
    "media_frame_samples",
    oracle="""
    SELECT v.doc_id AS asset_id,
           CAST(u.i // 64 AS INTEGER) AS frame_idx,
           md5(substr(v.text, CAST(u.i + 1 AS INTEGER), 64)) AS frame_md5
    FROM (SELECT doc_id, text FROM documents WHERE doc_id % 3 = 2) v,
         UNNEST(range(0, greatest(length(v.text), 1), 64)) AS u(i)
    """,
)
def media_frame_samples(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-sampling fan-out (1 video row → N frame rows) through
    mapInPandas. Fixture text is pure ASCII, so DuckDB's character
    ``substr`` equals the byte slice the sampler hashes — the oracle
    reproduces every frame_md5 exactly."""
    return M.sample_frames(M.synth_media(spark, sf_dir), every_n_bytes=64)


@query(
    "media_resize",
    oracle="""
    WITH img AS (
        SELECT doc_id AS asset_id, md5(text) AS h0
        FROM documents WHERE doc_id % 3 = 0
    ),
    c1 AS (SELECT asset_id, md5(h0) AS h1 FROM img),
    c2 AS (SELECT asset_id, h1, md5(h1) AS h2 FROM c1),
    c3 AS (SELECT asset_id, h1, h2, md5(h2) AS h3 FROM c2),
    c4 AS (SELECT asset_id, h1, h2, h3, md5(h3) AS h4 FROM c3)
    SELECT asset_id,
           CAST(64 AS INTEGER) AS width,
           CAST(64 AS INTEGER) AS height,
           CAST(64 AS INTEGER) AS n_bytes,
           h1 || h2 || h3 || h4 AS payload_hex
    FROM c4
    """,
)
def media_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resize-to-64×64 over image assets via mapInPandas; payload size
    bound to target dims, width/height metadata updated in lockstep.

    Projects ``payload_hex`` (lowercase hex of the resized bytes)
    rather than the raw binary column: blob canonicalization differs
    across engines, hex text does not — the oracle recomputes the
    md5-hex-chain payload (4 × 16-byte links for 64 output bytes)."""
    out = M.resize_image(M.synth_media(spark, sf_dir), 64, 64, fake=True)
    return out.select(
        "asset_id",
        "width",
        "height",
        F.length("payload").cast("int").alias("n_bytes"),
        F.lower(F.hex("payload")).alias("payload_hex"),
    )


@query(
    "media_audio_features",
    oracle="""
    WITH p AS (
        SELECT vec_id AS asset_id,
               4000 + (vec_id % 5) * 2000 AS n,
               100 + (label % 8) * 50 AS f
        FROM embeddings
    ),
    s AS (
        SELECT asset_id, n,
               ((r.i * f) % 8000) * 60000 // 8000 - 30000 AS x
        FROM p, UNNEST(range(n)) AS r(i)
    )
    SELECT asset_id,
           8000 AS sample_rate,
           CAST(n AS INT) AS n_samples,
           ROUND(n / 8000.0, 4) AS duration_s,
           ROUND(sqrt(CAST(SUM(x * x) AS DOUBLE) / n), 4) AS rms,
           CAST(MAX(ABS(x)) AS INT) AS peak
    FROM s GROUP BY asset_id, n
    """,
)
def media_audio_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio modality plumbing end-to-end: synthesize one mono 16-bit
    WAV per embeddings row (real RIFF container, integer-exact
    sawtooth waveform), then parse the bytes back and extract
    duration / RMS / peak — both legs Arrow-batched ``mapInPandas``,
    no row-Python. The oracle recomputes every sample closed-form in
    SQL; RMS accumulates in exact int64 on both sides, so even the
    float features are bit-deterministic across engines (no summation
    -order hazard — see operators.multimodal.extract_audio_features).
    """
    return M.extract_audio_features(M.synth_audio(spark, sf_dir)).select(
        "asset_id", "sample_rate", "n_samples", "duration_s", "rms", "peak"
    )


#: The quality-score arithmetic as a bare SQL expression over a
#: column named ``text`` — shared by every oracle that scores quality.
_QUALITY_RAW = f"""
             0.5 * least((CASE WHEN trim(text) = '' THEN 0
                               ELSE len({_TOKS}) END) / 50.0, 1.0)
           + 0.3 * least(5.0 * len(list_filter({_TOKS},
                          t -> list_contains(['the','a','is','and','of'], t)))
                         / greatest(len({_TOKS}), 1), 1.0)
           + 0.2 * (1 - least(5.0 * (length(text)
                          - length(regexp_replace(text, '[.,;:!?]', '', 'g')))
                         / greatest(length(text), 1), 1.0))"""
_QUALITY_EXPR = f"ROUND({_QUALITY_RAW}, 6)"

_QUALITY_SQL = f"""
    SELECT doc_id, lang, {_QUALITY_EXPR} AS quality
    FROM documents
"""


@query(
    "doc_quality_bands",
    oracle=f"""
    WITH q AS ({_QUALITY_SQL})
    SELECT lang,
           CASE WHEN quality >= 0.7 THEN 'high'
                WHEN quality >= 0.4 THEN 'mid' ELSE 'low' END AS band,
           COUNT(*) AS n_docs,
           ROUND(CAST(SUM(CAST(quality AS DECIMAL(18,6))) AS DOUBLE)
                 / COUNT(*), 6) AS avg_quality
    FROM q
    GROUP BY 1, 2
    ORDER BY 1, 2
    """,
)
def doc_quality_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus quality-filter shape (Gopher/C4-style): per-document
    heuristic score (length / stopword / punctuation terms, all
    JVM-side expressions), banded and aggregated per language — the
    keep/drop accounting a pretraining pipeline runs before filtering.
    Per-row score arithmetic is identical IEEE on both engines; the
    banded average sums through DECIMAL(18,6) so group summation order
    cannot move the rounded result."""
    docs = load_table(spark, "documents", sf_dir)
    q = docs.select(
        "lang", T.quality_score(F.col("text")).alias("quality")
    ).withColumn(
        "band",
        F.when(F.col("quality") >= 0.7, "high")
        .when(F.col("quality") >= 0.4, "mid")
        .otherwise("low"),
    )
    return (
        q.groupBy("lang", "band")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(
                F.sum(F.col("quality").cast("decimal(18,6)")).cast("double")
                / F.count(F.lit(1)),
                6,
            ).alias("avg_quality"),
        )
        .orderBy("lang", "band")
    )


@query(
    "cdc_envelope_roundtrip",
    oracle="""
    SELECT c_custkey, c_name, c_nationkey,
           CASE WHEN c_custkey % 3 = 0 THEN c_acctbal + 1000 ELSE c_acctbal END AS c_acctbal,
           c_mktsegment
    FROM customer
    WHERE c_custkey % 7 <> 0
    """,
)
def cdc_envelope_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kafka-path round trip: events → Debezium JSON (``to_debezium``)
    → parse back (``from_debezium``) → ordered apply. The final table
    state must equal the direct apply's oracle — proving the envelope
    serde loses nothing the consumer path needs (reference
    ``kafka.rs:215-292`` write side; the read side is ours). JSON
    never leaves the JVM: to_json/from_json both codegen."""
    from pg2any_spark.functions.envelope import from_debezium, to_debezium
    from pg2any_spark.operators.apply import apply_changes
    from pg2any_spark.sources.cdc_gen import synth_customer_events

    events = from_debezium(to_debezium(synth_customer_events(spark, sf_dir)))
    cust = load_table(spark, "customer", sf_dir)
    return apply_changes(
        events, cust.schema, ["c_custkey"], table="customer",
        scan_for_truncate=False,
    )


# ---------------------------------------------------------------------------
# composed training-data pipeline
# ---------------------------------------------------------------------------


@query(
    "training_pipeline_docs",
    oracle=f"""
    WITH corpus AS (
        SELECT doc_id AS id, lang, text FROM documents
        UNION ALL
        SELECT doc_id + 100000 AS id, lang, text FROM documents
    ),
    survivors AS (
        SELECT md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fingerprint,
               min(id) AS id
        FROM corpus GROUP BY fingerprint
    ),
    kept AS (
        SELECT c.id, c.lang, c.text FROM corpus c JOIN survivors s ON c.id = s.id
    ),
    scored AS (
        SELECT id, lang,
               CASE WHEN trim(text) = '' THEN 0 ELSE len({_TOKS}) END AS n_tokens,
               ROUND(
                 0.5 * least((CASE WHEN trim(text) = '' THEN 0
                                   ELSE len({_TOKS}) END) / 50.0, 1.0)
               + 0.3 * least(5.0 * len(list_filter({_TOKS},
                              t -> list_contains(['the','a','is','and','of'], t)))
                             / greatest(len({_TOKS}), 1), 1.0)
               + 0.2 * (1 - least(5.0 * (length(text)
                              - length(regexp_replace(text, '[.,;:!?]', '', 'g')))
                             / greatest(length(text), 1), 1.0)), 6) AS quality,
               {_lang_score_sql("de")} AS s_de,
               {_lang_score_sql("en")} AS s_en,
               {_lang_score_sql("es")} AS s_es,
               {_lang_score_sql("fr")} AS s_fr
        FROM kept
    ),
    labeled AS (
        SELECT id, lang, n_tokens, quality,
               CASE WHEN greatest(s_de, s_en, s_es, s_fr) < 1 THEN 'und'
                    WHEN s_de = greatest(s_de, s_en, s_es, s_fr) THEN 'de'
                    WHEN s_en = greatest(s_en, s_es, s_fr) THEN 'en'
                    WHEN s_es = greatest(s_es, s_fr) THEN 'es'
                    ELSE 'fr' END AS lang_pred
        FROM scored
    )
    SELECT lang, lang_pred, COUNT(*) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
           ROUND(CAST(SUM(CAST(quality AS DECIMAL(18,6))) AS DOUBLE)
                 / COUNT(*), 6) AS avg_quality
    FROM labeled
    WHERE quality >= 0.25 AND lang_pred <> 'und'
    GROUP BY lang, lang_pred ORDER BY lang, lang_pred
    """,
)
def training_pipeline_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end training-data pipeline over a re-crawled (2x
    duplicated) corpus: exact dedup -> language ID -> quality filter
    (>= 0.25, known language) -> per-language token/quality accounting.
    The composition is what a pretraining data job runs before
    tokenization; every stage is JVM-side expressions, and the dedup
    survivor set flows into the scorer via a key join (broadcast-able
    when the survivor set is small, AQE decides)."""
    docs = load_table(spark, "documents", sf_dir).select("doc_id", "lang", "text")
    corpus = docs.selectExpr("doc_id AS id", "lang", "text").unionByName(
        docs.selectExpr("doc_id + 100000 AS id", "lang", "text")
    )
    survivors = D.exact_dedup(corpus, "id", "text").select("id")
    kept = corpus.join(survivors, "id")
    t = F.col("text")
    scored = kept.select(
        "id",
        "lang",
        T.token_count(t).alias("n_tokens"),
        T.quality_score(t).alias("quality"),
        T.lang_id(t).alias("lang_pred"),
    ).filter((F.col("quality") >= 0.25) & (F.col("lang_pred") != "und"))
    return (
        scored.groupBy("lang", "lang_pred")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
            F.round(
                F.sum(F.col("quality").cast("decimal(18,6)")).cast("double")
                / F.count(F.lit(1)),
                6,
            ).alias("avg_quality"),
        )
        .orderBy("lang", "lang_pred")
    )


def _simhash_pairs_ctes() -> str:
    """CTE chain ending in ``pairs(id_a, id_b)`` — SimHash near-dup
    pairs on corpus ∪ mutations, same logic as the
    dedup_simhash_near_pairs oracle."""
    return f"""
    corpus AS ({_MUTATED_CORPUS}),
    tok AS (
        SELECT id, unnest({_TOKS}) AS tok FROM corpus
    ),
    hashed AS (
        SELECT id, CAST(('0x' || substr(md5(tok), 1, 8)) AS BIGINT) AS h FROM tok
    ),
    votes AS (
        SELECT id,
               {_simhash_votes_sql(32)}
        FROM hashed GROUP BY id
    ),
    fp AS (
        SELECT id, CAST({_simhash_fp_sql(32)} AS BIGINT) AS simhash FROM votes
    ),
    blocked AS (
        SELECT id, simhash, b.blk AS block_idx,
               (simhash >> (b.blk * 8)) & 255 AS block_key
        FROM fp, (SELECT unnest(generate_series(0, 3)) AS blk) b
    ),
    pairs AS (
        SELECT DISTINCT a.id AS id_a, b.id AS id_b
        FROM blocked a
        JOIN blocked b ON a.block_idx = b.block_idx
                      AND a.block_key = b.block_key AND a.id < b.id
        WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
    )"""


@query(
    "dedup_dup_groups",
    oracle=f"""
    WITH RECURSIVE {_simhash_pairs_ctes()},
    edges AS (
        SELECT id_a AS src, id_b AS dst FROM pairs
        UNION
        SELECT id_b AS src, id_a AS dst FROM pairs
    ),
    reach(src, dst) AS (
        SELECT src, src AS dst FROM (SELECT DISTINCT src FROM edges)
        UNION
        SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src
    ),
    comp AS (SELECT src AS id, min(dst) AS component FROM reach GROUP BY src)
    SELECT component AS group_id, COUNT(*) AS group_size,
           MAX(id) AS max_member_id
    FROM comp GROUP BY component ORDER BY group_id
    """,
)
def dedup_dup_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-GROUP resolution: SimHash near-dup pairs -> iterative
    min-label-propagation connected components -> one row per
    transitive duplicate group (canonical survivor = min id). The step
    after pair generation that pair-wise dedup queries skip: A~B and
    B~C must retire two documents even when A!~C. Oracle is a DuckDB
    recursive-CTE transitive closure over the identical pair set."""
    corpus = _mutated_corpus(spark, sf_dir)
    fps = D.simhash(corpus, "id", "text", bits=32)
    pairs = D.simhash_hamming_pairs(fps, "id", max_distance=3).select("id_a", "id_b")
    return D.dup_groups(pairs).orderBy("group_id")


@query(
    "split_train_eval",
    oracle="""
    WITH b AS (
        SELECT lang,
               CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || 'split'), 1, 8))
                    AS BIGINT) % 1000000 AS bucket
        FROM documents
    )
    SELECT CASE WHEN bucket < 10000 THEN 'eval'
                WHEN bucket < 20000 THEN 'test'
                ELSE 'train' END AS split,
           lang, COUNT(*) AS n_docs
    FROM b GROUP BY split, lang ORDER BY split, lang
    """,
)
def split_train_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic hash-keyed train/eval/test split (1%/1%/98%):
    a document's split is a pure function of its id, so re-runs and
    corpus growth never migrate rows across the eval boundary (unlike
    randomSplit). Pure projection+filter — no shuffle until the
    reporting groupBy."""
    docs = load_table(spark, "documents", sf_dir).select("doc_id", "lang")
    return (
        SA.assign_split(docs, "doc_id", eval_ppm=10_000, test_ppm=10_000)
        .groupBy("split", "lang")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .orderBy("split", "lang")
    )


@query(
    "mix_weighted_sources",
    oracle="""
    WITH b AS (
        SELECT source, n_chars,
               CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || 'mix'), 1, 8))
                    AS BIGINT) % 1000000 AS bucket
        FROM documents
    )
    SELECT source, COUNT(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS total_chars
    FROM b
    WHERE bucket < CASE source WHEN 'src0' THEN 1000000
                               WHEN 'src1' THEN 500000
                               WHEN 'src2' THEN 250000
                               ELSE 100000 END
    GROUP BY source ORDER BY source
    """,
)
def mix_weighted_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted source mixing: per-source deterministic keep-fractions
    (src0 100%, src1 50%, src2 25%, everything else 10%) — the
    corpus-mix knob of a pretraining pipeline, as a single
    codegen'd filter with no shuffle and no RNG state."""
    docs = load_table(spark, "documents", sf_dir).select("doc_id", "source", "n_chars")
    mixed = SA.stratified_hash_sample(
        docs,
        "doc_id",
        "source",
        {"src0": 1.0, "src1": 0.5, "src2": 0.25},
        default_fraction=0.1,
    )
    return (
        mixed.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
        )
        .orderBy("source")
    )



@query(
    "decontaminate_train_split",
    oracle="""
    WITH tagged AS (
        SELECT source,
               CASE WHEN CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)
                                || 'split'), 1, 8)) AS BIGINT) % 1000000
                         < 20000 THEN 'holdout' ELSE 'train' END AS split,
               md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fp
        FROM documents
    ),
    holdout AS (SELECT DISTINCT fp FROM tagged WHERE split = 'holdout')
    SELECT t.source,
           COUNT(*) AS n_train,
           CAST(SUM(CASE WHEN h.fp IS NOT NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_contaminated,
           CAST(SUM(CASE WHEN h.fp IS NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_clean
    FROM tagged t LEFT JOIN holdout h ON h.fp = t.fp
    WHERE t.split = 'train'
    GROUP BY t.source ORDER BY t.source
    """,
)
def decontaminate_train_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Eval-set decontamination accounting per source: train docs
    whose content fingerprint leaks into the eval/test holdout are
    flagged (``sampling.decontaminate_train``). The holdout set is a
    2% distinct-fingerprint aggregate — broadcast-joined, so the train
    side never shuffles."""
    docs = load_table(spark, "documents", sf_dir)
    flagged = SA.decontaminate_train(docs, "doc_id", "text")
    return (
        flagged.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_train"),
            F.sum(F.col("contaminated").cast("int")).cast("bigint").alias(
                "n_contaminated"
            ),
            F.sum((~F.col("contaminated")).cast("int")).cast("bigint").alias(
                "n_clean"
            ),
        )
        .orderBy("source")
    )


@query(
    "top_ngrams_corpus",
    oracle="""
    WITH toks AS (
        SELECT string_split_regex(trim(lower(text)), '\\s+') AS t
        FROM documents WHERE trim(text) <> ''
    ),
    g AS (
        SELECT t[CAST(r.i + 1 AS INTEGER)] || ' ' ||
               t[CAST(r.i + 2 AS INTEGER)] || ' ' ||
               t[CAST(r.i + 3 AS INTEGER)] AS ngram
        FROM toks, UNNEST(range(len(t) - 2)) AS r(i)
        WHERE len(t) >= 3
    )
    SELECT ngram, COUNT(*) AS n
    FROM g GROUP BY ngram ORDER BY n DESC, ngram LIMIT 20
    """,
)
def top_ngrams_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top word 3-grams over the corpus (``text.word_ngrams``):
    boilerplate/contamination screening statistics. Explode →
    map-side-combinable count → deterministic top-k
    (TakeOrderedAndProject); the shuffle carries one row per distinct
    n-gram per partition, never the exploded corpus."""
    docs = load_table(spark, "documents", sf_dir)
    g = docs.select(F.explode(T.word_ngrams(F.col("text"), 3)).alias("ngram"))
    return (
        g.groupBy("ngram")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), "ngram")
        .limit(20)
    )


@query(
    "tfidf_top_terms_per_doc",
    oracle="""
    WITH base AS (
        SELECT doc_id, text FROM documents WHERE trim(text) <> ''
    ),
    toks AS (
        SELECT doc_id,
               unnest(string_split_regex(trim(lower(text)), '\\s+')) AS term
        FROM base
    ),
    tf AS (
        SELECT doc_id, term, COUNT(*) AS tf
        FROM toks WHERE term <> '' GROUP BY doc_id, term
    ),
    df AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
    n AS (SELECT COUNT(*) AS n_docs FROM base),
    scored AS (
        SELECT tf.doc_id, tf.term, tf.tf,
               ROUND(tf.tf * ln(CAST(n.n_docs AS DOUBLE) / df.df), 6) AS tfidf
        FROM tf JOIN df ON tf.term = df.term CROSS JOIN n
    )
    SELECT doc_id, term, tf, tfidf, rnk
    FROM (
        SELECT *, ROW_NUMBER() OVER (
            PARTITION BY doc_id ORDER BY tfidf DESC, term
        ) AS rnk
        FROM scored
    )
    WHERE rnk <= 3
    ORDER BY doc_id, rnk
    """,
)
def tfidf_top_terms_per_doc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 TF-IDF terms per document (`text.tfidf_top_terms`):
    keyword extraction / boilerplate screening. Two shuffle stages
    ((doc,term) count, vocabulary df) + broadcast corpus size; ranks
    tie-break on the 6-dp-rounded score so both engines agree."""
    docs = load_table(spark, "documents", sf_dir)
    return T.tfidf_top_terms(docs, "doc_id", "text", k=3).orderBy("doc_id", "rnk")


@query(
    "pii_redaction_docs",
    oracle="""
    WITH aug AS (
        SELECT doc_id,
               CASE WHEN doc_id % 2 = 0 THEN
                   text || ' reach me at user' || CAST(doc_id AS VARCHAR)
                        || '@example.com or 10.0.'
                        || CAST(doc_id % 256 AS VARCHAR)
                        || '.15 tel 415-555-'
                        || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
               ELSE text END AS text
        FROM documents
    )
    SELECT doc_id,
           regexp_replace(
             regexp_replace(
               regexp_replace(text,
                 '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}', '[EMAIL]', 'g'),
               '\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b', '[IP]', 'g'),
             '\\+?[0-9]{3}[- .][0-9]{3}[- .][0-9]{4}', '[PHONE]', 'g'
           ) AS redacted,
           CAST(len(regexp_extract_all(text,
             '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}')) AS INTEGER) AS n_emails,
           CAST(len(regexp_extract_all(text,
             '\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b')) AS INTEGER) AS n_ips,
           CAST(len(regexp_extract_all(text,
             '\\+?[0-9]{3}[- .][0-9]{3}[- .][0-9]{4}')) AS INTEGER) AS n_phones
    FROM aug ORDER BY doc_id
    """,
)
def pii_redaction_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrub (`text.redact_pii`): emails / IPv4 / phone numbers →
    typed placeholders, plus per-class audit counts. The fixture corpus
    contains no PII, so every other document is deterministically
    augmented with synthetic PII derived from its doc_id — BOTH engines
    build the same string, so the oracle genuinely exercises the
    regexes. Pure chained regexp_replace: codegen'd projection, no
    shuffle."""
    docs = load_table(spark, "documents", sf_dir)
    aug = F.when(
        F.col("doc_id") % 2 == 0,
        F.concat(
            F.col("text"),
            F.lit(" reach me at user"),
            F.col("doc_id").cast("string"),
            F.lit("@example.com or 10.0."),
            (F.col("doc_id") % 256).cast("string"),
            F.lit(".15 tel 415-555-"),
            F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
        ),
    ).otherwise(F.col("text"))
    t = F.col("__aug")
    counts = T.pii_counts(t)
    return (
        docs.withColumn("__aug", aug)
        .select(
            "doc_id",
            T.redact_pii(t).alias("redacted"),
            counts["n_emails"].alias("n_emails"),
            counts["n_ips"].alias("n_ips"),
            counts["n_phones"].alias("n_phones"),
        )
        .orderBy("doc_id")
    )


@query(
    "doc_repetition_stats",
    oracle="""
    WITH toks AS (
        SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS t
        FROM documents WHERE trim(text) <> ''
    ),
    g AS (
        SELECT doc_id,
               t[CAST(r.i + 1 AS INTEGER)] || ' ' ||
               t[CAST(r.i + 2 AS INTEGER)] AS gram
        FROM toks, UNNEST(range(len(t) - 1)) AS r(i)
        WHERE len(t) >= 2
    ),
    per AS (SELECT doc_id, gram, COUNT(*) AS c FROM g GROUP BY doc_id, gram),
    agg AS (
        SELECT doc_id, SUM(c) AS total, COUNT(*) AS n_distinct, MAX(c) AS top
        FROM per GROUP BY doc_id
    )
    SELECT d.doc_id,
           COALESCE(ROUND((agg.total - agg.n_distinct)
                          / CAST(agg.total AS DOUBLE), 6), 0.0) AS dup_ngram_frac,
           COALESCE(ROUND(agg.top / CAST(agg.total AS DOUBLE), 6), 0.0)
               AS top_ngram_share
    FROM documents d LEFT JOIN agg ON d.doc_id = agg.doc_id
    ORDER BY d.doc_id
    """,
)
def doc_repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition quality signals per document
    (`text.repetition_stats`): duplicate-2-gram fraction and modal
    2-gram share — the machine-generated/boilerplate screen. Pure
    per-row array expressions (no shuffle); the oracle recomputes via
    relational unnest+aggregate to prove the expression form."""
    docs = load_table(spark, "documents", sf_dir).withColumn(
        "__grams", T.word_ngrams(F.col("text"), 2)
    )
    stats = T.repetition_stats(F.col("__grams"))
    return docs.select(
        "doc_id",
        stats["dup_ngram_frac"].alias("dup_ngram_frac"),
        stats["top_ngram_share"].alias("top_ngram_share"),
    ).orderBy("doc_id")


@query(
    "decontaminate_semantic",
    oracle=f"""
    WITH train AS (
        SELECT vec_id AS train_id, embedding::DOUBLE[] AS v FROM embeddings
    ),
    ev AS (
        SELECT vec_id + 100000 AS eval_id,
               list_transform(embedding::DOUBLE[], x -> x * 0.5) AS v
        FROM embeddings WHERE vec_id % 20 = 0
    ),
    planes AS ({_srp_planes_sql(8)}),
    tb AS (
        SELECT pr.id AS train_id,
               SUM(CASE WHEN pr.proj > 0 THEN CAST(pow(2, pr.p) AS BIGINT)
                        ELSE 0 END) AS bucket
        FROM (
            SELECT t.train_id AS id, pl.p, SUM(t.v[pl.d + 1] * pl.sign) AS proj
            FROM train t, planes pl GROUP BY t.train_id, pl.p
        ) pr GROUP BY pr.id
    ),
    eb AS (
        SELECT pr.id AS eval_id,
               SUM(CASE WHEN pr.proj > 0 THEN CAST(pow(2, pr.p) AS BIGINT)
                        ELSE 0 END) AS bucket
        FROM (
            SELECT e.eval_id AS id, pl.p, SUM(e.v[pl.d + 1] * pl.sign) AS proj
            FROM ev e, planes pl GROUP BY e.eval_id, pl.p
        ) pr GROUP BY pr.id
    ),
    pairs AS (
        SELECT tb.train_id, eb.eval_id,
               ROUND(list_cosine_similarity(t.v, e.v), 6) AS cos_sim
        FROM tb JOIN eb ON tb.bucket = eb.bucket
        JOIN train t ON t.train_id = tb.train_id
        JOIN ev e ON e.eval_id = eb.eval_id
        WHERE ROUND(list_cosine_similarity(t.v, e.v), 6) >= 0.95
    )
    SELECT train_id, eval_id, cos_sim
    FROM (
        SELECT pairs.*, ROW_NUMBER() OVER (
            PARTITION BY train_id ORDER BY cos_sim DESC, eval_id
        ) AS rn FROM pairs
    ) WHERE rn = 1
    ORDER BY train_id
    """,
)
def decontaminate_semantic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semantic decontamination (`similarity.semantic_decontaminate`):
    train vectors near-identical (cosine ≥ 0.95 after SRP-bucket
    blocking) to any eval/benchmark vector, each with its best eval
    match — the embedding-space complement of the 8-gram overlap
    check, catching paraphrases that share no n-gram. Eval here is a
    0.5-scaled copy of every 20th embedding (cosine- and
    bucket-invariant, so every planted contaminant is guaranteed
    found). Candidates come from the bucket equi-join, never
    train × eval."""
    emb = load_table(spark, "embeddings", sf_dir)
    dbl = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    train = emb.select("vec_id", dbl.alias("embedding"))
    ev = emb.filter(F.col("vec_id") % 20 == 0).select(
        (F.col("vec_id") + 100000).alias("vec_id"),
        F.transform(dbl, lambda x: x * 0.5).alias("embedding"),
    )
    return (
        S.semantic_decontaminate(train, ev, threshold=0.95)
        .orderBy("train_id")
    )


@query(
    "decontaminate_ngram_overlap",
    oracle="""
    WITH tagged AS (
        SELECT doc_id, source, text,
               CASE WHEN CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)
                                || 'split'), 1, 8)) AS BIGINT) % 1000000
                         < 20000 THEN 'holdout' ELSE 'train' END AS split
        FROM documents
    ),
    toks AS (
        SELECT doc_id, split, string_split_regex(trim(lower(text)), '\\s+') AS t
        FROM tagged WHERE trim(text) <> ''
    ),
    g AS (
        SELECT doc_id, split,
               t[CAST(r.i + 1 AS INTEGER)] || ' ' || t[CAST(r.i + 2 AS INTEGER)]
               || ' ' || t[CAST(r.i + 3 AS INTEGER)] || ' ' || t[CAST(r.i + 4 AS INTEGER)]
               || ' ' || t[CAST(r.i + 5 AS INTEGER)] || ' ' || t[CAST(r.i + 6 AS INTEGER)]
               || ' ' || t[CAST(r.i + 7 AS INTEGER)] || ' ' || t[CAST(r.i + 8 AS INTEGER)]
               AS gram
        FROM toks, UNNEST(range(len(t) - 7)) AS r(i)
        WHERE len(t) >= 8
    ),
    holdout AS (SELECT DISTINCT gram FROM g WHERE split = 'holdout'),
    bad_ids AS (
        SELECT DISTINCT g.doc_id FROM g JOIN holdout h ON g.gram = h.gram
        WHERE g.split = 'train'
    )
    SELECT t.source,
           COUNT(*) AS n_train,
           CAST(SUM(CASE WHEN b.doc_id IS NOT NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_contaminated
    FROM tagged t LEFT JOIN bad_ids b ON t.doc_id = b.doc_id
    WHERE t.split = 'train'
    GROUP BY t.source ORDER BY t.source
    """,
)
def decontaminate_ngram_overlap_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """8-gram-overlap decontamination accounting per source
    (`sampling.decontaminate_ngram_overlap`) — the stricter screen that
    catches quoted passages, not just whole-document dups. Holdout
    gram set broadcasts; the train corpus never shuffles."""
    docs = load_table(spark, "documents", sf_dir)
    flagged = SA.decontaminate_ngram_overlap(docs, "doc_id", "text", n=8)
    return (
        flagged.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_train"),
            F.sum(F.col("contaminated").cast("int")).cast("bigint").alias(
                "n_contaminated"
            ),
        )
        .orderBy("source")
    )


@query(
    "temperature_mix_by_lang",
    oracle="""
    WITH counts AS (
        SELECT lang, COUNT(*) AS n FROM documents GROUP BY lang
    ),
    tot AS (
        SELECT SUM(n) AS total, SUM(pow(CAST(n AS DOUBLE), 0.5)) AS wsum
        FROM counts
    ),
    thr AS (
        SELECT lang,
               CAST(floor(LEAST(1.0,
                   0.5 * tot.total * pow(CAST(n AS DOUBLE), 0.5)
                   / (tot.wsum * n)) * 1000000) AS BIGINT) AS t
        FROM counts CROSS JOIN tot
    ),
    kept AS (
        SELECT d.lang
        FROM documents d JOIN thr ON d.lang = thr.lang
        WHERE CAST(('0x' || substr(md5(CAST(d.doc_id AS VARCHAR) || 'tmix'),
                    1, 8)) AS BIGINT) % 1000000 < thr.t
    )
    SELECT c.lang, c.n AS n_docs,
           CAST(COUNT(k.lang) AS BIGINT) AS n_kept
    FROM counts c LEFT JOIN kept k ON c.lang = k.lang
    GROUP BY c.lang, c.n ORDER BY c.lang
    """,
)
def temperature_mix_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-balanced sampling accounting per language
    (`sampling.temperature_mix`, alpha=0.5, budget 50%): the dominant
    language is downsampled hardest, small ones keep (nearly) all
    docs — the standard multilingual mixing rule, as a deterministic
    hash filter with broadcast thresholds."""
    docs = load_table(spark, "documents", sf_dir)
    kept = SA.temperature_mix(docs, "doc_id", "lang", alpha=0.5, budget_frac=0.5)
    counts = docs.groupBy("lang").agg(F.count(F.lit(1)).alias("n_docs"))
    kept_counts = kept.groupBy("lang").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_kept")
    )
    return (
        counts.join(kept_counts, "lang", "left")
        .select(
            "lang", "n_docs", F.coalesce("n_kept", F.lit(0)).alias("n_kept")
        )
        .orderBy("lang")
    )


@query(
    "source_lang_profile",
    oracle="""
    WITH per AS (
        SELECT source, lang, COUNT(*) AS n
        FROM documents GROUP BY source, lang
    ),
    tot AS (SELECT source, SUM(n) AS n_docs FROM per GROUP BY source),
    ranked AS (
        SELECT source, lang,
               ROW_NUMBER() OVER (
                   PARTITION BY source ORDER BY n DESC, lang
               ) AS rn
        FROM per
    )
    SELECT t.source,
           CAST(t.n_docs AS BIGINT) AS n_docs,
           CAST(COUNT(p.lang) AS BIGINT) AS n_langs,
           ROUND(-SUM((p.n / CAST(t.n_docs AS DOUBLE))
                      * ln(p.n / CAST(t.n_docs AS DOUBLE))), 6) AS lang_entropy,
           MAX(r.lang) AS top_lang
    FROM per p
    JOIN tot t ON p.source = t.source
    JOIN ranked r ON r.source = p.source AND r.rn = 1
    GROUP BY t.source, t.n_docs
    ORDER BY t.source
    """,
)
def source_lang_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source language profile: doc count, distinct languages,
    Shannon entropy of the language mix, and the modal language
    (deterministic tie-break). The agg-of-agg shape — per-(source,
    lang) counts reduced again per source — keeps both shuffles
    map-side-combinable; entropy is a plain expression over the
    second aggregate."""
    from pyspark.sql import Window

    docs = load_table(spark, "documents", sf_dir)
    per = docs.groupBy("source", "lang").agg(F.count(F.lit(1)).alias("n"))
    w = Window.partitionBy("source").orderBy(F.col("n").desc(), "lang")
    ranked = per.withColumn("rn", F.row_number().over(w))
    p = F.col("n") / F.col("n_docs")
    return (
        ranked.groupBy("source")
        .agg(
            F.sum("n").cast("bigint").alias("n_docs"),
            F.count(F.lit(1)).cast("bigint").alias("n_langs"),
            F.collect_list(F.when(F.col("rn") == 1, F.col("lang"))).alias("__top"),
            F.collect_list(F.struct("n")).alias("__ns"),
        )
        .select(
            "source",
            "n_docs",
            "n_langs",
            F.round(
                -F.aggregate(
                    F.col("__ns"),
                    F.lit(0.0),
                    lambda acc, x: acc
                    + (x["n"] / F.col("n_docs"))
                    * F.log(x["n"] / F.col("n_docs")),
                ),
                6,
            ).alias("lang_entropy"),
            F.element_at("__top", 1).alias("top_lang"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# lexical vs semantic dedup agreement
# ---------------------------------------------------------------------------

_PAIRED_CORPUS = f"""
    SELECT d.doc_id * 4 AS id, d.doc_id AS orig_id, 'orig' AS variant,
           d.text, e.embedding::DOUBLE[] AS embedding
    FROM documents d JOIN embeddings e ON e.vec_id = d.doc_id
    UNION ALL
    SELECT d.doc_id * 4 + 1, d.doc_id, 'both', {_DROP2},
           list_transform(e.embedding::DOUBLE[], x -> x * 0.5)
    FROM documents d JOIN embeddings e ON e.vec_id = d.doc_id
    WHERE d.doc_id % 2 = 0
    UNION ALL
    SELECT d.doc_id * 4 + 2, d.doc_id, 'semantic_only',
           array_to_string(list_reverse({_TOKS}), ' '),
           list_transform(e.embedding::DOUBLE[], x -> x * 0.25)
    FROM documents d JOIN embeddings e ON e.vec_id = d.doc_id
    WHERE d.doc_id % 4 = 1
    UNION ALL
    SELECT d.doc_id * 4 + 3, d.doc_id, 'lexical_only', {_DROP2},
           list_transform(e.embedding::DOUBLE[], x -> -x)
    FROM documents d JOIN embeddings e ON e.vec_id = d.doc_id
    WHERE d.doc_id % 4 = 3
"""


@query(
    "dedup_lexical_semantic_agreement",
    oracle=f"""
    WITH corpus AS ({_PAIRED_CORPUS}),
    sh AS (
        SELECT id, unnest({_SHINGLE_SQL}) AS shingle FROM corpus
    ),
    hashed AS (
        SELECT id,
               CAST(('0x' || substr(md5(shingle), 1, 8)) AS BIGINT) AS h1,
               CAST(('0x' || substr(md5(shingle), 9, 8)) AS BIGINT) AS h2
        FROM sh
    ),
    sig AS (
        SELECT id, {_minhash_sig_sql(12)}
        FROM hashed GROUP BY id
    ),
    bands AS (
        {_band_sql(4, 3)}
    ),
    lex AS (
        SELECT DISTINCT a.id AS id_a, b.id AS id_b
        FROM bands a JOIN bands b
          ON a.band_idx = b.band_idx AND a.band_key = b.band_key AND a.id < b.id
    ),
    planted AS (
        SELECT c.orig_id, c.id AS id_b, c.variant, c.embedding AS emb_b
        FROM corpus c WHERE c.variant <> 'orig'
    ),
    flags AS (
        SELECT p.variant,
               CASE WHEN l.id_a IS NOT NULL THEN 1 ELSE 0 END AS lexical,
               CASE WHEN ROUND(list_cosine_similarity(o.embedding, p.emb_b), 6)
                         >= 0.95 THEN 1 ELSE 0 END AS semantic
        FROM planted p
        JOIN corpus o ON o.orig_id = p.orig_id AND o.variant = 'orig'
        LEFT JOIN lex l ON l.id_a = o.id AND l.id_b = p.id_b
    ),
    agg AS (
        SELECT coalesce(variant, 'all') AS variant,
               COUNT(*) AS n_pairs,
               CAST(SUM(lexical) AS BIGINT) AS n_lexical,
               CAST(SUM(semantic) AS BIGINT) AS n_semantic,
               CAST(SUM(lexical * semantic) AS BIGINT) AS n_both
        FROM flags GROUP BY ROLLUP(variant)
    )
    SELECT variant, n_pairs, n_lexical, n_semantic, n_both,
           CASE WHEN n_lexical + n_semantic - n_both > 0
                THEN ROUND(CAST(n_both AS DOUBLE)
                           / (n_lexical + n_semantic - n_both), 6)
                END AS pair_jaccard
    FROM agg ORDER BY variant
    """,
)
def dedup_lexical_semantic_agreement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lexical-vs-semantic dedup agreement over a corpus with planted
    CONSISTENT text+embedding near-duplicates: per variant class
    (both / lexical_only / semantic_only / all), how many planted
    pairs each detector surfaced and the Jaccard of the two pair
    sets — the end-to-end dedup+similarity QA story (MinHash misses
    paraphrases, cosine misses meaning-flips; this query quantifies
    both on ground truth)."""
    from pg2any_spark.sources.cdc_gen import synth_paired_neardup_corpus

    corpus = synth_paired_neardup_corpus(spark, sf_dir)
    return D.lexical_semantic_agreement(corpus, num_hashes=12, bands=4)


# ---------------------------------------------------------------------------
# int8-quantized ANN recall
# ---------------------------------------------------------------------------


@query(
    "ann_int8_recall",
    oracle="""
    WITH base AS (
        SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
    ),
    dims AS (SELECT UNNEST(range(64)) AS d),
    longf AS (
        SELECT b.vec_id, dims.d, b.v[dims.d + 1] AS x FROM base b, dims
    ),
    stats AS (
        SELECT d, MIN(x) AS mn, MAX(x) AS mx FROM longf GROUP BY d
    ),
    deq AS (
        SELECT l.vec_id, l.d,
               CASE WHEN s.mx > s.mn
                    THEN CAST(GREATEST(-128, LEAST(127,
                             CAST(ROUND((l.x - s.mn) / (s.mx - s.mn) * 255)
                                  AS INT) - 128)) + 128 AS DOUBLE)
                         / 255 * (s.mx - s.mn) + s.mn
                    ELSE CAST(128 AS DOUBLE) / 255 * (s.mx - s.mn) + s.mn
               END AS xq
        FROM longf l JOIN stats s USING (d)
    ),
    deq_vec AS (
        SELECT vec_id, list(xq ORDER BY d) AS v FROM deq GROUP BY vec_id
    ),
    exact_top AS (
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
               ROW_NUMBER() OVER (
                   PARTITION BY q.vec_id
                   ORDER BY ROUND(list_cosine_similarity(q.v, c.v), 6) DESC,
                            c.vec_id
               ) AS rnk
        FROM base q JOIN base c ON q.vec_id <> c.vec_id
        WHERE q.vec_id % 50 = 0
    ),
    quant_top AS (
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
               ROW_NUMBER() OVER (
                   PARTITION BY q.vec_id
                   ORDER BY ROUND(list_cosine_similarity(q.v, c.v), 6) DESC,
                            c.vec_id
               ) AS rnk
        FROM deq_vec q JOIN deq_vec c ON q.vec_id <> c.vec_id
        WHERE q.vec_id % 50 = 0
    ),
    e5 AS (SELECT query_id, neighbor_id FROM exact_top WHERE rnk <= 5),
    q5 AS (SELECT query_id, neighbor_id FROM quant_top WHERE rnk <= 5),
    ov AS (
        SELECT e5.query_id, COUNT(*) AS n_overlap
        FROM e5 JOIN q5 USING (query_id, neighbor_id)
        GROUP BY e5.query_id
    )
    SELECT q.query_id,
           CAST(COALESCE(ov.n_overlap, 0) AS BIGINT) AS n_overlap,
           ROUND(CAST(COALESCE(ov.n_overlap, 0) AS DOUBLE) / 5, 6)
               AS recall_at_k
    FROM (SELECT DISTINCT query_id FROM e5) q
    LEFT JOIN ov USING (query_id)
    ORDER BY query_id
    """,
)
def ann_int8_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@5 of int8 scalar-quantized ANN vs exact float search —
    the QA gate on the 4× embedding-storage compression (float32 →
    int8 against per-dimension corpus min/max). Both searches share
    the exact brute-force ranking, so the report isolates pure
    quantization loss; per-dim stats are 2×64 scalars (bounded driver
    data, like IVF centroids)."""
    emb = load_table(spark, "embeddings", sf_dir)
    return S.quantized_recall_report(emb, query_mod=50, k=5)


# ---------------------------------------------------------------------------
# sequence packing
# ---------------------------------------------------------------------------


@query(
    "pack_sequences_budget",
    oracle=f"""
    WITH toks AS (
        SELECT source, doc_id,
               CASE WHEN trim(text) = '' THEN 0 ELSE len({_TOKS}) END AS n_tok
        FROM documents
    ),
    cum AS (
        SELECT source, doc_id, n_tok,
               SUM(n_tok) OVER (
                   PARTITION BY source ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS cum_tok
        FROM toks
    ),
    assigned AS (
        SELECT source, doc_id, n_tok,
               CAST(floor((cum_tok - n_tok) / 2048.0) AS BIGINT) AS seq_id
        FROM cum
    )
    SELECT source, seq_id,
           COUNT(*) AS n_docs,
           MIN(doc_id) AS first_doc,
           CAST(SUM(n_tok) AS BIGINT) AS seq_tokens,
           ROUND(CAST(SUM(n_tok) AS DOUBLE) / 2048, 6) AS fill_ratio
    FROM assigned
    GROUP BY source, seq_id
    ORDER BY source, seq_id
    """,
)
def pack_sequences_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget sequence packing (2048-token sequences per source
    stream): the final assembly step of a pre-training data pipeline —
    documents concatenate in id order, sequences cut at the budget,
    each document assigned to the sequence where it starts. One
    shuffle; packing parallelizes over sources."""
    docs = load_table(spark, "documents", sf_dir)
    return SA.pack_sequences(docs, budget=2048)


@query(
    "chunk_context_windows",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, {_TOKS} AS t
        FROM documents WHERE trim(text) <> ''
    ),
    c AS (
        SELECT doc_id,
               CAST(r.i // 48 AS INTEGER) AS chunk_idx,
               r.i AS start,
               t[CAST(r.i + 1 AS INTEGER):CAST(LEAST(r.i + 64, len(t)) AS INTEGER)] AS ct
        FROM toks CROSS JOIN UNNEST(range(0, len(t), 48)) AS r(i)
    )
    SELECT doc_id, chunk_idx,
           CAST(len(ct) AS INTEGER) AS n_tokens,
           array_to_string(ct, ' ') AS chunk_text
    FROM c
    WHERE start = 0 OR len(ct) >= 16
    ORDER BY doc_id, chunk_idx
    """,
)
def chunk_context_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Context-window chunking (64-token windows, stride 48): long
    documents become overlapping fixed-length training examples, the
    counterpart move to packing for documents LONGER than the context.
    Tail fragments under 16 tokens drop unless they are the doc's only
    chunk. Pure projection — sequence+slice, no shuffle, no UDF; the
    sort here is presentation-only for the oracle compare."""
    docs = load_table(spark, "documents", sf_dir)
    return SA.chunk_token_windows(
        docs, window=64, stride=48, min_tail=16
    ).orderBy("doc_id", "chunk_idx")


# ---------------------------------------------------------------------------
# frequency sketches
# ---------------------------------------------------------------------------

_CMS_BUCKET = (
    "CAST(CAST(('0x' || substr(md5(CAST(r.i AS VARCHAR) || '|' || {key}), "
    "1, 8)) AS BIGINT) % 1024 AS INTEGER)"
)


_CMS_TOKEN_ORACLE = f"""
    WITH tok AS (
        SELECT unnest({_TOKS}) AS token
        FROM documents WHERE trim(text) <> ''
    ),
    tc AS (SELECT token, COUNT(*) AS n_exact FROM tok GROUP BY token),
    cells AS (
        SELECT r.i AS i, {_CMS_BUCKET.format(key='token')} AS bucket,
               SUM(n_exact) AS n
        FROM tc CROSS JOIN UNNEST(range(4)) AS r(i)
        GROUP BY 1, 2
    ),
    top AS (
        SELECT token, n_exact FROM tc
        ORDER BY n_exact DESC, token LIMIT 20
    ),
    est AS (
        SELECT t.token, MIN(c.n) AS cms_n
        FROM top t
        CROSS JOIN UNNEST(range(4)) AS r(i)
        JOIN cells c
          ON c.i = r.i AND c.bucket = {_CMS_BUCKET.format(key='t.token')}
        GROUP BY t.token
    )
    SELECT t.token, CAST(t.n_exact AS BIGINT) AS n_exact,
           CAST(e.cms_n AS BIGINT) AS cms_n,
           CAST(e.cms_n - t.n_exact AS BIGINT) AS overcount
    FROM top t JOIN est e ON t.token = e.token
    ORDER BY n_exact DESC, t.token
    """


def _cms_token_report(docs: DataFrame, cells: DataFrame | None = None) -> DataFrame:
    """Shared top-20 exact-vs-sketch comparison behind BOTH count-min
    queries (one-shot and streamed): exact per-token counts, the 20
    most frequent, their sketch estimates, and the (≥0 by
    construction) collision overcount. ``cells=None`` builds the
    sketch from the exact counts (the one-shot path); the streaming
    query passes its merged read-back cells instead — same report,
    same oracle."""
    from pg2any_spark.operators.sketch import cms_estimate, count_min_cells

    # NOT persisted: the sketch build, the top-20 and the report join
    # all consume tc's identical aggregate exchange inside one action,
    # which AQE shuffle-stage reuse executes once (persisting it only
    # swapped the reused stage for fixed-partition cache reads)
    tc = (
        docs.filter(F.trim(F.col("text")) != "")
        .select(F.explode(T.tokens(F.col("text"))).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n_exact"))
    )
    if cells is None:
        cells = count_min_cells(tc, "token", weight_col="n_exact")
    top = tc.orderBy(F.col("n_exact").desc(), "token").limit(20)
    est = cms_estimate(cells, top.select("token"), "token")
    return (
        top.join(est, "token")
        .select(
            "token",
            F.col("n_exact").cast("bigint").alias("n_exact"),
            F.col("cms_n").cast("bigint").alias("cms_n"),
            (F.col("cms_n") - F.col("n_exact")).cast("bigint").alias("overcount"),
        )
        .orderBy(F.col("n_exact").desc(), "token")
    )


@query("cms_token_frequency", oracle=_CMS_TOKEN_ORACLE)
def cms_token_frequency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch token frequencies (4×1024, md5-hash rows)
    against exact counts for the 20 most frequent tokens: the
    mergeable-sketch path for frequency stats over a corpus whose
    distinct-key table is itself too big. The sketch build shuffles
    ≤ depth×width cell rows TOTAL (map-side partial agg), estimates
    broadcast-join the tiny cell table; ``overcount`` is the sketch's
    collision overestimate, ≥ 0 by construction — a negative value
    anywhere is a correctness bug, and both engines must agree on
    every cell because the hash family is deterministic md5."""
    return _cms_token_report(load_table(spark, "documents", sf_dir))


@query(
    "sample_fixed_n_per_lang",
    oracle="""
    SELECT lang, doc_id
    FROM (
        SELECT lang, doc_id, ROW_NUMBER() OVER (
            PARTITION BY lang
            ORDER BY md5(CAST(doc_id AS VARCHAR) || 'fixn'), doc_id
        ) AS rk
        FROM documents
    ) WHERE rk <= 40
    ORDER BY lang, doc_id
    """,
)
def sample_fixed_n_per_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-quota stratified draw (`sampling.stratified_fixed_n`):
    exactly 40 documents per language, chosen by deterministic md5
    order — the "fixed eval set per stratum" move, reproducible across
    runs/engines and stable-ish under corpus growth (only hash-largest
    stragglers rotate out). One shuffle for the per-stratum rank
    window."""
    docs = load_table(spark, "documents", sf_dir)
    return (
        SA.stratified_fixed_n(docs, "doc_id", "lang", 40)
        .select("lang", "doc_id")
        .orderBy("lang", "doc_id")
    )


@query("cms_streaming_tokens", oracle=_CMS_TOKEN_ORACLE)
def cms_streaming_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The count-min sketch maintained CONTINUOUSLY: token rows stream
    in three micro-batches (documents sharded by doc_id%3), each batch
    landing its partial cells under its own ingest partition
    (``pipeline.cms_apply_batch``), and the merged read-back sketch
    answers the SAME top-20 comparison as the one-shot build — same
    oracle, because cell-wise mergeability makes streamed == batch
    exactly, not approximately."""
    from pg2any_spark.streaming.pipeline import (
        read_cms_cells,
        start_streaming_cms,
    )

    docs = load_table(spark, "documents", sf_dir).filter(
        F.trim(F.col("text")) != ""
    )
    work = _fresh_workdir("pg2any_cms_")
    src = f"{work}/tokens"
    for m in range(3):
        docs.filter(F.col("doc_id") % 3 == m).select(
            F.explode(T.tokens(F.col("text"))).alias("token")
        ).coalesce(1).write.mode("append").parquet(src)
    stream = (
        spark.readStream.schema("token string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = start_streaming_cms(
        stream, f"{work}/cells", f"{work}/ckpt", key_col="token"
    )
    if not q.awaitTermination(300):
        q.stop()
        raise TimeoutError("streaming CMS did not drain in 300s")

    cells = read_cms_cells(spark, f"{work}/cells")
    return _cms_token_report(docs, cells)


_NL, _CR, _TAB = "\n", "\r", "\t"
_NBSP, _ZWSP, _BOM = "\u00a0", "\u200b", "\ufeff"
_ZW_CLASS = "[\u200b\u200c\u200d\ufeff]"


@query(
    "clean_unicode_docs",
    oracle=f"""
    WITH noisy AS (
        SELECT doc_id, text,
               CASE
                   WHEN doc_id % 4 = 0 THEN replace(text, ' ', '{_NBSP}')
                   WHEN doc_id % 4 = 1 THEN replace(text, ' ', '  ')
                   WHEN doc_id % 4 = 2
                       THEN '{_BOM}' || replace(text, ' ', ' {_ZWSP}')
                   ELSE text
               END AS n
        FROM documents
    ),
    norm AS (
        SELECT doc_id, text, n,
               trim(
                   regexp_replace(
                   regexp_replace(
                   regexp_replace(
                   regexp_replace(
                   regexp_replace(
                   regexp_replace(n, '{_CR}{_NL}?', '{_NL}', 'g'),
                   '{_ZW_CLASS}', '', 'g'),
                   '{_NBSP}', ' ', 'g'),
                   '[ {_TAB}]+', ' ', 'g'),
                   ' *{_NL} *', '{_NL}', 'g'),
                   '{_NL}{{3,}}', '{_NL}{_NL}', 'g')
               ) AS z
        FROM noisy
    )
    SELECT doc_id,
           CAST(length(n) AS INTEGER) AS len_noisy,
           CAST(length(z) AS INTEGER) AS len_clean,
           (z = trim(text)) AS restored
    FROM norm
    ORDER BY doc_id
    """,
)
def clean_unicode_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unicode hygiene (`text.clean_unicode`) over a deterministically
    corrupted corpus: docs %4==0 get every space turned NBSP, %4==1
    doubled spaces, %4==2 a BOM prefix plus a zero-width space after
    every word, %4==3 untouched. The defects are chosen to be exactly
    REVERSIBLE by the normalizer, so ``restored`` proves the cleanup
    end-to-end (a wrong rule order — e.g. collapsing before stripping
    zero-widths — flips it). Pure codegen'd regexp chain; the oracle
    mirrors the rule order verbatim."""
    docs = load_table(spark, "documents", sf_dir)
    text = F.col("text")
    sp = F.lit(" ")
    noisy = (
        F.when(F.col("doc_id") % 4 == 0, F.replace(text, sp, F.lit(_NBSP)))
        .when(F.col("doc_id") % 4 == 1, F.replace(text, sp, F.lit("  ")))
        .when(
            F.col("doc_id") % 4 == 2,
            F.concat(F.lit(_BOM), F.replace(text, sp, F.lit(" " + _ZWSP))),
        )
        .otherwise(text)
    )
    d = docs.select("doc_id", "text", noisy.alias("n"))
    z = T.clean_unicode(F.col("n"))
    return d.select(
        "doc_id",
        F.length("n").cast("int").alias("len_noisy"),
        F.length(z).cast("int").alias("len_clean"),
        (z == F.trim(F.col("text"))).alias("restored"),
    ).orderBy("doc_id")


@query(
    "kmv_distinct_ngrams",
    oracle=f"""
    WITH toks AS (
        SELECT lang, {_TOKS} AS t
        FROM documents WHERE trim(text) <> ''
    ),
    g AS (
        SELECT lang,
               t[CAST(r.i + 1 AS INTEGER)] || ' ' ||
               t[CAST(r.i + 2 AS INTEGER)] || ' ' ||
               t[CAST(r.i + 3 AS INTEGER)] AS gram
        FROM toks CROSS JOIN UNNEST(range(len(t) - 2)) AS r(i)
        WHERE len(t) >= 3
    ),
    hashed AS (
        SELECT DISTINCT lang,
               CAST(('0x' || substr(md5(gram), 1, 15)) AS BIGINT) AS h
        FROM g
    ),
    cells AS (
        SELECT lang, h, rk FROM (
            SELECT lang, h, ROW_NUMBER() OVER (
                PARTITION BY lang ORDER BY h
            ) AS rk FROM hashed
        ) WHERE rk <= 128
    ),
    agg AS (
        SELECT lang, COUNT(*) AS n_seen, MAX(h) AS hk
        FROM cells GROUP BY lang
    ),
    exact AS (
        SELECT lang, COUNT(DISTINCT gram) AS n_exact FROM g GROUP BY lang
    )
    SELECT e.lang, CAST(e.n_exact AS BIGINT) AS n_exact,
           CASE WHEN a.n_seen < 128 THEN CAST(a.n_seen AS DOUBLE)
                ELSE ROUND(CAST(127 AS DOUBLE)
                           * CAST(1152921504606846976 AS DOUBLE)
                           / a.hk, 2)
           END AS kmv_est
    FROM exact e JOIN agg a ON e.lang = a.lang
    ORDER BY e.lang
    """,
)
def kmv_distinct_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV cardinality sketch vs exact: distinct word-3-grams per
    language (thousands per stratum here; the corpus-scale question
    is "how many distinct n-grams/URLs/users, per group, without a
    distinct-key shuffle that carries them all"). The sketch keeps
    only the 128 smallest md5 values per group — mergeable across
    shards, deterministic across engines — and its estimate lands
    within ~1/√k of exact (asserted in tests; the oracle proves
    cell-level equality, not closeness)."""
    from pg2any_spark.operators.sketch import kmv_cells, kmv_distinct

    docs = load_table(spark, "documents", sf_dir).filter(
        F.trim(F.col("text")) != ""
    )
    grams = docs.select(
        "lang", F.explode(T.word_ngrams(F.col("text"), 3)).alias("gram")
    )
    cells = kmv_cells(grams, "gram", ["lang"], k=128)
    est = kmv_distinct(cells, ["lang"], k=128)
    exact = grams.groupBy("lang").agg(
        F.countDistinct("gram").cast("bigint").alias("n_exact")
    )
    return exact.join(est, "lang").select(
        "lang", "n_exact", "kmv_est"
    ).orderBy("lang")


#: 3-gram table over a doc-id-gated subset as a WITH-clause CTE body —
#: shared by the Bloom decontamination oracle's train/eval sides.
def _gram3_cte(name: str, pred: str) -> str:
    return f"""
    {name} AS (
        SELECT DISTINCT doc_id,
               t[CAST(r.i + 1 AS INTEGER)] || ' ' ||
               t[CAST(r.i + 2 AS INTEGER)] || ' ' ||
               t[CAST(r.i + 3 AS INTEGER)] AS gram
        FROM (SELECT doc_id, {_TOKS} AS t
              FROM documents WHERE trim(text) <> '' AND {pred}) s,
             UNNEST(range(len(t) - 2)) AS r(i)
        WHERE len(t) >= 3
    )"""


#: Bloom bit position, salt i — the engine-wide md5-prefix family
#: (sketch._cms_bucket with m = 65536).
_BLOOM_POS = (
    "CAST(CAST(('0x' || substr(md5(CAST(r.i AS VARCHAR) || '|' || {key}), "
    "1, 8)) AS BIGINT) % 65536 AS INTEGER)"
)


@query(
    "decontaminate_bloom_counts",
    oracle=f"""
    WITH {_gram3_cte("tr", "doc_id % 10 <> 0")},
    {_gram3_cte("ev", "doc_id % 10 = 0")},
    bits AS (
        SELECT DISTINCT {_BLOOM_POS.format(key='gram')} AS pos
        FROM (SELECT DISTINCT gram FROM tr) g
        CROSS JOIN UNNEST(range(4)) AS r(i)
    ),
    pr AS (
        SELECT ev.doc_id, ev.gram,
               {_BLOOM_POS.format(key='ev.gram')} AS pos
        FROM ev CROSS JOIN UNNEST(range(4)) AS r(i)
    ),
    hits AS (
        SELECT doc_id, gram,
               CASE WHEN COUNT(b.pos) = 4 THEN 1 ELSE 0 END AS bloom_hit
        FROM pr LEFT JOIN bits b USING (pos)
        GROUP BY doc_id, gram
    ),
    ex AS (
        SELECT DISTINCT ev.doc_id, ev.gram FROM ev
        JOIN (SELECT DISTINCT gram FROM tr) t ON t.gram = ev.gram
    )
    SELECT h.doc_id,
           COUNT(*) AS n_grams,
           CAST(SUM(h.bloom_hit) AS BIGINT) AS n_bloom_hits,
           CAST(SUM(CASE WHEN ex.gram IS NOT NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_exact_hits,
           CAST(SUM(CASE WHEN h.bloom_hit = 1 AND ex.gram IS NULL
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_false_positives
    FROM hits h
    LEFT JOIN ex ON ex.doc_id = h.doc_id AND ex.gram = h.gram
    GROUP BY h.doc_id
    """,
)
def decontaminate_bloom_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter decontamination screen — the MEMBERSHIP sketch
    completing the family (count-min = frequency, histogram =
    quantiles, KMV = cardinality): the train split's distinct 3-grams
    build a 64 Ki-bit / 4-hash Bloom set-bit table
    (``sketch.bloom_cells``), every held-out doc's grams probe it, and
    the report compares Bloom verdicts against exact membership per
    document — hit counts, and the sketch's false positives (never
    false negatives: asserted per gram by construction here, since
    exact ⊆ bloom). At 100 TB the exact side is the expensive join
    you DON'T run in production — the Bloom probe touches a ≤ m-row
    broadcast table instead of the full n-gram inventory; this query
    carries the exact twin precisely to price the sketch's error.
    Integer-exact end to end (md5-derived bit positions, counts), so
    the oracle proves bit-level filter equality."""
    from pg2any_spark.operators.sketch import bloom_cells

    grams = _decon_grams(spark, sf_dir)
    train = grams.filter(F.col("doc_id") % 10 != 0).select("gram").distinct()
    return _bloom_decon_report(grams, train, bloom_cells(train, "gram"))


def _decon_grams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct (doc_id, 3-gram) pairs — shared by the batch and
    streamed Bloom decontamination queries."""
    docs = load_table(spark, "documents", sf_dir).filter(
        F.trim(F.col("text")) != ""
    )
    return docs.select(
        "doc_id", F.explode(T.word_ngrams(F.col("text"), 3)).alias("gram")
    ).distinct()


def _bloom_decon_report(
    grams: DataFrame, train: DataFrame, cells: DataFrame
) -> DataFrame:
    """Per-eval-doc Bloom-vs-exact membership report over a set-bit
    table ``cells`` (however built — one-shot or streamed)."""
    from pg2any_spark.operators.sketch import bloom_probe

    ev = grams.filter(F.col("doc_id") % 10 == 0)
    probed = bloom_probe(cells, ev, "gram", carry_cols=["doc_id"])
    exact = ev.join(train, "gram", "left_semi").withColumn(
        "exact_hit", F.lit(1)
    )
    flagged = probed.join(exact, ["doc_id", "gram"], "left").withColumn(
        "exact_hit", F.coalesce(F.col("exact_hit"), F.lit(0))
    )
    return flagged.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_grams"),
        F.sum("bloom_hit").alias("n_bloom_hits"),
        F.sum("exact_hit").alias("n_exact_hits"),
        F.sum(
            ((F.col("bloom_hit") == 1) & (F.col("exact_hit") == 0)).cast("int")
        ).alias("n_false_positives"),
    )


@query(
    "bloom_streaming_grams",
    oracle=f"""
    WITH {_gram3_cte("tr", "doc_id % 10 <> 0")},
    {_gram3_cte("ev", "doc_id % 10 = 0")},
    bits AS (
        SELECT DISTINCT {_BLOOM_POS.format(key='gram')} AS pos
        FROM (SELECT DISTINCT gram FROM tr) g
        CROSS JOIN UNNEST(range(4)) AS r(i)
    ),
    pr AS (
        SELECT ev.doc_id, ev.gram,
               {_BLOOM_POS.format(key='ev.gram')} AS pos
        FROM ev CROSS JOIN UNNEST(range(4)) AS r(i)
    ),
    hits AS (
        SELECT doc_id, gram,
               CASE WHEN COUNT(b.pos) = 4 THEN 1 ELSE 0 END AS bloom_hit
        FROM pr LEFT JOIN bits b USING (pos)
        GROUP BY doc_id, gram
    ),
    ex AS (
        SELECT DISTINCT ev.doc_id, ev.gram FROM ev
        JOIN (SELECT DISTINCT gram FROM tr) t ON t.gram = ev.gram
    )
    SELECT h.doc_id,
           COUNT(*) AS n_grams,
           CAST(SUM(h.bloom_hit) AS BIGINT) AS n_bloom_hits,
           CAST(SUM(CASE WHEN ex.gram IS NOT NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_exact_hits,
           CAST(SUM(CASE WHEN h.bloom_hit = 1 AND ex.gram IS NULL
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_false_positives
    FROM hits h
    LEFT JOIN ex ON ex.doc_id = h.doc_id AND ex.gram = h.gram
    GROUP BY h.doc_id
    """,
)
def bloom_streaming_grams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Bloom filter maintained CONTINUOUSLY: the train split's
    grams stream in three micro-batches (sharded by doc_id%3), each
    landing its partial set-bit table under its own ingest partition
    (``pipeline.bloom_apply_batch``), and the union-distinct read-back
    filter answers the SAME decontamination report as the one-shot
    build — same oracle, because set-union mergeability makes
    streamed == batch exactly, not approximately (the live
    train-filter a decontamination screen probes while training
    shards are still landing)."""
    from pg2any_spark.streaming.pipeline import (
        read_bloom_cells,
        start_streaming_bloom,
    )

    grams = _decon_grams(spark, sf_dir)
    train = grams.filter(F.col("doc_id") % 10 != 0)
    work = _fresh_workdir("pg2any_bloom_")
    src = f"{work}/grams"
    for m in range(3):
        train.filter(F.col("doc_id") % 3 == m).select("gram").coalesce(
            1
        ).write.mode("append").parquet(src)
    stream = (
        spark.readStream.schema("gram string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = start_streaming_bloom(
        stream, f"{work}/cells", f"{work}/ckpt", key_col="gram"
    )
    if not q.awaitTermination(300):
        q.stop()
        raise TimeoutError("streaming Bloom did not drain in 300s")
    cells = read_bloom_cells(spark, f"{work}/cells")
    return _bloom_decon_report(
        grams, train.select("gram").distinct(), cells
    )


@query(
    "hist_quantile_order_value",
    oracle="""
    WITH cells AS (
        SELECT LEAST(GREATEST(CAST(floor(
                   CAST(o_totalprice AS DOUBLE) / 600000.0 * 512
               ) AS INTEGER), 0), 511) AS bucket,
               COUNT(*) AS n
        FROM orders GROUP BY 1
    ),
    cum AS (
        SELECT bucket, n,
               SUM(n) OVER (ORDER BY bucket) AS cum,
               SUM(n) OVER () AS total
        FROM cells
    ),
    hits AS (
        SELECT q.q, MIN(c.bucket) AS bucket
        FROM (SELECT unnest(CAST([0.25, 0.5, 0.75, 0.9, 0.99]
                                 AS DOUBLE[])) AS q) q
        JOIN cum c ON c.cum >= q.q * c.total
        GROUP BY q.q
    )
    SELECT h.q,
           ROUND(h.bucket * (600000.0 / 512)
                 + (h.q * c.total - (c.cum - c.n)) / c.n
                   * (600000.0 / 512), 4) AS est
    FROM hits h JOIN cum c ON c.bucket = h.bucket
    ORDER BY h.q
    """,
)
def hist_quantile_order_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable-histogram quantiles of order value (512 fixed bins,
    linear interpolation inside the target bin): the deterministic,
    oracle-checkable counterpart to ``approx_percentile``'s rows-only
    sketch. The histogram build is the only corpus-sized pass and its
    shuffle is ≤ bins cells (map-side partial agg, same shape as the
    count-min build); cumulative window, quantile lookup, and
    interpolation all run on the ≤ 512-row cell table."""
    from pg2any_spark.operators.sketch import (
        histogram_cells,
        histogram_quantiles,
    )

    orders = load_table(spark, "orders", sf_dir)
    cells = histogram_cells(orders, "o_totalprice", 0.0, 600000.0, bins=512)
    return histogram_quantiles(
        cells, [0.25, 0.5, 0.75, 0.9, 0.99], 0.0, 600000.0, bins=512
    ).orderBy("q")


# ---------------------------------------------------------------------------
# round 4 additions: incremental dedup index, LM quality scoring,
# kNN label propagation, vocabulary growth
# ---------------------------------------------------------------------------

_REV_TEXT = f"array_to_string(list_reverse({_TOKS}), ' ')"


@query(
    "dedup_incremental_index",
    oracle=f"""
    WITH allc AS (
        SELECT doc_id AS id, 'cor' AS side, text FROM documents
        UNION ALL
        SELECT doc_id + 100000 AS id, 'inc' AS side, {_DROP2} AS text
        FROM documents WHERE doc_id % 5 = 0
        UNION ALL
        SELECT doc_id + 200000 AS id, 'inc' AS side, {_REV_TEXT} AS text
        FROM documents WHERE doc_id % 7 = 0
    ),
    sh AS (
        SELECT id, side, unnest({_SHINGLE_SQL}) AS shingle FROM allc
    ),
    hashed AS (
        SELECT id, side,
               CAST(('0x' || substr(md5(shingle), 1, 8)) AS BIGINT) AS h1,
               CAST(('0x' || substr(md5(shingle), 9, 8)) AS BIGINT) AS h2
        FROM sh
    ),
    sig AS (
        SELECT id, side, {_minhash_sig_sql(12)}
        FROM hashed GROUP BY id, side
    ),
    bands AS (
        {_band_sql(4, 3, extra_cols="side, ")}
    )
    SELECT DISTINCT i.id AS incoming_id, x.id AS corpus_id
    FROM bands i JOIN bands x
      ON i.band_idx = x.band_idx AND i.band_key = x.band_key
    WHERE i.side = 'inc' AND x.side = 'cor'
    """,
)
def dedup_incremental_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental dedup of a NEW ingest batch against the corpus's
    persisted LSH band index: near-dup mutations (first two words
    dropped) should match their originals; token-reversed docs mostly
    shouldn't. Only the incoming batch is hashed — per-batch cost
    O(|batch|), never a corpus re-scan (operators.dedup.lsh_index /
    incremental_lsh_matches)."""
    docs = load_table(spark, "documents", sf_dir).select("doc_id", "text")
    corpus = docs.selectExpr("doc_id AS id", "text")
    toks = F.split(F.trim(F.lower(F.col("text"))), r"\s+")
    # one documents scan for the incoming batch: the former 2-branch
    # unionByName scanned documents once per variant; same multiset
    # via an explode of a ≤2-entry struct array
    variants = F.array(
        F.when(
            F.col("doc_id") % 5 == 0,
            F.struct(
                (F.col("doc_id") + 100000).alias("id"),
                F.regexp_replace(
                    "text", r"^\s*\S+\s+\S+\s+", ""
                ).alias("text"),
            ),
        ),
        F.when(
            F.col("doc_id") % 7 == 0,
            F.struct(
                (F.col("doc_id") + 200000).alias("id"),
                F.array_join(F.reverse(toks), " ").alias("text"),
            ),
        ),
    )
    incoming = docs.select(
        F.explode(F.filter(variants, lambda r: r.isNotNull())).alias("e")
    ).select("e.id", "e.text")
    index = D.lsh_index(corpus, "id", "text", num_hashes=12, bands=4)
    return D.incremental_lsh_matches(
        index, incoming, "id", "text", num_hashes=12, bands=4
    )


@query(
    "lm_bigram_perplexity",
    oracle=f"""
    WITH {_LM_CTES},
    nb AS (SELECT doc_id, SUM(n) AS n_bigrams FROM lm_docbg GROUP BY doc_id)
    SELECT lm.doc_id, CAST(nb.n_bigrams AS BIGINT) AS n_bigrams, lm.avg_nll
    FROM lm JOIN nb ON nb.doc_id = lm.doc_id
    """,
)
def lm_bigram_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document mean negative log-likelihood under a corpus-trained
    add-k bigram LM — the CCNet-style perplexity quality signal
    (operators.text.lm_bigram_scores): one bigram explode feeds both
    the count tables and the scoring join, all codegen. Round 6: the
    oracle rides the shared portable _LM_CTES chain (same values; the
    old occ/list_transform form was the retired dialect-heavy
    construct class)."""
    docs = load_table(spark, "documents", sf_dir)
    return T.lm_bigram_scores(docs, "doc_id", "text", alpha=0.5)


@query(
    "knn_label_embeddings",
    oracle="""
    WITH q AS (
        SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv,
               label AS true_label
        FROM embeddings WHERE vec_id % 10 = 0
    ),
    c AS (
        SELECT vec_id AS neighbor_id, embedding::DOUBLE[] AS cv,
               label AS nbr_label
        FROM embeddings WHERE vec_id % 10 <> 0
    ),
    sims AS (
        SELECT query_id, neighbor_id, nbr_label,
               ROUND(list_cosine_similarity(qv, cv), 6) AS cos_sim
        FROM q CROSS JOIN c
    ),
    ranked AS (
        SELECT query_id, nbr_label,
               ROW_NUMBER() OVER (
                   PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id
               ) AS rnk
        FROM sims
    ),
    votes AS (
        SELECT query_id, nbr_label, count(*) AS votes
        FROM ranked WHERE rnk <= 5 GROUP BY query_id, nbr_label
    ),
    pred AS (
        SELECT query_id, nbr_label AS pred_label, votes,
               ROW_NUMBER() OVER (
                   PARTITION BY query_id ORDER BY votes DESC, nbr_label
               ) AS rn
        FROM votes
    )
    SELECT p.query_id, p.pred_label, p.votes, q.true_label,
           CAST(p.pred_label = q.true_label AS INT) AS correct
    FROM pred p JOIN q ON q.query_id = p.query_id
    WHERE p.rn = 1
    """,
)
def knn_label_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """kNN majority-vote label propagation: every 10th vector is held
    out and labeled by its 5 cosine-nearest labeled neighbors
    (operators.similarity.knn_label), with per-query accuracy against
    the true label — the weak-labeling / label-QA shape of a curation
    pipeline."""
    emb = load_table(spark, "embeddings", sf_dir)
    held = emb.filter(F.col("vec_id") % 10 == 0)
    corpus = emb.filter(F.col("vec_id") % 10 != 0)
    pred = S.knn_label(corpus, held, k=5)
    truth = held.select(
        F.col("vec_id").alias("query_id"), F.col("label").alias("true_label")
    )
    return pred.join(truth, "query_id").select(
        "query_id",
        "pred_label",
        "votes",
        "true_label",
        (F.col("pred_label") == F.col("true_label")).cast("int").alias("correct"),
    )


@query(
    "vocab_growth_curve",
    oracle=f"""
    WITH base AS (
        SELECT doc_id, text FROM documents WHERE trim(text) <> ''
    ),
    bound AS (SELECT MAX(doc_id) + 1 AS id_bound FROM base),
    first_doc AS (
        SELECT tok, MIN(doc_id) AS first_doc FROM (
            SELECT doc_id, unnest({_TOKS}) AS tok FROM base
        ) WHERE tok <> '' GROUP BY tok
    ),
    new_words AS (
        SELECT CAST(FLOOR(CAST(first_doc AS DOUBLE) * 20 / id_bound) AS INT)
                   AS bucket,
               count(*) AS new_words
        FROM first_doc, bound GROUP BY 1
    ),
    docs_per AS (
        SELECT CAST(FLOOR(CAST(doc_id AS DOUBLE) * 20 / id_bound) AS INT)
                   AS bucket,
               count(*) AS n_docs
        FROM base, bound GROUP BY 1
    )
    SELECT d.bucket, d.n_docs,
           COALESCE(w.new_words, 0) AS new_words,
           CAST(SUM(COALESCE(w.new_words, 0)) OVER (
               ORDER BY d.bucket ROWS UNBOUNDED PRECEDING) AS BIGINT)
               AS cum_vocab
    FROM docs_per d LEFT JOIN new_words w ON w.bucket = d.bucket
    """,
)
def vocab_growth_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heaps-law vocabulary growth over 20 ordered corpus chunks
    (operators.text.vocab_growth): each word reduces to its first
    document map-side, so 'cumulative distinct' never funnels the
    corpus through one partition — the constant-size window runs over
    20 bucket rows."""
    docs = load_table(spark, "documents", sf_dir)
    return T.vocab_growth(docs, "doc_id", "text", buckets=20)


@query(
    "corpus_filter_funnel",
    oracle=f"""
    WITH {_QINTS_CTE},
    {_REP_INT_CTES},
    langp AS (
        SELECT doc_id,
               CASE WHEN greatest(s_de, s_en, s_es, s_fr) < 1 THEN 'und'
                    WHEN s_de = greatest(s_de, s_en, s_es, s_fr) THEN 'de'
                    WHEN s_en = greatest(s_en, s_es, s_fr) THEN 'en'
                    WHEN s_es = greatest(s_es, s_fr) THEN 'es'
                    ELSE 'fr' END AS lang_pred
        FROM (
            SELECT doc_id,
                   {_lang_score_sql("de")} AS s_de,
                   {_lang_score_sql("en")} AS s_en,
                   {_lang_score_sql("es")} AS s_es,
                   {_lang_score_sql("fr")} AS s_fr
            FROM documents
        )
    ),
    {_LM_INT_CTES},
    flags AS (
        SELECT d.source,
               CAST({_fq_int_sql('q')} AS INT) AS fq,
               CAST(COALESCE({_FR_INT}, FALSE) AS INT) AS fr,
               CAST(langp.lang_pred <> d.lang AS INT) AS fl,
               CAST(COALESCE({_FM_INT}, FALSE) AS INT) AS fm
        FROM documents d
        JOIN q_ints q ON q.doc_id = d.doc_id
        LEFT JOIN rep_i ON rep_i.doc_id = d.doc_id
        JOIN langp ON langp.doc_id = d.doc_id
        LEFT JOIN lm_i ON lm_i.doc_id = d.doc_id
    )
    SELECT source, COUNT(*) AS n_docs,
           CAST(SUM(fq) AS BIGINT) AS fail_quality,
           CAST(SUM(fr) AS BIGINT) AS fail_repetition,
           CAST(SUM(fl) AS BIGINT) AS fail_lang,
           CAST(SUM(fm) AS BIGINT) AS fail_lm,
           CAST(SUM(CASE WHEN fq + fr + fl + fm = 0 THEN 1 ELSE 0 END)
                AS BIGINT) AS kept
    FROM flags GROUP BY source ORDER BY source
    """,
)
def corpus_filter_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filter-funnel observability report: per source, how many docs
    each pretraining filter (quality heuristic, repetition screen,
    language-ID mismatch, bigram-LM perplexity band) would drop, and
    how many survive all four — the daily accounting query of a
    curation pipeline. Per-row filters are pure codegen; the only
    joins carry the per-doc LM score back by doc_id.

    Threshold provenance (round 5): the LM cut 3.595 was chosen by
    measuring every achievable 4dp avg_nll at sf0.001/0.01/0.1 —
    nearest score is 0.0044 away (44x the rounding quantum), and the
    flag still fires at every SF. The round-4 cut (3.42) sat 2e-4
    from two documents' scores; see tests/test_threshold_margins.py,
    which pins the margin for every thresholded literal in the
    registry. ``fr`` coalesces to False like the oracle's
    COALESCE(dup_frac, 0) so <2-token docs (NULL dup_frac in Spark,
    absent from the oracle's gram CTE) flag identically.

    Round 6: the oracle's LM chain was rewritten onto the portable
    ``_LM_CTES`` and every threshold comparison cast to DOUBLE — and
    ALL FOUR probes still came back driver-red with every integer
    neighbor green. Round 7 removes the float decision surfaces
    outright: the quality cut is the exact BIGINT cross-multiplication
    of ``text.quality_fail_int``, the repetition cut is
    ``5·(n_grams − n_distinct) > n_grams``, and the LM band compares
    scale-1e6 floored-integer nll sums (``text.lm_bigram_scores_scaled``)
    — ``nll_sum > 3595000·n_bg``. The language flag was already pure
    integers and is unchanged; the ``lang_probe_scores`` /
    ``tok_probe_perdoc`` probes bisect it upstream."""
    docs = load_table(spark, "documents", sf_dir)
    n_grams, n_distinct = _rep_int_cols()
    flags = (
        docs.withColumn("__grams", T.word_ngrams(F.col("text"), 2))
        .select(
            "doc_id",
            "source",
            T.quality_fail_int(F.col("text")).cast("int").alias("fq"),
            (F.lit(5).cast("long") * (n_grams - n_distinct) > n_grams)
            .cast("int")
            .alias("fr"),
            (T.lang_id(F.col("text")) != F.col("lang")).cast("int").alias("fl"),
        )
        .join(_lm_scaled_spark(docs), "doc_id", "left")
        .withColumn("fm", _fm_int_col().cast("int"))
    )
    return (
        flags.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("fq").alias("fail_quality"),
            F.sum("fr").alias("fail_repetition"),
            F.sum("fl").alias("fail_lang"),
            F.sum("fm").alias("fail_lm"),
            F.sum(
                (
                    (F.col("fq") + F.col("fr") + F.col("fl") + F.col("fm")) == 0
                ).cast("int")
            ).alias("kept"),
        )
        .orderBy("source")
    )


@query(
    "funnel_probe_quality",
    oracle=f"""
    WITH {_QINTS_CTE}
    SELECT d.source, COUNT(*) AS n_docs,
           CAST(SUM(CAST({_fq_int_sql('q')} AS INT)) AS BIGINT) AS fail_quality
    FROM documents d JOIN q_ints q ON q.doc_id = d.doc_id
    GROUP BY d.source ORDER BY d.source
    """,
)
def funnel_probe_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-bisection probe (round 6): ONLY the quality-filter count
    of ``corpus_filter_funnel``, per source. The four funnel probes
    partition the funnel's output surface one flag each; whichever
    subset comes back red localizes the driver-side divergence to a
    specific metric's arithmetic. Round 7: the flag is the exact
    BIGINT comparison (text.quality_fail_int) — red now implies the
    INTEGER measurements diverge, which ``quality_probe_ints``
    fingerprints per document."""
    docs = load_table(spark, "documents", sf_dir)
    return (
        docs.select(
            "source",
            T.quality_fail_int(F.col("text")).cast("int").alias("fq"),
        )
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("fq").alias("fail_quality"),
        )
        .orderBy("source")
    )


@query(
    "funnel_probe_repetition",
    oracle=f"""
    WITH {_REP_INT_CTES}
    SELECT d.source, COUNT(*) AS n_docs,
           CAST(SUM(CAST(COALESCE({_FR_INT}, FALSE) AS INT)) AS BIGINT)
               AS fail_repetition
    FROM documents d LEFT JOIN rep_i ON rep_i.doc_id = d.doc_id
    GROUP BY d.source ORDER BY d.source
    """,
)
def funnel_probe_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-bisection probe (round 6): ONLY the repetition-screen
    count of ``corpus_filter_funnel``, per source (see
    funnel_probe_quality). Round 7: exact BIGINT form —
    ``5·(n_grams − n_distinct) > n_grams`` — no rounded fraction."""
    docs = load_table(spark, "documents", sf_dir)
    n_grams, n_distinct = _rep_int_cols()
    return (
        docs.withColumn("__grams", T.word_ngrams(F.col("text"), 2))
        .select(
            "source",
            (F.lit(5).cast("long") * (n_grams - n_distinct) > n_grams)
            .cast("int")
            .alias("fr"),
        )
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("fr").alias("fail_repetition"),
        )
        .orderBy("source")
    )


@query(
    "funnel_probe_lang",
    oracle=f"""
    WITH langp AS (
        SELECT doc_id,
               CASE WHEN greatest(s_de, s_en, s_es, s_fr) < 1 THEN 'und'
                    WHEN s_de = greatest(s_de, s_en, s_es, s_fr) THEN 'de'
                    WHEN s_en = greatest(s_en, s_es, s_fr) THEN 'en'
                    WHEN s_es = greatest(s_es, s_fr) THEN 'es'
                    ELSE 'fr' END AS lang_pred
        FROM (
            SELECT doc_id,
                   {_lang_score_sql("de")} AS s_de,
                   {_lang_score_sql("en")} AS s_en,
                   {_lang_score_sql("es")} AS s_es,
                   {_lang_score_sql("fr")} AS s_fr
            FROM documents
        )
    )
    SELECT d.source, COUNT(*) AS n_docs,
           CAST(SUM(CAST(langp.lang_pred <> d.lang AS INT)) AS BIGINT)
               AS fail_lang
    FROM documents d JOIN langp ON langp.doc_id = d.doc_id
    GROUP BY d.source ORDER BY d.source
    """,
)
def funnel_probe_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-bisection probe (round 6): ONLY the language-ID mismatch
    count of ``corpus_filter_funnel``, per source (see
    funnel_probe_quality)."""
    docs = load_table(spark, "documents", sf_dir)
    return (
        docs.select(
            "source",
            (T.lang_id(F.col("text")) != F.col("lang")).cast("int").alias("fl"),
        )
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("fl").alias("fail_lang"),
        )
        .orderBy("source")
    )


@query(
    "funnel_probe_lm",
    oracle=f"""
    WITH {_LM_INT_CTES}
    SELECT d.source, COUNT(*) AS n_docs,
           CAST(SUM(CAST(COALESCE({_FM_INT}, FALSE) AS INT)) AS BIGINT)
               AS fail_lm
    FROM documents d LEFT JOIN lm_i ON lm_i.doc_id = d.doc_id
    GROUP BY d.source ORDER BY d.source
    """,
)
def funnel_probe_lm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-bisection probe (round 6): ONLY the bigram-LM perplexity
    band count of ``corpus_filter_funnel``, per source (see
    funnel_probe_quality). Round 7: the band is the pure-BIGINT
    comparison ``nll_sum > 3595000·n_bg`` over scale-1e6 floored
    per-bigram nll integers — no raw-float threshold remains; red now
    implies the integer LM pieces diverge (see ``repetition_probe_ints``
    for the per-doc bigram counts and ``lm_probe_vocab`` for the
    corpus-level LM statistics) or the ln/floor step itself (canary
    l1-l3)."""
    docs = load_table(spark, "documents", sf_dir)
    return (
        docs.select("doc_id", "source")
        .join(_lm_scaled_spark(docs), "doc_id", "left")
        .select("source", _fm_int_col().cast("int").alias("fm"))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("fm").alias("fail_lm"),
        )
        .orderBy("source")
    )


@query(
    "dedup_lsh_recall_report",
    oracle=f"""
    WITH corpus AS ({_MUTATED_CORPUS}),
    sh AS (
        SELECT id, unnest({_SHINGLE_SQL}) AS shingle FROM corpus
    ),
    hashed AS (
        SELECT id,
               CAST(('0x' || substr(md5(shingle), 1, 8)) AS BIGINT) AS h1,
               CAST(('0x' || substr(md5(shingle), 9, 8)) AS BIGINT) AS h2
        FROM sh
    ),
    sig AS (
        SELECT id, {_minhash_sig_sql(12)}
        FROM hashed GROUP BY id
    ),
    bands AS (
        {_band_sql(4, 3)}
    ),
    cand AS (
        SELECT DISTINCT a.id AS id_a, b.id AS id_b
        FROM bands a JOIN bands b
          ON a.band_idx = b.band_idx AND a.band_key = b.band_key
             AND a.id < b.id
    ),
    dsh AS (SELECT DISTINCT id, shingle FROM sh),
    sizes AS (SELECT id, count(*) AS set_size FROM dsh GROUP BY id),
    planted AS (
        SELECT doc_id AS id_a, doc_id + 100000 AS id_b FROM documents
    ),
    pairs AS (
        SELECT id_a, id_b FROM cand
        UNION
        SELECT id_a, id_b FROM planted
    ),
    inter AS (
        SELECT p.id_a, p.id_b, count(*) AS n_inter
        FROM pairs p
        JOIN dsh a ON a.id = p.id_a
        JOIN dsh b ON b.id = p.id_b AND b.shingle = a.shingle
        GROUP BY p.id_a, p.id_b
    ),
    jac AS (
        SELECT p.id_a, p.id_b,
               ROUND(COALESCE(i.n_inter, 0) /
                     (sa.set_size + sb.set_size - COALESCE(i.n_inter, 0)),
                     6) AS jaccard
        FROM pairs p
        LEFT JOIN inter i ON i.id_a = p.id_a AND i.id_b = p.id_b
        JOIN sizes sa ON sa.id = p.id_a
        JOIN sizes sb ON sb.id = p.id_b
    ),
    cand_j AS (
        SELECT c.id_a, c.id_b, j.jaccard FROM cand c
        JOIN jac j ON j.id_a = c.id_a AND j.id_b = c.id_b
    ),
    truth AS (
        SELECT p.id_a, p.id_b FROM planted p
        JOIN jac j ON j.id_a = p.id_a AND j.id_b = p.id_b
        WHERE j.jaccard >= 0.6
    )
    SELECT
        (SELECT COUNT(*) FROM cand) AS n_candidates,
        ROUND((SELECT COUNT(*) FROM cand_j WHERE jaccard >= 0.6)
              / CAST((SELECT COUNT(*) FROM cand) AS DOUBLE), 6)
            AS candidate_precision,
        (SELECT COUNT(*) FROM truth) AS n_true_pairs,
        ROUND((SELECT COUNT(*) FROM truth t
               JOIN cand c ON c.id_a = t.id_a AND c.id_b = t.id_b)
              / CAST((SELECT COUNT(*) FROM truth) AS DOUBLE), 6)
            AS lsh_recall
    """,
)
def dedup_lsh_recall_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """QA report for the dedup stack: LSH candidate PRECISION (share of
    candidate pairs whose exact 3-gram Jaccard ≥ 0.6) and RECALL
    against the planted near-dup ground truth (mutated copies with
    Jaccard ≥ 0.6) — the measurement that tunes bands×rows before a
    corpus-scale run, exactly as ``ann_int8_recall`` QAs quantization.
    Jaccard is computed for candidate∪planted pairs only, never
    all-pairs."""
    corpus = _mutated_corpus(spark, sf_dir)
    docs = load_table(spark, "documents", sf_dir)
    cand = D.lsh_candidate_pairs(corpus, "id", "text", num_hashes=12, bands=4)
    planted = docs.select(
        F.col("doc_id").alias("id_a"), (F.col("doc_id") + 100000).alias("id_b")
    )
    # one flagged pair table feeding both the jaccard verify (which
    # references it twice internally) and the final join — persisted
    # so the band self-join + union + flag-groupBy runs once, not 3×
    # (same convention as lsh_candidate_pairs' band table)
    pairs = (
        cand.select("id_a", "id_b", F.lit(1).alias("is_cand"), F.lit(0).alias("is_planted"))
        .unionByName(
            planted.select(
                "id_a", "id_b", F.lit(0).alias("is_cand"), F.lit(1).alias("is_planted")
            )
        )
        .groupBy("id_a", "id_b")
        .agg(
            F.max("is_cand").alias("is_cand"),
            F.max("is_planted").alias("is_planted"),
        )
    )
    pairs = managed_persist(pairs)
    jac = D.ngram_jaccard(
        corpus, pairs.select("id_a", "id_b"), "id", "text", n=3
    )
    scored = pairs.join(jac, ["id_a", "id_b"]).withColumn(
        "is_true", (F.col("jaccard") >= 0.6).cast("long")
    )
    agg = scored.agg(
        F.sum("is_cand").alias("n_candidates"),
        F.sum(F.col("is_cand") * F.col("is_true")).alias("n_good"),
        F.sum(F.col("is_planted") * F.col("is_true")).alias("n_true_pairs"),
        F.sum(
            F.col("is_cand") * F.col("is_planted") * F.col("is_true")
        ).alias("n_hits"),
    )
    return agg.select(
        "n_candidates",
        F.round(
            F.col("n_good") / F.col("n_candidates").cast("double"), 6
        ).alias("candidate_precision"),
        "n_true_pairs",
        F.round(
            F.col("n_hits") / F.col("n_true_pairs").cast("double"), 6
        ).alias("lsh_recall"),
    )


def _bpe_fold_sql(inner_sym: str, pair_ref: str) -> str:
    """Boundary-aware greedy merge of one pair over a dotted symbol
    string (SQL twin of ``text._merge_pair_fold``): fold the symbol
    list with a dot-prefixed accumulator, so the left element only
    matches a WHOLE trailing symbol (``ends_with(acc, '.x.')``) —
    never a suffix of a longer one. The sentinel empty pair ("" from
    an exhausted round) can never match a non-empty symbol, so it
    folds as a no-op."""
    x = f"split_part({pair_ref}, '.', 1)"
    y = f"split_part({pair_ref}, '.', 2)"
    return f"""substr(list_reduce(
        list_prepend('.', list_filter(string_split({inner_sym}, '.'),
                                      s -> s <> '')),
        (acc, e) -> CASE
            WHEN ends_with(acc, '.' || {x} || '.') AND e = {y}
            THEN substr(acc, 1, length(acc) - length({x}) - 1)
                 || {x} || {y} || '.'
            ELSE acc || e || '.' END
    ), 2)"""


def _bpe_ctes(rounds: int) -> list[str]:
    """K chained CTE blocks, one per merge round — the oracle twin of
    ``text.learn_bpe_merges``'s driver loop (same pair statistics,
    same argmax tie-break, same fold-based merge). Each ``b{r}`` CTE
    carries a zero-count sentinel so an exhausted corpus yields a
    no-op round instead of an empty cross join."""
    ctes = [
        f"""w0 AS (
        SELECT w, count(*) AS n,
               regexp_replace(w, '(.)', '\\1.', 'g') AS sym
        FROM (SELECT unnest({_TOKS}) AS w FROM documents)
        WHERE w <> '' AND w NOT LIKE '%.%' GROUP BY w
    )"""
    ]
    for r in range(1, rounds + 1):
        prev = f"w{r - 1}"
        ctes.append(f"""p{r} AS (
        SELECT z AS pair, SUM(n) AS cnt FROM (
            SELECT n, unnest(list_transform(generate_series(1, len(s) - 1),
                    i -> s[i] || '.' || s[i+1])) AS z
            FROM (SELECT n, list_filter(string_split(sym, '.'),
                                        x -> x <> '') AS s FROM {prev})
        ) GROUP BY z
    )""")
        ctes.append(f"""b{r} AS (
        SELECT pair, cnt FROM (
            SELECT pair, cnt FROM p{r}
            UNION ALL SELECT '' AS pair, CAST(0 AS BIGINT) AS cnt
        ) ORDER BY cnt DESC, pair LIMIT 1
    )""")
        ctes.append(f"""w{r} AS (
        SELECT w.w, w.n,
               {_bpe_fold_sql("w.sym", "b.pair")} AS sym
        FROM {prev} w CROSS JOIN b{r} b
    )""")
    return ctes


def _bpe_oracle(rounds: int) -> str:
    finals = "\n    UNION ALL ".join(
        f"SELECT {r} AS merge_round, pair, replace(pair, '.', '') AS new_symbol, "
        f"CAST(cnt AS BIGINT) AS n_occurrences FROM b{r} WHERE cnt > 0"
        for r in range(1, rounds + 1)
    )
    return (
        "WITH " + ",\n    ".join(_bpe_ctes(rounds))
        + "\n    SELECT * FROM (\n    " + finals + "\n    ) ORDER BY merge_round"
    )


def _bpe_tokenize_oracle(rounds: int) -> str:
    """Apply the learned merges back to every document (chained folds
    with the b{r} pairs) and report per-doc BPE token counts +
    compression. Dot-bearing words are excluded exactly as the
    trainer and the Spark apply side exclude them."""
    sym = "regexp_replace(w, '(.)', '\\1.', 'g')"
    for r in range(1, rounds + 1):
        sym = _bpe_fold_sql(sym, f"b{r}.pair")
    joins = " ".join(f"CROSS JOIN b{r}" for r in range(1, rounds + 1))
    return (
        "WITH " + ",\n    ".join(_bpe_ctes(rounds))
        + f""",
    words AS (
        SELECT doc_id, unnest({_TOKS}) AS w FROM documents
    ),
    tok AS (
        SELECT doc_id, length(w) AS n_chars_w,
               len(list_filter(string_split({sym}, '.'), s -> s <> ''))
                   AS n_tok_w
        FROM words {joins}
        WHERE w <> '' AND w NOT LIKE '%.%'
    )
    SELECT doc_id,
           CAST(SUM(n_chars_w) AS INT) AS n_chars_tok,
           CAST(SUM(n_tok_w) AS INT) AS n_bpe_tokens,
           ROUND(SUM(n_chars_w) / CAST(SUM(n_tok_w) AS DOUBLE), 4)
               AS compression
    FROM tok GROUP BY doc_id"""
    )


@query("bpe_merges_corpus", oracle=_bpe_oracle(5))
def bpe_merges_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First 5 BPE merges learned from the corpus — tokenizer
    induction as a bounded iterative Spark algorithm
    (operators.text.learn_bpe_merges): the corpus collapses once to
    the word-count dictionary, every round is O(|vocabulary|), and the
    driver sees one row per round."""
    docs = load_table(spark, "documents", sf_dir)
    return T.learn_bpe_merges(docs, "text", rounds=5)


@query("bpe_tokenize_docs", oracle=_bpe_tokenize_oracle(5))
def bpe_tokenize_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train-then-apply tokenizer loop: the 5 merges learned by
    ``learn_bpe_merges`` replay over every document as chained literal
    replaces (driver-side constant of size K, pure codegen — no join),
    reporting per-document BPE token counts and the chars/token
    compression ratio a tokenizer is sized by.

    A document whose words are ALL empty or dot-bearing tokenizes to
    zero BPE tokens; the oracle's tok CTE has no rows for it (so the
    doc is absent), while the Spark side would emit it with 0/0 →
    NULL compression. The n_bpe_tokens > 0 filter pins identical
    drop-the-doc semantics on both sides (and guards the division)."""
    docs = load_table(spark, "documents", sf_dir)
    merges = [r["pair"] for r in T.learn_bpe_merges(docs, "text", rounds=5).collect()]
    return (
        T.apply_bpe_merges(docs, merges)
        .filter(F.col("n_bpe_tokens") > 0)
        .select(
            "doc_id",
            "n_chars_tok",
            "n_bpe_tokens",
            F.round(
                F.col("n_chars_tok") / F.col("n_bpe_tokens").cast("double"), 4
            ).alias("compression"),
        )
    )


@query(
    "dedup_keep_best",
    oracle=f"""
    WITH RECURSIVE {_simhash_pairs_ctes()},
    edges AS (
        SELECT id_a AS src, id_b AS dst FROM pairs
        UNION
        SELECT id_b AS src, id_a AS dst FROM pairs
    ),
    reach(src, dst) AS (
        SELECT src, src AS dst FROM (SELECT DISTINCT src FROM edges)
        UNION
        SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src
    ),
    comp AS (SELECT src AS id, min(dst) AS component FROM reach GROUP BY src),
    q AS (SELECT id, {_QUALITY_EXPR} AS quality FROM corpus),
    g AS (
        SELECT q.id, COALESCE(c.component, q.id) AS group_id, q.quality
        FROM q LEFT JOIN comp c ON c.id = q.id
    )
    SELECT id, group_id, quality,
           CAST(ROW_NUMBER() OVER (
               PARTITION BY group_id ORDER BY quality DESC, id) = 1 AS INT)
               AS keep
    FROM g
    """,
)
def dedup_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup RETENTION policy: after pair generation and transitive
    group resolution, keep the highest-QUALITY member of each
    duplicate group (quality desc, id asc tie-break) instead of the
    naive min-id — the canonical-document selection a curation
    pipeline actually ships (drop-2-word mutations score slightly
    lower on the length term, so originals win their groups).
    Singletons form their own group and keep themselves. One window
    over groups; everything upstream is the bucketed SimHash pair
    path."""
    from pyspark.sql import Window

    corpus = _mutated_corpus(spark, sf_dir)
    fps = D.simhash(corpus, "id", "text", bits=32)
    pairs = D.simhash_hamming_pairs(fps, "id", max_distance=3).select(
        "id_a", "id_b"
    )
    comp = D.connected_components(pairs)
    quality = corpus.select(
        "id", T.quality_score(F.col("text")).alias("quality")
    )
    g = quality.join(comp, "id", "left").withColumn(
        "group_id", F.coalesce("component", "id")
    )
    w = Window.partitionBy("group_id").orderBy(F.col("quality").desc(), "id")
    return g.withColumn(
        "keep", (F.row_number().over(w) == 1).cast("int")
    ).select("id", "group_id", "quality", "keep")


@query(
    "embedding_outliers",
    oracle="""
    WITH cl AS (
        SELECT label, CAST(r.i AS INTEGER) AS pos,
               ROUND(CAST(SUM(CAST(e.embedding[r.i + 1] AS DECIMAL(28,12)))
                          AS DOUBLE) / COUNT(*), 6) AS coord
        FROM embeddings e, UNNEST(range(len(e.embedding))) AS r(i)
        GROUP BY label, pos
    ),
    ex AS (
        SELECT e.vec_id, e.label, CAST(r.i AS INTEGER) AS pos,
               CAST(e.embedding[r.i + 1] AS DOUBLE) AS x
        FROM embeddings e, UNNEST(range(len(e.embedding))) AS r(i)
    ),
    s AS (
        SELECT ex.vec_id, ex.label,
               SUM(ex.x * cl.coord) AS dot,
               SQRT(SUM(ex.x * ex.x)) AS nv,
               SQRT(SUM(cl.coord * cl.coord)) AS nc
        FROM ex JOIN cl ON cl.label = ex.label AND cl.pos = ex.pos
        GROUP BY ex.vec_id, ex.label
    )
    SELECT vec_id, label,
           ROUND(dot / (nv * nc), 6) AS cos_centroid
    FROM s WHERE ROUND(dot / (nv * nc), 6) < 0.0
    """,
)
def embedding_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Label-quality QA: vectors whose cosine to their OWN label's
    centroid is negative — the standard mislabeled/outlier screen run
    before training on weakly-labeled embeddings. The centroid table
    is labels × dims (broadcast), the vector side reduces per vec_id
    with map-side combine — the corpus is shuffled once, in long form.
    Centroid coords round through the same DECIMAL(28,12) path as
    ``embedding_centroids_by_label`` so both engines score against
    identical prototypes."""
    emb = load_table(spark, "embeddings", sf_dir)
    ex = emb.select(
        "vec_id",
        "label",
        F.posexplode(F.col("embedding").cast("array<double>")).alias("pos", "x"),
    )
    cl = (
        ex.groupBy("label", "pos")
        .agg(
            F.round(
                F.sum(F.col("x").cast("decimal(28,12)")).cast("double")
                / F.count(F.lit(1)),
                6,
            ).alias("coord")
        )
    )
    s = (
        ex.join(F.broadcast(cl), ["label", "pos"])
        .groupBy("vec_id", "label")
        .agg(
            F.sum(F.col("x") * F.col("coord")).alias("dot"),
            F.sqrt(F.sum(F.col("x") * F.col("x"))).alias("nv"),
            F.sqrt(F.sum(F.col("coord") * F.col("coord"))).alias("nc"),
        )
    )
    cos = F.round(F.col("dot") / (F.col("nv") * F.col("nc")), 6)
    return s.withColumn("cos_centroid", cos).filter(
        F.col("cos_centroid") < 0.0
    ).select("vec_id", "label", "cos_centroid")


@query(
    "cross_source_duplication",
    oracle="""
    WITH corpus AS (
        SELECT source,
               md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fp
        FROM documents
        UNION ALL
        SELECT 'recrawl-' || source AS source,
               md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fp
        FROM documents WHERE doc_id % 3 = 0
    ),
    d AS (SELECT DISTINCT fp, source FROM corpus)
    SELECT a.source AS source_a, b.source AS source_b,
           COUNT(*) AS n_shared_docs
    FROM d a JOIN d b ON a.fp = b.fp AND a.source < b.source
    GROUP BY a.source, b.source
    ORDER BY source_a, source_b
    """,
)
def cross_source_duplication(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-governance matrix: how many exact-duplicate documents
    each PAIR of sources shares (fingerprint = md5 of normalized
    text), over the corpus plus a planted partial recrawl. The join is
    keyed on fingerprint — one row per distinct (fp, source), never
    all-pairs of documents — so the matrix costs one dedup shuffle
    plus a fingerprint-bucket join at any corpus size. The report that
    decides which overlapping crawls to drop before training."""
    docs = load_table(spark, "documents", sf_dir)
    fp = F.md5(
        F.trim(F.regexp_replace(F.lower(F.col("text")), r"\s+", " "))
    ).alias("fp")
    corpus = docs.select("source", fp).unionByName(
        docs.filter(F.col("doc_id") % 3 == 0).select(
            F.concat(F.lit("recrawl-"), F.col("source")).alias("source"), fp
        )
    )
    d = corpus.distinct()
    a = d.alias("a")
    b = d.alias("b")
    return (
        a.join(
            b,
            (F.col("a.fp") == F.col("b.fp"))
            & (F.col("a.source") < F.col("b.source")),
        )
        .groupBy(
            F.col("a.source").alias("source_a"),
            F.col("b.source").alias("source_b"),
        )
        .agg(F.count(F.lit(1)).alias("n_shared_docs"))
        .orderBy("source_a", "source_b")
    )


# ---------------------------------------------------------------------------
# DSIR importance resampling (hashed-feature log-likelihood ratio)
# ---------------------------------------------------------------------------



#: Round-7 scaled-integer DSIR chain (Spark twin:
#: ``sampling.dsir_log_ratio_scaled`` + ``similarity.global_rank``).
#: Same count CTEs as ``_DSIR_CTES``; the per-feature llr floors to a
#: scale-1e6 BIGINT before aggregation, so the per-doc score is an
#: exact integer pair and the rank key is ONE IEEE division of exact
#: BIGINTs — bit-identical in every engine (the round-6 reds ranked
#: over ROUND(avg_llr, 4), which round 6 proved is engine-unstable at
#: repr ties). Ends in ``dsir_ranked_i(doc_id, n_toks, llr_sum,
#: sel_rank, n_total)``.
_DSIR_INT_CTES = f"""
    dsir_toks AS (
        SELECT doc_id, unnest({_TOKS}) AS tok
        FROM documents WHERE trim(text) <> ''
    ),
    dsir_docfeat AS (
        SELECT doc_id,
               CAST(('0x' || substr(md5(tok), 1, 8)) AS BIGINT) % 4096 AS f,
               COUNT(*) AS n
        FROM dsir_toks WHERE tok <> ''
        GROUP BY doc_id, f
    ),
    dsir_rawc AS (SELECT f, SUM(n) AS c_raw FROM dsir_docfeat GROUP BY f),
    dsir_tgtc AS (
        SELECT d.f, SUM(d.n) AS c_tgt
        FROM dsir_docfeat d
        JOIN documents t ON t.doc_id = d.doc_id AND t.source = 'src0'
        GROUP BY d.f
    ),
    dsir_tot AS (
        SELECT SUM(d.n) AS n_raw,
               SUM(CASE WHEN t.source = 'src0' THEN d.n ELSE 0 END) AS n_tgt
        FROM dsir_docfeat d JOIN documents t ON t.doc_id = d.doc_id
    ),
    dsir_w AS (
        SELECT r.f,
               CAST(FLOOR(CAST(1000000 AS DOUBLE) *
                    (ln((CAST(COALESCE(t.c_tgt, 0) AS DOUBLE)
                         + CAST(1 AS DOUBLE))
                        / (CAST(tot.n_tgt AS DOUBLE) + CAST(4096 AS DOUBLE)))
                     - ln((CAST(r.c_raw AS DOUBLE) + CAST(1 AS DOUBLE))
                          / (CAST(tot.n_raw AS DOUBLE)
                             + CAST(4096 AS DOUBLE)))))
                    AS BIGINT) AS llr_s
        FROM dsir_rawc r
        LEFT JOIN dsir_tgtc t ON t.f = r.f
        CROSS JOIN dsir_tot tot
    ),
    dsir_scored_i AS (
        SELECT d.doc_id, CAST(SUM(d.n) AS BIGINT) AS n_toks,
               CAST(SUM(d.n * w.llr_s) AS BIGINT) AS llr_sum
        FROM dsir_docfeat d JOIN dsir_w w ON w.f = d.f
        GROUP BY d.doc_id
    ),
    dsir_ranked_i AS (
        SELECT doc_id, n_toks, llr_sum,
               ROW_NUMBER() OVER (
                   ORDER BY CAST(llr_sum AS DOUBLE) / CAST(n_toks AS DOUBLE)
                            DESC, doc_id) AS sel_rank,
               COUNT(*) OVER () AS n_total
        FROM dsir_scored_i
    )
"""


def _dsir_ranked_int(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark twin of the ``dsir_ranked_i`` CTE: scaled-integer scores,
    ranked by ``similarity.global_rank`` (range-partitioned exact
    global rank — no unpartitioned corpus window; the round-6 chain's
    global ``Window.orderBy`` was the plan audit's one remaining
    corpus-cardinality single-task sort)."""
    docs = load_table(spark, "documents", sf_dir)
    # doc-sized (doc_id, n_toks, llr_sum) but corpus-heavy lineage
    # (token explode + hashed-feature aggregation); global_rank's
    # three traversals plus the n_total count re-ran it 4× unpersisted
    scored = managed_persist(
        SA.dsir_log_ratio_scaled(docs, F.col("source") == F.lit("src0"))
    )
    keyed = scored.withColumn(
        "__key", F.col("llr_sum").cast("double") / F.col("n_toks").cast("double")
    )
    ranked = S.global_rank(
        keyed,
        [F.col("__key").desc(), F.col("doc_id")],
        rank_col="sel_rank",
        # descending first key → the ASCENDING boundary axis is its
        # negation (keys are non-null rationals, so no NULLS LAST
        # placement concern)
        boundary_key=-F.col("__key"),
    ).drop("__key")
    totals = F.broadcast(scored.agg(F.count(F.lit(1)).alias("n_total")))
    return ranked.crossJoin(totals)


@query(
    "dsir_importance_scores",
    oracle=f"""
    WITH {_DSIR_INT_CTES}
    SELECT r.doc_id, d.source, d.lang, r.n_toks, r.llr_sum, r.sel_rank
    FROM dsir_ranked_i r JOIN documents d ON d.doc_id = r.doc_id
    WHERE r.sel_rank <= 50
    """,
)
def dsir_importance_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR data selection (Xie et al. 2023): hashed-feature
    importance scores of every document against the 'src0' target
    distribution, top-50 by score. Round 7: scores are scale-1e6
    floored-integer sums (``sampling.dsir_log_ratio_scaled``), the
    rank key is one exact-input IEEE division, and the rank itself is
    ``similarity.global_rank`` (range-partitioned — no single-task
    corpus window; kills both the round-6 driver red and the plan
    audit's scale-weak note). Output is integer-exact end to end."""
    docs = load_table(spark, "documents", sf_dir)
    return (
        _dsir_ranked_int(spark, sf_dir)
        .filter(F.col("sel_rank") <= 50)
        .join(docs.select("doc_id", "source", "lang"), "doc_id")
        .select("doc_id", "source", "lang", "n_toks", "llr_sum", "sel_rank")
    )


@query(
    "dsir_resample_counts",
    oracle=f"""
    WITH {_DSIR_INT_CTES}
    SELECT d.source,
           COUNT(*) AS n_docs,
           CAST(SUM(CASE WHEN r.sel_rank * 5 <= r.n_total THEN 1 ELSE 0 END)
                AS BIGINT) AS n_sel
    FROM dsir_ranked_i r JOIN documents d ON d.doc_id = r.doc_id
    GROUP BY d.source ORDER BY d.source
    """,
)
def dsir_resample_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR selection diagnostic: per source, how many documents the
    top-20% importance cut keeps — the selected mix should shift
    toward the target source's distribution. Round 7: the cut is
    ``sel_rank·5 ≤ n_total`` over the integer-exact global rank (see
    dsir_importance_scores) — no float comparison anywhere."""
    docs = load_table(spark, "documents", sf_dir)
    return (
        _dsir_ranked_int(spark, sf_dir)
        .join(docs.select("doc_id", "source"), "doc_id")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(
                (F.col("sel_rank") * 5 <= F.col("n_total")).cast("bigint")
            ).alias("n_sel"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# naive-Bayes language classifier (closed-form, hashed features)
# ---------------------------------------------------------------------------

#: Shared NB CTE chain ending in ``nb_scores(doc_id, lang, clabel,
#: score)`` and ``nb_pred(doc_id, lang, predicted)``. Same
#: boring-portable-SQL and md5-bucket conventions as _DSIR_CTES. The
#: margin gate's nb score-gap metric reuses ``nb_scores`` verbatim.
_NB_CTES = f"""
    nb_toks AS (
        SELECT doc_id, lang, unnest({_TOKS}) AS tok
        FROM documents WHERE trim(text) <> ''
    ),
    nb_docfeat AS (
        SELECT doc_id, lang,
               CAST(('0x' || substr(md5(tok), 1, 8)) AS BIGINT) % 4096 AS f,
               COUNT(*) AS n
        FROM nb_toks WHERE tok <> ''
        GROUP BY doc_id, lang, f
    ),
    nb_cf AS (
        SELECT lang AS clabel, f, SUM(n) AS c
        FROM nb_docfeat GROUP BY lang, f
    ),
    nb_ct AS (SELECT clabel, SUM(c) AS tot FROM nb_cf GROUP BY clabel),
    nb_docs AS (SELECT DISTINCT doc_id, lang FROM nb_docfeat),
    nb_prior AS (
        SELECT lang AS clabel,
               ln(CAST(COUNT(*) AS DOUBLE)
                  / CAST((SELECT COUNT(*) FROM nb_docs) AS DOUBLE)) AS lp
        FROM nb_docs GROUP BY lang
    ),
    nb_feats AS (SELECT DISTINCT f FROM nb_docfeat),
    nb_w AS (
        SELECT fs.f, t.clabel,
               ln((CAST(COALESCE(c.c, 0) AS DOUBLE) + CAST(1 AS DOUBLE))
                  / (CAST(t.tot AS DOUBLE) + CAST(4096 AS DOUBLE))) AS w
        FROM nb_feats fs
        CROSS JOIN nb_ct t
        LEFT JOIN nb_cf c ON c.f = fs.f AND c.clabel = t.clabel
    ),
    nb_ll AS (
        SELECT d.doc_id, d.lang, w.clabel,
               SUM(CAST(d.n AS DOUBLE) * w.w) AS ll
        FROM nb_docfeat d JOIN nb_w w ON w.f = d.f
        GROUP BY d.doc_id, d.lang, w.clabel
    ),
    nb_scores AS (
        SELECT l.doc_id, l.lang, l.clabel, p.lp + l.ll AS score
        FROM nb_ll l JOIN nb_prior p ON p.clabel = l.clabel
    ),
    nb_pred AS (
        SELECT doc_id, lang, clabel AS predicted
        FROM (
            SELECT doc_id, lang, clabel,
                   ROW_NUMBER() OVER (PARTITION BY doc_id
                                      ORDER BY score DESC, clabel) AS rk
            FROM nb_scores
        ) WHERE rk = 1
    )
"""


@query(
    "nb_lang_confusion",
    oracle=f"""
    WITH {_NB_CTES}
    SELECT lang, predicted, COUNT(*) AS n_docs
    FROM nb_pred
    GROUP BY lang, predicted ORDER BY lang, predicted
    """,
)
def nb_lang_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Closed-form text classification: multinomial naive Bayes over
    hashed token features, self-trained on the corpus's own language
    labels, reported as the confusion matrix (true lang × predicted,
    counts-only — the diagonal is the model's self-consistency). The
    classifier family a curation pipeline uses for quality/domain
    gating, with training expressed as pure aggregation so the whole
    model fits one broadcastable B×|classes| weight matrix at any
    corpus size (operators.text.nb_hashed_scores). Argmax
    determinism is guarded by the nb_score_gap margin metric."""
    docs = load_table(spark, "documents", sf_dir)
    scores = T.nb_hashed_scores(docs, "lang")
    return (
        T.nb_predict(scores)
        .groupBy("lang", "predicted")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .orderBy("lang", "predicted")
    )


# ---------------------------------------------------------------------------
# product quantization (integer-exact ADC search + codebook balance)
# ---------------------------------------------------------------------------

#: Shared PQ CTE chain over the int8 code space (same quantization
#: formula as ann_int8_recall's oracle), ending in ``pq_enc(vec_id,
#: sub, cid)`` and ``pq_ranked``. All distances are INTEGER sums —
#: order-independent and exact in any engine — so PQ needs no margin
#: gate: argmin/rank tiebreaks (min cid / min neighbor_id) are total
#: orders over integers.
def _pq_code_sql(quant: str) -> str:
    """The int8 quantization expression of the PQ chain. ``"round"``
    is the original (ann_int8_recall-shared) form — kept verbatim for
    the driver-green queries; ``"floor"`` is the round-7 tie-free form
    (see operators.similarity.quantize_int8)."""
    if quant == "floor":
        return (
            "GREATEST(0, LEAST(255,"
            " CAST(FLOOR((l.x - s.mn) * 256 / (s.mx - s.mn))"
            " AS INTEGER))) - 128"
        )
    return (
        "GREATEST(-128, LEAST(127,"
        " CAST(ROUND((l.x - s.mn) / (s.mx - s.mn) * 255)"
        " AS INTEGER) - 128))"
    )


def _pq_ctes(quant: str) -> str:
    return f"""
    pq_base AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    pq_dims AS (SELECT UNNEST(range(64)) AS d),
    pq_long AS (
        SELECT b.vec_id, pq_dims.d, b.v[pq_dims.d + 1] AS x
        FROM pq_base b, pq_dims
    ),
    pq_stats AS (SELECT d, MIN(x) AS mn, MAX(x) AS mx FROM pq_long GROUP BY d),
    pq_code AS (
        SELECT l.vec_id,
               CAST(FLOOR(CAST(l.d AS DOUBLE) / 16) AS INTEGER) AS sub,
               CAST(l.d % 16 AS INTEGER) AS spos,
               CASE WHEN s.mx > s.mn
                    THEN {_pq_code_sql(quant)}
                    ELSE 0 END AS c
        FROM pq_long l JOIN pq_stats s ON s.d = l.d
    ),
    pq_seed_ids AS (
        SELECT vec_id,
               CAST(ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS INTEGER) AS cid
        FROM (SELECT vec_id FROM pq_base ORDER BY vec_id LIMIT 16) t
    ),
    pq_books AS (
        SELECT si.cid, c.sub, c.spos, c.c
        FROM pq_seed_ids si JOIN pq_code c ON c.vec_id = si.vec_id
    ),
    pq_assign AS (
        SELECT c.vec_id, c.sub, b.cid,
               SUM((c.c - b.c) * (c.c - b.c)) AS d2
        FROM pq_code c JOIN pq_books b ON b.sub = c.sub AND b.spos = c.spos
        GROUP BY c.vec_id, c.sub, b.cid
    ),
    pq_enc AS (
        SELECT vec_id, sub, cid FROM (
            SELECT vec_id, sub, cid,
                   ROW_NUMBER() OVER (PARTITION BY vec_id, sub
                                      ORDER BY d2, cid) AS rk
            FROM pq_assign
        ) t WHERE rk = 1
    ),
    pq_lut AS (
        SELECT c.vec_id AS query_id, c.sub, b.cid,
               SUM((c.c - b.c) * (c.c - b.c)) AS d2
        FROM pq_code c JOIN pq_books b ON b.sub = c.sub AND b.spos = c.spos
        WHERE c.vec_id % 50 = 0
        GROUP BY c.vec_id, c.sub, b.cid
    ),
    pq_adc AS (
        SELECT l.query_id, e.vec_id AS neighbor_id, SUM(l.d2) AS adc_d2
        FROM pq_enc e JOIN pq_lut l ON l.sub = e.sub AND l.cid = e.cid
        WHERE e.vec_id <> l.query_id
        GROUP BY l.query_id, e.vec_id
    ),
    pq_ranked AS (
        SELECT query_id, neighbor_id, adc_d2,
               ROW_NUMBER() OVER (PARTITION BY query_id
                                  ORDER BY adc_d2, neighbor_id) AS rank
        FROM pq_adc
    )
"""


#: Original (ROUND) chain — byte-compatible with the driver-green
#: pq_code_balance / ann_ivfpq_recall oracles; DO NOT change.
_PQ_CTES = _pq_ctes("round")
#: Round-7 tie-free chain for the two driver-red top-k queries.
_PQ_CTES_FLOOR = _pq_ctes("floor")


@query(
    "pq_ann_topk",
    oracle=f"""
    WITH {_PQ_CTES_FLOOR}
    SELECT query_id, neighbor_id, CAST(adc_d2 AS BIGINT) AS adc_d2, rank
    FROM pq_ranked WHERE rank <= 5
    """,
)
def pq_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization ANN: the corpus compresses to m=4
    codeword ids per vector (64× vs float32), queries rank neighbors
    by asymmetric integer L2 distance through the codebooks
    (operators.similarity.pq_adc_topk). Integer-exact end to end —
    EXCEPT the int8 quantization itself, whose ROUND half-case
    resolution proved engine-specific (round-6 driver red with
    pq_code_balance green: codes agreed in aggregate, a ±1 boundary
    code flipped exact ADC sums). Round 7 quantizes with the tie-free
    floor form on both sides (similarity.quantize_int8 rounding=
    "floor"); the green balance/recall queries keep the ROUND chain
    untouched."""
    emb = load_table(spark, "embeddings", sf_dir)
    return S.pq_adc_topk(emb, k=5, rounding="floor").select(
        "query_id", "neighbor_id", "adc_d2", "rank"
    )


@query(
    "pq_code_balance",
    oracle=f"""
    WITH {_PQ_CTES}
    SELECT sub, cid, COUNT(*) AS n_vectors
    FROM pq_enc GROUP BY sub, cid ORDER BY sub, cid
    """,
)
def pq_code_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ codebook utilization: vectors per (subspace, codeword).
    The index-health diagnostic — a dead codeword wastes a code
    point, a hot one degrades ADC resolution; at corpus scale this
    is the histogram that decides when to retrain codebooks. One
    map-side-combinable aggregate over the encode projection."""
    emb = load_table(spark, "embeddings", sf_dir)
    mins, maxes = S.dim_min_max(emb)
    codes = S.quantize_int8(emb, mins, maxes).select("vec_id", "code")
    books = S.pq_codebooks(codes)
    return (
        S.pq_encode(codes, books)
        .select(F.posexplode("pqcode").alias("sub", "cid"))
        .groupBy("sub", "cid")
        .agg(F.count(F.lit(1)).alias("n_vectors"))
        .orderBy("sub", "cid")
    )


#: Shared IVF-PQ CTE chain: ann_ivf_topk's cell index (9dp-rounded
#: assignment, min-cid tiebreak) feeding pq_ann_topk's integer ADC
#: ranking over the probed cells' candidates. Ends in ``ivfpq_ranked``.
def _ivfpq_ctes(pq: str) -> str:
    return f"""{_IVF_NRM_SQL},
    {_IVF_ASSIGN_PROBES_SQL},
    {pq},
    ivfpq_adc AS (
        SELECT p.query_id, a.vec_id AS neighbor_id, SUM(l.d2) AS adc_d2
        FROM probes p
        JOIN assign a ON a.cell = p.cell
        JOIN pq_enc e ON e.vec_id = a.vec_id
        JOIN pq_lut l ON l.query_id = p.query_id
                     AND l.sub = e.sub AND l.cid = e.cid
        WHERE a.vec_id <> p.query_id
        GROUP BY p.query_id, a.vec_id
    ),
    ivfpq_ranked AS (
        SELECT query_id, neighbor_id, adc_d2,
               ROW_NUMBER() OVER (PARTITION BY query_id
                                  ORDER BY adc_d2, neighbor_id) AS rank
        FROM ivfpq_adc
    )"""


#: ROUND chain — shared verbatim by the driver-green ann_ivfpq_recall.
_IVFPQ_CTES = _ivfpq_ctes(_PQ_CTES)
#: Round-7 tie-free chain for the driver-red ann_ivfpq_topk.
_IVFPQ_CTES_FLOOR = _ivfpq_ctes(_PQ_CTES_FLOOR)


@query(
    "ann_ivfpq_topk",
    oracle=f"""
    WITH {_IVFPQ_CTES_FLOOR}
    SELECT query_id, neighbor_id, CAST(adc_d2 AS BIGINT) AS adc_d2, rank
    FROM ivfpq_ranked WHERE rank <= 5
    """,
)
def ann_ivfpq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ ANN top-5: IVF cell pruning (16 deterministic centroids,
    2-cell probe — ann_ivf_topk's index) picks the candidates, PQ
    asymmetric integer distance (pq_ann_topk's m=4 codebooks) ranks
    them — the standard billion-vector composition, where the search
    touches nprobe/cells of the corpus and only its m-byte codes
    (operators.similarity.ivfpq_topk: one corpus pass, map-side
    top-k). Cell assignment reuses the proven 9dp-rounded argmax;
    every distance is an integer sum. Round 7: the int8 quantization
    feeding the codes switches to the tie-free floor form (see
    pq_ann_topk — same round-6 driver-red cause); the driver-green
    ann_ivfpq_recall keeps the ROUND chain untouched."""
    emb = load_table(spark, "embeddings", sf_dir)
    # every index parameter pinned: the oracle SQL hardcodes them all
    return S.ivfpq_topk(
        emb, m=4, k=5, num_centroids=16, nprobe=2,
        num_codewords=16, query_mod=50, rounding="floor",
    ).select("query_id", "neighbor_id", "adc_d2", "rank")


@query(
    "ann_ivfpq_recall",
    oracle=f"""
    WITH {_IVFPQ_CTES},
    exact_top AS (
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
               ROW_NUMBER() OVER (
                   PARTITION BY q.vec_id
                   ORDER BY ROUND(list_cosine_similarity(q.v, c.v), 6) DESC,
                            c.vec_id
               ) AS rnk
        FROM pq_base q JOIN pq_base c ON q.vec_id <> c.vec_id
        WHERE q.vec_id % 50 = 0
    ),
    e5 AS (SELECT query_id, neighbor_id FROM exact_top WHERE rnk <= 5),
    a5 AS (SELECT query_id, neighbor_id FROM ivfpq_ranked WHERE rank <= 5),
    ov AS (
        SELECT e5.query_id, COUNT(*) AS n_overlap
        FROM e5 JOIN a5 USING (query_id, neighbor_id)
        GROUP BY e5.query_id
    )
    SELECT q.query_id,
           CAST(COALESCE(ov.n_overlap, 0) AS BIGINT) AS n_overlap,
           ROUND(CAST(COALESCE(ov.n_overlap, 0) AS DOUBLE) / 5, 6)
               AS recall_at_k
    FROM (SELECT DISTINCT query_id FROM e5) q
    LEFT JOIN ov USING (query_id)
    ORDER BY query_id
    """,
)
def ann_ivfpq_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@5 of the IVF-PQ index vs exact float search — the QA
    gate every production ANN deployment runs before flipping traffic
    to a compressed index, isolating the COMBINED loss of cell pruning
    (candidates outside the probed cells) and PQ code resolution
    (ADC mis-ranking inside them); compare against ann_int8_recall
    (quantization loss alone) to attribute a recall drop. Same
    integer-ratio output shape as the other recall reports."""
    emb = load_table(spark, "embeddings", sf_dir)
    queries = emb.filter(F.col("vec_id") % 50 == 0)
    exact = S.brute_force_topk_arrow(emb, queries, k=5).select(
        "query_id", "neighbor_id"
    )
    approx = S.ivfpq_topk(
        emb, m=4, k=5, num_centroids=16, nprobe=2,
        num_codewords=16, query_mod=50,
    ).select("query_id", "neighbor_id")
    ov = (
        exact.join(approx, ["query_id", "neighbor_id"])
        .groupBy("query_id")
        .agg(F.count(F.lit(1)).alias("n_overlap"))
    )
    return (
        exact.select("query_id")
        .distinct()
        .join(ov, "query_id", "left")
        .select(
            "query_id",
            F.coalesce(F.col("n_overlap"), F.lit(0)).cast("long").alias("n_overlap"),
            F.round(
                F.coalesce(F.col("n_overlap"), F.lit(0)).cast("double") / 5, 6
            ).alias("recall_at_k"),
        )
        .orderBy("query_id")
    )


# ---------------------------------------------------------------------------
# exact heavy hitters (Misra-Gries candidates + exact recount)
# ---------------------------------------------------------------------------

_HH_ORACLE = f"""
    WITH tok AS (
        SELECT unnest({_TOKS}) AS token
        FROM documents WHERE trim(text) <> ''
    ),
    tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_total FROM tok)
    SELECT token,
           CAST(COUNT(*) AS BIGINT) AS n_occ,
           (SELECT n_total FROM tot) AS n_total
    FROM tok
    GROUP BY token
    HAVING COUNT(*) * 200 > (SELECT n_total FROM tot)
    ORDER BY token
    """


@query("heavy_hitters_tokens", oracle=_HH_ORACLE)
def heavy_hitters_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT corpus heavy hitters — every token holding strictly more
    than 1/200th of all occurrences — without ever shuffling the
    vocabulary: a bounded-memory Misra-Gries pass nominates ≤ k−1
    candidates per partition (pigeonhole: the union provably contains
    every global heavy hitter), then one broadcast-semi-join recount
    scores only the candidates (``sketch.exact_heavy_hitters``). The
    oracle is the plain GROUP BY + HAVING over exact counts — the two
    must agree key-for-key BECAUSE the candidate stage is a strict
    superset and the recount is exact; any approximation leaking into
    the answer is a correctness failure, not tolerance."""
    from pg2any_spark.operators.sketch import exact_heavy_hitters

    toks = (
        load_table(spark, "documents", sf_dir)
        .filter(F.trim(F.col("text")) != "")
        .select(F.explode(T.tokens(F.col("text"))).alias("token"))
    )
    return exact_heavy_hitters(toks, "token", 200).orderBy("token")


@query("heavy_hitters_streaming", oracle=_HH_ORACLE)
def heavy_hitters_streaming(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heavy-hitter candidates maintained CONTINUOUSLY: token rows
    stream in three micro-batches (documents sharded by doc_id%3),
    each batch landing its Misra-Gries summary keys under its own
    ingest partition (``pipeline.mg_apply_batch``), and the
    union-distinct read-back candidates feed the SAME exact recount
    as the one-shot build — same oracle, because the pigeonhole
    superset argument holds across any partitioning of the stream
    into batches."""
    from pg2any_spark.streaming.pipeline import (
        read_mg_candidates,
        start_streaming_mg,
    )

    docs = load_table(spark, "documents", sf_dir).filter(
        F.trim(F.col("text")) != ""
    )
    work = _fresh_workdir("pg2any_mg_")
    src = f"{work}/tokens"
    for m in range(3):
        docs.filter(F.col("doc_id") % 3 == m).select(
            F.explode(T.tokens(F.col("text"))).alias("token")
        ).coalesce(1).write.mode("append").parquet(src)
    stream = (
        spark.readStream.schema("token string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = start_streaming_mg(
        stream, f"{work}/cands", f"{work}/ckpt", key_col="token", k=200
    )
    if not q.awaitTermination(300):
        q.stop()
        raise TimeoutError("streaming Misra-Gries did not drain in 300s")

    from pg2any_spark.operators.sketch import candidate_recount

    cands = read_mg_candidates(spark, f"{work}/cands", "token")
    toks = docs.select(F.explode(T.tokens(F.col("text"))).alias("token"))
    # single-pass recount+total (formerly two corpus scans here)
    return candidate_recount(toks, "token", cands, 200).orderBy("token")


# ---------------------------------------------------------------------------
# token-budget selection (quality-ordered prefix under a global budget)
# ---------------------------------------------------------------------------


@query(
    "token_budget_selection",
    oracle=f"""
    WITH {_LM_INT_CTES},
    vals AS (
        SELECT doc_id, n_bg,
               CAST(nll_sum AS DOUBLE) / CAST(n_bg AS DOUBLE) AS ppl
        FROM lm_i
    ),
    run AS (
        SELECT doc_id, n_bg,
               SUM(n_bg) OVER (ORDER BY ppl, doc_id
                               ROWS UNBOUNDED PRECEDING) AS run_units,
               (SELECT SUM(n_bg) FROM vals) AS tot_units
        FROM vals
    )
    SELECT d.source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(CASE WHEN r.run_units * 5 <= r.tot_units * 2
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
           CAST(SUM(CASE WHEN r.run_units * 5 <= r.tot_units * 2
                         THEN r.n_bg ELSE 0 END) AS BIGINT) AS kept_units
    FROM run r JOIN documents d ON d.doc_id = r.doc_id
    GROUP BY d.source ORDER BY d.source
    """,
)
def token_budget_selection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-per-token data pruning under a global budget: order
    documents best-perplexity-first (the CCNet fluency signal — the
    bit-stable single division of the scaled-integer LM sums) and keep
    the maximal prefix whose cumulative size stays within 40% of the
    corpus's total bigram units — "spend the token budget on the most
    fluent data first". The cumulative size is
    ``similarity.global_running_sum`` (range-bucketed prefix sum with
    broadcast bucket offsets), i.e. the 100 TB form of
    ``SUM(units) OVER (ORDER BY quality)`` — no single-partition
    window; the cutoff compare is pure BIGINT cross-multiplication
    (``run·5 ≤ tot·2``). The per-doc LM table (3 longs/doc — tiny
    relative to the corpus) is persisted because FOUR independent
    actions traverse it (the boundary quantile pass, the rank and
    offset branches, the corpus-total agg); without the persist each
    traversal re-runs the tokenize/explode/count LM pipeline."""
    docs = load_table(spark, "documents", sf_dir)
    lm = managed_persist(_lm_scaled_spark(docs))
    keyed = lm.withColumn(
        "__ppl",
        F.col("nll_sum").cast("double") / F.col("n_bg").cast("double"),
    )
    run = S.global_running_sum(
        keyed, [F.col("__ppl"), F.col("doc_id")], "n_bg",
        running_col="run_units",
    )
    tot = F.broadcast(lm.agg(F.sum("n_bg").cast("long").alias("tot_units")))
    kept = F.col("run_units") * 5 <= F.col("tot_units") * 2
    return (
        run.join(tot)
        .join(docs.select("doc_id", "source"), "doc_id")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum(F.when(kept, 1).otherwise(0)).cast("bigint").alias("n_kept"),
            F.sum(F.when(kept, F.col("n_bg")).otherwise(F.lit(0)))
            .cast("bigint")
            .alias("kept_units"),
        )
        .orderBy("source")
    )


@query(
    "ann_matryoshka_recall",
    oracle="""
    WITH base AS (
        SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
    ),
    trunc AS (SELECT vec_id, v[1:16] AS v FROM base),
    exact_top AS (
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
               ROW_NUMBER() OVER (
                   PARTITION BY q.vec_id
                   ORDER BY ROUND(list_cosine_similarity(q.v, c.v), 6) DESC,
                            c.vec_id
               ) AS rnk
        FROM base q JOIN base c ON q.vec_id <> c.vec_id
        WHERE q.vec_id % 50 = 0
    ),
    trunc_top AS (
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
               ROW_NUMBER() OVER (
                   PARTITION BY q.vec_id
                   ORDER BY ROUND(list_cosine_similarity(q.v, c.v), 6) DESC,
                            c.vec_id
               ) AS rnk
        FROM trunc q JOIN trunc c ON q.vec_id <> c.vec_id
        WHERE q.vec_id % 50 = 0
    ),
    e5 AS (SELECT query_id, neighbor_id FROM exact_top WHERE rnk <= 5),
    t5 AS (SELECT query_id, neighbor_id FROM trunc_top WHERE rnk <= 5),
    ov AS (
        SELECT e5.query_id, COUNT(*) AS n_overlap
        FROM e5 JOIN t5 USING (query_id, neighbor_id)
        GROUP BY e5.query_id
    )
    SELECT q.query_id,
           CAST(COALESCE(ov.n_overlap, 0) AS BIGINT) AS n_overlap,
           ROUND(CAST(COALESCE(ov.n_overlap, 0) AS DOUBLE) / 5, 6)
               AS recall_at_k
    FROM (SELECT DISTINCT query_id FROM e5) q
    LEFT JOIN ov USING (query_id)
    ORDER BY query_id
    """,
)
def ann_matryoshka_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@5 of prefix-truncated (Matryoshka-style, 64→16 dims)
    ANN vs the full-dimension exact search — the QA gate on the 4×
    search-time compression a nested-representation index buys
    (``similarity.truncated_recall_report``). Unlike int8
    quantization there is no stats pass at all: truncation is a pure
    per-row slice, and cosine's scale invariance makes
    renormalization unnecessary."""
    emb = load_table(spark, "embeddings", sf_dir)
    return S.truncated_recall_report(emb, trunc_dim=16, query_mod=50, k=5)


# ---------------------------------------------------------------------------
# perceptual image near-dup (dHash)
# ---------------------------------------------------------------------------


def _dhash_sql(shift: int) -> str:
    """56-bit dHash of the 7×9 pixel list ``p`` (1-based), brightness-
    shifted with a 255 clip — the SQL twin of
    ``multimodal._dhash_of_grid``."""
    return f"""CAST(list_sum(list_transform(range(56), i ->
        CASE WHEN LEAST(255, p[CAST((i // 8) * 9 + (i % 8) + 2 AS INTEGER)]
                             + {shift})
                > LEAST(255, p[CAST((i // 8) * 9 + (i % 8) + 1 AS INTEGER)]
                             + {shift})
             THEN CAST(1 AS BIGINT) << CAST(i AS INTEGER)
             ELSE CAST(0 AS BIGINT) END)) AS BIGINT)"""


@query(
    "media_phash_near_dup",
    oracle=f"""
    WITH img AS (
        SELECT doc_id AS asset_id, md5(text) AS h0
        FROM documents WHERE doc_id % 3 = 0
    ),
    c1 AS (SELECT asset_id, md5(h0) AS h1 FROM img),
    c2 AS (SELECT asset_id, h1, md5(h1) AS h2 FROM c1),
    c3 AS (SELECT asset_id, h1, h2, md5(h2) AS h3 FROM c2),
    c4 AS (SELECT asset_id, h1 || h2 || h3 || md5(h3) AS hx FROM c3),
    px AS (
        SELECT asset_id,
               list_transform(range(63), i ->
                   (strpos('0123456789abcdef',
                           substr(hx, CAST(2 * i + 1 AS INTEGER), 1)) - 1) * 16
                 + (strpos('0123456789abcdef',
                           substr(hx, CAST(2 * i + 2 AS INTEGER), 1)) - 1)
               ) AS p
        FROM c4
    ),
    fp AS (
        SELECT asset_id, {_dhash_sql(0)} AS dhash FROM px
        UNION ALL
        SELECT asset_id + 100000, {_dhash_sql(3)} AS dhash FROM px
    ),
    blocked AS (
        SELECT asset_id, dhash, b.blk,
               (dhash >> CAST(b.blk * 8 AS INTEGER)) & 255 AS bkey
        FROM fp, (SELECT unnest(generate_series(0, 6)) AS blk) b
    )
    SELECT DISTINCT a.asset_id AS id_a, b.asset_id AS id_b,
           CAST(bit_count(xor(a.dhash, b.dhash)) AS INTEGER) AS hamming
    FROM blocked a
    JOIN blocked b ON a.blk = b.blk AND a.bkey = b.bkey
                  AND a.asset_id < b.asset_id
    WHERE bit_count(xor(a.dhash, b.dhash)) <= 6
    ORDER BY id_a, id_b
    """,
)
def media_phash_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image near-duplicate detection by 56-bit perceptual difference
    hash (dHash): each image's luminance grid hashes to adjacent-cell
    brightness comparisons, a planted brightness-shifted variant
    (+3, clipped at 255) of every image joins the corpus, and pairs
    within Hamming distance 6 surface through pigeonhole blocking on
    7 disjoint 8-bit slices (``dedup.hamming_pairs``) — never an
    all-pairs scan. The shift preserves every comparison except at the
    clip boundary, so variants land a few bits from their originals —
    the exact property that makes dHash a crawl-image dedup workhorse.
    The fake decoder derives the grid from the payload's md5 chain
    (this module's oracle-reproducibility idiom); the REAL path
    (``image_dhash(fake=False)``) block-averages actual PNG pixels
    through the built-in decoder and is unit-tested on synthetic
    PNGs."""
    from pg2any_spark.operators.dedup import hamming_pairs

    media = M.synth_media(spark, sf_dir)
    orig = M.image_dhash(media, fake=True, brightness_shift=0)
    variant = M.image_dhash(media, fake=True, brightness_shift=3).select(
        (F.col("asset_id") + 100000).alias("asset_id"), "dhash"
    )
    fps = orig.unionByName(variant)
    return (
        hamming_pairs(fps, "asset_id", "dhash", bits=56, max_distance=6)
        .withColumn("hamming", F.col("hamming").cast("int"))
        .orderBy("id_a", "id_b")
    )


# ---------------------------------------------------------------------------
# graph centrality (scaled-integer PageRank over the event click graph)
# ---------------------------------------------------------------------------


def _pagerank_oracle(iterations: int = 3, scale: int = 10**12) -> str:
    """Unrolled scaled-integer PageRank CTE chain — the SQL twin of
    ``graph.pagerank_scaled`` (same floor points, same damping
    cross-multiplication, so every iteration is BIGINT-exact)."""
    head = f"""
    WITH ev AS (
        SELECT user_id, ts, event_id,
               CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
        FROM events
    ),
    seq AS (
        SELECT k AS dst,
               LAG(k) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   AS src
        FROM ev
    ),
    edges AS (
        SELECT src, dst, CAST(COUNT(*) AS BIGINT) AS cnt
        FROM seq WHERE src IS NOT NULL GROUP BY src, dst
    ),
    nodes AS (
        SELECT src AS k FROM edges UNION SELECT dst FROM edges
    ),
    nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM nodes),
    outdeg AS (
        SELECT src, CAST(SUM(cnt) AS BIGINT) AS outdeg
        FROM edges GROUP BY src
    ),
    r0 AS (
        SELECT k, (SELECT {scale} // n FROM nn) AS r FROM nodes
    )"""
    iters = []
    for i in range(1, iterations + 1):
        iters.append(f""",
    inc{i} AS (
        SELECT e.dst AS k,
               CAST(SUM(e.cnt * (p.r // d.outdeg)) AS BIGINT) AS s
        FROM edges e
        JOIN r{i - 1} p ON p.k = e.src
        JOIN outdeg d ON d.src = e.src
        GROUP BY e.dst
    ),
    r{i} AS (
        SELECT n.k,
               (SELECT ({15 * scale}) // (100 * nn.n) FROM nn)
               + (85 * COALESCE(i.s, 0)) // 100 AS r
        FROM nodes n LEFT JOIN inc{i} i ON i.k = n.k
    )""")
    tail = f"""
    SELECT k, CAST(r AS BIGINT) AS pagerank
    FROM r{iterations} ORDER BY k
    """
    return head + "".join(iters) + tail


@query("graph_pagerank_events", oracle=_pagerank_oracle())
def graph_pagerank_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank centrality over the clickstream transition graph
    (consecutive ``props.k`` visits per user), 3 iterations of EXACT
    scaled-integer arithmetic (``operators/graph.py``): per-edge
    contributions integer-divide BEFORE the sum so every aggregate is
    an order-free BIGINT, and the 0.85 damping is an integer
    cross-multiplication — a fixed-iteration-count iterative algorithm
    whose output is bit-identical across engines and partitionings,
    where the textbook float PageRank would be summation-order
    jitter. Each iteration is one join of the ≤|V|-row rank vector
    onto the edge list + one map-side-combinable SUM per
    destination."""
    from pg2any_spark.operators.graph import pagerank_scaled, transition_edges

    ev = load_table(spark, "events", sf_dir)
    edges = transition_edges(
        ev,
        "user_id",
        F.get_json_object("props", "$.k").cast("bigint"),
        [F.col("ts"), F.col("event_id")],
    )
    return pagerank_scaled(edges, iterations=3).orderBy("k")


@query(
    "events_anomaly_mad",
    oracle="""
    WITH v AS (
        SELECT event_type,
               CAST(ROUND(value * 100, 0) AS BIGINT) AS v100
        FROM events
    ),
    med AS (
        SELECT event_type, quantile_cont(CAST(v100 AS DOUBLE), 0.5) AS m
        FROM v GROUP BY event_type
    ),
    dev AS (
        SELECT v.event_type, v.v100,
               ABS(CAST(v.v100 AS DOUBLE) - med.m) AS d, med.m
        FROM v JOIN med USING (event_type)
    ),
    madt AS (
        SELECT event_type, quantile_cont(d, 0.5) AS mad
        FROM dev GROUP BY event_type
    )
    SELECT dev.event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CASE WHEN dev.d > 3 * madt.mad THEN 1 ELSE 0 END)
                AS BIGINT) AS n_anomalies,
           CAST(dev.m * 2 AS BIGINT) AS med_x2,
           CAST(madt.mad * 4 AS BIGINT) AS mad_x4
    FROM dev JOIN madt USING (event_type)
    GROUP BY dev.event_type, dev.m, madt.mad
    ORDER BY dev.event_type
    """,
)
def events_anomaly_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust anomaly accounting per event type: Median-Absolute-
    Deviation outlier screen (``timeseries.mad_anomaly_report`` —
    |v − median| > 3·MAD, the 50%-breakdown-point alternative to
    mean/stddev which outliers drag). Values scale to BIGINT cents
    before the percentiles, so every median/MAD is a dyadic rational
    both engines represent bit-identically and NO float column leaves
    the query (medians ×2 / MADs ×4 ride out as BIGINT) — the data-
    quality monitoring primitive of an ingest pipeline, cross-engine
    exact."""
    ev = load_table(spark, "events", sf_dir)
    return TS.mad_anomaly_report(ev, "event_type", "value").orderBy(
        "event_type"
    )


# ---------------------------------------------------------------------------
# classifier QA: exact ROC AUC (Mann-Whitney rank-sum as a BIGINT rational)
# ---------------------------------------------------------------------------


@query(
    "classifier_auc_exact",
    oracle=f"""
    WITH scored AS (
        SELECT CAST({_lang_score_sql("en")} AS BIGINT) AS s,
               CASE WHEN lang IS NOT DISTINCT FROM 'en'
                    THEN 1 ELSE 0 END AS y
        FROM documents
        WHERE text IS NOT NULL
    ),
    hist AS (
        SELECT s,
               CAST(SUM(y) AS BIGINT) AS np,
               CAST(SUM(1 - y) AS BIGINT) AS nn
        FROM scored GROUP BY s
    ),
    cum AS (
        SELECT np, nn,
               CAST(COALESCE(SUM(nn) OVER (
                   ORDER BY s
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
               ), 0) AS BIGINT) AS cn
        FROM hist
    )
    SELECT CAST(SUM(np) AS BIGINT) AS n_pos,
           CAST(SUM(nn) AS BIGINT) AS n_neg,
           CAST(SUM(np * (2 * cn + nn)) AS BIGINT) AS auc_num,
           CAST(2 * SUM(np) * SUM(nn) AS BIGINT) AS auc_den,
           CASE WHEN SUM(np) > 0 AND SUM(nn) > 0 THEN
               ROUND(CAST(SUM(np * (2 * cn + nn)) AS DOUBLE)
                     / CAST(2 * SUM(np) * SUM(nn) AS DOUBLE), 6)
           END AS auc
    FROM cum
    """,
)
def classifier_auc_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """QA gate on a quality/language classifier: EXACT ROC AUC of the
    integer English marker-hit score (the very count ``lang_id``
    argmaxes over, driver-proven green in ``lang_probe_scores``)
    against the labeled ``lang`` column — does the score actually rank
    English documents above the rest? ``similarity.exact_auc_report``
    computes the Mann-Whitney rank-sum over the SCORE HISTOGRAM (one
    map-side-combinable groupBy, then ``global_running_sum`` for the
    strictly-below negative prefix — never a per-row global rank), and
    the AUC leaves the query as a BIGINT rational (num = 2·U with the
    standard tie-half correction, den = 2·n_pos·n_neg) plus its single
    rounded division — the one float is a deterministic function of
    two exact integers. The curation use: a filter whose AUC ~0.5 is
    hash-sampling with extra steps; this is the number that says so,
    exactly, at any corpus size. NULL-text documents are excluded on
    BOTH sides before scoring: a NULL score would sort NULLS FIRST in
    Spark's ``global_running_sum`` but NULLS LAST under DuckDB's
    ``ORDER BY``, silently skewing the negative prefix (round-8
    advisor finding — latent until the fixture grows NULL text)."""
    docs = load_table(spark, "documents", sf_dir).filter(
        F.col("text").isNotNull()
    )
    scored = docs.select(
        T.lang_scores(F.col("text"))["en"].cast("long").alias("s_en"),
        F.col("lang").eqNullSafe(F.lit("en")).alias("is_en"),
    )
    return S.exact_auc_report(scored, "s_en", "is_en")


# ---------------------------------------------------------------------------
# training-shard assignment (striped LPT-style size balancing)
# ---------------------------------------------------------------------------


@query(
    "shard_striped_by_size",
    oracle=f"""
    WITH tok AS (
        SELECT doc_id,
               CAST(CASE WHEN trim(text) = '' THEN 0
                         ELSE len({_TOKS}) END AS BIGINT) AS n_tok
        FROM documents
    ),
    rk AS (
        SELECT doc_id, n_tok,
               ROW_NUMBER() OVER (ORDER BY n_tok DESC, doc_id) AS r
        FROM tok
    )
    SELECT CAST((r - 1) % 8 AS BIGINT) AS shard,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_tok) AS BIGINT) AS sum_tokens
    FROM rk GROUP BY 1 ORDER BY shard
    """,
)
def shard_striped_by_size(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-shard assignment by SIZE-STRIPED round robin — order
    documents largest-first and deal them across 8 shards like cards
    ((rank−1) mod 8, the longest-processing-time heuristic's striped
    form): each shard receives every 8th document of the size order,
    so per-shard token totals equalize to within one document without
    any sequential greedy pass. This is how a writer lays out training
    shards so no data-loader rank starves. The global size order comes
    from ``similarity.global_rank`` (range-bucketed, broadcast
    offsets — never a single-partition window); the tiebreak doc_id
    makes the assignment fully deterministic and re-run stable. The
    descending key rides in as ``boundary_key=−n_tok`` per the
    operator's SortOrder contract."""
    docs = load_table(spark, "documents", sf_dir)
    tok = docs.select(
        "doc_id",
        T.token_count(F.col("text")).cast("long").alias("n_tok"),
    )
    ranked = S.global_rank(
        tok,
        [F.col("n_tok").desc(), F.col("doc_id")],
        rank_col="r",
        boundary_key=-F.col("n_tok"),
    )
    return (
        ranked.groupBy(((F.col("r") - 1) % 8).cast("long").alias("shard"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_tok").cast("long").alias("sum_tokens"),
        )
        .orderBy("shard")
    )


# ---------------------------------------------------------------------------
# embedding-space QA: per-dimension distribution statistics
# ---------------------------------------------------------------------------


@query(
    "embedding_dim_stats",
    oracle="""
    WITH ex AS (
        SELECT r.i AS dim,
               CAST(ROUND(CAST(embedding[CAST(r.i + 1 AS INTEGER)] AS DOUBLE)
                          * 1000000) AS BIGINT) AS q
        FROM embeddings, UNNEST(range(len(embedding))) AS r(i)
    )
    SELECT CAST(dim AS BIGINT) AS dim,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(q) AS BIGINT) AS sum_q,
           CAST(SUM(q * q) AS BIGINT) AS sumsq_q,
           CAST(SUM(CASE WHEN ABS(q) < 10000 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_nearzero,
           ROUND(CAST(SUM(q) AS DOUBLE) / COUNT(*), 6) AS mean_q
    FROM ex GROUP BY dim ORDER BY dim
    """,
)
def embedding_dim_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-space QA: per-dimension first/second moments and the
    dead-dimension count (|x| < 0.01), the screen that catches a
    collapsed or truncated encoder before ANN indexes get built over
    garbage. Components quantize to BIGINT at scale 1e6 BEFORE any
    aggregation (float32→double widening is exact in both engines, so
    the single multiply-round chain is bit-identical), making every
    moment an order-independent integer sum — cross-engine exact with
    no float tolerance; the one emitted double is the final rounded
    mean division. Overflow: |q| ≤ ~2e6 at unit-ish scale ⇒ Σq² passes
    BIGINT range near ~2×10⁶ vectors per dimension, so the Σq² runs in
    DECIMAL(38,0) (matching the oracle's HUGEINT accumulator) and the
    final BIGINT cast is guarded by ``assert_true`` — past the
    headroom both engines now ERROR loudly instead of Spark wrapping
    silently while DuckDB raises (round-8 advisor finding). Plan: one
    posexplode + one map-side-combinable groupBy(dim) — 64 output
    rows at any corpus size."""
    emb = load_table(spark, "embeddings", sf_dir)
    ex = emb.select(
        F.posexplode("embedding").alias("dim", "x")
    ).select(
        F.col("dim").cast("long").alias("dim"),
        F.round(F.col("x").cast("double") * 1_000_000)
        .cast("long")
        .alias("q"),
    )
    # q² itself fits BIGINT comfortably (|q| ≤ ~2e6 ⇒ q² ≤ ~4e12); the
    # SUM is the wraparound risk, so accumulate in DECIMAL(38,0) and
    # make the final narrowing cast loud, like DuckDB's HUGEINT→BIGINT
    sumsq_dec = F.sum((F.col("q") * F.col("q")).cast("decimal(38,0)"))
    sumsq_guarded = F.when(
        F.assert_true(
            F.abs(sumsq_dec) <= F.lit(2**63 - 1).cast("decimal(38,0)"),
            F.lit("embedding_dim_stats: sum(q*q) exceeds BIGINT range"),
        ).isNull(),
        sumsq_dec.cast("long"),
    )
    return (
        ex.groupBy("dim")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("q").cast("long").alias("sum_q"),
            sumsq_guarded.alias("sumsq_q"),
            F.sum((F.abs(F.col("q")) < 10_000).cast("long"))
            .cast("long")
            .alias("n_nearzero"),
            F.round(
                F.sum("q").cast("double") / F.count(F.lit(1)), 6
            ).alias("mean_q"),
        )
        .orderBy("dim")
    )


# ---------------------------------------------------------------------------
# collocation extraction (pointwise mutual information, top-k)
# ---------------------------------------------------------------------------


@query(
    "collocations_pmi_topk",
    oracle=f"""
    WITH base AS (
        SELECT doc_id, {_TOKS} AS t FROM documents WHERE trim(text) <> ''
    ),
    uni AS (
        SELECT tok, CAST(COUNT(*) AS BIGINT) AS c_w
        FROM (SELECT unnest(t) AS tok FROM base) GROUP BY tok
    ),
    n_tok AS (SELECT CAST(SUM(c_w) AS BIGINT) AS n FROM uni),
    bg AS (
        SELECT t[CAST(r.i + 1 AS INTEGER)] || ' ' ||
               t[CAST(r.i + 2 AS INTEGER)] AS bg
        FROM base, UNNEST(range(len(t) - 1)) AS r(i)
        WHERE len(t) >= 2
    ),
    bgc AS (
        SELECT bg, CAST(COUNT(*) AS BIGINT) AS c_bg FROM bg GROUP BY bg
    ),
    n_bg AS (SELECT CAST(SUM(c_bg) AS BIGINT) AS nb FROM bgc),
    scored AS (
        SELECT bgc.bg, bgc.c_bg,
               CAST(FLOOR(CAST(1000000 AS DOUBLE) * ln(
                   (CAST(bgc.c_bg AS DOUBLE) / CAST(n_bg.nb AS DOUBLE))
                   / ((CAST(u1.c_w AS DOUBLE) / CAST(n_tok.n AS DOUBLE))
                      * (CAST(u2.c_w AS DOUBLE) / CAST(n_tok.n AS DOUBLE)))
               )) AS BIGINT) AS pmi_s
        FROM bgc
        JOIN uni u1 ON u1.tok = string_split(bgc.bg, ' ')[1]
        JOIN uni u2 ON u2.tok = string_split(bgc.bg, ' ')[2]
        CROSS JOIN n_bg CROSS JOIN n_tok
        WHERE bgc.c_bg >= 5
    )
    SELECT bg, c_bg, pmi_s FROM scored
    ORDER BY pmi_s DESC, bg LIMIT 20
    """,
)
def collocations_pmi_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collocation extraction — the top-20 bigrams by pointwise mutual
    information (min support 5), the classic corpus-linguistics screen
    for multi-word units ("new york"-style fused phrases) that a
    tokenizer or phrase-mining pass should treat as one symbol. Reuses
    the LM count pipeline's exact-integer skeleton: corpus bigram and
    unigram counts are BIGINT aggregates, and the PMI quantizes to a
    scale-1e6 floored BIGINT from one fixed-op-order double chain
    (p(bg)/(p(w1)·p(w2)) — the same single-ulp-exposure form the
    driver-green scaled LM uses), so ranking and ties are integer
    business with the bigram string as the final tiebreak. Plan: two
    map-side-combinable count aggs, two shuffle joins of the bigram
    table against the unigram table (no broadcast assumption — the
    vocabulary can be corpus-sized), broadcast 1-row totals, and a
    TakeOrdered(20) instead of a global sort."""
    docs = load_table(spark, "documents", sf_dir)
    base = docs.filter(F.trim(F.col("text")) != "")
    # uni feeds three consumers (u1, u2, n_tok) and the grouped bigram
    # table two (the support filter and the corpus total) — persist
    # both count tables so the corpus tokenize/explode passes run once,
    # the same multi-traversal rationale as token_budget_selection's
    # LM persist. Both tables are vocabulary-sized, not corpus-sized.
    uni = managed_persist(
        base.select(F.explode(T.tokens(F.col("text"))).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).cast("long").alias("c_w"))
    )
    n_tok = F.broadcast(uni.agg(F.sum("c_w").cast("long").alias("n")))
    bgc_all = managed_persist(
        base.select(
            F.explode(T.word_ngrams(F.col("text"), 2)).alias("bg")
        )
        .groupBy("bg")
        .agg(F.count(F.lit(1)).cast("long").alias("c_bg"))
    )
    bgc = bgc_all.filter(F.col("c_bg") >= 5)
    n_bg = F.broadcast(
        bgc_all.agg(F.sum("c_bg").cast("long").alias("nb"))
    )
    u1 = uni.select(F.col("tok").alias("__w1"), F.col("c_w").alias("c_w1"))
    u2 = uni.select(F.col("tok").alias("__w2"), F.col("c_w").alias("c_w2"))
    scored = (
        bgc.withColumn("__w1", F.substring_index("bg", " ", 1))
        .withColumn("__w2", F.substring_index("bg", " ", -1))
        .join(u1, "__w1")
        .join(u2, "__w2")
        .join(n_bg)
        .join(n_tok)
        .select(
            "bg",
            "c_bg",
            F.floor(
                F.lit(1_000_000.0)
                * F.log(
                    (F.col("c_bg").cast("double") / F.col("nb").cast("double"))
                    / (
                        (F.col("c_w1").cast("double") / F.col("n").cast("double"))
                        * (F.col("c_w2").cast("double") / F.col("n").cast("double"))
                    )
                )
            )
            .cast("long")
            .alias("pmi_s"),
        )
    )
    return scored.orderBy(F.col("pmi_s").desc(), "bg").limit(20)


# ---------------------------------------------------------------------------
# bitext mining (margin-based cross-set pair extraction)
# ---------------------------------------------------------------------------


@query(
    "bitext_margin_mining",
    oracle="""
    WITH src AS (
        SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
        WHERE label = 0 AND vec_id % 5 = 0
    ),
    srcf AS (
        SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
        WHERE label = 0
    ),
    tgt AS (
        SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
        WHERE label = 1
    ),
    fwd AS (
        SELECT s.vec_id AS qid, t.vec_id AS nid,
               ROUND(list_cosine_similarity(s.v, t.v), 6) AS cs,
               ROW_NUMBER() OVER (
                   PARTITION BY s.vec_id
                   ORDER BY ROUND(list_cosine_similarity(s.v, t.v), 6) DESC,
                            t.vec_id
               ) AS rnk
        FROM src s CROSS JOIN tgt t
    ),
    fwd6 AS (
        SELECT qid, nid, cs,
               CAST(ROUND(cs * 1000000) AS BIGINT) AS c6, rnk
        FROM fwd WHERE rnk <= 4
    ),
    ax AS (SELECT qid, CAST(SUM(c6) AS BIGINT) AS ax_sum,
                  CAST(COUNT(*) AS BIGINT) AS n_ax
           FROM fwd6 GROUP BY qid),
    best AS (SELECT qid, nid, cs, c6 FROM fwd6 WHERE rnk = 1),
    bwd AS (
        SELECT t.vec_id AS tid, s.vec_id AS sid,
               CAST(ROUND(ROUND(list_cosine_similarity(t.v, s.v), 6)
                          * 1000000) AS BIGINT) AS c6,
               ROW_NUMBER() OVER (
                   PARTITION BY t.vec_id
                   ORDER BY ROUND(list_cosine_similarity(t.v, s.v), 6) DESC,
                            s.vec_id
               ) AS rnk
        FROM (SELECT tg.vec_id, tg.v FROM tgt tg
              WHERE tg.vec_id IN (SELECT DISTINCT nid FROM best)) t
        CROSS JOIN srcf s
    ),
    ay AS (SELECT tid, CAST(SUM(c6) AS BIGINT) AS ay_sum,
                  CAST(COUNT(*) AS BIGINT) AS n_ay
           FROM bwd WHERE rnk <= 4 GROUP BY tid)
    SELECT b.qid AS src_id, b.nid AS tgt_id, b.cs AS cos_sim,
           ROUND(CAST(ax.n_ax + ay.n_ay AS DOUBLE) * b.c6
                 / (ax.ax_sum + ay.ay_sum), 6)
               AS margin
    FROM best b
    JOIN ax ON ax.qid = b.qid
    JOIN ay ON ay.tid = b.nid
    ORDER BY src_id
    """,
)
def bitext_margin_mining(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Margin-based bitext mining between two embedding populations
    (label 0 → label 1, a %5 query sample): each source query's best
    cross-set neighbor scored by the ratio margin
    cos/((a_x+a_y)/2) — the hub-discounting criterion parallel-corpus
    pipelines mine sentence pairs with (``similarity.margin_mining``).
    Both k-NN means ride as SUMS of 1e6-quantized BIGINT cosines, so
    the margin is a single exact-integer division rounded once —
    cross-engine stable with no float accumulation anywhere. Two
    broadcast-query brute-force passes at fixture scale; production
    swaps in the IVF/LSH candidate generators, same margin algebra."""
    emb = load_table(spark, "embeddings", sf_dir)
    src_full = emb.filter(F.col("label") == 0).select("vec_id", "embedding")
    src_q = src_full.filter(F.col("vec_id") % 5 == 0)
    tgt = emb.filter(F.col("label") == 1).select("vec_id", "embedding")
    return S.margin_mining(src_q, tgt, src_full, k=4)


# ---------------------------------------------------------------------------
# entity resolution: blocked fuzzy matching (edit-distance within blocks)
# ---------------------------------------------------------------------------


@query(
    "er_blocked_fuzzy_parts",
    oracle="""
    WITH named AS (
        SELECT p_partkey, p_name || ' ' || p_brand AS rec,
               string_split(p_name, ' ')[1] AS head
        FROM part
    ),
    grp AS (
        SELECT head, rec, CAST(COUNT(*) AS BIGINT) AS c
        FROM named GROUP BY head, rec
    ),
    per_head AS (
        SELECT head,
               CAST(SUM(c) * (SUM(c) - 1) // 2 AS BIGINT) AS n_candidates,
               CAST(SUM((c * (c - 1)) // 2) AS BIGINT) AS n_d0
        FROM grp GROUP BY head
    ),
    cross_pairs AS (
        SELECT a.head,
               levenshtein(a.rec, b.rec) AS d,
               a.c * b.c AS w
        FROM grp a JOIN grp b
          ON a.head = b.head AND a.rec < b.rec
         AND abs(length(a.rec) - length(b.rec)) <= 2
    ),
    hist AS (
        SELECT head,
               CAST(SUM(CASE WHEN d = 1 THEN w ELSE 0 END) AS BIGINT) AS n_d1,
               CAST(SUM(CASE WHEN d = 2 THEN w ELSE 0 END) AS BIGINT) AS n_d2
        FROM cross_pairs GROUP BY head
    )
    SELECT p.head, p.n_candidates, p.n_d0,
           COALESCE(h.n_d1, 0) AS n_d1,
           COALESCE(h.n_d2, 0) AS n_d2,
           p.n_d0 + COALESCE(h.n_d1, 0) + COALESCE(h.n_d2, 0) AS n_matches
    FROM per_head p LEFT JOIN hist h ON h.head = p.head
    ORDER BY p.head
    """,
)
def er_blocked_fuzzy_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity resolution over structured records — BLOCKED fuzzy
    matching: the record string is ``p_name || ' ' || p_brand``
    (round 11: name alone made every cross-record distance ≥ 3 at
    every fixture — the d1/d2 columns were structurally zero and the
    bounded-levenshtein path untested; brand codes such as
    ``Brand#13``/``Brand#15`` differ by 1-2 edits, giving the fuzzy
    tier real mass), candidate pairs share a blocking key (the name's
    head token), compared by exact Levenshtein distance, reported as a
    per-block candidate/match histogram (d=0 identical records, d≤2
    near-dups such as brand typos). The structured-record twin of the text dedup family:
    blocking turns the quadratic all-pairs comparison into
    per-block-key joins — the same pigeonhole argument as LSH bands —
    and the report's n_candidates column IS the blocking-cost audit a
    production ER pipeline tunes against (too-coarse key → candidate
    blow-up is visible, not silent). Edit distance is an integer in
    both engines (JVM built-in `levenshtein`, no UDF), so the whole
    report is exact.

    Scale shape (round 10 rebuilt the naive form after the 10× battery
    caught it concentrating ~30 minutes of levenshtein on ONE task;
    round 11 additionally FACTORIZES the compare space through
    distinct values — the measured 10× fixture has 200k parts but only
    64 distinct names, i.e. 2.5 BILLION raw candidate pairs that
    collapse to ≤ C(64,2) distinct comparisons):

    - dedupe-before-compare: rows group to ``(head, p_name, count)``
      first (one map-side-combinable aggregate), and every expensive
      comparison runs once per DISTINCT name pair, weighted by
      ``c_a · c_b`` on the way back out. Identical output for any
      input; cost collapses from C(rows,2) to C(distinct,2) per block
      — the standard ER move for value-skewed record sets.
    - ``n_candidates`` = C(n,2) and ``n_d0`` = Σ C(c,2) per block are
      ANALYTIC (within-group pairs are exactly the d=0 pairs; no
      enumeration at all). Cross-group pairs always have d ≥ 1.
    - the distinct-pair join stays SALTED by unordered bucket pairs on
      ``hash(p_name) % S`` (each side replicated S ways on
      ``(head, min(b,j), max(b,j))`` so every pair meets exactly once,
      spreading a block's pair space over S·(S+1)/2 tasks) — the
      defense that matters in the opposite regime, when distinct-name
      blocks are themselves huge.
    - pairs with ``|len(a)−len(b)| > 2`` are length-pruned BEFORE the
      edit distance (d ≥ |Δlen| ≥ 3 contributes zero to every output
      column), and surviving distances use the bounded
      ``levenshtein(a, b, 2)`` (banded O(k·n) form, −1 beyond the
      threshold) instead of the full O(n²) distance."""
    S = 8  # salt buckets: block pair-space spreads over S*(S+1)/2 tasks
    parts = load_table(spark, "part", sf_dir).select(
        F.concat_ws(" ", "p_name", "p_brand").alias("rec"),
        F.split(F.col("p_name"), " ").getItem(0).alias("head"),
    )
    grp = parts.groupBy("head", "rec").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    per_head = grp.groupBy("head").agg(
        (F.sum("c") * (F.sum("c") - F.lit(1)) / 2)
        .cast("long")
        .alias("n_candidates"),
        F.sum(F.col("c") * (F.col("c") - 1) / 2).cast("long").alias("n_d0"),
    )
    j = F.explode(F.sequence(F.lit(0), F.lit(S - 1))).alias("j")
    bucket = F.pmod(F.hash(F.col("rec")), F.lit(S))
    a = grp.select(
        F.col("head"),
        F.col("rec").alias("na"),
        F.col("c").alias("ca"),
        bucket.alias("ha"),
        j,
    ).select(
        "head", "na", "ca", "ha",
        F.least(F.col("ha"), F.col("j")).alias("b1"),
        F.greatest(F.col("ha"), F.col("j")).alias("b2"),
    )
    b = grp.select(
        F.col("head").alias("hb"),
        F.col("rec").alias("nb"),
        F.col("c").alias("cb"),
        bucket.alias("hbk"),
        j,
    ).select(
        "hb", "nb", "cb", "hbk",
        F.least(F.col("hbk"), F.col("j")).alias("c1"),
        F.greatest(F.col("hbk"), F.col("j")).alias("c2"),
    )
    d = F.levenshtein(F.col("na"), F.col("nb"), 2)
    w = F.col("ca") * F.col("cb")
    hist = (
        a.join(
            b,
            (F.col("head") == F.col("hb"))
            & (F.col("b1") == F.col("c1"))
            & (F.col("b2") == F.col("c2"))
            # cross-bucket pairs share exactly ONE (min,max) cell;
            # same-bucket pairs co-occur in all S of their cells, so
            # pin them to the diagonal cell or they count S times
            & ((F.col("ha") != F.col("hbk")) | (F.col("b1") == F.col("b2")))
            & (F.col("na") < F.col("nb"))
            & (F.abs(F.length("na") - F.length("nb")) <= 2),
        )
        .select("head", d.alias("d"), w.alias("w"))
        .groupBy("head")
        .agg(
            F.sum(F.when(F.col("d") == 1, F.col("w")).otherwise(F.lit(0)))
            .cast("long")
            .alias("n_d1"),
            F.sum(F.when(F.col("d") == 2, F.col("w")).otherwise(F.lit(0)))
            .cast("long")
            .alias("n_d2"),
        )
    )
    return (
        per_head.join(hist, "head", "left")
        .select(
            "head",
            "n_candidates",
            "n_d0",
            F.coalesce("n_d1", F.lit(0)).cast("long").alias("n_d1"),
            F.coalesce("n_d2", F.lit(0)).cast("long").alias("n_d2"),
            (
                F.col("n_d0")
                + F.coalesce("n_d1", F.lit(0))
                + F.coalesce("n_d2", F.lit(0))
            )
            .cast("long")
            .alias("n_matches"),
        )
        .orderBy("head")
    )


# ---------------------------------------------------------------------------
# graph: triangle census + clustering coefficient (co-purchase graph)
# ---------------------------------------------------------------------------


@query(
    "graph_triangle_census",
    oracle="""
    WITH items AS (
        SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    ),
    -- AS MATERIALIZED: edges is referenced 6x (deg twice, the triple
    -- join three times, the census once); inlined per-reference the
    -- co-purchase self-join re-runs each time and the triple join
    -- loses cardinality stats — the round-10 uniform-10x battery
    -- timeout (>240 s; 1.2 s materialized)
    edges AS MATERIALIZED (
        SELECT a.l_partkey AS u, b.l_partkey AS v
        FROM items a JOIN items b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        GROUP BY u, v HAVING COUNT(*) >= 2
    ),
    deg AS MATERIALIZED (
        SELECT node, CAST(COUNT(*) AS BIGINT) AS d FROM (
            SELECT u AS node FROM edges
            UNION ALL SELECT v AS node FROM edges
        ) GROUP BY node
    ),
    tri AS MATERIALIZED (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_tri
        FROM edges e1
        JOIN edges e2 ON e2.u = e1.v
        JOIN edges e3 ON e3.u = e1.u AND e3.v = e2.v
    )
    SELECT CAST((SELECT COUNT(*) FROM deg) AS BIGINT) AS n_nodes,
           CAST((SELECT COUNT(*) FROM edges) AS BIGINT) AS n_edges,
           (SELECT n_tri FROM tri) AS n_triangles,
           CAST((SELECT SUM(CAST(d * (d - 1) / 2 AS BIGINT)) FROM deg)
                AS BIGINT) AS n_wedges,
           ROUND(CAST(3 * (SELECT n_tri FROM tri) AS DOUBLE)
                 / CAST((SELECT SUM(CAST(d * (d - 1) / 2 AS BIGINT)) FROM deg)
                        AS DOUBLE), 6)
               AS clustering_coeff,
           CAST(0 AS BIGINT) AS n_capped_nodes
    """,
)
def graph_triangle_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle census of the part co-purchase graph (edges = part
    pairs co-bought in ≥2 orders) + the global clustering coefficient
    3·triangles/wedges — the graph-structure summary that tells a
    recommender whether co-purchase neighborhoods are cliquish or
    star-shaped. Triangles enumerate by the ORDERED-triple join (each
    triangle counted exactly once as u<v<w: e(u,v) ⋈ e(v,w) ⋈
    e(u,w)) — two hash joins on single node keys, the standard
    distributed triangle pattern whose intermediate is bounded by
    wedge count (and wedges/degrees are the explicit guardrail
    output). Every cell is an exact BIGINT; the coefficient is one
    division of two exact integers (d·(d−1) is always even, so the
    wedge sum is integer-exact in both engines). The census runs
    through ``operators.graph.triangle_census``, whose ``degree_cap``
    guardrail (mandatory ``n_capped_nodes`` report) bounds hub-node
    wedge fan-out on power-law graphs; the part co-purchase graph's
    degrees are order-size-bounded by construction, so this query runs
    uncapped and the report column pins 0."""
    # Co-purchase pairs via ONE per-order set aggregate + an in-row
    # pair expansion (round-11 optimization, guide §2.4): the former
    # items-self-join-on-orderkey shuffled the item table twice (both
    # join sides) and paid a join to produce pairs that are a pure
    # per-order combinatorial expansion. collect_set co-locates each
    # order once; sort_array + a nested transform emits exactly the
    # u < v pairs the self-join produced (same multiset per order,
    # baskets are order-size-bounded so the array expansion is tiny);
    # the ≥2-orders filter is the same count aggregate. One shuffle
    # replaces two plus a join.
    baskets = (
        load_table(spark, "lineitem", sf_dir)
        .groupBy("l_orderkey")
        .agg(F.sort_array(F.collect_set("l_partkey")).alias("__parts"))
    )
    pair_expr = F.flatten(
        F.transform(
            F.col("__parts"),
            lambda u, i: F.transform(
                F.slice(F.col("__parts"), i + 2, F.size(F.col("__parts"))),
                lambda v: F.struct(u.alias("u"), v.alias("v")),
            ),
        )
    )
    edges = (
        baskets.select(F.explode(pair_expr).alias("__p"))
        .select(F.col("__p.u").alias("u"), F.col("__p.v").alias("v"))
        .groupBy("u", "v")
        .agg(F.count(F.lit(1)).alias("__c"))
        .filter(F.col("__c") >= 2)
        .select("u", "v")
    )
    return G.triangle_census(edges, degree_cap=None)


# ---------------------------------------------------------------------------
# exact-substring dedup (ExactSubstr): true ≥50-token repeated spans
# per document pair, seed-and-chain on match diagonals
# ---------------------------------------------------------------------------

#: Planted exact-substring fixture (ids above 3e12, clear of both the
#: fixture and the other planted families). zzs*/zzu* span tokens and
#: zzf* fillers are nonsense stems that cannot collide with the lorem
#: corpus. The chain decoy is the documented failure mode of the
#: k-gram COVERAGE report (dedup_repeated_spans): P3's positions are
#: covered 0..69 by 10-grams duplicated against DIFFERENT partners
#: (P4 holds U[0:30], P5 holds U[20:70]), so coverage chains a
#: 70-token "span" that repeats nowhere as a whole — while the true
#: pairwise maxima are 30 (below threshold) and 50.
_XS_SPAN60 = " ".join(f"zzs{i}" for i in range(60))
_XS_U = [f"zzu{i}" for i in range(80)]
_XS_FILL = [f"zzf{i}" for i in range(100)]
_XS_PLANTED = [
    (3_000_000_000_001,
     " ".join(_XS_FILL[0:15]) + " " + _XS_SPAN60 + " " + " ".join(_XS_FILL[15:23])),
    (3_000_000_000_002,
     " ".join(_XS_FILL[23:32]) + " " + _XS_SPAN60 + " " + " ".join(_XS_FILL[32:37])),
    (3_000_000_000_003,
     " ".join(_XS_FILL[37:40]) + " " + " ".join(_XS_U) + " " + " ".join(_XS_FILL[40:42])),
    (3_000_000_000_004,
     " ".join(_XS_FILL[42:49]) + " " + " ".join(_XS_U[0:30]) + " " + " ".join(_XS_FILL[49:55])),
    (3_000_000_000_005,
     " ".join(_XS_FILL[55:66]) + " " + " ".join(_XS_U[20:70]) + " " + " ".join(_XS_FILL[66:70])),
]

_XS_VALUES = ",\n               ".join(
    f"({i}, '{t}')" for i, t in _XS_PLANTED
)

#: Shared oracle CTE chain ending in g(id, pos, h) — the positional
#: 25-gram hashes over corpus ∪ planted.
_XS_GRAM_CTES = f"""
    xs_corpus AS (
        SELECT doc_id AS id, text FROM documents
        UNION ALL
        SELECT CAST(v.id AS BIGINT), v.text
        FROM (VALUES {_XS_VALUES}) AS v(id, text)
    ),
    xs_toks AS (
        SELECT id, {_TOKS} AS t FROM xs_corpus WHERE trim(text) <> ''
    ),
    xs_g AS (
        SELECT id, CAST(r.i AS INTEGER) AS pos,
               md5(array_to_string(t[(r.i + 1):(r.i + 25)], ' ')) AS h
        FROM xs_toks, UNNEST(range(len(t) - 24)) AS r(i)
        WHERE len(t) >= 25
    )
"""


def _xs_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir).selectExpr(
        "doc_id AS id", "text"
    )
    from pg2any_spark.functions.localtable import literal_table

    planted = literal_table(spark, _XS_PLANTED, "id long, text string")
    return docs.unionByName(planted)


@query(
    "dedup_exact_substring",
    oracle=f"""
    WITH {_XS_GRAM_CTES},
    elig AS (SELECT h FROM xs_g GROUP BY h HAVING COUNT(*) BETWEEN 2 AND 8),
    ge AS (SELECT xs_g.* FROM xs_g JOIN elig USING (h)),
    p AS (
        SELECT a.id AS id_a, b.id AS id_b, a.pos AS pa,
               a.pos - b.pos AS diag
        FROM ge a JOIN ge b ON a.h = b.h
         AND (a.id < b.id OR (a.id = b.id AND a.pos < b.pos))
    ),
    flg AS (
        SELECT id_a, id_b, diag, pa,
               CASE WHEN pa - LAG(pa) OVER (
                        PARTITION BY id_a, id_b, diag ORDER BY pa) > 25
                    THEN 1 ELSE 0 END AS ns
        FROM p
    ),
    isl AS (
        SELECT id_a, id_b, diag, pa,
               SUM(ns) OVER (PARTITION BY id_a, id_b, diag ORDER BY pa
                             ROWS UNBOUNDED PRECEDING) AS grp
        FROM flg
    ),
    sp AS (
        SELECT id_a, id_b, MAX(pa) - MIN(pa) + 25 AS len
        FROM isl GROUP BY id_a, id_b, diag, grp
        HAVING MAX(pa) - MIN(pa) + 25 >= 50
    )
    SELECT id_a, id_b,
           CAST(COUNT(*) AS BIGINT) AS n_spans,
           CAST(MAX(len) AS BIGINT) AS longest_span,
           CAST(SUM(len) AS BIGINT) AS span_tokens
    FROM sp GROUP BY id_a, id_b ORDER BY id_a, id_b
    """,
)
def dedup_exact_substring(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ExactSubstr dedup (Lee et al. 2022): TRUE exact repeated
    substrings of ≥50 tokens per document pair, found by chaining
    25-gram anchor matches along occurrence-pair DIAGONALS
    (``operators.dedup.exact_substring_spans``) — the distributed form
    of the suffix-array longest-repeat scan, exact for every repeat
    ≥ 25 tokens under the occurrence cap. Closes the one failure mode
    of the k-gram coverage report (``dedup_repeated_spans``), which
    unions duplicate evidence across partners: the planted chain decoy
    (P3 covered 0..69 by two DIFFERENT partners' 30/50-token overlaps)
    chains to a 70-token coverage "span" that repeats nowhere, while
    this query reports the true per-pair spans — (P1,P2) = 60,
    (P3,P5) = 50, and (P3,P4)'s 30 correctly below threshold. Runs
    over documents ∪ planted; natural recrawl duplicates in the
    fixture surface as whole-document spans. Scale: anchors shuffle as
    md5 digests, the pair join is ≤ C(max_occ,2) per hash, islands
    merge under pair-partitioned windows — no suffix array, no
    quadratic blow-up, no global sort."""
    return D.exact_substring_spans(
        _xs_corpus(spark, sf_dir), "id", "text",
        k=25, min_len=50, max_occ=8,
    )


@query(
    "xs_probe_hot_grams",
    oracle=f"""
    WITH {_XS_GRAM_CTES},
    c AS (SELECT h, COUNT(*) AS c FROM xs_g GROUP BY h)
    SELECT CAST(SUM(CASE WHEN c > 8 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_hot_grams,
           CAST(SUM(CASE WHEN c > 8 THEN c ELSE 0 END) AS BIGINT)
               AS hot_occurrences,
           CAST(SUM(CASE WHEN c BETWEEN 2 AND 8 THEN 1 ELSE 0 END)
               AS BIGINT) AS n_eligible_grams
    FROM c
    """,
)
def xs_probe_hot_grams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mandatory cap report for ``dedup_exact_substring``: distinct
    25-gram hashes the occurrence cap (8) dropped, the occurrence mass
    they carried, and the eligible-hash count — the query that keeps
    the cap honest (``hot_band_keys`` convention: a bounded operator
    must report what it bounded)."""
    return D.exact_substring_hot_grams(
        _xs_corpus(spark, sf_dir), "id", "text", k=25, max_occ=8,
    )


@query(
    "dedup_exact_substring_excise",
    oracle=f"""
    WITH {_XS_GRAM_CTES},
    elig AS (SELECT h FROM xs_g GROUP BY h HAVING COUNT(*) BETWEEN 2 AND 8),
    ge AS (SELECT xs_g.* FROM xs_g JOIN elig USING (h)),
    p AS (
        SELECT a.id AS id_a, b.id AS id_b, a.pos AS pa,
               a.pos - b.pos AS diag
        FROM ge a JOIN ge b ON a.h = b.h
         AND (a.id < b.id OR (a.id = b.id AND a.pos < b.pos))
    ),
    flg AS (
        SELECT id_a, id_b, diag, pa,
               CASE WHEN pa - LAG(pa) OVER (
                        PARTITION BY id_a, id_b, diag ORDER BY pa) > 25
                    THEN 1 ELSE 0 END AS ns
        FROM p
    ),
    isl AS (
        SELECT id_a, id_b, diag, pa,
               SUM(ns) OVER (PARTITION BY id_a, id_b, diag ORDER BY pa
                             ROWS UNBOUNDED PRECEDING) AS grp
        FROM flg
    ),
    ex AS (
        SELECT id_b AS id, MIN(pa) - diag AS s, MAX(pa) - diag + 24 AS e
        FROM isl GROUP BY id_a, id_b, diag, grp
        HAVING MAX(pa) - MIN(pa) + 25 >= 50
    ),
    mflg AS (
        SELECT id, s, e,
               CASE WHEN s > COALESCE(MAX(e) OVER (
                        PARTITION BY id ORDER BY s, e
                        ROWS BETWEEN UNBOUNDED PRECEDING
                             AND 1 PRECEDING), -2) + 1
                    THEN 1 ELSE 0 END AS ns
        FROM ex
    ),
    misl AS (
        SELECT id, s, e,
               SUM(ns) OVER (PARTITION BY id ORDER BY s, e
                             ROWS UNBOUNDED PRECEDING) AS grp
        FROM mflg
    ),
    cov AS (SELECT id, grp, MIN(s) AS cs, MAX(e) AS ce
            FROM misl GROUP BY id, grp),
    xs_tokpos AS (
        SELECT id, CAST(r.i AS INTEGER) AS pos,
               t[CAST(r.i + 1 AS INTEGER)] AS tok
        FROM xs_toks, UNNEST(range(len(t))) AS r(i)
    ),
    kept AS (
        SELECT tp.id, tp.pos, tp.tok FROM xs_tokpos tp
        WHERE NOT EXISTS (SELECT 1 FROM cov c
                          WHERE c.id = tp.id
                            AND tp.pos BETWEEN c.cs AND c.ce)
    ),
    pk AS (
        SELECT id, CAST(COUNT(*) AS BIGINT) AS kept_tokens,
               md5(string_agg(tok, ' ' ORDER BY pos)) AS kept_digest
        FROM kept GROUP BY id
    ),
    nsp AS (SELECT id, CAST(COUNT(*) AS BIGINT) AS n_excised_spans
            FROM cov GROUP BY id),
    bs AS (SELECT id, CAST(COUNT(*) AS BIGINT) AS n_tokens
           FROM xs_tokpos GROUP BY id)
    SELECT bs.id, bs.n_tokens,
           CAST(COALESCE(pk.kept_tokens, 0) AS BIGINT) AS kept_tokens,
           CAST(bs.n_tokens - COALESCE(pk.kept_tokens, 0) AS BIGINT)
               AS excised_tokens,
           CAST(COALESCE(nsp.n_excised_spans, 0) AS BIGINT)
               AS n_excised_spans,
           COALESCE(pk.kept_digest, md5('')) AS kept_digest
    FROM bs
    LEFT JOIN pk ON pk.id = bs.id
    LEFT JOIN nsp ON nsp.id = bs.id
    ORDER BY bs.id
    """,
)
def dedup_exact_substring_excise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ExactSubstr dedup APPLIED (Lee et al. 2022 remove duplicated
    spans, they don't just count them): every exact repeated substring
    ≥50 tokens loses its LATER occurrence (higher doc id, or higher
    position within one document), and each document reports original/
    kept/excised token counts, the merged excision-interval count, and
    the md5 DIGEST of its surviving token stream — so the driver
    cross-checks the excised TEXT itself against DuckDB, not just its
    size. Single-pass against the original corpus (the standard
    approximation of cluster-wise all-but-one removal). On the planted
    fixture P2 loses its 60-token span to P1 and P5 its 50-token
    overlap to P3, while P3/P4's 30-token share — below threshold —
    survives untouched (``operators.dedup.exact_substring_excise``).
    Scale: the span machinery of ``dedup_exact_substring`` + one
    per-document interval merge window + one per-document range join
    for kept positions + one ordered digest aggregation per document."""
    return D.exact_substring_excise(
        _xs_corpus(spark, sf_dir), "id", "text",
        k=25, min_len=50, max_occ=8,
    )


# ---------------------------------------------------------------------------
# leakage-safe splitting: near-dup clusters never straddle train/eval
# ---------------------------------------------------------------------------

#: Shared oracle tail: recursive-CTE connected components over the
#: SimHash near-dup pairs (same chain as dedup_dup_groups) + the
#: group-representative split key for every corpus document.
_LSPLIT_CTES = """
    edges AS (
        SELECT id_a AS src, id_b AS dst FROM pairs
        UNION
        SELECT id_b AS src, id_a AS dst FROM pairs
    ),
    reach(src, dst) AS (
        SELECT src, src AS dst FROM (SELECT DISTINCT src FROM edges)
        UNION
        SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src
    ),
    comp AS MATERIALIZED (
        SELECT src AS id, min(dst) AS component FROM reach GROUP BY src
    ),
    rep AS MATERIALIZED (
        SELECT c.id, COALESCE(cm.component, c.id) AS rep
        FROM corpus c LEFT JOIN comp cm ON cm.id = c.id
    )
"""


@query(
    "split_leakage_safe",
    oracle=f"""
    WITH RECURSIVE {_simhash_pairs_ctes()},
    {_LSPLIT_CTES},
    spl AS (
        SELECT id, rep,
               CAST(('0x' || substr(md5(CAST(rep AS VARCHAR) || 'lsplit'),
                                    1, 8)) AS BIGINT) % 1000000 AS b
        FROM rep
    )
    SELECT CASE WHEN b < 10000 THEN 'eval'
                WHEN b < 20000 THEN 'test'
                ELSE 'train' END AS split,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(COUNT(DISTINCT rep) AS BIGINT) AS n_split_keys
    FROM spl GROUP BY 1 ORDER BY split
    """,
)
def split_leakage_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEAKAGE-SAFE train/eval/test split: the split key is the
    near-dup GROUP representative (SimHash pairs → min-label connected
    components), not the document id — so a mutated recrawl of a
    training document can never land in eval. This is the split the
    contamination literature actually calls for: hash-keyed
    determinism (``split_train_eval``) prevents re-run migration, but
    keying on the raw id still leaks every near-duplicate pair across
    the boundary; keying on the component representative makes the
    boundary respect the duplicate graph by construction. Runs over
    corpus ∪ mutations so the guarantee is exercised, not vacuous.
    Scale: pair generation is the blocked SimHash join, components are
    the per-round localCheckpointed min-label propagation, and the
    split itself is a pure projection — one broadcast-sized (id → rep)
    join above the corpus scan."""
    corpus = _mutated_corpus(spark, sf_dir)
    fps = D.simhash(corpus, "id", "text", bits=32)
    pairs = D.simhash_hamming_pairs(fps, "id", max_distance=3).select(
        "id_a", "id_b"
    )
    comp = D.connected_components(pairs)
    rep = corpus.join(comp, "id", "left").select(
        "id", F.coalesce("component", F.col("id")).alias("rep")
    )
    return (
        SA.assign_split(rep, "rep", eval_ppm=10_000, test_ppm=10_000,
                        salt="lsplit")
        .groupBy("split")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.countDistinct("rep").cast("long").alias("n_split_keys"),
        )
        .orderBy("split")
    )


@query(
    "split_leakage_probe",
    oracle=f"""
    WITH RECURSIVE {_simhash_pairs_ctes()},
    {_LSPLIT_CTES},
    spl AS (
        SELECT id,
               CASE WHEN CAST(('0x' || substr(md5(CAST(id AS VARCHAR)
                        || 'lsplit'), 1, 8)) AS BIGINT) % 1000000 < 100000
                    THEN 'eval'
                    WHEN CAST(('0x' || substr(md5(CAST(id AS VARCHAR)
                        || 'lsplit'), 1, 8)) AS BIGINT) % 1000000 < 200000
                    THEN 'test' ELSE 'train' END AS s_naive,
               CASE WHEN CAST(('0x' || substr(md5(CAST(rep AS VARCHAR)
                        || 'lsplit'), 1, 8)) AS BIGINT) % 1000000 < 100000
                    THEN 'eval'
                    WHEN CAST(('0x' || substr(md5(CAST(rep AS VARCHAR)
                        || 'lsplit'), 1, 8)) AS BIGINT) % 1000000 < 200000
                    THEN 'test' ELSE 'train' END AS s_grouped
        FROM rep
    )
    SELECT CAST(SUM(CASE WHEN a.s_naive <> b.s_naive THEN 1 ELSE 0 END)
               AS BIGINT) AS leak_pairs_naive,
           CAST(SUM(CASE WHEN a.s_grouped <> b.s_grouped THEN 1 ELSE 0 END)
               AS BIGINT) AS leak_pairs_grouped,
           CAST(COUNT(*) AS BIGINT) AS n_pairs,
           CAST((SELECT COUNT(DISTINCT component) FROM comp) AS BIGINT)
               AS n_dup_groups
    FROM pairs p
    JOIN spl a ON a.id = p.id_a
    JOIN spl b ON b.id = p.id_b
    """,
)
def split_leakage_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The leakage AUDIT that justifies ``split_leakage_safe``: count
    near-dup pairs straddling a split boundary under (a) the naive
    id-keyed split and (b) the group-representative split, at 10%/10%
    eval/test so the naive leak is visible at every fixture SF. The
    grouped count is 0 BY CONSTRUCTION (both members share their
    component's representative, hence its split) — but the query
    computes it, it doesn't assert it: this is the number a data-QA
    gate would alarm on, next to the naive baseline it retired."""
    corpus = _mutated_corpus(spark, sf_dir)
    fps = D.simhash(corpus, "id", "text", bits=32)
    pairs = D.simhash_hamming_pairs(fps, "id", max_distance=3).select(
        "id_a", "id_b"
    )
    pairs = managed_persist(pairs)
    comp = D.connected_components(pairs)
    rep = corpus.join(comp, "id", "left").select(
        "id", F.coalesce("component", F.col("id")).alias("rep")
    )

    def label(col: str) -> F.Column:
        b = SA.hash_bucket(F.col(col), SA.HASH_MOD, "lsplit")
        return (
            F.when(b < 100_000, F.lit("eval"))
            .when(b < 200_000, F.lit("test"))
            .otherwise(F.lit("train"))
        )

    spl = rep.select(
        "id",
        label("id").alias("s_naive"),
        label("rep").alias("s_grouped"),
    )
    a = spl.select(
        F.col("id").alias("id_a"),
        F.col("s_naive").alias("na"), F.col("s_grouped").alias("ga"),
    )
    b = spl.select(
        F.col("id").alias("id_b"),
        F.col("s_naive").alias("nb"), F.col("s_grouped").alias("gb"),
    )
    joined = pairs.join(a, "id_a").join(b, "id_b")
    groups = F.broadcast(
        comp.agg(
            F.countDistinct("component").cast("long").alias("n_dup_groups")
        )
    )
    return joined.join(groups).agg(
        F.sum((F.col("na") != F.col("nb")).cast("long"))
        .cast("long")
        .alias("leak_pairs_naive"),
        F.sum((F.col("ga") != F.col("gb")).cast("long"))
        .cast("long")
        .alias("leak_pairs_grouped"),
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
        F.max("n_dup_groups").cast("long").alias("n_dup_groups"),
    )


# ---------------------------------------------------------------------------
# containment dedup: the asymmetric near-dup Jaccard-keyed dedup misses
# ---------------------------------------------------------------------------

#: Planted containment pair (ids above 4e12): Q's 20 tokens are a
#: verbatim slice of P's 60, so overlap(Q,P) = 1.0 while
#: Jaccard ≈ 18/58 — far below every Jaccard screen's threshold and
#: invisible to MinHash-LSH banding (which keys on Jaccard).
_CT_P = " ".join(f"zc{i}" for i in range(60))
_CT_Q = " ".join(f"zc{i}" for i in range(20, 40))
_CT_VALUES = (
    f"(4000000000001, '{_CT_P}'), (4000000000002, '{_CT_Q}')"
)


@query(
    "dedup_containment",
    oracle=f"""
    WITH corpus AS (
        ({_MUTATED_CORPUS})
        UNION ALL
        SELECT CAST(v.id AS BIGINT) AS id, v.text
        FROM (VALUES {_CT_VALUES}) AS v(id, text)
    ),
    sh AS (
        SELECT DISTINCT id, unnest({_SHINGLE_SQL}) AS shingle FROM corpus
    ),
    rare AS (
        SELECT shingle FROM sh GROUP BY shingle
        HAVING COUNT(*) BETWEEN 2 AND 8
    ),
    shr AS (SELECT sh.* FROM sh JOIN rare USING (shingle)),
    cand AS (
        SELECT DISTINCT a.id AS id_a, b.id AS id_b
        FROM shr a JOIN shr b
          ON a.shingle = b.shingle AND a.id < b.id
    ),
    sizes AS (SELECT id, COUNT(*) AS set_size FROM sh GROUP BY id),
    inter AS (
        SELECT c.id_a, c.id_b, COUNT(*) AS n_inter
        FROM cand c
        JOIN sh a ON a.id = c.id_a
        JOIN sh b ON b.id = c.id_b AND b.shingle = a.shingle
        GROUP BY c.id_a, c.id_b
    )
    SELECT i.id_a, i.id_b,
           CAST(i.n_inter AS BIGINT) AS n_inter,
           CAST(sa.set_size AS BIGINT) AS size_a,
           CAST(sb.set_size AS BIGINT) AS size_b,
           CAST((i.n_inter * 1000000)
                // LEAST(sa.set_size, sb.set_size) AS BIGINT) AS overlap_c6,
           CAST((i.n_inter * 1000000)
                // (sa.set_size + sb.set_size - i.n_inter) AS BIGINT)
               AS jaccard_c6
    FROM inter i
    JOIN sizes sa ON sa.id = i.id_a
    JOIN sizes sb ON sb.id = i.id_b
    WHERE i.n_inter * 100 >= LEAST(sa.set_size, sb.set_size) * 80
    ORDER BY id_a, id_b
    """,
)
def dedup_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Containment dedup by the OVERLAP COEFFICIENT
    (|A∩B| / min(|A|,|B|) ≥ 0.8 over 3-gram shingle sets) — the
    asymmetric near-dup every Jaccard-keyed screen misses: the planted
    wrapper pair (a 20-token verbatim slice of a 60-token document)
    reports overlap 1.0 at Jaccard ≈ 0.31, invisible to MinHash-LSH
    banding because bands key on Jaccard. Candidates come from shared
    RARE shingles (2 ≤ df ≤ 8 — pair fan-out bounded C(8,2) per
    shingle, the ExactSubstr guardrail shape), verified by the exact
    candidate-proportional intersection; both reported ratios are
    floored scaled-BIGINT divisions and the 0.8 threshold is an
    integer cross-multiplication (``operators.dedup.containment_pairs``).
    The df cap's coverage loss is reported by the mandatory companion
    probe ``containment_hot_shingles`` — no silent caps."""
    from pg2any_spark.functions.localtable import literal_table

    corpus = _mutated_corpus(spark, sf_dir).unionByName(
        literal_table(
            spark,
            [(4_000_000_000_001, _CT_P), (4_000_000_000_002, _CT_Q)],
            "id long, text string",
        )
    )
    return D.containment_pairs(
        corpus, "id", "text", n=3, max_df=8, min_overlap_pct=80
    )


@query(
    "containment_hot_shingles",
    oracle=f"""
    WITH corpus AS (
        ({_MUTATED_CORPUS})
        UNION ALL
        SELECT CAST(v.id AS BIGINT) AS id, v.text
        FROM (VALUES {_CT_VALUES}) AS v(id, text)
    ),
    sh AS (
        SELECT DISTINCT id, unnest({_SHINGLE_SQL}) AS shingle FROM corpus
    ),
    c AS (SELECT shingle, COUNT(*) AS c FROM sh GROUP BY shingle)
    SELECT CAST(SUM(CASE WHEN c > 8 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_hot_shingles,
           CAST(SUM(CASE WHEN c > 8 THEN c ELSE 0 END) AS BIGINT)
               AS hot_occurrences,
           CAST(SUM(CASE WHEN c BETWEEN 2 AND 8 THEN 1 ELSE 0 END)
               AS BIGINT) AS n_eligible_shingles
    FROM c
    """,
)
def containment_hot_shingles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mandatory cap report for ``dedup_containment``: distinct 3-gram
    shingles the document-frequency cap (df > 8) excluded from
    candidate generation, the occurrence mass they carried, and the
    eligible-shingle count — the query that keeps the cap honest
    (``hot_band_keys`` / ``xs_probe_hot_grams`` convention: a bounded
    operator must report what it bounded; a boilerplate-wrapped
    containment pair whose every shared shingle is hot never surfaces
    in ``dedup_containment``, and this row quantifies exactly that
    blind spot). Same corpus as ``dedup_containment``
    (``operators.dedup.containment_hot_shingles``)."""
    from pg2any_spark.functions.localtable import literal_table

    corpus = _mutated_corpus(spark, sf_dir).unionByName(
        literal_table(
            spark,
            [(4_000_000_000_001, _CT_P), (4_000_000_000_002, _CT_Q)],
            "id long, text string",
        )
    )
    return D.containment_hot_shingles(corpus, "id", "text", n=3, max_df=8)
