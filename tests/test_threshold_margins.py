"""Threshold- and output-cell flip gate for rounded float metrics.

Round 4's only red driver row (`corpus_filter_funnel`) was an LM cut
(avg_nll > 3.42) sitting 2e-4 — two rounding quanta — from two
documents' scores.  Round 5's `perplexity_bucket_sampling` red showed
the same hazard class can hide in rounded float OUTPUT columns, not
just thresholded literals.  This gate covers both:

1. **Thresholded literals** (`test_threshold_flip_margin`): for
   flag = ROUND(raw, d) OP t, with quantum q = 10^-d and t a multiple
   of q, the flag flips between engines/runs ONLY when `raw` lies
   within cross-engine float jitter of one of the two half-quantum
   rounding boundaries t - q/2 or t + q/2.  The gate scans every
   metric's UNROUNDED distribution on DuckDB (reusing the same SQL
   fragments the oracles are built from) and asserts
   min |raw - b| >= 1e-9 for both boundaries.

2. **Rounded float output columns** (`test_output_columns_classified`
   + `test_output_cell_flip_margin`): every DOUBLE output column of
   every oracle-able registry query whose values carry more than 2
   decimals must be CLASSIFIED — either `DETERMINISTIC_EXACT` (the
   cell value is bit-identical across engines by construction:
   integer-ratio division, DECIMAL-path accumulation, per-row
   fixed-order expressions, text→double passthrough) or `RAW_MARGIN`
   (an order-dependent float aggregate: its unrounded distribution
   must clear every half-quantum rounding boundary by >= 1e-9, so
   engine-order summation jitter cannot flip the rounded cell).  An
   unclassified column fails the gate — a new query cannot ship a
   hazardous float cell unnoticed.

Margins run at sf0.001, sf0.01 (the correctness-gate SF), and sf0.1;
the enumeration runs at sf0.01.
"""

from __future__ import annotations

import math

import duckdb
import pytest

from pg2any_spark.plans import queries_ml as QM

SF_DIRS = [
    "/root/testdata/sf0.001",
    "/root/testdata/sf0.01",
    "/root/testdata/sf0.1",
]

FIXTURE_TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings".split()
)


def _connect(sf_dir):
    con = duckdb.connect()
    for tbl in FIXTURE_TABLES:
        con.execute(
            f"CREATE VIEW {tbl} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{tbl}.parquet')"
        )
    return con


# --- unrounded metric distributions ---------------------------------------

#: Per-doc LM mean nll, UNROUNDED — same CTE chain the oracles use
#: (queries_ml._lm_ctes(rounded=False)), so the gate cannot drift.
_LM_RAW_SQL = f"WITH {QM._LM_RAW_CTES} SELECT avg_nll AS m FROM lm"

_DUP_FRAC_RAW_SQL = f"""
WITH g AS (
    SELECT doc_id,
           t[CAST(r.i + 1 AS INTEGER)] || ' ' ||
           t[CAST(r.i + 2 AS INTEGER)] AS gram
    FROM (SELECT doc_id, {QM._TOKS} AS t
          FROM documents WHERE trim(text) <> '') toks,
         UNNEST(range(len(t) - 1)) AS r(i)
    WHERE len(t) >= 2
),
per AS (SELECT doc_id, gram, COUNT(*) AS c FROM g GROUP BY doc_id, gram)
SELECT (SUM(c) - COUNT(*)) / CAST(SUM(c) AS DOUBLE) AS m
FROM per GROUP BY doc_id
"""

_QUALITY_RAW_SQL = f"SELECT {QM._QUALITY_RAW} AS m FROM documents"

# All-pairs cosine over the raw embedding directions.  The
# embedding_near_dup corpus unions 0.5-scaled copies, but cosine is
# scale-invariant, so original-pair cosines plus the exact-1.0 copy
# pairs cover every candidate the query can ever threshold.
_PAIR_COS_RAW_SQL = """
WITH base AS (
    SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
)
SELECT list_cosine_similarity(a.v, b.v) AS m
FROM base a JOIN base b ON a.vec_id < b.vec_id
"""

# embedding_outliers: cosine of each vector to its own label centroid
# (same DECIMAL(28,12) centroid path as the oracle), ROUND and WHERE
# removed so the full raw distribution is scanned.
_CENTROID_COS_RAW_SQL = """
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
SELECT dot / (nv * nc) AS m FROM s
"""

# dedup_lexical_semantic_agreement: cosine between each planted
# variant and its original (the only pairs the 0.95 cut ever sees).
_PLANTED_COS_RAW_SQL = f"""
WITH corpus AS ({QM._PAIRED_CORPUS})
SELECT list_cosine_similarity(o.embedding, p.embedding) AS m
FROM corpus p
JOIN corpus o ON o.orig_id = p.orig_id AND o.variant = 'orig'
WHERE p.variant <> 'orig'
"""

# nb_lang_confusion's hazard is not a rounding boundary but an ARGMAX
# tie: the confusion counts flip between engines only if some
# document's top-2 class scores sit within summation-order jitter of
# each other. Gate: the winning margin must clear 1e-9 (~10^4 x the
# jitter ceiling of the <=4096-term log-sum) for every document.
_NB_GAP_RAW_SQL = f"""
WITH {{nb_ctes}},
nb_rk AS (
    SELECT doc_id, score,
           ROW_NUMBER() OVER (PARTITION BY doc_id
                              ORDER BY score DESC, clabel) AS rk
    FROM nb_scores
)
SELECT a.score - b.score AS m
FROM nb_rk a JOIN nb_rk b ON b.doc_id = a.doc_id AND a.rk = 1 AND b.rk = 2
"""

# (round 7: the dsir_* queries moved to scale-1e6 floored-integer
# scores — sampling.dsir_log_ratio_scaled — so no rounded float cell
# or rank key remains to guard; the old _DSIR_RAW_SQL gate retired.)

# int8 quantization (ann_int8_recall + the pq_* family): the one float
# step in those pipelines is code = ROUND((x-mn)/(mx-mn)*255) — a code
# flips between engines only if the scaled value sits within jitter of
# a k+0.5 boundary (quantum 1). Everything downstream of the code is
# integer-exact, so this single metric guards the whole family.
_INT8_SCALE_RAW_SQL = """
WITH base AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
dims AS (SELECT UNNEST(range(64)) AS d),
longf AS (SELECT b.vec_id, dims.d, b.v[dims.d + 1] AS x FROM base b, dims),
stats AS (SELECT d, MIN(x) AS mn, MAX(x) AS mx FROM longf GROUP BY d)
SELECT (l.x - s.mn) / (s.mx - s.mn) * 255 AS m
FROM longf l JOIN stats s ON s.d = l.d
WHERE s.mx > s.mn
"""

_Q1_AVG_RAW_SQL = """
SELECT AVG(l_quantity) AS m FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
UNION ALL
SELECT AVG(l_extendedprice) FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
UNION ALL
SELECT AVG(l_discount) FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""

_Q8_SHARE_RAW_SQL = """
SELECT SUM(CASE WHEN supp_grp THEN volume ELSE 0 END) / SUM(volume) AS m
FROM (
    SELECT CAST(EXTRACT(YEAR FROM o_orderdate) AS INTEGER) AS o_year,
           l_extendedprice * (1 - l_discount) AS volume,
           n2.n_nationkey % 3 = 0 AS supp_grp
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN part     ON l_partkey = p_partkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation n1 ON c_nationkey = n1.n_nationkey
    JOIN region   ON n1.n_regionkey = r_regionkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation n2 ON s_nationkey = n2.n_nationkey
    WHERE r_name = 'AMERICA' AND p_type = 'ECONOMY'
      AND o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate < TIMESTAMP '2001-01-01'
) t
GROUP BY o_year
"""

_Q14_SHARE_RAW_SQL = """
SELECT 100.0 * SUM(CASE WHEN p_type = 'PROMO'
                        THEN l_extendedprice * (1 - l_discount)
                        ELSE 0 END)
       / SUM(l_extendedprice * (1 - l_discount)) AS m
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1997-02-01 00:00:00'
"""

_STATS_RAW_SQL = """
SELECT corr(l_quantity, l_extendedprice) AS m
FROM lineitem GROUP BY l_returnflag
UNION ALL
SELECT var_samp(l_quantity) FROM lineitem GROUP BY l_returnflag
"""

_ENTROPY_RAW_SQL = """
WITH per AS (
    SELECT source, lang, COUNT(*) AS n FROM documents GROUP BY source, lang
),
tot AS (SELECT source, SUM(n) AS n_docs FROM per GROUP BY source)
SELECT -SUM((p.n / CAST(t.n_docs AS DOUBLE))
            * ln(p.n / CAST(t.n_docs AS DOUBLE))) AS m
FROM per p JOIN tot t ON p.source = t.source
GROUP BY t.source
"""

_PCTL_RAW_SQL = """
SELECT quantile_cont(o_totalprice, 0.5) AS m
FROM orders JOIN customer ON o_custkey = c_custkey GROUP BY c_mktsegment
UNION ALL
SELECT quantile_cont(o_totalprice, 0.9)
FROM orders JOIN customer ON o_custkey = c_custkey GROUP BY c_mktsegment
UNION ALL
SELECT quantile_cont(o_totalprice, 0.99)
FROM orders JOIN customer ON o_custkey = c_custkey GROUP BY c_mktsegment
"""

# --- thresholded-literal gate (metric id, raw SQL, cuts, quantum, guards) --

THRESHOLDED_METRICS = [
    ("lm_avg_nll", _LM_RAW_SQL, [3.595], 1e-4, ["corpus_filter_funnel"]),
    (
        "quality_score",
        _QUALITY_RAW_SQL,
        [0.25, 0.4, 0.7],
        1e-6,
        ["corpus_filter_funnel", "doc_quality_bands", "training_pipeline_docs",
         "dedup_keep_best"],
    ),
    ("dup_ngram_frac", _DUP_FRAC_RAW_SQL, [0.2], 1e-6, ["corpus_filter_funnel"]),
    ("pair_cosine", _PAIR_COS_RAW_SQL, [0.95], 1e-6,
     # decontaminate_semantic's pair population is a subset of
     # embedding_near_dup's (train × scaled-%20-eval ⊂ base ∪ scaled
     # pairs, cosine is scale-invariant), so this raw scan covers it
     ["embedding_near_dup", "semdedup_cells", "decontaminate_semantic"]),
    ("centroid_cosine", _CENTROID_COS_RAW_SQL, [0.0], 1e-6, ["embedding_outliers"]),
    (
        "planted_pair_cosine",
        _PLANTED_COS_RAW_SQL,
        [0.95],
        1e-6,
        ["dedup_lexical_semantic_agreement"],
    ),
]

#: Minimum raw distance to a flip boundary: ~10^6 x the measured
#: cross-engine disagreement (3e-15 on the LM metric, round 5).
MIN_BOUNDARY_DIST = 1e-9


@pytest.mark.parametrize(
    "metric_id,sql,cuts,quantum,queries",
    THRESHOLDED_METRICS,
    ids=[m[0] for m in THRESHOLDED_METRICS],
)
@pytest.mark.parametrize("sf_dir", SF_DIRS, ids=[d.rsplit("/", 1)[1] for d in SF_DIRS])
def test_threshold_flip_margin(sf_dir, metric_id, sql, cuts, quantum, queries):
    con = _connect(sf_dir)
    vals = [r[0] for r in con.execute(sql).fetchall() if r[0] is not None]
    assert vals, f"{metric_id}: metric scan returned no values at {sf_dir}"
    for t in cuts:
        for b in (t - quantum / 2, t + quantum / 2):
            dist = min(abs(v - b) for v in vals)
            assert dist >= MIN_BOUNDARY_DIST, (
                f"{metric_id}: an achievable raw score sits {dist:.2e} from "
                f"the rounding-flip boundary {b!r} of cut {t} at {sf_dir} — "
                f"the flag can tip between engines; re-site the threshold. "
                f"Guards {queries}"
            )


# --- rounded-output-cell gate ---------------------------------------------

#: (query, column) pairs whose >2dp float cells are bit-identical
#: across engines BY CONSTRUCTION — the reason is the classification.
DETERMINISTIC_EXACT = {
    # unrounded text→double passthrough: both engines parse the same
    # rendered literal to the same IEEE double
    ("cdc_apply_customer", "c_acctbal"),
    ("cdc_apply_pgoutput", "c_acctbal"),
    ("cdc_apply_schema_evolution", "c_acctbal"),
    ("cdc_apply_quarantined_feed", "c_acctbal"),
    ("cdc_apply_pgoutput_streamed", "c_acctbal"),
    ("cdc_apply_streaming_tx", "c_acctbal"),
    ("cdc_apply_toast", "c_acctbal"),
    ("cdc_apply_two_phase", "c_acctbal"),
    ("cdc_apply_orders_full_identity", "o_totalprice"),
    ("cdc_debezium_envelope", "after_acctbal"),
    ("cdc_envelope_roundtrip", "c_acctbal"),
    ("scd2_customer_history", "c_acctbal"),
    ("scd2_snapshot_time_travel", "c_acctbal"),
    # DECIMAL-path accumulation before the final (exact) division
    ("embedding_centroids_by_label", "coord"),
    ("ivf_kmeans_refined_centroids", "coord"),
    ("doc_quality_bands", "avg_quality"),
    ("training_pipeline_docs", "avg_quality"),
    # integer-ratio division: same two integers divided on both sides
    ("line_dedup_c4", "kept_frac"),
    ("dedup_ngram_jaccard", "jaccard"),
    ("dedup_repeated_spans", "dup_token_frac"),
    ("doc_repetition_stats", "dup_ngram_frac"),
    ("doc_repetition_stats", "top_ngram_share"),
    ("text_stats_documents", "stopword_ratio_en"),
    ("dedup_lsh_recall_report", "candidate_precision"),
    ("dedup_lsh_recall_report", "lsh_recall"),
    ("dedup_lexical_semantic_agreement", "pair_jaccard"),
    ("pack_sequences_budget", "fill_ratio"),
    ("bpe_tokenize_docs", "compression"),
    ("media_image_features", "brightness"),
    ("window_value_distribution", "pct_rank"),
    ("window_value_distribution", "cume"),
    # same integer-ratio divisions, computed from the scalable
    # global-rank closed forms: (r−1)/(n−1) and r/n of exact BIGINTs —
    # bit-identical to the window functions' internal arithmetic
    ("value_distribution_scalable", "pct_rank"),
    ("value_distribution_scalable", "cume"),
    # reciprocal rank fusion: two single divisions of exact integers
    # (1/(60+rank)) added in fixed textual order — never a parallel
    # float aggregate
    ("retrieval_hybrid_rrf", "rrf"),
    # per-row FIXED-ORDER expression over identically-derived values
    # (array fold / scalar arithmetic — never a parallel aggregate)
    ("ann_cosine_topk_bruteforce", "cos_sim"),
    ("ann_ivf_topk", "cos_sim"),
    ("ann_lsh_topk", "cos_sim"),
    ("tfidf_top_terms_per_doc", "tfidf"),
    # every score input is an exact integer statistic (tf, dl, df, N,
    # sum_dl) and the per-term scores combine via a pivot into one
    # fixed textual-order scalar sum — never a parallel float SUM()
    ("retrieval_bm25_topk", "bm25"),
    ("dedup_keep_best", "quality"),
    # int64-exact accumulation then one correctly-rounded IEEE op
    ("media_audio_features", "rms"),
    # every input is an exact integer count (bin n, cumulative, total)
    # or a literal (q, lo, hi, width); the interpolation is one
    # fixed-order scalar expression per output row
    ("hist_quantile_order_value", "est"),
    # round-7 engine-fingerprint canaries: single fixed scalars whose
    # whole PURPOSE is to surface a driver-engine divergence — locally
    # deterministic by construction, intentionally unguarded
    ("canary_engine_agree", "t1"),
    ("canary_engine_agree", "t2"),
    ("canary_engine_agree", "t6"),
    ("canary_engine_agree", "t9"),
    ("canary_duck_pin", "t7d"),
    ("canary_duck_pin", "t8d"),
    ("canary_spark_pin", "t7s"),
    ("canary_spark_pin", "t8s"),
    # late round-8: single divisions of exact integers — auc is
    # auc_num/auc_den (both BIGINT), mean_q is BIGINT sum / count,
    # margin is 2k·c6 / (ax_sum + ay_sum) with every term an exact
    # 1e6-quantized BIGINT sum; cos_sim is the same per-row fixed-order
    # array fold already classified for the ann_* family
    ("classifier_auc_exact", "auc"),
    ("embedding_dim_stats", "mean_q"),
    ("bitext_margin_mining", "cos_sim"),
    ("bitext_margin_mining", "margin"),
    # lift = support·N/(supp_a·supp_b), clustering_coeff =
    # 3·triangles/wedges — single fixed-order double chains over
    # exact BIGINT inputs, rounded once
    ("basket_frequent_pairs", "lift"),
    ("graph_triangle_census", "clustering_coeff"),
}

#: (query, column) → (raw-metric id) for order-dependent float
#: aggregates; the metric's unrounded distribution must clear every
#: half-quantum rounding boundary (RAW_MARGIN_METRICS below).
RAW_MARGIN = {
    ("lm_bigram_perplexity", "avg_nll"): "lm_avg_nll_out",
    ("perplexity_probe_nll", "min_nll"): "lm_avg_nll_out",
    ("perplexity_probe_nll", "max_nll"): "lm_avg_nll_out",
    ("q1_pricing_summary", "avg_qty"): "q1_avgs",
    ("q1_pricing_summary", "avg_price"): "q1_avgs",
    ("q1_pricing_summary", "avg_disc"): "q1_avgs",
    ("q8_market_share", "mkt_share"): "q8_share",
    ("q14_promo_revenue_share", "promo_share"): "q14_share",
    ("stats_lineitem_price_qty", "qty_price_corr"): "stats_corr_var",
    ("stats_lineitem_price_qty", "qty_var"): "stats_corr_var",
    ("source_lang_profile", "lang_entropy"): "lang_entropy",
    ("embedding_outliers", "cos_centroid"): "centroid_cos_out",
    ("percentile_order_value_by_segment", "p50"): "pctl_order_value",
    ("percentile_order_value_by_segment", "p90"): "pctl_order_value",
    ("percentile_order_value_by_segment", "p99"): "pctl_order_value",
}

#: raw-metric id → (raw SQL yielding column m, rounding quantum,
#: min boundary distance). The default bound (1e-9) is ~10^6 x the
#: measured cross-engine disagreement; metrics with MANY raw values at
#: a fine quantum (e.g. one cosine per vector at 6dp) will
#: statistically always have SOME value ~1e-10 from a boundary, so
#: their bound is instead set ~10^3 x the metric's actual jitter
#: ceiling (a 64-term unit-scale sum reorders within ~1e-14) —
#: still catching any value a real engine difference could flip.
RAW_MARGIN_METRICS = {
    "lm_avg_nll_out": (_LM_RAW_SQL, 1e-4, 1e-9),
    # min/max endpoints hit k+0.0 exactly (distance 0.5 from the
    # boundary); interior values are data. ~32k scaled values at
    # sf0.1 against quantum 1 → expected min distance ~1.5e-5;
    # min_dist 1e-9 still ~10^4 x the one-division jitter ceiling.
    "int8_quant_scale": (_INT8_SCALE_RAW_SQL, 1.0, 1e-9),
    "q1_avgs": (_Q1_AVG_RAW_SQL, 1e-4, 1e-9),
    "q8_share": (_Q8_SHARE_RAW_SQL, 1e-4, 1e-9),
    "q14_share": (_Q14_SHARE_RAW_SQL, 1e-4, 1e-9),
    "stats_corr_var": (_STATS_RAW_SQL, 1e-4, 1e-9),
    "lang_entropy": (_ENTROPY_RAW_SQL, 1e-6, 1e-9),
    "centroid_cos_out": (_CENTROID_COS_RAW_SQL, 1e-6, 1e-11),
    "pctl_order_value": (_PCTL_RAW_SQL, 1e-4, 1e-9),
}


def _max_decimals(values) -> int:
    d = 0
    for v in values:
        s = repr(float(v))
        if "e" in s or "E" in s:
            return 13  # scientific notation: treat as unrounded
        if "." in s:
            d = max(d, len(s.split(".")[1].rstrip("0")))
    return d


def test_output_columns_classified():
    """Every >2dp DOUBLE output column of every oracle must be
    classified (DETERMINISTIC_EXACT or RAW_MARGIN). Forces every new
    query to declare its float-cell determinism story."""
    import __spark_entry__ as entry_mod

    con = _connect(SF_DIRS[1])  # sf0.01, the driver-gate SF
    unclassified = []
    for name, sql in entry_mod.oracle_sql().items():
        res = con.execute(sql)
        cols = [d[0] for d in res.description]
        rows = res.fetchall()
        for i, c in enumerate(cols):
            vals = [r[i] for r in rows if r[i] is not None]
            if not vals or not any(isinstance(v, float) for v in vals):
                continue
            if _max_decimals(vals) <= 2:
                continue
            if (name, c) in DETERMINISTIC_EXACT or (name, c) in RAW_MARGIN:
                continue
            unclassified.append((name, c))
    assert not unclassified, (
        "rounded float output columns with >2 decimals and no "
        f"determinism classification: {unclassified} — add each to "
        "DETERMINISTIC_EXACT (with a construction argument) or "
        "RAW_MARGIN (with a raw-distribution SQL) in "
        "tests/test_threshold_margins.py"
    )


@pytest.mark.parametrize(
    "metric_id", sorted(RAW_MARGIN_METRICS), ids=sorted(RAW_MARGIN_METRICS)
)
@pytest.mark.parametrize("sf_dir", SF_DIRS, ids=[d.rsplit("/", 1)[1] for d in SF_DIRS])
def test_output_cell_flip_margin(sf_dir, metric_id):
    """Order-dependent float aggregates that surface as rounded output
    cells: every achievable raw value must sit >= 1e-9 away from its
    NEAREST half-quantum rounding boundary (k + 0.5)·q, so summation
    -order jitter cannot flip the rounded cell between engines."""
    sql, quantum, min_dist = RAW_MARGIN_METRICS[metric_id]
    con = _connect(sf_dir)
    vals = [r[0] for r in con.execute(sql).fetchall() if r[0] is not None]
    assert vals, f"{metric_id}: raw scan returned no values at {sf_dir}"
    worst_v, worst = None, float("inf")
    for v in vals:
        frac = v / quantum - math.floor(v / quantum)
        dist = abs(frac - 0.5) * quantum
        if dist < worst:
            worst_v, worst = v, dist
    guarded = sorted(q for (q, _c), m in RAW_MARGIN.items() if m == metric_id)
    assert worst >= min_dist, (
        f"{metric_id}: raw value {worst_v!r} sits {worst:.2e} from a "
        f"half-quantum rounding boundary (q={quantum}) at {sf_dir} — the "
        f"rounded output cell can flip between engines. Guards {guarded}; "
        "widen the rounding or drop the cell to counts-only."
    )


@pytest.mark.parametrize(
    "sf_dir", SF_DIRS, ids=[d.rsplit("/", 1)[1] for d in SF_DIRS]
)
def test_nb_argmax_gap(sf_dir):
    """nb_lang_confusion: every document's winning-class margin must
    clear cross-engine float jitter, so the argmax (and therefore the
    integer confusion counts) cannot flip between engines."""
    con = _connect(sf_dir)
    sql = _NB_GAP_RAW_SQL.format(nb_ctes=QM._NB_CTES)
    gaps = [r[0] for r in con.execute(sql).fetchall()]
    assert gaps, f"nb gap scan returned no values at {sf_dir}"
    worst = min(gaps)
    assert worst >= 1e-9, (
        f"nb_lang_confusion: a document's top-2 class scores differ by "
        f"only {worst:.2e} at {sf_dir} — argmax can flip between "
        "engines. Add a deterministic tiebreak feature or drop the doc "
        "class from the report."
    )
