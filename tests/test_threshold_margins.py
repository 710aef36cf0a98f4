"""Threshold-flip gate: no registered query may threshold a rounded
float metric whose UNROUNDED distribution approaches a rounding-flip
boundary of the cut.

Round 4's only red driver row (`corpus_filter_funnel`) was an LM cut
(avg_nll > 3.42) sitting 2e-4 — two rounding quanta — from two
documents' scores.  This gate retires the bug class with the exact
flip condition rather than a crude margin:

For flag = ROUND(raw, d) OP t, with quantum q = 10^-d and t a
multiple of q, the flag flips between engines/runs ONLY when `raw`
lies within cross-engine float jitter of one of the two half-quantum
rounding boundaries t - q/2 or t + q/2 (there the rounded value
tips between t and t±q, crossing the cut).  A value exactly AT the
cut after rounding is stable — t is far from its own rounding
boundaries — so atoms at nice rationals (quality == 0.4 exactly, an
actual feature of the fixture) are correctly admitted.

The gate therefore computes every metric's UNROUNDED distribution on
DuckDB (reusing the same SQL fragments the oracles are built from, so
it cannot drift from the queries) and asserts min |raw - b| >= 1e-9
for both boundaries b — six orders of magnitude above measured
cross-engine disagreement (Spark vs DuckDB agree to ~3e-15 on the LM
metric; measured round 5).

Runs at sf0.001, sf0.01 (the correctness-gate SF), and sf0.1.
"""

from __future__ import annotations

import duckdb
import pytest

from pg2any_spark.plans import queries_ml as QM

SF_DIRS = [
    "/root/testdata/sf0.001",
    "/root/testdata/sf0.01",
    "/root/testdata/sf0.1",
]

_LM_RAW_SQL = f"""
WITH base AS (
    SELECT doc_id, text FROM documents WHERE trim(text) <> ''
),
occ AS (
    SELECT doc_id,
           unnest(list_transform(generate_series(1, len({QM._TOKS}) - 1),
                  i -> {QM._TOKS}[i] || ' ' || {QM._TOKS}[i+1])) AS bg
    FROM base WHERE len({QM._TOKS}) >= 2
),
bgc AS (SELECT bg, count(*) AS c_bg FROM occ GROUP BY bg),
hist AS (
    SELECT split_part(bg, ' ', 1) AS w1, SUM(c_bg) AS c_w1
    FROM bgc GROUP BY 1
),
voc AS (
    SELECT count(DISTINCT tok) AS v FROM (
        SELECT unnest({QM._TOKS}) AS tok FROM base
    ) WHERE tok <> ''
)
SELECT AVG(-ln((c_bg + 0.5) / (c_w1 + 0.5 * v))) AS m
FROM occ o
JOIN bgc ON o.bg = bgc.bg
JOIN hist ON split_part(o.bg, ' ', 1) = hist.w1
CROSS JOIN voc
GROUP BY o.doc_id
"""

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

# (metric id, raw SQL yielding column m, [cut literals], rounding
#  quantum, queries guarded)
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
    ("pair_cosine", _PAIR_COS_RAW_SQL, [0.95], 1e-6, ["embedding_near_dup"]),
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
    con = duckdb.connect()
    for tbl in ("documents", "embeddings"):
        con.execute(
            f"CREATE VIEW {tbl} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{tbl}.parquet')"
        )
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
