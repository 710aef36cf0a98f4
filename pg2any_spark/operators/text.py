"""Text-analysis operators for training-data pipelines.

Beyond-reference surface (BASELINE.json north star): language ID,
quality scoring, token counting, document fingerprinting. All
JVM-side built-ins — no Python UDFs — so they stay inside whole-stage
codegen and scale linearly with no shuffle (pure projections).

Cross-engine determinism notes (the DuckDB oracles mirror these):
- tokenization = split on ``\\s+`` after trim/lower;
- hashes = md5 (identical in Spark and DuckDB);
- DuckDB ``regexp_replace`` needs the ``'g'`` flag to match Spark's
  replace-all default.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

from pg2any_spark.caching import managed_persist

#: Stopword markers per language for the n-gram/stopword heuristic.
#: Deterministic and tiny by design — the point is the *operator shape*
#: (vectorized scoring + argmax), not NLP quality.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "is", "and", "of"),
    "de": ("der", "die", "und", "ist", "das"),
    "es": ("el", "la", "de", "es", "y"),
    "fr": ("le", "la", "et", "est", "de"),
}

#: Punctuation class shared verbatim with the oracles (explicit set —
#: Java and RE2 POSIX classes differ, a literal class does not).
PUNCT_CLASS = r"[.,;:!?]"


def tokens(text: Column) -> Column:
    """Lower-cased whitespace tokens."""
    return F.split(F.trim(F.lower(text)), r"\s+")


def token_count(text: Column) -> Column:
    """Whitespace token count (0 for empty/blank text)."""
    return F.when(F.trim(text) == "", F.lit(0)).otherwise(F.size(tokens(text)))


def bpe_ish_token_count(text: Column) -> Column:
    """BPE-ish token estimate: word-piece regex split — words, digits
    runs, and punctuation each count as a token."""
    toks = F.regexp_extract_all(F.lower(text), F.lit(r"[a-z]+|[0-9]+|[^a-z0-9\s]"), 0)
    return F.size(toks)


def stopword_ratio(text: Column, stopwords: tuple[str, ...]) -> Column:
    toks = tokens(text)
    stops = F.array(*[F.lit(s) for s in stopwords])
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(stops, t)))
    return n_stop / F.greatest(F.size(toks), F.lit(1))


def punct_ratio(text: Column) -> Column:
    n_punct = F.length(text) - F.length(F.regexp_replace(text, PUNCT_CLASS, ""))
    return n_punct / F.greatest(F.length(text), F.lit(1))


def quality_score(text: Column) -> Column:
    """Length/stopword/punctuation quality heuristic in [0, 1].

    Shape follows common pretraining-corpus filters (Gopher/C4-style
    rules): reasonable length, some stopwords, not punctuation-soup.
    """
    n_tok = token_count(text)
    len_score = F.least(n_tok / F.lit(50.0), F.lit(1.0))
    stop_score = F.least(
        stopword_ratio(text, LANG_MARKERS["en"]) * F.lit(5.0), F.lit(1.0)
    )
    punct_penalty = F.least(punct_ratio(text) * F.lit(5.0), F.lit(1.0))
    return F.round(
        F.lit(0.5) * len_score + F.lit(0.3) * stop_score + F.lit(0.2) * (1 - punct_penalty),
        6,
    )


def quality_ints(text: Column) -> dict[str, Column]:
    """The integer measurements ``quality_score`` is a rational
    function of, each as an exact BIGINT Column:

    - ``n_tok``:  whitespace token count (0 for blank text)
    - ``n_den``:  raw split length (the ratio denominators' operand —
                  1 for blank text, since splitting '' yields [''])
    - ``n_stop``: English stopword-marker hits
    - ``n_punct``: punctuation characters (PUNCT_CLASS)
    - ``n_chars``: text length

    Shared by the integer-exact quality flag and its driver-bisection
    probe so the two can never drift."""
    toks = tokens(text)
    stops = F.array(*[F.lit(s) for s in LANG_MARKERS["en"]])
    return {
        "n_tok": token_count(text).cast("long"),
        "n_den": F.size(toks).cast("long"),
        "n_stop": F.size(
            F.filter(toks, lambda t: F.array_contains(stops, t))
        ).cast("long"),
        "n_punct": (
            F.length(text) - F.length(F.regexp_replace(text, PUNCT_CLASS, ""))
        ).cast("long"),
        "n_chars": F.length(text).cast("long"),
    }


def quality_fail_int(text: Column) -> Column:
    """``quality < 0.4`` as an EXACT BIGINT comparison — the round-7
    rephrase of the funnel's quality cut into the proven-driver-green
    ``gopher_rules`` pattern (no float ever exists to jitter between
    engines; round 6 proved Spark rounds a double's shortest decimal
    repr while DuckDB rounds its exact binary value, so ROUND(q, 6)
    comparisons are engine-unstable exactly at repr ties).

    Derivation: with T = n_tok, Tg = max(n_den, 1), P = n_punct,
    Lg = max(n_chars, 1), S = n_stop,

        q = 0.5*min(T/50, 1) + 0.3*min(5S/Tg, 1) + 0.2*(1 - min(5P/Lg, 1))

        q < 2/5   ⟺   (multiply both sides by 100·Tg·Lg, all > 0)

        min(T,50)·Tg·Lg + 30·min(5S,Tg)·Lg + 20·Tg·(Lg − min(5P,Lg))
            < 40·Tg·Lg
    """
    m = quality_ints(text)
    tg = F.greatest(m["n_den"], F.lit(1).cast("long"))
    lg = F.greatest(m["n_chars"], F.lit(1).cast("long"))
    lhs = (
        F.least(m["n_tok"], F.lit(50).cast("long")) * tg * lg
        + F.lit(30).cast("long") * F.least(F.lit(5).cast("long") * m["n_stop"], tg) * lg
        + F.lit(20).cast("long") * tg * (lg - F.least(F.lit(5).cast("long") * m["n_punct"], lg))
    )
    return lhs < F.lit(40).cast("long") * tg * lg


#: Stopword probe set for the Gopher stop-hit rule (rule 8 in the
#: paper's repetition-free battery): a document failing to contain at
#: least 2 of these is flagged.
GOPHER_STOPWORDS = ("the", "a", "and", "of", "to")


def gopher_rules(col: str) -> dict[str, Column]:
    """Gopher-style document quality rules (Rae et al. 2021 §A1.1),
    every threshold rephrased as an EXACT INTEGER comparison so no
    float ever exists to jitter between engines (10·n_sym > n_words
    instead of n_sym/n_words > 0.1, etc.) — flags are bit-stable by
    construction and need no flip-margin classification.

    Returns named boolean fail-flag Columns over text column ``col``:

    - ``fail_words``:    word count outside [50, 100_000]
    - ``fail_mwl``:      mean word length outside [3, 10]
                         (3·n_words ≤ chars ≤ 10·n_words)
    - ``fail_symbol``:   symbol-to-word ratio ('#', '...') > 0.1
    - ``fail_bullet``:   > 90% of lines start with a bullet
    - ``fail_ellipsis``: > 30% of lines end with an ellipsis
    - ``fail_alpha``:    < 80% of words contain an alphabetic char
    - ``fail_stop``:     < 2 distinct stopword hits

    Pure codegen'd projections (regex counts, LIKE-filtered line
    splits) — no shuffle, no UDF; filters compose directly on the
    scan."""
    t = F.col(col)
    toks = tokens(t)
    n_words = F.size(toks)
    chars = F.length(F.regexp_replace(t, r"\s", ""))
    n_hash = F.length(t) - F.length(F.expr(f"replace({col}, '#', '')"))
    n_ell = (
        (F.length(t) - F.length(F.expr(f"replace({col}, '...', '')"))) / 3
    ).cast("long")
    n_lines = F.expr(f"size(split({col}, '\\n'))")
    n_bullet = F.expr(f"size(filter(split({col}, '\\n'), x -> x LIKE '- %'))")
    n_ell_lines = F.expr(
        f"size(filter(split({col}, '\\n'), x -> x LIKE '%...'))"
    )
    n_alpha = F.size(F.filter(toks, lambda x: x.rlike("[a-zA-Z]")))
    n_stop = sum(
        F.array_contains(toks, s).cast("int") for s in GOPHER_STOPWORDS
    )
    return {
        "fail_words": (n_words < 50) | (n_words > 100_000),
        "fail_mwl": (chars < 3 * n_words) | (chars > 10 * n_words),
        "fail_symbol": 10 * (n_hash + n_ell) > n_words,
        "fail_bullet": 10 * n_bullet > 9 * n_lines,
        "fail_ellipsis": 10 * n_ell_lines > 3 * n_lines,
        "fail_alpha": 5 * n_alpha < 4 * n_words,
        "fail_stop": n_stop < 2,
    }


def lang_scores(text: Column) -> dict[str, Column]:
    """Per-language stopword-hit counts."""
    toks = tokens(text)
    out = {}
    for lang, markers in LANG_MARKERS.items():
        arr = F.array(*[F.lit(m) for m in markers])
        out[lang] = F.size(F.filter(toks, lambda t: F.array_contains(arr, t)))
    return out


def lang_id(text: Column) -> Column:
    """Argmax language by marker hits; deterministic tiebreak by
    language code order; 'und' (undetermined) when no marker hits."""
    scores = lang_scores(text)
    best_lang = F.lit("und")
    best_score = F.lit(0)
    # iterate in reverse-sorted order so that earlier codes win ties
    for lang in sorted(scores, reverse=True):
        s = scores[lang]
        take = s >= F.greatest(best_score, F.lit(1))
        best_lang = F.when(take, F.lit(lang)).otherwise(best_lang)
        best_score = F.when(take, s).otherwise(best_score)
    return best_lang


def normalize_text(text: Column) -> Column:
    """Dedup normalization: lower, collapse whitespace, trim."""
    return F.trim(F.regexp_replace(F.lower(text), r"\s+", " "))


#: Zero-width characters stripped by ``clean_unicode``: ZWSP, ZWNJ,
#: ZWJ, BOM/ZWNBSP. Python resolves the escapes BEFORE the pattern
#: reaches either engine, so Java regex (Spark) and RE2 (DuckDB) see
#: the identical literal-character class (neither needs \uXXXX
#: support).
ZERO_WIDTH_CLASS = "[\u200b\u200c\u200d\ufeff]"

#: No-break space, same literal-character treatment.
NBSP = "\u00a0"


def clean_unicode(text: Column) -> Column:
    """Unicode hygiene pass (the CCNet/C4-style pre-filter cleanup):
    normalize legacy newlines (CRLF/CR → LF), strip zero-width
    characters, map NBSP to space, collapse space/tab runs, strip
    spaces hugging newlines, cap blank runs at one empty line, trim.
    Rule ORDER matters (zero-width removal must precede space
    collapsing or ``' \\u200b '`` survives as two spaces) and is
    mirrored verbatim by the SQL oracle. Pure codegen'd
    ``regexp_replace`` chain — no UDF, patterns kept to syntax Java
    regex and RE2 interpret identically."""
    t = F.regexp_replace(text, "\r\n?", "\n")
    t = F.regexp_replace(t, ZERO_WIDTH_CLASS, "")
    t = F.regexp_replace(t, NBSP, " ")
    t = F.regexp_replace(t, "[ \t]+", " ")
    t = F.regexp_replace(t, " *\n *", "\n")
    t = F.regexp_replace(t, "\n{3,}", "\n\n")
    return F.trim(t)


def fingerprint(text: Column) -> Column:
    """Content fingerprint: md5 of normalized text (identical in any
    engine with md5 — the cross-engine rolling-hash stand-in)."""
    return F.md5(normalize_text(text))


#: Rabin-Karp parameters shared verbatim with the DuckDB oracle.
ROLLING_BASE = 131
ROLLING_MOD = 2_147_483_647  # 2^31 - 1 (Mersenne prime)


def rolling_fingerprint(text: Column) -> Column:
    """Polynomial rolling-hash fingerprint (Rabin-Karp) of normalized
    text: ``h = fold(chars, h*131 + codepoint mod 2^31-1)``.

    Entirely JVM-side (``regexp_extract_all`` + higher-order
    ``aggregate``), so it stays in whole-stage codegen — a pure
    projection with no shuffle, linear in corpus bytes at any scale.
    Normalization collapses whitespace first, so ``.`` (no-newline)
    char extraction sees every character. acc < 2^31 keeps the
    ``acc*131 + code`` intermediate far inside int64 — no overflow in
    either engine.
    """
    chars = F.regexp_extract_all(normalize_text(text), F.lit(r"."), 0)
    return F.aggregate(
        chars,
        F.lit(0).cast("long"),
        lambda acc, c: (acc * ROLLING_BASE + F.ascii(c)) % ROLLING_MOD,
    )


def with_text_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Attach the full text-analysis column family."""
    t = F.col(text_col)
    return df.withColumns(
        {
            "n_tokens": token_count(t),
            "n_tokens_bpe": bpe_ish_token_count(t),
            "punct_ratio": F.round(punct_ratio(t), 6),
            "stopword_ratio_en": F.round(stopword_ratio(t, LANG_MARKERS["en"]), 6),
            "quality": quality_score(t),
            "lang_pred": lang_id(t),
            "fingerprint": fingerprint(t),
        }
    )


def word_ngrams(text: Column, n: int = 3) -> Column:
    """Array of word n-grams over whitespace tokens (empty array when
    the text has fewer than ``n`` tokens). Pure codegen'd higher-order
    functions — the corpus-statistics primitive behind contamination
    screens and boilerplate detection.

    The token array is bound ONCE as a lambda variable (``transform``
    over a single-element array) before the per-gram ``element_at``
    references — inlining ``split()`` into the lambda would re-split
    the text for every gram element (measured 8× slower at sf0.1; the
    same re-derivation hazard ``repetition_stats`` documents)."""
    toks = tokens(text)
    grams = F.element_at(
        F.transform(
            F.array(toks),
            lambda t: F.transform(
                F.sequence(F.lit(0), F.size(t) - n),
                lambda i: F.concat_ws(
                    " ", *[F.element_at(t, i + j + 1) for j in range(n)]
                ),
            ),
        ),
        1,
    )
    return F.when(
        (F.trim(text) == "") | (F.size(toks) < n), F.array().cast("array<string>")
    ).otherwise(grams)


def tfidf_top_terms(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    materialize: bool = False,
) -> DataFrame:
    """Top-k characteristic terms per document by TF-IDF — the
    corpus-statistics primitive behind keyword extraction and
    boilerplate screening in a training-data pipeline.

    Plan shape (all JVM codegen, no Python): explode → per-(doc, term)
    count with map-side partial agg → document frequency as a second
    agg over the tf table (map-side-combined down to |vocab| rows) →
    BROADCAST dfreq back onto tf, so the pair table is shuffled
    exactly twice: once keyed (doc, term) for the TF count and once
    keyed doc for the final rank — never re-keyed on term. Broadcast
    also makes the join immune to stopword skew (a hash join on term
    would put every "the" pair in one task). Cutover: if the
    vocabulary outgrows the broadcast budget (web-scale corpora reach
    1e8+ unique tokens), drop the hint — AQE falls back to a
    skew-split sort-merge join on term; the query stays correct.

    TF-IDF is rounded to 6 decimals BEFORE ranking so the tie-break
    (term ascending) is reproducible across engines — floating ln()
    noise must not reorder ranks vs the DuckDB oracle.
    """
    base = df.filter(F.trim(F.col(text_col)) != "")
    toks = base.select(
        F.col(id_col), F.explode(tokens(F.col(text_col))).alias("term")
    ).filter(F.col("term") != "")
    tf = toks.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    # ``materialize`` persists tf before it fans out to dfreq and the
    # scored join: Catalyst cannot reuse the exchange between the two
    # consumers (column pruning rewrites the dfreq branch to a
    # distinct, breaking canonical equality), so without it the whole
    # explode→pair-shuffle pipeline executes twice — same
    # double-execution hazard the dedup band table persists against.
    if materialize:
        tf = managed_persist(tf)
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n_docs = base.agg(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        tf.join(F.broadcast(dfreq), "term")
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "tfidf",
            F.round(
                F.col("tf") * F.log(F.col("n_docs").cast("double") / F.col("df")),
                6,
            ),
        )
    )
    w = Window.partitionBy(id_col).orderBy(F.col("tfidf").desc(), "term")
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select(id_col, "term", "tf", "tfidf", "rnk")
    )


#: PII patterns shared VERBATIM with the oracles. Kept to syntax that
#: Java regex (Spark) and RE2 (DuckDB) interpret identically — no
#: backrefs, no lookaround, explicit classes.
EMAIL_RE = r"[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}"
IPV4_RE = r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b"
PHONE_RE = r"\+?[0-9]{3}[- .][0-9]{3}[- .][0-9]{4}"


def redact_pii(text: Column) -> Column:
    """Replace emails, IPv4 addresses and phone numbers with typed
    placeholder tags — the standard scrub before training-corpus
    release. Pure chained ``regexp_replace`` (JVM codegen; global
    replace is Spark's default and DuckDB needs the 'g' flag —
    mirrored in the oracle)."""
    out = F.regexp_replace(text, EMAIL_RE, "[EMAIL]")
    out = F.regexp_replace(out, IPV4_RE, "[IP]")
    return F.regexp_replace(out, PHONE_RE, "[PHONE]")


def pii_counts(text: Column) -> dict[str, Column]:
    """Match counts per PII class (audit metric for the scrub)."""
    return {
        "n_emails": F.regexp_count(text, F.lit(EMAIL_RE)),
        "n_ips": F.regexp_count(text, F.lit(IPV4_RE)),
        "n_phones": F.regexp_count(text, F.lit(PHONE_RE)),
    }


def _max_run_length(sorted_arr: Column) -> Column:
    """Longest run of equal adjacent elements in a sorted array —
    single-pass ``aggregate`` with (prev, run, best) struct state."""
    init = F.struct(
        F.lit(None).cast("string").alias("prev"),
        F.lit(0).alias("run"),
        F.lit(0).alias("best"),
    )

    def step(acc, x):
        run = F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1))
        return F.struct(
            x.alias("prev"),
            run.alias("run"),
            F.greatest(acc["best"], run).alias("best"),
        )

    return F.aggregate(sorted_arr, init, step, lambda acc: acc["best"])


def repetition_stats(grams: Column) -> dict[str, Column]:
    """Gopher-style repetition quality signals over a word n-gram
    array (materialize it ONCE with ``word_ngrams`` + ``withColumn``
    before calling — inlining the n-gram expression into each stat
    re-derives it per reference and measures ~50× slower):

    - ``dup_ngram_frac``: fraction of n-gram OCCURRENCES that are
      repeats of an earlier occurrence (1 - distinct/total);
    - ``top_ngram_share``: share of occurrences taken by the single
      most frequent n-gram (modal count = longest equal run after
      ``array_sort`` — O(n log n) per doc, not quadratic).

    Machine-generated/boilerplate text scores high on both. Pure
    per-row expressions: no shuffle, no UDF, linear corpus cost.
    """
    total = F.size(grams)
    distinct = F.size(F.array_distinct(grams))
    top = _max_run_length(F.array_sort(grams))
    safe_total = F.when(total > 0, total.cast("double"))
    return {
        "dup_ngram_frac": F.round(
            F.coalesce((total - distinct) / safe_total, F.lit(0.0)), 6
        ),
        "top_ngram_share": F.round(
            F.coalesce(top / safe_total, F.lit(0.0)), 6
        ),
    }


# ---------------------------------------------------------------------------
# corpus-trained bigram LM quality scoring (CCNet-style filter signal)
# ---------------------------------------------------------------------------


def lm_bigram_scores(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    alpha: float = 0.5,
    materialize: bool = False,
    broadcast_counts: bool = True,
) -> DataFrame:
    """Per-document mean negative log-likelihood under an add-k
    smoothed bigram LM trained on the corpus itself — the classic
    perplexity-style quality signal (CCNet buckets web text by LM
    score; here the LM is self-trained so the operator is closed over
    its input and fully oracle-able).

    P(w2|w1) = (c(w1 w2) + α) / (c(w1) + α·V), with c(w1) summed over
    bigram histories and V = corpus vocabulary size. Docs with < 2
    tokens carry no bigrams and are excluded.

    Plan shape (all JVM codegen): the exploded occurrence stream
    reduces IMMEDIATELY to per-(doc, bigram) counts — the only shuffle
    that carries corpus-sized data. Corpus bigram counts, history
    counts, and V all derive from that table (map-side-combined down
    to |bigram vocab| rows). With ``broadcast_counts=True`` (default;
    right whenever the bigram vocab fits the broadcast budget) the
    count tables join back by broadcast — a bigram-keyed hash join
    would route every "of the" pair through one task, the same
    stopword-skew argument as ``tfidf_top_terms``. A broadcast HINT is
    honored regardless of size, so at web scale — where the bigram
    vocab can reach billions of rows — the default would OOM the
    driver, not degrade gracefully: pass ``broadcast_counts=False`` to
    emit hint-free joins, which AQE plans as (skew-split) sort-merge
    on the bigram key. Both forms are verified result-identical and
    the no-hint plan is pinned broadcast-free in
    tests/test_text.py::TestLmBroadcastFallback. V is a broadcast
    1-row crossJoin either way (lazy — no eager .collect()). Per-doc
    means are count-weighted over the doc-bigram table, identical to
    averaging over occurrences.
    """
    base = df.filter(F.trim(F.col(text_col)) != "")
    docbg = (
        base.select(
            F.col(id_col),
            F.explode(word_ngrams(F.col(text_col), 2)).alias("bg"),
        )
        .groupBy(id_col, "bg")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    # docbg fans out to the count tables AND the scoring join — but
    # its scan→explode→partial-agg→Exchange subtree is byte-identical
    # under every consumer, so AQE shuffle-stage reuse runs the corpus
    # scan ONCE per action and each consumer replays the map output
    # (the batch-7 rule). The default is therefore NOT to persist:
    # measured at sf0.1, materialize=False is 1.2 s steady vs
    # 1.4–1.8 s warm with the cache (cache materialization defeats
    # per-consumer AQE coalescing), identical results — and at corpus
    # scale caching a corpus-sized doc-bigram table is itself the
    # expensive part. materialize=True remains for callers that drive
    # MULTIPLE actions over subtrees that cannot share one result
    # table (cross-action reuse is the only case a persist pays).
    if materialize:
        docbg = managed_persist(docbg)
    bg_counts = docbg.groupBy("bg").agg(F.sum("n").alias("c_bg"))
    hist = (
        bg_counts.withColumn("w1", F.substring_index("bg", " ", 1))
        .groupBy("w1")
        .agg(F.sum("c_bg").alias("c_w1"))
    )
    vocab = (
        base.select(F.explode(tokens(F.col(text_col))).alias("tok"))
        .filter(F.col("tok") != "")
        .agg(F.countDistinct("tok").alias("v"))
    )
    maybe_bc = F.broadcast if broadcast_counts else (lambda d: d)
    # nll depends only on the BIGRAM (c_bg, c_w1, V), so it is computed
    # once per DISTINCT bigram on the vocab-sized count table instead
    # of once per (doc, bigram) row (round-11, guide §1.2 "don't
    # compute things twice"): the log/divide chain shrinks from
    # |doc-bigram| to |bigram vocab| evaluations and the scoring join
    # collapses from two (counts + history) to one against the small
    # per-bigram nll table. Per-row values are identical — same
    # operands, same IEEE op order — so every downstream sum matches.
    bg_nll = (
        bg_counts.withColumn("w1", F.substring_index("bg", " ", 1))
        .join(maybe_bc(hist), "w1")
        .crossJoin(F.broadcast(vocab))
        .select(
            "bg",
            (
                -F.log(
                    (F.col("c_bg") + F.lit(alpha))
                    / (F.col("c_w1") + F.lit(alpha) * F.col("v"))
                )
            ).alias("nll"),
        )
    )
    scored = docbg.join(maybe_bc(bg_nll), "bg")
    return scored.groupBy(id_col).agg(
        F.sum("n").alias("n_bigrams"),
        F.round(F.sum(F.col("n") * F.col("nll")) / F.sum("n"), 4).alias("avg_nll"),
    )


def lm_bigram_scores_scaled(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    alpha: float = 0.5,
    scale: int = 1_000_000,
    materialize: bool = False,
    broadcast_counts: bool = True,
) -> DataFrame:
    """``lm_bigram_scores`` with the per-bigram nll quantized to a
    scaled BIGINT BEFORE any aggregation (round-7 determinism form):
    ``nll_s = floor(scale · -ln((c_bg+α)/(c_w1+α·V)))`` per distinct
    (history, bigram) pair, then ``nll_sum = Σ n·nll_s`` per document.

    Why this shape: the quotient feeding ln is a single chain of IEEE
    +,*,/ over exact integers — bit-identical in any engine computing
    the same op order — so the only cross-engine noise source left is
    a ≤1-ulp libm ln() difference, which the floor can flip only when
    scale·nll sits within ~1e-10 of an integer (vs the rounded-mean
    form, where a repr-tie in ROUND flips whole comparisons). The sum
    of BIGINTs is order-independent, so thresholds become pure integer
    comparisons: ``avg_nll > θ  ⟺  nll_sum > θ·scale·n_bigrams``.

    Returns (id_col, n_bigrams, nll_sum) — both BIGINT."""
    base = df.filter(F.trim(F.col(text_col)) != "")
    docbg = (
        base.select(
            F.col(id_col),
            F.explode(word_ngrams(F.col(text_col), 2)).alias("bg"),
        )
        .groupBy(id_col, "bg")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    if materialize:
        docbg = managed_persist(docbg)
    bg_counts = docbg.groupBy("bg").agg(F.sum("n").alias("c_bg"))
    hist = (
        bg_counts.withColumn("w1", F.substring_index("bg", " ", 1))
        .groupBy("w1")
        .agg(F.sum("c_bg").alias("c_w1"))
    )
    vocab = (
        base.select(F.explode(tokens(F.col(text_col))).alias("tok"))
        .filter(F.col("tok") != "")
        .agg(F.countDistinct("tok").alias("v"))
    )
    maybe_bc = F.broadcast if broadcast_counts else (lambda d: d)
    # Same per-distinct-bigram hoist as lm_bigram_scores (round-11):
    # nll_s is a pure function of the bigram, so the floor(scale·-ln)
    # chain runs once per vocab entry and the per-(doc, bigram) scoring
    # join is a single join against the small (bg, nll_s) table.
    # BIGINT-exact: identical operands and op order per bigram.
    bg_nll = (
        bg_counts.withColumn("w1", F.substring_index("bg", " ", 1))
        .join(maybe_bc(hist), "w1")
        .crossJoin(F.broadcast(vocab))
        .select(
            "bg",
            F.floor(
                F.lit(float(scale))
                * -F.log(
                    (F.col("c_bg") + F.lit(alpha))
                    / (F.col("c_w1") + F.lit(alpha) * F.col("v"))
                )
            ).cast("long").alias("nll_s"),
        )
    )
    scored = docbg.join(maybe_bc(bg_nll), "bg")
    return scored.groupBy(id_col).agg(
        F.sum("n").alias("n_bigrams"),
        F.sum(F.col("n") * F.col("nll_s")).alias("nll_sum"),
    )


# ---------------------------------------------------------------------------
# vocabulary growth (Heaps-law corpus curve)
# ---------------------------------------------------------------------------


def vocab_growth(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    buckets: int = 20,
) -> DataFrame:
    """Vocabulary growth curve: new and cumulative distinct words per
    ordered corpus chunk (``buckets`` equal id-range chunks).

    The scale-correct factoring of "cumulative distinct" — a naive
    running-distinct window would funnel the whole corpus through one
    partition. Instead: each word reduces to its FIRST document
    (map-side-combinable ``min``), first-docs bucket into fixed
    id-range chunks, and the cumulative sum runs over ``buckets`` rows
    (a constant-size window regardless of corpus size). The id-range
    bound is a lazy broadcast scalar, not an eager collect.
    """
    base = df.filter(F.trim(F.col(text_col)) != "")
    bound = base.agg((F.max(id_col) + 1).alias("id_bound"))
    first_doc = (
        base.select(F.col(id_col), F.explode(tokens(F.col(text_col))).alias("tok"))
        .filter(F.col("tok") != "")
        .groupBy("tok")
        .agg(F.min(id_col).alias("first_doc"))
    )
    bucket_of = lambda c: F.floor(  # noqa: E731
        F.col(c).cast("double") * buckets / F.col("id_bound")
    ).cast("int")
    new_words = (
        first_doc.crossJoin(F.broadcast(bound))
        .groupBy(bucket_of("first_doc").alias("bucket"))
        .agg(F.count(F.lit(1)).alias("new_words"))
    )
    docs_per = (
        base.crossJoin(F.broadcast(bound))
        .groupBy(bucket_of(id_col).alias("bucket"))
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )
    w = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, 0)
    return (
        docs_per.join(new_words, "bucket", "left")
        .withColumn("new_words", F.coalesce("new_words", F.lit(0)))
        .withColumn("cum_vocab", F.sum("new_words").over(w))
        .select("bucket", "n_docs", "new_words", "cum_vocab")
    )


# ---------------------------------------------------------------------------
# BPE merge induction (tokenizer training on the word-count dictionary)
# ---------------------------------------------------------------------------


def _merge_pair_fold(syms, x: str, y: str):
    """Greedy left-to-right application of ONE merge (x, y) to a
    symbol ARRAY: fold that replaces the accumulator's last element
    with x+y when (last, current) == (x, y), else appends. Operating
    on whole symbols makes cross-boundary matches impossible — a
    substring replace on a delimited encoding would merge "a.b"
    inside "ca.b" (left element matching a SUFFIX of the previous
    symbol), silently corrupting the word table."""
    return F.aggregate(
        syms,
        F.array().cast("array<string>"),
        lambda acc, e: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(x))
            & (e == F.lit(y)),
            F.concat(
                F.slice(acc, F.lit(1), F.size(acc) - 1),
                F.array(F.lit(x + y)),
            ),
        ).otherwise(F.concat(acc, F.array(e))),
    )


#: Char-split regex: between-character boundaries (no empties).
_CHAR_SPLIT = r"(?!^)(?=.)"


def learn_bpe_merges(
    df: DataFrame,
    text_col: str = "text",
    rounds: int = 5,
) -> DataFrame:
    """Learn the first ``rounds`` byte-pair-encoding merges from the
    corpus — tokenizer induction, the step that precedes tokenization
    in a pretraining pipeline.

    Industrial BPE trainers never iterate over the corpus: they train
    on the WORD-COUNT DICTIONARY. So does this operator — the corpus
    collapses to (word, count) with one map-side-combinable aggregate,
    and every merge round is O(|vocabulary|) work on that table:
    adjacent-symbol pair counts (weighted by word frequency), argmax
    with a deterministic tie-break (count desc, pair asc), then the
    merge applied to every word via ``_merge_pair_fold`` (symbol-array
    fold — exact greedy semantics, no cross-boundary matches). The
    ONLY driver transfer is one row per round (the chosen pair) —
    bounded by ``rounds``, never by data. Each round's word table is
    persisted, materialized, and the previous round's cache released,
    so storage holds ONE copy of the (tiny) dictionary, not K.

    Returns (merge_round, pair, new_symbol, n_occurrences); ``pair``
    is ``"x.y"`` (symbols never contain dots — dot-bearing tokens are
    excluded up front, a production trainer would byte-escape). Pair
    occurrences count every adjacent position (overlapping, the
    common convention).
    """
    spark = df.sparkSession
    words = (
        df.select(F.explode(tokens(F.col(text_col))).alias("w"))
        .filter((F.col("w") != "") & ~F.col("w").contains("."))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("n"))
        .withColumn("syms", F.split("w", _CHAR_SPLIT))
    )
    pairs_expr = F.expr(
        "zip_with(slice(syms, 1, size(syms) - 1),"
        "         slice(syms, 2, size(syms) - 1),"
        "         (x, y) -> concat(x, '.', y))"
    )
    merges: list[tuple] = []
    wt, cached = words, None
    for r in range(1, rounds + 1):
        best = (
            wt.select(F.explode(pairs_expr).alias("pair"), "n")
            .groupBy("pair")
            .agg(F.sum("n").alias("cnt"))
            .orderBy(F.col("cnt").desc(), "pair")
            .limit(1)
            .collect()
        )
        if not best:
            break
        pair, cnt = best[0]["pair"], best[0]["cnt"]
        x, y = pair.split(".")
        merges.append((r, pair, x + y, cnt))
        if r < rounds:
            new_wt = wt.withColumn(
                "syms", _merge_pair_fold(F.col("syms"), x, y)
            ).persist()
            new_wt.count()  # materialize BEFORE dropping the parent cache
            if cached is not None:
                cached.unpersist()
            wt, cached = new_wt, new_wt
    if cached is not None:
        cached.unpersist()
    from pg2any_spark.functions.localtable import literal_table

    return literal_table(
        spark,
        merges,
        "merge_round int, pair string, new_symbol string, n_occurrences long",
    )


def apply_bpe_merges(
    df: DataFrame,
    merges: list[str],
    text_col: str = "text",
) -> DataFrame:
    """Tokenize text with an ordered list of learned BPE merge pairs
    (``"x.y"`` strings from ``learn_bpe_merges``) — the apply side of
    tokenizer induction.

    Each word splits to its character symbols and the merges replay in
    training order as chained ``_merge_pair_fold`` passes (pure
    codegen column expressions — the merge list is a driver-side
    constant of size K, broadcast with the plan, never a join). Adds
    ``n_chars_tok`` (summed word lengths) and ``n_bpe_tokens``;
    compression = chars/tokens is the standard fertility metric
    watched when sizing a tokenizer. Dot-bearing words are excluded
    from both counts — the same exclusion the trainer applies, so
    train and apply agree on the symbol model.
    """
    toks = F.filter(
        tokens(F.col(text_col)),
        lambda w: (w != "") & ~w.contains("."),
    )

    def tokenize_word(w):
        merged = F.split(w, _CHAR_SPLIT)
        for pair in merges:
            x, y = pair.split(".")
            merged = _merge_pair_fold(merged, x, y)
        return merged

    n_tokens = F.aggregate(
        F.transform(toks, lambda w: F.size(tokenize_word(w))),
        F.lit(0),
        lambda acc, x: acc + x,
    )
    n_chars = F.aggregate(
        F.transform(toks, lambda w: F.length(w)),
        F.lit(0),
        lambda acc, x: acc + x,
    )
    return df.withColumn("n_chars_tok", n_chars).withColumn(
        "n_bpe_tokens", n_tokens
    )


# ---------------------------------------------------------------------------
# hashed multinomial naive Bayes (closed-form quality/label classifier)
# ---------------------------------------------------------------------------


def nb_hashed_scores(
    df: DataFrame,
    label_col: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    alpha: float = 1.0,
    n_buckets: int = 4096,
    materialize: bool = False,
) -> DataFrame:
    """Per-(document, class) log-posterior under a multinomial naive
    Bayes model self-trained on the corpus's own labels over hashed
    token features — the classic closed-form text classifier (the
    fastText-style linear scorer's exact-training cousin): score(d, c)
    = ln P(c) + Σ_f n_df · ln((c_cf + α)/(N_c + α·B)).

    Training IS aggregation — class-conditional bucket counts and
    document priors — so there is no iterative fit, and the whole
    model is closed over its input (DuckDB-oracle-able, re-run
    stable). Classify by argmax over classes (deterministic given the
    score-gap margin gate in tests/test_threshold_margins.py).

    Scale (100 TB): same hashing-trick posture as
    ``sampling.dsir_log_ratio`` — the model is a B×|classes| weight
    matrix, broadcastable regardless of corpus size. One corpus-sized
    shuffle (token stream → per-(doc, bucket) counts, map-side
    combined); the scoring join fans each doc-feature row out to
    |classes| rows and immediately re-reduces to (doc, class).

    Returns (id_col, label_col, clabel, score): one row per scored
    document per candidate class, with the document's true label
    carried through for confusion/accuracy reporting.
    """
    from pg2any_spark.operators.sampling import hash_bucket

    base = (
        df.filter(F.trim(F.col(text_col)) != "")
        .select(
            F.col(id_col),
            F.col(label_col),
            F.explode(tokens(F.col(text_col))).alias("tok"),
        )
        .filter(F.col("tok") != "")
    )
    docfeat = (
        base.select(
            id_col,
            label_col,
            hash_bucket(F.col("tok"), n_buckets).alias("f"),
        )
        .groupBy(id_col, label_col, "f")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    # fans out to class counts, priors, the feature list AND scoring
    if materialize:
        docfeat = managed_persist(docfeat)
    cf = (
        docfeat.groupBy(F.col(label_col).alias("clabel"), "f")
        .agg(F.sum("n").alias("c"))
    )
    ct = cf.groupBy("clabel").agg(F.sum("c").alias("tot"))
    scored_docs = docfeat.select(id_col, label_col).distinct()
    n_docs = scored_docs.agg(F.count(F.lit(1)).alias("n_all"))
    prior = (
        scored_docs.groupBy(F.col(label_col).alias("clabel"))
        .agg(F.count(F.lit(1)).alias("n_c"))
        .crossJoin(F.broadcast(n_docs))
        .select(
            "clabel",
            F.log(F.col("n_c").cast("double") / F.col("n_all").cast("double")).alias("lp"),
        )
    )
    feats = docfeat.select("f").distinct()
    denom = float(alpha) * n_buckets
    weights = (
        feats.crossJoin(F.broadcast(ct))
        .join(cf, ["f", "clabel"], "left")
        .select(
            "f",
            "clabel",
            F.log(
                (F.coalesce(F.col("c"), F.lit(0)).cast("double") + F.lit(float(alpha)))
                / (F.col("tot").cast("double") + F.lit(denom))
            ).alias("w"),
        )
    )
    # weights <= n_buckets × |classes| rows by construction: broadcast
    return (
        docfeat.join(F.broadcast(weights), "f")
        .groupBy(id_col, label_col, "clabel")
        .agg(F.sum(F.col("n").cast("double") * F.col("w")).alias("ll"))
        .join(F.broadcast(prior), "clabel")
        .select(
            id_col,
            label_col,
            "clabel",
            (F.col("lp") + F.col("ll")).alias("score"),
        )
    )


def nb_predict(
    scores: DataFrame, id_col: str = "doc_id", label_col: str = "lang"
) -> DataFrame:
    """Argmax over ``nb_hashed_scores`` output: one row per document
    with the winning class. Deterministic tie-break on class name; the
    score-gap margin gate asserts the argmax can never sit within
    float jitter of a tie."""
    rk = F.row_number().over(
        Window.partitionBy(id_col).orderBy(F.col("score").desc(), "clabel")
    )
    return (
        scores.withColumn("rk", rk)
        .filter(F.col("rk") == 1)
        .select(id_col, label_col, F.col("clabel").alias("predicted"))
    )
