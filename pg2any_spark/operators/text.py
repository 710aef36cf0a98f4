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

from pyspark.sql import Column, DataFrame, functions as F

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
    screens and boilerplate detection."""
    toks = tokens(text)
    return F.when(
        (F.trim(text) == "") | (F.size(toks) < n), F.array().cast("array<string>")
    ).otherwise(
        F.transform(
            F.sequence(F.lit(0), F.size(toks) - n),
            lambda i: F.concat_ws(
                " ", *[F.element_at(toks, i + j + 1) for j in range(n)]
            ),
        )
    )
