"""Text-analysis functions for the training-data pipeline (north star).

All pure Catalyst expressions over the `documents` table — language ID
heuristic, quality scoring, token counting, fingerprinting.  These run
JVM-side so a 100 TB corpus scan stays in whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Tiny per-language stopword marker sets for the n-gram/stopword language-ID
# heuristic. Chosen to be discriminative between the synthetic corpus langs.
LANG_MARKERS = {
    "en": ["the", "and", "of", "to", "is"],
    "de": ["der", "die", "und", "ist", "das"],
    "fr": ["le", "la", "et", "les", "des"],
    "es": ["el", "la", "que", "de", "los"],
}

EN_STOPWORDS = [
    "the", "and", "of", "to", "a", "in", "is", "it", "that", "for",
    "on", "with", "as", "was", "at", "by", "an", "be", "this", "are",
]

_TOKEN_SPLIT = "\\s+"


def tokens(col: Column | str) -> Column:
    """Whitespace tokenization → array<string> (empty string → empty array)."""
    c = F.col(col) if isinstance(col, str) else col
    trimmed = F.trim(c)
    return F.when(F.length(trimmed) == 0, F.array().cast("array<string>")).otherwise(
        F.split(trimmed, _TOKEN_SPLIT)
    )


def token_count(col: Column | str) -> Column:
    """Whitespace token count (BIGINT); NULL text → NULL, never the
    -1 that size(NULL) yields in non-ANSI mode (a -1 silently corrupts
    summed token totals)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.when(c.isNotNull(), F.size(tokens(c)).cast("long"))


def bpe_ish_token_count(col: Column | str) -> Column:
    """Sub-word-ish token count: split on word/number/punct boundaries.

    A cheap proxy for BPE token counts (regex word pieces + punctuation),
    good enough for corpus sizing at scale.
    """
    c = F.col(col) if isinstance(col, str) else col
    pieces = F.regexp_extract_all(c, F.lit(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"), 0)
    return F.when(c.isNotNull(), F.size(pieces).cast("long"))


def punct_ratio(col: Column | str) -> Column:
    """#punctuation chars / #chars (0.0 for empty).

    Unicode-aware: letters/digits in ANY script count as word chars
    (\\p{L}\\p{N}, supported identically by Java regex and RE2) —
    ASCII-only \\w would count every 'é'/'ö'/CJK character as
    punctuation and systematically mark clean non-English text as
    punctuation soup."""
    c = F.col(col) if isinstance(col, str) else col
    n = F.length(c)
    punct = n - F.length(F.regexp_replace(c, r"[^\p{L}\p{N}\s]", ""))
    return F.when(n == 0, F.lit(0.0)).otherwise(punct.cast("double") / n.cast("double"))


def stopword_ratio(col: Column | str, stopwords: list[str] | None = None) -> Column:
    """Fraction of tokens that are (lowercased) stopwords."""
    sw = F.array(*[F.lit(w) for w in (stopwords or EN_STOPWORDS)])
    toks = tokens(F.lower(F.col(col) if isinstance(col, str) else col))
    n = F.size(toks)
    # count every occurrence, not just distinct stopwords
    occ = F.size(F.filter(toks, lambda t: F.array_contains(sw, t)))
    return F.when(n == 0, F.lit(0.0)).otherwise(occ.cast("double") / n.cast("double"))


def quality_score(col: Column | str) -> Column:
    """Composite [0,1] quality score: length + punctuation + stopword signals.

    Mirrors common pretraining-corpus heuristics (Gopher/C4 rules): docs
    that are too short, punctuation-soup, or stopword-free score low.
    """
    c = F.col(col) if isinstance(col, str) else col
    n_tok = token_count(c)
    len_score = F.least(n_tok.cast("double") / F.lit(50.0), F.lit(1.0))
    punct_score = F.lit(1.0) - F.least(punct_ratio(c) * 4.0, F.lit(1.0))
    sw_score = F.least(stopword_ratio(c) * 5.0, F.lit(1.0))
    # NULL text → NULL score (size(null) is -1 in non-ANSI mode, which
    # would otherwise leak a negative length score into the mean)
    return F.when(c.isNull(), F.lit(None).cast("double")).otherwise(
        F.round((len_score + punct_score + sw_score) / 3.0, 6)
    )


def lang_id(col: Column | str) -> Column:
    """Stopword-marker language ID over LANG_MARKERS; 'und' if no hits.

    Deterministic tie-break: language with most marker-token hits, ties
    broken by language code ascending.
    """
    toks = tokens(F.lower(F.col(col) if isinstance(col, str) else col))
    langs = sorted(LANG_MARKERS.items())
    scores = []
    for i, (lang, markers) in enumerate(langs):
        arr = F.array(*[F.lit(m) for m in markers])
        hits = F.size(F.filter(toks, lambda t: F.array_contains(arr, t)))
        # struct comparison is field-by-field: (hits, pref, lang); pref is
        # DESCENDING in lang order so array_max breaks hit-ties toward the
        # lexicographically SMALLEST language code.
        pref = F.lit(len(langs) - i)
        scores.append(F.struct(hits.alias("hits"), pref.alias("pref"), F.lit(lang).alias("lang")))
    best = F.array_max(F.array(*scores))
    return F.when(best.getField("hits") > 0, best.getField("lang")).otherwise(F.lit("und"))


def fingerprint(col: Column | str) -> Column:
    """Deterministic document fingerprint: md5 of the normalized text.

    Normalization = lowercase, collapse whitespace/punct runs to single
    space, trim — so trivial formatting edits map to the same fingerprint
    (cheap near-dup canary; exact-dup key).

    The [a-z0-9] normalizer maps non-Latin text to '': those docs
    fingerprint on their RAW text instead. Delegates to the ONE shared
    definition (operators.dedup.fingerprint_expr) so this function and
    exact_dedup can never silently disagree.
    """
    from hannigan_conjunctisviribus_ploscompbio_2017_spark.operators.dedup import fingerprint_expr

    return fingerprint_expr(col)


def reject_reasons(
    text_col: Column | str,
    lang_col: Column | str,
    min_tokens: int = 10,
    max_tokens: int = 10_000,
    min_quality: float = 0.3,
    allowed_langs: list[str] | None = None,
) -> Column:
    """Comma-joined rejection reasons for the corpus quality filter
    (C4/Gopher-style rule routing): empty string = keep. One Catalyst
    expression — the whole filter step is a single codegen'd scan, and
    the reasons column routes rejects to a quarantine sink (P10 label
    routing at corpus scale) instead of silently dropping them."""
    t = F.col(text_col) if isinstance(text_col, str) else text_col
    lang = F.col(lang_col) if isinstance(lang_col, str) else lang_col
    n_tok = token_count(t)
    q = quality_score(t)
    checks = [
        (t.isNull() | (F.length(F.trim(t)) == 0), "empty"),
        (n_tok < min_tokens, "too_short"),
        (n_tok > max_tokens, "too_long"),
        (q < min_quality, "low_quality"),
    ]
    if allowed_langs is not None:
        arr = F.array(*[F.lit(code) for code in sorted(allowed_langs)])
        # NULL lang must REJECT: ~array_contains(arr, NULL) is NULL,
        # which when() treats as false — an unverified language would
        # slip through the gate
        checks.append((lang.isNull() | ~F.array_contains(arr, lang), "lang"))
    reasons = F.array_compact(
        F.array(*[F.when(cond, F.lit(label)) for cond, label in checks])
    )
    return F.concat_ws(",", reasons)
