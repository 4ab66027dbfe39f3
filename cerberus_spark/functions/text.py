"""Text analysis for large-scale training-data pipelines.

Language-ID (stopword-hit heuristic), quality scoring (length /
punctuation / stopword ratios), token counting (whitespace + a BPE-ish
regex), and document fingerprinting (normalized hash) — every operator
is a pure Catalyst ``Column`` expression (whole-stage codegen; zero
Python in the hot path), so they run at scan speed over 100 TB.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

# small, public, per-language stopword cores (enough for a heuristic)
STOPWORDS = {
    "en": ["the", "and", "of", "to", "a", "in", "is", "it", "that", "for",
           "was", "with", "on", "as", "are", "this", "but", "be", "have"],
    "de": ["der", "die", "das", "und", "ist", "ich", "nicht", "mit", "ein",
           "eine", "zu", "den", "von", "im", "für", "auf", "des", "sich"],
    "fr": ["le", "la", "les", "et", "de", "des", "un", "une", "est", "pas",
           "que", "qui", "dans", "pour", "sur", "avec", "au", "ce", "il"],
}

_WORD_RE = r"\s+"
#: BPE-ish token pattern: word pieces OR single non-space symbols
_BPE_RE = "[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]"


def words(text: Column) -> Column:
    """Lower-cased whitespace tokens (empty array for empty/null text)."""
    return F.filter(F.split(F.lower(F.coalesce(text, F.lit(""))), _WORD_RE),
                    lambda w: F.length(w) > 0)


def token_count(text: Column) -> Column:
    """Whitespace token count."""
    return F.size(words(text))


def bpe_token_count(text: Column) -> Column:
    """BPE-ish token estimate: alpha runs + digit runs + symbols."""
    return F.size(F.regexp_extract_all(F.coalesce(text, F.lit("")), F.lit(_BPE_RE), F.lit(0)))


def punct_ratio(text: Column) -> Column:
    t = F.coalesce(text, F.lit(""))
    punct = F.length(F.regexp_replace(t, "[^!-/:-@\\[-`{-~]", ""))
    return F.when(F.length(t) > 0, punct / F.length(t)).otherwise(F.lit(0.0))


def alpha_ratio(text: Column) -> Column:
    t = F.coalesce(text, F.lit(""))
    alpha = F.length(F.regexp_replace(t, "[^a-zA-Z]", ""))
    return F.when(F.length(t) > 0, alpha / F.length(t)).otherwise(F.lit(0.0))


def stopword_ratio(text: Column, lang: str = "en") -> Column:
    w = words(text)
    sw = F.array(*[F.lit(s) for s in STOPWORDS[lang]])
    hits = F.size(F.filter(w, lambda x: F.array_contains(sw, x)))
    return F.when(F.size(w) > 0, hits / F.size(w)).otherwise(F.lit(0.0))


def mean_word_length(text: Column) -> Column:
    w = words(text)
    total = F.aggregate(w, F.lit(0), lambda acc, x: acc + F.length(x))
    return F.when(F.size(w) > 0, total / F.size(w)).otherwise(F.lit(0.0))


def quality_score(text: Column) -> Column:
    """Composite [0,1] quality heuristic (C4/Gopher-style signals):
    reasonable length, alpha-dominated, some stopwords, sane word len."""
    n_tok = token_count(text)
    len_ok = F.when((n_tok >= 5) & (n_tok <= 5000), 1.0).otherwise(0.3)
    alpha = alpha_ratio(text)
    sw = stopword_ratio(text)
    mwl = mean_word_length(text)
    mwl_ok = F.when((mwl >= 2.0) & (mwl <= 12.0), 1.0).otherwise(0.3)
    punct = punct_ratio(text)
    return F.round(
        (len_ok * 0.25 + F.least(alpha * 1.25, F.lit(1.0)) * 0.25
         + F.least(sw * 4, F.lit(1.0)) * 0.25 + mwl_ok * 0.15
         + (1.0 - F.least(punct * 4, F.lit(1.0))) * 0.10),
        6,
    )


def lang_id(text: Column) -> Column:
    """Stopword-hit language heuristic over {en, de, fr}; 'und' (undetermined)
    when nothing matches."""
    w = words(text)
    scores = []
    for lang, sw_list in STOPWORDS.items():
        sw = F.array(*[F.lit(s) for s in sw_list])
        scores.append((lang, F.size(F.filter(w, lambda x: F.array_contains(sw, x)))))
    best = F.lit("und")
    best_score = F.lit(0)
    # deterministic priority en > de > fr on ties (strictly-greater update)
    for lang, score in scores:
        cond = score > best_score
        best = F.when(cond, F.lit(lang)).otherwise(best)
        best_score = F.when(cond, score).otherwise(best_score)
    return best


def normalized_text(text: Column) -> Column:
    """Dedup normalization: lower, collapse whitespace, strip."""
    return F.trim(F.regexp_replace(F.lower(F.coalesce(text, F.lit(""))), "\\s+", " "))


def fingerprint(text: Column) -> Column:
    """64-bit content fingerprint of the normalized text (exact-dup key)."""
    return F.xxhash64(normalized_text(text))
