"""Text analysis for large-scale training-data pipelines.

Language-ID (stopword-hit heuristic), quality scoring (length /
punctuation / stopword ratios), token counting (whitespace + a BPE-ish
regex), and document fingerprinting (normalized hash) — every operator
is a pure Catalyst ``Column`` expression.

Whole-stage-codegen note: no expression here uses a higher-order
function (``filter``/``transform``/``aggregate`` lambdas are
CodegenFallback — one in a projection interprets its entire child
subtree per row, measured 25-30× slower on the validation path and ~6×
on token stats).  Token counts come from ``split`` on pre-trimmed
input, stopword hits from ``regexp_count`` with lookaround word
boundaries, and mean word length from whitespace-collapsed string
arithmetic — all mathematically identical to the token-array
formulations they replace (the DuckDB oracles in __spark_entry__.py
pin the values).
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


def _lower_trimmed(text: Column) -> Column:
    # F.trim strips only ASCII spaces; a leading tab/newline would
    # survive and make split() emit an empty '' token, diverging from
    # the DuckDB oracle spec (len(x) > 0 filter) and from the SimHash
    # pandas UDF (Python str.strip) — regexp-strip ALL edge whitespace
    return F.regexp_replace(
        F.lower(F.coalesce(text, F.lit(""))), r"^\s+|\s+$", ""
    )


def words(text: Column) -> Column:
    """Lower-cased whitespace tokens (empty array for empty/null text).

    Kept for callers that genuinely need the token array (shingles);
    counting/ratio operators below deliberately avoid materializing it.
    Splitting on the TRIMMED input yields no empty tokens, so no
    CodegenFallback ``filter`` lambda is needed."""
    t = _lower_trimmed(text)
    return F.when(F.length(t) > 0, F.split(t, _WORD_RE)).otherwise(
        F.array().cast("array<string>")
    )


def token_count(text: Column) -> Column:
    """Whitespace token count (no token array materialized)."""
    t = _lower_trimmed(text)
    return F.when(F.length(t) > 0, F.size(F.split(t, _WORD_RE))).otherwise(F.lit(0))


def bpe_token_count(text: Column) -> Column:
    """BPE-ish token estimate: alpha runs + digit runs + symbols.
    ``regexp_count`` counts matches without materializing the match
    array that ``regexp_extract_all`` would build per row."""
    return F.regexp_count(F.coalesce(text, F.lit("")), F.lit(_BPE_RE))


def punct_ratio(text: Column) -> Column:
    t = F.coalesce(text, F.lit(""))
    punct = F.length(F.regexp_replace(t, "[^!-/:-@\\[-`{-~]", ""))
    return F.when(F.length(t) > 0, punct / F.length(t)).otherwise(F.lit(0.0))


def alpha_ratio(text: Column) -> Column:
    t = F.coalesce(text, F.lit(""))
    alpha = F.length(F.regexp_replace(t, "[^a-zA-Z]", ""))
    return F.when(F.length(t) > 0, alpha / F.length(t)).otherwise(F.lit(0.0))


def _stopword_pattern(lang: str) -> str:
    """Word-bounded alternation: a whitespace token equals a stopword
    iff the stopword occurs bounded by whitespace/string edges, so
    counting these matches ≡ counting matching tokens (incl. repeats).
    Lookarounds are zero-width — adjacent hits all count."""
    alt = "|".join(STOPWORDS[lang])
    return r"(?:^|(?<=\s))(?:" + alt + r")(?=\s|$)"


def stopword_hits(text: Column, lang: str = "en") -> Column:
    return F.regexp_count(F.lower(F.coalesce(text, F.lit(""))),
                          F.lit(_stopword_pattern(lang)))


def stopword_ratio(text: Column, lang: str = "en") -> Column:
    n = token_count(text)
    return F.when(n > 0, stopword_hits(text, lang) / n).otherwise(F.lit(0.0))


def mean_word_length(text: Column) -> Column:
    """sum(len(token))/n(token) without the token array: collapse
    whitespace runs to single spaces, then total token chars =
    length(collapsed) - (n_tokens - 1) separator spaces."""
    collapsed = F.regexp_replace(_lower_trimmed(text), _WORD_RE, " ")
    n = token_count(text)
    return F.when(n > 0, (F.length(collapsed) - n + 1) / n).otherwise(F.lit(0.0))


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
    """Stopword-hit language heuristic over {en, de, fr}; 'und'
    (undetermined) when nothing matches.  One regexp_count per language
    (pattern compiled once per task) — no token array, no HOF."""
    lowered = F.lower(F.coalesce(text, F.lit("")))
    scores = [
        (lang, F.regexp_count(lowered, F.lit(_stopword_pattern(lang))))
        for lang in STOPWORDS
    ]
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


def conversation_text(df, conv_col: str = "conv_id", text_col: str = "text",
                      order_cols: tuple = ("turn_idx",), sep: str = " "):
    """Reconstruct one text per conversation: turns concatenated in a
    DETERMINISTIC total order (conversation-level dedup / fingerprinting
    needs byte-stable assembly — shingles cross turn boundaries, so the
    join order is part of the content).

    ``order_cols`` must be a total order within a conversation (add
    tie-break columns for dirty data with duplicate turn_idx).  NULL
    texts contribute an empty string, exactly like SQL
    ``string_agg(coalesce(text,''), sep ORDER BY ...)``.

    One hash aggregate on ``conv_col`` (map-side partial collect), then
    a per-group ``array_sort`` over (order key, text) structs —
    JVM-side, no window, no Python.  Returns (conv_col, text).
    """
    key = F.struct(*[F.col(c) for c in order_cols],
                   F.coalesce(F.col(text_col), F.lit("")).alias("_t"))
    return (
        df.groupBy(conv_col)
        .agg(F.array_sort(F.collect_list(key)).alias("_turns"))
        .select(
            conv_col,
            F.array_join(F.transform(F.col("_turns"), lambda s: s["_t"]),
                         sep).alias(text_col),
        )
    )
