"""Repetition / boilerplate signals per document — the Gopher-rules
family (Rae et al. 2021, table A1): duplicate-line fractions, most-
frequent-n-gram character fraction, and duplicated-n-gram character
coverage.  Together with functions/text.quality_score these are the
standard pre-training quality gate.

Exact spec (shared verbatim with the DuckDB oracle and the Python
fuzz reference — every fraction is ONE integer/integer division, so
both engines produce bit-identical doubles):

* Normalization: engine-wide (functions/text.words): lowercase,
  ASCII edge-strip; words = ASCII ``\\s+`` split; lines = split on
  ``\\n``, each line edge-stripped, empty lines dropped.
* ``dup_line_frac``   = (n_lines - n_distinct_lines) / n_lines.
* ``dup_line_char_frac`` = chars in repeat occurrences (every
  occurrence of a line beyond its first) / total line chars.
* ``top{n}gram_char_frac`` = cnt(g*) * len(g*) / len(' '.join(words))
  where g* is the most frequent word n-gram, ties broken by smallest
  gram (UTF-8 byte order — Python code-point and DuckDB binary
  collation agree).
* ``dup{n}gram_char_frac`` = chars of words covered by at least one
  n-gram that occurs more than once / total word chars.  Positional
  coverage — overlapping duplicate grams never double-count, so the
  fraction is bounded by 1 (the Gopher "taking care not to count
  characters twice" clause).
* Empty/short/null text: every denominator-zero fraction is 0.0; a
  text with fewer than n words has no n-gram.

Scale shape: a single Arrow-batched pandas UDF emitting one struct —
a stateless per-row projection that pipelines into the scan: no
shuffle, no driver state, and one Python pass however many signals
are requested.  A pure-Column formulation exists only for
``dup_line_frac`` (array_distinct); the frequency-map signals would
need explode + two shuffles per n — at 100 TB the UDF's Arrow batch
transfer is far cheaper than 2·|ns| corpus shuffles.
"""

from __future__ import annotations

import re
from collections import Counter
from collections.abc import Sequence

import pandas as pd
from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql import types as T

__all__ = ["repetition_signals_udf", "repetition_report"]

_WS_RE = re.compile(r"\s+", re.ASCII)
_EDGE_RE = re.compile(r"^\s+|\s+$", re.ASCII)


def _signals(t: str | None, top_ns: Sequence[int],
             dup_ns: Sequence[int]) -> tuple:
    t = (t or "").lower()
    lines = [ln for ln in (_EDGE_RE.sub("", x) for x in t.split("\n")) if ln]
    n_lines = len(lines)
    if n_lines:
        cnts = Counter(lines)
        dup_line_frac = (n_lines - len(cnts)) / n_lines
        total_chars = sum(len(ln) for ln in lines)
        rep_chars = sum((c - 1) * len(ln) for ln, c in cnts.items())
        dup_line_char_frac = rep_chars / total_chars if total_chars else 0.0
    else:
        dup_line_frac = dup_line_char_frac = 0.0

    ws = [w for w in _WS_RE.split(_EDGE_RE.sub("", t)) if w]
    nw = len(ws)
    wl = [len(w) for w in ws]
    word_chars = sum(wl)
    joined_len = word_chars + max(nw - 1, 0)
    out = [n_lines, dup_line_frac, dup_line_char_frac]

    # Grams are counted as WORD TUPLES (" ".join is injective on
    # whitespace-free words, so tuple equality == joined-string
    # equality); joined strings are only materialized where the spec
    # genuinely needs string semantics — the top-gram tie-break (byte
    # order of the joined gram, which differs from tuple order when a
    # word contains a control char < 0x20) and the gram length
    # (recovered arithmetically from word lengths).  Same integers in
    # every division, so the emitted doubles are bit-identical.
    for n in top_ns:
        if nw >= n and joined_len:
            grams = list(zip(*(ws[i:] for i in range(n))))
            cnts = Counter(grams)
            top = max(cnts.values())
            g = min(" ".join(gr) for gr, c in cnts.items() if c == top)
            out.append(top * len(g) / joined_len)
        else:
            out.append(0.0)

    for n in dup_ns:
        if nw >= n and word_chars:
            grams = list(zip(*(ws[i:] for i in range(n))))
            cnts = Counter(grams)
            covered = bytearray(nw)
            one = b"\x01" * n
            for i, g in enumerate(grams):
                if cnts[g] > 1:
                    covered[i:i + n] = one
            num = sum(l for l, c in zip(wl, covered) if c)
            out.append(num / word_chars)
        else:
            out.append(0.0)
    return tuple(out)


def _schema(top_ns: Sequence[int], dup_ns: Sequence[int]) -> T.StructType:
    fields = [T.StructField("n_lines", T.IntegerType()),
              T.StructField("dup_line_frac", T.DoubleType()),
              T.StructField("dup_line_char_frac", T.DoubleType())]
    fields += [T.StructField(f"top{n}gram_char_frac", T.DoubleType())
               for n in top_ns]
    fields += [T.StructField(f"dup{n}gram_char_frac", T.DoubleType())
               for n in dup_ns]
    return T.StructType(fields)


def repetition_signals_udf(top_ns: Sequence[int] = (2, 3, 4),
                           dup_ns: Sequence[int] = (5, 6, 7, 8, 9, 10)
                           ) -> Column:
    """Factory: Arrow-batched repetition-signal struct (spec above)."""
    top_ns, dup_ns = tuple(top_ns), tuple(dup_ns)
    schema = _schema(top_ns, dup_ns)
    names = [f.name for f in schema.fields]

    @F.pandas_udf(schema)
    def _rep(s: pd.Series) -> pd.DataFrame:
        rows = [_signals(t, top_ns, dup_ns) for t in s]
        return pd.DataFrame(rows, columns=names)

    return _rep


def repetition_report(df: DataFrame, id_col: str = "doc_id",
                      text_col: str = "text",
                      top_ns: Sequence[int] = (2, 3, 4),
                      dup_ns: Sequence[int] = (5, 6, 7, 8, 9, 10),
                      ) -> DataFrame:
    """Per-document repetition scorecard: (id_col, one column per
    signal).  Stateless projection — pipelines into the scan."""
    sig = repetition_signals_udf(top_ns, dup_ns)(F.col(text_col))
    return df.select(id_col, sig.alias("_s")).select(id_col, "_s.*")
