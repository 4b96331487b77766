"""Pinned tokenizer — the single normalization rule for oracle and Spark.

Mirrors oscar's normalization semantics adapted to web text:
- unicode lowercase (reference/oscar-create/TextSearchTraits.h:78
  `unicode_to_lower`)
- diacritic transliteration via NFKD + combining-mark strip
  (reference/oscar-create/TextSearchTraits.h:72-74,81-84 DiacriticRemover)
- split on non-alphanumeric, min token length 2
  (reference/oscar-create/OsmKeyValueObjectStore.cpp:56-72 inflateValues)

Two entry points:
- tokenize(text)          — pure Python, used by the oracle engine
- tokenize_series(series) — vectorized pandas, used inside Spark UDFs

Both MUST produce identical token sequences for identical input; this is
tested (tests/test_tokenize.py) with hypothesis.
"""

from __future__ import annotations

import re
import unicodedata

import pandas as pd

from oscar_spark.config import MIN_TOKEN_LEN, TOKEN_SPLIT_RE

_SPLIT = re.compile(TOKEN_SPLIT_RE)
_COMBINING = re.compile("[\\u0300-\\u036f]")


def _strip_diacritics(text: str) -> str:
    return _COMBINING.sub("", unicodedata.normalize("NFKD", text))


def normalize(text: str) -> str:
    """lower + NFKD diacritic strip; applied before splitting."""
    return _strip_diacritics(text.lower())


def tokenize(text: str) -> list[str]:
    """Token sequence (with duplicates, in order) of a document/query."""
    if not text:
        return []
    return [t for t in _SPLIT.split(normalize(text)) if len(t) >= MIN_TOKEN_LEN]


# split-on-non-alnum + drop tokens shorter than MIN_TOKEN_LEN is exactly
# "find alnum runs of length ≥ MIN_TOKEN_LEN": one findall replaces
# split + a per-row Python filter (hypothesis-tested equivalent)
_TOKEN_RE = f"[a-z0-9]{{{MIN_TOKEN_LEN},}}"


def tokenize_series(texts: pd.Series) -> pd.Series:
    """Vectorized: Series[str] → Series[list[str]] (same rule as tokenize)."""
    norm = texts.fillna("").str.lower()
    # NFKD + combining-strip is the identity on pure-ASCII text (the vast
    # majority of lowered web text) — normalize only the non-ASCII rows
    non_ascii = ~norm.map(str.isascii)
    if non_ascii.any():
        fixed = (norm[non_ascii]
                 .str.normalize("NFKD")
                 .str.replace(_COMBINING, "", regex=True))
        norm = norm.copy()
        norm[non_ascii] = fixed
    return norm.str.findall(_TOKEN_RE)
