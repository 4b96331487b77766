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


def tokenize_series(texts: pd.Series) -> pd.Series:
    """Vectorized: Series[str] → Series[list[str]] (same rule as tokenize)."""
    norm = (
        texts.fillna("")
        .str.lower()
        .str.normalize("NFKD")
        .str.replace(_COMBINING, "", regex=True)
    )
    return norm.str.split(TOKEN_SPLIT_RE, regex=True).map(
        lambda toks: [t for t in toks if len(t) >= MIN_TOKEN_LEN]
    )
