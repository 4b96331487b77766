"""Pinned HTML→text extractor (byte-identical per url, BASELINE.json input_hint).

Pure-deterministic regex pipeline — no bs4/lxml (version drift would break
byte-identity, SURVEY.md §7 hard-part #3), no locale dependence.  Handles
invalid UTF-8 (errors="replace", mirroring the UTF-8 validation concern at
reference/oscar-cmd/ConsistencyCheckers.cpp:259) and unclosed tags.

Pipeline (order is part of the contract):
 1. decode UTF-8 with U+FFFD replacement
 2. drop <script>/<style>/<!-- --> blocks (case-insensitive, dotall;
    an unterminated block swallows to end of input)
 3. replace every tag <...> with a single space; an unterminated
    trailing "<..." is dropped to end of input
 4. decode the pinned entity set (&amp; &lt; &gt; &quot; &#39; &apos; &nbsp;)
 5. collapse all whitespace runs to one space, strip ends
"""

from __future__ import annotations

import re

import pandas as pd

_BLOCKS = re.compile(
    r"<script\b.*?(?:</script\s*>|\Z)|<style\b.*?(?:</style\s*>|\Z)|<!--.*?(?:-->|\Z)",
    re.IGNORECASE | re.DOTALL,
)
_TAG = re.compile(r"<[^>]*(?:>|\Z)", re.DOTALL)
_WS = re.compile(r"\s+")
_ENTITIES = [
    ("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'),
    ("&#39;", "'"), ("&apos;", "'"), ("&nbsp;", " "), ("&amp;", "&"),
]


def extract_text(html: bytes | None) -> str:
    """bytes of an HTML page → extracted plain text (the pinned rule)."""
    if html is None:
        return ""
    s = html.decode("utf-8", errors="replace")
    s = _BLOCKS.sub(" ", s)
    s = _TAG.sub(" ", s)
    for ent, ch in _ENTITIES:
        s = s.replace(ent, ch)
    return _WS.sub(" ", s).strip()


def extract_series(htmls: pd.Series) -> pd.Series:
    """Vectorized pandas version — identical output to extract_text per row."""
    s = htmls.map(lambda b: b.decode("utf-8", errors="replace") if b is not None else "")
    s = s.str.replace(_BLOCKS, " ", regex=True)
    s = s.str.replace(_TAG, " ", regex=True)
    for ent, ch in _ENTITIES:
        s = s.str.replace(ent, ch, regex=False)
    return s.str.replace(_WS, " ", regex=True).str.strip()
