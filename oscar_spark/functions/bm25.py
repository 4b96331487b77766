"""Pinned BM25 — ONE canonical expression order for oracle, numpy kernel,
Spark SQL and the DuckDB oracle SQL (SURVEY.md §7 hard-part #1).

idf is the Lucene variant: ln(1 + (N - df + 0.5) / (df + 0.5)), always > 0.

The reference engine has no dynamic scorer (rank = build-time static-score
docID order, reference/oscar-create/OsmKeyValueObjectStore.cpp:1339-1399);
BM25 with pinned k1/b is mandated by BASELINE.json north_rule as its
replacement, and the pure-Python oracle here is the rank-identity target.
"""

from __future__ import annotations

import math

import numpy as np

from oscar_spark.config import BM25_B, BM25_K1


def idf(df: float, n_docs: float) -> float:
    return math.log(1.0 + (n_docs - df + 0.5) / (df + 0.5))


def bm25(tf: float, dl: float, df: float, n_docs: float, avgdl: float) -> float:
    """Scalar BM25 contribution of one term in one doc."""
    return idf(df, n_docs) * (
        tf * (BM25_K1 + 1.0)
        / (tf + BM25_K1 * (1.0 - BM25_B + BM25_B * dl / avgdl))
    )


def bm25_np(tf: np.ndarray, dl: np.ndarray, df: np.ndarray,
            n_docs: float, avgdl: float) -> np.ndarray:
    """Vectorized BM25 — same expression order as bm25()."""
    idf_v = np.log(1.0 + (n_docs - df + 0.5) / (df + 0.5))
    return idf_v * (
        tf * (BM25_K1 + 1.0)
        / (tf + BM25_K1 * (1.0 - BM25_B + BM25_B * dl / avgdl))
    )


def bm25_sql(tf: str, dl: str, df: str, n: str, avgdl: str) -> str:
    """The same formula as a SQL expression string (Spark SQL ∩ DuckDB).

    Used to generate BOTH sides of the driver's oracle comparison so the
    arithmetic is literally the same text.  Every operand is CAST to
    DOUBLE because Spark SQL (and DuckDB) parse fractional literals as
    DECIMAL, which silently degrades precision below rank-identity.
    """
    def d(x: str) -> str:
        return f"CAST({x} AS DOUBLE)"
    tf, dl, df, n, avgdl = d(tf), d(dl), d(df), d(n), d(avgdl)
    k1, b = d(repr(BM25_K1)), d(repr(BM25_B))
    return (
        f"ln(1.0 + ({n} - {df} + 0.5) / ({df} + 0.5)) * "
        f"({tf} * ({k1} + 1.0) / "
        f"({tf} + {k1} * (1.0 - {b} + {b} * {dl} / {avgdl})))"
    )
