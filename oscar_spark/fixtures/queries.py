"""Deterministic reference query set (FIXTURES.md §3.1).

Generated from the indexed corpus itself, analogous to the reference's
randomized workload creator (sample random items' strings, lowercase,
escape — reference/oscar-cmd/CompletionStringCreators.cpp:17-46), but
stratified by document frequency so every engine path is exercised:
head terms (salted build path), mid terms, df=1 rares (single-block),
plus every set operator and quoted-exact queries.
"""

from __future__ import annotations

import numpy as np

from oscar_spark.oracle.engine import OracleIndex

QUERY_SEED = 7


def reference_queries(oracle: OracleIndex, n_single: int = 40,
                      n_and: int = 30, n_or: int = 10, n_not: int = 10,
                      n_xor: int = 5, n_quoted: int = 5) -> list[str]:
    rng = np.random.RandomState(QUERY_SEED)
    by_df = sorted(oracle.postings, key=lambda t: (-oracle.df(t), t))
    n_terms = len(by_df)
    head = by_df[:max(5, n_terms // 50)]
    mid = by_df[n_terms // 10: n_terms // 2] or by_df
    rare = [t for t in by_df if oracle.df(t) == 1] or by_df[-10:]

    def pick(pool, k):
        pool = list(pool)
        idx = rng.randint(0, len(pool), size=k)
        return [pool[i] for i in idx]

    queries: list[str] = []
    queries += pick(mid, n_single - n_single // 4 - n_single // 4)
    queries += pick(head, n_single // 4)
    queries += pick(rare, n_single // 4)
    for a, b in zip(pick(mid + head, n_and), pick(mid, n_and)):
        queries.append(f"{a} {b}")
    for a, b in zip(pick(mid, n_or), pick(rare, n_or)):
        queries.append(f"{a} + {b}")
    for a, b in zip(pick(head, n_not), pick(mid, n_not)):
        queries.append(f"{a} - {b}")
    for a, b in zip(pick(mid, n_xor), pick(mid, n_xor)):
        queries.append(f"{a} ^ {b}")
    for a, b in zip(pick(mid, n_quoted), pick(mid, n_quoted)):
        queries.append(f'"{a} {b}"')
    return queries
