"""Round-5 fixes, pinned by tests.

1. Driver-contract key-set self-check (round-4 verdict #2): the r04
   driver sweep silently dropped rel_sessionize (50 rows for 51
   registered queries) and nothing in-repo noticed.  These tests make
   the contract shape itself loudly checkable without Spark.
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entrymod  # noqa: E402


class TestDriverContractKeys:
    def test_every_oracle_has_a_query(self):
        qs, oracles = entrymod.queries(), entrymod.oracle_sql()
        orphans = set(oracles) - set(qs)
        assert not orphans, (
            f"oracle_sql() keys with no queries() entry: {sorted(orphans)}"
        )

    def test_every_query_is_callable_and_every_oracle_nonempty(self):
        qs, oracles = entrymod.queries(), entrymod.oracle_sql()
        assert all(callable(f) for f in qs.values())
        bad = [k for k, v in oracles.items()
               if not isinstance(v, str) or not v.strip()]
        assert not bad, f"empty/non-string oracle SQL for: {bad}"

    def test_rows_only_queries_are_the_known_set(self):
        """Queries WITHOUT a value oracle get only the driver's weaker
        rows-only check; that set must stay deliberate, not drift.
        (Currently every registered query is value-oracled.)"""
        qs, oracles = entrymod.queries(), entrymod.oracle_sql()
        rows_only = sorted(set(qs) - set(oracles))
        assert rows_only == [], (
            f"queries missing a value oracle: {rows_only} — add an "
            "oracle_sql() entry or extend this pinned allowlist "
            "with a comment explaining why SQL can't express it"
        )

    def test_newest_correctness_rows_map_to_registered_queries(self):
        """Every row in the newest driver CORRECTNESS file must name a
        currently-registered query (stale rows mean a query was renamed
        or dropped without cleanup).  The inverse direction — registered
        queries absent from the file — is reported by
        scripts/verify_driver_contract.py as a NOTE because new queries
        legitimately have no row until the next driver round."""
        import glob
        import json
        files = sorted(glob.glob("/root/repo/CORRECTNESS_r*.json"))
        if not files:
            return
        with open(files[-1]) as f:
            rows = json.load(f)
        qs = entrymod.queries()
        stale = sorted(set(rows) - set(qs))
        assert not stale, (
            f"CORRECTNESS rows for unregistered queries: {stale}"
        )


# ---- substring expansion under the driver-side preload: gram-list
# intersection, not a linear `stem in t` scan over the dictionary
# (round-4 verdict #3, mirroring the suffix bisect fix of round 4) ----

class _CountingList(list):
    def __init__(self, it):
        super().__init__(it)
        self.accesses = 0

    def __getitem__(self, i):
        self.accesses += 1
        return super().__getitem__(i)


def test_substr_preload_grams_identical(spark, built_index):
    from oscar_spark.config import MAX_PREFIX_EXPAND
    from oscar_spark.serve.executor import SearchEngine
    d, _ = built_index
    eng = SearchEngine(spark, d)
    assert eng._term_sorted is not None, "preload expected at test scale"
    for stem in ("or", "ry", "he", "42", "ord", "ist", "zzzz", "a",
                 "wd00", "tor"):
        brute = sorted(t for t in eng._term_sorted
                       if stem in t)[:MAX_PREFIX_EXPAND]
        assert eng.expand_wild("substr", stem) == brute, stem


def test_substr_preload_no_full_scan(spark, built_index):
    from oscar_spark.serve.executor import SearchEngine
    d, _ = built_index
    eng = SearchEngine(spark, d)
    assert eng._term_sorted is not None
    # force a fresh gram build against an instrumented dictionary: the
    # gram build iterates (no __getitem__); the query itself must only
    # index the candidate entries, nowhere near the dictionary size
    eng._term_sorted = _CountingList(eng._term_sorted)
    eng._term_grams = None
    got = eng.expand_wild("substr", "ord")
    n_terms = len(eng._term_sorted)
    # every candidate term is read twice (verify + yield); allow slack
    assert eng._term_sorted.accesses <= 4 * max(len(got), 1) + 8
    assert eng._term_sorted.accesses < n_terms // 4
    # absent gram short-circuits without touching the dictionary
    eng._term_sorted.accesses = 0
    assert eng.expand_wild("substr", "q#z") == []
    assert eng._term_sorted.accesses == 0


# ---- engine cold-start cache: the ≤2M-row terms preload is paid once
# per store snapshot, not once per SearchEngine instance (round-4
# verdict #6) ----

def test_engine_preload_cached_across_instances(spark, built_index):
    from oscar_spark.serve import executor as ex
    d, _ = built_index
    e1 = ex.SearchEngine(spark, d)
    e2 = ex.SearchEngine(spark, d)
    # same dict objects, not equal copies — the collect ran once
    assert e1._term_df is e2._term_df
    assert e1._term_sorted is e2._term_sorted
    # lazy mirrors built by one instance are visible to the next
    e1.expand_wild("suffix", "ory")
    e1.expand_wild("substr", "ord")
    e3 = ex.SearchEngine(spark, d)
    assert e3._term_sorted_rev is e1._term_sorted_rev
    assert e3._term_grams is e1._term_grams
    # results stay identical through the cache
    assert e3.search("the", k=5) == e1.search("the", k=5)


def test_engine_preload_cache_invalidated_by_commit(spark, tmp_path):
    """A new commit to the same path must NOT serve the old preload."""
    from oscar_spark.build.indexer import build_index
    from oscar_spark.fixtures.pages import pages_spark_df
    from oscar_spark.serve.executor import SearchEngine
    d = str(tmp_path / "idx")
    build_index(spark, pages_spark_df(spark, 60), d)
    e1 = SearchEngine(spark, d)
    n1 = len(e1._term_df)
    build_index(spark, pages_spark_df(spark, 120), d)
    e2 = SearchEngine(spark, d)
    assert e2._term_df is not e1._term_df
    assert len(e2._term_df) >= n1
