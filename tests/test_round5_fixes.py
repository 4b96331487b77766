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
