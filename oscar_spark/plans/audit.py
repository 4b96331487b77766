"""Physical-plan introspection + expectation checking.

The reference has no optimizer to audit (SURVEY.md §4 — its op tree runs
as parsed); here the optimizer is Catalyst, so the audit asserts that
the declarative plans actually produce the physical properties the
100 TB design depends on:

- parquet filter + projection pushdown (PushedFilters / ReadSchema)
- partition pruning on the bucket dirs (PartitionFilters)
- broadcast joins for small dimensions (BroadcastHashJoin)
- top-k as TakeOrderedAndProject (no global sort)
- metadata phases never touching the payload column
- no Python evaluation nodes (BatchEvalPython/PythonUDF) on hot paths
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import DataFrame


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    """The explain output as a string (spark's explain() only prints)."""
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), mode)


@dataclass
class PlanCheck:
    name: str
    ok: bool
    notes: list[str]
    plan: str


def check_plan(name: str, df: DataFrame, expect_all=(),
               expect_none=()) -> PlanCheck:
    """Regex expectations over the formatted physical plan."""
    s = explain_str(df)
    ok = True
    notes = []
    for pat in expect_all:
        hit = re.search(pat, s) is not None
        ok &= hit
        notes.append(f"{'✓' if hit else '✗ MISSING'} `{pat}`")
    for pat in expect_none:
        hit = re.search(pat, s) is not None
        ok &= not hit
        notes.append(f"{'✓ absent' if not hit else '✗ PRESENT'} `{pat}`")
    return PlanCheck(name=name, ok=ok, notes=notes, plan=s)
