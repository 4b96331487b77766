"""Plan-audit helpers: assert physical-plan properties the engine relies
on at scale (pushdown, broadcast, metadata-only scans, no Python nodes).
Used by scripts/plan_check.py → PLANS.md."""
