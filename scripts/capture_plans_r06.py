"""Capture .explain('formatted') for every declared query → plans/r06/.

Usage: python scripts/capture_plans_r06.py before|after [sf_dir] [only...]

No execution — plan compilation only (fast).  The optimization judge
checks plan claims in OPTIMIZATION_r06.md against these files.
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf1.0"
    only = set(sys.argv[3:])
    out_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "plans", "r06")
    os.makedirs(out_dir, exist_ok=True)

    from oscar_spark.session import get_spark
    spark = get_spark(app="plan-capture", cores=8, shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entrymod
    qs = entrymod.queries()
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            df = fn(spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted")
        except Exception as e:  # capture failures loudly, don't die
            plan = f"ERROR capturing plan: {e!r}"
        with open(os.path.join(out_dir, f"{name}_{tag}.txt"), "w") as f:
            f.write(plan)
        print(f"captured {name}_{tag}", file=sys.stderr)
    spark.stop()


if __name__ == "__main__":
    main()
