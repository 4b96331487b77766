"""Measure the build's core-count-independent FIXED cost.

At a tiny input (default 1,000 pages) the parallel work is ~0, so a
warm build's wall time IS the fixed overhead the scaling model solved
for (~18 s at r4: job launches, stage barriers, commit/manifest,
driver-side planning).  Run before/after any fixed-cost change; the
per-build Spark job count (via job groups) attributes it.

Usage: python scripts/fixed_cost_probe.py [--pages 1000] [--cores 8]
       [--reps 3]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pages", type=int, default=1000)
    ap.add_argument("--cores", type=int, default=8)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    from oscar_spark.build.indexer import build_index, prewarm_workers
    from oscar_spark.fixtures.pages import pages_spark_df_dist
    from oscar_spark.session import get_spark

    spark = get_spark(app="fixed-cost-probe", cores=args.cores,
                      shuffle_partitions=max(args.cores * 2, 8))
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext

    with tempfile.TemporaryDirectory(
            dir="/dev/shm" if os.path.isdir("/dev/shm") else None) as tmp:
        pages_path = os.path.join(tmp, "pages")
        pages_spark_df_dist(spark, args.pages,
                            chunk=max(args.pages // 8, 125)) \
            .write.mode("overwrite").parquet(pages_path)
        pages = spark.read.parquet(pages_path)
        pages.count()
        prewarm_workers(spark)
        # one untimed warmup so JIT/codegen is out of the measurement
        build_index(spark, pages, os.path.join(tmp, "warm"))

        runs = []
        for i in range(args.reps):
            sc.setJobGroup(f"probe{i}", f"fixed-cost probe rep {i}")
            t0 = time.time()
            res = build_index(spark, pages, os.path.join(tmp, f"idx{i}"))
            wall = time.time() - t0
            sc.setJobGroup(None, None)
            jobs = sc.statusTracker().getJobIdsForGroup(f"probe{i}")
            runs.append({"wall_sec": round(wall, 2),
                         "n_jobs": len(jobs),
                         "stage_secs": res.stage_secs})
            print(f"rep {i}: {wall:.2f}s, {len(jobs)} jobs, "
                  f"stages {res.stage_secs}", file=sys.stderr)
        best = min(runs, key=lambda r: r["wall_sec"])
        print(json.dumps({"pages": args.pages, "cores": args.cores,
                          "fixed_cost_sec": best["wall_sec"],
                          "n_jobs": best["n_jobs"],
                          "stage_secs": best["stage_secs"],
                          "all": runs}))
    spark.stop()


if __name__ == "__main__":
    main()
