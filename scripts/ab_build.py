"""A/B one pinned single-leg build: compare stage timings of two repo
checkouts on identical parquet input.

Usage: taskset -c 0-7 python scripts/ab_build.py --repo <path> \
           --pages <parquet> --cores 8
Prints the build's stage_secs JSON (same shape as cli.py build).
Run it once per checkout (fresh process per run — fresh JVM) with the
SAME --pages input to separate code effects from machine noise.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--repo", required=True)
    ap.add_argument("--pages", required=True)
    ap.add_argument("--cores", type=int, default=8)
    ap.add_argument("--attempts", type=int, default=1)
    args = ap.parse_args()

    sys.path.insert(0, args.repo)
    from oscar_spark.build.indexer import build_index
    from oscar_spark.session import get_spark

    os.environ.setdefault("SPARK_DRIVER_MEM", f"{4 + 2 * args.cores}g")
    spark = get_spark(app="ab", cores=args.cores,
                      shuffle_partitions=max(args.cores * 2, 8))
    spark.sparkContext.setLogLevel("ERROR")
    pages = spark.read.parquet(args.pages)
    pages.count()
    # pre-warm Python UDF workers (same as bench_scaling child legs)
    (spark.range(args.cores * 4, numPartitions=args.cores * 4)
     .mapInPandas(lambda it: (pdf for pdf in it), "id long").count())
    best = None
    for i in range(args.attempts):
        with tempfile.TemporaryDirectory(dir="/dev/shm") as d:
            t0 = time.time()
            res = build_index(spark, pages, os.path.join(d, "idx"))
            wall = time.time() - t0
        if best is None or wall < best[0]:
            best = (wall, res)
    wall, res = best
    print(json.dumps({"repo": args.repo, "cores": args.cores,
                      "wall": round(wall, 2),
                      "docs_per_sec": round(res.n_docs / wall, 1),
                      "stages": res.stage_secs}))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
