"""spark-submit driver program for the oscar_spark build+serve smoke.

This file is the PRIMARY RESOURCE of a real `spark-submit` invocation
(see scripts/spark_submit_smoke.py for the launcher):

    spark-submit --master local-cluster[2,2,2048] \
        --py-files oscar_spark.zip scripts/submit_job.py \
        <n_pages> <index_dir> <out_json>

It deliberately contains NO sys.path setup: `oscar_spark` must import
from the --py-files zip on the driver AND reach the executor Python
workers the same way, exactly as the north rule's "run via
spark-submit --py-files on a multi-executor cluster" deployment would
on a real cluster.  The launcher verifies the printed results
rank-identical against the pure-Python OracleIndex from OUTSIDE this
process, so a packaging bug here cannot mask itself.

The job: generate the deterministic pages fixture, build a positional
index, serve a 7-query battery through the distributed scoring path
(mode="brute" — the driver-local fast path would bypass the executor
boundary under test), and dump one JSON result file.
"""

from __future__ import annotations

import json
import sys
import time


QUERIES = ["the", "city + state", "war - history",
           '"north south"', "wd00* + time", "((", "of and to"]


def main() -> int:
    n_pages, index_dir, out_json = \
        int(sys.argv[1]), sys.argv[2], sys.argv[3]
    from pyspark.sql import SparkSession
    # master/conf come from the spark-submit command line — setting
    # them here would defeat the deployment test
    spark = SparkSession.builder.appName("oscar-spark-submit-smoke") \
        .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    from oscar_spark.build.indexer import build_index
    from oscar_spark.fixtures.pages import pages_spark_df
    from oscar_spark.serve.executor import SearchEngine

    t0 = time.time()
    res = build_index(spark, pages_spark_df(spark, n_pages), index_dir,
                      positions=True)
    build_s = round(time.time() - t0, 2)

    eng = SearchEngine(spark, index_dir)
    results = {q: [(int(d), float(s))
                   for d, s in eng.search(q, k=10, mode="brute")]
               for q in QUERIES}
    n_exec = len(spark.sparkContext._jsc.sc().statusTracker()
                 .getExecutorInfos())  # W workers + the driver row
    master = spark.sparkContext.master

    with open(out_json, "w") as f:
        json.dump({"n_docs": res.n_docs, "build_sec": build_s,
                   "docs_per_sec": round(res.docs_per_sec, 1),
                   "executors_incl_driver": n_exec,
                   "master": master,
                   "results": results}, f)
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
