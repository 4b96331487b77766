"""Multi-executor smoke: build + serve through REAL executor JVMs.

local[N] runs every task inside the driver JVM — it cannot catch code
that accidentally depends on driver-local state (files written with
relative paths, driver-side caches consulted from tasks, closures that
don't serialize).  `local-cluster[W,C,M]` launches W separate worker
JVMs with C cores and M MB each on this machine: real serialization
boundaries, real executor-side Python workers, the same code path as
`spark-submit --master <cluster>` modulo the scheduler — the closest
the sandbox gets to the north rule's "multi-executor cluster", and the
deployment shape the reference's oscar-create runs as one NUMA process
(reference/oscar-create/oscarcreate.cpp main).

The package ships to executors the spark-submit way (--py-files
analog: a zip via addPyFile), NOT via an inherited PYTHONPATH — so an
import that only works because the driver sits in the repo dir fails
here.

Run: python scripts/multi_executor_smoke.py [n_pages]
Prints one JSON line; exit 1 on any mismatch.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def make_pkg_zip(tmp: str) -> str:
    zpath = os.path.join(tmp, "oscar_spark.zip")
    with zipfile.ZipFile(zpath, "w") as z:
        pkg = os.path.join(REPO, "oscar_spark")
        for root, _dirs, files in os.walk(pkg):
            if "__pycache__" in root:
                continue
            for f in files:
                if f.endswith(".py"):
                    p = os.path.join(root, f)
                    z.write(p, os.path.relpath(p, REPO))
    return zpath


def main() -> int:
    n_pages = int(sys.argv[1]) if len(sys.argv) > 1 else 2000
    from pyspark.sql import SparkSession

    tmp = tempfile.mkdtemp(prefix="mx_smoke_")
    try:
        spark = (
            SparkSession.builder
            .master("local-cluster[2,2,2048]")
            .appName("oscar-multi-executor-smoke")
            .config("spark.sql.shuffle.partitions", "8")
            .config("spark.sql.session.timeZone", "UTC")
            .config("spark.sql.execution.arrow.pyspark.enabled", "true")
            .config("spark.sql.adaptive.enabled", "true")
            .config("spark.ui.enabled", "false")
            .config("spark.driver.memory", "2g")
            .getOrCreate())
        spark.sparkContext.setLogLevel("ERROR")
        spark.sparkContext.addPyFile(make_pkg_zip(tmp))

        from oscar_spark.build.indexer import build_index
        from oscar_spark.fixtures.pages import generate_pages, pages_spark_df
        from oscar_spark.oracle.engine import OracleIndex
        from oscar_spark.serve.executor import SearchEngine

        idx = os.path.join(tmp, "index")
        t0 = time.time()
        res = build_index(spark, pages_spark_df(spark, n_pages), idx,
                          positions=True)
        build_s = round(time.time() - t0, 2)

        execs = spark.sparkContext._jsc.sc().statusTracker() \
            .getExecutorInfos()
        n_exec = len(execs)  # W workers + the driver row

        ds = {r["url"]: r["doc_id"] for r in
              spark.read.parquet(os.path.join(idx, "doc_stats")).collect()}
        pdf = generate_pages(n_pages)
        oracle = OracleIndex(
            [(int(ds[u]), t) for u, t in zip(pdf["url"], pdf["text"])])
        eng = SearchEngine(spark, idx)
        queries = ["the", "city + state", "war - history",
                   '"north south"', "wd00* + time", "((", "of and to"]
        mismatches = []
        for q in queries:
            # mode="brute" pins the DISTRIBUTED scoring path — the
            # driver-local fast path (mode="local"/auto on small
            # candidate sets) would bypass the executor boundary
            # under test
            got = eng.search(q, k=10, mode="brute")
            want = oracle.search(q, k=10)
            if [(d, round(s, 4)) for d, s in got] != \
               [(d, round(s, 4)) for d, s in want]:
                mismatches.append(q)
        out = {"n_pages": res.n_docs, "build_sec": build_s,
               "docs_per_sec": round(res.docs_per_sec, 1),
               "executors_incl_driver": n_exec,
               "queries": len(queries), "mismatches": mismatches,
               "ok": n_exec >= 3 and not mismatches}
        print(json.dumps(out))
        spark.stop()
        return 0 if out["ok"] else 1
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    sys.exit(main())
