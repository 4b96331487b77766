"""Launch the REAL `spark-submit --py-files` deployment and verify it.

multi_executor_smoke.py already proves the engine runs across separate
executor JVMs with the package shipped via addPyFile; this script
closes the remaining letter of the north rule — "run via spark-submit
--py-files on a multi-executor cluster" — by invoking the actual
spark-submit binary:

    spark-submit --master local-cluster[2,2,2048] \
        --py-files <zip of oscar_spark, built here> \
        scripts/submit_job.py <n_pages> <index_dir> <out_json>

Trust boundary: the submitted job (scripts/submit_job.py) only
PRODUCES results; THIS process — plain python, no Spark — recomputes
the expected top-k with the pure-Python OracleIndex (doc ids mapped
from the index's own doc_stats parquet) and asserts rank-identity
(ids + scores to 4 decimals) per query.  A packaging or serialization
bug in the submitted job therefore cannot verify itself green.

Run: python scripts/spark_submit_smoke.py [n_pages]
Prints one JSON line; exit 1 on any mismatch or a non-multi-executor
run.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)  # launcher-side oracle only; the job gets no repo path

from multi_executor_smoke import make_pkg_zip  # noqa: E402  (same dir)


def spark_submit_bin() -> str:
    import pyspark
    return os.path.join(os.path.dirname(pyspark.__file__), "bin",
                        "spark-submit")


def main() -> int:
    n_pages = int(sys.argv[1]) if len(sys.argv) > 1 else 2000
    tmp = tempfile.mkdtemp(prefix="submit_smoke_")
    try:
        idx = os.path.join(tmp, "index")
        out_json = os.path.join(tmp, "result.json")
        cmd = [
            spark_submit_bin(),
            "--master", "local-cluster[2,2,2048]",
            "--conf", "spark.sql.shuffle.partitions=8",
            "--conf", "spark.sql.session.timeZone=UTC",
            "--conf", "spark.sql.execution.arrow.pyspark.enabled=true",
            "--conf", "spark.sql.adaptive.enabled=true",
            "--conf", "spark.ui.enabled=false",
            "--driver-memory", "2g",
            "--py-files", make_pkg_zip(tmp),
            os.path.join(REPO, "scripts", "submit_job.py"),
            str(n_pages), idx, out_json,
        ]
        env = dict(os.environ,
                   PYSPARK_PYTHON=sys.executable,
                   PYSPARK_DRIVER_PYTHON=sys.executable)
        # the job must not inherit the repo on PYTHONPATH — oscar_spark
        # has to come from --py-files or the deployment test is void
        env.pop("PYTHONPATH", None)
        proc = subprocess.run(cmd, cwd=tmp, env=env,
                              capture_output=True, text=True, timeout=900)
        if proc.returncode != 0 or not os.path.exists(out_json):
            sys.stderr.write(proc.stdout[-2000:] + proc.stderr[-4000:])
            print(json.dumps({"ok": False,
                              "error": f"spark-submit rc={proc.returncode}"}))
            return 1
        with open(out_json) as f:
            got = json.load(f)

        # ---- independent oracle (no Spark in this process) ----
        import pyarrow.parquet as pq
        from oscar_spark.fixtures.pages import generate_pages
        from oscar_spark.oracle.engine import OracleIndex
        ds = pq.read_table(os.path.join(idx, "doc_stats"),
                           columns=["url", "doc_id"]).to_pydict()
        url2id = dict(zip(ds["url"], ds["doc_id"]))
        pdf = generate_pages(n_pages)
        oracle = OracleIndex([(int(url2id[u]), t)
                              for u, t in zip(pdf["url"], pdf["text"])])
        mismatches = []
        for q, rows in got["results"].items():
            want = [(d, round(s, 4)) for d, s in oracle.search(q, k=10)]
            have = [(int(d), round(float(s), 4)) for d, s in rows]
            if have != want:
                mismatches.append(q)

        out = {"n_pages": got["n_docs"], "build_sec": got["build_sec"],
               "docs_per_sec": got["docs_per_sec"],
               "executors_incl_driver": got["executors_incl_driver"],
               "master": got["master"],
               "queries": len(got["results"]), "mismatches": mismatches,
               "ok": (got["executors_incl_driver"] >= 3
                      and got["master"].startswith("local-cluster")
                      and not mismatches)}
        print(json.dumps(out))
        return 0 if out["ok"] else 1
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    sys.exit(main())
