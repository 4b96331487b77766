"""Isolated per-query timing (guide §1.4): noop-sink each declared query
so computation is timed without the count()-prune or output-sink effects,
plus the same warm/cold protocol bench.py uses.

Usage:
  python scripts/bench_isolate.py [sf_dir] [query ...]

Prints one JSON line: {query: {"cold": s, "warm": s, "noop_warm": s}}.
Separate from the FROZEN bench.py on purpose (driver contract).
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    args = sys.argv[1:]
    sf_dir = args[0] if args else "/root/testdata/sf1.0"
    names = args[1:]
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    from oscar_spark.session import get_spark
    spark = get_spark(app="bench-isolate", cores=cpus,
                      shuffle_partitions=cpus)
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entrymod
    qs = entrymod.queries()
    if not names:
        names = list(qs)
    out: dict[str, dict[str, float]] = {}
    for name in names:
        fn = qs[name]
        spark.sparkContext.setJobDescription(f"{name}: cold count")
        t0 = time.time()
        fn(spark, sf_dir).count()
        cold = time.time() - t0
        warms = []
        for r in range(int(os.environ.get("ISO_REPEATS", "3"))):
            spark.sparkContext.setJobDescription(f"{name}: warm count {r}")
            t0 = time.time()
            fn(spark, sf_dir).count()
            warms.append(time.time() - t0)
        warm = min(warms)
        spark.sparkContext.setJobDescription(f"{name}: noop warm")
        t0 = time.time()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        noop = time.time() - t0
        spark.sparkContext.setJobDescription(None)
        out[name] = {"cold": round(cold, 3), "warm": round(warm, 3),
                     "warms": [round(w, 3) for w in warms],
                     "noop_warm": round(noop, 3)}
        print(f"# {name}: cold {cold:.3f} warm(min) {warm:.3f} "
              f"{[round(w, 2) for w in warms]} noop {noop:.3f}",
              file=sys.stderr)
    print(json.dumps({"sf_dir": sf_dir, "cpus": cpus, "queries": out}))
    spark.stop()


if __name__ == "__main__":
    main()
