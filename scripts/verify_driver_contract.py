"""Drive the two product surfaces end-to-end:

1. The driver contract: run entry(spark), then EVERY queries() entry at
   sf0.01 side-by-side with its oracle_sql() in DuckDB, comparing
   row-count, column names, and order-insensitive values — the same
   protocol the driver's CORRECTNESS gate uses.
2. The library boundary: build a full index over the pages fixture into
   a temp dir, serve adversarial + normal queries through SearchEngine.

Exit code 0 iff everything matches.
"""

from __future__ import annotations

import sys
import tempfile

import duckdb

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entrymod  # noqa: E402
from oscar_spark.session import get_spark  # noqa: E402

SF = "/root/testdata/sf0.01"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm_cell(v):
    if isinstance(v, float):
        return round(v, 4)
    return v


def df_to_rows(pdf):
    cols = sorted(pdf.columns)
    return sorted(
        tuple(norm_cell(v) for v in row)
        for row in pdf[cols].itertuples(index=False, name=None)
    ), cols


def audit_correctness_files(qs) -> None:
    """Loud (non-fatal) audit: does the NEWEST driver CORRECTNESS_r*.json
    carry a row for every currently-registered query?  A missing row can
    be legitimate (query added after that round) but must be SEEN —
    the r04 sweep dropped rel_sessionize and nothing flagged it."""
    import glob
    import json
    import os
    files = sorted(glob.glob("/root/repo/CORRECTNESS_r*.json"))
    if not files:
        return
    newest = files[-1]
    with open(newest) as f:
        rows = json.load(f)
    absent = sorted(set(qs) - set(rows))
    stale = sorted(set(rows) - set(qs))
    print(f"audit {os.path.basename(newest)}: {len(rows)} rows for "
          f"{len(qs)} registered queries")
    if absent:
        print(f"  NOTE: registered queries with NO row there: {absent}"
              " (new this round, or dropped by the driver sweep — "
              "check which)")
    if stale:
        print(f"  NOTE: rows for queries no longer registered: {stale}")


def main() -> int:
    spark = get_spark(cores=8, shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")

    failures = []

    # --- surface 1: entry() ---
    res = entrymod.entry(spark)
    rows = res.collect()
    print(f"entry(): {len(rows)} rows, schema={res.columns}")
    for r in rows[:3]:
        print("   ", tuple(r))
    if len(rows) == 0:
        failures.append("entry() returned 0 rows")

    # --- surface 1b: full queries() vs oracle_sql() sweep ---
    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    missing = set(qs) - set(oracles)
    if missing:
        print(f"NOTE: rows-only entries (no oracle): {sorted(missing)}")
    # contract key-set self-check (round-4 verdict: the driver's r04
    # sweep silently dropped rel_sessionize — 50 rows for 51 registered
    # queries, and nothing in-repo noticed).  An oracle for a query that
    # doesn't exist is dead weight at best and a typo'd key at worst.
    orphans = set(oracles) - set(qs)
    if orphans:
        failures.append(f"oracle_sql() keys with no queries() entry: "
                        f"{sorted(orphans)}")
    swept = 0
    for name, fn in qs.items():
        swept += 1
        try:
            sdf = fn(spark, SF).toPandas()
        except Exception as e:
            failures.append(f"{name}: SPARK ERROR {e}")
            print(f"FAIL {name}: spark error {str(e)[:200]}")
            continue
        if name not in oracles:
            print(f"ok?  {name}: rows-only, {len(sdf)} rows")
            continue
        try:
            odf = con.sql(oracles[name]).df()
        except Exception as e:
            failures.append(f"{name}: ORACLE SQL ERROR {e}")
            print(f"FAIL {name}: duckdb error {str(e)[:200]}")
            continue
        srows, scols = df_to_rows(sdf)
        orows, ocols = df_to_rows(odf)
        if scols != ocols:
            failures.append(f"{name}: columns {scols} != {ocols}")
            print(f"FAIL {name}: columns {scols} vs {ocols}")
        elif len(srows) != len(orows):
            failures.append(f"{name}: rowcount {len(srows)} != {len(orows)}")
            print(f"FAIL {name}: rowcount {len(srows)} vs {len(orows)}")
        elif srows != orows:
            diff = [i for i, (a, b) in enumerate(zip(srows, orows)) if a != b]
            failures.append(f"{name}: {len(diff)} value mismatches")
            i = diff[0]
            print(f"FAIL {name}: first mismatch row {i}:")
            print("   spark :", srows[i])
            print("   oracle:", orows[i])
        else:
            print(f"ok   {name}: {len(srows)} rows match")
    print(f"sweep: {swept}/{len(qs)} registered queries run "
          f"({len(qs) - len(missing)} value-oracled, {len(missing)} "
          "rows-only)")
    if swept != len(qs):
        failures.append(f"sweep covered {swept} of {len(qs)} "
                        "registered queries")
    audit_correctness_files(qs)

    # --- surface 2: build + serve through the package boundary ---
    from oscar_spark.build.indexer import build_index
    from oscar_spark.fixtures.pages import pages_spark_df
    from oscar_spark.oracle.engine import OracleIndex
    from oscar_spark.fixtures.pages import generate_pages
    from oscar_spark.serve.executor import SearchEngine

    with tempfile.TemporaryDirectory() as d:
        pages = pages_spark_df(spark, 200)
        res = build_index(spark, pages, d)
        print(f"build: {res.n_docs} docs, {res.n_terms} terms, "
              f"{res.n_blocks} blocks, {res.docs_per_sec:.0f} docs/s")
        eng = SearchEngine(spark, d)
        ds = {r['url']: r['doc_id']
              for r in spark.read.parquet(f"{d}/doc_stats").collect()}
        pdf = generate_pages(200)
        oracle = OracleIndex([(int(ds[u]), t)
                              for u, t in zip(pdf['url'], pdf['text'])])
        for q in ["the", "city + state", "war - history", "of and to",
                  "wd00*", "ci* + history", "((", "-foo", '"unterminated']:
            got = eng.search(q, k=5)
            exp = oracle.search(q, k=5)
            ok = ([d0 for d0, _ in got] == [d0 for d0, _ in exp]
                  and all(round(a, 4) == round(b, 4)
                          for (_, a), (_, b) in zip(got, exp)))
            print(f"serve {q!r}: {'MATCH' if ok else 'MISMATCH'} {got[:3]}")
            if not ok:
                failures.append(f"serve {q!r}: {got} != {exp}")

    print()
    if failures:
        print(f"VERIFY FAIL: {len(failures)} failures")
        for f in failures:
            print(" -", f)
        return 1
    print("VERIFY PASS: all surfaces match")
    return 0


if __name__ == "__main__":
    sys.exit(main())
