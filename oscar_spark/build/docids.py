"""Deterministic docID assignment — the one global ordering in the build.

Reference semantics: items are renumbered in descending static-score
order at build time so docID order IS rank order
(reference/oscar-create/OsmKeyValueObjectStore.cpp:1339-1399 applySort).

Two interchangeable strategies, both producing the identical mapping
(asserted equal in tests/test_docids.py):

- assign_doc_ids_window: row_number over a global orderBy.  Simple, but
  the window is a single-partition sort — fine at test scale, a wall at
  10^12 docs.
- assign_doc_ids_ranged: the scale path.  repartitionByRange on the
  order key gives globally range-ordered partitions; per-partition
  counts (one tiny collect = the "committed partition manifest") give
  each partition a contiguous base offset; ids are then assigned
  sequentially inside each sorted partition with mapInPandas.  No
  single-partition stage; the only driver data is #partitions rows.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _order():
    # built lazily — F.desc needs an active SparkContext
    return [F.desc("quality"), F.asc("url")]


def assign_doc_ids_window(doc_lens: DataFrame) -> DataFrame:
    """(url, doc_len, quality) → + doc_id via global row_number."""
    w = Window.orderBy(*_order())
    return doc_lens.withColumn(
        "doc_id", F.row_number().over(w).cast("long") - 1)


def assign_doc_ids_ranged(doc_lens: DataFrame,
                          num_partitions: int = 32,
                          stats_col: str | None = None):
    """Same mapping, no global window: range partitions + base offsets.

    stats_col: when given, the manifest collect ALSO aggregates
    count/sum of that column and the function returns
    (df, {"n": int, "sum": float}) — corpus stats ride along on the
    job that had to run anyway instead of costing their own job
    (per-job launch latency is a fixed cost that eats N→4N scaling
    efficiency at bench scale)."""
    spark = doc_lens.sparkSession
    ranged = (doc_lens
              .repartitionByRange(num_partitions, *_order())
              .sortWithinPartitions(*_order())
              .withColumn("_pid", F.spark_partition_id()))
    # PIN the computed partitions: repartitionByRange samples its
    # boundaries per job, so the manifest job below and the assign job
    # would otherwise each draw their OWN boundaries — overlapping /
    # gapped offsets and duplicate doc_ids (caught by the strict-monotone
    # block invariant at 40k docs).  localCheckpoint materializes the
    # ranged partitions once; both jobs read the same layout.  LAZY
    # (eager=False): the manifest collect below is the first action, so
    # checkpoint materialization rides on a job that must run anyway —
    # eager=True cost one extra whole job launch (~0.2-1.5s fixed), a
    # direct N→4N efficiency tax at bench scale.  INVARIANT the laziness
    # depends on: the FIRST action over `ranged` must compute EVERY
    # partition (the manifest groupBy below does — it aggregates all
    # rows).  A future caller whose first action scans only a subset
    # would leave unvisited partitions to re-run the range-sampling
    # lineage on a later job — re-drawing boundaries and reintroducing
    # the exact duplicate/gapped-doc-id hazard this checkpoint exists
    # to prevent.  If that access pattern ever appears, flip back to
    # eager=True here rather than weakening the caller.  (Real cluster: a
    # reliable checkpoint dir / the committed Iceberg partition manifest
    # plays this role — executor loss must not re-sample.)
    ranged = ranged.localCheckpoint(eager=False)
    # the committed partition manifest: pid → row count (tiny collect)
    aggs = [F.count("*").alias("n")]
    if stats_col is not None:
        aggs.append(F.sum(stats_col).alias("s"))
    man = ranged.groupBy("_pid").agg(*aggs).collect()
    counts = {r["_pid"]: r["n"] for r in man}
    offsets = {}
    acc = 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]
    b_offsets = spark.sparkContext.broadcast(offsets)

    schema = ranged.drop("_pid").schema.add("doc_id", "long", False)

    def assign(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        pos = None
        for pdf in batches:
            if len(pdf) == 0:
                continue
            if pos is None:
                pos = b_offsets.value[int(pdf["_pid"].iloc[0])]
            out = pdf.drop(columns=["_pid"])
            out["doc_id"] = range(pos, pos + len(pdf))
            pos += len(pdf)
            yield out

    # mapInPandas preserves the within-partition sort order, so ids are
    # sequential in (quality DESC, url ASC) order partition by partition
    out = ranged.mapInPandas(assign, schema)
    if stats_col is not None:
        total = sum((r["s"] or 0) for r in man)
        return out, {"n": acc, "sum": float(total)}
    return out
