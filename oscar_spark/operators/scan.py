"""Scale-adaptive scan parallelism for the catalog operators.

The driver's testdata tables are single parquet files with ONE row group
each, so a scan of them yields a single task no matter the cluster size
(`spark.sql.files.maxPartitionBytes` cannot split inside a row group).
Every narrow transformation before the first shuffle — tokenize,
shingle, md5 — then runs on one core of N (measured: the whole
pre-shuffle half of dedup_minhash_lsh serialized on 1 of 32 cores).

`parallelize` round-robins an under-partitioned scan across the default
parallelism.  It is scale-adaptive in BOTH directions, not tuned to
local[32]:

- at real scale the scan already has >= defaultParallelism partitions
  and the helper is a no-op with zero plan change;
- when the input is TINY the round-robin exchange itself (an extra
  stage + a driver round trip) costs more than the single-task compute
  it parallelizes, so inputs below PARALLELIZE_MIN_BYTES are left
  alone.  Measured on the tokenize-heaviest consumer (fts_term_df):
  5k docs / 0.57 MB parquet: 0.26s serial vs 0.55s parallelized;
  50k docs / 5.7 MB: 1.6s serial vs 0.96s parallelized — the
  crossover sits between those sizes; 2 MB is the conservative gate
  (override with OSCAR_PARALLELIZE_MIN_BYTES).

When it does fire, the input is by construction small (fewer than
`cores` scan splits, i.e. bounded by cores x maxPartitionBytes), so the
round-robin exchange moves little and buys a fully parallel compute
stage (guide §2.2/§6.1).
"""

from __future__ import annotations

import os
from urllib.parse import urlparse

from pyspark.sql import DataFrame

PARALLELIZE_MIN_BYTES = int(
    os.environ.get("OSCAR_PARALLELIZE_MIN_BYTES", 2_000_000))


def _local_input_bytes(df: DataFrame) -> int | None:
    """Total on-disk bytes of a scan's input files, when they are local
    files we can stat; None when unknown (non-file scheme, no files
    API) — unknown sizes fall through to the partition-count rule."""
    try:
        files = df.inputFiles()
    except Exception:
        return None
    if not files:
        return None
    total = 0
    for f in files:
        p = urlparse(f).path if ":" in f else f
        try:
            total += os.path.getsize(p)
        except OSError:
            return None
    return total


def parallelize(df: DataFrame, heavy: bool = False) -> DataFrame:
    """Repartition an under-partitioned scan to defaultParallelism.

    No-op (and no added Exchange) when the scan already has at least
    defaultParallelism partitions, OR when the input is so small that
    the exchange would cost more than the serial scan it replaces (see
    module docstring).  heavy=True skips the size gate: consumers whose
    per-byte compute dwarfs the exchange (shingle + 8×md5 minhash
    pipelines: measured 2.7s serial vs 1.3s parallelized on the SAME
    0.57 MB input whose tokenize-count consumers prefer serial) stay
    parallel at any input size.  Results are unchanged either way:
    round-robin repartition only redistributes rows, and every consumer
    of these tables aggregates / sorts explicitly.
    """
    size = None if heavy else _local_input_bytes(df)
    if size is not None and size < PARALLELIZE_MIN_BYTES:
        return df
    spark = df.sparkSession
    target = spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target)
