"""Scale-adaptive scan parallelism for the catalog operators.

The driver's testdata tables are single parquet files with ONE row group
each, so a scan of them yields a single task no matter the cluster size
(`spark.sql.files.maxPartitionBytes` cannot split inside a row group).
Every narrow transformation before the first shuffle — tokenize,
shingle, md5 — then runs on one core of N (measured: the whole
pre-shuffle half of dedup_minhash_lsh serialized on 1 of 32 cores).

`parallelize` round-robins an under-partitioned scan across the default
parallelism.  It is scale-adaptive, not tuned to local[32]: at real
scale the scan already has >= defaultParallelism partitions and the
helper is a no-op with zero plan change; when it does fire, the input
is by construction small (fewer than `cores` scan splits, i.e. bounded
by cores x maxPartitionBytes), so the round-robin exchange moves little
and buys a fully parallel compute stage (guide §2.2/§6.1).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def parallelize(df: DataFrame) -> DataFrame:
    """Repartition an under-partitioned scan to defaultParallelism.

    No-op (and no added Exchange) when the scan already has at least
    defaultParallelism partitions.  Results are unchanged either way:
    round-robin repartition only redistributes rows, and every consumer
    of these tables aggregates / sorts explicitly.
    """
    spark = df.sparkSession
    target = spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target)
