"""Window vs ranged docID assignment produce the identical mapping
(SURVEY.md §7 hard-part #4: the scale strategy must keep determinism)."""

from __future__ import annotations

from pyspark.sql import functions as F

from oscar_spark.build.docids import (
    assign_doc_ids_ranged, assign_doc_ids_window)


def _doc_lens(spark, pages_df):
    from oscar_spark.build.indexer import TOKENS_SCHEMA, _tokenize_batches
    tokens = pages_df.select("url", "text").mapInPandas(
        _tokenize_batches, TOKENS_SCHEMA)
    return (tokens.groupBy("url").agg(F.first("dl").alias("doc_len"))
            .withColumn("quality", F.col("doc_len").cast("double")))


def test_ranged_equals_window(spark, pages_df):
    dl = _doc_lens(spark, pages_df).cache()
    w = {(r["url"], r["doc_id"])
         for r in assign_doc_ids_window(dl).collect()}
    for nparts in (1, 3, 32):
        r = {(x["url"], x["doc_id"])
             for x in assign_doc_ids_ranged(dl, nparts).collect()}
        assert r == w, f"nparts={nparts}"
    ids = sorted(d for _, d in w)
    assert ids == list(range(len(ids)))
    dl.unpersist()
