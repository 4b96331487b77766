"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video decode libraries are not in this container, so the
decode step is a deterministic fake behind `FAKE_DECODE` (clearly marked;
swap in a real decoder via the same mapInPandas signature).  What IS real
and tested: the Spark-side schema, Arrow batch shape, partitioning, and
the mapInPandas feature-extraction pipeline — the parts that matter at
100 TB (binary columns ride Parquet untouched; per-batch decode keeps
memory bounded by spark.sql.files.maxPartitionBytes).
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

FAKE_DECODE = True  # no PIL/ffmpeg in this environment

MEDIA_SCHEMA = ("media_id long, kind string, payload binary, "
                "width int, height int, duration_ms int")
FEATURE_SCHEMA = ("media_id long, kind string, n_bytes long, "
                  "digest string, feat array<double>")


def synth_media(spark: SparkSession, n: int = 64) -> DataFrame:
    """Deterministic fake media table (binary payload + typed metadata)."""
    rows = []
    for i in range(n):
        kind = ["image", "audio", "video"][i % 3]
        payload = hashlib.sha256(f"media{i}".encode()).digest() * (1 + i % 4)
        rows.append((i, kind, bytearray(payload),
                     64 + i % 128, 64 + (i * 7) % 128, 1000 * (1 + i % 30)))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def _decode_features(pdf: pd.DataFrame) -> pd.DataFrame:
    """Per-batch decode + feature extraction (vectorized over the batch).

    With a real decoder this is where PIL/librosa would run; the fake
    derives an 8-dim feature deterministically from payload bytes so the
    plumbing (schema, batching, downstream joins) is fully testable.
    """
    feats, digests, sizes = [], [], []
    for payload in pdf["payload"]:
        b = bytes(payload)
        hx = b.hex()  # canonical text encoding: SQL oracles can hash it
        digests.append(hashlib.md5(hx.encode()).hexdigest())
        sizes.append(len(b))
        if FAKE_DECODE:
            arr = np.frombuffer(
                hashlib.sha256(hx.encode()).digest()[:8], dtype=np.uint8
            ).astype(np.float64)
            feats.append((arr / 255.0).tolist())
        else:  # pragma: no cover
            raise NotImplementedError("real decoder not available here")
    return pd.DataFrame({
        "media_id": pdf["media_id"], "kind": pdf["kind"],
        "n_bytes": pd.array(sizes, dtype="int64"),
        "digest": digests, "feat": feats})


def extract_features(media: DataFrame) -> DataFrame:
    """mapInPandas decode/feature pipeline over the binary column."""
    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield _decode_features(pdf)
    return media.mapInPandas(gen, FEATURE_SCHEMA)


def frame_sample(media: DataFrame, every_ms: int = 5000) -> DataFrame:
    """Video frame-sampling plumbing: one row per sampled timestamp
    (pure built-ins — sequence/explode; the decode of each frame would
    plug into extract_features)."""
    vids = media.filter(F.col("kind") == "video")
    ts = F.sequence(F.lit(0), F.col("duration_ms"), F.lit(every_ms))
    return (vids.select("media_id", F.explode(ts).alias("frame_ms"))
            .orderBy("media_id", "frame_ms"))


# ---- driver-contract wrappers (full DuckDB value oracles: the fake
# media table and the fake decode are both reconstructible in pure SQL,
# so even the stubbed decode path gets a value-checked oracle rather
# than a rows-only check) ----

N_MEDIA_Q = 64


def media_features_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """extract_features over the deterministic media table, feat array
    flattened to scalar columns so the oracle hash compares values."""
    out = extract_features(synth_media(spark, N_MEDIA_Q))
    cols = [F.col("feat")[j].alias(f"f{j}") for j in range(8)]
    return out.select("media_id", "kind", "n_bytes", "digest", *cols)


def frame_sample_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    return frame_sample(synth_media(spark, N_MEDIA_Q), every_ms=5000)


_MEDIA_CTE = (
    "WITH m AS (SELECT i AS media_id, "
    "CASE i % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END"
    " AS kind, lower(repeat(sha256('media'||i), 1 + i % 4)) AS hx, "
    "1000 * (1 + i % 30) AS duration_ms "
    f"FROM range({N_MEDIA_Q}) t(i))"
)

_FEAT_COLS_SQL = ", ".join(
    f"CAST(('0x'||substr(sha256(hx), {1 + 2 * j}, 2)) AS INT)/255.0 AS f{j}"
    for j in range(8))

MEDIA_FEATURES_SQL = (
    _MEDIA_CTE + " SELECT media_id, kind, CAST(length(hx)/2 AS BIGINT) AS"
    " n_bytes, md5(hx) AS digest, " + _FEAT_COLS_SQL + " FROM m")

FRAME_SAMPLE_SQL = (
    _MEDIA_CTE + " SELECT media_id, CAST(f.frame_ms AS INT) AS frame_ms"
    " FROM m, unnest(generate_series(0, duration_ms, 5000)) AS f(frame_ms)"
    " WHERE kind = 'video'")
