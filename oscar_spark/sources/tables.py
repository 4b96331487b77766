"""Index store: partitioned tables + snapshot manifest + lineage.

Role-parity with oscar's ItemIndexStore/KV-store writers
(reference/oscar-create/oscarcreate.cpp:146-164 index flush;
reference/oscar-create/OsmKeyValueObjectStore.cpp:1545-1568 store
serialize; store→store re-import resume path
reference/oscar-create/oscarcreate.cpp:86-116).

Target layout is Iceberg (`writeTo(...).createOrReplace()` partitioned by
`bucket(term)`); this sandbox has no Iceberg runtime jar, so the store
writes partitioned parquet plus an explicit `_manifest.json` that mimics
the snapshot/commit semantics we rely on:

    <index_dir>/
      doc_stats/          doc_id, url, doc_len, quality        (parquet)
      terms/bucket=*/     term, df                             (parquet)
      postings/bucket=*/  term, block_id, range_id, first_doc,
                          last_doc, doc_count, max_tf,
                          max_score, payload                   (parquet)
      lineage/            partition_id, input_fingerprint, rows_in,
                          terms_out, docs_per_sec, snapshot_id, ts
      _manifest.json      {stage: {fingerprint, snapshot_id, ts}}

A stage directory is only readable through the store if the manifest has
committed it (write-then-commit, so a killed build never exposes a
partial stage — the resumability contract of BASELINE.json).
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession

STAGES = ("doc_stats", "postings", "terms")


class IndexStore:
    def __init__(self, index_dir: str):
        self.dir = index_dir
        os.makedirs(index_dir, exist_ok=True)
        self.manifest_path = os.path.join(index_dir, "_manifest.json")

    # --- manifest / snapshots ---
    def manifest(self) -> dict:
        if os.path.exists(self.manifest_path):
            with open(self.manifest_path) as f:
                return json.load(f)
        return {"snapshots": {}, "next_snapshot_id": 1}

    def committed(self, stage: str, fingerprint: str) -> bool:
        snap = self.manifest()["snapshots"].get(stage)
        return bool(snap) and snap["fingerprint"] == fingerprint

    def commit(self, stage: str, fingerprint: str) -> int:
        m = self.manifest()
        sid = m["next_snapshot_id"]
        m["snapshots"][stage] = {
            "fingerprint": fingerprint,
            "snapshot_id": sid,
            "ts": time.time(),
        }
        m["next_snapshot_id"] = sid + 1
        tmp = self.manifest_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(m, f, indent=1)
        os.replace(tmp, self.manifest_path)  # atomic commit
        return sid

    def snapshot_id(self, stage: str) -> int | None:
        snap = self.manifest()["snapshots"].get(stage)
        return snap["snapshot_id"] if snap else None

    # --- store-level metadata (e.g. posting codec) ---
    def set_meta(self, key: str, value) -> None:
        m = self.manifest()
        m.setdefault("meta", {})[key] = value
        tmp = self.manifest_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(m, f, indent=1)
        os.replace(tmp, self.manifest_path)

    def get_meta(self, key: str, default=None):
        return self.manifest().get("meta", {}).get(key, default)

    # --- table IO ---
    def path(self, table: str) -> str:
        return os.path.join(self.dir, table)

    def write(self, df: DataFrame, table: str,
              partition_by: list[str] | None = None) -> None:
        w = df.write.mode("overwrite")
        if partition_by:
            w = w.partitionBy(*partition_by)
        w.parquet(self.path(table))

    def read(self, spark: SparkSession, table: str) -> DataFrame:
        return spark.read.parquet(self.path(table))

    def append(self, df: DataFrame, table: str) -> None:
        df.write.mode("append").parquet(self.path(table))
