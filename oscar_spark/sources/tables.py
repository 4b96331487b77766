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
import threading
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

STAGES = ("doc_stats", "postings", "terms")

# serializes manifest read-modify-write across in-process threads (the
# build submits independent table writes concurrently); cross-process
# writers are excluded by the single-writer build contract
_MANIFEST_LOCK = threading.Lock()


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

    def _mutate(self, fn):
        """Locked read-modify-write of the manifest, atomically
        replaced on disk."""
        with _MANIFEST_LOCK:
            m = self.manifest()
            out = fn(m)
            tmp = self.manifest_path + ".tmp"
            with open(tmp, "w") as f:
                json.dump(m, f, indent=1)
            os.replace(tmp, self.manifest_path)  # atomic commit
            return out

    def commit(self, stage: str, fingerprint: str) -> int:
        def fn(m):
            sid = m["next_snapshot_id"]
            m["snapshots"][stage] = {
                "fingerprint": fingerprint,
                "snapshot_id": sid,
                "ts": time.time(),
            }
            m["next_snapshot_id"] = sid + 1
            return sid
        return self._mutate(fn)

    def snapshot_id(self, stage: str) -> int | None:
        snap = self.manifest()["snapshots"].get(stage)
        return snap["snapshot_id"] if snap else None

    # --- store-level metadata (e.g. posting codec) ---
    def set_meta(self, key: str, value) -> None:
        self._mutate(lambda m: m.setdefault("meta", {})
                     .__setitem__(key, value))

    def get_meta(self, key: str, default=None):
        return self.manifest().get("meta", {}).get(key, default)

    # --- table IO ---
    # Every table is written under an outer `seg=<name>` partition level
    # (the base build is seg=base; each incremental append adds one) and
    # reads filter to the MANIFEST-LISTED segments — the sandbox analog
    # of Iceberg snapshot isolation: a crashed append's half-written
    # segment directory is simply never listed, so it is invisible, and
    # "commit" is one atomic manifest replace.  Spark prunes the seg
    # partition, so the filter costs file-listing only.

    def path(self, table: str) -> str:
        return os.path.join(self.dir, table)

    def segments(self, table: str) -> list[str]:
        m = self.manifest()
        return m.get("segments", {}).get(table, ["base"])

    def _set_segments(self, table: str, segs: list[str]) -> None:
        self._mutate(lambda m: m.setdefault("segments", {})
                     .__setitem__(table, segs))

    def write(self, df: DataFrame, table: str,
              partition_by: list[str] | None = None) -> None:
        """Full (re)write of a table as its `base` segment.

        The seg value comes from the DIRECTORY NAME (seg=base/), not a
        data column: partitionBy("seg") on a constant column routed the
        biggest write of the build through Spark's dynamic-partition
        sort path and measurably halved tokenize-stage scaling."""
        import shutil
        shutil.rmtree(self.path(table), ignore_errors=True)
        self.write_segment(df, table, "base", partition_by)
        self._set_segments(table, ["base"])

    def write_segment(self, df: DataFrame, table: str, segment: str,
                      partition_by: list[str] | None = None) -> None:
        """Write one NEW segment of a table; invisible to read() until
        commit_segment() lists it in the manifest.  Files go directly
        into the table's seg=<name> directory (same layout partitionBy
        would produce for that one seg value)."""
        w = df.write.mode("overwrite")
        if partition_by:
            w = w.partitionBy(*partition_by)
        w.parquet(os.path.join(self.path(table), f"seg={segment}"))

    def commit_segment(self, table: str, segment: str) -> None:
        segs = self.segments(table)
        if segment not in segs:
            self._set_segments(table, segs + [segment])

    def commit_append(self, add: dict[str, list[str]] | None = None,
                      replace: dict[str, list[str]] | None = None,
                      meta: dict | None = None,
                      stage_fingerprints: dict[str, str] | None = None) -> None:
        """ONE atomic manifest replace covering an entire incremental
        append: segment additions, segment swaps (e.g. the merged terms
        table replacing its predecessor), metadata updates, and stage
        fingerprint bumps.  All segment DIRECTORIES must already be
        fully written; a crash before this call leaves the old snapshot
        intact, a crash after it the new one — never a mix."""
        def fn(m):
            for t, segs in (add or {}).items():
                cur = m.setdefault("segments", {}).setdefault(t, ["base"])
                for s in segs:
                    if s not in cur:
                        cur.append(s)
            for t, segs in (replace or {}).items():
                m.setdefault("segments", {})[t] = segs
            for k, v in (meta or {}).items():
                m.setdefault("meta", {})[k] = v
            sid = m["next_snapshot_id"]
            for stage, fpv in (stage_fingerprints or {}).items():
                m["snapshots"][stage] = {"fingerprint": fpv,
                                         "snapshot_id": sid,
                                         "ts": time.time()}
                sid += 1
            m["next_snapshot_id"] = sid
        self._mutate(fn)

    def read(self, spark: SparkSession, table: str) -> DataFrame:
        df = spark.read.option("basePath", self.path(table)) \
            .parquet(self.path(table))
        segs = self.segments(table)
        if "seg" in df.columns:
            return df.filter(F.col("seg").isin(segs)).drop("seg")
        return df  # legacy layout (pre-segment store)

    def read_segment(self, spark: SparkSession, table: str,
                     segment: str) -> DataFrame:
        df = spark.read.option("basePath", self.path(table)) \
            .parquet(self.path(table))
        return df.filter(F.col("seg") == segment).drop("seg")
