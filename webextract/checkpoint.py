"""Parquet + manifest checkpoint catalog (Iceberg-shim, SURVEY.md §7.0).

No Iceberg runtime jar is resolvable in this sandbox, so this shim
provides the minimal Iceberg-like surface the pipeline needs, with the
same call shape it would use against a real catalog:

- **append**: immutable parquet part-dirs + a new manifest version
  listing all live part-dirs (snapshot)
- **snapshot-pinned reads**: ``read(spark, name, version=...)`` resolves
  a manifest version to its frozen file list
- **atomic commit**: manifest JSON written to a temp file then
  ``os.replace``d; the ``_LATEST`` pointer likewise — readers see either
  the old or the new snapshot, never a partial one

Reference analogue: the in-memory result store + reprocess-from-cache
(ocr-ai-service/app/services/document_service.py:44,253-282, S5/C4).
On a real deployment swap this for ``df.writeTo("cat.db.tbl").append()``;
the runner only uses append/read/latest_version.

Concurrency scope: the shim assumes ONE writer per table root (the
runner's commit loop is sequential). Two concurrent runners appending to
the same root could interleave the manifest read-modify-write and drop
each other's snapshot — a real Iceberg catalog serializes commits with
optimistic retry, which is exactly what you get on the swap above. The
north-rule resume story (one job at a time, killed and restarted) never
has two live writers.
"""

from __future__ import annotations

import json
import os
import time
import uuid

from pyspark.sql import DataFrame, SparkSession


class Catalog:
    def __init__(self, root: str) -> None:
        self.root = root
        os.makedirs(root, exist_ok=True)

    # -- paths -------------------------------------------------------------
    def _tdir(self, name: str) -> str:
        return os.path.join(self.root, name)

    def _manifest_path(self, name: str, version: int) -> str:
        return os.path.join(self._tdir(name), "_manifests", f"v{version}.json")

    def _latest_path(self, name: str) -> str:
        return os.path.join(self._tdir(name), "_LATEST")

    # -- snapshots ----------------------------------------------------------
    def latest_version(self, name: str) -> int | None:
        try:
            with open(self._latest_path(name)) as f:
                return int(f.read().strip())
        except (FileNotFoundError, ValueError):
            return None

    def manifest(self, name: str, version: int | None = None) -> dict | None:
        v = version if version is not None else self.latest_version(name)
        if v is None:
            return None
        try:
            with open(self._manifest_path(name, v)) as f:
                return json.load(f)
        except FileNotFoundError:
            return None

    # -- write path ----------------------------------------------------------
    def append(self, name: str, df: DataFrame) -> dict:
        """Write df as a new immutable part-dir, commit manifest vN+1."""
        part_id = uuid.uuid4().hex
        part_rel = os.path.join("data", part_id)
        part_abs = os.path.join(self._tdir(name), part_rel)
        df.write.parquet(part_abs, mode="errorifexists")
        prev = self.manifest(name)
        version = (prev["version"] + 1) if prev else 1
        man = {
            "table": name,
            "version": version,
            "parts": (prev["parts"] if prev else []) + [part_rel],
            "committed_at": time.time(),
        }
        mpath = self._manifest_path(name, version)
        os.makedirs(os.path.dirname(mpath), exist_ok=True)
        tmp = mpath + f".tmp-{part_id}"
        with open(tmp, "w") as f:
            json.dump(man, f)
        os.replace(tmp, mpath)
        ltmp = self._latest_path(name) + f".tmp-{part_id}"
        with open(ltmp, "w") as f:
            f.write(str(version))
        os.replace(ltmp, self._latest_path(name))
        return man

    # -- read path -----------------------------------------------------------
    def read(
        self, spark: SparkSession, name: str, version: int | None = None
    ) -> DataFrame | None:
        man = self.manifest(name, version)
        if man is None or not man["parts"]:
            return None
        paths = [os.path.join(self._tdir(name), p) for p in man["parts"]]
        return spark.read.parquet(*paths)
