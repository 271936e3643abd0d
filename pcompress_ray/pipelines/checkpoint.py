"""Stage-boundary checkpointing: resumable Parquet + manifest.

The reference has no resume (a run is all-or-nothing; temp output renamed at
the end, pcompress.c:2920-2941). At 10^12 documents resume is mandatory
(north rule): every expensive stage writes partitioned Parquet ATOMICALLY
(tmp dir → rename) and records completion in a manifest keyed by the
semantic config hash. A rerun with the same config skips completed stages
and re-reads their Parquet; changing the config invalidates everything.

Layout: {root}/{config_hash}/{stage}/part-*.parquet + manifest.json.
"""

from __future__ import annotations

import json
import os
import shutil


class CheckpointManager:
    def __init__(self, root: str | None, config_hash: str):
        self.enabled = root is not None
        self.root = os.path.join(root, config_hash) if root else None
        if self.enabled:
            os.makedirs(self.root, exist_ok=True)
        self._manifest_path = os.path.join(self.root, "manifest.json") if root else None

    def _manifest(self) -> dict:
        if not self.enabled or not os.path.exists(self._manifest_path):
            return {}
        with open(self._manifest_path) as f:
            return json.load(f)

    def _mark(self, stage: str, meta: dict | None = None):
        m = self._manifest()
        m[stage] = {"complete": True, **(meta or {})}
        tmp = self._manifest_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(m, f, indent=1)
        os.replace(tmp, self._manifest_path)

    def is_complete(self, stage: str) -> bool:
        return self.enabled and self._manifest().get(stage, {}).get("complete", False)

    def path(self, stage: str) -> str:
        return os.path.join(self.root, stage)

    def materialize(self, stage: str, ds, min_rows_per_file: int = 100_000):
        """Write ds to the stage checkpoint (atomic) OR read it back if done.

        Returns a Dataset backed by the checkpoint Parquet — downstream
        stages re-read from disk, so a killed run resumes here.
        """
        import ray.data as rd

        if not self.enabled:
            return ds
        if self.is_complete(stage):
            return rd.read_parquet(self.path(stage))
        final = self.path(stage)
        tmp = final + ".tmp"
        shutil.rmtree(tmp, ignore_errors=True)
        shutil.rmtree(final, ignore_errors=True)
        ds.write_parquet(tmp, min_rows_per_file=min_rows_per_file)
        os.replace(tmp, final)
        self._mark(stage)
        return rd.read_parquet(final)

    def save_table(self, stage: str, table):
        """Atomically write a small pyarrow Table as one parquet file."""
        if not self.enabled:
            return
        import pyarrow.parquet as pq

        p = self.path(stage) + ".parquet"
        pq.write_table(table, p + ".tmp")
        os.replace(p + ".tmp", p)
        self._mark(stage)

    def save_json(self, stage: str, obj: dict):
        if not self.enabled:
            return
        p = self.path(stage) + ".json"
        with open(p + ".tmp", "w") as f:
            json.dump(obj, f, indent=1, default=str)
        os.replace(p + ".tmp", p)
        self._mark(stage)

    def load_json(self, stage: str) -> dict | None:
        if not self.enabled or not self.is_complete(stage):
            return None
        with open(self.path(stage) + ".json") as f:
            return json.load(f)
