"""Per-stage Parquet checkpoints with fingerprint manifests + lineage
metrics — the resumability story required by the north rule.

Replaces the reference's md5-keyed pickle cache
(scripts/baseline_submission.py:51-92) and its interim CSV files
(README-ARCHITECTURE.md:112-117): each stage writes its output as a
partitioned Parquet directory plus ``manifest.json`` recording
(stage, config+upstream fingerprint, row count, wall seconds). A rerun
whose fingerprint matches reads the Parquet back instead of recomputing
— Ray Data provides no checkpointing itself, so this is explicit.
"""

from __future__ import annotations

import json
import os
import time

import pyarrow as pa

import ray.data as rd

from .config import fingerprint


class CheckpointManager:
    def __init__(self, root: str):
        self.root = root
        os.makedirs(root, exist_ok=True)
        self._lineage: list[dict] = []

    def _stage_dir(self, stage: str) -> str:
        return os.path.join(self.root, stage)

    def _manifest_path(self, stage: str) -> str:
        return os.path.join(self._stage_dir(stage), "manifest.json")

    def is_done(self, stage: str, fp: str) -> bool:
        path = self._manifest_path(stage)
        if not os.path.exists(path):
            return False
        try:
            with open(path) as f:
                manifest = json.load(f)
            return manifest.get("fingerprint") == fp and manifest.get("done")
        except (json.JSONDecodeError, OSError):
            return False

    def load(self, stage: str):
        return rd.read_parquet(os.path.join(self._stage_dir(stage), "data"))

    def run(self, stage: str, fp_inputs, fn):
        """fn() -> Dataset; skipped (loaded from Parquet) when a manifest
        with the same fingerprint exists. fp_inputs: any JSON-able
        description of config + upstream fingerprints."""
        fp = fingerprint({"stage": stage, "inputs": fp_inputs})
        if self.is_done(stage, fp):
            self._lineage.append(
                {"stage": stage, "fingerprint": fp, "skipped": True}
            )
            return self.load(stage), fp
        t0 = time.perf_counter()
        ds = fn()
        data_dir = os.path.join(self._stage_dir(stage), "data")
        os.makedirs(data_dir, exist_ok=True)
        ds.write_parquet(data_dir)
        out = rd.read_parquet(data_dir)
        rows = out.count()
        wall = time.perf_counter() - t0
        record = {
            "stage": stage,
            "fingerprint": fp,
            "rows_out": rows,
            "wall_s": round(wall, 3),
            "done": True,
        }
        with open(self._manifest_path(stage), "w") as f:
            json.dump(record, f)
        self._lineage.append({**record, "skipped": False})
        return out, fp

    def write_lineage(self) -> str:
        """Lineage/metrics table -> Parquet (SURVEY §1.3 lineage row:
        stage, rows_out, wall_s, fingerprint)."""
        path = os.path.join(self.root, "lineage")
        os.makedirs(path, exist_ok=True)
        tbl = pa.table(
            {
                "stage": pa.array(
                    [r["stage"] for r in self._lineage], pa.string()),
                "fingerprint": pa.array(
                    [r["fingerprint"] for r in self._lineage], pa.string()),
                "rows_out": pa.array(
                    [r.get("rows_out") for r in self._lineage], pa.int64()),
                "wall_s": pa.array(
                    [r.get("wall_s") for r in self._lineage], pa.float64()),
                "skipped": pa.array(
                    [r.get("skipped", False) for r in self._lineage],
                    pa.bool_()),
            }
        )
        import pyarrow.parquet as pq

        pq.write_table(tbl, os.path.join(path, "lineage.parquet"))
        return path
