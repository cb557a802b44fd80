"""Checkpoints with PER-PARTITION lineage + partition-granular resume
— the resumability story required by the north rule ("resumable from
checkpoint with per-partition lineage + metrics").

Replaces the reference's md5-keyed pickle cache
(scripts/baseline_submission.py:51-92) and its interim CSV files
(README-ARCHITECTURE.md:112-117). Two granularities:

- :meth:`CheckpointManager.run` — stage-level: the stage output is
  written as one Parquet directory plus ``manifest.json`` recording
  (stage, config+upstream fingerprint, row count, wall seconds); a
  rerun with the same fingerprint reads it back.

- :meth:`CheckpointManager.run_partitioned` — partition-level, for
  MAP-LIKE stages (every output row carries a stable id and derives
  only from input rows with the same id-hash partition). Each
  partition is written by its own task as an ATOMIC Parquet file
  (tmp + rename) followed by a JSON sidecar under ``parts/`` —
  crash-consistent without any driver involvement. A resumed run
  scans the sidecars, SKIPS finished partitions at the input read
  (their rows never reach the transform), recomputes only the missing
  ones, and the lineage table gains one row per partition. A stage
  that died 90% through recomputes only the missing 10%.

Ray Data provides no checkpointing itself, so this is explicit.
"""

from __future__ import annotations

import json
import os
import time

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd

from .config import fingerprint

_PART_COL = "_ckpt_part"


def _schema_hex(ds) -> str | None:
    """Arrow-IPC hex of a Dataset's schema (JSON-safe), or None when
    the schema is unknowable. Known limit: a fully-EMPTY pandas-origin
    dataset has no schema anywhere in Ray (empty blocks skip both the
    UDF and format conversion), so only arrow-shaped stages — every
    repo pipeline — round-trip their schema through a zero-row
    checkpoint."""
    try:
        sch = ds.schema()
        if sch is None or not sch.names:
            return None
        arrow = pa.schema(list(zip(sch.names, sch.types)))
        return bytes(arrow.serialize()).hex()
    except Exception:
        return None


def partition_of(values, num_partitions: int) -> np.ndarray:
    """Deterministic id -> partition map used on BOTH the input filter
    and the output router. Non-string ids are canonicalized to their
    STRING form before hashing: hash_array(int id) differs from
    hash_array(str id), so a fn that changes the id column's dtype
    (e.g. match casts ids to pa.string()) would otherwise route output
    rows into different partitions than the input filter drops —
    silent row loss on resume (code-review r5). String ids (the repo's
    url/block_key usage) take the fast path untouched."""
    arr = np.asarray(values)
    if arr.dtype.kind not in ("O", "S"):
        arr = arr.astype("U").astype(object)
    return (pd.util.hash_array(arr, categorize=False)
            % np.uint64(num_partitions)).astype(np.int32)


class CheckpointManager:
    def __init__(self, root: str):
        self.root = root
        os.makedirs(root, exist_ok=True)
        self._lineage: list[dict] = []

    # ------------------------------------------------------------------
    # shared paths / manifest helpers
    # ------------------------------------------------------------------
    def _stage_dir(self, stage: str) -> str:
        return os.path.join(self.root, stage)

    def _manifest_path(self, stage: str) -> str:
        return os.path.join(self._stage_dir(stage), "manifest.json")

    def _read_manifest(self, stage: str) -> dict | None:
        path = self._manifest_path(stage)
        if not os.path.exists(path):
            return None
        try:
            with open(path) as f:
                return json.load(f)
        except (json.JSONDecodeError, OSError):
            return None

    def is_done(self, stage: str, fp: str) -> bool:
        m = self._read_manifest(stage)
        return bool(m and m.get("fingerprint") == fp and m.get("done"))

    def _invalidate_manifest(self, stage: str) -> None:
        """Remove the stage's done-manifest BEFORE mutating its data
        dir. Without this, a crash mid-recompute at a NEW fingerprint
        leaves the OLD fingerprint's manifest vouching for a data dir
        that now holds partial new-fingerprint files — a later run at
        the old config would skip recompute and load wrong rows
        (code-review r5). With it, the crash window degrades to a full
        (or sidecar-granular) recompute, never silent wrong data."""
        path = self._manifest_path(stage)
        if os.path.exists(path):
            os.remove(path)

    def load(self, stage: str):
        data_dir = os.path.join(self._stage_dir(stage), "data")
        files = sorted(
            os.path.join(data_dir, f) for f in os.listdir(data_dir)
            if f.endswith(".parquet")
        ) if os.path.isdir(data_dir) else []
        if not files:
            # a stage can legitimately produce ZERO rows; a bare
            # pa.table({}) has no columns and crashes consumers that
            # select the stage's schema — reconstruct the empty table
            # from the schema persisted in the manifest (code-review r5)
            m = self._read_manifest(stage) or {}
            if m.get("schema_hex"):
                sch = pa.ipc.read_schema(
                    pa.BufferReader(bytes.fromhex(m["schema_hex"])))
                return rd.from_arrow(sch.empty_table())
            return rd.from_arrow(pa.table({}))
        return rd.read_parquet(files)

    # ------------------------------------------------------------------
    # stage-level checkpoint (coarse; any stage shape)
    # ------------------------------------------------------------------
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
        # any manifest present here is stale (wrong fingerprint or not
        # done) — drop it BEFORE touching the data dir so a crash
        # between the clear and the fresh manifest can never leave an
        # old manifest vouching for new/partial data (code-review r5)
        self._invalidate_manifest(stage)
        for name in os.listdir(data_dir):
            # stale files from an older fingerprint would otherwise be
            # read back alongside the fresh write
            os.remove(os.path.join(data_dir, name))
        ds.write_parquet(data_dir)
        schema_hex = None
        if not any(f.endswith(".parquet") for f in os.listdir(data_dir)):
            # zero-row stage: no parquet file carries the schema, so
            # persist it in the manifest (ds.schema() may re-execute
            # the zero-row plan — rare, and downstream select_columns
            # correctness beats the extra pass; code-review r5)
            schema_hex = _schema_hex(ds)
        record = {
            "stage": stage,
            "fingerprint": fp,
            "wall_s": None,
            "done": True,
        }
        if schema_hex:
            record["schema_hex"] = schema_hex
        # manifest must exist before load() so a zero-row stage can
        # reconstruct its schema; rows_out is patched in after
        with open(self._manifest_path(stage), "w") as f:
            json.dump(record, f)
        out = self.load(stage)
        rows = out.count()
        record["rows_out"] = rows
        record["wall_s"] = round(time.perf_counter() - t0, 3)
        with open(self._manifest_path(stage), "w") as f:
            json.dump(record, f)
        self._lineage.append({**record, "skipped": False})
        return out, fp

    # ------------------------------------------------------------------
    # partition-level checkpoint (map-like stages)
    # ------------------------------------------------------------------
    def _parts_dir(self, stage: str) -> str:
        return os.path.join(self._stage_dir(stage), "parts")

    def done_partitions(self, stage: str, fp: str) -> dict[int, dict]:
        """{partition: sidecar record} for every crash-consistent
        per-partition sidecar whose fingerprint matches ``fp``."""
        pdir = self._parts_dir(stage)
        if not os.path.isdir(pdir):
            return {}
        done: dict[int, dict] = {}
        for name in os.listdir(pdir):
            if not name.endswith(".json"):
                continue
            try:
                with open(os.path.join(pdir, name)) as f:
                    rec = json.load(f)
            except (json.JSONDecodeError, OSError):
                continue
            if rec.get("fingerprint") == fp and "partition" in rec:
                done[int(rec["partition"])] = rec
        return done

    def run_partitioned(self, stage: str, fp_inputs, ds_in, fn,
                        id_col: str, out_id_col: str | None = None,
                        num_partitions: int = 32,
                        _inject_fail_partitions=None):
        """Partition-granular checkpoint/resume for MAP-LIKE stages.

        CONTRACT: ``fn(ds) -> Dataset`` where every output row carries
        ``out_id_col`` (default ``id_col``) and derives ONLY from input
        rows whose ``id_col`` value hashes to the same partition
        (partition = hash(id) % num_partitions). Any per-row transform
        — including filters and row expansions — keyed on a stable id
        satisfies this; so does blocked pairwise matching keyed on the
        block key (every edge lives inside one block).

        Each partition is written by its own task: Parquet via
        tmp + ``os.rename`` (atomic on POSIX), then a JSON sidecar
        (partition, rows, fingerprint, wall_s). Sidecar presence IS the
        completion record — it survives a driver crash. On resume,
        finished partitions are dropped from the INPUT with a
        vectorized mask (their rows never reach ``fn``), stale files
        from older fingerprints are cleared, and only missing
        partitions recompute.

        Scale note: routing the output to one file per partition is a
        hash shuffle (``groupby(partition)``) — the price of exact
        partition ownership. Size ``num_partitions`` so a partition
        fits a worker's heap; at cluster scale use O(input shards).

        ``_inject_fail_partitions``: fault-injection hook for tests —
        the writer raises for those partitions INSTEAD of writing,
        simulating a mid-write crash.
        """
        out_id_col = out_id_col or id_col
        fp = fingerprint({"stage": stage, "inputs": fp_inputs,
                          "num_partitions": num_partitions,
                          "granularity": "partition"})
        sdir = self._stage_dir(stage)
        data_dir = os.path.join(sdir, "data")
        parts_dir = self._parts_dir(stage)
        os.makedirs(data_dir, exist_ok=True)
        os.makedirs(parts_dir, exist_ok=True)

        done = self.done_partitions(stage, fp)
        if self.is_done(stage, fp):
            for p, rec in sorted(done.items()):
                self._lineage.append({
                    "stage": stage, "partition": p, "fingerprint": fp,
                    "rows_out": rec.get("rows"),
                    "wall_s": rec.get("wall_s"), "skipped": True})
            return self.load(stage), fp

        # the manifest present here (if any) is stale — drop it BEFORE
        # the stale-clean below mutates sidecars/data, so a crash
        # mid-recompute can never leave an old-fingerprint manifest
        # vouching for a partially-rewritten data dir; the crash window
        # degrades to sidecar-granular recompute (code-review r5)
        self._invalidate_manifest(stage)

        # clear stale artifacts of NOT-done partitions (older
        # fingerprints, interrupted tmp files) so a recomputed-empty
        # partition can't leave a stale file behind for load().
        # ORDER MATTERS (code-review r4): sidecars are removed BEFORE
        # their parquet files — the crash invariant is "sidecar
        # present ⇒ its data file is present and complete", and
        # deleting data first would leave a window where a crash
        # strands a sidecar whose data is gone, which a later resume
        # at the sidecar's fingerprint would trust (silent row loss).
        done_names = {f"part-{p:05d}" for p in done}
        for d, suffix in ((parts_dir, ".json"), (data_dir, ".parquet")):
            for name in os.listdir(d):
                stem = name.split(".")[0]
                if not name.endswith(suffix) or stem not in done_names:
                    os.remove(os.path.join(d, name))

        t0 = time.perf_counter()
        done_list = sorted(done)

        def drop_done(t: pa.Table) -> pa.Table:
            if t.num_rows == 0:
                return t
            if id_col not in t.column_names:
                # loud, like route(): silently passing rows through
                # would recompute finished partitions AND double-count
                # them in the manifest (code-review r4)
                raise ValueError(
                    f"run_partitioned({stage!r}): resume input lacks "
                    f"the id column {id_col!r}")
            part = partition_of(
                np.asarray(t.column(id_col)), num_partitions)
            return t.filter(
                pa.array(~np.isin(part, done_list)))

        pending_in = (ds_in.map_batches(drop_done, batch_format="pyarrow")
                      if done else ds_in)
        out = fn(pending_in)

        def route(t: pa.Table) -> pa.Table:
            if out_id_col not in t.column_names:
                # loud contract violation (empty blocks skip the UDF,
                # so reaching here means fn really dropped the id)
                raise ValueError(
                    f"run_partitioned({stage!r}): fn output lacks the "
                    f"routing column {out_id_col!r}")
            part = partition_of(
                np.asarray(t.column(out_id_col)), num_partitions)
            if _PART_COL in t.column_names:
                t = t.drop_columns([_PART_COL])
            return t.append_column(_PART_COL, pa.array(part))

        inject = set(_inject_fail_partitions or ())
        manifest_schema = pa.schema([
            ("partition", pa.int32()), ("rows", pa.int64()),
            ("wall_s", pa.float64())])

        def write_part(g: pa.Table) -> pa.Table:
            if _PART_COL not in g.column_names or g.num_rows == 0:
                return manifest_schema.empty_table()
            p = int(g.column(_PART_COL)[0].as_py())
            if p in inject:
                raise RuntimeError(
                    f"injected failure for partition {p}")
            tw0 = time.perf_counter()
            tbl = g.drop_columns([_PART_COL])
            import pyarrow.parquet as pq

            final = os.path.join(data_dir, f"part-{p:05d}.parquet")
            tmp = final + f".tmp{os.getpid()}"
            pq.write_table(tbl, tmp)
            os.rename(tmp, final)
            rec = {"partition": p, "rows": tbl.num_rows,
                   "fingerprint": fp,
                   "wall_s": round(time.perf_counter() - tw0, 3)}
            spath = os.path.join(parts_dir, f"part-{p:05d}.json")
            stmp = spath + f".tmp{os.getpid()}"
            with open(stmp, "w") as f:
                json.dump(rec, f)
            os.rename(stmp, spath)
            return pa.table({
                "partition": pa.array([p], pa.int32()),
                "rows": pa.array([tbl.num_rows], pa.int64()),
                "wall_s": pa.array([rec["wall_s"]], pa.float64())})

        written = (
            out.map_batches(route, batch_format="pyarrow")
            .groupby(_PART_COL)
            .map_groups(write_part, batch_format="pyarrow")
            .take_all()
        )
        wall = time.perf_counter() - t0
        for p, rec in sorted(done.items()):
            self._lineage.append({
                "stage": stage, "partition": p, "fingerprint": fp,
                "rows_out": rec.get("rows"),
                "wall_s": rec.get("wall_s"), "skipped": True})
        for r in sorted(written, key=lambda r: r["partition"]):
            self._lineage.append({
                "stage": stage, "partition": int(r["partition"]),
                "fingerprint": fp, "rows_out": int(r["rows"]),
                "wall_s": float(r["wall_s"]), "skipped": False})
        record = {
            "stage": stage, "fingerprint": fp, "done": True,
            "granularity": "partition",
            "num_partitions": num_partitions,
            "partitions_resumed": len(done),
            "partitions_computed": len(written),
            "rows_out": int(sum(r["rows"] for r in written)
                            + sum(rec.get("rows", 0)
                                  for rec in done.values())),
            "wall_s": round(wall, 3),
        }
        if not written and not done:
            # zero-output stage: no parquet file carries the schema, so
            # persist it for load() (re-executes `out`, which produced
            # zero rows — rare, and correctness of downstream
            # select_columns beats the extra pass; code-review r5)
            hexed = _schema_hex(out)
            if hexed:
                record["schema_hex"] = hexed
        with open(self._manifest_path(stage), "w") as f:
            json.dump(record, f)
        return self.load(stage), fp

    def write_lineage(self) -> str:
        """Lineage/metrics table -> Parquet. One row per stage for
        stage-level checkpoints, one row PER PARTITION for partitioned
        ones (north rule: per-partition lineage + metrics); the
        ``partition`` column is null on stage-level rows."""
        path = os.path.join(self.root, "lineage")
        os.makedirs(path, exist_ok=True)
        tbl = pa.table(
            {
                "stage": pa.array(
                    [r["stage"] for r in self._lineage], pa.string()),
                "partition": pa.array(
                    [r.get("partition") for r in self._lineage],
                    pa.int32()),
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
