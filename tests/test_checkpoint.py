"""Partition-granular checkpoint/resume (north rule: "resumable from
checkpoint with per-partition lineage + metrics").

The crash simulations exploit the writer's atomicity contract: each
partition lands as Parquet-via-rename + JSON sidecar, so the on-disk
state after ANY crash is exactly "some partitions fully present with
sidecars, the rest absent" — which the deletion-based test reproduces
deterministically and the fault-injection test reproduces live."""

import json
import os

import numpy as np
import pandas as pd
import pyarrow.parquet as pq
import pytest
import ray.data as rd

from raylink.checkpoint import CheckpointManager, partition_of

P = 8


def _input(n=400):
    return rd.from_pandas(pd.DataFrame({
        "id": np.arange(n, dtype=np.int64),
        "val": np.arange(n, dtype=np.int64) * 10,
    })).repartition(4)


def _mk_fn(tag, seen):
    """Map-like transform that records which ids reached it (via a
    plain list — fine single-node in-process for from_pandas inputs
    processed in the driver... NOT guaranteed; so record through the
    OUTPUT instead: a `run` column). `seen` kept for the doubled col."""

    def fn(ds):
        def f(t):
            return t.assign(out=t["val"] + 1, run=tag)

        return ds.map_batches(f, batch_format="pandas")

    return fn


def test_partitioned_resume_recomputes_only_missing(tmp_path):
    mgr = CheckpointManager(str(tmp_path))
    ds1, fp = mgr.run_partitioned(
        "stage", {"cfg": 1}, _input(), _mk_fn(1, None), id_col="id",
        num_partitions=P)
    full = ds1.to_pandas().sort_values("id").reset_index(drop=True)
    assert len(full) == 400
    assert (full["run"] == 1).all()
    sdir = tmp_path / "stage"
    files = sorted(os.listdir(sdir / "data"))
    sides = sorted(os.listdir(sdir / "parts"))
    assert len(files) == len(sides) > 0

    # simulate a run that crashed before finishing partitions 2 and 5:
    # their data+sidecar absent, stage manifest absent (exactly the
    # crash-consistent state the atomic writer guarantees)
    for p in (2, 5):
        os.remove(sdir / "data" / f"part-{p:05d}.parquet")
        os.remove(sdir / "parts" / f"part-{p:05d}.json")
    os.remove(sdir / "manifest.json")

    mgr2 = CheckpointManager(str(tmp_path))
    ds2, fp2 = mgr2.run_partitioned(
        "stage", {"cfg": 1}, _input(), _mk_fn(2, None), id_col="id",
        num_partitions=P)
    assert fp2 == fp
    got = ds2.to_pandas().sort_values("id").reset_index(drop=True)
    # value-complete vs the full run
    pd.testing.assert_frame_equal(got[["id", "val", "out"]],
                                  full[["id", "val", "out"]])
    # ONLY the two missing partitions were recomputed (their rows carry
    # run=2; every other row still carries run=1 from the parquet)
    part = partition_of(got["id"].to_numpy(), P)
    recomputed = set(np.unique(part[got["run"] == 2]))
    kept = set(np.unique(part[got["run"] == 1]))
    assert recomputed == {2, 5}
    assert kept == set(range(P)) - {2, 5}

    # per-partition lineage: one row per partition, skipped flags right
    lt = pq.read_table(
        f"{mgr2.write_lineage()}/lineage.parquet").to_pandas()
    st = lt[lt["stage"] == "stage"]
    assert sorted(st["partition"]) == list(range(P))
    assert set(st[st["skipped"]]["partition"]) == set(range(P)) - {2, 5}
    assert set(st[~st["skipped"]]["partition"]) == {2, 5}
    assert (st["rows_out"] > 0).all()

    # a third run with everything done: zero recompute, all skipped
    mgr3 = CheckpointManager(str(tmp_path))
    ds3, _ = mgr3.run_partitioned(
        "stage", {"cfg": 1}, _input(), _mk_fn(3, None), id_col="id",
        num_partitions=P)
    assert (ds3.to_pandas()["run"] != 3).all()


def test_partitioned_midwrite_crash_then_resume(tmp_path):
    mgr = CheckpointManager(str(tmp_path))
    with pytest.raises(Exception, match="injected failure"):
        mgr.run_partitioned(
            "stage", {"cfg": 1}, _input(), _mk_fn(1, None), id_col="id",
            num_partitions=P, _inject_fail_partitions={3})
    sdir = tmp_path / "stage"
    assert not os.path.exists(sdir / "manifest.json")
    # whatever partitions finished before the crash are on disk with
    # sidecars; partition 3 is not
    survived = {int(json.load(open(sdir / "parts" / n))["partition"])
                for n in os.listdir(sdir / "parts")}
    assert 3 not in survived

    mgr2 = CheckpointManager(str(tmp_path))
    ds, _ = mgr2.run_partitioned(
        "stage", {"cfg": 1}, _input(), _mk_fn(2, None), id_col="id",
        num_partitions=P)
    got = ds.to_pandas().sort_values("id").reset_index(drop=True)
    assert len(got) == 400
    assert (got["out"] == got["val"] + 1).all()
    part = partition_of(got["id"].to_numpy(), P)
    # every partition that survived the crash was NOT recomputed
    for p in survived:
        assert (got["run"][part == p] == 1).all()
    assert (got["run"][part == 3] == 2).all()


def test_partitioned_fingerprint_change_recomputes_all(tmp_path):
    mgr = CheckpointManager(str(tmp_path))
    mgr.run_partitioned("stage", {"cfg": 1}, _input(), _mk_fn(1, None),
                        id_col="id", num_partitions=P)
    # changed config -> new fingerprint -> stale partitions cleared,
    # full recompute, and NO duplicate rows from stale files
    ds, _ = mgr.run_partitioned("stage", {"cfg": 2}, _input(),
                                _mk_fn(2, None), id_col="id",
                                num_partitions=P)
    got = ds.to_pandas()
    assert len(got) == 400
    assert (got["run"] == 2).all()


def test_pipeline_partitioned_resume(tmp_path):
    """Integrated run_linkage: kill two finished `prepared` partitions
    and one `edges` partition, resume, and the edge set is unchanged —
    with the untouched partitions served from their checkpoint files
    (their sidecars' mtimes don't change)."""
    from raylink.config import MatchConfig
    from raylink.fixtures import build_pages
    from raylink.pipeline import run_linkage

    cfg = MatchConfig(threshold=85.0, topk=3, scorer="token_set_ratio",
                      block_by="digits+prefix6",
                      left_id="url", right_id="url")
    pages, _ = build_pages(60, seed=42)
    ds = rd.from_arrow(pages)
    ck = str(tmp_path / "ck")
    out1 = run_linkage(ds, match_cfg=cfg, checkpoint_dir=ck,
                       with_clusters=False, with_unmatched=False,
                       salt_hot_blocks=False)
    want = out1["edges"].to_pandas().sort_values(
        ["left_id", "right_id"]).reset_index(drop=True)
    assert len(want) > 0

    def kill(stage, n):
        sdir = os.path.join(ck, stage)
        victims = sorted(os.listdir(os.path.join(sdir, "data")))[:n]
        for v in victims:
            os.remove(os.path.join(sdir, "data", v))
            os.remove(os.path.join(
                sdir, "parts", v.split(".")[0] + ".json"))
        os.remove(os.path.join(sdir, "manifest.json"))
        return {v.split(".")[0] for v in victims}

    killed_prep = kill("prepared", 2)
    killed_edges = kill("edges", 1)
    before = {
        stage: {n: os.path.getmtime(os.path.join(ck, stage, "parts", n))
                for n in os.listdir(os.path.join(ck, stage, "parts"))}
        for stage in ("prepared", "edges")
    }
    out2 = run_linkage(ds, match_cfg=cfg, checkpoint_dir=ck,
                       with_clusters=False, with_unmatched=False,
                       salt_hot_blocks=False)
    got = out2["edges"].to_pandas().sort_values(
        ["left_id", "right_id"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want)
    for stage, mt in before.items():
        after_dir = os.path.join(ck, stage, "parts")
        for n, t in mt.items():
            assert os.path.getmtime(os.path.join(after_dir, n)) == t, \
                f"{stage}/{n} was rewritten despite being finished"
        killed = killed_prep if stage == "prepared" else killed_edges
        for stem in killed:
            assert os.path.exists(os.path.join(after_dir, stem + ".json"))


def test_partitioned_fn_filter_and_expand(tmp_path):
    """The contract covers filters and row expansions keyed on the id:
    fn drops odd ids and duplicates rows for ids % 100 == 0."""

    def fn(ds):
        def f(t: pd.DataFrame) -> pd.DataFrame:
            t = t[t["id"] % 2 == 0]
            dup = t[t["id"] % 100 == 0]
            return pd.concat([t, dup], ignore_index=True)

        return ds.map_batches(f, batch_format="pandas")

    mgr = CheckpointManager(str(tmp_path))
    ds1, _ = mgr.run_partitioned("s", {"c": 1}, _input(), fn,
                                 id_col="id", num_partitions=P)
    want = ds1.to_pandas().sort_values(["id", "val"]).reset_index(
        drop=True)
    assert len(want) == 200 + 4  # evens + dups of 0,100,200,300
    sdir = tmp_path / "s"
    victims = sorted(os.listdir(sdir / "data"))[:2]
    for v in victims:
        p = v.split(".")[0]
        os.remove(sdir / "data" / v)
        os.remove(sdir / "parts" / f"{p}.json")
    os.remove(sdir / "manifest.json")
    ds2, _ = mgr.run_partitioned("s", {"c": 1}, _input(), fn,
                                 id_col="id", num_partitions=P)
    got = ds2.to_pandas().sort_values(["id", "val"]).reset_index(
        drop=True)
    pd.testing.assert_frame_equal(got, want)


def test_pipeline_sigkill_resume(tmp_path):
    """Killed-RUN evidence at the run_linkage level (VERDICT r4 #5),
    complementing the deletion-based simulation above: a linkage driver
    process is SIGKILLed while its `prepared` partitions are landing;
    a fresh run over the same checkpoint dir resumes, produces the
    same edge set as an uncheckpointed run, and the partitions that
    survived the kill are served from disk (their sidecar mtimes do
    not change — no re-extraction)."""
    import subprocess
    import sys
    import time as _t

    from raylink.config import MatchConfig
    from raylink.fixtures import build_pages
    from raylink.pipeline import run_linkage

    pages, _ = build_pages(3000, seed=11)
    src = str(tmp_path / "pages.parquet")
    pq.write_table(pages, src)
    ck = str(tmp_path / "ck")
    script = f"""
import ray
ray.init(address="local", num_cpus=4, include_dashboard=False,
         logging_level="ERROR")
from ray.data import DataContext
DataContext.get_current().enable_progress_bars = False
import ray.data as rd
from raylink.config import MatchConfig
from raylink.pipeline import run_linkage
cfg = MatchConfig(threshold=85.0, topk=3, scorer="token_set_ratio",
                  block_by="digits+prefix6",
                  left_id="url", right_id="url")
out = run_linkage(rd.read_parquet({src!r}), match_cfg=cfg,
                  checkpoint_dir={ck!r}, with_clusters=False,
                  with_unmatched=False, salt_hot_blocks=False)
print(out["edges"].count())
"""
    parts_dir = os.path.join(ck, "prepared", "parts")

    def _complete_sidecars():
        if not os.path.isdir(parts_dir):
            return []
        return sorted(n for n in os.listdir(parts_dir)
                      if n.endswith(".json"))

    proc = subprocess.Popen([sys.executable, "-c", script],
                            cwd="/root/repo",
                            stdout=subprocess.DEVNULL,
                            stderr=subprocess.DEVNULL)
    try:
        deadline = _t.time() + 300
        seen = 0
        while _t.time() < deadline:
            seen = len(_complete_sidecars())
            if seen >= 2:
                break
            if proc.poll() is not None:
                break
            _t.sleep(0.02)
    finally:
        if proc.poll() is None:
            proc.kill()
        proc.wait()
    assert seen >= 2, "subprocess never wrote prepared partitions"
    # killing the DRIVER does not instantly kill its Ray workers —
    # write_part tasks already in flight keep landing renames for a
    # moment. Wait for the dir to quiesce before snapshotting, else
    # listdir/getmtime race the stragglers.
    stable_since, last = _t.time(), None
    while _t.time() - stable_since < 1.5:
        cur = _complete_sidecars()
        if cur != last:
            last, stable_since = cur, _t.time()
        _t.sleep(0.1)
        if _t.time() > deadline:
            break
    # the kill must have landed mid-run: the stage manifest (written
    # only by the driver after ALL partitions) must be absent
    assert not os.path.exists(
        os.path.join(ck, "prepared", "manifest.json")), \
        "kill landed after the prepared stage completed; grow the " \
        "fixture if this becomes flaky"
    survived = {
        n: os.path.getmtime(os.path.join(parts_dir, n))
        for n in _complete_sidecars()}
    assert survived, "no partition survived the kill"

    cfg = MatchConfig(threshold=85.0, topk=3, scorer="token_set_ratio",
                      block_by="digits+prefix6",
                      left_id="url", right_id="url")
    resumed = run_linkage(rd.read_parquet(src), match_cfg=cfg,
                          checkpoint_dir=ck, with_clusters=False,
                          with_unmatched=False, salt_hot_blocks=False)
    got = resumed["edges"].to_pandas().sort_values(
        ["left_id", "right_id"]).reset_index(drop=True)
    clean = run_linkage(rd.read_parquet(src), match_cfg=cfg,
                        with_clusters=False, with_unmatched=False,
                        salt_hot_blocks=False)
    want = clean["edges"].to_pandas().sort_values(
        ["left_id", "right_id"]).reset_index(drop=True)
    assert len(want) > 0
    pd.testing.assert_frame_equal(got, want)
    for n, t in survived.items():
        p = os.path.join(parts_dir, n)
        assert os.path.exists(p) and os.path.getmtime(p) == t, \
            f"prepared/{n} was recomputed despite surviving the kill"


def test_partition_of_dtype_canonical():
    """int ids and their string forms must map to the SAME partitions:
    a fn that casts the id dtype (match casts ids to pa.string())
    would otherwise route outputs into different partitions than the
    input filter drops — silent row loss on resume (code-review r5)."""
    ints = np.array([0, 7, 42, 999999], dtype=np.int64)
    strs = np.array(["0", "7", "42", "999999"], dtype=object)
    np.testing.assert_array_equal(
        partition_of(ints, P), partition_of(strs, P))


def test_stage_crash_invalidates_stale_manifest(tmp_path):
    """A crash during a NEW-fingerprint recompute must not leave the
    OLD fingerprint's manifest vouching for the cleared/partial data
    dir (code-review r5): the manifest is invalidated BEFORE the data
    dir is touched, so the worst case is a full recompute — never
    stale rows served as current."""
    mgr = CheckpointManager(str(tmp_path))
    mgr.run("s", {"cfg": 1}, lambda: rd.range(50))

    def boom():
        def f(t):
            raise RuntimeError("boom during write")

        return rd.range(50).map_batches(f)

    with pytest.raises(Exception, match="boom"):
        CheckpointManager(str(tmp_path)).run("s", {"cfg": 2}, boom)
    assert not os.path.exists(tmp_path / "s" / "manifest.json")
    out, _ = CheckpointManager(str(tmp_path)).run(
        "s", {"cfg": 1}, lambda: rd.range(50))
    assert out.count() == 50


def test_partitioned_crash_invalidates_stale_manifest(tmp_path):
    """Same invariant for run_partitioned: complete at cfg1, crash
    mid-recompute at cfg2, then resume at cfg1 — the stale cfg1
    manifest must be gone at the crash point and the cfg1 resume must
    trust NOTHING from the half-done cfg2 run (its sidecars carry the
    cfg2 fingerprint), i.e. every row recomputes."""
    CheckpointManager(str(tmp_path)).run_partitioned(
        "stage", {"cfg": 1}, _input(), _mk_fn(1, None), id_col="id",
        num_partitions=P)
    with pytest.raises(Exception, match="injected failure"):
        CheckpointManager(str(tmp_path)).run_partitioned(
            "stage", {"cfg": 2}, _input(), _mk_fn(2, None), id_col="id",
            num_partitions=P, _inject_fail_partitions={5})
    assert not os.path.exists(tmp_path / "stage" / "manifest.json")
    ds, _ = CheckpointManager(str(tmp_path)).run_partitioned(
        "stage", {"cfg": 1}, _input(), _mk_fn(3, None), id_col="id",
        num_partitions=P)
    got = ds.to_pandas()
    assert len(got) == 400
    assert (got["out"] == got["val"] + 1).all()
    assert (got["run"] == 3).all()


def test_zero_row_stage_preserves_schema(tmp_path):
    """A stage that legitimately yields zero rows must round-trip its
    SCHEMA through the checkpoint: downstream consumers select the
    stage's columns and crash on a column-less empty table
    (code-review r5). The schema is persisted in the manifest. The
    stage uses pyarrow batches like every repo pipeline (the review's
    scenario was the arrow-based edges stage) — empty PANDAS-origin
    blocks lose their schema inside Ray itself (UDF and format
    conversion are both skipped for empty blocks), which no
    checkpoint layer can recover."""
    import pyarrow as pa
    import pyarrow.compute as pc

    df = pd.DataFrame({"left_id": ["a"], "score": [1.0]})

    def empty():
        def f(t):
            return t.filter(pc.less(t.column("score"), 0.0))

        return rd.from_arrow(pa.Table.from_pandas(df)).map_batches(
            f, batch_format="pyarrow")

    mgr = CheckpointManager(str(tmp_path))
    out, _ = mgr.run("s", {"cfg": 1}, empty)
    assert out.count() == 0
    assert set(out.schema().names) == {"left_id", "score"}
    # resumed (skipped) load reconstructs the same schema
    out2, _ = CheckpointManager(str(tmp_path)).run(
        "s", {"cfg": 1}, empty)
    assert set(out2.schema().names) == {"left_id", "score"}
    assert out2.select_columns(["left_id"]).count() == 0


def test_partitioned_zero_output_schema(tmp_path):
    def drop_all(ds):
        def f(t):
            return t[t["val"] < 0]

        return ds.map_batches(f, batch_format="pandas")

    out, _ = CheckpointManager(str(tmp_path)).run_partitioned(
        "s", {"cfg": 1}, _input(), drop_all, id_col="id",
        num_partitions=P)
    assert out.count() == 0
    assert "id" in set(out.schema().names or [])


def test_checkpointed_linkage_all_rows_filtered(tmp_path, ray_session):
    """Every page dropped by the quality gate -> prepared is EMPTY and
    Dataset.schema() is None; the checkpointed edges branch must fall
    back to the whole-stage checkpoint and return zero edges instead
    of crashing on schema().names (code-review r5)."""
    import pyarrow as pa

    from raylink.config import MatchConfig
    from raylink.fixtures import build_pages, page_html
    from raylink.pipeline import run_linkage

    pages, _ = build_pages(6, seed=11)
    junk = ["!!! ... ???"] * pages.num_rows  # punct-only: gate drops all
    pages = (pages
             .set_column(pages.schema.get_field_index("html"), "html",
                         pa.array([page_html(j, u) for j, u in
                                   zip(junk, pages["url"].to_pylist())],
                                  pa.binary()))
             .set_column(pages.schema.get_field_index("text"), "text",
                         pa.array(junk)))
    cfg = MatchConfig(threshold=85.0, topk=3, block_by="digits+prefix6",
                      left_id="url", right_id="url")
    out = run_linkage(rd.from_arrow(pages), match_cfg=cfg,
                      checkpoint_dir=str(tmp_path / "ck"),
                      with_clusters=False, with_unmatched=False,
                      salt_hot_blocks=False)
    assert out["edges"].count() == 0
