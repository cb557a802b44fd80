"""CLI e2e: python -m raylink.cli over a tiny pages fixture — outputs,
report JSON, and the --sample-per-cluster QC step (top_k_per_group)."""

import json
import os

import pyarrow.parquet as pq

import ray.data as rd

from raylink.cli import main
from raylink.fixtures import build_pages


def test_cli_end_to_end_with_cluster_sample(tmp_path, capsys):
    pages, _ = build_pages(40, seed=42)
    pages_path = str(tmp_path / "pages.parquet")
    pq.write_table(pages, pages_path)
    out_dir = str(tmp_path / "out")

    rc = main([
        "--pages", pages_path, "--out", out_dir,
        "--no-unmatched", "--no-salting",
        "--sample-per-cluster", "2",
    ])
    assert rc == 0
    report = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert report["edges"] > 0 and report["clusters"] > 0
    assert report["cluster_sample"] > 0

    sample = rd.read_parquet(
        os.path.join(out_dir, "cluster_sample")).to_pandas()
    clusters = rd.read_parquet(
        os.path.join(out_dir, "clusters")).to_pandas()
    # per-cluster counts: min(2, cluster size), members are the
    # lexicographically-first ids of each cluster
    sizes = clusters.groupby("cluster_id").size()
    got = sample.groupby("cluster_id").size()
    for cid, n in got.items():
        assert n == min(2, sizes[cid])
    first2 = (clusters.sort_values(["cluster_id", "id"])
              .groupby("cluster_id").head(2))
    assert (set(map(tuple, sample[["cluster_id", "id"]].values))
            == set(map(tuple, first2[["cluster_id", "id"]].values)))


def test_cli_rerun_same_out_does_not_mix_stale_files(tmp_path, capsys):
    """write_parquet appends uniquely-named files, so a re-run with the
    same --out used to double-count every stage and feed the previous
    run's rows into cluster_sample; the CLI now clears each stage dir
    before writing."""
    pages, _ = build_pages(30, seed=7)
    pages_path = str(tmp_path / "pages.parquet")
    pq.write_table(pages, pages_path)
    out_dir = str(tmp_path / "out")

    args = ["--pages", pages_path, "--out", out_dir,
            "--no-unmatched", "--no-salting", "--sample-per-cluster", "1"]
    assert main(args) == 0
    first = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert main(args) == 0
    second = json.loads(capsys.readouterr().out.strip().splitlines()[-1])

    for key in ("edges", "clusters", "cluster_sample"):
        assert second[key] == first[key], key
    # the on-disk stage dirs hold exactly one run's rows
    assert (rd.read_parquet(os.path.join(out_dir, "edges")).count()
            == first["edges"])
    clusters = rd.read_parquet(
        os.path.join(out_dir, "clusters")).to_pandas()
    assert not clusters.duplicated(subset=["id"]).any()


def test_cli_rejects_missing_config_path(tmp_path, capsys):
    """A typo'd --match-config must not fail silently: the library
    keeps the reference's missing-file -> {} semantics
    (addresskit/match.py:35-39), but an explicitly-passed CLI path
    that does not exist is a hard config error (the loader defaults —
    left_id='id', single global block — would only crash later inside
    a Ray task)."""
    pages, _ = build_pages(10, seed=3)
    pages_path = str(tmp_path / "pages.parquet")
    pq.write_table(pages, pages_path)

    rc = main(["--pages", pages_path, "--out", str(tmp_path / "o"),
               "--match-config", str(tmp_path / "nope.yaml")])
    assert rc == 2
    err = capsys.readouterr().err
    assert "does not exist" in err and "nope.yaml" in err
