"""Flagship end-to-end linkage pipeline over a Common-Crawl-style pages
table, mirroring the reference's run_pipeline flow
(scripts/run_pipeline.py:11-76: normalize left/right -> match -> report)
as ONE lazy Ray Data DAG per stage instead of subprocess-per-step CSVs.

read_parquet(pages)
  -> ExtractText actor pool (html -> text_extracted, byte-identical)
  -> normalize (config-driven, stateless map_batches)
  -> quality flags + validity filter (suspicious rows quarantined)
  -> split left/right views by url host
  -> blocked pairwise scoring (groupby(block_key).map_groups)
  -> connected components (blocked: one groupby; generic hash-min
     + pointer jumping available for arbitrary edge sets)
  -> unmatched anti-joins.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd

from .checkpoint import CheckpointManager
from .cluster import connected_components
from .config import DEFAULT_NORMALIZE_CFG, MatchConfig, fingerprint
from .extract import extract_dataset
from .match import find_hot_blocks, match_datasets, unmatched
from .normalize import normalize_dataset
from .quality import add_quality_flags, filter_valid_text


def split_left_right(ds, url_col: str = "url",
                     left_prefix: str = "https://siteL",
                     right_prefix: str = "https://siteR"):
    def mk(prefix):
        def f(batch: pa.Table) -> pa.Table:
            return batch.filter(
                pc.starts_with(batch.column(url_col), prefix))
        return f

    return (
        ds.map_batches(mk(left_prefix), batch_format="pyarrow"),
        ds.map_batches(mk(right_prefix), batch_format="pyarrow"),
    )


def prepare_pages(pages, normalize_cfg: dict | None = None,
                  extract_concurrency: int = 4,
                  drop_suspicious: bool = True,
                  with_parse: bool = False,
                  block_by: str | None = None):
    """pages -> normalized/quality-filtered dataset with addr_norm
    (+ parsed field struct when with_parse, per the north-star's
    libpostal-style per-page field parse)."""
    ds = extract_dataset(pages, concurrency=extract_concurrency)
    ds = normalize_dataset(ds, "text_extracted", "addr_norm",
                           normalize_cfg or DEFAULT_NORMALIZE_CFG)
    if with_parse:
        from .parse import parse_dataset

        ds = parse_dataset(ds, "text_extracted")
    ds = add_quality_flags(ds, "addr_norm")
    ds = filter_valid_text(ds, "addr_norm")
    if drop_suspicious:
        ds = ds.map_batches(
            lambda t: t.filter(pc.invert(t.column("is_suspicious"))),
            batch_format="pyarrow",
        )
    if block_by:
        # compute the blocking key once here; the hot-block scan and
        # both match sides reuse the column instead of re-deriving it
        from .blocking import add_block_keys

        ds = add_block_keys(ds, "addr_norm", block_by,
                            allow_single_bucket=True)
    return ds


def run_linkage(pages, match_cfg: MatchConfig | None = None,
                normalize_cfg: dict | None = None,
                checkpoint_dir: str | None = None,
                extract_concurrency: int = 4,
                with_clusters: bool = True,
                with_unmatched: bool = True,
                salt_hot_blocks: bool = True,
                with_parse: bool = True,
                cc_small_threshold: int = 2_000_000):
    """-> dict with 'edges', 'clusters', 'unmatched_left',
    'unmatched_right', 'prepared' Datasets (lazy where possible)."""
    cfg = match_cfg or MatchConfig()
    ckpt = CheckpointManager(checkpoint_dir) if checkpoint_dir else None

    def _prepared():
        return prepare_pages(pages, normalize_cfg,
                             extract_concurrency=extract_concurrency,
                             with_parse=with_parse,
                             block_by=cfg.block_by)

    if ckpt:
        prepared, prep_fp = ckpt.run(
            "prepared",
            {"normalize": normalize_cfg or DEFAULT_NORMALIZE_CFG},
            _prepared,
        )
    else:
        # prepared feeds 2-4 consumers (left/right sides, hot-block
        # scan, unmatched) — pin it in the object store (spills to disk
        # at scale) instead of re-running extract+normalize per consumer
        prepared = _prepared().materialize()
        prep_fp = fingerprint({"normalize": normalize_cfg or
                               DEFAULT_NORMALIZE_CFG})

    left, right = split_left_right(prepared)

    hot: set[str] = set()
    if salt_hot_blocks:
        hot = find_hot_blocks(prepared, "addr_norm", cfg)

    def _edges():
        return match_datasets(
            left, right, cfg,
            left_text_col="addr_norm", right_text_col="addr_norm",
            hot_keys=hot,
        )

    if ckpt:
        edges, edges_fp = ckpt.run(
            "edges", {"prep": prep_fp, "match": cfg.to_dict(),
                      "hot": sorted(hot)}, _edges)
    else:
        # edges feed both the clusters stage and the unmatched
        # anti-joins — materialize so the match shuffle runs once
        edges = _edges().materialize()
        edges_fp = None

    out = {"prepared": prepared, "edges": edges}

    if with_clusters:
        def _clusters():
            # linkage edges are blocked (both endpoints share
            # edges.block_key), so the transitive closure is one
            # groupby shuffle — no iterative hash-min rounds needed
            from .cluster import connected_components_blocked

            return connected_components_blocked(edges)

        if ckpt:
            out["clusters"], _ = ckpt.run(
                "clusters", {"edges": edges_fp}, _clusters)
        else:
            out["clusters"] = _clusters()

    if with_unmatched and cfg.write_unmatched:
        out["unmatched_left"] = unmatched(
            left, edges, "url", "left_id", "addr_norm")
        out["unmatched_right"] = unmatched(
            right, edges, "url", "right_id", "addr_norm")

    if ckpt:
        ckpt.write_lineage()
    return out


def run_linkage_from_dir(fixture_dir: str, **kwargs):
    pages = rd.read_parquet(f"{fixture_dir}/pages.parquet")
    return run_linkage(pages, **kwargs)
