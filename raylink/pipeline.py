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


def tag_sides(ds, url_col: str = "url",
              left_prefix: str = "https://siteL",
              right_prefix: str = "https://siteR"):
    """Single-pass alternative to :func:`split_left_right`: append
    ``_side`` (0 = left, 1 = right) and drop rows matching neither
    prefix — the tagged stream feeds :func:`raylink.match.match_tagged`
    without scanning the prepared data twice."""

    def tag(batch: pa.Table) -> pa.Table:
        u = batch.column(url_col)
        is_l = pc.starts_with(u, left_prefix)
        is_r = pc.starts_with(u, right_prefix)
        side = pc.if_else(
            is_l, pa.scalar(0, pa.int8()),
            pc.if_else(is_r, pa.scalar(1, pa.int8()),
                       pa.scalar(-1, pa.int8())))
        batch = batch.append_column("_side", side)
        return batch.filter(pc.greater_equal(batch.column("_side"), 0))

    return ds.map_batches(tag, batch_format="pyarrow")


def prepare_pages(pages, normalize_cfg: dict | None = None,
                  extract_concurrency: int | None = 4,
                  drop_suspicious: bool = True,
                  with_parse: bool = False,
                  block_by: str | None = None,
                  slim: bool = True):
    """pages -> normalized/quality-filtered dataset with addr_norm
    (+ parsed field struct when with_parse, per the north-star's
    libpostal-style per-page field parse).

    ``slim`` (default): raw inputs are dropped as soon as the last
    consumer has run — html right after extraction, text_extracted
    right after normalize/parse — so the materialized `prepared`
    artifact and every downstream exchange carry only the product
    columns (url, addr_norm, parts, quality flags). The html column
    alone was ~half the materialized bytes. slim=False keeps
    everything (tests assert the byte-identical extract invariant
    through prepared)."""
    ds = extract_dataset(pages, concurrency=extract_concurrency)
    if slim:
        ds = ds.drop_columns(["html"])
    ds = normalize_dataset(ds, "text_extracted", "addr_norm",
                           normalize_cfg or DEFAULT_NORMALIZE_CFG)
    if with_parse:
        from .parse import parse_dataset

        ds = parse_dataset(ds, "text_extracted")
    if slim:
        ds = ds.drop_columns(["text_extracted"])
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
                extract_concurrency: int | None = 4,
                with_clusters: bool = True,
                with_unmatched: bool = True,
                salt_hot_blocks: bool = True,
                with_parse: bool = True,
                cc_small_threshold: int = 2_000_000):
    """-> dict with 'edges', 'clusters', 'unmatched_left',
    'unmatched_right', 'prepared' Datasets (lazy where possible)."""
    cfg = match_cfg or MatchConfig()
    ckpt = CheckpointManager(checkpoint_dir) if checkpoint_dir else None

    def _prepared(src=None):
        return prepare_pages(src if src is not None else pages,
                             normalize_cfg,
                             extract_concurrency=extract_concurrency,
                             with_parse=with_parse,
                             block_by=cfg.block_by)

    # NOTE on the streaming alternative: a fully-lazy single DAG (no
    # prepared materialize) was measured SLOWER here — the match sort
    # is an all-to-all barrier anyway, and in one plan the extract
    # actor pool keeps its reserved CPUs alive through the shuffle.
    # The staged design (materialize the slim prepared once, then one
    # tagged scan into the shuffle) wins on both wall time and reuse.
    if ckpt:
        # partition-granular: prepare is per-row keyed on url, so a
        # resumed run skips finished url-hash partitions at the read
        prepared, prep_fp = ckpt.run_partitioned(
            "prepared",
            {"normalize": normalize_cfg or DEFAULT_NORMALIZE_CFG,
             "parse": with_parse, "block_by": cfg.block_by},
            pages, _prepared, id_col="url",
        )
    else:
        # prepared feeds 2-4 consumers (left/right sides, hot-block
        # scan, unmatched) — pin it in the object store (spills to disk
        # at scale) instead of re-running extract+normalize per consumer
        prepared = _prepared().materialize()
        prep_fp = fingerprint({"normalize": normalize_cfg or
                               DEFAULT_NORMALIZE_CFG})

    hot: set[str] = set()
    if salt_hot_blocks:
        # opt into the 10% block-level sample here (ADVICE r2 #1: the
        # public default is a full scan): prepared is materialized from
        # crawl-ordered pages, so row order is uncorrelated with block
        # key — the documented assumption of the block sample
        hot = find_hot_blocks(prepared, "addr_norm", cfg,
                              sample_fraction=0.1)

    tagged_path = (cfg.left_id == cfg.right_id and cfg.method != "index")

    def _edges(src=None):
        base = src if src is not None else prepared
        if tagged_path:
            # one tagged scan of prepared instead of two filtered
            # scans + union
            from .match import match_tagged

            return match_tagged(
                tag_sides(base), cfg, text_col="addr_norm",
                id_col=cfg.left_id, hot_keys=hot)
        left, right = split_left_right(base)
        return match_datasets(
            left, right, cfg,
            left_text_col="addr_norm", right_text_col="addr_norm",
            hot_keys=hot,
        )

    if ckpt:
        edges_fp_inputs = {"prep": prep_fp, "match": cfg.to_dict(),
                           "hot": sorted(hot)}
        # schema() is None when every page was dropped by the quality
        # gate (same guard as match.py's empty-input path) — fall back
        # to the whole-stage checkpoint instead of crashing
        prep_schema = prepared.schema()
        prep_cols = list(prep_schema.names) if prep_schema is not None \
            else []
        if cfg.block_by and "block_key" in prep_cols:
            # partition-granular: every edge lives inside one blocking
            # key (both endpoints share it), so edges keyed on
            # block_key satisfy the run_partitioned contract — a
            # resumed match recomputes only missing key-hash partitions
            edges, edges_fp = ckpt.run_partitioned(
                "edges", edges_fp_inputs, prepared, _edges,
                id_col="block_key")
        else:
            edges, edges_fp = ckpt.run("edges", edges_fp_inputs, _edges)
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
        left, right = split_left_right(prepared)
        out["unmatched_left"] = unmatched(
            left, edges, "url", "left_id", "addr_norm")
        out["unmatched_right"] = unmatched(
            right, edges, "url", "right_id", "addr_norm")

    if ckpt:
        ckpt.write_lineage()
    return out


def run_linkage_from_dir(fixture_dir: str, **kwargs):
    pages = rd.read_parquet(f"{fixture_dir}/pages.parquet",
                            columns=["url", "html"])
    return run_linkage(pages, **kwargs)
