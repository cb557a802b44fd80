"""CLI / ``ray job submit`` entry point for the flagship linkage
pipeline — the Ray-native replacement for the reference's
subprocess-per-step orchestrator (scripts/run_pipeline.py:11-76).

Usage (local or as a Ray job):

    python -m raylink.cli --pages /path/pages.parquet --out /tmp/out \\
        --match-config configs/match.yaml \\
        --normalize-config configs/normalize.yaml \\
        [--checkpoint-dir /tmp/ckpt] [--num-cpus 32]

    ray job submit -- python -m raylink.cli --pages ... --out ...

Outputs (partitioned Parquet directories, resumable via the checkpoint
manifests when --checkpoint-dir is given):
    out/edges/        (left_id, right_id, score, block_key)
    out/clusters/     (id, cluster_id)
    out/unmatched_left/, out/unmatched_right/
    ckpt/lineage/lineage.parquet  (stage, rows, wall, fingerprint)
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--pages", required=True,
                   help="pages Parquet file or directory")
    p.add_argument("--out", required=True, help="output root directory")
    p.add_argument("--match-config", default=None)
    p.add_argument("--normalize-config", default=None)
    p.add_argument("--checkpoint-dir", default=None)
    p.add_argument("--num-cpus", type=int, default=None,
                   help="only used when Ray is not already initialised "
                        "(e.g. standalone; ray job submit provides the "
                        "cluster)")
    p.add_argument("--no-clusters", action="store_true")
    p.add_argument("--no-unmatched", action="store_true")
    p.add_argument("--no-salting", action="store_true")
    p.add_argument("--preview", action="store_true",
                   help="write out/preview: first 1000 edges joined "
                        "back to both side texts "
                        "(ref make_match_preview.py:15-30)")
    p.add_argument("--gold-edges", default=None,
                   help="parquet of gold (left_id, right_id) pairs; "
                        "adds pairwise precision/recall/F1 to the "
                        "report (ref scripts/eval.py:21-27)")
    p.add_argument("--sample-per-cluster", type=int, default=0,
                   metavar="K",
                   help="write out/cluster_sample: the K "
                        "lexicographically-first member ids of every "
                        "cluster (deterministic QC sample, "
                        "ranking.top_k_per_group)")
    args = p.parse_args(argv)

    # load_cfg keeps the reference's silent-{} semantics for missing
    # files (addresskit/match.py:35-39) — fine for library callers,
    # but a typo'd CLI path would "run" with the loader defaults
    # (left_id='id', single global block) and fail much later inside a
    # Ray task; an explicitly-passed path that does not exist is a
    # hard config error on the CLI surface.
    for flag, path in (("--match-config", args.match_config),
                       ("--normalize-config", args.normalize_config)):
        if path and not os.path.exists(path):
            print(f"error: {flag} {path!r} does not exist",
                  file=sys.stderr)
            return 2

    import ray

    owns_ray = not ray.is_initialized()
    if owns_ray:
        kwargs = {"include_dashboard": False, "ignore_reinit_error": True}
        if args.num_cpus:
            kwargs["num_cpus"] = args.num_cpus
            kwargs["address"] = "local"
        ray.init(**kwargs)
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import ray.data as rd

    from .config import MatchConfig, load_cfg
    from .pipeline import run_linkage

    if args.match_config:
        match_cfg = MatchConfig.from_yaml(args.match_config)
    else:
        # pages tables key rows by url (input_hint schema)
        match_cfg = MatchConfig(left_id="url", right_id="url",
                                threshold=85.0, topk=3)
    normalize_cfg = load_cfg(args.normalize_config) \
        if args.normalize_config else None

    t0 = time.perf_counter()
    pages = rd.read_parquet(args.pages)
    out = run_linkage(
        pages,
        match_cfg=match_cfg,
        normalize_cfg=normalize_cfg,
        checkpoint_dir=args.checkpoint_dir,
        with_clusters=not args.no_clusters,
        with_unmatched=not args.no_unmatched,
        salt_hot_blocks=not args.no_salting,
    )

    os.makedirs(args.out, exist_ok=True)

    def _fresh(target: str) -> str:
        # write_parquet APPENDS uniquely-named files to an existing
        # directory, so a re-run with the same --out would mix the
        # previous run's parquet into the counts, the cluster_sample
        # input, and every downstream reader — clear the stage dir
        # first (re-runs are the CLI's documented resume story via
        # --checkpoint-dir, not via leftover output files)
        import shutil

        shutil.rmtree(target, ignore_errors=True)
        return target

    report = {"pages": args.pages, "out": args.out}
    for name in ("edges", "clusters", "unmatched_left", "unmatched_right"):
        if name not in out:
            continue
        target = _fresh(os.path.join(args.out, name))
        out[name].write_parquet(target)
        # an empty dataset writes no files at all
        report[name] = (
            rd.read_parquet(target).count() if os.path.isdir(target)
            and os.listdir(target) else 0
        )
    if args.preview:
        from .pipeline import split_left_right
        from .report import match_preview

        left, right = split_left_right(out["prepared"])
        target = _fresh(os.path.join(args.out, "preview"))
        match_preview(
            out["edges"], left, right,
            left_id=match_cfg.left_id, right_id=match_cfg.right_id,
        ).write_parquet(target)
        report["preview"] = (
            rd.read_parquet(target).count() if os.path.isdir(target)
            and os.listdir(target) else 0
        )

    if args.sample_per_cluster and report.get("clusters"):
        from .ranking import top_k_per_group

        target = _fresh(os.path.join(args.out, "cluster_sample"))
        # read the clusters parquet just written rather than sampling
        # out["clusters"] — the latter is lazy and would re-execute
        # the whole connected-components lineage a second time
        top_k_per_group(
            rd.read_parquet(os.path.join(args.out, "clusters")),
            "cluster_id", "id",
            k=args.sample_per_cluster, descending=False,
        ).write_parquet(target)
        report["cluster_sample"] = (
            rd.read_parquet(target).count() if os.path.isdir(target)
            and os.listdir(target) else 0
        )

    if args.gold_edges:
        from .report import pairwise_eval

        report["eval"] = pairwise_eval(
            out["edges"], rd.read_parquet(args.gold_edges))

    report["wall_s"] = round(time.perf_counter() - t0, 2)
    print(json.dumps(report))

    if owns_ray:
        ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
