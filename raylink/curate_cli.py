"""CLI / ``ray job submit`` entry point for the web-corpus CURATION
pipeline — the training-data preparation flow the linkage CLI's
flagship doesn't cover (no reference counterpart; assembled from the
round-4 curation operators).

Usage (local or as a Ray job):

    python -m raylink.curate_cli --docs /path/documents.parquet \\
        --out /tmp/curated [--text-col text] [--id-col doc_id] \\
        [--dedup-paragraphs] [--benchmark eval.parquet --ngram 8] \\
        [--max-dup-line-frac 0.5] [--chunk 512 --overlap 0] \\
        [--split train=0.9,val=0.1] [--num-cpus 32]

Stages (each optional flag turns one on; order is fixed):
  1. repetition signals + Gopher-style gate (--max-dup-line-frac)
  2. quality-percentile gate (--min-quality-quantile; threshold from
     the deterministic quantile sketch, one shuffle-free filter pass)
  3. benchmark decontamination (--benchmark; flags, then drops rows
     with any n-gram hit)
  4. cross-document paragraph dedup (--dedup-paragraphs)
  5. token-window chunking (--chunk/--overlap; output becomes one row
     per chunk, ids become "<id>#<chunk_idx>")
  6. deterministic hash split (--split; content-keyed, stable across
     reruns and corpus growth)

Output: ``out/<split>/`` partitioned Parquet per split (or
``out/all/`` when --split is absent) plus one JSON report line on
stdout. The caller owns the Ray session under ``ray job submit``;
standalone runs initialise local Ray themselves.
"""

from __future__ import annotations

import argparse
import json
import os
import time


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--docs", required=True,
                   help="documents Parquet file or directory")
    p.add_argument("--out", required=True)
    p.add_argument("--text-col", default="text")
    p.add_argument("--id-col", default="doc_id")
    p.add_argument("--max-dup-line-frac", type=float, default=None,
                   metavar="F",
                   help="drop docs whose duplicate-line fraction "
                        "exceeds F (Gopher-style repetition gate)")
    p.add_argument("--min-quality-quantile", type=float, default=None,
                   metavar="Q",
                   help="drop docs below the Q-quantile of the "
                        "composite quality score (sketch-derived "
                        "threshold, one extra shuffle-free pass)")
    p.add_argument("--benchmark", default=None,
                   help="parquet of eval texts; docs sharing any "
                        "--ngram word n-gram with it are dropped")
    p.add_argument("--benchmark-text-col", default="text")
    p.add_argument("--ngram", type=int, default=8)
    p.add_argument("--dedup-paragraphs", action="store_true")
    p.add_argument("--chunk", type=int, default=0, metavar="TOKENS")
    p.add_argument("--overlap", type=int, default=0)
    p.add_argument("--split", default=None,
                   metavar="NAME=FRAC[,NAME=FRAC...]")
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--num-cpus", type=int, default=None)
    p.add_argument("--overwrite", action="store_true",
                   help="clear an existing non-empty --out first")
    args = p.parse_args(argv)

    # write_parquet only ADDS uniquely-named files: rerunning into a
    # non-empty --out silently mixed stale rows into the dataset AND
    # the report counts (reproduced: 31 -> 64 rows on an immediate
    # rerun; code-review r5). Refuse, or clear with --overwrite.
    if os.path.isdir(args.out) and os.listdir(args.out):
        if not args.overwrite:
            p.error(f"--out {args.out!r} exists and is not empty; "
                    "pass --overwrite to clear it (a rerun would mix "
                    "stale output files into the dataset)")
        import shutil

        shutil.rmtree(args.out)

    import ray

    owns_ray = not ray.is_initialized()
    if owns_ray:
        kwargs = {"include_dashboard": False,
                  "ignore_reinit_error": True}
        if args.num_cpus:
            kwargs["num_cpus"] = args.num_cpus
            kwargs["address"] = "local"
        ray.init(**kwargs)
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import ray.data as rd

    from .dedup import paragraph_dedup
    from .ranking import hash_split
    from .textstats import (add_repetition_signals, chunk_documents,
                            flag_contaminated)

    t0 = time.perf_counter()
    report: dict = {"docs": args.docs, "out": args.out}
    ds = rd.read_parquet(args.docs)
    report["rows_in"] = ds.count()
    text_col, id_col = args.text_col, args.id_col

    if args.max_dup_line_frac is not None:
        cut = int(args.max_dup_line_frac * 1_000_000)
        ds = add_repetition_signals(ds, text_col)
        # expr filters run vectorized on Arrow blocks; the lambda form
        # boxed every row into a dict (r5)
        ds = ds.filter(expr=f"dup_line_frac_e6 <= {cut}")

    if args.min_quality_quantile is not None:
        from .sketch import filter_by_quantile
        from .textstats import add_quality_score

        # percentile gate: threshold from the deterministic quantile
        # sketch, then one shuffle-free filter pass. The sketch pass
        # re-executes the upstream lineage once (filter_by_quantile
        # COST NOTE) — upstream here is read + cheap vectorized
        # gates, so the double pass beats materializing the corpus.
        ds = add_quality_score(ds, text_col)
        ds, thr = filter_by_quantile(
            ds, "quality", id_col, lo=args.min_quality_quantile,
            seed=args.seed)
        report["quality_threshold"] = thr[args.min_quality_quantile]

    if args.benchmark:
        bench = rd.read_parquet(args.benchmark)
        ds = flag_contaminated(ds, text_col, bench,
                               args.benchmark_text_col, n=args.ngram)
        ds = ds.filter(expr="contaminated == False")

    if args.dedup_paragraphs:
        # rebuilds text from surviving paragraphs; carries only
        # (id, text, n_paras, n_removed) forward
        ds = paragraph_dedup(ds, text_col, id_col,
                             out_text_col=text_col)

    if args.chunk:
        # id_col still holds the BASE doc id here; the '#<chunk_idx>'
        # suffix is appended only after split assignment below
        ds = chunk_documents(ds, text_col, id_col,
                             chunk_tokens=args.chunk,
                             overlap=args.overlap)

    fractions = None
    if args.split:
        fractions = {}
        for part in args.split.split(","):
            name, frac = part.split("=")
            fractions[name.strip()] = float(frac)
        # Split on the BASE doc id (before the chunk suffix exists) so
        # every chunk of a document lands in the SAME split — with
        # --overlap > 0, per-chunk splitting put literal token spans of
        # one doc in both train and val (ADVICE r4, train/eval leak).
        ds = hash_split(ds, id_col, fractions, seed=args.seed)

    if args.chunk:

        def chunk_id(t):
            import pyarrow as pa
            import pyarrow.compute as pc

            cid = pc.binary_join_element_wise(
                pc.cast(t.column(id_col), pa.string()), "#",
                pc.cast(t.column("chunk_idx"), pa.string()), "")
            return (t.drop_columns([id_col])
                    .append_column(id_col, cid))

        ds = ds.map_batches(chunk_id, batch_format="pyarrow")

    os.makedirs(args.out, exist_ok=True)
    if fractions:
        # ONE streaming write, hive-partitioned by split — per-split
        # filters would re-execute the whole lineage once per split
        ds.write_parquet(args.out, partition_cols=["split"])
        for name in fractions:
            target = os.path.join(args.out, f"split={name}")
            report[name] = (
                rd.read_parquet(target).count()
                if os.path.isdir(target) and os.listdir(target) else 0)
    else:
        target = os.path.join(args.out, "all")
        ds.write_parquet(target)
        report["all"] = (
            rd.read_parquet(target).count()
            if os.path.isdir(target) and os.listdir(target) else 0)

    report["wall_s"] = round(time.perf_counter() - t0, 3)
    print(json.dumps(report))
    if owns_ray:
        ray.shutdown()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
