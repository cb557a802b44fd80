"""Generic distributed ranking operators: per-group top-k and
deterministic stratified sampling.

Beyond-reference first-class ops for training-data pipelines (the
reference's closest analogue is its per-left top-k match selection,
addresskit/match.py:207-218, which raylink.match generalizes for the
linkage path — this module exposes the pattern as a standalone API
over ANY dataset):

- ``top_k_per_group``: keep the k best rows of every group by an
  order column (e.g. the k highest-quality documents per domain, the
  k most recent events per user).
- ``stratified_sample``: keep AT MOST k rows per group, chosen by a
  seed-keyed multiplicative hash of an id column — a deterministic,
  blocking/parallelism-invariant balanced sample (e.g. class-balanced
  training subsets). The hash is exactly reproducible in SQL
  (``sample_hash_sql_expr``), so the operator is oracle-checkable
  bit-for-bit against DuckDB's ``row_number() OVER (PARTITION BY ...)``.

Scale shape (both): ONE co-shuffle. Rows are hash-bucketed on the
group column into <= ``num_buckets`` shuffle groups (NEVER one pandas
frame per group — the measured per-tiny-group overhead is ~1-3 ms),
then each bucket resolves with one vectorized stable sort + a C-level
``groupby(...).cumcount()`` rank. Partitioning assumption: any single
bucket fits one worker's heap; raise ``num_buckets`` for bigger
inputs or saltier group keys.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

_PHI64 = np.uint64(0x9E3779B97F4A7C15)  # 2^64 / golden ratio, odd


from .blocks import dataset_schema as _pa_schema


def _with_group_bucket(ds, group_col: str, num_buckets: int):
    """Append an int32 ``_rb`` hash-bucket column derived from
    ``group_col`` (blocks.stable_hash_array: deterministic, any dtype,
    and — unlike hashing ``to_numpy()`` output — invariant to whether
    OTHER rows of the batch are null, so one group can never split
    across two buckets; code-review r4)."""
    from .blocks import stable_hash_array

    def add_bucket(t: pa.Table) -> pa.Table:
        hb = (stable_hash_array(t.column(group_col))
              % np.uint64(num_buckets)).astype(np.int32)
        return t.append_column("_rb", pa.array(hb))

    return ds.map_batches(add_bucket, batch_format="pyarrow")


def _contiguous_group_rank(col) -> np.ndarray:
    """Per-group cumcount (0-based) over a column whose equal values
    are already CONTIGUOUS (i.e. the table was sorted by it). Group
    identity is taken from Arrow dictionary codes — never a pandas
    round-trip, which float64-promotes a nullable int64 key and
    collides distinct values above 2^53 (code-review r5, reproduced).
    Nulls form one group of their own (code -1)."""
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    idx = arr.dictionary_encode().indices
    codes = np.asarray(idx.fill_null(pa.scalar(-1, idx.type)))
    n = len(codes)
    if n == 0:
        return np.empty(0, dtype=np.int64)
    new = np.empty(n, dtype=bool)
    new[0] = True
    new[1:] = codes[1:] != codes[:-1]
    starts = np.flatnonzero(new)
    lens = np.diff(np.append(starts, n))
    return np.arange(n, dtype=np.int64) - np.repeat(starts, lens)


def sample_hash(ids: np.ndarray, seed: int) -> np.ndarray:
    """The stratified-sample rank key: ``((id + seed) * PHI64) mod
    2^64`` on wrapping uint64 arithmetic. Python-side twin of
    :func:`sample_hash_sql_expr`; row-local, hence invariant to
    blocking and parallelism (same property as the content-hash
    sampler in learned.collect_train_split)."""
    return ((ids.astype(np.uint64) + np.uint64(seed)) * _PHI64)


def sample_hash_sql_expr(id_col: str, seed: int) -> str:
    """DuckDB expression computing exactly :func:`sample_hash`
    (HUGEINT product mod 2^64 == wrapping uint64 product). The modulo
    is taken non-negatively — SQL ``%`` is C-style signed, so a
    negative ``id + seed`` would otherwise yield a negative remainder
    and fail the UBIGINT cast. The final CAST to UBIGINT keeps the
    value exact through clients that coerce HUGEINT to float64
    (pandas .df())."""
    n = 18446744073709551616
    prod = f"((CAST({id_col} AS HUGEINT) + {seed}) * {int(_PHI64)})"
    return f"CAST((({prod} % {n}) + {n}) % {n} AS UBIGINT)"


def sample_hash_str(ids, seed: int) -> np.ndarray:
    """String-id rank key: the first 8 md5 bytes of ``"{seed}:{id}"``
    (UTF-8) as a big-endian uint64 — the SQL twin is
    :func:`sample_hash_str_sql_expr`. hashlib per row (C speed per
    call); acceptable for a sampling operator whose contract is exact
    SQL reproducibility — a vectorized non-cryptographic hash has no
    bit-exact DuckDB counterpart."""
    import hashlib

    out = np.empty(len(ids), dtype=np.uint64)
    pre = f"{seed}:".encode()
    for i, v in enumerate(ids):
        d = hashlib.md5(pre + str(v).encode()).digest()
        out[i] = int.from_bytes(d[:8], "big")
    return out


def sample_hash_str_sql_expr(id_col: str, seed: int) -> str:
    """DuckDB expression computing exactly :func:`sample_hash_str`
    (md5 hex prefix -> UBIGINT via a 0x literal cast)."""
    return (f"CAST(('0x' || substr(md5('{seed}:' || {id_col}), 1, 16))"
            " AS UBIGINT)")


def top_k_per_group(ds, group_col: str, order_col: str, k: int,
                    descending: bool = True,
                    tiebreak_col: str | None = None,
                    num_buckets: int = 64):
    """Keep the ``k`` best rows of every ``group_col`` group, ordered
    by ``order_col`` (``descending=True`` -> largest first). Ties on
    ``order_col`` break by ``tiebreak_col`` ascending when given
    (pass one for a deterministic result set); remaining ties keep
    input order (an explicit row-index sort key — the total-order
    equivalent of a stable sort). Output columns == input columns;
    row order within the result is unspecified (it's a set)."""
    schema = _pa_schema(ds)
    keys = [(group_col, "ascending"),
            (order_col, "descending" if descending else "ascending")]
    if tiebreak_col:
        keys.append((tiebreak_col, "ascending"))
    keys.append(("_i", "ascending"))   # stable: input order on full ties

    def rank_bucket(g: pa.Table) -> pa.Table:
        # resolved entirely on the ARROW side: the previous pandas
        # round-trip float64-promoted a nullable int64 group column,
        # colliding distinct keys above 2^53 into one group and
        # corrupting the emitted key values (code-review r5, reproduced)
        if group_col not in g.column_names or g.num_rows == 0:
            return schema.empty_table()
        n = g.num_rows
        t = g.append_column(
            "_i", pa.array(np.arange(n, dtype=np.int64))).sort_by(keys)
        rank = _contiguous_group_rank(t.column(group_col))
        sel = np.asarray(t.column("_i"))[rank < k]
        sel.sort()
        return g.take(pa.array(sel)).select(schema.names)

    return (
        _with_group_bucket(ds, group_col, num_buckets)
        .groupby("_rb")
        .map_groups(rank_bucket, batch_format="pyarrow")
    )


def stratified_sample(ds, group_col: str, id_col: str, k: int,
                      seed: int = 42, num_buckets: int = 64):
    """At most ``k`` rows per ``group_col`` group, picked as the k
    smallest hash-rank values of the ``id_col`` (ties on hash break by
    id — only possible for duplicate ids). Integer ids rank by
    :func:`sample_hash` (multiplicative, fully vectorized); string ids
    — e.g. the flagship's urls — by :func:`sample_hash_str` (md5
    prefix). Deterministic for a fixed seed regardless of blocking or
    parallelism, and bit-reproducible in SQL::

        SELECT ... QUALIFY row_number() OVER (
          PARTITION BY {group}
          ORDER BY {sample_hash[_str]_sql_expr}, {id}
        ) <= k

    Unlike fraction-based sampling this yields EXACT per-group counts
    (min(k, group size)) — the balanced-classes contract a training
    subset needs."""
    schema = _pa_schema(ds)
    id_field = (schema.field(id_col)
                if id_col in schema.names else None)
    use_str = id_field is not None and (
        pa.types.is_string(id_field.type)
        or pa.types.is_large_string(id_field.type))
    if id_field is not None and not use_str and not (
            pa.types.is_integer(id_field.type)):
        # a float64 id (e.g. a pandas int-with-null upcast) would
        # silently truncate via astype(uint64) while the SQL twin's
        # CAST(.. AS HUGEINT) rounds — breaking the advertised
        # bit-for-bit SQL reproducibility (ADVICE r3). Mirror the
        # null-id guard: fail loudly instead.
        raise TypeError(
            f"stratified_sample: {id_col!r} must be integer- or "
            f"string-typed for a SQL-reproducible hash rank, got "
            f"{id_field.type}")

    keys = [(group_col, "ascending"), ("_sh", "ascending"),
            (id_col, "ascending"), ("_i", "ascending")]

    def rank_bucket(g: pa.Table) -> pa.Table:
        # Arrow-side resolve — same rationale as top_k_per_group
        # (code-review r5): a pandas round-trip collides nullable
        # int64 group keys above 2^53
        if group_col not in g.column_names or g.num_rows == 0:
            return schema.empty_table()
        idcol = g.column(id_col)
        if idcol.null_count:
            # NaN -> uint64 is platform-dependent garbage; a null id
            # would get an arbitrary, irreproducible rank
            raise ValueError(
                f"stratified_sample: {id_col!r} contains nulls — the "
                "hash rank requires non-null integer ids")
        n = g.num_rows
        ids_np = np.asarray(idcol.combine_chunks())
        h = (sample_hash_str(ids_np, seed) if use_str
             else sample_hash(ids_np, seed))
        t = (g.append_column("_sh", pa.array(h))
             .append_column("_i", pa.array(np.arange(n, dtype=np.int64)))
             .sort_by(keys))
        rank = _contiguous_group_rank(t.column(group_col))
        sel = np.asarray(t.column("_i"))[rank < k]
        sel.sort()
        return g.take(pa.array(sel)).select(schema.names)

    return (
        _with_group_bucket(ds, group_col, num_buckets)
        .groupby("_rb")
        .map_groups(rank_bucket, batch_format="pyarrow")
    )


# ---------------------------------------------------------------------------
# deterministic weighted (Bernoulli) sampling — corpus mixing
# ---------------------------------------------------------------------------

_U64_SPAN = 18446744073709551616.0  # 2^64 as an exact double


def _require_hashable_id(ds, id_col: str, op: str) -> bool:
    """Shared guard for the uniform-hash operators (bernoulli_sample /
    hash_split): the id column must exist and be integer- or
    string-typed for a SQL-reproducible hash. Returns use_str."""
    schema = _pa_schema(ds)
    id_field = schema.field(id_col) if id_col in schema.names else None
    if id_field is None:
        raise ValueError(f"{op}: no column {id_col!r}")
    use_str = (pa.types.is_string(id_field.type)
               or pa.types.is_large_string(id_field.type))
    if not use_str and not pa.types.is_integer(id_field.type):
        raise TypeError(
            f"{op}: {id_col!r} must be integer- or string-typed for a "
            f"SQL-reproducible hash, got {id_field.type}")
    return use_str


def _uniform_of(col, seed: int, use_str: bool, op: str,
                id_col: str) -> np.ndarray:
    """uniform(id) = CAST(hash AS DOUBLE) / 2^64 — the pinned formula
    both SQL twins reproduce; nulls rejected loudly."""
    ids = col.to_pandas()
    if ids.isna().any():
        raise ValueError(f"{op}: {id_col!r} contains nulls")
    h = (sample_hash_str(ids.to_numpy(), seed) if use_str
         else sample_hash(ids.to_numpy(), seed))
    return h.astype(np.float64) / _U64_SPAN


def bernoulli_sample(ds, id_col: str, rate, seed: int = 42):
    """Keep each row iff ``uniform(id) < rate`` where ``uniform(id) =
    CAST(hash AS DOUBLE) / 2^64`` over the same seed-keyed hash rank as
    :func:`stratified_sample` — the corpus-mixing primitive ("sample
    domain d at temperature-derived rate w_d"): join/broadcast a rate
    column onto the rows, then one shuffle-free filter pass.

    ``rate``: a float (uniform rate) or a COLUMN NAME holding a per-row
    float in [0, 1] (e.g. a per-domain weight attached upstream).
    Deterministic for a fixed seed regardless of blocking/parallelism,
    and bit-reproducible in SQL::

        WHERE CAST({sample_hash[_str]_sql_expr} AS DOUBLE)
              / 18446744073709551616.0 < {rate}

    The comparison is pinned in the DOUBLE domain on both sides (the
    division rounds identically in numpy and DuckDB), so the kept row
    set is bit-identical — tests/test_ranking.py::test_bernoulli_*.
    Unlike Ray's ``random_sample`` this is content-keyed, hence stable
    across runs and resumable-safe (see raylink-perf notes on
    random_sample's block-boundary dependence)."""
    use_str = _require_hashable_id(ds, id_col, "bernoulli_sample")
    rate_col = rate if isinstance(rate, str) else None

    def keep(t: pa.Table) -> pa.Table:
        u = _uniform_of(t.column(id_col), seed, use_str,
                        "bernoulli_sample", id_col)
        if rate_col:
            rc = t.column(rate_col)
            if rc.null_count:
                # NaN makes `u < r` silently False — a NULL rate would
                # read as "sampled out" and mask an upstream join bug;
                # mirror _uniform_of's loud null-id guard (ADVICE r4)
                raise ValueError(
                    f"bernoulli_sample: rate column {rate_col!r} has "
                    f"{rc.null_count} null(s); rates must be non-null")
            r = np.asarray(rc, dtype=np.float64)
            if np.isnan(r).any():
                # a non-null NaN (e.g. an upstream 0/0 weight) slips
                # past the null guard yet fails `u < r` identically —
                # the exact silent-sample-out the guard exists to
                # prevent (code-review r5)
                raise ValueError(
                    f"bernoulli_sample: rate column {rate_col!r} "
                    "contains NaN; rates must be finite")
        else:
            r = float(rate)
        return t.filter(pa.array(u < r))

    return ds.map_batches(keep, batch_format="pyarrow")


def bernoulli_sample_sql_where(id_col: str, rate_expr: str,
                               seed: int = 42,
                               string_id: bool = False) -> str:
    """The WHERE predicate mirroring :func:`bernoulli_sample`."""
    h = (sample_hash_str_sql_expr(id_col, seed) if string_id
         else sample_hash_sql_expr(id_col, seed))
    return f"(CAST({h} AS DOUBLE) / {_U64_SPAN!r} < ({rate_expr}))"


def hash_split(ds, id_col: str, fractions: dict[str, float],
               seed: int = 42, out_col: str = "split"):
    """Deterministic train/val/test assignment: ``uniform(id)`` (the
    same ``CAST(hash AS DOUBLE) / 2^64`` as :func:`bernoulli_sample`)
    is cut at the cumulative fraction boundaries, in the given dict
    order. Fractions must sum to 1 (within 1e-9); the last split
    absorbs the rounding tail so every row is assigned. Content-keyed,
    so a doc keeps its split across reruns, repartitions and corpus
    growth — the property random_split lacks. SQL twin:
    :func:`hash_split_sql_case`."""
    total = sum(fractions.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(
            f"hash_split: fractions sum to {total}, expected 1.0")
    use_str = _require_hashable_id(ds, id_col, "hash_split")
    names = list(fractions)
    # cumulative upper bounds; the last is +inf so the float tail of
    # the sum can never leave a row unassigned
    cuts = np.cumsum([fractions[n] for n in names]).astype(np.float64)
    cuts[-1] = np.inf

    def assign(t: pa.Table) -> pa.Table:
        u = _uniform_of(t.column(id_col), seed, use_str, "hash_split",
                        id_col)
        # side='left': first cut >= u wins, so u EXACTLY on a boundary
        # stays in the earlier split — matching the SQL twin's '<='
        idx = np.searchsorted(cuts, u, side="left")
        vals = np.asarray(names, dtype=object)[idx]
        if out_col in t.column_names:
            t = t.drop_columns([out_col])
        return t.append_column(out_col,
                               pa.array(vals.tolist(), pa.string()))

    return ds.map_batches(assign, batch_format="pyarrow")


def hash_split_sql_case(id_col: str, fractions: dict[str, float],
                        seed: int = 42,
                        string_id: bool = False) -> str:
    """CASE expression mirroring :func:`hash_split` — the same
    cumulative boundaries compared in the same double domain. Boundary
    semantics pinned: a u EXACTLY equal to a cut stays in the EARLIER
    split ('<=' here, searchsorted side='left' there)."""
    h = (sample_hash_str_sql_expr(id_col, seed) if string_id
         else sample_hash_sql_expr(id_col, seed))
    u = f"(CAST({h} AS DOUBLE) / {_U64_SPAN!r})"
    names = list(fractions)
    cum = np.cumsum([fractions[n] for n in names]).astype(np.float64)
    # float(c): a raw numpy scalar's repr becomes 'np.float64(0.8)'
    # under numpy >= 2.0 — invalid SQL (code-review r4)
    arms = "".join(
        f" WHEN {u} <= {float(c)!r} THEN '{n}'"
        for n, c in zip(names[:-1], cum[:-1]))
    return f"(CASE{arms} ELSE '{names[-1]}' END)"


# ---------------------------------------------------------------------------
# deterministic weighted sampling without replacement (A-Res)
# ---------------------------------------------------------------------------

def _weighted_key(t: pa.Table, id_col: str, weight_col: str,
                  seed: int, use_str: bool) -> np.ndarray:
    """The A-Res rank key ``uniform(id) ** (1 / weight)`` — Efraimidis
    & Spirakis, "Weighted random sampling with a reservoir" (IPL 2006,
    Algorithm A): taking the k LARGEST keys yields a weighted sample
    without replacement. ``uniform(id)`` is the repo's pinned
    ``CAST(hash AS DOUBLE) / 2^64`` (see :func:`bernoulli_sample`), so
    the key — hence the whole sample — is content-keyed, deterministic
    under any partitioning, and bit-reproducible in SQL as
    ``pow(u, 1.0 / CAST(w AS DOUBLE))`` (both sides are one libm
    ``pow`` on the same doubles). Weights must be finite and > 0:
    a null/NaN weight makes every comparison against the key silently
    False (the bernoulli rate-guard failure mode), and w <= 0 inverts
    or degenerates the key, so all three raise loudly."""
    u = _uniform_of(t.column(id_col), seed, use_str,
                    "weighted_sample", id_col)
    wc = t.column(weight_col)
    if wc.null_count:
        raise ValueError(
            f"weighted_sample: weight column {weight_col!r} has "
            f"{wc.null_count} null(s); weights must be non-null")
    w = np.asarray(wc.cast(pa.float64()))
    bad = ~np.isfinite(w) | (w <= 0.0)
    if bad.any():
        raise ValueError(
            f"weighted_sample: weight column {weight_col!r} has "
            f"{int(bad.sum())} non-finite or <= 0 value(s); weights "
            "must be finite and > 0")
    return u ** (1.0 / w)


def weighted_sample(ds, id_col: str, weight_col: str, k: int,
                    seed: int = 42, combine_size: int = 64) -> pa.Table:
    """Weighted sample WITHOUT replacement of ``k`` rows (inclusion
    odds proportional to ``weight_col``, e.g. domain-temperature
    corpus mixing where :func:`bernoulli_sample`'s independent
    coin-flips must instead hit an exact sample size). Returns the
    sampled rows as one small Arrow table (<= k rows), ordered by
    (key DESC, id ASC) — the SQL twin's ORDER BY — with the key
    dropped.

    Scale shape (the sketch-family plan, mirroring
    ``sketch.frequent_items``): each block reduces to its own top-k
    inside ``map_batches`` — top-k is associative/commutative/
    IDEMPOTENT as a set op, so partials tree-combine and the driver
    only ever sees O(k) rows per combine output; the corpus itself
    never shuffles. Project the dataset to the columns you need
    BEFORE sampling — partials ship whole rows (k per block).

    Bit-reproducible in SQL (:func:`weighted_sample_sql`) provided
    ``id_col`` is unique per row: duplicate ids share one uniform, so
    equal (key, id) pairs tie and both engines pick an arbitrary
    winner among them."""
    if k < 1:
        raise ValueError("weighted_sample: k must be >= 1")
    use_str = _require_hashable_id(ds, id_col, "weighted_sample")

    def partial(t: pa.Table) -> pa.Table:
        key = _weighted_key(t, id_col, weight_col, seed, use_str)
        if "_ws_key" in t.column_names:
            raise ValueError("weighted_sample: column _ws_key exists")
        t = t.append_column("_ws_key", pa.array(key, pa.float64()))
        return _ws_top_k(t, id_col, k)

    out = (ds.map_batches(partial, batch_format="pyarrow")
           .map_batches(lambda t: _ws_top_k(t, id_col, k),
                        batch_format="pyarrow",
                        batch_size=combine_size * k)
           .take_all())
    sch = pa.schema(list(_pa_schema(ds)) + [("_ws_key", pa.float64())])
    final = _ws_top_k(pa.Table.from_pylist(out, schema=sch), id_col, k)
    return final.drop_columns(["_ws_key"])


def _ws_top_k(t: pa.Table, id_col: str, k: int) -> pa.Table:
    """Keep the k largest rows by (_ws_key DESC, id ASC) — one stable
    lexsort, O(n log n) per block of at most combine_size * k rows."""
    key = np.asarray(t.column("_ws_key"))
    ids = t.column(id_col).to_pandas().to_numpy()
    order = np.lexsort((ids, -key))[:k]
    return t.take(pa.array(order, pa.int64()))


def weighted_sample_sql(table_expr: str, id_col: str, weight_col: str,
                        k: int, seed: int = 42,
                        string_id: bool = False) -> str:
    """SELECT mirroring :func:`weighted_sample` row-for-row: the same
    uniform, the same ``pow`` key, the same (key DESC, id ASC) order,
    LIMIT k."""
    h = (sample_hash_str_sql_expr(id_col, seed) if string_id
         else sample_hash_sql_expr(id_col, seed))
    u = f"(CAST({h} AS DOUBLE) / {_U64_SPAN!r})"
    key = f"pow({u}, 1.0 / CAST({weight_col} AS DOUBLE))"
    return (f"SELECT * FROM {table_expr} "
            f"ORDER BY {key} DESC, {id_col} LIMIT {int(k)}")


# ---------------------------------------------------------------------------
# deterministic sequence packing (training-batch preparation)
# ---------------------------------------------------------------------------

def _first_fit(toks: np.ndarray, budget: int
               ) -> tuple[np.ndarray, list[int]]:
    """Leftmost-fit bin assignment in O(n log bins): a max-residual
    segment tree over bin indices replaces the naive
    O(docs x bins) scan (code-review r4 — 1M docs averaging budget/10
    would otherwise make ~10^10 Python iterations in one partition).
    Chooses the LOWEST-index bin whose residual fits each doc —
    bit-identical to the linear first-fit it replaces (pinned by
    test). Docs with tok > budget open a solo bin whose residual goes
    negative, so it is never reused."""
    cap = 1
    tree = np.full(2, -1, dtype=np.int64)  # 1-indexed; leaves at cap+
    nbins = 0
    loads: list[int] = []
    bins = np.empty(len(toks), np.int32)
    for k, tok in enumerate(toks):
        tok = int(tok)
        if tok <= budget and tree[1] >= tok:
            node = 1
            while node < cap:  # walk to the leftmost fitting leaf
                node <<= 1
                if tree[node] < tok:
                    node += 1
            bi = node - cap
        else:
            bi = nbins
            if bi >= cap:  # double the tree, keep leaf residuals
                new_cap = cap * 2
                new_tree = np.full(2 * new_cap, -1, np.int64)
                new_tree[new_cap:new_cap + cap] = tree[cap:2 * cap]
                for i in range(new_cap - 1, 0, -1):
                    new_tree[i] = max(new_tree[2 * i],
                                      new_tree[2 * i + 1])
                tree, cap = new_tree, new_cap
            loads.append(0)
            nbins += 1
        loads[bi] += tok
        bins[k] = bi
        node = cap + bi
        tree[node] = budget - loads[bi]
        node >>= 1
        while node:
            tree[node] = max(tree[2 * node], tree[2 * node + 1])
            node >>= 1
    return bins, loads


def pack_sequences(ds, id_col: str, tokens_col: str, budget: int,
                   num_partitions: int = 256):
    """Assign every doc to a (pack_partition, bin) so each bin's token
    sum fits ``budget`` — the sequence-packing step before writing
    training shards. Deterministic and parallelism-invariant:
    partition = id-hash % num_partitions (each partition packs
    independently — the cluster-wide contract at 100 TB), and within a
    partition docs pack FIRST-FIT-DECREASING over the (tokens DESC,
    id ASC) order, so reruns and re-blockings give the identical
    assignment. Docs with tokens > budget get a solo bin and
    ``oversize=True`` (flagged, not dropped — the caller decides to
    chunk or skip; compose with textstats.chunk_documents upstream to
    avoid them entirely).

    Only (id, tokens) rows shuffle — never text. Returns (id,
    pack_partition, bin, bin_tokens, oversize); join back on id for
    payloads. FFD uses <= (11/9)*OPT + 6/9 bins per partition
    (Dosa 2007), an invariant the tests assert against the
    ceil(total/budget) lower bound."""
    from .blocks import dataset_schema, stable_hash_array

    if budget <= 0:
        raise ValueError("pack_sequences: budget must be positive")
    sch = dataset_schema(ds)
    for c in (id_col, tokens_col):
        if c not in sch.names:
            raise ValueError(f"pack_sequences: no column {c!r}")
    id_type = sch.field(id_col).type
    nb = np.uint64(num_partitions)
    out_schema = pa.schema([
        (id_col, id_type), ("pack_partition", pa.int32()),
        ("bin", pa.int32()), ("bin_tokens", pa.int64()),
        ("oversize", pa.bool_())])

    def project(t: pa.Table) -> pa.Table:
        b = (stable_hash_array(t.column(id_col)) % nb).astype(np.int32)
        return pa.table({
            id_col: t[id_col],
            "_tok": t.column(tokens_col).cast(pa.int64()),
            "_pp": pa.array(b),
        })

    def pack(g: pa.Table) -> pa.Table:
        if "_tok" not in g.column_names or g.num_rows == 0:
            return out_schema.empty_table()
        import pandas as pd

        if g.column("_tok").null_count:
            # the loud-guard convention of bernoulli_sample/hash_split:
            # a null token count would otherwise surface as an obscure
            # NaN->int error deep in the loop (code-review r4)
            raise ValueError(
                f"pack_sequences: {tokens_col!r} contains nulls")
        if g.column(id_col).null_count:
            # same convention: a null id would crash far away in the
            # final pa.array(..., id_type) conversion AND its NaN
            # float64-promotes the partition's whole id column,
            # rounding co-partitioned int ids above 2^53
            # (code-review r5)
            raise ValueError(
                f"pack_sequences: {id_col!r} contains nulls")
        df = g.to_pandas()
        out_bin = np.empty(len(df), np.int32)
        out_load = {}
        for pp, part in df.groupby("_pp", sort=False):
            order = part.sort_values(
                ["_tok", id_col], ascending=[False, True],
                kind="mergesort")
            bins, loads = _first_fit(
                order["_tok"].to_numpy(), budget)
            # to_pandas() gives a RangeIndex, so the label IS the
            # positional index
            out_bin[order.index.to_numpy()] = bins
            out_load[int(pp)] = loads
        bins = out_bin
        pps = df["_pp"].to_numpy()
        toks = df["_tok"].to_numpy()
        bin_tokens = np.fromiter(
            (out_load[int(p)][b] for p, b in zip(pps, bins)),
            np.int64, len(df))
        return pa.table({
            # the Arrow column directly — df rows are in g's order, and
            # a pandas tolist round-trip is both slower and the
            # promotion hazard class this module guards against
            id_col: g[id_col],
            "pack_partition": pa.array(pps.astype(np.int32)),
            "bin": pa.array(bins),
            "bin_tokens": pa.array(bin_tokens),
            "oversize": pa.array(toks > budget),
        }, schema=out_schema)

    return (ds.map_batches(project, batch_format="pyarrow")
            .groupby("_pp")
            .map_groups(pack, batch_format="pyarrow"))
