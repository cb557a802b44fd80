"""Distributed connected components over a match-edge Dataset.

Hash-min label propagation (cf. the hash-min family of CC algorithms on
MapReduce/Spark, e.g. "Connected Components in MapReduce and Beyond"):
every node starts with label = its own id; each round propagates labels
across edges and keeps the minimum per node via
``groupby(node).aggregate(Min(label))``; converges in O(diameter)
rounds (logarithmic for the short chains record-linkage produces).

Absent in the reference (which stops at pairwise edges, match.py:174);
required by the north rule ("transitive-clustering"). J8 in SURVEY §2.4.

Convergence detection without an extra join: labels only ever decrease
(min is monotone), so an order-free hash-sum over (node, label) pairs
(``pd.util.hash_array``, C-level) changes iff some label changed; we
stop when the signature is stable (plus a hard ``max_rounds`` bound).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ray.data.aggregate import Min

from .blocks import ensure_arrow


def _sym_edges(edges, src: str, dst: str):
    """(u,v) -> both directions, columns (node, nbr). Self-pairs are
    KEPT (as (x, x)) so a node whose only edge is a self-match still
    receives a cluster row — the documented contract is "every node
    incident to an edge", and connected_components_blocked emits the
    singleton for the same input. Null endpoints raise (module
    loud-null-guard convention; silently dropping the row would hide
    an upstream join bug as a missing cluster)."""

    def sym(batch: pa.Table) -> pa.Table:
        if src not in batch.column_names:
            # empty upstream blocks can arrive with zero columns
            return pa.table({"node": pa.array([], pa.string()),
                             "nbr": pa.array([], pa.string())})
        u = batch.column(src).cast(pa.string())
        v = batch.column(dst).cast(pa.string())
        if u.null_count or v.null_count:
            raise ValueError(
                f"connected_components: null {src}/{dst} endpoint in "
                f"edges — fix the upstream edge producer")
        node = pa.chunked_array([u, v]).combine_chunks()
        nbr = pa.chunked_array([v, u]).combine_chunks()
        return pa.table({"node": node, "nbr": nbr})

    return edges.map_batches(sym, batch_format="pyarrow")


def _label_signature(labels) -> int:
    def partial(batch: pa.Table) -> pa.Table:
        # C-level (node, label) hash-sum — the signature only has to be
        # order-free and change-sensitive within one run, so the hash
        # fn is free (was a per-row Python _fnv64 loop every round)
        joined = pc.binary_join_element_wise(
            batch.column("node").cast(pa.string()),
            batch.column("label").cast(pa.string()), "\x00")
        h = pd.util.hash_array(np.asarray(joined))
        s = int(h.sum(dtype=np.uint64) & np.uint64(0x7FFFFFFFFFFFFFFF))
        return pa.table({"sig": pa.array([s], pa.int64())})

    parts = labels.map_batches(partial, batch_format="pyarrow")
    total = 0
    for b in parts.iter_batches(batch_format="pyarrow"):
        for v in b.column("sig").to_pylist():
            total = (total + v) & 0x7FFFFFFFFFFFFFFF
    return total


def connected_components(edges, src: str = "left_id", dst: str = "right_id",
                         max_rounds: int = 50,
                         num_partitions: int | None = None,
                         small_threshold: int = 0):
    """edges Dataset -> clusters Dataset (id, cluster_id) covering every
    node incident to an edge. cluster_id = lexicographic min node id of
    the component (order-free, deterministic).

    ``small_threshold``: if > 0 and the symmetrized edge count is at or
    below it, the closure is computed with a driver-side union-find
    (identical result, no per-round shuffles) — right-sizing for small
    edge sets; the distributed hash-min path is the 100TB-scale path
    and is what tests/oracles exercise by default."""
    import ray.data as rd

    # ensure_arrow: pandas-origin EMPTY blocks pass through map_batches
    # unconverted (Ray skips the UDF for empty blocks) and crash the
    # joins below with mixed block types — rebuild as uniform Arrow.
    sym = ensure_arrow(_sym_edges(edges, src, dst)).materialize()
    n_sym = sym.count()

    if n_sym == 0:
        return rd.from_arrow(
            pa.table({"id": pa.array([], pa.string()),
                      "cluster_id": pa.array([], pa.string())}))

    if small_threshold and n_sym <= small_threshold:
        pairs = []
        for b in sym.iter_batches(batch_format="pyarrow"):
            pairs.extend(zip(b.column("node").to_pylist(),
                             b.column("nbr").to_pylist()))
        mapping = connected_components_local(pairs)
        ids = sorted(mapping)
        return rd.from_arrow(
            pa.table({"id": pa.array(ids, pa.string()),
                      "cluster_id": pa.array(
                          [mapping[i] for i in ids], pa.string())}))

    if num_partitions is None:
        # few large partitions beat many tiny ones: each hash-join
        # round spins up aggregator actors per partition
        num_partitions = max(2, min(64, n_sym // 50_000 + 2))

    # initial labels: label(node) = node
    def init_labels(batch: pa.Table) -> pa.Table:
        return pa.table({"node": batch["node"], "label": batch["node"]})

    # every Dataset.join input below goes through ensure_arrow with a
    # pinned schema: aggregates emit SCHEMA-LESS empty blocks for empty
    # partitions (ray plan_udf_map_op TODO), and acero rejects a join
    # side containing a block without the key column
    label_schema = pa.schema([("node", pa.string()),
                              ("label", pa.string())])

    # each round's labels are MATERIALIZED: the signature pass and the
    # next round's two joins each consume `labels`, and Ray re-executes
    # an unmaterialized Dataset's whole accumulated lineage per consumer
    # — O(rounds^2) re-execution of every prior round's shuffles
    # (code-review r5). One round's labels is one small (node, label)
    # table; pinning it is the per-round state of the algorithm.
    labels = ensure_arrow(
        sym.map_batches(init_labels, batch_format="pyarrow")
        .groupby("node")
        .aggregate(Min("label", alias_name="label")),
        schema=label_schema,
    ).materialize()

    sig = _label_signature(labels)
    for _ in range(max_rounds):
        # 1) neighbor propagation: join sym(node, nbr) with labels on
        #    node, emit (nbr, label); union with self labels; min/node
        prop = sym.join(
            labels, join_type="inner", num_partitions=num_partitions,
            on=("node",),
        )

        def to_candidates(batch: pa.Table) -> pa.Table:
            return pa.table(
                {"node": batch["nbr"], "label": batch["label"]}
            )

        cand = prop.map_batches(to_candidates, batch_format="pyarrow")
        labels = ensure_arrow(
            cand.union(labels.select_columns(["node", "label"]))
            .groupby("node")
            .aggregate(Min("label", alias_name="label")),
            schema=label_schema,
        )

        # 2) pointer jumping: label <- label(label). Labels are node
        #    ids, so self-join labels on (label == other.node) halves
        #    the path length each round -> O(log diameter) rounds
        #    instead of O(diameter) plain hash-min.
        def as_lookup(batch: pa.Table) -> pa.Table:
            return pa.table(
                {"label": batch["node"], "label2": batch["label"]}
            )

        lookup = labels.map_batches(as_lookup, batch_format="pyarrow")
        jumped = labels.join(
            lookup, join_type="inner", num_partitions=num_partitions,
            on=("label",),
        )

        def take_jump(batch: pa.Table) -> pa.Table:
            return pa.table(
                {"node": batch["node"], "label": batch["label2"]}
            )

        labels = ensure_arrow(
            jumped.map_batches(take_jump, batch_format="pyarrow"),
            schema=label_schema).materialize()
        new_sig = _label_signature(labels)
        if new_sig == sig:
            break
        sig = new_sig

    def rename(batch: pa.Table) -> pa.Table:
        return pa.table({"id": batch["node"], "cluster_id": batch["label"]})

    return labels.map_batches(rename, batch_format="pyarrow")


def connected_components_blocked(edges, key_col: str = "block_key",
                                 src: str = "left_id",
                                 dst: str = "right_id"):
    """Connected components for BLOCKED edge sets: when every edge was
    generated within a blocking key (as in the linkage pipeline), a
    connected component can never span two block keys, so the closure
    is exactly one ``groupby(block_key)`` + per-group union-find — one
    shuffle, no iterative rounds. PARTITIONING ASSUMPTION (documented
    per SURVEY §2.4 J8): edges[key_col] must be the blocking key both
    endpoints share; violate it and use :func:`connected_components`.
    """
    # session-sized (VERDICT r3 #10, same rationale as
    # match._effective_buckets: ~32 groups per CPU with a 256 floor
    # keeps scheduling waves balanced; bucket count never changes the
    # output — disjoint blocks can't connect, so any grouping is exact)
    try:
        import ray

        cpus = int(ray.cluster_resources().get("CPU", 0)) \
            if ray.is_initialized() else 0
    except Exception:
        cpus = 0
    num_buckets = max(256, 32 * cpus)

    def to_bucket(batch: pa.Table) -> pa.Table:
        if key_col not in batch.column_names:
            return pa.table({"_bucket": pa.array([], pa.int32()),
                             "u": pa.array([], pa.string()),
                             "v": pa.array([], pa.string())})
        # C-level key hash (was a per-row Python _fnv64 loop — the
        # single biggest allocation-heavy-Python cost of this stage;
        # bucket placement is internal, so the hash fn is free to
        # change as long as equal keys collide)
        keys = np.asarray(batch.column(key_col))
        hb = (pd.util.hash_array(keys) % np.uint64(num_buckets)).astype(
            np.int32)
        u = batch.column(src).cast(pa.string())
        v = batch.column(dst).cast(pa.string())
        if u.null_count or v.null_count:
            # same loud guard as connected_components' _sym_edges —
            # np.unique would otherwise throw an opaque TypeError
            # (None vs str) deep inside per_bucket
            raise ValueError(
                f"connected_components_blocked: null {src}/{dst} "
                f"endpoint in edges — fix the upstream edge producer")
        return pa.table({"_bucket": pa.array(hb), "u": u, "v": v})

    bucketed = edges.map_batches(to_bucket, batch_format="pyarrow")

    # one group per hash bucket (bounded), min-label propagation
    # inside — the per-block grouping is implicit: disjoint blocks
    # cannot connect, so resolving a whole bucket at once is exact.
    # Vectorized (sorted-unique codes + numpy scatter-min + pointer
    # jumping) instead of a Python dict union-find: code order is
    # lexicographic, so the converged min CODE per component is the
    # min STRING — identical output to connected_components_local,
    # which also roots every union at the lexicographic min. The dict
    # version's per-edge Python allocations were the reason this stage
    # scaled NEGATIVELY 8->32 CPUs (12.8s -> 17.1s at 4.4M edges; this
    # VM's allocation-heavy-Python ceiling).
    def per_bucket(bucket: pa.Table) -> pa.Table:
        if "u" not in bucket.column_names or bucket.num_rows == 0:
            return pa.table({"id": pa.array([], pa.string()),
                             "cluster_id": pa.array([], pa.string())})
        u = np.asarray(bucket.column("u"))
        v = np.asarray(bucket.column("v"))
        uniq, inv = np.unique(np.concatenate([u, v]),
                              return_inverse=True)
        cu, cv = inv[:len(u)], inv[len(u):]
        labels = np.arange(len(uniq), dtype=np.int64)
        while True:
            before = labels.copy()
            em = np.minimum(labels[cu], labels[cv])
            np.minimum.at(labels, cu, em)
            np.minimum.at(labels, cv, em)
            while True:  # pointer jumping to per-round fixpoint
                nl = labels[labels]
                if np.array_equal(nl, labels):
                    break
                labels = nl
            if np.array_equal(labels, before):
                break
        return pa.table(
            {"id": pa.array(uniq, pa.string()),
             "cluster_id": pa.array(uniq[labels], pa.string())})

    # pre-shuffle block count sized to the session (was a hardcoded 64)
    nparts = max(8, min(64, cpus or 8))
    return bucketed.repartition(nparts).groupby("_bucket").map_groups(
        per_bucket, batch_format="pyarrow")


def connected_components_local(pairs: list[tuple[str, str]]) -> dict[str, str]:
    """Driver-side union-find oracle for tests (small inputs only)."""
    parent: dict[str, str] = {}

    def find(x: str) -> str:
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(str(a)), find(str(b))
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {x: find(x) for x in list(parent)}
