"""Similarity search over an embedding column (list<float>).

Brute-force cosine top-k as the exact baseline: the query matrix is
``ray.put`` ONCE and every ``map_batches`` task computes a partial
top-k against its batch (numpy matmul); partials are then reduced to
the global top-k (tiny driver-side merge — k*num_queries rows, never
the full dataset). The IVF-style scale path restricts scoring to the
``n_probe`` nearest coarse-centroid partitions.

Replaces the reference's TF-IDF brute cosine 1-NN matcher
(addresskit/matching/string_similarity.py:5-20,
addresskit/match_baseline.py:22-36) with a generic vector engine.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray


def _as_matrix(vectors) -> np.ndarray:
    m = np.asarray(vectors, dtype=np.float64)
    if m.ndim == 1:
        m = m[None, :]
    return m


def _unit(m: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(m, axis=1, keepdims=True)
    n[n == 0] = 1.0
    return m / n


def knn_bruteforce(ds, queries, vec_col: str, id_col: str, k: int = 5,
                   exclude_ids: set | None = None):
    """Exact cosine top-k for each query vector.

    queries: (q, d) array-like. Returns a list (per query) of
    (id, cosine) sorted by (-cosine, id). Deterministic tiebreak on id.
    """
    qm = _unit(_as_matrix(queries))
    qref = ray.put(qm)
    # ids always compare as STRINGS (results return str ids, so an
    # exclude set built from prior results must match regardless of the
    # id column's dtype; code-review r5)
    excl = {str(x) for x in (exclude_ids or ())}
    excl_ref = ray.put(excl)
    empty = pa.schema([("query", pa.int32()), ("id", pa.string()),
                       ("cosine", pa.float64())])

    def partial_topk(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or id_col not in batch.column_names:
            # IVF probe filters can empty a block; norm(axis=1) on a
            # shape-(0,) array raises (code-review r5)
            return empty.empty_table()
        q = ray.get(qref)
        ex = ray.get(excl_ref)
        ids = np.array([str(x) for x in
                        batch.column(id_col).to_pylist()], dtype=object)
        vecs = _unit(np.array(batch.column(vec_col).to_pylist(),
                              dtype=np.float64))
        sims = vecs @ q.T  # (n, nq)
        out_q, out_id, out_sim = [], [], []
        for qi in range(q.shape[0]):
            col = sims[:, qi]
            # (-cosine, id) order INSIDE the partial too: a plain
            # stable argsort truncated at the cutoff kept whichever
            # tied row came first in the batch, so the result depended
            # on block partitioning (code-review r5). lexsort's last
            # key is primary: -col asc == cosine desc, then id asc.
            order = np.lexsort((ids, -col))[: k + len(ex)]
            for idx in order:
                if ids[idx] in ex:
                    continue
                out_q.append(qi)
                out_id.append(ids[idx])
                out_sim.append(float(col[idx]))
        return pa.table(
            {
                "query": pa.array(out_q, pa.int32()),
                "id": pa.array(out_id, pa.string()),
                "cosine": pa.array(out_sim, pa.float64()),
            }
        )

    partials = ds.map_batches(partial_topk, batch_format="pyarrow")
    # global reduce with BOUNDED per-query candidate lists: compact to
    # the exact (-cosine, id) top-k whenever a list doubles, so driver
    # memory is O(nq * k), not O(num_blocks * nq * k) (code-review r5)
    bound = max(2 * (k + len(excl)), 64)

    def _compact(cand: list) -> None:
        cand.sort(key=lambda t: (-t[0], t[1]))
        del cand[k:]

    cands: dict[int, list] = {}
    for b in partials.iter_batches(batch_format="pyarrow"):
        for qi, i, s in zip(
            b.column("query").to_pylist(),
            b.column("id").to_pylist(),
            b.column("cosine").to_pylist(),
        ):
            c = cands.setdefault(qi, [])
            c.append((s, i))
            if len(c) >= bound:
                _compact(c)
    results = []
    nq = qm.shape[0]
    for qi in range(nq):
        cand = cands.get(qi, [])
        _compact(cand)
        results.append([(i, s) for s, i in cand])
    return results


class IVFIndex:
    """Coarse-quantizer (IVF) ANN: deterministic k-means-lite centroids
    (seeded, few iterations) computed from a sample; vectors are
    partitioned by nearest centroid; queries probe the ``n_probe``
    nearest lists only. Recall/cost tradeoff documented per list."""

    def __init__(self, n_lists: int = 16, n_probe: int = 4, seed: int = 42,
                 iters: int = 5):
        self.n_lists = n_lists
        self.n_probe = n_probe
        self.seed = seed
        self.iters = iters
        self.centroids: np.ndarray | None = None

    def fit(self, sample: np.ndarray) -> "IVFIndex":
        rng = np.random.RandomState(self.seed)
        sample = _unit(_as_matrix(sample))
        n = sample.shape[0]
        k = min(self.n_lists, n)
        centroids = sample[rng.choice(n, size=k, replace=False)]
        for _ in range(self.iters):
            assign = np.argmax(sample @ centroids.T, axis=1)
            for c in range(k):
                members = sample[assign == c]
                if len(members):
                    v = members.mean(axis=0)
                    nv = np.linalg.norm(v)
                    if nv > 0:
                        centroids[c] = v / nv
        self.centroids = centroids
        return self

    def assign_dataset(self, ds, vec_col: str):
        cref = ray.put(self.centroids)

        def assign(batch: pa.Table) -> pa.Table:
            cents = ray.get(cref)
            vecs = _unit(np.array(batch.column(vec_col).to_pylist(),
                                  dtype=np.float64))
            lst = np.argmax(vecs @ cents.T, axis=1)
            return batch.append_column(
                "ivf_list", pa.array(lst.astype(np.int32)))

        return ds.map_batches(assign, batch_format="pyarrow")

    def _probe_lists(self, qm: np.ndarray) -> set[int]:
        probe = np.argsort(-(qm @ self.centroids.T),
                           axis=1)[:, : self.n_probe]
        return {int(v) for row in probe for v in row}

    def search(self, ds_assigned, queries, vec_col: str, id_col: str,
               k: int = 5):
        """Probe only the n_probe nearest lists per query (vectorized
        pc.is_in filter over the assigned column — a full scan; use
        ``write_partitioned`` + ``search_partitioned`` to prune at the
        READ instead when the index lives on disk)."""
        import pyarrow.compute as pc

        qm = _unit(_as_matrix(queries))
        wanted = pa.array(sorted(self._probe_lists(qm)), pa.int32())

        def keep(batch: pa.Table) -> pa.Table:
            return batch.filter(pc.fill_null(
                pc.is_in(batch.column("ivf_list"), value_set=wanted),
                False))

        filtered = ds_assigned.map_batches(keep, batch_format="pyarrow")
        return knn_bruteforce(filtered, qm, vec_col, id_col, k=k)

    def write_partitioned(self, ds_assigned, path: str) -> None:
        """Persist the assigned dataset hive-partitioned by ivf_list
        (one directory per coarse list) so searches read ONLY the
        probed partitions from storage — the 100TB path the in-memory
        ``search`` full scan cannot give."""
        ds_assigned.write_parquet(path, partition_cols=["ivf_list"])

    def search_partitioned(self, path: str, queries, vec_col: str,
                           id_col: str, k: int = 5):
        """Partition-pruned search: list the probed ``ivf_list=<n>``
        directories and read_parquet only those. LOCAL paths only —
        the directory probe uses os.listdir, which would silently see
        nothing on a remote URI and return empty results
        (code-review r5); raise instead until a filesystem-aware
        lister is wired in."""
        import os

        import ray.data as rd

        if "://" in path:
            raise ValueError(
                "search_partitioned prunes partitions with os.listdir "
                f"and supports local paths only, got {path!r}")
        qm = _unit(_as_matrix(queries))
        files: list[str] = []
        for l in sorted(self._probe_lists(qm)):
            d = os.path.join(path, f"ivf_list={l}")
            if os.path.isdir(d):
                files.extend(
                    os.path.join(d, f) for f in sorted(os.listdir(d))
                    if f.endswith(".parquet"))
        if not files:
            return [[] for _ in range(qm.shape[0])]
        return knn_bruteforce(rd.read_parquet(files), qm, vec_col,
                              id_col, k=k)
