"""Learned matchers: hashed TF-IDF (char and word n-gram channels,
base + side text) + brute cosine 1-NN, and a numpy softmax (SGD)
classifier — the Ray-native reimplementation of the reference's
learned baselines (T1-T3 in SURVEY §2.3):

- TF-IDF char 3-5-gram vectorizer + brute cosine KNN
  (reference addresskit/matching/string_similarity.py:5-20,
  addresskit/match_baseline.py:22-36, scripts/baseline_submission.py:94-109)
- dual-channel (char + word) base + side-signature feature union
  (reference scripts/train_baseline.py:64-130 hstacks 4 vectorizers)
- SGD logistic classifier train + predict
  (reference scripts/train_baseline.py:133-207)

No sklearn/scipy in this environment, so each channel uses feature
hashing (its own 2**nbits slice of the concatenated space — the hstack
equivalent) with an idf fitted over the train corpus, and the
classifier is a softmax regression trained with minibatch SGD in
numpy. The Ray pattern is the important part: FIT on the driver (train
side is the small side), ``ray.put`` the model ONCE, then map_batches
with an actor pool whose __init__ does ray.get — the
broadcast-small-side lookup join, never re-shipped per batch.

Memory shape (VERDICT r1 #8): inference is SPARSE end-to-end — the
per-batch transform emits COO (row, col, value) triples (O(nnz), not
O(batch x 2**nbits) dense: 1 GB/batch at the round-1 defaults), the
train matrix is broadcast as CSC arrays, and cosine similarities are
scatter-accumulated over the shared columns only. The dense
``transform`` remains for small driver-side fits.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray


def _ngram_indices(text: str, lo: int, hi: int, nbits: int,
                   analyzer: str = "char") -> np.ndarray:
    """Hashed n-gram feature ids for n in [lo, hi]. ``analyzer``:
    "char" slides over characters of the whitespace-squeezed text;
    "word" slides over whitespace tokens (n-grams joined by a space)."""
    t = " ".join((text or "").lower().split())
    mask = (1 << nbits) - 1
    idx = []
    if analyzer == "word":
        toks = t.split()
        for n in range(lo, hi + 1):
            if len(toks) < n:
                continue
            for i in range(len(toks) - n + 1):
                g = " ".join(toks[i:i + n])
                h = hashlib.blake2b(g.encode("utf-8"),
                                    digest_size=8).digest()
                idx.append(int.from_bytes(h, "big") & mask)
    else:
        for n in range(lo, hi + 1):
            if len(t) < n:
                continue
            for i in range(len(t) - n + 1):
                h = hashlib.blake2b(t[i:i + n].encode("utf-8"),
                                    digest_size=8).digest()
                idx.append(int.from_bytes(h, "big") & mask)
    return np.asarray(idx, dtype=np.int64)


class HashedTfidf:
    """Feature-hashing n-gram TF-IDF for ONE channel (dim 2**nbits).

    fit() computes document frequencies -> idf. transform_coo() is the
    sparse path (per-row L2-normalized COO triples); transform() emits
    dense rows for small driver-side uses only."""

    def __init__(self, ngram_range: tuple[int, int] = (3, 5),
                 nbits: int = 18, analyzer: str = "char"):
        self.lo, self.hi = ngram_range
        self.nbits = nbits
        self.analyzer = analyzer
        self.dim = 1 << nbits
        self.idf: np.ndarray | None = None

    def fit(self, texts) -> "HashedTfidf":
        df = np.zeros(self.dim, dtype=np.int64)
        n = 0
        for t in texts:
            ids = np.unique(_ngram_indices(t, self.lo, self.hi,
                                           self.nbits, self.analyzer))
            df[ids] += 1
            n += 1
        self.idf = np.log((1.0 + n) / (1.0 + df)) + 1.0
        return self

    def row_coo(self, text: str) -> tuple[np.ndarray, np.ndarray]:
        """(cols, values) of the L2-normalized tf-idf row."""
        assert self.idf is not None, "fit first"
        ids = _ngram_indices(text, self.lo, self.hi, self.nbits,
                             self.analyzer)
        if len(ids) == 0:
            return (np.empty(0, dtype=np.int64),
                    np.empty(0, dtype=np.float32))
        uniq, counts = np.unique(ids, return_counts=True)
        vals = (counts * self.idf[uniq]).astype(np.float32)
        norm = np.linalg.norm(vals)
        if norm > 0:
            vals = vals / norm
        return uniq, vals

    def transform_coo(self, texts):
        """COO triples (rows, cols, vals) over len(texts) rows."""
        rows, cols, vals = [], [], []
        for r, t in enumerate(texts):
            c, v = self.row_coo(t)
            rows.append(np.full(len(c), r, dtype=np.int64))
            cols.append(c)
            vals.append(v)
        return (np.concatenate(rows) if rows else np.empty(0, np.int64),
                np.concatenate(cols) if cols else np.empty(0, np.int64),
                np.concatenate(vals) if vals else np.empty(0, np.float32))

    def transform(self, texts) -> np.ndarray:
        """Dense (len(texts), dim) — driver-side fits only; inference
        uses the sparse path."""
        out = np.zeros((len(texts), self.dim), dtype=np.float32)
        for r, t in enumerate(texts):
            c, v = self.row_coo(t)
            out[r, c] = v
        return out


class MultiChannelTfidf:
    """Feature union of hashed TF-IDF channels — the reference's
    hstack of base-char, base-word, side-char, side-word vectorizers
    (train_baseline.py:64-130). Each channel owns a contiguous
    2**nbits slice of the concatenated space; channel rows are
    L2-normalized individually (sklearn TfidfVectorizer semantics under
    hstack), then the concatenated row is normalized to unit so dot
    products are true cosines.

    ``channels``: list of (source_index, analyzer, ngram_range, nbits);
    ``source_index`` picks which parallel text list (e.g. 0 = base
    text, 1 = side signature) feeds the channel."""

    def __init__(self, channels):
        self.specs = list(channels)
        self.vecs = [HashedTfidf(ngram_range=ng, nbits=nb, analyzer=an)
                     for (_src, an, ng, nb) in self.specs]
        self.offsets = np.cumsum(
            [0] + [v.dim for v in self.vecs])[:-1]
        self.dim = int(sum(v.dim for v in self.vecs))

    def fit(self, columns: list[list[str]]) -> "MultiChannelTfidf":
        for (src, _an, _ng, _nb), vec in zip(self.specs, self.vecs):
            vec.fit(columns[src])
        return self

    def transform_coo(self, columns: list[list[str]]):
        n = len(columns[0])
        rows, cols, vals = [], [], []
        for r in range(n):
            ch_cols, ch_vals = [], []
            for (src, _an, _ng, _nb), vec, off in zip(
                    self.specs, self.vecs, self.offsets):
                c, v = vec.row_coo(columns[src][r])
                ch_cols.append(c + off)
                ch_vals.append(v)
            c = np.concatenate(ch_cols)
            v = np.concatenate(ch_vals)
            norm = np.linalg.norm(v)
            if norm > 0:
                v = v / norm
            rows.append(np.full(len(c), r, dtype=np.int64))
            cols.append(c)
            vals.append(v.astype(np.float32))
        return (np.concatenate(rows) if rows else np.empty(0, np.int64),
                np.concatenate(cols) if cols else np.empty(0, np.int64),
                np.concatenate(vals) if vals else np.empty(0, np.float32))


def _coo_to_csc(rows: np.ndarray, cols: np.ndarray, vals: np.ndarray,
                dim: int):
    """(indptr[dim+1], row_idx, data) sorted by column."""
    order = np.argsort(cols, kind="stable")
    cols_s = cols[order]
    indptr = np.zeros(dim + 1, dtype=np.int64)
    np.add.at(indptr, cols_s + 1, 1)
    np.cumsum(indptr, out=indptr)
    return indptr, rows[order].astype(np.int64), vals[order]


def _multi_arange(starts: np.ndarray, lens: np.ndarray) -> np.ndarray:
    """Concatenation of arange(s, s+l) per (s, l), fully vectorized."""
    total = int(lens.sum())
    if total == 0:
        return np.empty(0, dtype=np.int64)
    ends_cum = np.cumsum(lens)
    return (np.arange(total, dtype=np.int64)
            - np.repeat(ends_cum - lens, lens)
            + np.repeat(starts, lens))


def _sparse_sims(q_rows, q_cols, q_vals, csc, n_q: int,
                 n_train: int,
                 products_per_chunk: int = 50_000_000) -> np.ndarray:
    """(n_q, n_train) cosine sims of unit COO queries against a unit
    CSC train matrix, touching only the queries' nonzero columns.
    Accumulation uses np.bincount over flattened (row, train) indices
    (far faster than np.add.at), processed in bounded chunks of
    ``products_per_chunk`` scatter products: on template-heavy corpora
    a gram's train document frequency can approach n_train, so one
    batch can produce hundreds of millions of products — unchunked
    that is several multi-GB intermediates at once."""
    indptr, t_rows, t_vals = csc
    starts = indptr[q_cols]
    lens = indptr[q_cols + 1] - starts
    total = int(lens.sum())
    sims_flat = np.zeros(n_q * n_train, dtype=np.float64)
    if total == 0:
        return sims_flat.reshape(n_q, n_train).astype(np.float32)
    cum = np.cumsum(lens)
    # transform_coo emits rows in non-decreasing order, so each chunk
    # spans a contiguous query-row range — bound the bincount temp to
    # that range instead of the full (n_q x n_train) (which allocated
    # a second full-size array per chunk, defeating the chunking's
    # memory purpose; code-review r5). Fallback to full width if the
    # sortedness precondition ever breaks.
    rows_sorted = len(q_rows) == 0 or bool(np.all(np.diff(q_rows) >= 0))
    s = 0
    while s < len(q_cols):
        base = cum[s - 1] if s else 0
        e = int(np.searchsorted(cum, base + products_per_chunk,
                                side="right")) + 1
        e = max(s + 1, min(e, len(q_cols)))
        gather = _multi_arange(starts[s:e], lens[s:e])
        if len(gather):
            rq = np.repeat(q_rows[s:e], lens[s:e])
            vq = np.repeat(q_vals[s:e], lens[s:e])
            if rows_sorted:
                r0 = int(q_rows[s])
                r1 = int(q_rows[e - 1])
                flat = (rq - r0) * n_train + t_rows[gather]
                sims_flat[r0 * n_train:(r1 + 1) * n_train] += \
                    np.bincount(flat, weights=(vq * t_vals[gather]),
                                minlength=(r1 - r0 + 1) * n_train)
            else:
                flat = rq * n_train + t_rows[gather]
                sims_flat += np.bincount(
                    flat, weights=(vq * t_vals[gather]),
                    minlength=n_q * n_train)
        s = e
    return sims_flat.reshape(n_q, n_train).astype(np.float32)


class KnnPredict:
    """Actor-pool stage: cosine 1-NN label assignment against a
    broadcast (vectorizer, CSC train matrix, labels) bundle — the J7
    semi-join-like lookup. Bundle loaded ONCE per actor in __init__;
    per-batch work is sparse (O(nnz) memory, never batch x dim)."""

    def __init__(self, bundle_ref, text_col: str,
                 side_col: str | None = None):
        # (a dead ``k`` parameter was removed in r5: __call__ always
        # did 1-NN argmax, so accepting k was a misleading no-op)
        bundle = ray.get(bundle_ref)
        self.vec: MultiChannelTfidf = bundle["vectorizer"]
        self.csc = bundle["csc"]
        self.n_train = bundle["n_train"]
        self.labels = bundle["labels"]
        self.text_col = text_col
        self.side_col = side_col

    def _columns(self, batch: pa.Table) -> list[list[str]]:
        cols = [batch.column(self.text_col).to_pylist()]
        if self.side_col is not None:
            cols.append(batch.column(self.side_col).to_pylist())
        return cols

    def __call__(self, batch: pa.Table) -> pa.Table:
        columns = self._columns(batch)
        n = len(columns[0])
        qr, qc, qv = self.vec.transform_coo(columns)
        sims = _sparse_sims(qr, qc, qv, self.csc, n, self.n_train)
        best = np.argmax(sims, axis=1)
        pred = [self.labels[i] for i in best]
        sim = sims[np.arange(n), best]
        batch = batch.append_column(
            "pred_label", pa.array(pred))
        return batch.append_column(
            "pred_sim", pa.array(sim.astype(np.float64)))


def _default_channels(ngram_range, nbits, word_ngram_range, word_nbits,
                      with_side: bool):
    channels = [(0, "char", tuple(ngram_range), nbits)]
    if word_ngram_range is not None:
        channels.append((0, "word", tuple(word_ngram_range), word_nbits))
    if with_side:
        channels.append((1, "char", tuple(ngram_range), nbits))
        if word_ngram_range is not None:
            channels.append(
                (1, "word", tuple(word_ngram_range), word_nbits))
    return channels


MAX_TRAIN_ROWS = 200_000


def collect_train_split(ds, max_rows: int = MAX_TRAIN_ROWS,
                        seed: int = 42) -> list[dict]:
    """Bounded driver-side collect of a training split (VERDICT r2 #6).

    The fit itself is driver-side BY CONTRACT — the reference fits on a
    pandas frame too (scripts/train_baseline.py:133-160) — but an
    unbounded ``take_all()`` breaks at 100x scale. This helper is the
    required doorway: splits over ``max_rows`` are deterministically
    downsampled BEFORE the collect, so driver memory stays bounded by
    ~max_rows rows while small splits pass through untouched
    (bit-identical bundles).

    Sampling is a per-row content-hash Bernoulli filter
    (``pd.util.hash_pandas_object`` with a seed-derived key) rather
    than ``Dataset.random_sample``: Ray's sampler draws from per-task
    RNG state, so its output depends on dynamic block boundaries and
    is NOT reproducible run-to-run even with a fixed seed. The hash
    filter is row-local, hence invariant to blocking/parallelism.
    (Identical rows share a fate — acceptable for train-split
    sampling, where duplicates carry no extra information.) The
    sampled rows are returned in canonical (hash-sorted) order:
    ``take_all`` block order follows task completion order, so without
    a driver-side sort two runs return the same SET in different
    ORDER — and row order feeds the SGD fit."""
    # materialize once: count() executes the upstream pipeline, and
    # the over-cap sampling pass would otherwise re-run it from
    # scratch — doubling e.g. the lang-ID inference feeding it
    # (code-review r5)
    ds = ds.materialize()
    n = ds.count()
    if n > max_rows:
        fraction = max_rows / n
        hash_key = f"{seed & 0xFFFFFFFFFFFFFFFF:016x}"

        def keep(df):
            h = pd.util.hash_pandas_object(df, index=False,
                                           hash_key=hash_key)
            u = (h % np.uint64(1 << 32)).astype(np.float64) / (1 << 32)
            out = df[u < fraction].copy()
            out["__sample_hash__"] = h[u < fraction].astype(np.uint64)
            return out

        rows = ds.map_batches(keep, batch_format="pandas").take_all()
        rows.sort(key=lambda r: r["__sample_hash__"])
        for r in rows:
            del r["__sample_hash__"]
        return rows
    return ds.take_all()


def fit_knn_bundle(train_texts, train_labels,
                   ngram_range=(3, 5), nbits: int = 18,
                   word_ngram_range: tuple[int, int] | None = None,
                   word_nbits: int = 16,
                   side_texts=None):
    """Driver-side fit -> ray.put object ref for the actor pool.
    ``word_ngram_range`` adds the word-gram channel; ``side_texts``
    (aligned with train_texts) adds the side-signature channels —
    together the reference's 4-vectorizer union.

    Size contract: callers collecting a train split from a Dataset must
    go through :func:`collect_train_split` (bounded at MAX_TRAIN_ROWS)
    rather than a raw ``take_all()``."""
    train_texts = list(train_texts)
    columns = [train_texts]
    if side_texts is not None:
        columns.append(list(side_texts))
    vec = MultiChannelTfidf(_default_channels(
        ngram_range, nbits, word_ngram_range, word_nbits,
        side_texts is not None)).fit(columns)
    rows, cols, vals = vec.transform_coo(columns)
    csc = _coo_to_csc(rows, cols, vals, vec.dim)
    return ray.put({"vectorizer": vec, "csc": csc,
                    "n_train": len(train_texts),
                    "labels": list(train_labels)})


def knn_label_dataset(ds, bundle_ref, text_col: str,
                      side_col: str | None = None,
                      concurrency: int = 4, batch_size: int = 1024):
    """1-NN label assignment over a Dataset (reference
    baseline_submission.py:104-109 flow)."""
    return ds.map_batches(
        KnnPredict,
        fn_constructor_args=(bundle_ref, text_col, side_col),
        batch_format="pyarrow",
        batch_size=batch_size,
        # autoscale from 1 like lm.score_perplexity: a FIXED pool can
        # reserve every CPU of a small session before the upstream
        # read produces a block — the race-dependent deadlock fixed in
        # lm.py r4 (code-review r5)
        concurrency=(1, concurrency) if isinstance(concurrency, int)
        else concurrency,
        num_cpus=1,
    )


class SoftmaxSGD:
    """Multinomial logistic regression, minibatch SGD, numpy-only.
    Mirrors the role of the reference's SGDClassifier(log_loss)
    (train_baseline.py:133-160); deterministic given the seed."""

    def __init__(self, dim: int, n_classes: int, lr: float = 0.5,
                 epochs: int = 5, batch: int = 256, seed: int = 42,
                 l2: float = 1e-6):
        self.w = np.zeros((dim, n_classes), dtype=np.float32)
        self.b = np.zeros(n_classes, dtype=np.float32)
        self.lr = lr
        self.epochs = epochs
        self.batch = batch
        self.seed = seed
        self.l2 = l2

    def fit(self, x: np.ndarray, y: np.ndarray) -> "SoftmaxSGD":
        rng = np.random.RandomState(self.seed)
        n = x.shape[0]
        for _ in range(self.epochs):
            order = rng.permutation(n)
            for s in range(0, n, self.batch):
                idx = order[s:s + self.batch]
                xb, yb = x[idx], y[idx]
                logits = xb @ self.w + self.b
                logits -= logits.max(axis=1, keepdims=True)
                p = np.exp(logits)
                p /= p.sum(axis=1, keepdims=True)
                p[np.arange(len(yb)), yb] -= 1.0
                g_w = xb.T @ p / len(yb) + self.l2 * self.w
                g_b = p.mean(axis=0)
                self.w -= self.lr * g_w
                self.b -= self.lr * g_b
        return self

    def predict(self, x: np.ndarray) -> np.ndarray:
        return np.argmax(x @ self.w + self.b, axis=1)

    def logits_coo(self, rows, cols, vals, n: int) -> np.ndarray:
        """Sparse logits: accumulated from the W rows of the query's
        nonzero columns only (shared by predict_coo and cv_metrics —
        code-review r5 deduplicated an inline copy)."""
        logits = np.tile(self.b, (n, 1)).astype(np.float32)
        if len(rows):
            np.add.at(logits, rows, vals[:, None] * self.w[cols])
        return logits

    def predict_coo(self, rows, cols, vals, n: int) -> np.ndarray:
        """Sparse inference: argmax of :meth:`logits_coo`."""
        return np.argmax(self.logits_coo(rows, cols, vals, n), axis=1)


class ClassifierPredict:
    """Actor-pool inference stage for the trained classifier
    (T3 inference: map_batches(ScorerActor, concurrency=N));
    sparse per-batch transform + W-row gather."""

    def __init__(self, bundle_ref, text_col: str,
                 side_col: str | None = None):
        bundle = ray.get(bundle_ref)
        self.vec: MultiChannelTfidf = bundle["vectorizer"]
        self.model: SoftmaxSGD = bundle["model"]
        self.classes = bundle["classes"]
        self.text_col = text_col
        self.side_col = side_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        columns = [batch.column(self.text_col).to_pylist()]
        if self.side_col is not None:
            columns.append(batch.column(self.side_col).to_pylist())
        n = len(columns[0])
        qr, qc, qv = self.vec.transform_coo(columns)
        pred = self.model.predict_coo(qr, qc, qv, n)
        return batch.append_column(
            "pred_label", pa.array([self.classes[i] for i in pred]))


def fit_classifier_bundle(train_texts, train_labels,
                          ngram_range=(3, 5), nbits: int = 16,
                          word_ngram_range: tuple[int, int] | None = None,
                          word_nbits: int = 14,
                          side_texts=None, **sgd_kwargs):
    """Driver-side TF-IDF fit + SGD train -> broadcast ref. The dense
    train matrix is driver-side only (train is the small split).

    Size contract: collect the split via :func:`collect_train_split`
    (bounded at MAX_TRAIN_ROWS), never a raw ``take_all()``."""
    vec, model, classes = _fit_classifier_local(
        train_texts, train_labels, ngram_range, nbits,
        word_ngram_range, word_nbits, side_texts, **sgd_kwargs)
    return ray.put({"vectorizer": vec, "model": model, "classes": classes})


def _fit_classifier_local(train_texts, train_labels, ngram_range,
                          nbits, word_ngram_range, word_nbits,
                          side_texts, **sgd_kwargs):
    train_texts = list(train_texts)
    columns = [train_texts]
    if side_texts is not None:
        columns.append(list(side_texts))
    vec = MultiChannelTfidf(_default_channels(
        ngram_range, nbits, word_ngram_range, word_nbits,
        side_texts is not None)).fit(columns)
    rows, cols, vals = vec.transform_coo(columns)
    dense_bytes = len(train_texts) * vec.dim * 4
    if dense_bytes > (2 << 30):
        # this local fit DENSIFIES rows x dim float32 — at the
        # collect_train_split cap (200k rows) and nbits=16 that is
        # ~52 GB, an OOM the row-count bound alone cannot see
        # (code-review r5). Fail loudly with the two real options.
        raise ValueError(
            f"_fit_classifier_local: dense train matrix would be "
            f"{dense_bytes / (1 << 30):.1f} GiB ({len(train_texts)} "
            f"rows x dim {vec.dim}); lower max_rows/nbits or use "
            f"fit_classifier_distributed (never densifies)")
    x = np.zeros((len(train_texts), vec.dim), dtype=np.float32)
    x[rows, cols] = vals
    classes = sorted(set(train_labels))
    cls_idx = {c: i for i, c in enumerate(classes)}
    y = np.asarray([cls_idx[c] for c in train_labels])
    model = SoftmaxSGD(vec.dim, len(classes), **sgd_kwargs).fit(x, y)
    return vec, model, classes


def classification_metrics(y_true, y_pred, topk_lists=None,
                           k: int = 3) -> dict:
    """accuracy, macro-F1 (averaged over the union of true+pred
    classes), and top-k accuracy when per-row ranked label lists are
    given — the reference's eval metrics (train_baseline.py:186-196)."""
    y_true = list(y_true)
    y_pred = list(y_pred)
    n = len(y_true)
    acc = sum(t == p for t, p in zip(y_true, y_pred)) / n if n else 0.0
    classes = sorted(set(y_true) | set(y_pred))
    f1s = []
    for c in classes:
        tp = sum(1 for t, p in zip(y_true, y_pred) if t == c and p == c)
        fp = sum(1 for t, p in zip(y_true, y_pred) if t != c and p == c)
        fn = sum(1 for t, p in zip(y_true, y_pred) if t == c and p != c)
        prec = tp / (tp + fp) if tp + fp else 0.0
        rec = tp / (tp + fn) if tp + fn else 0.0
        f1s.append(2 * prec * rec / (prec + rec) if prec + rec else 0.0)
    out = {"accuracy": acc,
           "macro_f1": sum(f1s) / len(f1s) if f1s else 0.0}
    if topk_lists is not None:
        out[f"top{k}_accuracy"] = sum(
            1 for t, cand in zip(y_true, topk_lists) if t in cand[:k]
        ) / n if n else 0.0
    return out


def cv_metrics(texts, labels, n_folds: int = 3, topk: int = 3,
               ngram_range=(3, 5), nbits: int = 14,
               word_ngram_range=None, word_nbits: int = 14,
               **sgd_kwargs) -> dict:
    """G9: deterministic k-fold cross-validation of the hashed-TF-IDF
    softmax classifier with mean accuracy / macro-F1 / top-k accuracy
    across folds (reference scripts/train_baseline.py:174-196).
    Driver-side by design — the train split is the small side; fold
    assignment is index % n_folds (order-stable, no RNG)."""
    texts = list(texts)
    labels = list(labels)
    per_fold = []
    for f in range(n_folds):
        tr_idx = [i for i in range(len(texts)) if i % n_folds != f]
        te_idx = [i for i in range(len(texts)) if i % n_folds == f]
        if not tr_idx or not te_idx:
            continue
        vec, model, classes = _fit_classifier_local(
            [texts[i] for i in tr_idx], [labels[i] for i in tr_idx],
            ngram_range, nbits, word_ngram_range, word_nbits, None,
            **sgd_kwargs)
        rows, cols, vals = vec.transform_coo(
            [[texts[i] for i in te_idx]])
        logits = model.logits_coo(rows, cols, vals, len(te_idx))
        order = np.argsort(-logits, axis=1)
        ranked = [[classes[j] for j in row[:topk]] for row in order]
        y_pred = [r[0] for r in ranked]
        y_true = [labels[i] for i in te_idx]
        per_fold.append(classification_metrics(
            y_true, y_pred, topk_lists=ranked, k=topk))
    keys = per_fold[0].keys() if per_fold else []
    agg = {f"mean_{k}": sum(m[k] for m in per_fold) / len(per_fold)
           for k in keys}
    agg["folds"] = per_fold
    return agg


def svd_project(x: np.ndarray, k: int = 256, seed: int = 42,
                power_iters: int = 2):
    """Driver-side randomized truncated SVD + L2 row normalization —
    the reference's TruncatedSVD(256) + Normalizer low-rank fast path
    (compare_train_clean_vs_lowconf.py:52-106). Small-split only (it
    densifies (k+8, dim) scratch); deterministic given the seed.

    Returns (z, vt): ``z`` the L2-normalized (n, k) projection of
    ``x``; project new rows with ``new @ vt.T`` (then normalize)."""
    rng = np.random.RandomState(seed)
    n, d = x.shape
    k = min(k, n, d)
    omega = rng.randn(d, k + 8).astype(np.float32)
    y = x @ omega
    for _ in range(power_iters):
        y, _ = np.linalg.qr(y)
        y = x @ (x.T @ y)
    q, _ = np.linalg.qr(y)
    b = q.T @ x                       # (k+8, d)
    _ub, s, vt = np.linalg.svd(b, full_matrices=False)
    vt = vt[:k]
    z = x @ vt.T
    norms = np.linalg.norm(z, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return (z / norms).astype(np.float32), vt.astype(np.float32)


def classify_dataset(ds, bundle_ref, text_col: str,
                     side_col: str | None = None,
                     concurrency: int = 4, batch_size: int = 1024):
    return ds.map_batches(
        ClassifierPredict,
        fn_constructor_args=(bundle_ref, text_col, side_col),
        batch_format="pyarrow",
        batch_size=batch_size,
        # autoscale from 1 — same small-session deadlock rationale as
        # knn_label_dataset above (code-review r5)
        concurrency=(1, concurrency) if isinstance(concurrency, int)
        else concurrency,
        num_cpus=1,
    )


# ----------------------------------------------------------------------
# Distributed classifier fit — the 100x path past collect_train_split.
#
# collect_train_split bounds the driver collect (the reference's own
# fit is a pandas frame, scripts/train_baseline.py:133-160), but a
# training split that legitimately exceeds MAX_TRAIN_ROWS needs a fit
# that never collects rows at all. This is the textbook synchronous
# data-parallel recipe (public knowledge: full-batch gradient descent
# with map-reduce gradient sums; cf. Zinkevich et al., "Parallelized
# Stochastic Gradient Descent", NeurIPS 2010, for the family):
#
#   pass 1  map_batches  -> per-block SPARSE document-frequency rows
#           map_batches  -> tree-combine level (dense-sum, sparse-out)
#           driver       -> tiny final sum => idf per channel + classes
#   pass 2  map_batches  -> final tf-idf COO per block, packed binary,
#           .materialize() ONCE (features are reused every epoch;
#           re-hashing text per epoch would re-pay pass 2 x epochs)
#   epochs  map_batches  -> per-block (grad_w, grad_b, loss) sums from
#           the COO (no densified row matrix anywhere),
#           map_batches  -> combine level, driver applies the update.
#
# Every driver-side object is O(dim x classes) (the model), never
# O(rows). Gradients ride the same two-level combine as the df pass so
# the driver take_all sees ~n_blocks/combine_size rows; add combine
# levels before the driver sum if block counts grow past that.
# ----------------------------------------------------------------------


def _pack(a: np.ndarray) -> bytes:
    return a.tobytes()


def _df_partial_fn(channels, text_col, side_col, label_col):
    """Per-block sparse df + label set for each channel (pass 1).

    Plain TASK function, not an actor pool: there is no per-worker
    setup to amortize, and a second reserved actor pool downstream
    can deadlock a small session (both pools need their full CPU
    reservation before either produces a block)."""
    specs = list(channels)

    def fn(batch: pa.Table) -> pa.Table:
        columns = [batch.column(text_col).to_pylist()]
        if side_col is not None:
            columns.append(batch.column(side_col).to_pylist())
        out: dict = {"n": [len(columns[0])]}
        for ci, (src, an, (lo, hi), nbits) in enumerate(specs):
            per_doc = [np.unique(_ngram_indices(t or "", lo, hi, nbits, an))
                       for t in columns[src]]
            allv = (np.concatenate(per_doc) if per_doc
                    else np.empty(0, np.int64))
            ids, cnt = np.unique(allv, return_counts=True)
            out[f"ids{ci}"] = [_pack(ids.astype(np.int64))]
            out[f"cnt{ci}"] = [_pack(cnt.astype(np.int64))]
        labels = sorted(set(batch.column(label_col).to_pylist()))
        out["labels"] = [labels]
        return pa.table(out)

    return fn


def _df_combine_fn(n_channels: int, dims: list[int]):
    """Sum a block of sparse df rows into one sparse row (tree level)."""

    def fn(batch: pa.Table) -> pa.Table:
        out: dict = {"n": [int(pc.sum(batch.column("n")).as_py() or 0)]}
        for ci in range(n_channels):
            dense = np.zeros(dims[ci], dtype=np.int64)
            for ids_b, cnt_b in zip(batch.column(f"ids{ci}").to_pylist(),
                                    batch.column(f"cnt{ci}").to_pylist()):
                ids = np.frombuffer(ids_b, dtype=np.int64)
                np.add.at(dense, ids, np.frombuffer(cnt_b, np.int64))
            nz = np.nonzero(dense)[0]
            out[f"ids{ci}"] = [_pack(nz)]
            out[f"cnt{ci}"] = [_pack(dense[nz])]
        labels = sorted({v for row in batch.column("labels").to_pylist()
                         for v in row})
        out["labels"] = [labels]
        return pa.table(out)

    return fn


def _featurize_fn(vec_ref, text_col, side_col, label_col, cls_idx):
    """Pass 2: final tf-idf COO per block, packed binary (one row per
    input block; ``cols`` int32 — channel dims stay < 2**31). The
    broadcast vectorizer is fetched per task via ray.get (zero-copy
    from the node's object store)."""
    cls_idx = dict(cls_idx)

    def fn(batch: pa.Table) -> pa.Table:
        vec: MultiChannelTfidf = ray.get(vec_ref)
        columns = [batch.column(text_col).to_pylist()]
        if side_col is not None:
            columns.append(batch.column(side_col).to_pylist())
        rows, cols, vals = vec.transform_coo(columns)
        y = np.asarray(
            [cls_idx[v] for v in batch.column(label_col).to_pylist()],
            dtype=np.int32)
        return pa.table({
            "rows": [_pack(rows.astype(np.int64))],
            "cols": [_pack(cols.astype(np.int32))],
            "vals": [_pack(vals.astype(np.float32))],
            "y": [_pack(y)],
            "n": [len(y)],
        })

    return fn


def _grad_batch(batch: pa.Table, w: np.ndarray, b: np.ndarray):
    """Sum-of-gradients over one features block, straight from COO."""
    dim, n_cls = w.shape
    gw = np.zeros((dim, n_cls), dtype=np.float64)
    gb = np.zeros(n_cls, dtype=np.float64)
    loss = 0.0
    total = 0
    for rows_b, cols_b, vals_b, y_b, n in zip(
            batch.column("rows").to_pylist(),
            batch.column("cols").to_pylist(),
            batch.column("vals").to_pylist(),
            batch.column("y").to_pylist(),
            batch.column("n").to_pylist()):
        n = int(n)
        if n == 0:
            continue
        rows = np.frombuffer(rows_b, dtype=np.int64)
        cols = np.frombuffer(cols_b, dtype=np.int32).astype(np.int64)
        vals = np.frombuffer(vals_b, dtype=np.float32)
        y = np.frombuffer(y_b, dtype=np.int32).astype(np.int64)
        logits = np.tile(b, (n, 1)).astype(np.float32)
        if len(rows):
            np.add.at(logits, rows, vals[:, None] * w[cols])
        logits -= logits.max(axis=1, keepdims=True)
        p = np.exp(logits)
        p /= p.sum(axis=1, keepdims=True)
        loss += float(-np.log(
            np.clip(p[np.arange(n), y], 1e-12, None)).sum())
        p[np.arange(n), y] -= 1.0
        if len(rows):
            np.add.at(gw, cols, (vals[:, None] * p[rows]))
        gb += p.sum(axis=0)
        total += n
    return pa.table({
        "gw": [_pack(gw.astype(np.float32))],
        "gb": [_pack(gb.astype(np.float32))],
        "loss": [loss],
        "n": [total],
    })


def _grad_combine(batch: pa.Table) -> pa.Table:
    gw = None
    gb = None
    for gw_b, gb_b in zip(batch.column("gw").to_pylist(),
                          batch.column("gb").to_pylist()):
        gwa = np.frombuffer(gw_b, dtype=np.float32).astype(np.float64)
        gba = np.frombuffer(gb_b, dtype=np.float32).astype(np.float64)
        gw = gwa if gw is None else gw + gwa
        gb = gba if gb is None else gb + gba
    return pa.table({
        "gw": [_pack(gw.astype(np.float32))],
        "gb": [_pack(gb.astype(np.float32))],
        "loss": [float(pc.sum(batch.column("loss")).as_py() or 0.0)],
        "n": [int(pc.sum(batch.column("n")).as_py() or 0)],
    })


def fit_classifier_distributed(ds, text_col: str, label_col: str,
                               side_col: str | None = None,
                               ngram_range=(3, 5), nbits: int = 16,
                               word_ngram_range=None, word_nbits: int = 14,
                               epochs: int = 8, lr: float = 0.5,
                               l2: float = 1e-6,
                               batch_size: int = 1024,
                               combine_size: int = 64):
    """Distributed TF-IDF + softmax fit: NO driver-side row collect
    anywhere — df/idf, classes, features and per-epoch gradients are
    all map_batches stages with a tree-combine level; the driver only
    ever holds O(dim x classes). Returns the same broadcast bundle
    shape as :func:`fit_classifier_bundle`, so ``ClassifierPredict`` /
    ``classify_dataset`` consume it unchanged.

    Deterministic given fixed inputs up to float summation order
    (gradients are accumulated in float64 at the combine level);
    full-batch gradient descent (no minibatch RNG), so unlike
    ``SoftmaxSGD.fit`` there is no ``seed``."""
    channels = _default_channels(ngram_range, nbits, word_ngram_range,
                                 word_nbits, side_col is not None)
    dims = [1 << nb for (_s, _a, _ng, nb) in channels]

    # ---- pass 1: df + classes (one pass, tree-combined) --------------
    leaves = ds.map_batches(
        _df_partial_fn(channels, text_col, side_col, label_col),
        batch_format="pyarrow", batch_size=batch_size)
    combined = leaves.map_batches(
        _df_combine_fn(len(channels), dims),
        batch_format="pyarrow", batch_size=combine_size).take_all()
    if not combined:
        raise ValueError("fit_classifier_distributed: empty dataset")
    n_docs = sum(int(r["n"]) for r in combined)
    vec = MultiChannelTfidf(channels)
    for ci, hv in enumerate(vec.vecs):
        df = np.zeros(dims[ci], dtype=np.int64)
        for r in combined:
            ids = np.frombuffer(r[f"ids{ci}"], dtype=np.int64)
            np.add.at(df, ids, np.frombuffer(r[f"cnt{ci}"], np.int64))
        hv.idf = np.log((1.0 + n_docs) / (1.0 + df)) + 1.0
    classes = sorted({v for r in combined for v in r["labels"]})
    cls_idx = {c: i for i, c in enumerate(classes)}

    # ---- pass 2: features, materialized once for all epochs ----------
    vec_ref = ray.put(vec)
    feat = ds.map_batches(
        _featurize_fn(vec_ref, text_col, side_col, label_col, cls_idx),
        batch_format="pyarrow", batch_size=batch_size).materialize()

    # ---- epochs: synchronous full-batch GD ---------------------------
    model = SoftmaxSGD(vec.dim, len(classes), lr=lr, epochs=epochs,
                       l2=l2)
    for _ in range(epochs):
        wref = ray.put((model.w.copy(), model.b.copy()))

        def grad(batch: pa.Table) -> pa.Table:
            w, b = ray.get(wref)
            return _grad_batch(batch, w, b)

        parts = feat.map_batches(
            grad, batch_format="pyarrow", batch_size=None,
        ).map_batches(
            _grad_combine, batch_format="pyarrow",
            batch_size=combine_size,
        ).take_all()
        gw = np.zeros((vec.dim, len(classes)), dtype=np.float64)
        gb = np.zeros(len(classes), dtype=np.float64)
        n_total = 0
        for r in parts:
            gw += np.frombuffer(r["gw"], dtype=np.float32).reshape(
                vec.dim, len(classes))
            gb += np.frombuffer(r["gb"], dtype=np.float32)
            n_total += int(r["n"])
        model.w -= (lr * (gw / max(1, n_total)
                          + l2 * model.w)).astype(np.float32)
        model.b -= (lr * (gb / max(1, n_total))).astype(np.float32)

    return ray.put({"vectorizer": vec, "model": model,
                    "classes": classes})
