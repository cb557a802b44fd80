"""Learned matchers: hashed char-n-gram TF-IDF + brute cosine 1-NN and
a numpy logistic (SGD) classifier — the Ray-native reimplementation of
the reference's learned baselines (T1-T3 in SURVEY §2.3):

- TF-IDF char 3-5-gram vectorizer + brute cosine KNN
  (reference addresskit/matching/string_similarity.py:5-20,
  addresskit/match_baseline.py:22-36, scripts/baseline_submission.py:94-109)
- SGD logistic classifier train + predict
  (reference scripts/train_baseline.py:133-207)

No sklearn/scipy in this environment, so the vectorizer uses feature
hashing (dimension 2**nbits) with an idf fitted over the train corpus,
and the classifier is a softmax regression trained with minibatch SGD
in numpy. The Ray pattern is the important part: FIT on the driver
(train side is the small side), ``ray.put`` the model ONCE, then
map_batches with an actor pool whose __init__ does ray.get — the
broadcast-small-side lookup join, never re-shipped per batch.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

import ray


def _ngram_indices(text: str, lo: int, hi: int, nbits: int) -> np.ndarray:
    """Hashed char n-gram feature ids for n in [lo, hi]."""
    t = " ".join((text or "").lower().split())
    mask = (1 << nbits) - 1
    idx = []
    for n in range(lo, hi + 1):
        if len(t) < n:
            continue
        for i in range(len(t) - n + 1):
            h = hashlib.blake2b(t[i:i + n].encode("utf-8"),
                                digest_size=8).digest()
            idx.append(int.from_bytes(h, "big") & mask)
    return np.asarray(idx, dtype=np.int64)


class HashedTfidf:
    """Feature-hashing char-n-gram TF-IDF (dim 2**nbits).

    fit() computes document frequencies -> idf; transform() returns
    L2-normalized dense rows (dense is fine: dim defaults to 2^18 but
    transform emits (n, dim) float32 on demand per batch)."""

    def __init__(self, ngram_range: tuple[int, int] = (3, 5),
                 nbits: int = 18):
        self.lo, self.hi = ngram_range
        self.nbits = nbits
        self.dim = 1 << nbits
        self.idf: np.ndarray | None = None

    def fit(self, texts) -> "HashedTfidf":
        df = np.zeros(self.dim, dtype=np.int64)
        n = 0
        for t in texts:
            ids = np.unique(_ngram_indices(t, self.lo, self.hi, self.nbits))
            df[ids] += 1
            n += 1
        self.idf = np.log((1.0 + n) / (1.0 + df)) + 1.0
        return self

    def transform(self, texts) -> np.ndarray:
        assert self.idf is not None, "fit first"
        out = np.zeros((len(texts), self.dim), dtype=np.float32)
        for r, t in enumerate(texts):
            ids = _ngram_indices(t, self.lo, self.hi, self.nbits)
            if len(ids) == 0:
                continue
            uniq, counts = np.unique(ids, return_counts=True)
            row = counts * self.idf[uniq]
            norm = np.linalg.norm(row)
            if norm > 0:
                out[r, uniq] = row / norm
        return out


class KnnPredict:
    """Actor-pool stage: cosine 1-NN label assignment against a
    broadcast (vectorizer, train matrix, labels) bundle — the J7
    semi-join-like lookup. Bundle loaded ONCE per actor in __init__."""

    def __init__(self, bundle_ref, text_col: str, k: int = 1):
        bundle = ray.get(bundle_ref)
        self.vec: HashedTfidf = bundle["vectorizer"]
        self.train = bundle["matrix"]          # (n_train, dim) unit rows
        self.labels = bundle["labels"]
        self.text_col = text_col
        self.k = k

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column(self.text_col).to_pylist()
        q = self.vec.transform(texts)          # unit rows
        sims = q @ self.train.T                # (b, n_train)
        best = np.argmax(sims, axis=1)
        pred = [self.labels[i] for i in best]
        sim = sims[np.arange(len(texts)), best]
        batch = batch.append_column(
            "pred_label", pa.array(pred))
        return batch.append_column(
            "pred_sim", pa.array(sim.astype(np.float64)))


def fit_knn_bundle(train_texts, train_labels,
                   ngram_range=(3, 5), nbits: int = 18):
    """Driver-side fit -> ray.put object ref for the actor pool."""
    vec = HashedTfidf(ngram_range, nbits).fit(train_texts)
    mat = vec.transform(train_texts)
    return ray.put({"vectorizer": vec, "matrix": mat,
                    "labels": list(train_labels)})


def knn_label_dataset(ds, bundle_ref, text_col: str,
                      concurrency: int = 4, batch_size: int = 1024):
    """1-NN label assignment over a Dataset (reference
    baseline_submission.py:104-109 flow)."""
    return ds.map_batches(
        KnnPredict,
        fn_constructor_args=(bundle_ref, text_col),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
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


class ClassifierPredict:
    """Actor-pool inference stage for the trained classifier
    (T3 inference: map_batches(ScorerActor, concurrency=N))."""

    def __init__(self, bundle_ref, text_col: str):
        bundle = ray.get(bundle_ref)
        self.vec: HashedTfidf = bundle["vectorizer"]
        self.model: SoftmaxSGD = bundle["model"]
        self.classes = bundle["classes"]
        self.text_col = text_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column(self.text_col).to_pylist()
        x = self.vec.transform(texts)
        pred = self.model.predict(x)
        return batch.append_column(
            "pred_label", pa.array([self.classes[i] for i in pred]))


def fit_classifier_bundle(train_texts, train_labels,
                          ngram_range=(3, 5), nbits: int = 16,
                          **sgd_kwargs):
    """Driver-side TF-IDF fit + SGD train -> broadcast ref."""
    vec = HashedTfidf(ngram_range, nbits).fit(train_texts)
    x = vec.transform(train_texts)
    classes = sorted(set(train_labels))
    cls_idx = {c: i for i, c in enumerate(classes)}
    y = np.asarray([cls_idx[c] for c in train_labels])
    model = SoftmaxSGD(vec.dim, len(classes), **sgd_kwargs).fit(x, y)
    return ray.put({"vectorizer": vec, "model": model, "classes": classes})


def classify_dataset(ds, bundle_ref, text_col: str,
                     concurrency: int = 4, batch_size: int = 1024):
    return ds.map_batches(
        ClassifierPredict,
        fn_constructor_args=(bundle_ref, text_col),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=1,
    )
