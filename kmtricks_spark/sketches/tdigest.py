"""Merging t-digest (Dunning & Ertl 2019), k1 scale function, vectorized.

Centroids are (mean, weight) sorted by mean; re-clustering assigns each
point/centroid to bucket floor(k1(q_mid)) where
k1(q) = delta/(2*pi) * asin(2q - 1), then aggregates buckets with one
np.add.at pass — no sequential Python loop over points. Bound: rank error
O(1/delta), tightest at the tails (the k1 scale concentrates clusters
there). Merge = concat + re-cluster (associative up to the published
error bound; tests verify bounds under shuffle-order randomization).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

MAGIC = b"TDG1"


@dataclass
class TDigest:
    delta: float = 200.0
    means: np.ndarray = field(default_factory=lambda: np.empty(0, dtype=np.float64))
    weights: np.ndarray = field(default_factory=lambda: np.empty(0, dtype=np.float64))
    n: float = 0.0


def create(delta: float = 200.0) -> TDigest:
    return TDigest(delta=delta)


def _recluster(means: np.ndarray, weights: np.ndarray, delta: float):
    if means.size == 0:
        return means, weights
    o = np.argsort(means, kind="stable")
    m, w = means[o], weights[o]
    W = w.sum()
    cum = np.cumsum(w)
    q_mid = (cum - w / 2) / W
    # k1 scale; clip away exact 0/1 to keep asin finite
    qc = np.clip(q_mid, 1e-12, 1 - 1e-12)
    kidx = np.floor(delta / (2 * np.pi) * (np.arcsin(2 * qc - 1) + np.pi / 2)).astype(np.int64)
    # bucket-aggregate
    uniq, inv = np.unique(kidx, return_inverse=True)
    new_w = np.zeros(uniq.size, dtype=np.float64)
    new_mw = np.zeros(uniq.size, dtype=np.float64)
    np.add.at(new_w, inv, w)
    np.add.at(new_mw, inv, w * m)
    return new_mw / new_w, new_w


def add_values(state: TDigest, values: np.ndarray) -> TDigest:
    v = np.asarray(values, dtype=np.float64)
    v = v[~np.isnan(v)]
    if v.size == 0:
        return state
    means = np.concatenate([state.means, v])
    weights = np.concatenate([state.weights, np.ones(v.size)])
    state.means, state.weights = _recluster(means, weights, state.delta)
    state.n += float(v.size)
    return state


def merge(a: TDigest, b: TDigest) -> TDigest:
    if a.delta != b.delta:
        raise ValueError("t-digest delta mismatch")
    means = np.concatenate([a.means, b.means])
    weights = np.concatenate([a.weights, b.weights])
    m, w = _recluster(means, weights, a.delta)
    return TDigest(delta=a.delta, means=m, weights=w, n=a.n + b.n)


def quantile(state: TDigest, q: float) -> float:
    if state.means.size == 0:
        return float("nan")
    m, w = state.means, state.weights
    cum = np.cumsum(w) - w / 2
    target = q * w.sum()
    return float(np.interp(target, cum, m))


def rank(state: TDigest, x: float) -> float:
    if state.means.size == 0:
        return float("nan")
    m, w = state.means, state.weights
    cum = np.cumsum(w) - w / 2
    return float(np.interp(x, m, cum / w.sum(), left=0.0, right=1.0))


def serialize(state: TDigest) -> bytes:
    hdr = np.array([state.delta, state.n, state.means.size], dtype=np.float64).tobytes()
    return MAGIC + hdr + state.means.tobytes() + state.weights.tobytes()


def deserialize(buf: bytes) -> TDigest:
    assert buf[:4] == MAGIC, "bad t-digest payload"
    delta, n, sz = np.frombuffer(buf[4:28], dtype=np.float64)
    sz = int(sz)
    means = np.frombuffer(buf[28 : 28 + 8 * sz], dtype=np.float64).copy()
    weights = np.frombuffer(buf[28 + 8 * sz : 28 + 16 * sz], dtype=np.float64).copy()
    return TDigest(delta=float(delta), means=means, weights=weights, n=float(n))
