"""HyperLogLog (dense, 2^p uint8 registers) over 64-bit hashes.

Published bound: relative standard error ~= 1.04 / sqrt(2^p)
(Flajolet et al. 2007); p=14 -> ~0.81%. Replaces the reference's
Bloom-based cardinality backsolve (utils.hpp:245-248).
Merge = elementwise register max (associative, commutative, idempotent).
"""

from __future__ import annotations

import numpy as np

MAGIC = b"HLL1"


def create(p: int = 14) -> np.ndarray:
    if not 4 <= p <= 18:
        raise ValueError("p must be in [4,18]")
    return np.zeros(1 << p, dtype=np.uint8)


def _p_of(state: np.ndarray) -> int:
    return int(state.size).bit_length() - 1


def _bit_length_u64(x: np.ndarray) -> np.ndarray:
    """Exact vectorized bit_length for uint64 (no float round-off)."""
    bl = np.zeros(x.shape, dtype=np.uint8)
    t = x.copy()
    for s in (32, 16, 8, 4, 2, 1):
        m = t >= (np.uint64(1) << np.uint64(s))
        bl[m] += np.uint8(s)
        t[m] >>= np.uint64(s)
    bl[t > 0] += np.uint8(1)
    return bl


def add_hashes(state: np.ndarray, hashes: np.ndarray) -> np.ndarray:
    if hashes.size == 0:
        return state
    p = _p_of(state)
    h = hashes.astype(np.uint64, copy=False)
    idx = (h >> np.uint64(64 - p)).astype(np.int64)
    rest = h << np.uint64(p)  # top 64-p bits of the suffix
    # rank = leading zeros of suffix + 1 = (64 - bit_length(rest)) + 1
    rank = (np.uint8(64) - _bit_length_u64(rest)) + np.uint8(1)
    np.maximum.at(state, idx, rank)
    return state


def merge(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    if a.size != b.size:
        raise ValueError("HLL size mismatch")
    return np.maximum(a, b)


def estimate(state: np.ndarray) -> float:
    m = float(state.size)
    if state.size >= 128:
        alpha = 0.7213 / (1 + 1.079 / m)
    else:
        alpha = {16: 0.673, 32: 0.697, 64: 0.709}.get(state.size, 0.7213 / (1 + 1.079 / m))
    inv = np.ldexp(1.0, -state.astype(np.int64))
    raw = alpha * m * m / inv.sum()
    zeros = int((state == 0).sum())
    if raw <= 2.5 * m and zeros:
        return m * np.log(m / zeros)  # linear counting, small range
    return float(raw)


MAGIC_SPARSE = b"HLLS"


def serialize(state: np.ndarray) -> bytes:
    """Dense or sparse payload, whichever is smaller.

    Sparse = (int32 idx, uint8 rank) pairs for non-zero registers — at
    low fill (many groups, few items each: the per-URL/per-partition
    sketch regime) this cuts shuffled payload bytes by up to 3000x while
    in-memory ops stay dense."""
    nz = np.flatnonzero(state)
    sparse_bytes = 5 * nz.size
    if sparse_bytes < state.size:
        return (
            MAGIC_SPARSE
            + bytes([_p_of(state)])
            + nz.astype(np.int32).tobytes()
            + state[nz].tobytes()
        )
    return MAGIC + bytes([_p_of(state)]) + state.tobytes()


def deserialize(buf: bytes) -> np.ndarray:
    magic, p = buf[:4], buf[4]
    if magic == MAGIC:
        return np.frombuffer(buf[5:], dtype=np.uint8, count=1 << p).copy()
    assert magic == MAGIC_SPARSE, "bad HLL payload"
    n = (len(buf) - 5) // 5
    idx = np.frombuffer(buf[5 : 5 + 4 * n], dtype=np.int32)
    ranks = np.frombuffer(buf[5 + 4 * n :], dtype=np.uint8, count=n)
    state = np.zeros(1 << p, dtype=np.uint8)
    state[idx] = ranks
    return state
