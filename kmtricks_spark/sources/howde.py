"""HowDe-style Bloom filter container sink (S7).

The reference writes one standalone Bloom-filter file per sample by
concatenating that sample's per-partition hash windows behind a
`bffileheader` (howde_utils.hpp:56-122: magic, version, k, num bits,
single BF component). We reproduce the *shape* — a fixed little-endian
header followed by the raw bit vector — without depending on howdesbt:
the point under test is that per-partition windows concatenate into one
queryable filter (hash.hpp:34-80 arithmetic), which tests verify by
probing through the file-level artifact.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass

import numpy as np

MAGIC = b"KMBF0001"
VERSION = 1


@dataclass(frozen=True)
class BFHeader:
    k: int
    num_bits: int
    nb_partitions: int
    window_bits: int
    n_set: int


def write_bf_file(path: str, header: BFHeader, filter_bytes: bytes) -> None:
    assert len(filter_bytes) * 8 == header.num_bits, "filter/num_bits mismatch"
    with open(path, "wb") as f:
        f.write(MAGIC)
        f.write(
            struct.pack(
                "<IQQQQ",
                VERSION,
                header.k,
                header.num_bits,
                (header.nb_partitions << 32) | header.window_bits // 64,
                header.n_set,
            )
        )
        f.write(filter_bytes)


def read_bf_file(path: str) -> tuple[BFHeader, np.ndarray]:
    with open(path, "rb") as f:
        magic = f.read(8)
        assert magic == MAGIC, f"bad magic {magic!r}"
        version, k, num_bits, packed, n_set = struct.unpack("<IQQQQ", f.read(36))
        assert version == VERSION
        nb_partitions = packed >> 32
        window_bits = (packed & 0xFFFFFFFF) * 64
        bits = np.frombuffer(f.read(num_bits // 8), dtype=np.uint8)
    return BFHeader(k, num_bits, nb_partitions, window_bits, n_set), bits
