"""HowDe-style Bloom filter container sink (S7).

The reference writes one standalone Bloom-filter file per sample by
concatenating that sample's per-partition hash windows behind a
`bffileheader` (howde_utils.hpp:56-122: magic, version, k, num bits,
single BF component). Two container formats:

* KMBF (default): a compact self-defined little-endian header followed
  by the raw bit vector — the engine's own artifact.
* howdesbt: mirrors the reference's bffileheader write protocol
  (howde_utils.hpp:56-122) field-for-field: a two-phase write (zeroed
  header region stamped with the UNFINISHED magic + prefix first, data,
  then the finished header rewritten at offset 0 — the crash-consistency
  trick), single uncompressed vector, numBytes = bits/8 + 8 for the
  leading 8-byte size word the reference emits before the windows
  (howde_utils.hpp:148). Field order and sizes follow the assignments
  in the reference verbatim; howdesbt's numeric magic/kind constants are
  not vendored in the reference repo, so they are module-level
  parameters (defaults below) — override them for bit-exact interop
  with an external howdesbt build.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass

import numpy as np

MAGIC = b"KMBF0001"
MAGIC_UN = b"KMBF!UNF"  # placeholder magic while a (streaming) write is in flight
VERSION = 1

# --- howdesbt bffileheader parameters (howde_utils.hpp:56-86) ---------
# layout: magic u64 | headerSize u32 | version u32 | bfKind u32 |
# smerSize u32 | numHashes u32 | pad4 | hashSeed1 u64 | hashSeed2 u64 |
# hashModulus u64 | numBits u64 | numVectors u32 | setSizeKnown u32 |
# setSize u64 | info[0]{compressor u32, name u32, offset u64,
# numBytes u64, filterInfo u64}  => 112 bytes, already 16-aligned
_HOWDE_FMT = "<QIIIII4xQQQQIIQIIQQQ"
_HOWDE_PREFIX_FMT = "<QII"  # bffileprefix: magic, headerSize, version
HOWDE_HEADER_SIZE = struct.calcsize(_HOWDE_FMT)  # round_up_16(112) == 112
HOWDE_MAGIC = int.from_bytes(b"HOWDESBF", "little")      # parameterized:
HOWDE_MAGIC_UN = int.from_bytes(b"HOWDESUN", "little")   # see module doc
HOWDE_VERSION = 2
HOWDE_BFKIND_SIMPLE = 1
HOWDE_BVCOMP_UNCOMPRESSED = 0


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


def _howde_header_bytes(k: int, num_bits: int, magic: int | None = None) -> bytes:
    """The finished bffileheader for one uncompressed vector, mirroring
    howde_utils.hpp:64-82 assignment-for-assignment."""
    return struct.pack(
        _HOWDE_FMT,
        HOWDE_MAGIC if magic is None else magic,  # header->magic
        HOWDE_HEADER_SIZE,           # header->headerSize = round_up_16(...)
        HOWDE_VERSION,               # header->version
        HOWDE_BFKIND_SIMPLE,         # header->bfKind
        k,                           # header->smerSize
        1,                           # header->numHashes
        0,                           # header->hashSeed1
        0,                           # header->hashSeed2
        num_bits,                    # header->hashModulus = bloom size
        num_bits,                    # header->numBits
        1,                           # header->numVectors
        0,                           # header->setSizeKnown = false
        0,                           # header->setSize
        HOWDE_BVCOMP_UNCOMPRESSED,   # info[0].compressor
        0,                           # info[0].name
        HOWDE_HEADER_SIZE,           # info[0].offset = bytes written so far
        num_bits // 8 + 8,           # info[0].numBytes (+8: size word)
        0,                           # info[0].filterInfo
    )


def write_bf_file_howdesbt(
    path: str,
    header: BFHeader,
    filter_bytes: bytes,
    magic: int | None = None,
    magic_un: int | None = None,
) -> None:
    """Two-phase write, as the reference does it (howde_utils.hpp:56-86 +
    data at :148-150): (1) zeroed header region carrying only the
    UNFINISHED prefix, (2) the 8-byte bloom-size word + concatenated
    windows, (3) seek(0) and the finished header. A writer killed mid-way
    leaves the UNFINISHED magic, which read_bf_file_howdesbt refuses.

    ``magic``/``magic_un`` override the module defaults for bit-exact
    interop with an external howdesbt build: set them to the constants
    in that build's bloom_filter_file.h (they are not vendored in the
    reference repo, so no default can honestly claim upstream parity —
    the knob test pins that a parameterized write round-trips through a
    reader configured the same way)."""
    assert len(filter_bytes) * 8 == header.num_bits, "filter/num_bits mismatch"
    with open(path, "wb") as f:
        unfinished = bytearray(HOWDE_HEADER_SIZE)
        prefix_size = struct.calcsize(_HOWDE_PREFIX_FMT)
        unfinished[:prefix_size] = struct.pack(
            _HOWDE_PREFIX_FMT,
            HOWDE_MAGIC_UN if magic_un is None else magic_un,
            prefix_size,
            0,
        )
        f.write(bytes(unfinished))
        f.write(struct.pack("<Q", header.num_bits))  # sdsl-style size word
        f.write(filter_bytes)
        f.seek(0)
        f.write(_howde_header_bytes(header.k, header.num_bits, magic=magic))


def read_bf_file_howdesbt(
    path: str, magic: int | None = None, magic_un: int | None = None
) -> tuple[BFHeader, np.ndarray]:
    """Raises ValueError (never bare AssertionError, which `python -O`
    strips) on unfinished, truncated, foreign, or inconsistent files.
    ``magic``/``magic_un`` mirror write_bf_file_howdesbt's knobs."""
    want = HOWDE_MAGIC if magic is None else magic
    want_un = HOWDE_MAGIC_UN if magic_un is None else magic_un
    with open(path, "rb") as f:
        raw = f.read(HOWDE_HEADER_SIZE)
        if len(raw) < HOWDE_HEADER_SIZE:
            raise ValueError(
                f"{path}: truncated howdesbt BF ({len(raw)} < {HOWDE_HEADER_SIZE} header bytes)"
            )
        fields = struct.unpack(_HOWDE_FMT, raw)
        got_magic = fields[0]
        if got_magic == want_un:
            raise ValueError(f"{path}: unfinished howdesbt BF (writer died mid-write)")
        if got_magic != want:
            raise ValueError(f"{path}: bad howdesbt magic {got_magic:#x}")
        k, num_bits, num_bytes = fields[4], fields[9], fields[16]
        if num_bytes != num_bits // 8 + 8:
            raise ValueError(
                f"{path}: inconsistent header (numBytes {num_bytes} != bits/8+8)"
            )
        word = f.read(8)
        if len(word) < 8:
            raise ValueError(f"{path}: truncated before the size word")
        (size_word,) = struct.unpack("<Q", word)
        if size_word != num_bits:
            raise ValueError(f"{path}: size word {size_word} != numBits {num_bits}")
        data = f.read(num_bits // 8)
        if len(data) < num_bits // 8:
            raise ValueError(f"{path}: truncated bit vector ({len(data)} bytes)")
        bits = np.frombuffer(data, dtype=np.uint8)
    # partition layout is not part of the howdesbt header (the file is one
    # flat vector); nb_partitions/window_bits come back zeroed
    return BFHeader(k, num_bits, 0, 0, -1), bits


def read_bf_file(path: str) -> tuple[BFHeader, np.ndarray]:
    """Raises ValueError (not bare asserts, which `python -O` strips) on
    unfinished, truncated, or foreign files."""
    with open(path, "rb") as f:
        magic = f.read(8)
        if magic == MAGIC_UN:
            raise ValueError(f"{path}: unfinished KMBF file (writer died mid-write)")
        if magic != MAGIC:
            raise ValueError(f"{path}: bad magic {magic!r}")
        hdr = f.read(36)
        if len(hdr) < 36:
            raise ValueError(f"{path}: truncated KMBF header")
        version, k, num_bits, packed, n_set = struct.unpack("<IQQQQ", hdr)
        if version != VERSION:
            raise ValueError(f"{path}: unsupported KMBF version {version}")
        nb_partitions = packed >> 32
        window_bits = (packed & 0xFFFFFFFF) * 64
        data = f.read(num_bits // 8)
        if len(data) < num_bits // 8:
            raise ValueError(f"{path}: truncated bit vector ({len(data)} bytes)")
        bits = np.frombuffer(data, dtype=np.uint8)
    return BFHeader(k, num_bits, nb_partitions, window_bits, n_set), bits


def export_filters_from_slices(
    slices_df, out_dir: str, cfg, bf_format: str = "kmbf"
) -> list[str]:
    """Stream per-sample BF files DIRECTLY from the slices table,
    without ever materializing a whole filter as one byte-array value:
    slices arrive ordered by (sample_id, part_id) via toLocalIterator
    (Spark sorts; the driver holds ONE window at a time) and each file
    is written window-by-window with zero-fill for absent partitions —
    the same ordered-concat the reference does with file descriptors
    (howde_utils.hpp:148-180). This is the artifact path that survives
    bloom_bits where a concatenated filter column would exceed the JVM's
    2 GB single-value limit (e.g. 2^34 bits = 2 GiB per sample)."""
    import os

    if bf_format not in ("kmbf", "howdesbt"):
        raise ValueError(f"bf_format must be kmbf|howdesbt, got {bf_format!r}")
    os.makedirs(out_dir, exist_ok=True)
    ext = "kmbf" if bf_format == "kmbf" else "bf"
    P, wb = cfg.nb_partitions, cfg.window_bytes
    num_bits = cfg.window_bits * P
    zero = bytes(wb)
    paths: list[str] = []
    cur = None  # (sample_id, file handle, next part to write, n_set)

    def open_file(sample):
        p = os.path.join(out_dir, f"{sample}.{ext}")
        f = open(p, "wb")
        # placeholder header stamped with the UNFINISHED magic in BOTH
        # formats (two-phase protocol): the streaming write window spans
        # many executor fetches, and a mid-stream crash must leave a
        # file every reader REFUSES — a valid-looking magic with a
        # truncated vector would be consumed silently
        if bf_format == "kmbf":
            f.write(MAGIC_UN + struct.pack("<IQQQQ", VERSION, cfg.k, num_bits,
                                           (P << 32) | cfg.window_bits // 64, 0))
        else:
            un = bytearray(HOWDE_HEADER_SIZE)
            ps = struct.calcsize(_HOWDE_PREFIX_FMT)
            un[:ps] = struct.pack(_HOWDE_PREFIX_FMT, HOWDE_MAGIC_UN, ps, 0)
            f.write(bytes(un))
            f.write(struct.pack("<Q", num_bits))
        return p, f

    def close_file():
        sample, f, next_part, n_set = cur
        for _ in range(next_part, P):  # trailing zero windows
            f.write(zero)
        f.seek(0)
        if bf_format == "kmbf":
            f.write(MAGIC + struct.pack("<IQQQQ", VERSION, cfg.k, num_bits,
                                        (P << 32) | cfg.window_bits // 64, n_set))
        else:
            f.write(_howde_header_bytes(cfg.k, num_bits))
        f.close()

    it = slices_df.select("sample_id", "part_id", "n_set", "bitmap").orderBy(
        "sample_id", "part_id"
    ).toLocalIterator()
    try:
        for row in it:
            if cur is None or row["sample_id"] != cur[0]:
                if cur is not None:
                    close_file()
                    cur = None
                p, f = open_file(row["sample_id"])
                paths.append(p)
                cur = (row["sample_id"], f, 0, 0)
            sample, f, next_part, n_set = cur
            for _ in range(next_part, row["part_id"]):  # gap zero windows
                f.write(zero)
            f.write(bytes(row["bitmap"]))
            cur = (sample, f, row["part_id"] + 1, n_set + int(row["n_set"]))
        if cur is not None:
            close_file()
            cur = None
    finally:
        if cur is not None:  # crashed mid-file: close the handle, leave
            cur[1].close()   # the UNFINISHED magic for readers to refuse
    return paths


def export_filters(filters_df, out_dir: str, cfg, bf_format: str = "kmbf") -> list[str]:
    """One standalone BF file per sample from the bloom_filters table
    (sample_id, total_set, filter) — the reference's per-sample filter
    files (howde_utils.hpp build()). Streams rows via toLocalIterator so
    only one sample's filter is in driver memory at a time; files are the
    per-sample artifact, inherently a driver/file operation (same as the
    reference's per-file concat)."""
    import os

    if bf_format not in ("kmbf", "howdesbt"):
        raise ValueError(f"bf_format must be kmbf|howdesbt, got {bf_format!r}")
    os.makedirs(out_dir, exist_ok=True)
    writer = write_bf_file if bf_format == "kmbf" else write_bf_file_howdesbt
    ext = "kmbf" if bf_format == "kmbf" else "bf"
    paths = []
    for row in filters_df.select("sample_id", "total_set", "filter").toLocalIterator():
        blob = bytes(row["filter"])
        hdr = BFHeader(
            k=cfg.k,
            num_bits=len(blob) * 8,
            nb_partitions=cfg.nb_partitions,
            window_bits=cfg.window_bits,
            n_set=int(row["total_set"]),
        )
        p = os.path.join(out_dir, f"{row['sample_id']}.{ext}")
        writer(p, hdr, blob)
        paths.append(p)
    return paths
