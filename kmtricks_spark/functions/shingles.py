"""K-gram (byte-shingle) extraction from a text column.

Semantic twin of the reference's k-mer enumeration + super-k-mer fill
(gatb/fill_partitions.hpp:59-105, gatb/sorting_count.hpp:438-464), minus
DNA-specific canonicalization (kmer.hpp:531-535) — a text shingle is its
own canonical form.

Two physical paths, same logical result:

* ``kgrams_sql``  — pure Column expressions (explode(sequence) +
  substring). Stays inside whole-stage codegen; character-based, which
  equals byte-based on ASCII corpora. This is also the shape the DuckDB
  oracle uses.
* ``kgram_partials_arrow`` — ``mapInPandas`` over Arrow batches doing
  numpy sliding windows over the raw UTF-8 **bytes** (byte-identical
  extraction per url, per BASELINE input_hint), and emitting
  **pre-counted** ``(sample_id, part_id, kgram, pcount)`` rows. The
  pre-count inside the map task is the Spark analogue of super-k-mer
  shuffle compression: shuffle volume scales with per-batch *distinct*
  shingles, not total.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from kmtricks_spark.config import KmConfig
from kmtricks_spark.functions.hashing import hash64_np


def kgrams_sql(df: DataFrame, cfg: KmConfig, bytes_mode: bool = False) -> DataFrame:
    """One row per shingle: (sample_id, kgram). JVM-only path.

    bytes_mode=True slides over the UTF-8 *bytes* (substring on a binary
    column — still whole-stage codegen), giving byte-identical extraction
    on arbitrary unicode; the default char mode equals byte mode on ASCII
    and matches ANSI-SQL oracles.
    """
    k, text, sample = cfg.k, cfg.text_col, cfg.sample_col
    if bytes_mode:
        n = F.octet_length(F.col(text)) - (k - 1)
        return (
            df.where(n >= 1)
            .select(
                F.col(sample).alias("sample_id"),
                F.col(text).cast("binary").alias("__tb"),
                F.explode(F.sequence(F.lit(1), n)).alias("pos"),
            )
            .select(
                "sample_id",
                F.expr(f"substring(__tb, pos, {k})").alias("kgram"),
            )
        )
    # char mode. Per-shingle `substring(text, pos, k)` on a string is
    # O(pos): UTF8String counts characters from the start of the string
    # to find the slice, so a document of n chars costs O(n^2) to
    # shingle. On ASCII documents (char == byte) the identical result
    # comes from an O(1) byte slice + UTF-8 decode, so compute a per-doc
    # ASCII flag (length == octet_length <=> every char is one byte) and
    # the binary form ONCE before the explode, carry both through the
    # Generate, and slice bytes on the ASCII branch; non-ASCII documents
    # keep the exact char-substring semantics. Measured 2.8x on the
    # shingle scan, 1.7x on the full count (sf0.1 rep24, 32 cores).
    n = F.length(F.col(text)) - (k - 1)
    kg = F.when(
        F.col("__ascii"), F.decode(F.expr(f"substring(__tb, pos, {k})"), "UTF-8")
    ).otherwise(F.expr(f"substring({text}, pos, {k})"))
    return (
        df.where(n >= 1)
        .select(
            F.col(sample).alias("sample_id"),
            F.col(text),
            F.col(text).cast("binary").alias("__tb"),
            (F.length(F.col(text)) == F.octet_length(F.col(text))).alias("__ascii"),
            F.explode(F.sequence(F.lit(1), n)).alias("pos"),
        )
        .select("sample_id", kg.alias("kgram"))
    )


def _shingle_schema(cfg: KmConfig) -> StructType:
    kgram_t = StringType() if cfg.kgram_as_string else BinaryType()
    return StructType(
        [
            StructField("sample_id", StringType()),
            StructField("part_id", IntegerType()),
            StructField("kgram", kgram_t),
            StructField("pcount", LongType()),
        ]
    )


def _windows_of(buf: np.ndarray, ends: np.ndarray, k: int) -> np.ndarray:
    """All valid k-byte windows of concatenated docs (boundary-masked)."""
    if buf.size < k:
        return np.empty((0, k), dtype=np.uint8)
    win = np.lib.stride_tricks.sliding_window_view(buf, k)
    starts = np.arange(win.shape[0], dtype=np.int64)
    doc_of = np.searchsorted(ends, starts, side="right")
    valid = starts + k <= ends[doc_of]
    return win[valid]


def _unique_counts(windows: np.ndarray, k: int):
    """(uniq (u,k) uint8, counts int64) via memcmp-ordered void sort."""
    if windows.shape[0] == 0:
        return np.empty((0, k), dtype=np.uint8), np.empty(0, dtype=np.int64)
    contig = np.ascontiguousarray(windows)
    if k == 8:
        key = contig.view(np.uint64).ravel()
        uq, counts = np.unique(key, return_counts=True)
        uniq = uq.view(np.uint8).reshape(-1, 8)
    else:
        key = contig.view([("v", np.void, k)])["v"].ravel()
        uq, counts = np.unique(key, return_counts=True)
        uniq = uq.view(np.uint8).reshape(-1, k)
    return uniq, counts.astype(np.int64)


def minimizer_part_np(uniq: np.ndarray, m: int, nb_partitions: int) -> np.ndarray:
    """part_id per unique k-gram = (min hash over its m-gram windows) % P.

    Reference: Kmer::minimizer (kmer.hpp:591-629) + static repartition
    XXH64(minim) % P (repartition.hpp:45-56). Vectorized: one hash pass
    per m-offset, running minimum across offsets.
    """
    n, k = uniq.shape
    if n == 0:
        return np.empty(0, dtype=np.int32)
    best = None
    for off in range(k - m + 1):
        h = hash64_np(uniq[:, off : off + m])
        best = h if best is None else np.minimum(best, h)
    return (best % np.uint64(nb_partitions)).astype(np.int32)


def kgram_partials_arrow(df: DataFrame, cfg: KmConfig) -> DataFrame:
    """Pre-counted shingle partials: (sample_id, part_id, kgram, pcount).

    ``sum(pcount) group by (sample_id, kgram)`` equals the exact shingle
    count — the partial is purely a shuffle-volume optimization
    (super-k-mer analogue, superk.hpp:8-134).
    """
    k, m, P = cfg.k, cfg.m, cfg.nb_partitions
    text_col, sample_col, as_str = cfg.text_col, cfg.sample_col, cfg.kgram_as_string
    schema = _shingle_schema(cfg)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_s, out_p, out_g, out_c = [], [], [], []
            for sample, grp in pdf.groupby(sample_col, sort=False):
                texts = [t.encode("utf-8") for t in grp[text_col] if t]
                if not texts:
                    continue
                buf = np.frombuffer(b"".join(texts), dtype=np.uint8)
                ends = np.cumsum(np.array([len(t) for t in texts], dtype=np.int64))
                uniq, counts = _unique_counts(_windows_of(buf, ends, k), k)
                if uniq.shape[0] == 0:
                    continue
                parts = minimizer_part_np(uniq, m, P)
                raw = uniq.tobytes()
                grams = [raw[i * k : (i + 1) * k] for i in range(uniq.shape[0])]
                if as_str:
                    grams = [g.decode("utf-8", errors="surrogateescape") for g in grams]
                out_s.append(np.full(len(grams), sample, dtype=object))
                out_p.append(parts)
                out_g.append(np.asarray(grams, dtype=object))
                out_c.append(counts)
            if not out_s:
                yield pd.DataFrame(
                    {"sample_id": [], "part_id": [], "kgram": [], "pcount": []}
                ).astype({"part_id": "int32", "pcount": "int64"})
                continue
            yield pd.DataFrame(
                {
                    "sample_id": np.concatenate(out_s),
                    "part_id": np.concatenate(out_p),
                    "kgram": np.concatenate(out_g),
                    "pcount": np.concatenate(out_c),
                }
            )

    cols = [sample_col, text_col]
    return df.select(*cols).mapInPandas(gen, schema=schema)
