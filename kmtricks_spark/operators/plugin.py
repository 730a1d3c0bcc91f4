"""Merge plugin hook (J7): a user veto/transform over merged rows.

The reference loads a `.so` exposing `process_kmer/process_hash(kmer,
counts[]) -> keep?` called on every merged row (plugin.hpp:12-31, call
sites merge.hpp:252-257,509-514). Our surface is a Python callable over
Arrow batches: `fn(kgram: np.ndarray[object], counts: 2D list column) ->
bool mask`, applied with mapInPandas so the user code runs vectorized,
not per-row.
"""

from __future__ import annotations

from typing import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame


def apply_plugin(
    matrix: DataFrame,
    fn: Callable[[np.ndarray, list], np.ndarray],
) -> DataFrame:
    """Filter a (part_id, kgram, counts) matrix by a batch-vectorized
    user predicate. `fn(kgrams, counts_lists)` returns a boolean mask."""
    schema = matrix.schema

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                yield pdf
                continue
            mask = np.asarray(fn(pdf["kgram"].to_numpy(), list(pdf["counts"])), dtype=bool)
            yield pdf[mask]

    return matrix.mapInPandas(gen, schema=schema)


# Example plugin mirroring plugins/example/: keep rows whose total count
# across samples is at least `min_total`.
def min_total_plugin(min_total: int):
    def fn(kgrams: np.ndarray, counts: list) -> np.ndarray:
        return np.array([sum(c) >= min_total for c in counts], dtype=bool)

    return fn
