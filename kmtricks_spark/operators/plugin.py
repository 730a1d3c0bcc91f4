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
# across samples is at least `min_total`. Doubles as the CLI factory
# (--plugin ...:min_total_plugin --plugin-config 3), so the config
# arrives as a string and is coerced.
def min_total_plugin(min_total):
    min_total = int(min_total)

    def fn(kgrams: np.ndarray, counts: list) -> np.ndarray:
        return np.array([sum(c) >= min_total for c in counts], dtype=bool)

    return fn


def load_plugin(spec: str, config: str | None = None):
    """CLI surface of the J7 hook (`--plugin`/`--plugin-config`,
    cli.cpp:358-377): the reference dlopens a .so and calls its
    configure hook; ours dynamically imports ``module:attr``. With a
    config string the attribute is a FACTORY ``attr(config) ->
    predicate`` (the plugin_config analogue of plugin.hpp:18-23);
    without one the attribute IS the batch predicate."""
    mod_name, _, attr = spec.partition(":")
    if not mod_name or not attr:
        raise ValueError(f"plugin spec must be 'module:callable', got {spec!r}")
    import importlib

    fn = getattr(importlib.import_module(mod_name), attr)
    if config is not None:
        fn = fn(config)
    if not callable(fn):
        raise TypeError(f"plugin {spec} did not resolve to a callable")
    # fail at LOAD time, not mid-job in an executor: the predicate must
    # accept (kgrams, counts). A factory passed without --plugin-config
    # (arity 1) is the classic misuse this catches.
    import inspect

    try:
        params = list(inspect.signature(fn).parameters.values())
    except (TypeError, ValueError):  # builtins/C callables: trust them
        return fn
    if any(p.kind == inspect.Parameter.VAR_POSITIONAL for p in params):
        return fn
    positional = [
        p for p in params
        if p.kind in (inspect.Parameter.POSITIONAL_ONLY,
                      inspect.Parameter.POSITIONAL_OR_KEYWORD)
    ]
    required = [p for p in positional if p.default is inspect.Parameter.empty]
    if len(required) > 2 or len(positional) < 2:
        raise TypeError(
            f"plugin {spec} resolved to a callable with signature "
            f"{inspect.signature(fn)} — the batch predicate takes "
            "(kgrams, counts). If this is a factory, pass its config "
            "via --plugin-config."
        )
    return fn
