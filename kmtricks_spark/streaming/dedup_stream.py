"""Stateful streaming dedup: drop documents whose exact fingerprint was
already seen in ANY earlier micro-batch.

Custom stateful operator via applyInPandasWithState (the Structured
Streaming escape hatch for semantics the built-in operators can't
express): state is keyed by the 128-bit text fingerprint; the first
arrival is emitted, later arrivals are suppressed. At web scale the key
space is uniform (hashes), so state shards evenly across the cluster.
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import LongType, StringType, StructField, StructType

OUT_SCHEMA = StructType(
    [
        StructField("fingerprint", StringType()),
        StructField("doc_id", LongType()),
    ]
)
STATE_SCHEMA = StructType([StructField("seen", LongType())])


def dedup_stream(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Streaming DataFrame -> first-arrival rows (fingerprint, doc_id)."""

    def dedup_fn(
        key: Tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        first = None
        for pdf in pdfs:
            if len(pdf) and first is None:
                first = int(pdf["doc_id"].min())
        if state.exists:
            return iter(())
        state.update((1,))
        if first is None:
            return iter(())
        return iter([pd.DataFrame({"fingerprint": [key[0]], "doc_id": [first]})])

    keyed = docs.select(
        F.md5(F.col(text_col)).alias("fingerprint"), F.col(id_col).alias("doc_id")
    )
    return keyed.groupBy("fingerprint").applyInPandasWithState(
        dedup_fn,
        outputStructType=OUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
