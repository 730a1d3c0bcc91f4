"""Structured Streaming variants of the counting pipeline.

The reference is strictly batch (SURVEY §2.6); streaming is a
north-rule-era addition for continuously-arriving page crawls. The same
logical plan (shingle -> count) runs over readStream sources; sketch
partials are naturally mergeable across micro-batches, and the windowed
event aggregation shows watermarked late-data handling.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from kmtricks_spark.config import KmConfig
from kmtricks_spark.functions.shingles import kgrams_sql

DOCS_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("text", StringType()),
        StructField("lang", StringType()),
        StructField("source", StringType()),
        StructField("n_chars", LongType()),
    ]
)

EVENTS_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("ts", TimestampType()),
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
        StructField("props", StringType()),
    ]
)


def stream_docs(spark: SparkSession, path: str, max_files: int = 4) -> DataFrame:
    return (
        spark.readStream.schema(DOCS_SCHEMA)
        .option("maxFilesPerTrigger", max_files)
        .parquet(path)
    )


def streaming_counts(docs: DataFrame, cfg: KmConfig) -> DataFrame:
    """Continuous shingle counting (update-mode aggregate state)."""
    shingles = kgrams_sql(docs, cfg)
    return shingles.groupBy("sample_id", "kgram").agg(F.count(F.lit(1)).alias("count"))


def windowed_event_counts(
    events: DataFrame, window: str = "1 hour", watermark: str = "2 hours"
) -> DataFrame:
    """Watermarked tumbling-window counts over an event-time stream."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("win"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("win.start").alias("win_start"), "event_type", "n")
    )


def streaming_hll(
    docs: DataFrame, cfg: KmConfig, state: dict, ckpt_dir: str = "/tmp/kms_hll_ckpt"
) -> "object":
    """Continuous distinct-shingle cardinality per sample: each micro-batch
    produces per-sample HLL payloads (partial -> merge inside the batch),
    foreachBatch merges them into `state` {sample_id: hll registers}.

    The sketch's associative merge is exactly what makes it
    streaming-safe: batch boundaries don't change the result.
    """
    from kmtricks_spark.sketches import hll
    from kmtricks_spark.sketches.spark import sketch_agg

    def on_batch(batch_df, batch_id):
        shingles = kgrams_sql(batch_df, cfg)
        hashed = shingles.select("sample_id", F.xxhash64("kgram").alias("h"))
        rows = sketch_agg(hashed, ["sample_id"], "h", "hll", p=12).collect()
        for r in rows:
            st = hll.deserialize(bytes(r["payload"]))
            prev = state.get(r["sample_id"])
            state[r["sample_id"]] = st if prev is None else hll.merge(prev, st)

    q = (
        docs.writeStream.foreachBatch(on_batch)
        .trigger(availableNow=True)
        .option("checkpointLocation", ckpt_dir)
        .start()
    )
    q.awaitTermination()
    return q


def stateful_streaming_hll(docs: DataFrame, cfg: KmConfig, p: int = 12) -> DataFrame:
    """Distinct-shingle cardinality per sample with the HLL payload held
    as SPARK-MANAGED state (applyInPandasWithState), not a driver dict:
    state scales with executors and survives checkpoint/restart, the
    pattern that holds at millions of groups. Emits (sample_id,
    est_distinct, updates) per group per micro-batch; `updates` counts
    state revisions so a consumer can select each group's LATEST row —
    the registers only grow, but the ESTIMATE is not monotone (the
    linear-counting -> raw-estimator switch can step down), so max(est)
    is not "final". The final payload equals the batch computation
    exactly (register-max is order/batching-independent).
    """
    import numpy as np
    import pandas as pd

    from kmtricks_spark.sketches import hll

    out_schema = StructType(
        [
            StructField("sample_id", StringType()),
            StructField("est_distinct", DoubleType()),
            StructField("updates", LongType()),
        ]
    )
    state_schema = StructType(
        [StructField("payload", BinaryType()), StructField("updates", LongType())]
    )

    def update(key, pdfs, state):
        if state.exists:
            payload, n_upd = state.get
            st = hll.deserialize(bytes(payload))
        else:
            st, n_upd = hll.create(p=p), 0
        for pdf in pdfs:
            hs = pdf["h"].to_numpy().astype(np.int64).view(np.uint64)
            st = hll.add_hashes(st, hs)
        n_upd += 1
        state.update((bytearray(hll.serialize(st)), n_upd))
        yield pd.DataFrame(
            {
                "sample_id": [key[0]],
                "est_distinct": [float(hll.estimate(st))],
                "updates": [n_upd],
            }
        )

    shingles = kgrams_sql(docs, cfg)
    hashed = shingles.select("sample_id", F.xxhash64("kgram").alias("h"))
    return hashed.groupBy("sample_id").applyInPandasWithState(
        update, out_schema, state_schema, "update", "NoTimeout"
    )


def stateful_streaming_cms(
    docs: DataFrame,
    probe_hashes: list[int],
    width: int = 2048,
    depth: int = 5,
    sample_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Continuous per-sample token heavy-hitter estimates with the CMS
    payload as SPARK-MANAGED state (the stateful_streaming_hll pattern,
    frequency flavor): each micro-batch folds its token hashes into the
    group's sketch, then reports the current estimate for every probe.

    `probe_hashes` = xxhash64 of the tracked tokens (computed once,
    batch-side; the stream must use the same hash). Cell-sum merge is
    associative, so the final state equals the batch CMS exactly and the
    never-underestimate / <= exact + eps*N guarantees carry over across
    any micro-batch slicing — pinned by the streaming-vs-batch test.
    Emits (sample_id, probe_hash, cms_est, updates); consumers take each
    group's latest `updates` row."""
    import numpy as np
    import pandas as pd

    from kmtricks_spark.sketches import cms

    probes = np.array(probe_hashes, dtype=np.int64).view(np.uint64)
    out_schema = StructType(
        [
            StructField("sample_id", StringType()),
            StructField("probe_hash", LongType()),
            StructField("cms_est", LongType()),
            StructField("updates", LongType()),
        ]
    )
    state_schema = StructType(
        [StructField("payload", BinaryType()), StructField("updates", LongType())]
    )

    def update(key, pdfs, state):
        if state.exists:
            payload, n_upd = state.get
            st = cms.deserialize(bytes(payload))
        else:
            st, n_upd = cms.create(width=width, depth=depth), 0
        for pdf in pdfs:
            hs = pdf["h"].to_numpy().astype(np.int64).view(np.uint64)
            cms.add_hashes(st, hs)
        n_upd += 1
        state.update((bytearray(cms.serialize(st)), n_upd))
        est = cms.query(st, probes)
        yield pd.DataFrame(
            {
                "sample_id": key[0],
                "probe_hash": probes.view(np.int64),
                "cms_est": est.astype(np.int64),
                "updates": np.int64(n_upd),
            }
        )

    toks = docs.select(
        F.col(sample_col).alias("sample_id"),
        F.explode(F.filter(F.split(text_col, " "), lambda t: t != "")).alias("tok"),
    )
    hashed = toks.select("sample_id", F.xxhash64("tok").alias("h"))
    return hashed.groupBy("sample_id").applyInPandasWithState(
        update, out_schema, state_schema, "update", "NoTimeout"
    )


def run_available_now(stream_df: DataFrame, name: str, output_mode: str = "complete"):
    """Drain the currently-available input into an in-memory table and
    stop — the batch-equivalence test harness for streaming plans."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q
