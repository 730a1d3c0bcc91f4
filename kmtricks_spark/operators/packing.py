"""Deterministic sequence packing — the training-batch layout operator.

GPT-style packing concatenates documents (with an end-of-document
token) in a fixed order and splits the stream into fixed-length token
windows; documents straddle window boundaries. The layout must be
DETERMINISTIC and layout-independent (same doc -> same window on every
run, any cluster, under retries), so the order is the md5 key-hash
order the sampling operators use — never partition order or rand().

Scale shape: one window-sort per SHARD (shard = key-hash mod n_shards),
so shards pack independently and in parallel — n_shards is the
write-parallelism knob (one packed stream per output worker/file). A
single global sort would serialize the corpus through one task chain;
per-shard it is the ordinary "sort within my output file" every
training-data writer already pays.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def pack_sequences(
    df: DataFrame,
    max_tokens: int,
    n_shards: int | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    salt: str = "",
) -> DataFrame:
    """Assign every document its place in the packed token stream.

    Returns (shard, id, n_tokens, offset, bin_start, bin_end):
    n_tokens = whitespace tokens + 1 (the end-of-document marker),
    offset = the doc's start position in its shard's concatenated
    stream, bin_* = the first/last max_tokens-sized training window the
    doc touches (straddling = bin_start < bin_end). Change `salt` for an
    independent shuffle of the same corpus (epoch re-packing).

    ``n_shards`` defaults to the session's defaultParallelism — a
    single-shard default would route the whole corpus through ONE
    window-sort task; pass an explicit value when the shard count is
    part of the layout contract (it changes every doc's shard/offset).
    """
    if n_shards is None:
        n_shards = df.sparkSession.sparkContext.defaultParallelism
    if max_tokens < 1 or n_shards < 1:
        raise ValueError("max_tokens and n_shards must be >= 1")
    key = F.col(id_col).cast("string")
    h = F.md5(F.concat(key, F.lit(salt)))
    shard = (F.conv(F.substring(h, 1, 8), 16, 10).cast("long") % n_shards).cast("int")
    n_tok = (
        F.size(F.filter(F.split(F.col(text_col), " "), lambda t: t != "")) + 1
    ).cast("bigint")
    base = df.select(
        F.col(id_col), shard.alias("shard"), n_tok.alias("n_tokens"), h.alias("__h")
    )
    w = (
        Window.partitionBy("shard")
        .orderBy("__h", id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = (
        base.withColumn("offset", F.sum("n_tokens").over(w) - F.col("n_tokens"))
        .select(
            "shard",
            id_col,
            "n_tokens",
            "offset",
            F.floor(F.col("offset") / max_tokens).cast("int").alias("bin_start"),
            F.floor((F.col("offset") + F.col("n_tokens") - 1) / max_tokens)
            .cast("int")
            .alias("bin_end"),
        )
    )
    # self-describing hand-off: pack_bins derives/validates the window
    # size from this instead of trusting a re-typed parameter
    out._km_max_tokens = max_tokens
    return out


def pack_bins(
    packed: DataFrame, max_tokens: int | None = None, id_col: str = "doc_id"
) -> DataFrame:
    """The per-window slice manifest a training loader actually consumes:
    one row per (training window, document slice) — (shard, bin, doc_id,
    doc_offset, len), where doc_offset is the slice's start INSIDE the
    document's token stream and len its token count. A straddling doc
    emits one row per window it touches; every window's slices sum to
    exactly max_tokens (the last window of each shard may be short).

    `max_tokens` is a PROPERTY of the packed frame (its bin_start /
    bin_end were computed with it): when `packed` came straight from
    pack_sequences in this session the value rides on the frame and may
    be omitted; passing a CONTRADICTING value raises (it would silently
    emit negative/overlapping slice lengths). After a write/read
    round-trip the attribute is gone and the caller must restate the
    layout's window size explicitly.

    Pure gaps-and-islands arithmetic over pack_sequences' offsets —
    explode the doc's window range, clamp both ends. No shuffle beyond
    what `packed` already did; the explode fan-out is bounded by
    ceil(n_tokens / max_tokens) + 1 rows per doc.
    """
    carried = getattr(packed, "_km_max_tokens", None)
    if max_tokens is None:
        if carried is None:
            raise ValueError(
                "max_tokens required: the packed frame does not carry its "
                "window size (e.g. it was read back from parquet)"
            )
        max_tokens = carried
    elif carried is not None and carried != max_tokens:
        raise ValueError(
            f"max_tokens={max_tokens} contradicts the packed frame's window "
            f"size {carried} — slices would be corrupt (negative/overlapping)"
        )
    if max_tokens < 1:
        raise ValueError("max_tokens must be >= 1")
    b = F.col("bin").cast("long")
    start_in_doc = F.greatest(F.lit(0).cast("bigint"), b * max_tokens - F.col("offset"))
    end_in_doc = F.least(F.col("n_tokens"), (b + 1) * max_tokens - F.col("offset"))
    return (
        packed.select(
            "shard",
            F.col(id_col),
            "n_tokens",
            "offset",
            F.explode(F.sequence(F.col("bin_start"), F.col("bin_end"))).alias("bin"),
        )
        .select(
            "shard",
            F.col("bin").cast("int").alias("bin"),
            F.col(id_col),
            start_in_doc.cast("bigint").alias("doc_offset"),
            (end_in_doc - start_in_doc).cast("bigint").alias("len"),
        )
    )
