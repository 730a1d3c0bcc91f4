"""End-to-end corpus curation: quality -> rules -> language -> dedup.

The composition a training-data pipeline actually runs over raw pages
(the `curation_pipeline` query is the oracle-pinned core of it): each
stage is one of this repo's oracled operators, chained as DataFrame
transformations so Catalyst fuses the scalar filters into the scan and
the only shuffles are the ones dedup inherently needs (md5 groupBy, or
the LSH band join + cluster propagation for near-dup mode).

Returns both the surviving rows and a per-stage funnel report — the
numbers a curation run is judged by (how much did each gate remove).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kmtricks_spark.functions.text import gopher_filters, lang_guess, quality_score


def curate(
    df: DataFrame,
    min_quality: float | None = 0.5,
    gopher: bool = False,
    langs: list[str] | None = None,
    dedup: str | None = "exact",
    min_jaccard: float = 0.8,
    text_col: str = "text",
    id_col: str = "doc_id",
    cluster_algorithm: str = "propagate",
    decontaminate: DataFrame | None = None,
    contamination_n: int = 8,
    max_dup_coverage: float | None = None,
    span: int = 40,
    stride: int = 10,
) -> tuple[DataFrame, dict]:
    """Apply the curation funnel; returns (survivors, report).

    dedup: None | 'exact' (md5 keep-min) | 'minhash' (LSH candidate
    pairs -> connected-component clusters -> keep cluster minima;
    cluster_algorithm='star' switches to large-star/small-star for
    corpora whose duplicate graphs chain deeply).
    decontaminate: optional benchmark DataFrame (text_col; bench_id
    synthesized if absent) — survivors sharing any contamination_n-gram
    with it are dropped (test-set hygiene gate, reported as
    'after_decontam').
    max_dup_coverage: optional [0,1] threshold — survivors whose
    duplicated-substring coverage (strided span/stride screen across
    the surviving corpus, merged intervals / doc length) exceeds it are
    dropped (the Lee et al. substring-dedup decision, reported as
    'after_span_dedup').
    The funnel report runs one count() per enabled stage — that is the
    deliverable of a curation run, not overhead. Each gate is followed
    by an eager localCheckpoint so the per-stage count, the downstream
    gates, and the caller's final write all read materialized survivor
    blocks instead of re-executing every upstream join (with 4 gates
    the quality scan would otherwise run 5x).
    """
    report: dict = {"input": df.count()}
    kept = df

    if min_quality is not None:
        q = quality_score(kept, text_col=text_col, id_col=id_col).where(
            F.col("quality") >= min_quality
        )
        kept = kept.join(q.select(id_col), id_col).localCheckpoint()
        report["after_quality"] = kept.count()

    if gopher:
        g = gopher_filters(kept, text_col=text_col, id_col=id_col).where(
            F.col("keep") == 1
        )
        kept = kept.join(g.select(id_col), id_col).localCheckpoint()
        report["after_gopher"] = kept.count()

    if langs:
        lg = lang_guess(kept, text_col=text_col, id_col=id_col).where(
            F.col("lang_guess").isin(list(langs))
        )
        kept = kept.join(lg.select(id_col), id_col).localCheckpoint()
        report["after_lang"] = kept.count()

    if dedup == "exact":
        from kmtricks_spark.operators.dedup import exact_dedup

        keep_ids = exact_dedup(kept, text_col=text_col, id_col=id_col).select(
            F.col("keep_id").alias(id_col)
        )
        kept = kept.join(keep_ids, id_col).localCheckpoint()
        report["after_dedup"] = kept.count()
    elif dedup == "minhash":
        from kmtricks_spark.operators.dedup import (
            dedup_keep_set,
            minhash_lsh_pairs,
            minhash_signatures,
        )

        # spread before the signature mapInPandas: a freshly-scanned
        # parquet often has ~1 row group and would compute every
        # signature on one core
        src = kept.select(id_col, text_col).repartition(
            kept.sparkSession.sparkContext.defaultParallelism
        )
        sigs = minhash_signatures(src, id_col=id_col, text_col=text_col)
        pairs = minhash_lsh_pairs(sigs, min_jaccard=min_jaccard)
        kept = dedup_keep_set(
            kept, pairs.select("a", "b"), id_col=id_col, algorithm=cluster_algorithm
        ).localCheckpoint()
        report["after_dedup"] = kept.count()
    elif dedup is not None:
        raise ValueError(f"dedup must be None|exact|minhash, got {dedup!r}")

    if max_dup_coverage is not None:
        from kmtricks_spark.operators.dedup import dup_span_coverage, duplicate_spans

        if not (0.0 <= max_dup_coverage <= 1.0):
            raise ValueError(f"max_dup_coverage must be in [0,1], got {max_dup_coverage}")
        spans = duplicate_spans(
            kept, span=span, stride=stride, text_col=text_col, id_col=id_col
        )
        heavy = (
            dup_span_coverage(kept, spans, span=span, text_col=text_col, id_col=id_col)
            .where(F.col("coverage") > max_dup_coverage)
            .select(F.col("doc_id").alias(id_col))
        )
        kept = kept.join(heavy, id_col, "left_anti").localCheckpoint()
        report["after_span_dedup"] = kept.count()

    if decontaminate is not None:
        from kmtricks_spark.operators.dedup import benchmark_contamination

        # drop every doc sharing an n-gram with the benchmark set
        # (GPT-3-style test-set hygiene); only contaminated doc_ids are
        # kept from the screen, so a synthesized bench id is fine (it
        # never reaches the output) and the anti-join side is tiny
        bench = decontaminate
        if "bench_id" not in bench.columns:
            bench = bench.withColumn("bench_id", F.monotonically_increasing_id())
        hits = benchmark_contamination(
            kept, bench, n=contamination_n,
            text_col=text_col, id_col=id_col, bench_text_col=text_col,
        ).select(F.col("doc_id").alias(id_col)).distinct()
        kept = kept.join(hits, id_col, "left_anti").localCheckpoint()
        report["after_decontam"] = kept.count()

    report["removed"] = report["input"] - report[list(report)[-1]]
    return kept, report
