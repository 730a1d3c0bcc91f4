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

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from kmtricks_spark.functions.text import gopher_keep_col, lang_guess_col, quality_col


def curate(
    df: DataFrame,
    min_quality: float | None = 0.5,
    gopher: bool = False,
    langs: list[str] | None = None,
    dedup: str | None = "exact",
    min_jaccard: float = 0.8,
    text_col: str = "text",
    id_col: str = "doc_id",
    cluster_algorithm: str = "star",
    decontaminate: DataFrame | None = None,
    contamination_n: int = 8,
    max_dup_coverage: float | None = None,
    span: int = 40,
    stride: int = 10,
    semantic: float | None = None,
    vec_col: str = "embedding",
) -> tuple[DataFrame, dict]:
    """Apply the curation funnel; returns (survivors, report).

    dedup: None | 'exact' (md5 keep-min) | 'minhash' (LSH candidate
    pairs -> connected-component clusters -> keep cluster minima;
    cluster_algorithm defaults to 'star' — large-star/small-star is
    round-bound on ANY duplicate-graph shape at the same per-round cost,
    so it is the safe default when cluster diameter is unknown;
    'propagate' remains available for known-shallow graphs).
    decontaminate: optional benchmark DataFrame (text_col; bench_id
    synthesized if absent) — survivors sharing any contamination_n-gram
    with it are dropped (test-set hygiene gate, reported as
    'after_decontam').
    max_dup_coverage: optional [0,1] threshold — survivors whose
    duplicated-substring coverage (strided span/stride screen across
    the surviving corpus, merged intervals / doc length) exceeds it are
    dropped (the Lee et al. substring-dedup decision, reported as
    'after_span_dedup').
    semantic: optional cosine threshold — SemDeDup gate over `vec_col`
    (IVF-clustered within-cluster pruning, semantic_dedup), reported as
    'after_semantic'; requires the embedding column on the corpus rows.

    Scale shape: quality, gopher, and lang are pure per-row Column
    predicates, so they are fused into ONE corpus scan — one conditional
    aggregate produces the whole scalar-gate funnel report (input +
    after_quality/after_gopher/after_lang, each the running conjunction,
    identical to sequential application), and one localCheckpoint
    materializes only the rows surviving all scalar gates. The dedup /
    span-coverage / decontamination gates each end in their own
    checkpoint + count as before (they are relational, not scalar, and
    downstream gates re-read their survivors). At 100 TB this is 2
    column-pruned scans + 1 survivor materialization for the scalar
    prefix instead of up to 3 full-corpus materializations + 4 jobs.
    """
    report: dict = {}
    kept = df

    # ---- fused scalar gates: one agg scan + one survivor checkpoint
    gates: list[tuple[str, Column]] = []
    if min_quality is not None:
        gates.append(("after_quality", quality_col(text_col) >= min_quality))
    if gopher:
        gates.append(("after_gopher", gopher_keep_col(text_col)))
    if langs:
        gates.append(("after_lang", lang_guess_col(text_col).isin(list(langs))))

    aggs = [F.count(F.lit(1)).alias("input")]
    conj = None
    for name, pred in gates:
        conj = pred if conj is None else (conj & pred)
        aggs.append(F.sum(F.when(conj, 1).otherwise(0)).alias(name))
    row = df.agg(*aggs).collect()[0]
    report["input"] = row["input"]
    for name, _ in gates:
        report[name] = row[name]
    if conj is not None:
        kept = kept.where(conj).localCheckpoint()

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

    if semantic is not None:
        # SemDeDup gate over an embedding column riding on the corpus
        # rows: IVF-clustered within-cluster cosine pruning, no
        # all-pairs. n_lists adapts down for small survivor sets (the
        # trainer needs >= n_lists sample rows); at corpus scale the
        # cap of 16 is the knob a caller would raise via semantic_dedup
        # directly.
        if vec_col not in kept.columns:
            raise ValueError(
                f"semantic dedup needs an embedding column {vec_col!r} in the input"
            )
        from kmtricks_spark.operators.similarity import semantic_dedup

        survivors = report[list(report)[-1]] if len(report) > 0 else kept.count()
        kept = semantic_dedup(
            kept,
            threshold=semantic,
            n_lists=max(1, min(16, int(survivors))),
            vec_col=vec_col,
            id_col=id_col,
            cluster_algorithm=cluster_algorithm,
        ).localCheckpoint()
        report["after_semantic"] = kept.count()

    if max_dup_coverage is not None:
        from kmtricks_spark.operators.dedup import (
            dup_span_coverage,
            duplicate_spans,
            release_persisted,
        )

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
        # duplicate_spans persists its span frame (the two-consumer
        # exchange share); the checkpoint above cut our lineage to it,
        # so release the executor cache instead of leaking it across
        # repeated curate() calls in one session
        release_persisted(spans)

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
