"""Cross-sample merge — the heart of the engine (SURVEY §2.5).

Reference parity: KmerMerger::next() (merge.hpp:183-260) implements an
S-way sorted full-outer merge with three filters:

* soft-min  (J3): a present count c is *solid* iff c >= a_min[sample]
  (merge.hpp:199). Non-solid counts are zeroed...
* rescue    (J4): ...unless share_min > 0 and the kgram is solid in
  >= share_min samples (merge.hpp:214-217, 234-247).
* recurrence(J5): the kgram row is emitted iff solid in >= r_min samples
  (merge.hpp:249-250).

Spark has no need for the S-way heap: a shuffle by kgram gives every
(kgram, *) group to one reducer, and the full-outer 0-fill is an array
completion over the sample list. Two equivalent shapes are provided:

* ``merged_long``  — relational (kgram, sample_id, count) rows, zero rows
  omitted; window function over kgram for solid_in. Oracle-friendly.
* ``count_matrix`` — (part_id, kgram, counts array<long>) positional by
  sample index, the reference's matrix row (io/matrix_file.hpp:88,111);
  scales to thousands of samples where pivot would not.

Merge statistics (J6, merge.hpp:50-100) are computed over ALL occurrences
(before the recurrence filter), matching the reference's counters.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from kmtricks_spark.config import KmConfig


def _amin_col(cfg: KmConfig) -> F.Column:
    """Per-sample soft-min (scalar, or per-sample overrides like the fof
    `! amin` suffix, io/fof.hpp:136-137)."""
    if not cfg.soft_min_by_sample:
        return F.lit(cfg.soft_min)
    pairs = []
    for s, v in cfg.soft_min_by_sample.items():
        pairs += [F.lit(s), F.lit(v)]
    return F.coalesce(
        F.element_at(F.create_map(*pairs), F.col("sample_id")), F.lit(cfg.soft_min)
    )


def with_solidity(counts: DataFrame, cfg: KmConfig) -> DataFrame:
    """Annotate the counts table with amin / solid / solid_in / out_count.

    solid_in is the number of samples in which this kgram is solid —
    identical to the reference's `recurrence`/`solid_in` counters, which
    are incremented together (merge.hpp:200-203).
    """
    x = counts.withColumn("amin", _amin_col(cfg))
    x = x.withColumn("solid", (F.col("count") >= F.col("amin")))
    x = x.withColumn(
        "solid_in",
        F.sum(F.when(F.col("solid"), 1).otherwise(0)).over(Window.partitionBy("kgram")),
    )
    rescued = (
        (~F.col("solid"))
        & F.lit(cfg.share_min > 0)
        & (F.col("solid_in") >= F.lit(cfg.share_min))
    )
    x = x.withColumn("rescued", rescued)
    x = x.withColumn(
        "out_count",
        F.when(F.col("solid") | F.col("rescued"), F.col("count")).otherwise(F.lit(0)),
    )
    return x


def merged_long(counts: DataFrame, cfg: KmConfig) -> DataFrame:
    """Filtered merge in long form: (kgram, sample_id, count).

    Emits only non-zero cells of kgram rows passing the recurrence filter
    (zero-filled absent cells are representational, not informational).
    """
    x = with_solidity(counts, cfg)
    return (
        x.where(F.col("solid_in") >= F.lit(cfg.recurrence_min))
        .where(F.col("out_count") > 0)
        .select("kgram", "sample_id", F.col("out_count").alias("count"))
    )


def count_matrix(counts: DataFrame, samples: list[str], cfg: KmConfig) -> DataFrame:
    """(part_id, kgram, counts array<long>) positional by `samples` order.

    One shuffle (groupBy kgram); the soft-min/rescue/recurrence logic runs
    as higher-order array functions — fully JVM-side, no UDF.
    """
    samples_lit = F.array(*[F.lit(s) for s in samples])
    amins = F.array(*[F.lit(cfg.soft_min_for(s)) for s in samples])
    g = counts.groupBy("kgram").agg(
        F.first("part_id").alias("part_id"),
        F.map_from_entries(
            F.collect_list(F.struct("sample_id", "count"))
        ).alias("cmap"),
    )
    arr = F.transform(
        samples_lit, lambda s: F.coalesce(F.element_at(F.col("cmap"), s), F.lit(0)).cast("long")
    )
    g = g.withColumn("raw", arr)
    solid_in = F.size(
        F.filter(
            F.zip_with(F.col("raw"), amins, lambda c, a: (c > 0) & (c >= a)),
            lambda b: b,
        )
    )
    g = g.withColumn("solid_in", solid_in)
    keep_rescue = F.lit(cfg.share_min > 0) & (F.col("solid_in") >= F.lit(cfg.share_min))
    out = F.zip_with(
        F.col("raw"),
        amins,
        lambda c, a: F.when((c > 0) & ((c >= a) | keep_rescue), c).otherwise(F.lit(0)),
    )
    return (
        g.where(F.col("solid_in") >= F.lit(cfg.recurrence_min))
        .select("part_id", "kgram", out.alias("counts"))
    )


def pa_matrix(counts: DataFrame, samples: list[str], cfg: KmConfig) -> DataFrame:
    """Presence/absence matrix: counts -> booleans (utils.hpp:104-116)."""
    m = count_matrix(counts, samples, cfg)
    return m.select(
        "part_id", "kgram", F.transform("counts", lambda c: c > 0).alias("bits")
    )


def merge_stats(counts: DataFrame, cfg: KmConfig) -> DataFrame:
    """Per-sample merge statistics (merge.hpp:50-100), pre-recurrence.

    Columns mirror MergeStatistics::serialize: non_solid, rescued,
    uniq_wo_rescue, uniq_w_rescue, total_wo_rescue, total_w_rescue.
    """
    x = with_solidity(counts, cfg)
    solid_n = F.sum(F.when(F.col("solid"), 1).otherwise(0))
    rescued_n = F.sum(F.when(F.col("rescued"), 1).otherwise(0))
    solid_tot = F.sum(F.when(F.col("solid"), F.col("count")).otherwise(0))
    rescued_tot = F.sum(F.when(F.col("rescued"), F.col("count")).otherwise(0))
    return x.groupBy("sample_id").agg(
        F.sum(F.when(~F.col("solid"), 1).otherwise(0)).alias("non_solid"),
        rescued_n.alias("rescued"),
        solid_n.alias("uniq_wo_rescue"),
        (solid_n + rescued_n).alias("uniq_w_rescue"),
        solid_tot.alias("total_wo_rescue"),
        (solid_tot + rescued_tot).alias("total_w_rescue"),
    )
