"""Extra benchmarks for the optimization round (guide §1.4: noop-sink
isolation, §1.5: labeled jobs). NOT the driver artifact — bench.py stays
the frozen measurement; this file exists to (a) time each leg's
computation without its sink/collect, (b) time sub-phases of composite
legs, and (c) dump .explain("formatted") plans to plans/r06/.

Usage:
    python bench_extra.py [leg ...]          # time legs (default: all)
    BENCH_EXTRA_PLANS=1 python bench_extra.py  # also write plan files

Env mirrors bench.py: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS,
BENCH_REPLICATE.
"""

from __future__ import annotations

import json
import os
import sys
import time

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from bench import CFG, REPLICATE, SF_DIR, materialize_corpus
from kmtricks_spark import get_spark

PLAN_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "plans", "r06")


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def timed(fn, reps=2):
    best = None
    for _ in range(reps):
        t0 = time.time()
        fn()
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
    return round(best, 3)


def dump_plan(df, name, suffix):
    os.makedirs(PLAN_DIR, exist_ok=True)
    with open(os.path.join(PLAN_DIR, f"{name}_{suffix}.txt"), "w") as f:
        f.write(df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"))


def main():
    only = set(sys.argv[1:])
    plans = os.environ.get("BENCH_EXTRA_PLANS", "0") == "1"
    suffix = os.environ.get("BENCH_EXTRA_SUFFIX", "before")
    spark = get_spark(cores=int(os.environ.get("SPARK_GRAFT_CPUS", "32")),
                      app="bench_extra")
    sc = spark.sparkContext
    d = spark.read.parquet(materialize_corpus(spark, REPLICATE))
    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet")).repartition(
        sc.defaultParallelism
    )
    out = {}

    def leg(name, build, reps=2):
        if only and name not in only:
            return
        df = build()
        if plans:
            dump_plan(df, name, suffix)
        sc.setJobDescription(f"extra:{name}")
        out[name] = timed(lambda: noop(build()), reps)
        sc.setJobDescription(None)

    from kmtricks_spark.operators.count import count_kgrams, histogram
    from kmtricks_spark.operators.merge import count_matrix
    from kmtricks_spark.operators.bloom_stage import (
        bf_concat, bf_probe, bf_slices, hash_counts,
    )
    from kmtricks_spark.operators.dedup import (
        benchmark_contamination, exact_dedup, minhash_lsh_pairs,
        minhash_signatures, simhash,
    )
    from kmtricks_spark.operators.packing import pack_bins, pack_sequences
    from kmtricks_spark.operators.similarity import hyperplane_signatures
    from kmtricks_spark.functions.text import (
        gopher_keep_col, pii_redact, quality_col,
    )
    from kmtricks_spark.sketches.spark import hll_estimate_col, sketch_agg

    # warmup (codegen + python workers)
    count_kgrams(d, CFG).agg(F.sum("count")).collect()

    # --- count family
    from kmtricks_spark.functions.shingles import kgrams_sql

    leg("count_shingle_only", lambda: kgrams_sql(d, CFG))
    leg("count_kgrams", lambda: count_kgrams(d, CFG))

    counts_path = "/tmp/bench_counts_extra.parquet"
    count_kgrams(d, CFG).write.mode("overwrite").parquet(counts_path)
    counts = spark.read.parquet(counts_path)
    samples = sorted(r.sample_id for r in counts.select("sample_id").distinct().collect())

    mcfg = CFG.with_(soft_min=3, share_min=3, recurrence_min=2)
    leg("merge_matrix", lambda: count_matrix(counts, samples, mcfg))
    leg("histogram", lambda: histogram(counts))

    bcfg = CFG.with_(nb_partitions=64, bloom_bits=1 << 24)
    leg("hash_counts", lambda: hash_counts(counts, bcfg))
    leg("bf_slices", lambda: bf_slices(hash_counts(counts, bcfg), bcfg))
    leg("bloom_build", lambda: bf_concat(bf_slices(hash_counts(counts, bcfg), bcfg), bcfg))

    pcfg = CFG.with_(bloom_bits=1 << 24)
    slices = bf_slices(hash_counts(counts, pcfg), pcfg).cache()
    slices.count()
    probes = counts.select("sample_id", "kgram")
    leg("bf_probe", lambda: bf_probe(slices, probes, pcfg))
    slices.unpersist()

    hashed = counts.select("sample_id", F.xxhash64("kgram").alias("h"))
    leg("hll_per_sample", lambda: sketch_agg(hashed, ["sample_id"], "h", "hll", p=14)
        .select(hll_estimate_col()))

    # --- dedup family
    leg("minhash_sigs_only", lambda: minhash_signatures(docs.select("doc_id", "text")))
    leg("minhash_lsh", lambda: minhash_lsh_pairs(
        minhash_signatures(docs.select("doc_id", "text")),
        bands=16, rows_per_band=8, min_jaccard=0.7))
    leg("simhash", lambda: simhash(d.select("doc_id", "text")))

    # --- curate funnel phases
    leg("curate_scalar_expr", lambda: d.select(
        "doc_id", "text").where((quality_col("text") >= 0.5) & gopher_keep_col("text")))
    leg("curate_scalar_agg", lambda: d.agg(
        F.count(F.lit(1)).alias("input"),
        F.count(F.when(quality_col("text") >= 0.5, F.lit(1))).alias("after_quality"),
        F.count(F.when((quality_col("text") >= 0.5) & gopher_keep_col("text"), F.lit(1))).alias("after_gopher"),
    ))
    leg("exact_dedup", lambda: exact_dedup(d.select("doc_id", "text")))

    def curate_leg():
        from kmtricks_spark.operators.curation import curate
        kept, rep = curate(d.select("doc_id", "text"), min_quality=0.5,
                           gopher=True, dedup="exact")
        spark.catalog.clearCache()
        return kept

    if not only or "curate_funnel" in only:
        sc.setJobDescription("extra:curate_funnel")
        t0 = time.time(); curate_leg(); out["curate_funnel"] = round(time.time() - t0, 3)
        t0 = time.time(); curate_leg(); out["curate_funnel"] = min(out["curate_funnel"], round(time.time() - t0, 3))
        sc.setJobDescription(None)

    # --- text / packing / decontam
    leg("pii_redact", lambda: pii_redact(d.select("doc_id", "text")))
    leg("pack_stream", lambda: pack_bins(
        pack_sequences(d.select("doc_id", "text"), max_tokens=2048)))
    bench_set = docs.where(F.col("doc_id") % 10 == 0).select(
        F.col("doc_id").alias("bench_id"), "text")
    leg("decontam_grams_only", lambda: __import__(
        "kmtricks_spark.operators.dedup", fromlist=["_word_grams"]
    )._word_grams(d.select("doc_id", "text"), 8, "text", "doc_id", "doc_id"))
    leg("decontaminate", lambda: benchmark_contamination(
        d.select("doc_id", "text"), bench_set))

    emb = spark.range(50_000).select(
        F.col("id").alias("vec_id"),
        F.expr("transform(sequence(1, 256), i -> cast(rand(42) * 2 - 1 as double))").alias("embedding"),
    ).repartition(sc.defaultParallelism)
    leg("hyperplane_sigs", lambda: hyperplane_signatures(emb, dim=256, bits=24))

    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
