"""Benchmark harness. Prints ONE JSON line:
{"metric": "shingles_per_sec", "value": N, "unit": "sec", "queries": {...},
 "sf": ..., "scaling": {...}}

Headline: the full count pipeline (byte-shingle extract -> pre-counted
partials -> exact count matrix) on a replicated sf documents corpus,
plus merge/bloom/sketch/dedup stage timings.

Scaling evidence (north rule, sandbox protocol per BASELINE.md §2): the
identical count job runs at local[N] and local[4N] on the same input;
efficiency = (thr_4N / thr_N) / 4.

Env knobs: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
SPARK_GRAFT_CPUS (default 32), BENCH_REPLICATE (default 24),
BENCH_SCALING=0 to skip the two-level run.
"""

from __future__ import annotations

import json
import os
import sys
import time

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from kmtricks_spark import KmConfig, get_spark
from kmtricks_spark.operators.bloom_stage import bf_concat, bf_slices, hash_counts
from kmtricks_spark.operators.count import count_kgrams, histogram
from kmtricks_spark.operators.dedup import minhash_lsh_pairs, minhash_signatures
from kmtricks_spark.operators.merge import count_matrix
from kmtricks_spark.sketches.spark import hll_estimate_col, sketch_agg

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
REPLICATE = int(os.environ.get("BENCH_REPLICATE", "24"))
CFG = KmConfig(k=8, hard_min=2)


def replicated_docs(spark, rep: int):
    """Deterministic corpus scale-up: rep copies of each doc (distinct
    doc_ids, same sample dimension). No external data."""
    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    out = (
        docs.withColumn("rep", F.explode(F.sequence(F.lit(1), F.lit(rep))))
        .withColumn("doc_id", F.col("doc_id") + F.col("rep") * F.lit(10_000_000))
        .drop("rep")
    )
    # spread the replicated corpus across all cores (the parquet scan has
    # too few row groups to parallelize the downstream shingling otherwise)
    return out.repartition(spark.sparkContext.defaultParallelism * 3)


def total_shingles(spark, rep: int) -> int:
    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    base = docs.select(
        F.sum(F.greatest(F.length("text") - (CFG.k - 1), F.lit(0))).alias("n")
    ).collect()[0]["n"]
    return int(base) * rep


def run_count(spark, rep: int) -> float:
    d = replicated_docs(spark, rep)
    t0 = time.time()
    counts = count_kgrams(d, CFG)
    counts.agg(F.sum("count"), F.count(F.lit(1))).collect()
    return time.time() - t0


def bench_queries(spark) -> dict[str, float]:
    out = {}
    d = replicated_docs(spark, REPLICATE)

    # warmup: exercise codegen/JIT + python workers once, off the clock
    run_count(spark, 2)
    sketch_agg(
        spark.range(1000).select(F.lit("w").alias("g"), F.xxhash64("id").alias("h")),
        ["g"], "h", "hll", p=10,
    ).collect()

    t0 = time.time()
    counts = count_kgrams(d, CFG)
    counts.agg(F.sum("count"), F.count(F.lit(1))).collect()
    out["count_pipeline"] = time.time() - t0

    t0 = time.time()
    counts.write.mode("overwrite").parquet("/tmp/bench_counts.parquet")
    out["counts_write"] = time.time() - t0

    counts = spark.read.parquet("/tmp/bench_counts.parquet")
    samples = sorted(r.sample_id for r in counts.select("sample_id").distinct().collect())

    t0 = time.time()
    mcfg = CFG.with_(soft_min=3, share_min=3, recurrence_min=2)
    count_matrix(counts, samples, mcfg).agg(F.count(F.lit(1))).collect()
    out["merge_matrix"] = time.time() - t0

    t0 = time.time()
    hc = hash_counts(counts, CFG.with_(nb_partitions=64, bloom_bits=1 << 24))
    bf = bf_concat(bf_slices(hc, CFG.with_(nb_partitions=64, bloom_bits=1 << 24)),
                   CFG.with_(nb_partitions=64, bloom_bits=1 << 24))
    bf.agg(F.sum("total_set")).collect()
    out["bloom_build"] = time.time() - t0

    t0 = time.time()
    hashed = counts.select("sample_id", F.xxhash64("kgram").alias("h"))
    sketch_agg(hashed, ["sample_id"], "h", "hll", p=14).select(
        hll_estimate_col()
    ).collect()
    out["hll_per_sample"] = time.time() - t0

    t0 = time.time()
    histogram(counts).agg(F.count(F.lit(1))).collect()
    out["histogram"] = time.time() - t0

    t0 = time.time()
    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    sigs = minhash_signatures(docs.select("doc_id", "text"))
    minhash_lsh_pairs(sigs, bands=16, rows_per_band=8, min_jaccard=0.7).agg(F.count(F.lit(1))).collect()
    out["minhash_lsh"] = time.time() - t0

    return out


def scaling_run(rep: int) -> dict:
    # larger input than the headline so fixed per-stage overhead (~1s of
    # scheduling/codegen) stays <5% of the 4N-core runtime — the quantity
    # under test is compute scaling, not constant overhead amortization
    rep = rep * int(os.environ.get("BENCH_SCALING_MULT", "6"))
    lo, hi = max(CPUS // 4, 2), CPUS
    res = {}
    for n in (lo, hi):
        spark = get_spark(cores=n, app=f"bench_scaling_{n}", shuffle_partitions=max(n * 2, 16))
        run_count(spark, max(rep // 8, 2))  # warmup (JIT, code paths)
        res[n] = run_count(spark, rep)
        spark.stop()
    shingles = None
    try:
        spark = get_spark(cores=2, app="bench_counter")
        shingles = total_shingles(spark, rep)
        spark.stop()
    except Exception:
        pass
    thr = {n: (shingles / s if shingles else None) for n, s in res.items()}
    eff = (thr[hi] / thr[lo]) / (hi / lo) if shingles else None
    return {
        "cores_lo": lo,
        "cores_hi": hi,
        "sec_lo": round(res[lo], 3),
        "sec_hi": round(res[hi], 3),
        "shingles": shingles,
        "thr_lo": round(thr[lo]) if thr[lo] else None,
        "thr_hi": round(thr[hi]) if thr[hi] else None,
        "efficiency": round(eff, 4) if eff else None,
    }


def main():
    spark = get_spark(cores=CPUS, app="bench")
    shingles = total_shingles(spark, REPLICATE)
    queries = {k: round(v, 3) for k, v in bench_queries(spark).items()}
    spark.stop()

    headline = shingles / queries["count_pipeline"]
    result = {
        "metric": "shingles_per_sec",
        "value": round(headline),
        "unit": "sec",
        "queries": queries,
        "sf": SF_DIR.rstrip("/").split("sf")[-1],
        "shingles": shingles,
        "replicate": REPLICATE,
        "cpus": CPUS,
    }
    if os.environ.get("BENCH_SCALING", "1") != "0":
        result["scaling"] = scaling_run(REPLICATE)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
