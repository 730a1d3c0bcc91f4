"""Spark glue for sketches: partial->merge equals whole, estimates within
bounds vs exact Spark aggregates, cross-check vs approx_count_distinct."""

import numpy as np
from pyspark.sql import functions as F

from kmtricks_spark.sketches import hll, kll
from kmtricks_spark.sketches.spark import (
    hll_estimate_col,
    kll_quantiles_col,
    sketch_agg,
    sketch_merge,
    sketch_partials,
)


def test_hll_per_group_vs_exact(spark, docs):
    toks = docs.select(
        F.col("source").alias("g"), F.explode(F.split("text", " ")).alias("tok")
    ).where(F.col("tok") != "")
    hashed = toks.select("g", F.xxhash64("tok").alias("h"))
    est = {
        r.g: r.est
        for r in sketch_agg(hashed, ["g"], "h", "hll", p=14)
        .select("g", hll_estimate_col().alias("est"))
        .collect()
    }
    exact = {
        r.g: r.d for r in toks.groupBy("g").agg(F.countDistinct("tok").alias("d")).collect()
    }
    for g, d in exact.items():
        assert abs(est[g] - d) / max(d, 1) < 0.05, (g, est[g], d)


def test_partial_then_merge_equals_whole(spark, docs):
    hashed = docs.select(F.lit("all").alias("g"), F.xxhash64("text").alias("h"))
    merged = sketch_merge(
        sketch_partials(hashed.repartition(7), ["g"], "h", "hll", p=12), ["g"], "hll"
    ).collect()[0]["payload"]
    whole_hashes = np.array([r.h for r in hashed.collect()], dtype=np.int64).view(np.uint64)
    whole = hll.add_hashes(hll.create(p=12), whole_hashes)
    assert np.array_equal(hll.deserialize(bytes(merged)), whole)


def test_two_level_merge_identical(spark, docs):
    """Salted intermediate merge (the low-cardinality scale path) must be
    byte-identical for hll/cms (associative + commutative register ops)."""
    hashed = docs.select(F.lit("all").alias("g"), F.xxhash64("text").alias("h")).repartition(9)
    for kind, params in (("hll", {"p": 12}), ("cms", {"width": 257, "depth": 3})):
        one = sketch_agg(hashed, ["g"], "h", kind, **params).collect()[0]["payload"]
        two = sketch_agg(hashed, ["g"], "h", kind, salt_buckets=8, **params).collect()[0][
            "payload"
        ]
        assert bytes(one) == bytes(two), kind
    # kll: payload may differ (compaction order) but quantiles stay in bound
    vals = docs.select(F.lit("all").alias("g"), F.length("text").cast("double").alias("v"))
    exact = sorted(r.v for r in vals.collect())
    q2 = sketch_agg(vals.repartition(9), ["g"], "v", "kll", salt_buckets=8, k=200).collect()[0]
    est = kll.quantile(kll.deserialize(bytes(q2["payload"])), 0.5)
    rank = np.searchsorted(exact, est) / len(exact)
    assert abs(rank - 0.5) < 0.05


def test_hll_overlap_vs_exact(spark, docs):
    """Inclusion-exclusion overlap estimate within combined-sketch error:
    3 sketches contribute, so allow ~3x the single-sketch 3-sigma band."""
    from kmtricks_spark.sketches.spark import sketch_agg

    toks = docs.select(
        F.col("source").alias("g"), F.explode(F.split("text", " ")).alias("tok")
    ).where(F.col("tok") != "")
    hashed = toks.select("g", F.xxhash64("tok").alias("h"))
    agg = sketch_agg(hashed, ["g"], "h", "hll", p=14).collect()
    from kmtricks_spark.sketches import hll as H

    states = {r["g"]: H.deserialize(bytes(r["payload"])) for r in agg}
    gs = sorted(states)[:3]
    sets = {
        g: {r.tok for r in toks.where(F.col("g") == g).select("tok").distinct().collect()}
        for g in gs
    }
    sigma = 1.04 / np.sqrt(2**14)
    for i, a in enumerate(gs):
        for b in gs[i + 1:]:
            est = (
                H.estimate(states[a]) + H.estimate(states[b])
                - H.estimate(H.merge(states[a], states[b]))
            )
            exact = len(sets[a] & sets[b])
            union = len(sets[a] | sets[b])
            assert abs(est - exact) <= 3 * 3 * sigma * union + 2, (a, b, est, exact)


def test_kll_quantiles_vs_exact(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    got = (
        sketch_agg(
            li.select(F.lit("x").alias("g"), "l_extendedprice"), ["g"], "l_extendedprice", "kll", k=200
        )
        .select(kll_quantiles_col([0.1, 0.5, 0.9]).alias("q"))
        .collect()[0]["q"]
    )
    vals = np.array([r[0] for r in li.select("l_extendedprice").collect()])
    for q, est in zip([0.1, 0.5, 0.9], got):
        true_rank = (vals <= est).mean()
        assert abs(true_rank - q) < 0.03
