"""Bloom stage end-to-end: membership of all counted kgrams, measured FPR
vs the analytic bound (utils.hpp:239-243), bf == bft equivalence."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from kmtricks_spark import KmConfig
from kmtricks_spark.operators.bloom_stage import (
    bf_concat,
    bf_slices,
    bfc_slices,
    bft_slices,
    fpr_report,
    hash_counts,
)
from kmtricks_spark.operators.count import count_kgrams
from kmtricks_spark.sketches import bloom

CFG = KmConfig(k=8, hard_min=1, nb_partitions=8, bloom_bits=1 << 20)


@pytest.fixture(scope="module")
def counts(spark, docs):
    return count_kgrams(docs, CFG).cache()


@pytest.fixture(scope="module")
def hc(counts):
    return hash_counts(counts, CFG).cache()


def test_all_inserted_members(spark, counts, hc):
    filters = {r.sample_id: bytes(r["filter"]) for r in bf_concat(bf_slices(hc, CFG), CFG).collect()}
    probe = hc.select("sample_id", "hash_idx").toPandas()
    for sample, grp in probe.groupby("sample_id"):
        blob = np.frombuffer(filters[sample], dtype=np.uint8)
        idx = grp["hash_idx"].to_numpy(dtype=np.int64)
        assert bloom.contains_local(blob, idx).all()


def test_measured_fpr_within_bound(spark, counts, hc):
    w = CFG.window_bits
    one = bf_concat(bf_slices(hc, CFG), CFG).orderBy("sample_id").first()
    blob = np.frombuffer(bytes(one["filter"]), dtype=np.uint8)
    n = one["total_set"]
    m = CFG.total_bloom_bits
    rng = np.random.default_rng(3)
    probes = rng.integers(0, m, size=200_000)
    hits = bloom.contains_local(blob, probes).mean()
    bound = bloom.fpr(m, n)
    # random probes ~ FPR + true-bit density; both bounded by n/m-ish
    assert hits <= bound * 1.5 + 0.01


def test_fpr_report_matches_model(hc):
    rep = fpr_report(bf_slices(hc, CFG), CFG).first()
    expect = 1.0 - np.exp(-rep["n_set"] / CFG.window_bits)
    assert abs(rep["fpr"] - expect) < 1e-6


def test_bft_equals_bf(spark, counts, hc):
    samples = sorted(r.sample_id for r in counts.select("sample_id").distinct().collect())
    a = {(r.part_id, r.sample_id): bytes(r.bitmap) for r in bf_slices(hc, CFG).collect()}
    b = {(r.part_id, r.sample_id): bytes(r.bitmap) for r in bft_slices(hc, samples, CFG).collect()}
    assert a == b


def test_bfc_cells(spark, hc):
    row = bfc_slices(hc, CFG).first()
    packed = np.frombuffer(bytes(row["packed"]), dtype=np.uint8)
    cells = bloom.unpack_counts(packed, CFG.bfc_width, CFG.window_bits)
    sel = hc.where(
        (F.col("part_id") == row["part_id"]) & (F.col("sample_id") == row["sample_id"])
    ).toPandas()
    local = sel["hash_idx"].to_numpy(dtype=np.int64) - row["part_id"] * CFG.window_bits
    agg = np.zeros(CFG.window_bits, dtype=np.int64)
    np.add.at(agg, local, sel["count"].to_numpy(dtype=np.int64))
    expect = np.minimum(
        np.ceil(np.log2(agg + 1)).astype(np.int64), (1 << CFG.bfc_width) - 1
    )
    assert np.array_equal(cells.astype(np.int64), expect)
