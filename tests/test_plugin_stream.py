"""Plugin hook (J7), partitioner persistence (R4), streaming HLL."""

import os

import numpy as np
import pytest

from kmtricks_spark import KmConfig
from kmtricks_spark.operators.partitioner import load_partitioner, save_partitioner
from kmtricks_spark.operators.plugin import apply_plugin, min_total_plugin


def test_plugin_veto(spark):
    rows = [(0, "g1", [5, 0, 2]), (0, "g2", [1, 1, 0]), (1, "g3", [10, 10, 10])]
    m = spark.createDataFrame(rows, ["part_id", "kgram", "counts"])
    kept = {r.kgram for r in apply_plugin(m, min_total_plugin(7)).collect()}
    assert kept == {"g1", "g3"}


def test_plugin_custom_transformless_filter(spark):
    m = spark.createDataFrame([(0, "aa", [1]), (0, "ab", [1])], ["part_id", "kgram", "counts"])
    kept = {r.kgram for r in apply_plugin(m, lambda kg, c: np.char.startswith(kg.astype(str), "aa")).collect()}
    assert kept == {"aa"}


def test_partitioner_save_load(tmp_path):
    p = str(tmp_path / "repart.json")
    save_partitioner(p, {"k1": [0, 2], "k2": [1]}, k=8, m=4, nb_partitions=8)
    assert load_partitioner(p, 8, 4, 8) == {"k1": [0, 2], "k2": [1]}
    with pytest.raises(ValueError):
        load_partitioner(p, 9, 4, 8)
    with pytest.raises(ValueError):
        load_partitioner(p, 8, 4, 16)


def test_streaming_hll_matches_batch(spark, sf_dir, tmp_path):
    from pyspark.sql import functions as F

    from kmtricks_spark.operators.count import count_kgrams
    from kmtricks_spark.sketches import hll
    from kmtricks_spark.streaming.count_stream import stream_docs, streaming_hll

    cfg = KmConfig(k=8, hard_min=1)
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet")).limit(120)
    sdir = str(tmp_path / "sin")
    docs.select("doc_id", "text", "lang", "source", "n_chars").coalesce(3).write.parquet(sdir)

    state = {}
    streaming_hll(stream_docs(spark, sdir, max_files=1), cfg, state, ckpt_dir=str(tmp_path / "ck"))

    exact = {
        r.sample_id: r.d
        for r in count_kgrams(spark.read.parquet(sdir), cfg)
        .groupBy("sample_id")
        .agg(F.countDistinct("kgram").alias("d"))
        .collect()
    }
    assert set(state) == set(exact)
    for s, d in exact.items():
        est = hll.estimate(state[s])
        assert abs(est - d) / max(d, 1) < 0.08, (s, est, d)
