"""Round-2 additions: sampled repartition wiring, CLI post-ops,
bloom modes in the pipeline, dedup edge/scale fixes."""

import json
import os
import subprocess
import sys

import pytest
from pyspark.sql import functions as F

from kmtricks_spark import KmConfig
from kmtricks_spark.operators.count import count_kgrams
from kmtricks_spark.operators.dedup import (
    minhash_lsh_pairs,
    minhash_signatures,
    ngram_jaccard_pairs,
)
from kmtricks_spark.plans.pipeline import Pipeline

CFG = KmConfig(k=8, hard_min=2, soft_min=1, recurrence_min=1, nb_partitions=8,
               bloom_bits=1 << 18)


@pytest.fixture(scope="module")
def zipf_docs(spark):
    """A corpus with one extremely hot shingle (Zipf-1 stand-in)."""
    hot = "HOTGRAM! " * 400
    rows = [(f"s{i % 4}", hot + f"unique text body number {i} with tail {i * 7}")
            for i in range(64)]
    return spark.createDataFrame(rows, ["source", "text"])


def test_sampled_counts_equal_static(spark, zipf_docs):
    """repartition_type only moves rows between part_ids — count VALUES
    are identical to the static path."""
    static = count_kgrams(zipf_docs, CFG).select("sample_id", "kgram", "count")
    sampled = count_kgrams(
        zipf_docs, CFG.with_(repartition_type="sampled")
    ).select("sample_id", "kgram", "count")
    assert static.exceptAll(sampled).count() == 0
    assert sampled.exceptAll(static).count() == 0


def test_sampled_one_part_per_kgram(spark, zipf_docs):
    c = count_kgrams(zipf_docs, CFG.with_(repartition_type="sampled"))
    multi = (
        c.groupBy("kgram").agg(F.countDistinct("part_id").alias("n"))
        .where(F.col("n") > 1).count()
    )
    assert multi == 0


def test_pipeline_sampled_persists_and_reuses(spark, zipf_docs, tmp_path):
    inp = str(tmp_path / "zipf.parquet")
    zipf_docs.write.parquet(inp)
    rd = str(tmp_path / "run_sampled")
    cfg = CFG.with_(repartition_type="sampled")
    Pipeline(spark, cfg, rd, inp, until="counts").run()
    pfile = os.path.join(rd, "partitioner.json")
    assert os.path.exists(pfile)
    rec = json.load(open(pfile))
    assert rec["nb_partitions"] == cfg.nb_partitions and rec["hot_map"]

    # reuse in a second run via repart_from -> identical part assignment
    rd2 = str(tmp_path / "run_reuse")
    Pipeline(spark, CFG, rd2, inp, until="counts", repart_from=pfile).run()
    a = spark.read.parquet(os.path.join(rd, "counts")).select("kgram", "part_id")
    b = spark.read.parquet(os.path.join(rd2, "counts")).select("kgram", "part_id")
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0

    # compat refusal: different P must raise (task.hpp:136-147 analogue)
    with pytest.raises(ValueError, match="mismatch"):
        Pipeline(
            spark, CFG.with_(nb_partitions=16), str(tmp_path / "bad"), inp,
            until="counts", repart_from=pfile,
        ).run()


def test_pipeline_bloom_modes(spark, sf_dir, tmp_path):
    inp = os.path.join(sf_dir, "documents.parquet")
    for mode in ("bft", "bfc"):
        rd = str(tmp_path / f"run_{mode}")
        Pipeline(spark, CFG.with_(bloom_mode=mode), rd, inp).run()
        t = spark.read.parquet(os.path.join(rd, "bloom"))
        assert t.count() > 0
        if mode == "bft":
            assert "bitmap" in t.columns
            assert os.path.exists(os.path.join(rd, "bloom_filters"))
        else:
            assert "packed" in t.columns


_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _cli(args, timeout=300):
    env = {**os.environ, "SPARK_GRAFT_CPUS": "8"}
    r = subprocess.run(
        [sys.executable, "-m", "kmtricks_spark.cli", *args],
        capture_output=True, text=True, timeout=timeout, env=env, cwd=_REPO,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    return [l for l in r.stdout.splitlines() if l.startswith("{")][-1]


def test_cli_post_ops_roundtrip(tmp_path, sf_dir):
    inp = os.path.join(sf_dir, "documents.parquet")
    common = ["--kmer-size", "8", "--hard-min", "2", "--nb-partitions", "4",
              "--bloom-size", "65536", "--cores", "8"]
    rd_a, rd_b = str(tmp_path / "a"), str(tmp_path / "b")
    _cli(["pipeline", "--input", inp, "--run-dir", rd_a, "--until", "matrix", *common])
    _cli(["pipeline", "--input", inp, "--run-dir", rd_b, "--until", "matrix",
          "--soft-min", "3", *common])

    out = str(tmp_path / "agg.parquet")
    rec = json.loads(_cli(["aggregate", "--run-dir", rd_a, "--sorted",
                           "--output", out, "--cores", "8"]))
    assert rec["rows"] > 0

    out2 = str(tmp_path / "comb.parquet")
    rec2 = json.loads(_cli(["combine", "--run-dir", rd_a, "--other", rd_b,
                            "--output", out2, "--cores", "8"]))
    assert rec2["rows"] > 0

    # filter: key sample = first sample's counts from run A
    import pyspark.sql as pqs  # noqa: F401
    from kmtricks_spark import get_spark

    s = get_spark(cores=8)
    counts = s.read.parquet(os.path.join(rd_a, "counts"))
    first = counts.select("sample_id").orderBy("sample_id").first()[0]
    key_path = str(tmp_path / "key.parquet")
    counts.where(F.col("sample_id") == first).select("kgram", "count").write.parquet(key_path)
    out3 = str(tmp_path / "filt.parquet")
    rec3 = json.loads(_cli(["filter", "--run-dir", rd_a, "--key-counts", key_path,
                            "--out-mode", "v", "--output", out3, "--cores", "8"]))
    assert rec3["rows"] == s.read.parquet(os.path.join(rd_a, "matrix")).count()


def test_spark_submit_pyfiles(tmp_path, sf_dir):
    """North-rule launch shape: spark-submit --py-files <zip> — the engine
    must import from the shipped zip alone (the driver script lives in
    tools/, which does not contain the package)."""
    import shutil

    submit = shutil.which("spark-submit") or "/opt/spark/bin/spark-submit"
    if not os.path.exists(submit):
        pytest.skip("spark-submit binary not on this host")
    zip_path = os.path.join(_REPO, "dist", "kmtricks_spark.zip")
    if not os.path.exists(zip_path):
        subprocess.run(["bash", "tools/make_pyfiles.sh"], cwd=_REPO, check=True)
    r = subprocess.run(
        [submit, "--master", "local[8]",
         "--py-files", zip_path, os.path.join(_REPO, "tools", "submit_smoke.py"),
         os.path.join(sf_dir, "documents.parquet"), str(tmp_path / "run")],
        capture_output=True, text=True, timeout=300, cwd=str(tmp_path),
    )
    assert r.returncode == 0, r.stderr[-2000:]
    rec = json.loads([l for l in r.stdout.splitlines() if l.startswith("{")][-1])
    assert rec["status"] == {"counts": "done"} and rec["count_rows"] > 0


def test_cli_repart_and_infos(tmp_path, sf_dir):
    inp = os.path.join(sf_dir, "documents.parquet")
    rd = str(tmp_path / "rep")
    rec = json.loads(_cli(["repart", "--input", inp, "--run-dir", rd,
                           "--nb-partitions", "8", "--cores", "8"]))
    assert rec["hot_keys"] > 0 and os.path.exists(rec["path"])
    rd2 = str(tmp_path / "run")
    _cli(["pipeline", "--input", inp, "--run-dir", rd2, "--until", "counts",
          "--nb-partitions", "8", "--repart-from", rec["path"], "--cores", "8"])
    info = json.loads(_cli(["infos", "--run-dir", rd2]))
    assert info["stages"]["counts"]["output_rows"] > 0


def test_ngram_short_docs_and_max_df(spark):
    rows = [(1, "just two"), (2, "a b c d e common x"), (3, "a b c d e common y")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    # short doc contributes no grams, no crash
    got = ngram_jaccard_pairs(df, n=3, min_jaccard=0.1).collect()
    assert {(r.a, r.b) for r in got} == {(2, 3)}
    # universal gram capped -> pair count bounded
    uni = [(i, f"the same lead tokens u{i} v{i} w{i}") for i in range(30)]
    ud = spark.createDataFrame(uni, ["doc_id", "text"])
    uncapped = ngram_jaccard_pairs(ud, n=3, min_jaccard=0.0).count()
    capped = ngram_jaccard_pairs(ud, n=3, min_jaccard=0.0, max_df=3).count()
    assert uncapped == 30 * 29 // 2 and capped == 0


def test_sampled_bytes_mode_and_dna(spark, zipf_docs):
    """Review regressions: the sampling pre-pass must mirror the count
    path's kgram representation (bytes mode, DNA canonicalization)."""
    bcfg = CFG.with_(kgram_as_string=False, repartition_type="sampled")
    a = count_kgrams(zipf_docs, bcfg).select("sample_id", "kgram", "count")
    b = count_kgrams(zipf_docs, CFG.with_(kgram_as_string=False)).select(
        "sample_id", "kgram", "count"
    )
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0

    dna = spark.createDataFrame(
        [("s0", "ACGTACGTACGT" * 40), ("s1", "TTTTACGTACGT" * 40)], ["source", "text"]
    )
    dcfg = CFG.with_(alphabet="dna", repartition_type="sampled", hard_min=1)
    x = count_kgrams(dna, dcfg).select("sample_id", "kgram", "count")
    y = count_kgrams(dna, dcfg.with_(repartition_type="static")).select(
        "sample_id", "kgram", "count"
    )
    assert x.exceptAll(y).count() == 0 and y.exceptAll(x).count() == 0
    # sampled routing actually engaged: hot canonical kgrams must appear
    # in the map (keys in canonical form, else the join would miss)
    from kmtricks_spark.operators.partitioner import sample_kgram_hot_map

    hm = sample_kgram_hot_map(dna, dcfg, fraction=1.0, top=16)

    def canon(s):  # min(kmer, revcomp) under the A<C<T<G encoding order
        enc = str.maketrans("ACTG", "0123")
        rc = s.translate(str.maketrans("ACGT", "TGCA"))[::-1]
        return s if s.translate(enc) <= rc.translate(enc) else rc

    assert hm and all(canon(k) == k for k in hm)


def test_partitioner_bytes_keys_roundtrip(tmp_path):
    from kmtricks_spark.operators.partitioner import load_partitioner, save_partitioner

    p = str(tmp_path / "part.json")
    hm = {b"ACGTACGT": [3], b"\x00\xffbin": [1]}
    save_partitioner(p, hm, k=8, m=4, nb_partitions=8)
    assert load_partitioner(p, 8, 4, 8) == hm


def test_arrow_sampled_raises(spark, zipf_docs):
    with pytest.raises(ValueError, match="arrow"):
        count_kgrams(zipf_docs, CFG.with_(method="arrow", repartition_type="sampled"))


def test_frame_sample_zero_duration(spark):
    from kmtricks_spark.operators.multimodal import MEDIA_SCHEMA, frame_sample

    rows = [(1, "video", bytearray(b"FRMS\x00\x00\x00\x00"), "video/x-frames", 1, 1, 0)]
    df = spark.createDataFrame(rows, MEDIA_SCHEMA)
    got = frame_sample(df, every_ms=500).collect()
    assert [r.frame_ts_ms for r in got] == [0]


def test_repart_compat_placement_provenance(tmp_path):
    from kmtricks_spark.operators.matrix_ops import check_repart_compat

    base = {"k": 8, "m": 4, "nb_partitions": 8}
    # static + static: fine
    check_repart_compat({**base, "repartition_type": "static"},
                        {**base, "repartition_type": "static"})
    # sampled vs static: refused
    with pytest.raises(ValueError, match="repartition_type"):
        check_repart_compat({**base, "repartition_type": "sampled"},
                            {**base, "repartition_type": "static"})
    # two independently-sampled runs: refused
    with pytest.raises(ValueError, match="share"):
        check_repart_compat({**base, "repartition_type": "sampled", "repart_from": None},
                            {**base, "repartition_type": "sampled", "repart_from": None})
    # B reused A's own map: accepted
    check_repart_compat(
        {**base, "repartition_type": "sampled", "repart_from": None},
        {**base, "repartition_type": "sampled",
         "repart_from": str(tmp_path / "runA" / "partitioner.json")},
        dir_a=str(tmp_path / "runA"), dir_b=str(tmp_path / "runB"),
    )


def test_auto_partitions(spark, sf_dir):
    from kmtricks_spark.config import auto_partitions, input_bytes

    inp = os.path.join(sf_dir, "documents.parquet")
    assert input_bytes(spark, inp) > 0
    # small input -> reference floor of 4 (task.hpp:112-115)
    assert auto_partitions(spark, inp) == 4
    # tiny byte budget -> scales up, capped
    assert auto_partitions(spark, inp, bytes_per_partition=1024) > 4
    assert auto_partitions(spark, inp, bytes_per_partition=1, cap=64) == 64


def test_stateful_streaming_hll_equals_batch(spark, sf_dir, tmp_path):
    """HLL payload as Spark-managed state across micro-batches: the final
    estimate must EQUAL the batch computation (register-max is
    order/batching-independent)."""
    from kmtricks_spark.sketches.spark import hll_estimate_col, sketch_agg
    from kmtricks_spark.streaming.count_stream import (
        run_available_now,
        stateful_streaming_hll,
        stream_docs,
    )

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    src = str(tmp_path / "docs_stream")
    docs.repartition(3).write.parquet(src)

    cfg = KmConfig(k=8, hard_min=1)
    stream = stateful_streaming_hll(stream_docs(spark, src, max_files=1), cfg, p=12)
    run_available_now(stream, "hll_state_test", output_mode="update")
    # LATEST row per group (estimate is not monotone across the
    # linear-counting/raw estimator switch; `updates` orders revisions)
    got = spark.sql(
        """
        select sample_id, est as est from (
          select sample_id, est_distinct as est,
                 row_number() over (partition by sample_id order by updates desc) rn
          from hll_state_test
        ) where rn = 1
        """
    ).collect()
    assert len(got) > 0

    from kmtricks_spark.functions.shingles import kgrams_sql

    hashed = kgrams_sql(docs, cfg).select("sample_id", F.xxhash64("kgram").alias("h"))
    batch = {
        r["sample_id"]: r["est"]
        for r in sketch_agg(hashed, ["sample_id"], "h", "hll", p=12)
        .select("sample_id", hll_estimate_col().alias("est"))
        .collect()
    }
    for r in got:
        assert abs(r["est"] - batch[r["sample_id"]]) < 1e-9, r


def test_gopher_filters_flags(spark):
    from kmtricks_spark.functions.text import gopher_filters

    good = "the quick brown fox jumps over a lazy dog and " * 8  # 80 words, stopwords
    rows = [
        (1, good),
        (2, "short doc"),                          # word count fails
        (3, ("#@! " * 80)),                        # symbols/alpha fail
    ]
    out = {r.doc_id: r for r in gopher_filters(
        spark.createDataFrame(rows, ["doc_id", "text"])).collect()}
    assert out[1].keep == 1
    assert out[2].ok_word_count == 0 and out[2].keep == 0
    assert out[3].ok_alpha_ratio == 0 and out[3].ok_symbol_ratio == 0 and out[3].keep == 0


def test_tfidf_top_terms_ranking(spark):
    from kmtricks_spark.functions.text import tfidf_top_terms

    rows = [
        (1, "apple apple apple shared shared common"),
        (2, "banana banana shared common common common"),
        (3, "cherry common shared shared shared shared"),
    ]
    out = tfidf_top_terms(spark.createDataFrame(rows, ["doc_id", "text"]), top=1).collect()
    top = {r.doc_id: r.term for r in out}
    # tf*idf with idf = ln((N+1)/(df+1))+1: apple 3*ln(2)+3=5.08,
    # banana 2*1.69=3.39, and for doc 3 'shared'x4 (df=3, idf=1.0) = 4.0
    # beats the unique 'cherry' (1.69) — frequency can outweigh rarity
    assert top == {1: "apple", 2: "banana", 3: "shared"}
    assert all(r.rank == 1 for r in out)


def test_repetition_stats_values(spark):
    from kmtricks_spark.functions.text import repetition_stats

    rows = [
        (1, "a b a b a b"),   # 2-grams: [a b, b a, a b, b a, a b] -> top 3/5; 3-grams all dup (aba x2? )
        (2, "x y z w"),       # all 2/3-grams unique -> top2 1/3, dup3 0
        (3, "solo"),          # no grams -> 0, 0
    ]
    out = {r.doc_id: r for r in repetition_stats(
        spark.createDataFrame(rows, ["doc_id", "text"])).collect()}
    assert out[1].top2gram_frac == 0.6          # 'a b' 3 of 5
    # 3-grams of doc1: 'a b a','b a b','a b a','b a b' -> all duplicated
    assert out[1].dup3gram_frac == 1.0
    assert out[2].top2gram_frac == round(1 / 3, 6) and out[2].dup3gram_frac == 0.0
    assert out[3].top2gram_frac == 0.0 and out[3].dup3gram_frac == 0.0


def test_minhash_short_docs_not_aliased(spark):
    rows = [(1, "cat"), (2, "dog"), (3, "xy"), (4, "cat")]
    sigs = minhash_signatures(spark.createDataFrame(rows, ["doc_id", "text"]))
    pairs = minhash_lsh_pairs(sigs, bands=16, rows_per_band=8, min_jaccard=0.8)
    assert {(r.a, r.b, r.est_jaccard) for r in pairs.collect()} == {(1, 4, 1.0)}
