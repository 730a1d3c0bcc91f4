"""Dedup + text-analysis operators: goldens on constructed inputs."""

import pytest
from pyspark.sql import functions as F

from kmtricks_spark.operators.dedup import (
    exact_dedup,
    minhash_lsh_pairs,
    minhash_signatures,
    ngram_jaccard_pairs,
    simhash,
    simhash_near_pairs,
)
from kmtricks_spark.functions.text import lang_guess, token_stats
from kmtricks_spark.operators.similarity import ann_pairs, cosine_topk, hyperplane_signatures


def test_exact_dedup(spark):
    df = spark.createDataFrame(
        [(1, "aaa"), (2, "aaa"), (3, "bbb"), (4, "aaa")], ["doc_id", "text"]
    )
    got = {r.keep_id: r.n_dups for r in exact_dedup(df).collect()}
    assert got == {1: 3, 3: 1}


def test_minhash_detects_dups_and_estimates_jaccard(spark):
    base = "the quick brown fox jumps over the lazy dog again and again " * 5
    rows = [(1, base), (2, base), (3, base.replace("dog", "cat")), (4, "completely different words entirely " * 8)]
    sigs = minhash_signatures(spark.createDataFrame(rows, ["doc_id", "text"]))
    pairs = {(r.a, r.b): r.est_jaccard for r in minhash_lsh_pairs(sigs, min_jaccard=0.3).collect()}
    assert pairs[(1, 2)] == 1.0
    assert (1, 3) in pairs and pairs[(1, 3)] > 0.3
    assert (1, 4) not in pairs and (2, 4) not in pairs


def test_simhash_near_pairs(spark):
    base = "alpha beta gamma delta epsilon zeta eta theta " * 8
    rows = [(1, base), (2, base), (3, "unrelated content " * 20)]
    sh = simhash(spark.createDataFrame(rows, ["doc_id", "text"]))
    pairs = {(r.a, r.b): r.hamming for r in simhash_near_pairs(sh, max_hamming=3).collect()}
    assert pairs.get((1, 2)) == 0
    assert (1, 3) not in pairs


def test_ngram_jaccard_golden(spark):
    # doc1/doc2 share exactly half their distinct 2-token bigrams
    rows = [(1, "a b c d"), (2, "a b c x"), (3, "p q r s")]
    got = {(r.a, r.b): r.jaccard for r in
           ngram_jaccard_pairs(spark.createDataFrame(rows, ["doc_id", "text"]),
                               n=2, min_jaccard=0.1).collect()}
    # doc1 bigrams {ab,bc,cd}, doc2 {ab,bc,cx}: inter=2, union=4 -> 0.5
    assert got == {(1, 2): 0.5}


def test_token_stats_golden(spark):
    df = spark.createDataFrame([(1, "aa bb aa")], ["doc_id", "text"])
    r = token_stats(df).collect()[0]
    assert (r.n_chars, r.n_tokens, r.n_distinct_tokens) == (8, 3, 2)
    assert r.avg_token_len == 2.0


def test_lang_guess(spark):
    df = spark.createDataFrame(
        [(1, "the cat and the dog is in a house"), (2, "le chat est dans la maison pour un moment"), (3, "xyzzy plugh")],
        ["doc_id", "text"],
    )
    got = {r.doc_id: r.lang_guess for r in lang_guess(df).collect()}
    assert got[1] == "en" and got[2] == "fr" and got[3] == "und"


def test_token_stats_subtokens(spark):
    df = spark.createDataFrame([(1, "hello, world42 !")], ["doc_id", "text"])
    r = token_stats(df).collect()[0]
    # hello , world 42 ! -> 5 BPE-ish pre-tokens
    assert r.n_subtokens == 5


def test_winnow_shared_substring_guarantee(spark):
    from kmtricks_spark.functions.text import winnow_fingerprints

    # winnowing guarantee: a shared run of >= window + k - 1 chars yields
    # at least one shared fingerprint (Schleimer et al. theorem 1)
    shared = "the common stretch of text that both documents contain entirely"
    rows = [
        (1, "prefix one " + shared + " suffix alpha"),
        (2, "totally different beginning " + shared + " and another end"),
        (3, "no overlap here at all with anything else whatsoever in text"),
    ]
    fps = winnow_fingerprints(spark.createDataFrame(rows, ["doc_id", "text"]), k=5, window=8)
    by_doc = {}
    for r in fps.collect():
        by_doc.setdefault(r.doc_id, set()).add(r.fp)
    assert by_doc[1] & by_doc[2]
    assert not (by_doc[1] & by_doc[3] & by_doc[2])


def test_cosine_topk_vs_numpy(spark):
    import numpy as np

    rng = np.random.default_rng(0)
    vecs = rng.standard_normal((50, 16))
    df = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(50)], ["vec_id", "embedding"]
    )
    q = vecs[0]
    got = [r.vec_id for r in cosine_topk(df, list(q), k=5, exclude_id=0).collect()]
    cos = vecs @ q / (np.linalg.norm(vecs, axis=1) * np.linalg.norm(q))
    cos[0] = -np.inf
    expect = list(np.argsort(-np.round(cos, 6), kind="stable")[:5])
    assert got == [int(i) for i in expect]


def test_ivf_recall_vs_brute_force(spark):
    import numpy as np

    from kmtricks_spark.operators.similarity import ivf_assign, ivf_search, ivf_train

    rng = np.random.default_rng(5)
    vecs = rng.standard_normal((300, 16))
    df = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(300)], ["vec_id", "embedding"]
    )
    cents = ivf_train(df, n_lists=8, seed=1)
    assigned = ivf_assign(df, cents).cache()
    q = vecs[7]
    got = [r.vec_id for r in ivf_search(assigned, cents, list(q), k=10, nprobe=4).collect()]
    cos = vecs @ q / (np.linalg.norm(vecs, axis=1) * np.linalg.norm(q))
    true10 = set(np.argsort(-cos)[:10])
    recall = len(set(got) & true10) / 10
    assert got[0] == 7  # the query vector itself is its own nearest
    assert recall >= 0.6, recall  # nprobe=4 of 8 lists


def test_ivf_search_batch_matches_single_and_recalls(spark):
    """Batch IVF == the single-query wrapper per query at equal nprobe;
    nprobe=n_lists returns exact brute-force top-k regardless of
    centroid placement."""
    import numpy as np

    from kmtricks_spark.operators.similarity import (
        ivf_assign,
        ivf_search,
        ivf_search_batch,
        ivf_train,
    )

    rng = np.random.default_rng(11)
    vecs = rng.standard_normal((200, 16))
    df = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(200)], ["vec_id", "embedding"]
    )
    cents = ivf_train(df, n_lists=8, seed=3)
    assigned = ivf_assign(df, cents).cache()
    queries = df.where(F.col("vec_id") < 4).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    # exact mode: nprobe = n_lists == brute force
    got = ivf_search_batch(assigned, cents, queries, k=5, nprobe=8).collect()
    by_q = {}
    for r in got:
        by_q.setdefault(r.q_id, []).append((r.rank, r.vec_id))
    for qi in range(4):
        cos = vecs @ vecs[qi] / (np.linalg.norm(vecs, axis=1) * np.linalg.norm(vecs[qi]))
        expect = list(np.argsort(-np.round(cos, 6), kind="stable")[:5])
        assert [v for _, v in sorted(by_q[qi])] == [int(i) for i in expect]
    # approximate mode agrees with the single-query wrapper
    sub = ivf_search_batch(assigned, cents, queries, k=5, nprobe=3)
    one = ivf_search(assigned, cents, [float(x) for x in vecs[2]], k=5, nprobe=3)
    batch2 = [r.vec_id for r in sub.where(F.col("q_id") == 2).orderBy("rank").collect()]
    single2 = [r.vec_id for r in one.collect()]
    assert batch2 == single2


def test_ann_pairs_find_exact_dups(spark):
    import numpy as np

    rng = np.random.default_rng(1)
    vecs = rng.standard_normal((40, 16))
    rows = [(i, [float(x) for x in vecs[i]]) for i in range(40)]
    rows += [(100 + i, [float(x) for x in vecs[i]]) for i in range(5)]  # dups
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    sigs = hyperplane_signatures(df, dim=16, bits=8)
    got = {(r.a, r.b) for r in ann_pairs(sigs, min_cosine=0.99).collect()}
    for i in range(5):
        assert (i, 100 + i) in got


def test_ann_pairs_multiprobe_recovers_hamming1_neighbors(spark):
    """multiprobe=q must surface near-dup pairs whose signatures differ in
    exactly one of the first q sign bits, which plain same-bucket joins
    miss — and must stay a superset of the multiprobe=0 result."""
    import numpy as np

    rng = np.random.default_rng(3)
    base = rng.standard_normal((30, 16))
    rows = [(i, [float(x) for x in base[i]]) for i in range(30)]
    # near-dups: tiny perturbation => high cosine but may flip one plane
    for i in range(30):
        rows.append((200 + i, [float(x) for x in base[i] + 0.05 * rng.standard_normal(16)]))
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    bits = 10
    sigs = hyperplane_signatures(df, dim=16, bits=bits).cache()
    sig_map = {r.vec_id: r.bucket for r in sigs.collect()}
    h1 = {
        (i, 200 + i)
        for i in range(30)
        if bin(sig_map[i] ^ sig_map[200 + i]).count("1") == 1
    }
    assert h1, "fixture regression: no Hamming-1 near-dup pairs to test"
    plain = {(r.a, r.b) for r in ann_pairs(sigs, min_cosine=0.9).collect()}
    probed = {(r.a, r.b) for r in ann_pairs(sigs, min_cosine=0.9, multiprobe=bits).collect()}
    assert plain <= probed
    assert h1 <= probed          # every 1-bit straddler recovered
    assert not (h1 & plain)      # ...and none of them was findable without
