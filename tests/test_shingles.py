"""Shingling goldens: exact k-gram multisets, byte-identical extraction,
arrow-vs-sql path equivalence (≙ reference kmer_test.cpp round-trips and
task_main.cpp golden counts)."""

from collections import Counter

import pytest

from kmtricks_spark import KmConfig
from kmtricks_spark.functions.shingles import kgram_partials_arrow, kgrams_sql
from kmtricks_spark.operators.count import count_kgrams


def py_kgrams(text: str, k: int) -> Counter:
    b = text.encode("utf-8")
    return Counter(b[i : i + k] for i in range(len(b) - k + 1))


@pytest.fixture(scope="module")
def tiny(spark):
    rows = [
        ("s1", "abcabcab"),
        ("s1", "zz"),  # shorter than k -> no shingles at k=4
        ("s2", "abcd abcd"),
        ("s2", "café café x"),  # multibyte UTF-8 boundary coverage
    ]
    return spark.createDataFrame(rows, ["source", "text"])


def test_golden_byte_kgrams_arrow(spark, tiny):
    cfg = KmConfig(k=4, hard_min=1, kgram_as_string=False)
    got = kgram_partials_arrow(tiny, cfg).toPandas()
    agg = {}
    for r in got.itertuples():
        key = (r.sample_id, bytes(r.kgram))
        agg[key] = agg.get(key, 0) + r.pcount
    expected = {}
    for s, t in [("s1", "abcabcab"), ("s1", "zz"), ("s2", "abcd abcd"), ("s2", "café café x")]:
        for g, c in py_kgrams(t, 4).items():
            expected[(s, g)] = expected.get((s, g), 0) + c
    assert agg == expected


def test_arrow_equals_sql_on_ascii(docs):
    cfg = KmConfig(k=8, hard_min=1)
    a = count_kgrams(docs, cfg).select("sample_id", "kgram", "count")
    b = count_kgrams(docs, cfg.with_(method="sql")).select("sample_id", "kgram", "count")
    assert a.exceptAll(b).count() == 0
    assert b.exceptAll(a).count() == 0


def test_shingle_count_identity(spark, tiny):
    # sum of counts == total windows
    cfg = KmConfig(k=4, hard_min=1, kgram_as_string=False)
    total = (
        kgram_partials_arrow(tiny, cfg).groupBy().sum("pcount").collect()[0][0]
    )
    exp = sum(
        max(len(t.encode("utf-8")) - 3, 0)
        for t in ["abcabcab", "zz", "abcd abcd", "café café x"]
    )
    assert total == exp


def test_sql_bytes_equals_arrow_on_utf8(spark, tiny):
    # byte semantics must agree between the JVM binary-substring path and
    # the numpy byte-window path, including multibyte boundaries
    cfg = KmConfig(k=4, hard_min=1, kgram_as_string=False)
    a = count_kgrams(tiny, cfg.with_(method="arrow"))
    b = count_kgrams(tiny, cfg.with_(method="sql_bytes"))
    pa = {(r.sample_id, bytes(r.kgram)): r["count"] for r in a.collect()}
    pb = {(r.sample_id, bytes(r.kgram)): r["count"] for r in b.collect()}
    assert pa == pb


def test_sql_path_rowcount(spark, tiny):
    cfg = KmConfig(k=4)
    n = kgrams_sql(tiny, cfg).count()
    # char-based: 'café café x' has 11 chars -> 8 windows
    assert n == (8 - 3) + 0 + (9 - 3) + 8


def test_sql_char_ascii_fastpath_equals_char_semantics(spark):
    """The char-mode ASCII byte-slice fast path (r6 optimization) must
    reproduce exact CHARACTER substring semantics on a mixed corpus:
    pure-ASCII docs ride the O(1) byte slice, multibyte docs the char
    fallback — both must equal the naive per-char enumeration."""
    rows = [
        ("s1", "hello world shingles"),
        ("s2", "café déjà vu münchen"),   # fallback branch
        ("s3", "mixed café and ascii"),   # fallback branch
        ("s4", "ascii only text here!"),  # fast-path branch
    ]
    df = spark.createDataFrame(rows, ["source", "text"])
    cfg = KmConfig(k=4, kgram_as_string=True, method="sql")
    got = Counter(
        (r["sample_id"], r["kgram"])
        for r in kgrams_sql(df, cfg).collect()
    )
    want = Counter(
        (s, t[i : i + 4]) for s, t in rows for i in range(len(t) - 3)
    )
    assert got == want
