"""Merge-filter truth table (≙ reference merge.hpp:183-260 semantics and
merge_test.cpp golden cardinalities), on hand-built count tables covering
every soft-min / share-min (rescue) / recurrence-min branch."""

import pytest

from kmtricks_spark import KmConfig
from kmtricks_spark.operators.merge import (
    count_matrix,
    merge_stats,
    merged_long,
    pa_matrix,
)

SAMPLES = ["A", "B", "C"]

# (kgram, sample, count): soft_min=3, share_min=2, r_min=2
ROWS = [
    ("g1", "A", 5), ("g1", "B", 4), ("g1", "C", 1),   # A,B solid; C rescued (solid_in=2>=2)
    ("g2", "A", 2), ("g2", "B", 2),                   # nothing solid -> dropped by r_min
    ("g3", "A", 9),                                   # solid only in A -> dropped by r_min=2
    ("g4", "A", 3), ("g4", "B", 3), ("g4", "C", 3),   # all solid
    ("g5", "A", 10), ("g5", "B", 1),                  # solid_in=1 -> dropped; B not rescued
]
CFG = KmConfig(soft_min=3, share_min=2, recurrence_min=2)

# expected surviving long rows
EXPECTED = {
    ("g1", "A", 5), ("g1", "B", 4), ("g1", "C", 1),
    ("g4", "A", 3), ("g4", "B", 3), ("g4", "C", 3),
}


@pytest.fixture(scope="module")
def counts(spark):
    return spark.createDataFrame(
        [(0, s, g, c) for (g, s, c) in ROWS], ["part_id", "sample_id", "kgram", "count"]
    )


def test_merged_long_truth_table(counts):
    got = {(r.kgram, r.sample_id, r["count"]) for r in merged_long(counts, CFG).collect()}
    assert got == EXPECTED


def test_no_rescue_when_share_min_zero(counts):
    cfg = CFG.with_(share_min=0)
    got = {(r.kgram, r.sample_id, r["count"]) for r in merged_long(counts, cfg).collect()}
    assert got == EXPECTED - {("g1", "C", 1)}


def test_count_matrix_rows(counts):
    m = {r.kgram: list(r.counts) for r in count_matrix(counts, SAMPLES, CFG).collect()}
    assert m == {"g1": [5, 4, 1], "g4": [3, 3, 3]}


def test_pa_matrix(counts):
    m = {r.kgram: list(r.bits) for r in pa_matrix(counts, SAMPLES, CFG).collect()}
    assert m == {"g1": [True, True, True], "g4": [True, True, True]}


def test_recurrence_one_keeps_solo(counts):
    cfg = CFG.with_(recurrence_min=1, share_min=0)
    got = {(r.kgram, r.sample_id) for r in merged_long(counts, cfg).collect()}
    assert ("g3", "A") in got and ("g5", "A") in got
    assert ("g5", "B") not in got  # non-solid, no rescue
    assert ("g2", "A") not in got  # no solid sample at all -> row dropped


def test_merge_stats(counts):
    st = {r.sample_id: r.asDict() for r in merge_stats(counts, CFG).collect()}
    # A: g1 solid, g2 non, g3 solid, g4 solid, g5 solid -> non_solid=1, uniq_wo=4
    assert st["A"]["non_solid"] == 1 and st["A"]["uniq_wo_rescue"] == 4
    assert st["A"]["total_wo_rescue"] == 5 + 9 + 3 + 10
    # C: g1 non-solid rescued, g4 solid
    assert st["C"]["non_solid"] == 1 and st["C"]["rescued"] == 1
    assert st["C"]["uniq_w_rescue"] == 2 and st["C"]["total_w_rescue"] == 4
    # B: g1 solid, g2 non, g4 solid, g5 non (not rescued: solid_in=1 < 2)
    assert st["B"]["non_solid"] == 2 and st["B"]["rescued"] == 0
    assert st["B"]["total_wo_rescue"] == 7


def test_per_sample_soft_min(spark):
    cfg = KmConfig(soft_min=3, soft_min_by_sample={"B": 1}, recurrence_min=1, share_min=0)
    counts = spark.createDataFrame(
        [(0, "A", "g", 2), (0, "B", "g", 2)], ["part_id", "sample_id", "kgram", "count"]
    )
    got = {(r.sample_id, r["count"]) for r in merged_long(counts, cfg).collect()}
    assert got == {("B", 2)}  # B's threshold overridden to 1; A stays non-solid
