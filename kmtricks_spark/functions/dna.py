"""DNA-alphabet support: reverse complement + canonical form (P2/P3).

The text engine doesn't need canonicalization (SURVEY §2.2), but the
reference's golden tests are DNA (tests/task_main.cpp) — this module lets
the same counting pipeline reproduce them, proving operator parity.

Order matters: the reference compares k-mers in 2-bit encoding A=0, C=1,
T=2, G=3 (kmer.hpp:38-49), NOT ASCII — canonical = min(kmer, revcomp)
under THAT order (kmer.hpp:531-535). We translate to '0123' digits whose
ASCII order matches the encoding before comparing. All pure Column
expressions (translate/reverse/least) — no UDF.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

ENC_FROM, ENC_TO = "ACTG", "0123"  # kmer.hpp:38-49 ordering
RC_FROM, RC_TO = "ACGT", "TGCA"    # rev_table, kmer.hpp:51-75


def revcomp(col: Column) -> Column:
    return F.reverse(F.translate(col, RC_FROM, RC_TO))


def _enc(col: Column) -> Column:
    return F.translate(col, ENC_FROM, ENC_TO)


def canonical(col: Column) -> Column:
    """min(kmer, revcomp) under the 2-bit encoding order."""
    rc = revcomp(col)
    return F.when(_enc(col) <= _enc(rc), col).otherwise(rc)


def is_valid_dna(col: Column) -> Column:
    """True iff every char is in ACGT (GATB validity mask analogue,
    kmer.hpp:77-85): translate() deletes chars mapped to nothing."""
    return F.length(F.translate(col, RC_FROM, "")) == 0


def canonicalize_kgrams(shingles: DataFrame, kgram_col: str = "kgram") -> DataFrame:
    """Filter invalid k-mers and replace each with its canonical form."""
    c = F.col(kgram_col)
    return shingles.where(is_valid_dna(c)).withColumn(kgram_col, canonical(c))
