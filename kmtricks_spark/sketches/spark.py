"""Spark glue for the sketch kernels: partial -> merge -> final.

Shape (the same contract a JVM Aggregator would have, but Arrow-side):

1. ``sketch_partials``: mapInPandas — each task turns its Arrow batches
   into one payload per (group x batch). Raw rows never shuffle; only
   fixed-size payloads do. Inputs are a 64-bit hash column for hll/cms
   (compute it JVM-side with F.xxhash64 so the scan stays in codegen) or
   a numeric column for kll/tdigest.
2. ``sketch_merge``: groupBy(group).applyInPandas — associative payload
   merge to one row per group. For very high-cardinality groups add an
   intermediate salted merge level; payload counts are tiny (tasks x
   groups), so a single reduce level is usually right.
3. finalize helpers (estimate / quantiles) as scalar pandas UDFs.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    StructField,
    StructType,
)

from kmtricks_spark.sketches import cms, hll, kll, tdigest


class _Adapter:
    def __init__(self, mod, hashed: bool, add):
        self.mod, self.hashed, self._add = mod, hashed, add

    def build(self, values: np.ndarray, params: dict):
        st = self.mod.create(**params)
        return self._add(self.mod, st, values)

    def merge_payloads(self, payloads: list[bytes]) -> bytes:
        state = self.mod.deserialize(payloads[0])
        for p in payloads[1:]:
            state = self.mod.merge(state, self.mod.deserialize(p))
        return self.mod.serialize(state)


def _add_hashed(mod, st, vals):
    return mod.add_hashes(st, vals.astype(np.int64).view(np.uint64))


def _add_float(mod, st, vals):
    return mod.add_values(st, vals.astype(np.float64))


ADAPTERS = {
    "hll": _Adapter(hll, True, _add_hashed),
    "cms": _Adapter(cms, True, _add_hashed),
    "kll": _Adapter(kll, False, _add_float),
    "tdigest": _Adapter(tdigest, False, _add_float),
}


def sketch_partials(
    df: DataFrame, group_cols: list[str], value_col: str, kind: str, **params
) -> DataFrame:
    """One payload row per (group, Arrow batch): (group..., payload)."""
    ad = ADAPTERS[kind]
    fields = [df.schema[c] for c in group_cols]
    schema = StructType(list(fields) + [StructField("payload", BinaryType())])

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for key, grp in pdf.groupby(group_cols, sort=False):
                key = key if isinstance(key, tuple) else (key,)
                st = ad.build(grp[value_col].to_numpy(), params)
                rows.append((*key, ad.mod.serialize(st)))
            yield pd.DataFrame(rows, columns=group_cols + ["payload"])

    return df.select(*group_cols, value_col).mapInPandas(gen, schema=schema)


def _merge_level(partials: DataFrame, keys: list[str], kind: str) -> DataFrame:
    ad = ADAPTERS[kind]
    schema = StructType(
        [partials.schema[c] for c in keys] + [StructField("payload", BinaryType())]
    )

    def reduce_group(key, pdf):
        merged = ad.merge_payloads(list(pdf["payload"]))
        return pd.DataFrame([(*key, merged)], columns=keys + ["payload"])

    return partials.groupBy(*keys).applyInPandas(reduce_group, schema=schema)


def sketch_merge(
    partials: DataFrame, group_cols: list[str], kind: str, salt_buckets: int | None = None
) -> DataFrame:
    """Reduce payloads to one per group (associative merge).

    With few distinct groups, a single-level merge funnels EVERY partial
    of a group through one reducer task — at 10^12 input rows that is
    millions of payloads in one task. ``salt_buckets=B`` adds an
    intermediate level: groupBy(group, salt) first (B-way fan-in per
    group; salt = hash of the payload bytes, deterministic), then the
    final groupBy(group) merges exactly <=B payloads. Associativity makes
    the result byte-identical for hll/cms (register-max / cell-sum) and
    bound-equivalent for kll/t-digest (tested both ways)."""
    if salt_buckets and salt_buckets > 1:
        from kmtricks_spark.operators.partitioner import with_salt

        salted = with_salt(partials, salt_buckets, cols=["payload"])
        partials = _merge_level(salted, group_cols + ["salt"], kind)
    return _merge_level(partials, group_cols, kind)


def sketch_agg(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    kind: str,
    salt_buckets: int | None = None,
    **params,
) -> DataFrame:
    """partials + merge in one call: one payload row per group. Pass
    salt_buckets when group cardinality is small relative to input size
    (the two-level merge is the scale path for global/low-cardinality
    sketches)."""
    return sketch_merge(
        sketch_partials(df, group_cols, value_col, kind, **params),
        group_cols,
        kind,
        salt_buckets=salt_buckets,
    )


# ------------------------------------------------------------- finalizers

def hll_estimate_col(payload_col: str = "payload"):
    @F.pandas_udf(DoubleType())
    def _est(p: pd.Series) -> pd.Series:
        return p.map(lambda b: float(hll.estimate(hll.deserialize(b))))

    return _est(F.col(payload_col))


def kll_quantiles_col(qs: list[float], payload_col: str = "payload"):
    @F.pandas_udf(ArrayType(DoubleType()))
    def _q(p: pd.Series) -> pd.Series:
        return p.map(lambda b: [kll.quantile(kll.deserialize(b), q) for q in qs])

    return _q(F.col(payload_col))


def tdigest_quantiles_col(qs: list[float], payload_col: str = "payload"):
    @F.pandas_udf(ArrayType(DoubleType()))
    def _q(p: pd.Series) -> pd.Series:
        return p.map(lambda b: [tdigest.quantile(tdigest.deserialize(b), q) for q in qs])

    return _q(F.col(payload_col))


def kll_rank_rows(
    agg: DataFrame, group_cols: list[str], probes: list[float]
) -> DataFrame:
    """Explode KLL rank estimates (fraction of items <= probe) to scalar
    rows (group..., probe, rank). With k >= n (no compaction) the rank is
    EXACTLY count(x <= probe)/n — double division of the same integers is
    bit-identical across engines, so this hash-matches a SQL oracle."""
    @F.pandas_udf(ArrayType(DoubleType()))
    def _r(p: pd.Series) -> pd.Series:
        return p.map(lambda b: [kll.rank(kll.deserialize(b), x) for x in probes])

    p_arr = F.array(*[F.lit(float(x)) for x in probes])
    return (
        agg.select(*group_cols, F.posexplode(_r(F.col("payload"))).alias("pos", "rank"))
        .withColumn("probe", F.element_at(p_arr, F.col("pos") + 1))
        .select(*group_cols, "probe", "rank")
    )


def quantile_rows(
    agg: DataFrame, group_cols: list[str], qs: list[float], kind: str = "kll",
    value_name: str = "quantile",
) -> DataFrame:
    """Explode sketch quantiles to scalar rows (group..., q, value).

    Scalar shape keeps downstream consumers (and the driver's result
    canonicalizer) array-free. Exactness note: a KLL with k >= n never
    compacts, so its quantile is the exact order statistic
    sorted[max(ceil(q*n), 1)] — with binary-exact q fractions this is
    deterministically comparable against an ANSI-SQL row_number oracle.
    """
    col = {"kll": kll_quantiles_col, "tdigest": tdigest_quantiles_col}[kind]
    q_arr = F.array(*[F.lit(float(q)) for q in qs])
    return (
        agg.select(*group_cols, F.posexplode(col(qs)).alias("pos", value_name))
        .withColumn("q", F.element_at(q_arr, F.col("pos") + 1))
        .select(*group_cols, "q", value_name)
    )


def cms_query_driver(payload: bytes, hashes: np.ndarray) -> np.ndarray:
    """Point queries against a collected CMS payload (driver-side)."""
    return cms.query(cms.deserialize(payload), hashes.astype(np.int64).view(np.uint64))
