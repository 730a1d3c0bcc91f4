"""Post-processing over matrix tables: combine / filter / aggregate.

Reference parity (SURVEY §2.5 J8-J10, §3.3):
* combine  — horizontal merge of matrices from different runs
  (matrix.hpp:395-460, cmd.hpp:370-437): full-outer on kgram, count
  vectors concatenated with zero-fill.
* filter   — join a new sample's counts against an existing matrix
  (matrix.hpp:23-341, cmd.hpp:608-724); output modes m (matrix + new
  column), k (kgrams only in the key sample = anti-join), v (the key
  sample's vector aligned to matrix order = left join).
* aggregate — vertical union of per-partition matrices, optionally
  globally sorted (cmd.hpp:440-606).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def check_repart_compat(
    params_a: dict, params_b: dict, dir_a: str | None = None, dir_b: str | None = None
) -> None:
    """Combine/filter require both runs to share the partitioning config
    — the reference refuses otherwise (task.hpp:136-147). Beyond k/m/P,
    the PLACEMENT provenance must agree: a sampled run's part_ids follow
    its hot map, so mixing it with a static run (or a differently-sampled
    one) silently violates the one-partition-per-kgram invariant for
    downstream bloom/restrict consumers. Two sampled runs are compatible
    only when they demonstrably share one map: equal --repart-from
    realpaths, one side's repart_from resolving to the other run's own
    partitioner.json, or byte-identical partitioner.json contents (runs
    that each copied the same source map)."""
    import hashlib
    import os

    for key in ("k", "m", "nb_partitions", "repartition_type"):
        if str(params_a.get(key)) != str(params_b.get(key)):
            raise ValueError(
                f"incompatible runs: {key}={params_a.get(key)!r} vs {params_b.get(key)!r}"
            )
    if str(params_a.get("repartition_type")) == "sampled":
        def own_map(d):
            return os.path.realpath(os.path.join(d, "partitioner.json")) if d else None

        def content_hash(p):
            try:
                with open(p, "rb") as f:
                    return hashlib.md5(f.read()).hexdigest()
            except (OSError, TypeError):
                return None

        ra, rb = params_a.get("repart_from"), params_b.get("repart_from")
        ra = os.path.realpath(str(ra)) if ra and str(ra) != "None" else None
        rb = os.path.realpath(str(rb)) if rb and str(rb) != "None" else None
        # effective map of each run: its own copy if present, else its
        # repart_from source (repart-from runs copy the map into their run
        # dir now, but older runs may predate that)
        ma = own_map(dir_a) if dir_a and os.path.exists(own_map(dir_a)) else ra
        mb = own_map(dir_b) if dir_b and os.path.exists(own_map(dir_b)) else rb
        ha, hb = content_hash(ma), content_hash(mb)
        shared = (
            (ra is not None and ra == rb)
            or (rb is not None and rb == own_map(dir_a))
            or (ra is not None and ra == own_map(dir_b))
            or (ha is not None and ha == hb)
        )
        if not shared:
            raise ValueError(
                "incompatible runs: both are 'sampled' but do not share a "
                "hot map — re-run one with --repart-from pointing at the "
                f"other's partitioner.json (got {ra!r} vs {rb!r})"
            )


def combine(a: DataFrame, b: DataFrame, width_a: int, width_b: int) -> DataFrame:
    """J8: full-outer join on kgram; absent side zero-filled.

    `a`/`b`: (part_id, kgram, counts array<long>). Requires the same
    partitioning function on both runs, as the reference enforces
    (task.hpp:136-147) — validate with check_repart_compat on the runs'
    lineage params; part_id is carried from whichever side is present.
    """
    zeros_a = F.array_repeat(F.lit(0).cast("long"), width_a)
    zeros_b = F.array_repeat(F.lit(0).cast("long"), width_b)
    return (
        a.alias("a")
        .join(b.alias("b"), on="kgram", how="full_outer")
        .select(
            F.coalesce(F.col("a.part_id"), F.col("b.part_id")).alias("part_id"),
            F.col("kgram"),
            F.concat(
                F.coalesce(F.col("a.counts"), zeros_a),
                F.coalesce(F.col("b.counts"), zeros_b),
            ).alias("counts"),
        )
    )


def filter_matrix(matrix: DataFrame, key_counts: DataFrame, out: str = "m") -> DataFrame:
    """J9: merge a new sample (key_counts: kgram, count) into/against a matrix.

    out='m': inner join, matrix row + appended new-sample count column.
    out='k': kgrams present only in the key sample (anti-join).
    out='v': key-sample count aligned to matrix order (left join, 0-fill).
    """
    key = key_counts.select("kgram", F.col("count").alias("key_count"))
    if out == "m":
        j = matrix.join(key, "kgram", "inner")
        return j.select(
            "part_id",
            "kgram",
            F.concat(F.col("counts"), F.array(F.col("key_count"))).alias("counts"),
        )
    if out == "k":
        return key.join(matrix.select("kgram"), "kgram", "left_anti").select(
            "kgram", F.col("key_count").alias("count")
        )
    if out == "v":
        j = matrix.join(key, "kgram", "left")
        return j.select(
            "part_id", "kgram", F.coalesce("key_count", F.lit(0)).alias("key_count")
        )
    raise ValueError(f"unknown filter output mode: {out!r}")


def aggregate(parts: list[DataFrame], sorted_output: bool = False) -> DataFrame:
    """J10: union per-partition matrices; --sorted => global orderBy."""
    df = parts[0]
    for p in parts[1:]:
        df = df.unionByName(p)
    return df.orderBy("kgram") if sorted_output else df
