"""Per-stage lineage metadata: the resume contract.

kmtricks persists every stage to its run directory so any (stage, sample,
partition) granularity can be re-run idempotently (kmdir.hpp:195-241,
cmd.hpp:74-272). Our equivalent: each stage writes its table plus a
lineage JSON (stage, params, input/output rows, per-partition row counts,
an order-insensitive content checksum, timestamp). A stage is *complete*
iff its lineage exists, its params match, and its table is readable —
`Pipeline.run` skips complete stages, which is exactly kill-and-rerun
resumability.
"""

from __future__ import annotations

import json
import os
import time
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

LINEAGE_DIR = "_lineage"


def content_checksum(df: DataFrame) -> int:
    """Order-insensitive 63-bit content checksum: sum of row hashes."""
    cols = [F.col(c) for c in sorted(df.columns)]
    row = df.select(F.xxhash64(*cols).alias("h"))
    v = row.agg(F.sum(F.col("h") % F.lit(2**31)).alias("s")).collect()[0]["s"]
    return int(v or 0) & ((1 << 63) - 1)


def lineage_path(run_dir: str, stage: str) -> str:
    return os.path.join(run_dir, LINEAGE_DIR, f"{stage}.json")


def write_lineage(
    run_dir: str,
    stage: str,
    params: dict[str, Any],
    out_df: DataFrame,
    input_rows: int | None = None,
    part_col: str | None = "part_id",
    extra: dict | None = None,
) -> dict:
    rows = out_df.count()
    per_part = None
    if part_col and part_col in out_df.columns:
        per_part = {
            str(r[part_col]): r["n"]
            for r in out_df.groupBy(part_col).agg(F.count(F.lit(1)).alias("n")).collect()
        }
    rec = {
        "stage": stage,
        "params": params,
        "input_rows": input_rows,
        "output_rows": rows,
        "partitions": per_part,
        "checksum": content_checksum(out_df),
        "ts": time.time(),
        **(extra or {}),
    }
    os.makedirs(os.path.join(run_dir, LINEAGE_DIR), exist_ok=True)
    with open(lineage_path(run_dir, stage), "w") as f:
        json.dump(rec, f, indent=1, default=str)
    return rec


def read_lineage(run_dir: str, stage: str) -> dict | None:
    p = lineage_path(run_dir, stage)
    if not os.path.exists(p):
        return None
    with open(p) as f:
        return json.load(f)


def stage_complete(
    spark: SparkSession, run_dir: str, stage: str, params: dict[str, Any]
) -> bool:
    """Complete = lineage exists, params match, table readable — OR the
    stage was explicitly cleaned with its lineage kept (`cli.py clean
    --keep-lineage`, the reference's Eraser semantics: consumed stage
    files are reclaimed and NOT regenerated on resume; a downstream
    stage that still needs the table fails loudly at read)."""
    rec = read_lineage(run_dir, stage)
    if rec is None:
        return False
    if {k: str(v) for k, v in rec["params"].items()} != {k: str(v) for k, v in params.items()}:
        return False
    if rec.get("cleaned"):
        return True
    try:
        spark.read.parquet(os.path.join(run_dir, stage)).schema
        return True
    except Exception:
        return False
