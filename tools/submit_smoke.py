"""Driver script for the north-rule launch shape:

    spark-submit --py-files dist/kmtricks_spark.zip tools/submit_smoke.py \
        <input.parquet> <run_dir>

Imports the engine ONLY from the shipped zip (no repo on sys.path),
runs the counts stage, prints one JSON line. Exercised by
tests/test_round2.py::test_spark_submit_pyfiles.
"""

import json
import sys

from pyspark.sql import SparkSession

from kmtricks_spark import KmConfig
from kmtricks_spark.plans.pipeline import Pipeline


def main():
    inp, run_dir = sys.argv[1], sys.argv[2]
    spark = (
        SparkSession.builder.appName("submit_smoke")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    cfg = KmConfig(k=8, hard_min=2, nb_partitions=4, bloom_bits=1 << 16)
    status = Pipeline(spark, cfg, run_dir, inp, until="counts").run()
    n = spark.read.parquet(f"{run_dir}/counts").count()
    print(json.dumps({"status": status, "count_rows": n}))
    spark.stop()


if __name__ == "__main__":
    main()
