"""Stateful streaming dedup (applyInPandasWithState): duplicates arriving
in LATER micro-batches are suppressed; every unique text is emitted once."""

from pyspark.sql import functions as F

from kmtricks_spark.streaming.count_stream import stream_docs
from kmtricks_spark.streaming.dedup_stream import dedup_stream


def test_cross_batch_dedup(spark, docs, tmp_path):
    base = docs.limit(60)
    indir, ck = str(tmp_path / "in"), str(tmp_path / "ck")
    base.coalesce(1).write.parquet(indir)
    # 30 exact duplicates with fresh ids, as a separate file => later batch
    base.limit(30).select(
        (F.col("doc_id") + 500).alias("doc_id"), "text", "lang", "source", "n_chars"
    ).coalesce(1).write.mode("append").parquet(indir)

    out = dedup_stream(stream_docs(spark, indir, max_files=1))
    q = (
        out.writeStream.format("memory").queryName("dd_t").outputMode("append")
        .option("checkpointLocation", ck).trigger(availableNow=True).start()
    )
    q.awaitTermination()
    row = spark.sql("SELECT count(*) c, count(DISTINCT fingerprint) d FROM dd_t").collect()[0]
    uniques = base.select("text").distinct().count()
    assert row.c == row.d == uniques
