"""Structured Streaming ingest tests: streaming extraction must produce
exactly the batch results; watermarked windows must aggregate."""

import pytest
from pyspark.sql import functions as F

from closure_html_spark.spark.pages import pages_from_documents
from closure_html_spark.spark.streaming import (
    read_pages_stream,
    stream_extract,
    stream_host_rates,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def staged_pages(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("pages_in")
    pages = pages_from_documents(spark, SF)
    pages.repartition(4).write.mode("overwrite").parquet(str(d))
    return str(d), pages.count()


def test_stream_extract_matches_batch(spark, staged_pages, tmp_path_factory):
    input_dir, n = staged_pages
    out = str(tmp_path_factory.mktemp("stream_out"))
    ckpt = str(tmp_path_factory.mktemp("ckpt"))
    q = stream_extract(spark, input_dir, out, ckpt, available_now=True)
    q.awaitTermination(300)
    got = spark.read.parquet(out)
    assert got.count() == n
    # streaming result values identical to batch invariant
    bad = got.join(
        spark.read.parquet(f"{SF}/documents.parquet").select("doc_id", "text"),
        "doc_id").filter(F.col("main_text") != F.col("text")).count()
    assert bad == 0

    # resume: restart with same checkpoint, nothing new -> no duplicates
    q2 = stream_extract(spark, input_dir, out, ckpt, available_now=True)
    q2.awaitTermination(300)
    assert spark.read.parquet(out).count() == n


def test_stream_host_rates_watermark(spark, staged_pages, tmp_path_factory):
    input_dir, n = staged_pages
    ckpt = str(tmp_path_factory.mktemp("ckpt2"))
    stream = read_pages_stream(spark, input_dir)
    # warc_ts spans ~8.3 min (doc_id seconds); a 2-min watermark finalizes
    # all but the trailing windows -- append mode emits ONLY finalized ones
    rates = stream_host_rates(stream, window="1 minute",
                              watermark="2 minutes")
    q = (rates.writeStream.format("memory").queryName("rates")
         .outputMode("append").option("checkpointLocation", ckpt)
         .trigger(availableNow=True).start())
    q.awaitTermination(300)
    got = spark.sql("select * from rates")
    total = got.agg(F.sum("n_pages")).collect()[0][0]
    # all-but-trailing-2-minutes emitted: strictly positive, never more than n
    assert total is not None and 0 < total <= n
    hosts = {r["host"] for r in got.select("host").distinct().collect()}
    assert "host0.example" in hosts
    assert got.filter(F.col("win.start").isNull()).count() == 0


def test_stream_dedup_urls_stateful(spark, tmp_path_factory):
    """applyInPandasWithState first-seen dedup: duplicates inside a batch
    AND across restarts (state from checkpoint) are dropped."""
    from pyspark.sql import functions as F

    from closure_html_spark.spark.streaming import stream_dedup_urls

    in_dir = str(tmp_path_factory.mktemp("dedup_in"))
    out_dir = str(tmp_path_factory.mktemp("dedup_out"))
    ckpt = str(tmp_path_factory.mktemp("dedup_ckpt"))

    pages = pages_from_documents(spark, SF).select("url", "warc_ts", "html")
    # wave 1: every url twice
    pages.unionAll(pages).repartition(4).write.mode("append").parquet(in_dir)
    n_unique = pages.count()

    def run():
        stream = (spark.readStream
                  .schema("url string, warc_ts timestamp, html binary")
                  .parquet(in_dir))
        dedup = stream_dedup_urls(stream, n_groups=8)
        q = (dedup.writeStream.format("parquet").option("path", out_dir)
             .option("checkpointLocation", ckpt)
             .outputMode("append").trigger(availableNow=True).start())
        q.awaitTermination(300)

    run()
    got = spark.read.parquet(out_dir)
    assert got.count() == n_unique
    assert got.select("url").distinct().count() == n_unique

    # wave 2: same urls again + 100 genuinely new ones
    new = pages.limit(100).withColumn(
        "url", F.concat(F.col("url"), F.lit("?new=1")))
    pages.unionAll(new).repartition(4).write.mode("append").parquet(in_dir)
    run()
    got = spark.read.parquet(out_dir)
    assert got.count() == n_unique + 100, "cross-restart state failed"
    assert got.select("url").distinct().count() == n_unique + 100
