"""Structured Streaming ingest mode (SURVEY.md §2.10 "streaming").

The extraction stage is stateless per document, so the streaming pipeline
is: file-source readStream over arriving `pages` parquet -> the SAME
Arrow-batched extraction mapInPandas used in batch mode -> parquet sink
with checkpointing.  Exactly-once comes from the file-source + checkpoint
combination; no stateful operator is needed for parse itself.

Stateful layer: `stream_host_rates` shows the watermarked windowed
aggregation pattern (late data bounded by the watermark) for per-host
ingest monitoring.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .pipeline import extract_pages

PAGES_DDL = ("url string, warc_ts timestamp, html binary, text string, "
             "lang string, doc_id long")


def read_pages_stream(spark: SparkSession, input_dir: str,
                      max_files_per_trigger: int = 8) -> DataFrame:
    return (spark.readStream
            .schema(PAGES_DDL)
            .option("maxFilesPerTrigger", str(max_files_per_trigger))
            .parquet(input_dir))


def stream_extract(spark: SparkSession, input_dir: str, output_dir: str,
                   checkpoint_dir: str, available_now: bool = True):
    """Start the streaming extraction job; returns the StreamingQuery.
    available_now=True drains everything currently in input_dir and stops
    (the batch-backfill trigger); False runs continuously."""
    pages = read_pages_stream(spark, input_dir)
    ext = extract_pages(pages, id_cols=("url", "doc_id"))
    writer = (ext.writeStream
              .format("parquet")
              .option("path", output_dir)
              .option("checkpointLocation", checkpoint_dir)
              .outputMode("append"))
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_host_rates(pages: DataFrame, window: str = "1 minute",
                      watermark: str = "10 minutes") -> DataFrame:
    """Watermarked per-host page-rate windows (late data beyond the
    watermark is dropped; append mode emits finalized windows only)."""
    host = F.regexp_extract("url", r"https://([^/]+)/", 1).alias("host")
    return (pages
            .withWatermark("warc_ts", watermark)
            .groupBy(F.window("warc_ts", window).alias("win"), host)
            .agg(F.count(F.lit(1)).alias("n_pages"),
                 F.sum(F.length("html")).alias("bytes_in")))


def stream_dedup_urls(pages: DataFrame, n_groups: int = 64) -> DataFrame:
    """Custom stateful streaming operator (applyInPandasWithState): emit
    each url the FIRST time it is ever seen across the life of the stream.

    CC re-crawls the same urls continuously; first-seen dedup upstream of
    the parse stage is the single biggest compute saver in a continuous
    ingest.  State = per-group array of 64-bit url digests, partitioned by
    a url-hash group key so state shards evenly across executors.
    """
    import hashlib

    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout

    def digest(u: str) -> int:
        h = hashlib.md5(u.encode("utf-8")).digest()
        return int.from_bytes(h[:8], "big", signed=True)

    def fn(key, pdfs, state):
        seen = set(state.get[0]) if state.exists else set()
        out = []
        for pdf in pdfs:
            for _, row in pdf.iterrows():
                d = digest(row["url"])
                if d not in seen:
                    seen.add(d)
                    out.append((row["url"], row["warc_ts"], row["html"]))
        state.update((list(seen),))
        if out:
            yield pd.DataFrame(out, columns=["url", "warc_ts", "html"])

    keyed = pages.withColumn(
        "grp", F.pmod(F.xxhash64("url"), F.lit(n_groups)).cast("int"))
    return keyed.groupBy("grp").applyInPandasWithState(
        fn,
        outputStructType="url string, warc_ts timestamp, html binary",
        stateStructType="seen array<long>",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
