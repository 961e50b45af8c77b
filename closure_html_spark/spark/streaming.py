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


def stream_dedup_urls(pages: DataFrame, n_groups: int = 64,
                      m_bits: int = 1 << 23) -> DataFrame:
    """Custom stateful streaming operator (applyInPandasWithState): emit
    each url the FIRST time it is ever seen across the life of the stream.

    CC re-crawls the same urls continuously; first-seen dedup upstream of
    the parse stage is the single biggest compute saver in a continuous
    ingest.

    State = one CONSTANT-SIZE Bloom filter per url-hash group (m_bits bits,
    k=4 hashes carved from the url's md5), so state is m_bits/8 bytes per
    group forever -- an exact-set state would grow 8 bytes per unique url
    (8 TB at 10^12 urls).  The trade is a bounded false-drop rate:
    (1-exp(-4n/m))^4 per new url after n uniques in a group (~0.2% at
    n = m/16; size m_bits to the expected uniques).  Membership tests and
    bit updates are numpy-vectorized over the whole Arrow batch -- no
    per-row Python.
    """
    import hashlib

    import numpy as np
    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout

    n_bytes = m_bits // 8

    def fn(key, pdfs, state):
        if state.exists:
            bloom = np.frombuffer(state.get[0], dtype=np.uint8).copy()
        else:
            bloom = np.zeros(n_bytes, dtype=np.uint8)
        changed = False
        for pdf in pdfs:
            if pdf.empty:
                continue
            # 4 x 32-bit hash indices per url from one md5 (vectorized
            # reinterpret of the concatenated digests)
            dig_list = [hashlib.md5(u.encode("utf-8")).digest()
                        for u in pdf["url"]]
            idx = (np.frombuffer(b"".join(dig_list), dtype=">u4")
                   .reshape(-1, 4) % np.uint32(m_bits))
            byte_i = idx >> 3
            bit_m = np.uint8(1) << (idx & 7).astype(np.uint8)
            seen = ((bloom[byte_i] & bit_m) == bit_m).all(axis=1)
            # also drop repeats within this batch (first occurrence wins)
            first_in_batch = ~pd.Series(dig_list).duplicated().to_numpy()
            emit = (~seen) & first_in_batch
            if emit.any():
                ei = byte_i[emit].ravel()
                em = bit_m[emit].ravel()
                np.bitwise_or.at(bloom, ei, em)
                changed = True
                yield pdf.loc[emit, ["url", "warc_ts", "html"]]
        if changed:
            state.update((bloom.tobytes(),))

    keyed = pages.withColumn(
        "grp", F.pmod(F.xxhash64("url"), F.lit(n_groups)).cast("int"))
    return keyed.groupBy("grp").applyInPandasWithState(
        fn,
        outputStructType="url string, warc_ts timestamp, html binary",
        stateStructType="bloom binary",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
