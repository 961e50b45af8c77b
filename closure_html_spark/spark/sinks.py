"""Training-data export sinks.

The reference's sink surface is stream/rod/octet serialization
(unparse.lisp); a corpus pipeline additionally needs the bulk export
format trainers actually consume: sharded JSONL.  Parquet remains the
engine-side interchange (lineage.py); JSONL is the boundary format.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_jsonl_sharded(df: DataFrame, path: str, n_shards: int = 8,
                        shard_key: str = "doc_id") -> None:
    """Write df as sharded JSONL: one `shard=K/` directory per shard,
    each row one JSON object line.

    Scale shape: shard = md5(shard_key) mod n_shards -- the same
    content-stable hash as q_corpus_sample / q_pack_sequences, so a
    row's shard never changes across runs/retries/cluster sizes and
    sequence packing's shard assignment (q_pack_sequences) matches the
    file layout exactly.  `partitionBy` writes each shard from the
    tasks that own its rows -- no global sort, no single-reducer
    funnel; JSON encoding is the JVM `to_json`, not Python."""
    shard = (F.conv(F.substring(
        F.md5(F.col(shard_key).cast("string")), 1, 8), 16, 10)
        .cast("long") % n_shards)
    payload = F.to_json(F.struct(*[c for c in df.columns]))
    (df.select(shard.alias("shard"), payload.alias("value"))
     .repartition("shard")
     .write.mode("overwrite").partitionBy("shard").text(path))


def read_jsonl_sharded(spark: SparkSession, path: str,
                       schema: str) -> DataFrame:
    """Read a write_jsonl_sharded layout back: shard from the directory
    name, fields from the JSON lines."""
    raw = spark.read.text(f"{path}/shard=*")
    shard = F.regexp_extract(F.input_file_name(), r"shard=(\d+)", 1)
    return (raw.select(F.from_json("value", schema).alias("r"),
                       shard.cast("long").alias("shard"))
            .select("r.*", "shard"))
