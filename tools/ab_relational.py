"""Interleaved ABBA A/B for relational-query plan changes (round-3 verdict
wrong #1: a plan change shipped without an equal-hardware comparison).

Runs variant pairs back-to-back in ONE session in ABBA-BAAB order so both
formulations see the same throttle window, with a busy-loop hardware
calibration around the block.  Prints one JSON line per experiment.

Usage: python tools/ab_relational.py [sf_dir]
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from closure_html_spark.spark import relational as R  # noqa: E402
from closure_html_spark.spark.session import get_spark  # noqa: E402

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
    "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def _burn(_):
    t0 = time.time()
    x = 0
    while time.time() - t0 < 1.0:
        x += 1
    return x


def hw_speed(n: int = 8) -> float:
    with mp.Pool(n) as p:
        return float(sum(p.map(_burn, range(n))))


def q_ann_cosine_hof(spark, sf_dir, k: int = 5, n_queries: int = 3):
    """The round-2 formulation: dot product via zip_with/aggregate HOF
    (interpreted per element) -- the A/B baseline for the round-3 unroll."""
    emb = R._t(spark, sf_dir, "embeddings")
    qs = (emb.filter(F.col("vec_id") < n_queries)
          .select(F.col("vec_id").alias("q_id"),
                  F.col("embedding").alias("q_emb")))
    dot = F.aggregate(
        F.zip_with(F.col("q_emb"), F.col("embedding"),
                   lambda a, b: a.cast("double") * b.cast("double")),
        F.lit(0.0), lambda acc, x: acc + x)
    norm = lambda c: F.sqrt(F.aggregate(  # noqa: E731
        F.transform(c, lambda x: x.cast("double") * x.cast("double")),
        F.lit(0.0), lambda acc, x: acc + x))
    sim = F.round(dot / (norm(F.col("q_emb")) * norm(F.col("embedding"))), 6)
    scored = (F.broadcast(qs).crossJoin(emb)
              .filter(F.col("vec_id") != F.col("q_id"))
              .select("q_id", "vec_id", sim.alias("sim")))
    w = Window.partitionBy("q_id").orderBy(F.desc("sim"), "vec_id")
    return (scored.withColumn("rnk", F.row_number().over(w))
            .filter(F.col("rnk") <= k)
            .select("q_id", "vec_id", "sim", "rnk")
            .orderBy("q_id", "rnk"))


def timed(spark, fn) -> float:
    t0 = time.time()
    fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
    return round(time.time() - t0, 3)


def ab(spark, name: str, fa, fb, rounds: int = 2) -> dict:
    """ABBA-BAAB: each round contributes one A and one B in both orders."""
    a_times, b_times = [], []
    hw0 = hw_speed()
    for r in range(rounds):
        order = [("a", fa), ("b", fb), ("b", fb), ("a", fa)] if r % 2 == 0 \
            else [("b", fb), ("a", fa), ("a", fa), ("b", fb)]
        for tag, fn in order:
            (a_times if tag == "a" else b_times).append(timed(spark, fn))
    hw1 = hw_speed()
    res = {
        "experiment": name,
        "a_times": a_times, "b_times": b_times,
        "a_median": round(statistics.median(a_times), 3),
        "b_median": round(statistics.median(b_times), 3),
        "a_min": min(a_times), "b_min": min(b_times),
        "hw_before": hw0, "hw_after": hw1,
        "hw_drift": round(hw1 / hw0, 3) if hw0 else None,
    }
    res["winner"] = "a" if res["a_median"] <= res["b_median"] else "b"
    res["speedup_a_over_b"] = round(res["b_median"] / res["a_median"], 3)
    print(json.dumps(res))
    return res


def main():
    spark = get_spark(app="ab-relational", master=f"local[{CPUS}]",
                      shuffle_partitions=CPUS)
    # warm: one throwaway run of each side so JIT/IO warmup lands outside
    # the measured block
    timed(spark, R.q_ann_cosine_topk)
    timed(spark, q_ann_cosine_hof)
    ab(spark, "ann_cosine: unrolled(a) vs hof(b)",
       R.q_ann_cosine_topk, q_ann_cosine_hof)
    # unchanged-plan queries, timed under the same discipline so the
    # recorded walls have an equal-hardware reference: A == B -> the spread
    # across 8 runs IS the noise floor of this window
    for name, fn in [("minhash_bands", R.q_minhash_bands),
                     ("ngram_shingles", R.q_ngram_shingles),
                     ("pricing_summary", R.q_pricing_summary)]:
        ab(spark, f"{name}: self vs self (noise floor)", fn, fn, rounds=1)
    spark.stop()


if __name__ == "__main__":
    main()
