"""Interleaved ABBA A/B: extract_links via the new `links` extract column
vs the round-3 nodes_of path (round-3 verdict wrong #2 -- per-node Python
dict assembly behind a first-class crawl-frontier query).

Usage: python tools/ab_links.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from closure_html_spark.spark.pages import pages_from_documents  # noqa: E402
from closure_html_spark.spark.pipeline import (  # noqa: E402
    extract_pages,
    nodes_of,
)
from closure_html_spark.spark.session import get_spark  # noqa: E402
from tools.ab_relational import hw_speed  # noqa: E402

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
    "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def main():
    spark = get_spark(app="ab-links", master=f"local[{CPUS}]",
                      shuffle_partitions=CPUS)
    # the bench corpus shape (tiled + heavy docs): per-doc node counts in
    # the hundreds, the regime the nodes_of cost model targets
    pages = pages_from_documents(spark, SF_DIR, tile=8, variants=4,
                                 heavy=16).repartition(64, "url").cache()
    pages.count()

    def links_new():
        ext = extract_pages(pages, id_cols=("url",), columns=("links",))
        (ext.select("url", F.size("links").cast("long").alias("n_links"),
                    F.array_join(F.array_sort("links"), ",").alias("hrefs"))
         .write.format("noop").mode("overwrite").save())

    def links_nodes_arrow():
        nodes = nodes_of(pages, id_cols=("url",), engine="arrow")
        (nodes.filter(F.col("name") == "A")
         .select("url", F.element_at("attrs", "HREF").alias("href"))
         .groupBy("url")
         .agg(F.count(F.lit(1)).alias("n_links"),
              F.array_join(F.sort_array(F.collect_list("href")), ",")
               .alias("hrefs"))
         .write.format("noop").mode("overwrite").save())

    def links_nodes_pandas():
        nodes = nodes_of(pages, id_cols=("url",), engine="pandas")
        (nodes.filter(F.col("name") == "A")
         .select("url", F.element_at("attrs", "HREF").alias("href"))
         .groupBy("url")
         .agg(F.count(F.lit(1)).alias("n_links"),
              F.array_join(F.sort_array(F.collect_list("href")), ",")
               .alias("hrefs"))
         .write.format("noop").mode("overwrite").save())

    legs = {"extract_links_col": links_new,
            "nodes_of_arrow": links_nodes_arrow,
            "nodes_of_pandas": links_nodes_pandas}
    for fn in legs.values():  # warm every path
        fn()
    hw0 = hw_speed()
    times = {k: [] for k in legs}
    for r in range(2):
        order = list(legs.items()) if r % 2 == 0 \
            else list(reversed(legs.items()))
        for tag, fn in order:
            t0 = time.time()
            fn()
            times[tag].append(round(time.time() - t0, 3))
    hw1 = hw_speed()
    med = {k: round(statistics.median(v), 3) for k, v in times.items()}
    res = {
        "experiment": "extract_links: links column vs nodes_of (arrow/pandas)",
        "times": times, "medians": med,
        "speedup_vs_nodes_pandas": round(
            med["nodes_of_pandas"] / med["extract_links_col"], 3),
        "speedup_vs_nodes_arrow": round(
            med["nodes_of_arrow"] / med["extract_links_col"], 3),
        "hw_before": hw0, "hw_after": hw1,
        "hw_drift": round(hw1 / hw0, 3) if hw0 else None,
    }
    print(json.dumps(res))
    spark.stop()


if __name__ == "__main__":
    main()
