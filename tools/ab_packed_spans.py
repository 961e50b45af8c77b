"""Interleaved ABBA A/B: spans as list-of-struct (current) vs one packed
binary column (SCALE.md frontier #2 prototype) on the bench extract leg.

Same corpus, same session, ABBA-BAAB ordering, hw calibration around the
block.  Prints one JSON line.  Usage: python tools/ab_packed_spans.py [sf_dir]
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
from closure_html_spark.spark.pipeline import extract_pages  # noqa: E402
from closure_html_spark.spark.session import get_spark  # noqa: E402
from tools.ab_relational import hw_speed  # noqa: E402

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
    "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def main():
    spark = get_spark(app="ab-packed-spans", master=f"local[{CPUS}]",
                      shuffle_partitions=CPUS)
    pages = pages_from_documents(spark, SF_DIR, tile=8, variants=4,
                                 heavy=16).repartition(64, "url").cache()
    n_docs = pages.count()

    def leg_struct():
        ext = extract_pages(pages, id_cols=("url",))
        ext.agg(F.sum(F.length("extracted_text")), F.sum(F.size("spans")),
                F.sum("n_nodes")).collect()

    def leg_packed():
        ext = extract_pages(pages, id_cols=("url",), packed_spans=True)
        ext.agg(F.sum(F.length("extracted_text")),
                F.sum(F.length("spans_packed") / 20).cast("long"),
                F.sum("n_nodes")).collect()

    # warm both paths outside the measured block
    leg_struct()
    leg_packed()
    hw0 = hw_speed()
    s_times, p_times = [], []
    for r in range(2):
        order = ([("s", leg_struct), ("p", leg_packed),
                  ("p", leg_packed), ("s", leg_struct)] if r % 2 == 0 else
                 [("p", leg_packed), ("s", leg_struct),
                  ("s", leg_struct), ("p", leg_packed)])
        for tag, fn in order:
            t0 = time.time()
            fn()
            (s_times if tag == "s" else p_times).append(
                round(time.time() - t0, 3))
    hw1 = hw_speed()
    res = {
        "experiment": "extract leg: spans list-of-struct(s) vs packed binary(p)",
        "n_docs": n_docs,
        "struct_times": s_times, "packed_times": p_times,
        "struct_median": round(statistics.median(s_times), 3),
        "packed_median": round(statistics.median(p_times), 3),
        "speedup_packed": round(statistics.median(s_times) /
                                statistics.median(p_times), 3),
        "hw_before": hw0, "hw_after": hw1,
        "hw_drift": round(hw1 / hw0, 3) if hw0 else None,
    }
    print(json.dumps(res))
    spark.stop()


if __name__ == "__main__":
    main()
