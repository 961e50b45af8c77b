"""Round-8 per-query measurement harness (guide §1: measure first).

Times individual declared queries with the noop sink (computation only,
no output cost), min over N runs, and captures .explain("formatted") to
plans/r08/<name>_<tag>.txt.  Separate from the FROZEN bench.py.

Usage:
  python tools/measure_r08.py --tag before [--only q1,q2] [--runs 2]
  python tools/measure_r08.py --plans-only --tag before
"""
from __future__ import annotations

import argparse
import io
import json
import os
import sys
import time
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from closure_html_spark.spark import relational as R  # noqa: E402
from closure_html_spark.spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def rel_queries():
    """The bench.py relational list, name -> fn (kept in sync by hand;
    bench.py itself is frozen)."""
    import __spark_entry__ as entry
    from closure_html_spark.spark.pdfs import q_pdf_extract
    from closure_html_spark.spark.warcs import q_warc_extract
    qs = entry.queries()
    return [
        ("pricing_summary", R.q_pricing_summary),
        ("top_revenue_nations", R.q_top_revenue_nations),
        ("window_user_events", R.q_window_user_events),
        ("sessionize", R.q_sessionize),
        ("dedup_exact", R.q_dedup_exact),
        ("ngram_shingles", R.q_ngram_shingles),
        ("ann_cosine_topk", R.q_ann_cosine_topk),
        ("minhash_bands", R.q_minhash_bands),
        ("winnow_fingerprint", R.q_winnow_fingerprint),
        ("jaccard_pairs", R.q_jaccard_pairs),
        ("embedding_neardup_lsh", R.q_embedding_neardup_lsh),
        ("minhash_est_pairs", R.q_minhash_est_pairs),
        ("paragraph_clean_50", lambda s, d: R.q_paragraph_dedup_clean(
            s, d, chunk_words=50)),
        ("corpus_clean_pipeline", qs["corpus_clean_pipeline"]),
        ("pdf_extract", q_pdf_extract),
        ("warc_extract", q_warc_extract),
        ("corpus_sample", R.q_corpus_sample),
        ("pack_sequences", R.q_pack_sequences),
        ("decontaminate", R.q_decontaminate),
        ("incremental_dedup", R.q_incremental_dedup),
        ("quality_classifier", R.q_quality_classifier),
        ("bpe_tokenize", R.q_bpe_tokenize),
        ("lm_perplexity", R.q_lm_perplexity),
        ("repeated_span_clean", R.q_repeated_span_clean),
        ("bm25_topk", R.q_bm25_topk),
        ("semantic_dedup", R.q_semantic_dedup),
        ("pq_encode", R.q_pq_encode),
        ("ann_pq_topk", R.q_ann_pq_topk),
        ("dsir_weights", R.q_dsir_weights),
    ]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tag", default="probe")
    ap.add_argument("--only", default=None)
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument("--plans-only", action="store_true")
    ap.add_argument("--no-plans", action="store_true")
    args = ap.parse_args()

    only = set(args.only.split(",")) if args.only else None
    plan_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "plans", "r08")
    os.makedirs(plan_dir, exist_ok=True)

    spark = get_spark(app=f"measure-r08-{args.tag}", master=f"local[{CPUS}]",
                      shuffle_partitions=CPUS)
    walls: dict[str, list[float]] = {}
    for name, fn in rel_queries():
        if only and name not in only:
            continue
        if not args.no_plans:
            try:
                df = fn(spark, SF_DIR)
                buf = io.StringIO()
                with redirect_stdout(buf):
                    df.explain("formatted")
                with open(os.path.join(plan_dir,
                                       f"{name}_{args.tag}.txt"), "w") as f:
                    f.write(buf.getvalue())
            except Exception as e:  # noqa: BLE001
                print(f"PLAN FAIL {name}: {e}", file=sys.stderr)
        if args.plans_only:
            continue
        spark.sparkContext.setJobDescription(f"r08:{name}")
        for _ in range(args.runs):
            t0 = time.time()
            df = fn(spark, SF_DIR)
            df.write.format("noop").mode("overwrite").save()
            walls.setdefault(name, []).append(round(time.time() - t0, 3))
        spark.sparkContext.setJobDescription(None)
        print(json.dumps({name: walls[name]}), flush=True)
    spark.stop()
    if walls:
        out = {n: {"min": min(v), "samples": v} for n, v in walls.items()}
        print(json.dumps({"tag": args.tag,
                          "total_min": round(sum(min(v) for v in
                                                 walls.values()), 3),
                          "walls": out}))


if __name__ == "__main__":
    sys.exit(main())
