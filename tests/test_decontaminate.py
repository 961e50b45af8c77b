"""Eval-overlap decontamination: plan shape (broadcast eval grams, no
corpus-sized exchange) and non-vacuity (the gate split actually catches
contamination on the test corpus, so the join/count path is exercised)."""

import re

import pyspark.sql.functions as F

from closure_html_spark.spark import relational as R

SF = "/root/testdata/sf0.001"


def plan_of(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted")


def test_decontaminate_plan(spark):
    """Eval grams broadcast; train grams never cross a wide exchange.
    The only hash exchanges are the tiny eval-side gram dedup and the
    matched-rows doc count -- never the train gram stream itself."""
    plan = plan_of(R.q_decontaminate(spark, SF))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "Window" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    keys = set(re.findall(r"hashpartitioning\((\w+)#", plan))
    assert keys <= {"gram", "doc_id"}, keys


def test_decontaminate_nonvacuous(spark):
    """The deterministic split must flag real contamination on testdata --
    otherwise the gate is a vacuous empty-vs-empty compare."""
    rows = R.q_decontaminate(spark, SF).collect()
    assert len(rows) >= 1
    assert all(r.n_shared_grams >= 1 for r in rows)


def test_decontaminate_clean_complement(spark):
    """clean = train docs minus flagged docs, exactly."""
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    n_train = docs.filter(F.col("doc_id") % 7 != 0).count()
    flagged = R.q_decontaminate(spark, SF).count()
    kept = R.q_decontaminate_clean(spark, SF).count()
    assert kept == n_train - flagged
    # and no flagged doc survives
    clean_ids = {r.doc_id for r in
                 R.q_decontaminate_clean(spark, SF).select("doc_id").collect()}
    bad_ids = {r.doc_id for r in
               R.q_decontaminate(spark, SF).select("doc_id").collect()}
    assert not (clean_ids & bad_ids)
