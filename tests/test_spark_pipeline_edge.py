"""Pipeline edge cases: oversized documents must flow through the Arrow
batch machinery without blowing a worker (SURVEY.md §4 physical risk;
batches are bounded by rows AND bytes in session.py)."""

from pyspark.sql import functions as F

from closure_html_spark.spark.pipeline import extract_pages


def test_20mb_document_mixed_with_small(spark):
    big_body = ("<p>" + "big document content word soup " * 200 + "</p>") * 3200
    big = ("<html><head><title>Big</title></head><body>" + big_body
           + "</body></html>").encode()
    assert len(big) > 15_000_000
    rows = [("https://big.example/1", bytearray(big))]
    rows += [(f"https://small.example/{i}",
              bytearray(b"<html><body><p>small</p></body></html>"))
             for i in range(500)]
    df = spark.createDataFrame(rows, "url string, html binary").repartition(8)
    out = extract_pages(df)
    assert out.filter(F.col("charset").startswith("error:")).count() == 0
    bigrow = out.filter(F.col("url") == "https://big.example/1").collect()[0]
    assert bigrow["extracted_text"].startswith("big document content")
    assert bigrow["n_nodes"] > 6000
    assert out.count() == 501
