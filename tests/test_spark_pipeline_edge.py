"""Pipeline edge cases: oversized documents must flow through the Arrow
batch machinery without blowing a worker (SURVEY.md §4 physical risk;
batches are bounded by rows AND bytes in session.py)."""

from pyspark.sql import functions as F

from closure_html_spark.spark.pipeline import extract_pages


def test_arrow_engine_identical_to_pandas(spark):
    """engine='arrow' (mapInArrow, direct pyarrow column assembly -- the
    default) must be value-identical to the round-2 mapInPandas baseline,
    including the error row path and content_type handling."""
    rows = [("u0", bytearray(b"<html><body><p>a &amp; b</p></body></html>"),
             "text/html; charset=utf-8"),
            ("u1", bytearray("<p>caf\xe9".encode("latin-1")),
             "text/html; charset=latin-1"),
            ("u2", bytearray(b""), None),
            ("u3", bytearray(b"<table><td>x<ul>soup"), None)]
    df = spark.createDataFrame(
        rows, "url string, html binary, content_type string")
    a = extract_pages(df, engine="arrow").orderBy("url").collect()
    p = extract_pages(df, engine="pandas").orderBy("url").collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in p]
    assert a[1]["extracted_text"] == "caf\xe9"


def test_columns_projection_matches_full(spark):
    """columns= (metadata-now / text-lazily) must return exactly the full
    run's values for the requested columns, with ONLY those columns in
    the schema (the point: the text payload never enters the batch)."""
    rows = [(f"u{i}", bytearray(
        f"<html><body><p>doc {i} &amp; more</p><unknowntag></body></html>"
        .encode())) for i in range(50)]
    df = spark.createDataFrame(rows, "url string, html binary")
    full = extract_pages(df).orderBy("url") \
        .select("url", "n_nodes", "n_warns", "warn_levels").collect()
    proj = extract_pages(
        df, columns=("n_nodes", "n_warns", "warn_levels")).orderBy("url")
    assert set(proj.columns) == {"url", "n_nodes", "n_warns", "warn_levels"}
    assert [tuple(r) for r in proj.collect()] == [tuple(r) for r in full]
    # title-only still attaches no main_text (needs text+spans)
    t = extract_pages(df, columns=("title", "charset"))
    assert set(t.columns) == {"url", "title", "charset"}


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
