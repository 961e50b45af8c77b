"""MIME registry port (mime.lisp:31-101) + the mime_class query."""

import duckdb
import pytest

from closure_html_spark.mime import (
    MIME_TYPES,
    exact_extension_map,
    find_mime_type,
    find_mime_type_from_extension,
    legacy_prefix_map,
)

SF = "/root/testdata/sf0.001"


def test_registry_contents():
    # all 11 definitions (mime.lisp:71-81), scan order = reverse definition
    assert len(MIME_TYPES) == 11
    assert MIME_TYPES[0][0] == "text/css"
    assert MIME_TYPES[-1][0] == "image/gif"


def test_find_mime_type_case_insensitive():
    assert find_mime_type("TEXT/HTML")[0] == "text/html"
    assert find_mime_type("image/jpeg")[1] == ("jpeg", "jpg", "jpe")
    assert find_mime_type("video/mpeg") is None


def test_find_from_extension_exact():
    assert find_mime_type_from_extension("html")[0] == "text/html"
    assert find_mime_type_from_extension("JPG")[0] == "image/jpeg"
    assert find_mime_type_from_extension("tif")[0] == "image/tiff"
    assert find_mime_type_from_extension("jpe")[0] == "image/jpeg"


def test_find_from_extension_legacy_3char():
    # second pass (mime.lisp:55-61): query vs first 3 chars of each ext
    assert find_mime_type_from_extension("htm")[0] == "text/html"
    # length must agree with the truncated extension (string-equal
    # semantics): a 4-char query never legacy-matches a 3-char prefix
    assert find_mime_type_from_extension("htmx") is None
    assert find_mime_type_from_extension("bin") is None


def test_maps_agree_with_lookup():
    ex, lg = exact_extension_map(), legacy_prefix_map()
    for e, name in ex.items():
        assert find_mime_type_from_extension(e)[0] == name
    for p, name in lg.items():
        assert find_mime_type_from_extension(p)[0] == name


def test_mime_class_query_matches_oracle(spark):
    from closure_html_spark.spark import relational as R
    got = [(r["mime"], r["n_docs"])
           for r in R.q_mime_class(spark, SF).collect()]
    con = duckdb.connect()
    con.execute("CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{SF}/documents.parquet')")
    want = [tuple(t) for t in con.execute(R.ORACLE_MIME_CLASS).fetchall()]
    assert got == want
    # the cycle covers all three outcomes
    mimes = {m for m, _ in got}
    assert "text/html" in mimes and "unknown" in mimes
