"""resolve_href: the RFC 3986 reference-resolution column expression is
pinned against urllib.parse.urljoin (ground truth) over a matrix of
relative forms, plus the crawl-frontier deviations we document: fragments
are stripped, and non-http(s) schemes resolve to NULL."""

from urllib.parse import urljoin, urldefrag

from pyspark.sql import functions as F

from closure_html_spark.spark.relational import resolve_href

# (base, href) -- expected = urljoin minus fragment, or None for non-http
CASES = [
    ("https://h.ex/a/b.html", "page.html"),
    ("https://h.ex/a/b.html", "../up.html"),
    ("https://h.ex/a/b/c.html", ".."),
    ("https://h.ex/a/b/c.html", "../"),
    ("https://h.ex/a/b.html", "./same.html"),
    ("https://h.ex/a/b.html", "/root.html"),
    ("https://h.ex/a/b.html", "/r/../s.html"),
    ("https://h.ex/a/b.html", "//other.ex/x"),
    ("http://plain.ex/d/", "//other.ex/x"),
    ("https://h.ex/a/b.html", "http://abs.ex/p"),
    ("https://h.ex/a/b.html", "HTTPS://abs.ex/Q"),
    ("https://h.ex/a/b.html", "http://abs.ex/p/../q"),  # kept verbatim
    ("https://h.ex/a/b.html", "?q=1"),
    ("https://h.ex/a/b.html?old=1", "?q=2"),
    ("https://h.ex", "?q=1"),
    ("https://h.ex/a/b.html", "#frag"),
    ("https://h.ex/a/b.html", ""),
    ("https://h.ex/a/b.html", "x/y/../z.html?q=2#f"),
    ("https://h.ex", "x.html"),
    ("https://h.ex/a/b.html", "../../../up.html"),  # clamped at root
    ("https://h.ex/a/b.html", "a//b.html"),
    ("https://h.ex/a/b.html", "a/./b/.."),
    ("https://h.ex/a/", "sub/"),
    ("https://h.ex/a/b.html?old=1", "new.html"),
    ("https://h.ex/a/b.html", "."),
    ("https://h.ex/a/b.html", "./"),
]

DROPPED = [  # non-http(s) schemes -> NULL
    ("https://h.ex/a/b.html", "mailto:user@x.ex"),
    ("https://h.ex/a/b.html", "javascript:void(0)"),
    ("https://h.ex/a/b.html", "data:text/plain,hi"),
    ("https://h.ex/a/b.html", "tel:+1-555-0100"),
    ("https://h.ex/a/b.html", "ftp://files.ex/f"),
]


def test_resolve_matrix_vs_urljoin(spark):
    rows = [(i, b, h) for i, (b, h) in enumerate(CASES)]
    df = spark.createDataFrame(rows, "i int, src string, href string")
    got = {r["i"]: r["out"] for r in df.select(
        "i", resolve_href(F.col("src"), F.col("href")).alias("out"))
        .collect()}
    for i, (b, h) in enumerate(CASES):
        want = urldefrag(urljoin(b, h)).url
        assert got[i] == want, f"case {i}: {b} + {h}: {got[i]!r} != {want!r}"


def test_resolve_drops_non_http_schemes(spark):
    rows = [(i, b, h) for i, (b, h) in enumerate(DROPPED)]
    df = spark.createDataFrame(rows, "i int, src string, href string")
    got = [r["out"] for r in df.select(
        "i", resolve_href(F.col("src"), F.col("href")).alias("out"))
        .collect()]
    assert got == [None] * len(DROPPED)


def test_resolve_with_base_override(spark):
    """<base href> overrides src as the resolution base; a relative base
    first resolves against src; a null/empty base is a no-op; a non-http
    base falls back to src."""
    rows = [
        # (i, src, base, href)
        (0, "https://h.ex/a/b.html", "https://cdn.ex/assets/", "x.png"),
        (1, "https://h.ex/a/b.html", "/static/", "x.png"),
        (2, "https://h.ex/a/b.html", None, "x.png"),
        (3, "https://h.ex/a/b.html", "", "x.png"),
        (4, "https://h.ex/a/b.html", "javascript:bad", "x.png"),
        (5, "https://h.ex/a/b.html", "https://cdn.ex/assets/", "/abs.css"),
    ]
    df = spark.createDataFrame(rows, "i int, src string, base string, "
                                     "href string")
    got = {r["i"]: r["out"] for r in df.select(
        "i", resolve_href(F.col("src"), F.col("href"),
                          base=F.col("base")).alias("out")).collect()}
    assert got[0] == "https://cdn.ex/assets/x.png"
    assert got[1] == "https://h.ex/static/x.png"   # base resolved vs src
    assert got[2] == "https://h.ex/a/x.png"        # null base -> src
    assert got[3] == "https://h.ex/a/x.png"        # empty base -> src
    assert got[4] == "https://h.ex/a/x.png"        # non-http base -> src
    assert got[5] == "https://cdn.ex/abs.css"      # rooted vs base origin


def test_resolve_randomized_vs_urljoin(spark):
    """300 seeded random (base, href) pairs in one Spark job, compared
    against urljoin (fragment-stripped).  Catches merge/normalization
    edge combinations the hand matrix misses."""
    import random

    rng = random.Random(42)
    segs = ["a", "bb", "c.html", "idx", "x1"]

    def rand_base():
        host = rng.choice(["h.ex", "w.example", "h.ex:8080"])
        depth = rng.randrange(0, 4)
        path = "/".join(rng.choice(segs) for _ in range(depth))
        trail = rng.choice(["", "/"]) if path else ""
        q = rng.choice(["", "?k=1"])
        return f"https://{host}/{path}{trail}{q}"

    def rand_href():
        kind = rng.randrange(6)
        if kind == 0:
            parts = [rng.choice(segs + ["..", "."])
                     for _ in range(rng.randrange(1, 4))]
            return "/".join(parts) + rng.choice(["", "/"])
        if kind == 1:
            return "/" + "/".join(rng.choice(segs + [".."])
                                  for _ in range(rng.randrange(0, 3)))
        if kind == 2:
            return "//m.ex/" + rng.choice(segs)
        if kind == 3:
            return "http://abs.ex/" + rng.choice(segs)
        if kind == 4:
            return rng.choice(segs) + "?q=" + rng.choice(segs)
        return rng.choice(["", "?x=1", "#f", "./", "../"])

    cases = [(i, rand_base(), rand_href()) for i in range(300)]
    df = spark.createDataFrame(cases, "i int, src string, href string")
    got = {r["i"]: r["out"] for r in df.select(
        "i", resolve_href(F.col("src"), F.col("href")).alias("out"))
        .collect()}
    for i, b, h in cases:
        want = urldefrag(urljoin(b, h)).url
        assert got[i] == want, f"{b!r} + {h!r}: {got[i]!r} != {want!r}"
