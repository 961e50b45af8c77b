"""MIME type registry (mime.lisp:31-101): the name/extension table and the
find-mime-type / find-mime-type-from-extension lookups a crawl pipeline
uses to filter non-HTML payloads by Content-Type class.

Reference semantics preserved exactly:
  - define-mime-type PUSHes, so lookups scan most-recently-defined first
    (mime.lisp:40-47);
  - find-mime-type-from-extension tries a case-insensitive exact extension
    match, then a legacy-filesystem fallback comparing the query against
    the FIRST THREE characters of each registered extension
    (string-equal ... :end2 (min (length y) 3), mime.lisp:49-61) -- i.e.
    "htm" matches "html";
  - find-mime-type is a case-insensitive name scan (mime.lisp:63-65).

The Content-Type grammar parser lives in parser/charset.py
(parse_mime_content_type).  For Spark, mime_extension_tables() renders the
registry as two tiny broadcastable DataFrames (exact + legacy-prefix), so
the per-document lookup is a broadcast join, never a Python call.
"""

from __future__ import annotations

# Definition order = mime.lisp:71-81; the registry list is the REVERSE
# (push semantics), which only matters if two entries ever shared an
# extension or prefix -- encoded here so the scan order stays faithful.
_DEFINITIONS: list[tuple[str, tuple[str, ...]]] = [
    ("image/gif", ("gif",)),
    ("image/jpeg", ("jpeg", "jpg", "jpe")),
    ("image/tiff", ("tiff", "tif")),
    ("image/png", ("png",)),
    ("image/x-xpixmap", ("xpm",)),
    ("image/x-xbitmap", ("xbm",)),
    ("text/html", ("html",)),
    ("text/lml", ("lml",)),
    ("text/xml", ("xml",)),
    ("text/plain", ("txt",)),
    ("text/css", ("css",)),
]

MIME_TYPES: list[tuple[str, tuple[str, ...]]] = list(reversed(_DEFINITIONS))


def find_mime_type(name: str) -> tuple[str, tuple[str, ...]] | None:
    """find-mime-type (mime.lisp:63-65): case-insensitive name scan."""
    low = name.lower()
    for mt in MIME_TYPES:
        if mt[0].lower() == low:
            return mt
    return None


def find_mime_type_from_extension(
        extension: str) -> tuple[str, tuple[str, ...]] | None:
    """find-mime-type-from-extension (mime.lisp:49-61): exact extension
    match first, then the 3-character legacy-filesystem fallback."""
    low = extension.lower()
    for mt in MIME_TYPES:
        if any(e.lower() == low for e in mt[1]):
            return mt
    for mt in MIME_TYPES:
        # string-equal x y :end2 (min (length y) 3): whole query vs the
        # extension's first 3 chars (lengths must agree for equality)
        if any(low == e[:min(len(e), 3)].lower() for e in mt[1]):
            return mt
    return None


def exact_extension_map() -> dict[str, str]:
    """extension -> mime name under the registry's scan order (first match
    wins, matching find-mime-type-from-extension pass 1)."""
    out: dict[str, str] = {}
    for name, exts in MIME_TYPES:
        for e in exts:
            out.setdefault(e.lower(), name)
    return out


def legacy_prefix_map() -> dict[str, str]:
    """3-char query -> mime name for pass 2 of the lookup: every distinct
    first-3-chars prefix of a registered extension, first match in scan
    order wins."""
    out: dict[str, str] = {}
    for name, exts in MIME_TYPES:
        for e in exts:
            out.setdefault(e[:min(len(e), 3)].lower(), name)
    return out


def mime_extension_tables(spark):
    """(exact_df, legacy_df) broadcastable lookup tables: the registry as
    relational surface for per-document Content-Type classification."""
    exact = spark.createDataFrame(
        sorted(exact_extension_map().items()), "ext string, mime string")
    legacy = spark.createDataFrame(
        sorted(legacy_prefix_map().items()), "pre string, mime_l string")
    return exact, legacy
