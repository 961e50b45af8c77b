"""Charset sniffing and two-phase decode.

The reference switches the stream decoder mid-parse when it sees
<meta http-equiv="Content-Type" content="...; charset=X">
(handle-meta-tag-in-parser, sgml-parse.lisp:1013-1023) after forcing the
stream to UTF-8 at parse start (html-parser.lisp:61).  The batch-correct
equivalent is a two-phase decode: sniff BOM + meta charset on the raw byte
prefix, then decode the whole document ONCE with the winning charset.
For documents whose pre-<meta> prefix is ASCII (in practice: all), this is
byte-identical to the reference's mid-stream switch.
"""

from __future__ import annotations

import codecs
import re

# scan window for the <meta> charset declaration
SNIFF_LIMIT = 4096

_META_CHARSET = re.compile(
    rb"""<meta[^>]{0,500}?charset\s*=\s*['"]?\s*([A-Za-z0-9._:\-]+)""",
    re.IGNORECASE | re.DOTALL,
)

_ALIASES = {
    "iso-8859-1": "latin-1",
    "windows-1257": "cp1257",
    "windows-1251": "cp1251",
    "windows-1252": "cp1252",
    "shift_jis": "shift_jis",
    "x-sjis": "shift_jis",
    "euc-jp": "euc_jp",
}


def sniff_charset(raw: bytes, default: str = "utf-8") -> str:
    """BOM first, then <meta> charset within the first SNIFF_LIMIT bytes."""
    if raw.startswith(b"\xef\xbb\xbf"):
        return "utf-8-sig"
    if raw.startswith(b"\xff\xfe"):
        return "utf-16-le"
    if raw.startswith(b"\xfe\xff"):
        return "utf-16-be"
    m = _META_CHARSET.search(raw[:SNIFF_LIMIT])
    if m:
        name = m.group(1).decode("ascii", "replace").lower()
        name = _ALIASES.get(name, name)
        try:
            codecs.lookup(name)
            return name
        except LookupError:
            return default  # "There is no such encoding" warn path (:1607-1612)
    return default


def decode_html(raw: bytes, default: str = "utf-8") -> tuple[str, str]:
    """Returns (text, charset_used). Decode errors are replaced, never raised
    (a 10^12-doc corpus always contains garbage)."""
    cs = sniff_charset(raw, default)
    try:
        return raw.decode(cs, errors="replace"), cs
    except (LookupError, ValueError):
        return raw.decode("latin-1", errors="replace"), "latin-1"
