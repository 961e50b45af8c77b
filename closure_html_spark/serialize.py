"""HAX-style event walk, LHTML builder and HTML string sink.

Reimplements from scratch:
  - serialize-pt / serialize-pt-attributes  html-parser.lisp:104-151
    (pre-order walk; xmlns/xmlns:* attributes dropped)
  - lhtml-builder                           lhtml.lisp:6-44
  - string sink                             unparse.lisp:68-217
      * no doctype unless system-id given (default path: none)
      * boolean attribute minimization when the attlist enum's first member
        equals the attribute name (unparse.lisp:104)
      * EMPTY elements get no end tag (:159-162)
      * %URI attributes percent-escaped for non-ASCII (:118-149)
      * script/style text written raw; other text & attr values escaped with
        the exact tables (:183-217)
"""

from __future__ import annotations

from .dtd import Dtd, PCDATA
from .parser.pda import Doc

# uri-attribute-p table (unparse.lisp:118-138), lowercase
URI_ATTRS = {
    "a": {"href", "name"},
    "area": {"href"},
    "link": {"href"},
    "img": {"src", "longdesc", "usemap"},
    "object": {"classid", "codebase", "data", "usemap"},
    "q": {"cite"},
    "blockquote": {"cite"},
    "inl": {"cite"},
    "del": {"cite"},
    "form": {"action"},
    "input": {"src", "usemap"},
    "head": {"profile"},
    "base": {"href"},
    "script": {"src"},
}


def _is_xmlns(name: str) -> bool:
    low = name.lower()
    return low == "xmlns" or low.startswith("xmlns:")


def visible_attrs(attrs):
    if not attrs:
        return []
    return [(n, v) for n, v in attrs if not _is_xmlns(n)]


# ---------------------------------------------------------------------------
# LHTML: (NAME, [(ATTR, value), ...], children...) as nested Python tuples


def doc_to_lhtml(doc: Doc, nid: int | None = None):
    if nid is None:
        nid = doc.root
    if doc.name[nid] == PCDATA:
        return doc.text[nid]
    children = tuple(doc_to_lhtml(doc, c) for c in doc.children[nid])
    return (doc.name[nid], tuple(visible_attrs(doc.attrs[nid]))) + children


def lhtml_to_json(node):
    """JSON-friendly render of LHTML for golden tests / debugging."""
    if isinstance(node, str):
        return node
    name, attrs = node[0], node[1]
    return [name, [[a, v] for a, v in attrs],
            [lhtml_to_json(c) for c in node[2:]]]


# ---------------------------------------------------------------------------
# String sink


def _escape_datachar(data: str) -> str:
    # unparse-datachar (unparse.lisp:199-208): & < > " TAB LF CR -- the
    # table hax:start-document routes doctype public/system ids through
    if not any(c in data for c in '&<>"\t\n\r'):
        return data
    return (data.replace("&", "&amp;").replace("<", "&lt;")
                .replace(">", "&gt;").replace('"', "&quot;")
                .replace("\t", "&#9;").replace("\n", "&#10;")
                .replace("\r", "&#13;"))


def _escape_datachar_readable(data: str) -> str:
    # unparse-datachar-readable (unparse.lisp:210-217): & < > " CR
    if not any(c in data for c in '&<>"\r'):
        return data
    return (data.replace("&", "&amp;").replace("<", "&lt;")
                .replace(">", "&gt;").replace('"', "&quot;")
                .replace("\r", "&#13;"))


def _escape_attribute(value: str) -> str:
    # unparse-attribute-string (unparse.lisp:183-197): & (unless &{) " LF CR
    out = []
    n = len(value)
    for i, c in enumerate(value):
        if c == "&":
            if i + 1 < n and value[i + 1] == "{":
                out.append(c)
            else:
                out.append("&amp;")
        elif c == '"':
            out.append("&quot;")
        elif c == "\n":
            out.append("&#10;")
        elif c == "\r":
            out.append("&#13;")
        else:
            out.append(c)
    return "".join(out)


def _escape_uri(value: str) -> str:
    # escape-uri-attribute (unparse.lisp:140-149): UTF-8 bytes >= 128 -> %XX
    raw = value.encode("utf-8")
    if all(b < 128 for b in raw):
        return value
    return "".join(chr(b) if b < 128 else f"%{b:02X}" for b in raw)


def serialize_doc(doc: Doc, dtd: Dtd, nid: int | None = None) -> str:
    """Serialize the (sub)tree to an escaped HTML string, reference-identical.
    No doctype is emitted (chtml:parse passes no system-id)."""
    if nid is None:
        nid = doc.root
    out: list[str] = []
    # iterative pre-order walk with explicit close events -- CC-scale pages
    # contain pathologically deep DOMs that would blow Python recursion
    stack: list[tuple] = [("open", nid, False)]
    while stack:
        ev, n, raw_text = stack.pop()
        if ev == "close":
            out.append("</")
            out.append(doc.name[n])
            out.append(">")
            continue
        name = doc.name[n]
        if name == PCDATA:
            data = doc.text[n] or ""
            out.append(data if raw_text else _escape_datachar_readable(data))
            continue
        attlist = dtd.attlist.get(name, ())
        out.append("<")
        out.append(name)
        for aname, avalue in visible_attrs(doc.attrs[n]):
            out.append(" ")
            out.append(aname)
            att = next((t for an, t in attlist if an == aname), None)
            # boolean minimization: enum list whose first member == attr name
            if isinstance(att, list) and att and att[0] == aname:
                continue
            out.append('="')
            value = avalue if isinstance(avalue, str) else str(avalue)
            if aname.lower() in URI_ATTRS.get(name.lower(), ()):  # %URI attr
                value = _escape_uri(value)
            out.append(_escape_attribute(value))
            out.append('"')
        out.append(">")
        child_raw = name in ("SCRIPT", "STYLE")
        if dtd.include.get(name):  # EMPTY elements get no end tag
            stack.append(("close", n, False))
        for c in reversed(doc.children[n]):
            stack.append(("open", c, child_raw))
    return "".join(out)
