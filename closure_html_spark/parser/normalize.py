"""Token normalization and attribute munging.

Reimplements read-token* (/root/reference/src/parse/sgml-parse.lisp:921-957)
and mungle-attlist / find-slot-value-pair (:982-997, :898-916).

Normalized token forms consumed by the PDA:
    ("S", NAME, atts)   start tag; pcdata becomes ("S", "#PCDATA", text)
    ("E", NAME)         end tag; eof becomes ("E", "%top")
    ("C", data)         comment

Notes on observed reference behavior (replicated deliberately):
  - Unknown element names are dropped entirely (warn level 4), including the
    NOSCRIPT special case (tag-exists? :959-967).
  - Empty tags <br/> are treated as start tags (:940-949).
  - name="value" attributes keep their value verbatim with the slot name
    upcased -- the DTD is NOT consulted for pairs (mungle-attlist :994-996).
  - Bare attributes are resolved against the DTD enum attlists via
    find-slot-value-pair; with *unmungle-attribute-case* = t (the chtml:parse
    path, html-parser.lisp:63) the resolved enum value is downcased.
    Unresolvable bare attributes are dropped.
"""

from __future__ import annotations

import re

from ..dtd import Dtd

PCDATA = "#PCDATA"
TOP = "%top"


def find_slot_value_pair(dtd: Dtd, tag: str, value: str):
    """First attlist slot whose enum list contains `value` (case-insensitive).
    Returns (slot_name, enum_value) or (None, None)."""
    vu = value.upper()
    for slot, typ in dtd.attlist.get(tag, ()):
        if isinstance(typ, list) and vu in typ:
            return slot, vu
    return None, None


_NAME_OK = re.compile(r"[A-Za-z][A-Za-z0-9.:\-]*\Z")
_INT_OK = re.compile(r"[+-]?[0-9]+\Z")


def canon_value(dtd: Dtd, tag: str, slot: str, value: str, warn=None):
    """Canonicalize an attribute value against its declared type
    (canon-value, sgml-parse.lisp:866-896).  NEVER called on the parse
    path -- the reference defines it and never calls it anywhere (verified
    by grep; mungle-attlist keeps name=value pairs verbatim) -- but it is
    part of the public surface, so it is exposed and tested here.

    enum -> the matching enum member (upcased) or None + warn;
    NUMBER -> int or None + warn; NAME/ID -> upcased name or None + warn;
    other declared slots -> value verbatim; undeclared slot -> None + warn."""
    looked = next((t for n, t in dtd.attlist.get(tag, ()) if n == slot), None)
    w = warn or (lambda level, msg: None)
    if isinstance(looked, list):
        vu = value.upper()
        if vu in looked:
            return vu
        w(3, f"{value!r} is a bad value for the '{slot}' slot of '<{tag}>'.")
        return None
    if looked == "NUMBER":
        if _INT_OK.match(value):
            return int(value)
        w(3, f"{value!r} is not NUMBER (attribute '{slot}' of '<{tag}>').")
        return None
    if looked in ("NAME", "ID"):
        if _NAME_OK.match(value):
            return value.upper()
        w(3, f"{value!r} is not NAME (attribute '{slot}' of '<{tag}>').")
        return None
    if looked is not None:
        return value
    w(3, f"The '<{tag}>' element has no '{slot}' slot.")
    return None


def mungle_attlist(dtd: Dtd, tag: str, atts: list, warn=None) -> list:
    out = []
    for x in atts:
        if isinstance(x, tuple):
            slot, value = x
            out.append((slot.upper(), value))
        else:
            slot, value = find_slot_value_pair(dtd, tag, x)
            if slot is not None:
                # foofoo -> "VALUE" then rod-downcase (unmungle case on)
                out.append((slot, value.lower()))
            elif warn is not None:
                # find-slot-value-pair fall-through (sgml-parse.lisp:908)
                warn(3, f"The '<{tag}>' tag has no slot which could take "
                        f"the '{x}' keyword.")
    return out


def build_end_hit(dtd: Dtd, m) -> tuple:
    """Memo entry (token | None, warns tuple) for a fast end-tag match."""
    name = m.group(1).upper()
    if name in dtd.valid_tags:
        return (("E", name), ())
    return (None, ((4, f"There is no such thing as </{name}> -- ignored."),))


def build_start_hit(dtd: Dtd, m) -> tuple:
    """Memo entry (token | None, warns tuple) for a fast start-tag match:
    read-token* start/empty handling + single-pass attr parse/mungle."""
    from .tokenizer import _FAST_ATTR
    wlist = []
    if m.group(3):
        # read-token* :empty-tag (sgml-parse.lisp:941)
        wlist.append((2, "Oops -- there is an empty tag; "
                         "but this is only HTML?!"))
    name = m.group(1).upper()
    if name not in dtd.valid_tags:
        wlist.append((4, f"There is no such thing as <{name}> -- ignored."))
        return (None, tuple(wlist))
    raw = m.group(2)
    mungled = []
    if raw:
        # parse + mungle attrs in ONE finditer pass
        al = dtd.attlist.get(name, ())
        for am in _FAST_ATTR.finditer(raw):
            aname, avalue = am.group(1), am.group(2)
            if avalue is not None:
                if avalue[0] in "\"'":
                    avalue = avalue[1:-1]
                mungled.append((aname.upper(), avalue))
            else:
                au = aname.upper()
                for slot, typ in al:
                    if type(typ) is list and au in typ:
                        mungled.append((slot, au.lower()))
                        break
                else:
                    # find-slot-value-pair fall-through (sgml-parse.lisp:908)
                    wlist.append((3, f"The '<{name}>' tag has no slot which "
                                     f"could take the '{aname}' keyword."))
    return (("S", name, mungled), tuple(wlist))


def normalized_tokens(tokenizer, dtd: Dtd):
    """Generator over normalized tokens, ending with ("E", "%top")."""
    warn = tokenizer.warn
    for tok in tokenizer.tokens():
        kind = tok[0]
        if kind == "pcdata":
            yield ("S", PCDATA, tok[1])
        elif kind == "start" or kind == "empty":
            if kind == "empty":
                # read-token* :empty-tag (sgml-parse.lisp:941)
                warn(2, "Oops -- there is an empty tag; but this is only HTML?!")
            name = tok[1]
            if dtd.tag_exists(name):
                yield ("S", name, mungle_attlist(dtd, name, tok[2], warn))
            else:
                warn(4, f"There is no such thing as <{name}> -- ignored.")
        elif kind == "end":
            name = tok[1]
            if dtd.tag_exists(name):
                yield ("E", name)
            else:
                warn(4, f"There is no such thing as </{name}> -- ignored.")
        elif kind == "comment":
            yield ("C", tok[1])
        elif kind == "pi":
            # read-token* :experimental-tag (sgml-parse.lisp:952)
            warn(2, f"Ignoreing processing instruction tag: '{tok[1]}'")
            continue
        elif kind == "define":
            continue
        elif kind == "eof":
            yield ("E", TOP)
            return


def tokenize_normalized(text: str, dtd: Dtd, tk=None):
    """Whole-document tokenize + normalize in one tight loop.

    Semantically identical to normalized_tokens(FastTokenizer(...)) but
    without generator layering or per-token dispatch overhead: the fast
    regexes run inline and only unusual syntax drops into the exact char
    machine.  Returns (token_list, tokenizer) -- the tokenizer carries the
    accumulated warnings.
    """
    from .tokenizer import (
        _FAST_ATTR,
        _FAST_END_TAG,
        _FAST_START_TAG,
        _SPECIAL,
        Tokenizer,
    )
    if tk is None:
        tk = Tokenizer(text, dtd.entities)
    s = text
    n = len(s)
    out = []
    append = out.append
    valid = dtd.valid_tags
    attlist = dtd.attlist
    warn = tk.warn
    warns_extend = tk.warnings.extend
    end_match = _FAST_END_TAG.match
    start_match = _FAST_START_TAG.match
    special_search = _SPECIAL.search
    # Whole-tag memo: raw matched tag text -> (token | None, warns tuple).
    # Tag vocab repeats heavily across a corpus, so most tags become one
    # dict hit; size-bounded so unique-attr floods (hrefs) can't grow it
    # without bound.  Tokens/attr lists are shared and never mutated.
    cache = dtd.tag_cache
    cache_get = cache.get
    i = 0
    while i < n:
        c = s[i]
        if c == "<":
            j = i + 1
            cj = s[j] if j < n else ""
            if cj == "/":
                m = end_match(s, j)
                if m is not None:
                    i = m.end()
                    hit = cache_get(m.group(0))
                    if hit is None:
                        hit = build_end_hit(dtd, m)
                        if len(cache) < 65536:
                            cache[m.group(0)] = hit
                    tok, ws = hit
                    if tok is not None:
                        append(tok)
                    if ws:
                        warns_extend(ws)
                    continue
            else:
                # no isalpha/isascii pre-check: the regex's leading [A-Za-z]
                # class rejects exactly the same first chars in C
                m = start_match(s, j)
                if m is not None:
                    i = m.end()
                    hit = cache_get(m.group(0))
                    if hit is None:
                        hit = build_start_hit(dtd, m)
                        if len(cache) < 65536:
                            cache[m.group(0)] = hit
                    tok, ws = hit
                    if tok is not None:
                        append(tok)
                    if ws:
                        warns_extend(ws)
                    continue
            # slow fallback for this one token
            tk.i = i
            tok = tk.read_token()
            i = tk.i
            kind = tok[0]
            if kind == "pcdata":
                append(("S", PCDATA, tok[1]))
            elif kind == "comment":
                append(("C", tok[1]))
            elif kind == "start" or kind == "empty":
                if kind == "empty":
                    warn(2, "Oops -- there is an empty tag; "
                            "but this is only HTML?!")
                name = tok[1]
                if dtd.tag_exists(name):
                    append(("S", name, mungle_attlist(dtd, name, tok[2], warn)))
                else:
                    warn(4, f"There is no such thing as <{name}> -- ignored.")
            elif kind == "end":
                name = tok[1]
                if dtd.tag_exists(name):
                    append(("E", name))
                else:
                    warn(4, f"There is no such thing as </{name}> -- ignored.")
            elif kind == "pi":
                warn(2, f"Ignoreing processing instruction tag: '{tok[1]}'")
            # define tags dropped; eof cannot occur here (i < n)
        else:
            m = special_search(s, i)
            if m is None:
                append(("S", PCDATA, s[i:]))
                i = n
            else:
                j = m.start()
                if s[j] == "<":
                    # s[i] != '<' here, so j > i strictly
                    append(("S", PCDATA, s[i:j]))
                    i = j
                else:
                    # entity present: exact machine for this pcdata run
                    tk.i = i
                    tok = tk.read_pcdata()
                    i = tk.i
                    append(("S", PCDATA, tok[1]))
    append(("E", TOP))
    return out, tk
