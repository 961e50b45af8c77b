"""DTD-driven PDA parser producing an array-encoded DOM.

Reimplements the reference parse loop and repair machinery:
  - sgml-parse main loop (2-token lookahead)  sgml-parse.lisp:1025-1106
  - transition rules (priority order)          :1111-1172
  - empty-element-p                            :1108-1109
  - white-space-token-p                        :1180-1183
  - tag-as-marker-p INCLUDING its bug          :1174-1178 (two `and` forms,
    only the last returned; with defaults *font-heuristic-p*=t and
    *anchor-heuristic-p*=nil the predicate is always nil, so FONT flows
    through the normal PDA + heuristic rules -- we replicate that and omit
    the HTAG machinery entirely)
  - heuristic repair rules (exact order)       :1213-1315
  - post-mortem/fix-top-level-structure        :1333-1396

The DOM is array-encoded (north-star requirement): parallel Python lists
name/attrs/text/parent plus per-node child index lists, built append-only
inside the vectorized UDF -- no per-node objects.
"""

from __future__ import annotations

from ..dtd import Dtd, PRESERVES_COMMENTS
from .normalize import PCDATA, TOP, normalized_tokens, tokenize_normalized
from .tokenizer import FastTokenizer, Tokenizer


class Doc:
    """Array-encoded DOM for one document."""

    __slots__ = ("name", "attrs", "text", "parent", "children", "root",
                 "warnings")

    def __init__(self):
        self.name: list[str] = []
        self.attrs: list = []       # list[(name, value)] or None
        self.text: list = []        # str for pcdata nodes, else None
        self.parent: list[int] = []
        self.children: list[list[int]] = []
        self.root = 0
        self.warnings: list[tuple[int, str]] = []

    def add(self, name, attrs, text, parent) -> int:
        nid = len(self.name)
        self.name.append(name)
        self.attrs.append(attrs)
        self.text.append(text)
        self.parent.append(parent)
        self.children.append([])
        if parent >= 0:
            self.children[parent].append(nid)
        return nid

    def walk(self, nid=None):
        """Pre-order iterator of (node_id, depth)."""
        if nid is None:
            nid = self.root
        stack = [(nid, 0)]
        children = self.children
        while stack:
            n, d = stack.pop()
            yield n, d
            stack.extend((c, d + 1) for c in reversed(children[n]))


def _etag(name):
    return ("E", name)


def _stag(name, atts=None):
    return ("S", name, atts if atts is not None else [])


_MAX_STEPS_SLACK = 10000


def sgml_parse(dtd: Dtd, text: str, tokenizer: Tokenizer | None = None) -> Doc:
    """Parse decoded text into a Doc rooted at a synthetic top node."""
    if tokenizer is not None:
        toks = list(normalized_tokens(tokenizer, dtd))
        tk = tokenizer
    else:
        toks, tk = tokenize_normalized(text, dtd)
    n_toks = len(toks)
    ti = 0

    doc = Doc()
    root = doc.add("%root", None, None, -1)
    s = root

    # local bindings for the hot loop (doc.add inlined below)
    d_name = doc.name
    d_attrs = doc.attrs
    d_text = doc.text
    d_parent = doc.parent
    d_children = doc.children

    stack = [_stag(TOP)]
    ein: list = []
    include_map = dtd.include
    roots = dtd.roots
    empty = dtd.empty
    resolve = dtd.resolve

    # runaway guard: transitions that never consume input are bounded
    budget = 10 * len(text) + _MAX_STEPS_SLACK

    while True:
        budget -= 1
        if budget < 0:
            tk.warn(5, "parser step budget exceeded -- document truncated")
            break
        while len(ein) < 2 and ti < n_toks:
            ein.append(toks[ti])
            ti += 1

        # ---- transition (sgml-parse.lisp:1111-1172), applied inline ----
        top = stack[-1] if stack else None
        if top is not None and top[1] == PCDATA:
            stack.pop()
            s = d_parent[s]
            continue
        if not ein:
            break  # accept (stack empty) or error; either way we are done
        see = ein[0]
        kind = see[0]
        if kind == "C":
            del ein[0]
            if top is not None and top[1] in PRESERVES_COMMENTS:
                nid = len(d_name)
                d_name.append(PCDATA)
                d_attrs.append(None)
                d_text.append(see[1])
                d_parent.append(s)
                d_children.append([])
                d_children[s].append(nid)
            continue
        if kind == "E" and top is not None and top[1] == see[1]:
            stack.pop()
            del ein[0]
            s = d_parent[s]
            continue
        top_inc = None
        if top is not None:
            tn = top[1]
            top_inc = roots if tn == TOP else include_map[tn]
        if kind == "S" and top is not None and see[1] in top_inc:
            del ein[0]
            nid = len(d_name)
            if see[1] in empty:
                if see[1] == PCDATA:
                    d_name.append(PCDATA)
                    d_attrs.append(None)
                    d_text.append(see[2])
                else:
                    d_name.append(see[1])
                    d_attrs.append(see[2])
                    d_text.append(None)
                d_parent.append(s)
                d_children.append([])
                d_children[s].append(nid)
            else:
                stack.append(see)
                d_name.append(see[1])
                d_attrs.append(see[2])
                d_text.append(None)
                d_parent.append(s)
                d_children.append([])
                d_children[s].append(nid)
                s = nid
            continue
        if (kind == "S" and see[1] == PCDATA and top is not None
                and see[2].strip(" \t\n\r\x0c") == ""
                and PCDATA not in top_inc):
            del ein[0]  # ignorable whitespace (:1157-1161)
            continue
        if not stack:
            tk.warn(5, f"Oops empty stack in TRANSITION on {see!r}.")
            break
        x = resolve.get((top[1], kind, see[1]))
        if x is not None:
            ein.insert(0, _stag(x[1]) if x[0] == "S" else _etag(x[1]))
            continue
        ein = _heuristic(dtd, tk, top, ein)

    doc.warnings = tk.warnings
    doc.root = root
    return doc


def _heuristic(dtd: Dtd, tk: Tokenizer, context, ein: list) -> list:
    """Inline repair rules (sgml-parse.lisp:1213-1315), exact order."""
    see = ein[0]
    ctx_name = context[1]
    eqv = dtd.eqv_eq

    def is_(tag: str) -> bool:
        # `is` in the reference: context matches `state` via elms-eqv and
        # the token matches `tag` via elms-eqv; "/NAME" means end tag.
        if tag.startswith("/"):
            return see[0] == "E" and eqv(see[1], tag[1:])
        return see[0] == "S" and eqv(see[1], tag)

    def in_(state: str) -> bool:
        return eqv(state, ctx_name)

    close_ctx = [_etag(ctx_name)] + ein
    close_reopen = [_etag(ctx_name), see, context] + ein[1:]

    if "HTML" in dtd.roots:
        if see[0] == "E" and see[1] == TOP:
            return close_ctx
        if see[0] == "S" and see[1] == "STYLE":
            return [_stag("SPAN", [("CLASS", "illegalstyle")])] + ein[1:]
        if in_("H1") and is_("CENTER"):
            return close_reopen
        if in_("FONT") and (is_("CENTER") or is_("P")):
            return close_reopen
        if in_("I") and is_("HR"):
            return close_reopen
        if eqv(ctx_name, "FONT"):
            return close_ctx
        if in_("CENTER") and is_("TR"):
            return close_ctx
        if in_("H1") and is_("/H2"):
            return close_ctx
        if in_("H1") and is_("UL"):
            return close_ctx
        if in_("H3") and is_("/CENTER"):
            return close_ctx
        if in_("DIV") and is_("/TD"):
            return close_ctx
        if in_("UL") and (is_("P") or is_("A") or is_("IMG") or is_(PCDATA)):
            return [_stag("LI")] + ein
        if in_("TABLE") and is_("TD"):
            return [_stag("TR")] + ein
        if in_("TABLE") and is_(PCDATA):
            return close_reopen
        if in_("NOSCRIPT") and is_("FRAMESET"):
            return close_ctx
        if in_("TABLE") and is_("FORM"):
            return close_reopen
        if in_("TBODY") and is_("/FORM") and len(ein) >= 2:
            return [ein[1], ein[0]] + ein[2:]
        if (in_("LI") or in_("UL")) and (is_("TD") or is_("/TD")):
            return close_ctx
    # default: drop the offending token (document-action :1199-1211)
    tk.warn(4, f"[-] Saw {see[:2]!r} in {ctx_name} -- nuked.")
    return ein[1:]


# ---------------------------------------------------------------------------
# Post-mortem top-level fixup (sgml-parse.lisp:1333-1396)

def post_mortem_fix_top_level(doc: Doc) -> int:
    """Merge multiple HTML/HEAD/BODY into the canonical
    HTML(HEAD(...), BODY(...)|FRAMESET(...)) shape.  Returns new root id."""
    head_elts: list[int] = []
    body_elts: list[int] = []
    frameset_elts: list[int] = []
    body = -1
    frameset = -1

    top_children = doc.children[doc.root]
    if len(top_children) > 1:
        doc.warnings.append((4, "Multiple HTML elements in document."))
    for k in top_children:
        if doc.name[k] != "HTML":
            continue  # grammar guarantees HTML here; tolerate otherwise
        for kk in doc.children[k]:
            nm = doc.name[kk]
            if nm == "HEAD":
                if head_elts:
                    doc.warnings.append((4, "Multiple HEAD elements."))
                head_elts.extend(doc.children[kk])
            elif nm == "BODY":
                body = kk
                if body_elts:
                    doc.warnings.append((4, "Multiple BODY elements."))
                body_elts.extend(doc.children[kk])
            elif nm == "FRAMESET":
                frameset = kk
                frameset_elts.extend(doc.children[kk])

    html = doc.add("HTML", None, None, -1)
    head = doc.add("HEAD", None, None, html)
    doc.children[head] = head_elts
    for k in head_elts:
        doc.parent[k] = head

    if frameset >= 0:
        if body >= 0:
            doc.warnings.append(
                (4, "Body present while FRAMSET is present -- nuked!"))
            body = -1
            body_elts = []
        doc.parent[frameset] = html
        doc.children[frameset] = frameset_elts
        for k in frameset_elts:
            doc.parent[k] = frameset
        doc.children[html].append(frameset)
    else:
        if body >= 0:
            doc.parent[body] = html
            doc.children[body] = body_elts
        else:
            body = doc.add("BODY", None, None, html)
            doc.children[body] = body_elts
        for k in body_elts:
            doc.parent[k] = body
        if body not in doc.children[html]:
            doc.children[html].append(body)

    doc.root = html
    return html


def parse_html(dtd: Dtd, text: str) -> Doc:
    """Full parse: PDA + post-mortem.  (The FONT HTAG post-mortem pass is
    unreachable with default flags due to the tag-as-marker-p bug; not
    implemented -- see module docstring.)"""
    doc = sgml_parse(dtd, text)
    post_mortem_fix_top_level(doc)
    return doc
