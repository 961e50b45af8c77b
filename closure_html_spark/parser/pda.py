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
from .normalize import (
    PCDATA,
    TOP,
    build_end_hit,
    build_start_hit,
    mungle_attlist,
    normalized_tokens,
    tokenize_normalized,
)
from .tokenizer import (
    _FAST_END_TAG,
    _FAST_START_TAG,
    _SPECIAL,
    FastTokenizer,
    Tokenizer,
    decode_pcdata_fast,
)

_DONE = object()       # production sentinel: input exhausted
_EOF_TOK = ("E", TOP)  # read-token* :eof (sgml-parse.lisp:956-957)


class Doc:
    """Array-encoded DOM for one document."""

    __slots__ = ("name", "attrs", "text", "parent", "children", "root",
                 "warnings", "markers")

    def __init__(self):
        self.name: list[str] = []
        self.attrs: list = []       # list[(name, value)] or None
        self.text: list = []        # str for pcdata nodes, else None
        self.parent: list[int] = []
        self.children: list[list[int]] = []
        self.root = 0
        self.warnings: list[tuple[int, str]] = []
        # nid -> "S"|"E" for HSTAG/HETAG marker nodes (font_htag mode only;
        # hstag-node/hetag-node, sgml-parse.lisp:165-167); all removed by
        # post_mortem_fix_font before any consumer sees the tree
        self.markers: dict[int, str] = {}

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


# ---------------------------------------------------------------------------
# Fused action tables: one dict hit replaces the transition's chain of
# include/empty/resolve lookups (sgml-parse.lisp:1111-1172, same priority
# order, precomputed per context).  Action encodings:
#   ("P",)        legal #PCDATA           -> text leaf
#   ("L",)        legal empty element     -> element leaf
#   ("O",)        legal container element -> open (push)
#   ("X",)        end tag matching ctx    -> close (pop)
#   ("R", tok)    resolve hit             -> insert synthesized tok, retry
#   ("W", fb)     illegal #PCDATA         -> ignore iff all-whitespace,
#                                            else fall back to fb (R or H)
#   ("H",)        no rule                 -> heuristic repair
_ACT_H = ("H",)
_ACT_O = ("O",)
_ACT_L = ("L",)
_ACT_P = ("P",)
_ACT_X = ("X",)


def _build_ctx_actions(dtd: Dtd, ctx: str):
    """(smap, emap) for one context element, covering every token name."""
    inc = dtd.roots if ctx == TOP else dtd.include[ctx]
    empty = dtd.empty
    resolve = dtd.resolve
    names = set(dtd.element_names)
    names.add(PCDATA)
    smap = {}
    emap = {}
    for nm in names:
        if nm in inc:
            if nm == PCDATA:
                smap[nm] = _ACT_P
            elif nm in empty:
                smap[nm] = _ACT_L
            else:
                smap[nm] = _ACT_O
        else:
            x = resolve.get((ctx, "S", nm))
            act = (("R", _stag(x[1]) if x[0] == "S" else _etag(x[1]))
                   if x is not None else _ACT_H)
            smap[nm] = ("W", act) if nm == PCDATA else act
    names.add(TOP)
    for nm in names:
        if nm == ctx:
            emap[nm] = _ACT_X
        else:
            x = resolve.get((ctx, "E", nm))
            emap[nm] = (("R", _stag(x[1]) if x[0] == "S" else _etag(x[1]))
                        if x is not None else _ACT_H)
    return smap, emap


_EMPTY_MAP: dict = {}


def sgml_parse(dtd: Dtd, text: str, tokenizer: Tokenizer | None = None,
               font_htag: bool = False) -> Doc:
    """Parse decoded text into a Doc rooted at a synthetic top node.

    With an explicit tokenizer this runs the direct transcription of the
    reference loop (_sgml_parse_ref); the default path runs the fused
    action-table engine, which the differential fuzz pins token- and
    serialization-identical to the reference loop.

    font_htag=True enables the reference's FONT-as-marker mode: FONT tags
    bypass the PDA and land in the tree as HSTAG/HETAG marker nodes
    (transition :1130-1134) for post_mortem_fix_font to pair and wrap.
    The reference can never reach this path: tag-as-marker-p
    (sgml-parse.lisp:1174-1178) discards its first `and` form, so the
    default flags make it constantly nil -- this flag is the fixed,
    opt-in variant SURVEY §7 promised."""
    if tokenizer is not None:
        return _sgml_parse_ref(dtd, text, tokenizer, font_htag)

    # Fully fused single loop: tokenize + normalize + PDA.  Tokens are
    # produced on demand (no intermediate token list); tag tokens come out
    # of the per-DTD whole-tag memo, unusual syntax drops into the exact
    # char machine one token at a time.  The differential fuzz pins this
    # engine token- and serialization-identical to _sgml_parse_ref.
    tk = Tokenizer(text, dtd.entities)
    src = text
    n = len(src)
    i = 0
    cache = dtd.tag_cache
    cache_get = cache.get
    pcache = dtd.pcdata_cache
    pcache_get = pcache.get
    valid = dtd.valid_tags
    attlist = dtd.attlist
    warn = tk.warn
    warns_extend = tk.warnings.extend
    end_match = _FAST_END_TAG.match
    start_match = _FAST_START_TAG.match
    special_search = _SPECIAL.search
    eof_sent = False

    def _slow_token():
        """One raw token via the exact char machine, normalized.
        Returns the normalized token or None (dropped)."""
        nonlocal i
        tk.i = i
        tok = tk.read_token()
        i = tk.i
        k0 = tok[0]
        if k0 == "pcdata":
            return ("S", PCDATA, tok[1])
        if k0 == "comment":
            return ("C", tok[1])
        if k0 == "start" or k0 == "empty":
            if k0 == "empty":
                warn(2, "Oops -- there is an empty tag; "
                        "but this is only HTML?!")
            nm = tok[1]
            if nm in valid:
                return ("S", nm, mungle_attlist(dtd, nm, tok[2], warn))
            warn(4, f"There is no such thing as <{nm}> -- ignored.")
        elif k0 == "end":
            nm = tok[1]
            if nm in valid:
                return ("E", nm)
            warn(4, f"There is no such thing as </{nm}> -- ignored.")
        elif k0 == "pi":
            warn(2, f"Ignoreing processing instruction tag: '{tok[1]}'")
        # define tags dropped; eof cannot occur here (callers check i < n)
        return None

    doc = Doc()
    root = doc.add("%root", None, None, -1)
    s = root

    d_name = doc.name
    d_attrs = doc.attrs
    d_text = doc.text
    d_parent = doc.parent
    d_children = doc.children

    stack = [_stag(TOP)]   # open-element tokens (heuristic context)
    # parent-context action maps, restored on close without a dict lookup;
    # the sentinel pair plays the empty-stack role
    mstack = [(_EMPTY_MAP, _EMPTY_MAP)]
    pending: list = []     # LIFO of synthesized / pushed-back tokens
    actions = dtd.pda_actions
    pair = actions.get(TOP)
    if pair is None:
        pair = actions[TOP] = _build_ctx_actions(dtd, TOP)
    smap, emap = pair
    nn = 1  # next node id (root is 0)

    # Consuming transitions are bounded by the input; only the inserting
    # ones (resolve / heuristic) can loop, so only they pay the budget.
    budget = 10 * n + _MAX_STEPS_SLACK

    while True:
        # ---- next token (fused tokenizer) --------------------------------
        if pending:
            see = pending.pop()
        else:
            see = None
            while see is None:
                if i >= n:
                    if eof_sent:
                        see = _DONE
                        break
                    eof_sent = True
                    see = _EOF_TOK
                    break
                c = src[i]
                if c == "<":
                    j = i + 1
                    if j < n and src[j] == "/":
                        m = end_match(src, j)
                        if m is not None:
                            i = m.end()
                            hit = cache_get(m.group(0))
                            if hit is None:
                                hit = build_end_hit(dtd, m)
                                if len(cache) < 65536:
                                    cache[m.group(0)] = hit
                            see, ws = hit
                            if ws:
                                warns_extend(ws)
                            continue
                    else:
                        m = start_match(src, j)
                        if m is not None:
                            i = m.end()
                            hit = cache_get(m.group(0))
                            if hit is None:
                                hit = build_start_hit(dtd, m)
                                if len(cache) < 65536:
                                    cache[m.group(0)] = hit
                            see, ws = hit
                            if ws:
                                warns_extend(ws)
                            continue
                    see = _slow_token()
                else:
                    m = special_search(src, i)
                    if m is None:
                        see = ("S", PCDATA, src[i:])
                        i = n
                    elif src[m.start()] == "<":
                        j = m.start()  # j > i strictly (src[i] != '<')
                        see = ("S", PCDATA, src[i:j])
                        i = j
                    else:
                        # entity present: the gap ends at the next '<'
                        # (read-pcdata stops only there); short gaps repeat
                        # across a corpus (' &amp; ', '&nbsp;' runs), so
                        # memoize decoded token + warns per raw gap
                        lt = src.find("<", i)
                        end = n if lt < 0 else lt
                        raw = src[i:end]
                        hit = pcache_get(raw)
                        if hit is not None:
                            see, ws = hit
                            if ws:
                                warns_extend(ws)
                            i = end
                        else:
                            # inline decode of the warning-free common
                            # forms; the exact char machine handles the
                            # rest (unknown names, no ';', overflow, EOF)
                            dec = decode_pcdata_fast(raw, tk.entities)
                            if dec is not None:
                                see = ("S", PCDATA, dec)
                                i = end
                                if len(raw) <= 256 and len(pcache) < 16384:
                                    pcache[raw] = (see, ())
                            else:
                                w0 = len(tk.warnings)
                                tk.i = i
                                tok = tk.read_pcdata()
                                i = tk.i
                                see = ("S", PCDATA, tok[1])
                                # gaps ending in an INCOMPLETE reference
                                # ('&', '&#', '&#x') warn differently at
                                # EOF vs before '<' (read-entity-ref's EOF
                                # branches), so their decode is not a pure
                                # function of the raw gap -- never memoize
                                if (len(raw) <= 256 and len(pcache) < 16384
                                        and raw[-1] != "&"
                                        and not raw.endswith("&#")
                                        and not raw.endswith("&#x")):
                                    pcache[raw] = (
                                        see, tuple(tk.warnings[w0:]))
            if see is _DONE:
                break
        kind = see[0]
        if font_htag and see[1] == "FONT" and kind != "C":
            # tag-as-marker: consume as an HSTAG/HETAG marker child of the
            # current node, no stack change (transition :1130-1134 +
            # :htag emission :1087-1104)
            nid = nn
            nn += 1
            d_name.append("FONT")
            d_attrs.append(see[2] if kind == "S" else None)
            d_text.append(None)
            d_parent.append(s)
            d_children.append([])
            d_children[s].append(nid)
            doc.markers[nid] = kind
            continue
        if kind == "S":
            act = smap.get(see[1])
        elif kind == "E":
            act = emap.get(see[1])
        else:  # comment
            if stack and stack[-1][1] in PRESERVES_COMMENTS:
                d_name.append(PCDATA)
                d_attrs.append(None)
                d_text.append(see[1])
                d_parent.append(s)
                d_children.append([])
                d_children[s].append(nn)
                nn += 1
            continue
        if act is None:
            # only possible with an empty stack (maps swapped to _EMPTY_MAP)
            tk.warn(5, f"Oops empty stack in TRANSITION on {see!r}.")
            break
        a = act[0]
        if a == "P":  # pcdata leaf
            d_name.append(PCDATA)
            d_attrs.append(None)
            d_text.append(see[2])
            d_parent.append(s)
            d_children.append([])
            d_children[s].append(nn)
            nn += 1
            continue
        if a == "O":  # open container
            d_name.append(see[1])
            d_attrs.append(see[2])
            d_text.append(None)
            d_parent.append(s)
            d_children.append([])
            d_children[s].append(nn)
            stack.append(see)
            mstack.append(pair)
            pair = actions.get(see[1])
            if pair is None:
                pair = actions[see[1]] = _build_ctx_actions(dtd, see[1])
            smap, emap = pair
            s = nn
            nn += 1
            continue
        if a == "X":  # close
            stack.pop()
            s = d_parent[s]
            pair = mstack.pop()
            smap, emap = pair
            continue
        if a == "L":  # empty element leaf
            d_name.append(see[1])
            d_attrs.append(see[2])
            d_text.append(None)
            d_parent.append(s)
            d_children.append([])
            d_children[s].append(nn)
            nn += 1
            continue
        if a == "R":  # resolve: insert synthesized token before see
            budget -= 1
            if budget < 0:
                tk.warn(5, "parser step budget exceeded -- document truncated")
                break
            pending.append(see)
            pending.append(act[1])
            continue
        if a == "W":  # illegal pcdata: ignorable whitespace (:1157-1161)
            if see[2].strip(" \t\n\r\x0c") == "":
                continue
            fb = act[1]
            if fb[0] == "R":
                budget -= 1
                if budget < 0:
                    tk.warn(5,
                            "parser step budget exceeded -- document truncated")
                    break
                pending.append(see)
                pending.append(fb[1])
                continue
            # fall through to heuristic
        # ---- heuristic repair (rare) -------------------------------------
        budget -= 1
        if budget < 0:
            tk.warn(5, "parser step budget exceeded -- document truncated")
            break
        if pending:
            nxt = pending.pop()
        else:
            # pull one lookahead token via the exact machine (rare path)
            nxt = None
            while nxt is None:
                if i >= n:
                    if not eof_sent:
                        eof_sent = True
                        nxt = _EOF_TOK
                    break
                nxt = _slow_token()
        ein = [see] if nxt is None else [see, nxt]
        new_ein = _heuristic(dtd, tk, stack[-1], ein)
        for t in reversed(new_ein):
            pending.append(t)

    doc.warnings = tk.warnings
    doc.root = root
    return doc


def _sgml_parse_ref(dtd: Dtd, text: str, tokenizer: Tokenizer,
                    font_htag: bool = False) -> Doc:
    """Direct transcription of the reference main loop (sgml-parse.lisp:
    1025-1106); kept as the differential-testing twin of the fused engine."""
    toks = list(normalized_tokens(tokenizer, dtd))
    tk = tokenizer
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
        if font_htag and see[1] == "FONT":
            # tag-as-marker (transition :1130-1134): HSTAG/HETAG marker
            # node appended to the current node, no stack change
            del ein[0]
            nid = len(d_name)
            d_name.append("FONT")
            d_attrs.append(see[2] if kind == "S" else None)
            d_text.append(None)
            d_parent.append(s)
            d_children.append([])
            d_children[s].append(nid)
            doc.markers[nid] = kind
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
        # INTENTIONAL DEVIATION from sgml-parse.lisp:1290-1294: the
        # reference swaps the first two queue items unconditionally --
        # `(list* (cadr eingabe) (car eingabe) (cddr eingabe))` -- so a
        # 1-token queue splices NIL into the token stream (its own comment
        # concedes "we should better check here wether FORM is open at
        # all").  With only the /FORM queued there is nothing to swap
        # behind; we fall through to the default drop (warn level 4)
        # instead of enqueueing a bogus token.  Pinned both ways by
        # tests/test_parser_golden.py::test_form_in_tbody_queue_depth.
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


# ---------------------------------------------------------------------------
# FONT post-mortem (opt-in font_htag mode; sgml-parse.lisp:1398-1556,
# 1665-1690).  Unreachable in the reference itself (tag-as-marker-p bug);
# this is the fixed variant behind a flag.

def _pt_path(doc: Doc, nid: int) -> list[int] | None:
    """Child-index path from doc.root to nid (pt-path equivalent)."""
    path = []
    while nid != doc.root:
        p = doc.parent[nid]
        if p < 0:
            return None
        path.append(doc.children[p].index(nid))
        nid = p
    path.reverse()
    return path


def _pt_access(doc: Doc, path: list[int]) -> int:
    nid = doc.root
    for i in path:
        nid = doc.children[nid][i]
    return nid


def _remove_pt(doc: Doc, nid: int):
    p = doc.parent[nid]
    if p >= 0:
        doc.children[p].remove(nid)
    doc.parent[nid] = -1


def map_htag_pairs(doc: Doc, continuation, gi: str = "FONT"):
    """Pre-order pairing of HSTAG/HETAG markers, inner pairs first
    (map-htag-pairs, sgml-parse.lisp:1558-1586).  Iterative with an
    explicit stack (round-6 verdict #5: the recursive form unified with
    Doc.walk's iterative idiom -- a 1000+-deep repaired tree must not
    hit the Python recursion limit in font_htag mode); like the
    recursive original, a node's children are snapshotted before any
    continuation mutation can reparent them, and marker nodes are not
    descended into."""
    stack: list[int] = []
    markers = doc.markers
    todo: list[int] = [doc.root]
    while todo:
        x = todo.pop()
        m = markers.get(x)
        if m == "S" and doc.name[x] == gi:
            stack.append(x)
        elif m == "E" and doc.name[x] == gi:
            if not stack:
                _remove_pt(doc, x)
                doc.warnings.append((4, f"Superfluous {gi} end tag."))
            else:
                continuation(stack.pop(), x)
        else:
            todo.extend(reversed(doc.children[x]))
    if stack:
        doc.warnings.append((4, f"Unclosed {gi} elements."))
        new = []
        for _ in stack:
            nid = doc.add(gi, None, None, doc.root)
            doc.markers[nid] = "E"
            new.append(nid)
        for stag, etag in zip(stack, new):
            continuation(stag, etag)


_MUNGLE_MAX_DEPTH = 200


def mungle_font_pair(dtd: Dtd, doc: Doc, tag: int, s, e, depth: int = 0):
    """Path-based wrap algorithm (mungle-font-pair, sgml-parse.lisp:1493-
    1556), ported quirk-for-quirk: the prefix-equality guards on the
    unequal-length branches are QUOTED in the reference (always true), so
    those branches fire on length alone; we keep that behavior."""
    if depth > _MUNGLE_MAX_DEPTH:
        raise RecursionError("mungle-font-pair runaway")
    if s == e:
        return
    if len(s) == len(e) and s[:-1] == e[:-1]:
        if s[-1] > e[-1]:
            # inverted span (possible after earlier mungles shift indices):
            # the reference's before/after slicing would duplicate nodes
            # here; treat as spanning nothing instead
            return
        p = _pt_access(doc, s[:-1])
        pinc = dtd.include.get(doc.name[p])
        span = range(s[-1], e[-1])
        ok = pinc is not None and "FONT" in pinc
        if ok:
            finc = dtd.include["FONT"]
            for j in span:
                cname = doc.name[doc.children[p][j]]
                if cname not in finc:
                    ok = False
                    break
        if ok:
            kids = doc.children[p]
            between = kids[s[-1]:e[-1]]
            # doc.add with parent -1 skips the child-link auto-append;
            # parent/children are wired manually below
            new = doc.add("FONT", doc.attrs[tag], None, -1)
            doc.parent[new] = p
            doc.children[new] = between
            doc.children[p] = kids[:s[-1]] + [new] + kids[e[-1]:]
            for k in between:
                doc.parent[k] = new
        else:
            for i in span:
                child = doc.children[p][i]
                mungle_font_pair(
                    dtd, doc, tag,
                    s[:-1] + [i, 0],
                    s[:-1] + [i, len(doc.children[child])], depth + 1)
        return
    if len(s) < len(e):
        v = e[:len(s)]
        mungle_font_pair(dtd, doc, tag, v + [0], e, depth + 1)
        mungle_font_pair(dtd, doc, tag, s, v, depth + 1)
        return
    if len(s) > len(e):
        v = s[:len(e)]
        mungle_font_pair(dtd, doc, tag, v[:-1] + [v[-1] + 1], e, depth + 1)
        m = len(doc.children[_pt_access(doc, v)])
        mungle_font_pair(dtd, doc, tag, s, v + [m], depth + 1)
        return
    # equal length, different interior: split at first divergence (:1541-1553)
    i = 0
    while i < len(s) and i < len(e) and s[i] == e[i]:
        i += 1
    v1 = s[:i] + [s[i] + 1]
    mungle_font_pair(dtd, doc, tag, s, v1, depth + 1)
    mungle_font_pair(dtd, doc, tag, v1, e, depth + 1)


def post_mortem_fix_font(doc: Doc, dtd: Dtd) -> Doc:
    """Pair every HSTAG/HETAG FONT marker and wrap the spanned content in
    real FONT elements (post-mortem/fix-font, sgml-parse.lisp:1665-1690)."""
    pairs: list[tuple[int, int]] = []
    map_htag_pairs(doc, lambda st, et: pairs.append((st, et)), "FONT")
    for stag, etag in pairs:
        s = _pt_path(doc, stag)
        _remove_pt(doc, stag)
        e = _pt_path(doc, etag)
        _remove_pt(doc, etag)
        if s is not None and e is not None:
            mungle_font_pair(dtd, doc, stag, s, e)
    doc.markers.clear()
    return doc


def check_saneness(doc: Doc, dtd: Dtd) -> list[str]:
    """Runnable port of check-saneness (sgml-parse.lisp:1630-1638): walk the
    tree and report (a) children not allowed by the parent's DTD inclusion
    set, (b) broken parent/child linkage.  (The HTAG check is moot: the
    HTAG machinery is unreachable, see module docstring.)  Returns the list
    of complaint strings -- empty on a sane tree."""
    out = []
    name = doc.name
    children = doc.children
    parent = doc.parent
    for nid, _ in doc.walk():
        gi = name[nid]
        inc = dtd.roots if gi == TOP else dtd.include.get(gi)
        for k in children[nid]:
            if inc is not None and name[k] not in inc and name[k] != PCDATA:
                out.append(f"Unallowed {name[k]} element within {gi}.")
            if parent[k] != nid:
                out.append("Parent/child linkage broken.")
    return out


def parse_html(dtd: Dtd, text: str, font_htag: bool = False) -> Doc:
    """Full parse: PDA + post-mortem (post-mortem-heuristic order,
    sgml-parse.lisp:1326-1331: fix-font first when enabled, then
    fix-top-level).  font_htag=False matches the reference's observable
    default behavior, where the tag-as-marker-p bug makes the FONT HTAG
    machinery unreachable; font_htag=True opts into the fixed variant."""
    doc = sgml_parse(dtd, text, font_htag=font_htag)
    if font_htag:
        post_mortem_fix_font(doc, dtd)
    post_mortem_fix_top_level(doc)
    return doc
