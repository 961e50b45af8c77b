"""Runtime DTD tables.

Loads the compiled dtd.json artifact (produced by compiler.py from the
HTML-4.0 Frameset DTD chain) into plain dicts.  One instance per Python
worker process, cached at module level -- functionally equivalent to a
Spark broadcast variable for this small static table, but simpler because
the artifact ships inside the package (--py-files).

Reference semantics: sgml-dtd.lisp element/entity/resolve accessors
(find-element :284-294, elm-inclusion :504-508, resolve :601-602,
elms-eqv :609-614).
"""

from __future__ import annotations

import json


_DTD = None

# Elements whose content preserves comment tokens (sgml-parse.lisp:142-144)
PRESERVES_COMMENTS = frozenset({"STYLE", "SCRIPT"})

PCDATA = "#PCDATA"
TOP = "%top"


class Dtd:
    __slots__ = (
        "include", "exclude", "obegin", "oend", "attlist", "entities",
        "roots", "resolve", "eqv", "empty", "surclusion", "element_names",
        "valid_tags",
    )

    def __init__(self, data: dict):
        els = data["elements"]
        self.include = {k: frozenset(v["include"]) for k, v in els.items()}
        self.exclude = {k: frozenset(v["exclude"]) for k, v in els.items()}
        self.obegin = {k: v["obegin"] for k, v in els.items()}
        self.oend = {k: v["oend"] for k, v in els.items()}
        # attlist: ordered list of (name, type); type: True | "NUMBER" | "NAME"
        # | "ID" | [enum...]
        self.attlist = {k: [(n, t) for n, t in v["attlist"]] for k, v in els.items()}
        self.entities = data["entities"]
        self.roots = frozenset(data["roots"])
        # resolve: (state, kind, name) -> (kind, name); kind in {S, E}
        self.resolve = {}
        for k, v in data["resolve"].items():
            state, kind, name = k.split("|")
            self.resolve[(state, kind, name)] = (v[0], v[1])
        self.eqv = data["eqv_class"]
        self.surclusion = {k: frozenset(v) for k, v in data["surclusion"].items()}
        self.element_names = frozenset(els.keys())
        # tag-exists? precomputed (NOSCRIPT special-cased out, :959-967)
        self.valid_tags = self.element_names - {"NOSCRIPT"}
        # empty-element-p (sgml-parse.lisp:1108-1109): empty include set
        self.empty = frozenset(k for k, v in self.include.items() if not v)

    def inclusion(self, x: str) -> frozenset:
        if x == TOP:
            return self.roots
        return self.include[x]

    def tag_exists(self, name: str) -> bool:
        # tag-exists? (sgml-parse.lisp:959-967): NOSCRIPT special-cased out
        return name != "NOSCRIPT" and name in self.element_names

    def eqv_eq(self, x: str, y: str) -> bool:
        # elms-eqv via precomputed class ids
        cx = self.eqv.get(x)
        cy = self.eqv.get(y)
        return cx is not None and cx == cy


def load_dtd() -> Dtd:
    global _DTD
    if _DTD is None:
        # importlib.resources works both from the filesystem and from a
        # --py-files zip (zipimport); a bare Path(__file__) open does not
        from importlib.resources import files
        data = files(__package__).joinpath("dtd.json").read_text()
        _DTD = Dtd(json.loads(data))
    return _DTD
