"""Adversarial/robustness corpus (round-6 verdict #2).

The gated replay of the five hostile template families lives in
test_entry_oracle.py (extract_hostile); this module pins the two
non-gate claims: the per-doc step budget FIRES (warn + truncation, not
a hang), and a genuinely huge single-line document terminates in
bounded time with the exact expected extraction.
"""

import time

import pytest

from closure_html_spark import extract
from closure_html_spark.dtd import load_dtd
from closure_html_spark.parser import pda
from closure_html_spark.parser.pda import check_saneness, parse_html


@pytest.fixture(scope="module")
def dtd():
    return load_dtd()


def test_step_budget_fires_with_warn_not_hang(dtd, monkeypatch):
    """The insert-transition budget (pda.sgml_parse: 10*n + slack) must
    end a runaway repair with a level-5 warn and a truncated-but-sane
    Doc.  No natural input reaches 10 steps/char, so shrink the slack
    until the budget is a handful of insertions and feed a doc whose
    every token needs resolve insertions (<td> soup at top level)."""
    soup = "<td>x" * 200
    monkeypatch.setattr(pda, "_MAX_STEPS_SLACK", -10 * len(soup) + 5)
    doc = parse_html(dtd, soup)
    lvls = [lv for lv, _ in doc.warnings]
    msgs = [m for _, m in doc.warnings]
    assert 5 in lvls, f"budget warn missing: {doc.warnings[:5]}"
    assert any("step budget" in m for m in msgs)
    # truncated, not corrupted: the partial tree still satisfies the
    # structural invariants
    assert check_saneness(doc, dtd) == []


def test_step_budget_not_hit_on_real_hostile_docs(dtd):
    """The default slack must NOT fire on the gate's hostile templates
    -- the budget is a backstop, not a correctness crutch."""
    probes = [
        "<html><body>" + "<div>" * 2000 + "<p>payload",
        "<html><body><p>" + "<3 " * 2000 + "tail",
        "<html><body><p>" + "&amp;" * 5000,
    ]
    for src in probes:
        doc = parse_html(dtd, src)
        assert not any(lv == 5 and "step budget" in m
                       for lv, m in doc.warnings), src[:40]


def test_megabyte_single_line_completes(dtd):
    """1 MB of single-line pcdata behind unclosed tags: parse + extract
    must terminate in bounded time and return the exact payload (the
    h1 'pcdata flood' family at full size).  Throughput floor is the
    measured large-doc baseline (~3 MB/s/core) with 10x headroom."""
    payload = ("lorem ipsum dolor sit amet " * 40000)[:1 << 20]  # 1 MiB
    src = "<html><head><title>T</title></head><body><div><p>" + payload
    t0 = time.monotonic()
    doc = parse_html(dtd, src)
    r = extract.extract_main_content(doc, dtd)
    wall = time.monotonic() - t0
    assert r["extracted_text"] == payload
    assert wall < 3.5, f"1 MiB single-line doc took {wall:.2f}s"
    assert not any(lv == 5 for lv, _ in doc.warnings)


def test_entity_bomb_linear_not_quadratic(dtd):
    """Entity-chain decoding must be linear: 8x the bomb size may not
    cost more than ~16x the wall (generous; quadratic would be 64x)."""
    def wall(k):
        src = "<html><body><p>" + "&amp;" * k
        t0 = time.monotonic()
        doc = parse_html(dtd, src)
        r = extract.extract_main_content(doc, dtd)
        assert r["extracted_text"] == "&" * k
        return time.monotonic() - t0

    wall(1000)  # warm caches
    small, big = wall(2000), wall(16000)
    assert big < max(16 * small, 1.0), (small, big)
