"""Differential fuzz: the fast-path tokenizer and whole-document
tokenize_normalized must be token-identical to the exact char machine,
and the full parse must serialize identically via either path."""

import random

import pytest

from closure_html_spark.dtd import load_dtd
from closure_html_spark.parser.normalize import (
    normalized_tokens,
    tokenize_normalized,
)
from closure_html_spark.parser.pda import (
    parse_html,
    post_mortem_fix_top_level,
    sgml_parse,
)
from closure_html_spark.parser.tokenizer import FastTokenizer, Tokenizer
from closure_html_spark.serialize import serialize_doc

DTD = load_dtd()

ALPHABETS = [
    "<>/=&;'\"abc &#xA d-._:%\n\t![]()",
    "<abc defgh=\"v'& ;\"'>/x ",
    "<a href= = / > \" ' x = 1 & ; !",
    "<>/=&;'\"ap div tble img href src=x &#38; &amp %\n\t![]()",
    # Non-ASCII stressors: Unicode whitespace (NBSP, VT, LS), Unicode
    # digits after '&#' ('²', '٣'), and multibyte letters -- the fast
    # path must reject exactly what the slow machine rejects.
    "<>/=&;'\"a div href=x \xa0\x0b 　 &#² ٣ 1 é漢\n\t",
]


def _cases(n_per=1500):
    random.seed(20260816)
    out = []
    for chars in ALPHABETS:
        for _ in range(n_per):
            out.append("".join(random.choice(chars)
                               for _ in range(random.randrange(1, 160))))
    return out


@pytest.mark.parametrize("alphabet_idx", range(len(ALPHABETS)))
def test_fast_tokenizer_token_identical(alphabet_idx):
    random.seed(alphabet_idx)
    chars = ALPHABETS[alphabet_idx]
    for _ in range(1500):
        fx = "".join(random.choice(chars)
                     for _ in range(random.randrange(1, 160)))
        slow = list(Tokenizer(fx, DTD.entities).tokens())
        fast = list(FastTokenizer(fx, DTD.entities).tokens())
        assert slow == fast, fx
        merged, mtk = tokenize_normalized(fx, DTD)
        gtk = FastTokenizer(fx, DTD.entities)
        gen = list(normalized_tokens(gtk, DTD))
        assert merged == gen, fx
        assert mtk.warnings == gtk.warnings, fx


def test_full_parse_serialization_identical():
    random.seed(99)
    chars = ALPHABETS[3]
    for _ in range(1000):
        fx = "".join(random.choice(chars)
                     for _ in range(random.randrange(1, 250)))
        fast = serialize_doc(parse_html(DTD, fx), DTD)
        doc = sgml_parse(DTD, fx, tokenizer=Tokenizer(fx, DTD.entities))
        post_mortem_fix_top_level(doc)
        slow = serialize_doc(doc, DTD)
        assert fast == slow, fx
