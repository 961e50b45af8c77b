"""DTD compilation spot-checks (SURVEY.md §7 step 2).

Expected values read off the DTD sources:
  BODY O O        DTD-HTML-4.0-Transitional (body optional tags)
  BR - O EMPTY
  A -(A)          anchors may not nest
  FORM -(FORM)
plus resolve-table entries driving the classic implicit closures."""

from closure_html_spark.dtd import load_dtd

DTD = load_dtd()


def test_roots():
    assert DTD.roots == {"HTML"}


def test_optional_tags():
    assert DTD.obegin["BODY"] and DTD.oend["BODY"]
    assert not DTD.obegin["BR"] and DTD.oend["BR"]
    assert DTD.obegin["HEAD"] and DTD.oend["HEAD"]
    assert not DTD.obegin["P"] and DTD.oend["P"]


def test_empty_elements():
    for e in ("BR", "HR", "IMG", "INPUT", "META", "LINK", "BASE", "FRAME",
              "COL", "ISINDEX", "PARAM", "AREA", "BASEFONT"):
        assert e in DTD.empty, e
    assert "P" not in DTD.empty
    assert "#PCDATA" in DTD.empty


def test_exclusions_parsed():
    assert DTD.exclude["A"] == {"A"}
    assert DTD.exclude["FORM"] == {"FORM"}


def test_resolve_entries():
    # <p> auto-closes on a following <p>
    assert DTD.resolve[("P", "S", "P")] == ("E", "P")
    # text at top level opens <html>
    assert DTD.resolve[("%top", "S", "#PCDATA")] == ("S", "HTML")
    assert DTD.resolve[("HTML", "S", "P")] == ("S", "BODY")
    # <option> implicit close
    assert DTD.resolve[("OPTION", "S", "OPTION")] == ("E", "OPTION")
    # li legal directly
    assert ("UL", "S", "LI") not in DTD.resolve  # already legal
    assert "LI" in DTD.include["UL"]


def test_entities_decoded():
    e = DTD.entities
    assert e["nbsp"] == "\xa0"
    assert e["amp"] == "&"
    assert e["lt"] == "<"
    assert e["euro"] == "€"
    assert e["Aacute"] == "\xc1"
    assert len(e) > 240


def test_attlists():
    al = dict(DTD.attlist["OPTION"])
    assert al["SELECTED"] == ["SELECTED"]
    assert al["ID"] == "ID"
    assert al["CLASS"] is True
    assert dict(DTD.attlist["TD"])["COLSPAN"] == "NUMBER"


def test_eqv_classes():
    # H1..H6 share inclusion but have distinct surclusions? sanity: an element
    # is equivalent to itself and P is not equivalent to TABLE
    assert DTD.eqv_eq("P", "P")
    assert not DTD.eqv_eq("P", "TABLE")
    # TH and TD have identical content model and parents
    assert DTD.eqv_eq("TH", "TD")
