"""Validation matrix tests: discovery order, DOCTYPE probe, DTD/XSD
branches (lxml-gated — skip-marked so they run on cluster images that
install lxml), and the always-available well-formedness fallback.

Reference parity: /root/reference/R/schema_validator.R:52-148.
"""

from __future__ import annotations

import os

import pytest

from xml_to_parquet_spark.validation.xml_validation import (
    HAS_LXML,
    _check_one,
    discover_schema_file,
    find_schema_file,
    has_internal_dtd,
    well_formed_check,
)

GOOD = '<?xml version="1.0"?><r><a>1</a></r>'
BAD = '<?xml version="1.0"?><r><a>1</a>'
DTD_DOC_VALID = (
    '<?xml version="1.0"?>\n'
    "<!DOCTYPE note [<!ELEMENT note (to)><!ELEMENT to (#PCDATA)>]>\n"
    "<note><to>x</to></note>\n"
)
DTD_DOC_INVALID = (
    '<?xml version="1.0"?>\n'
    "<!DOCTYPE note [<!ELEMENT note (to)><!ELEMENT to (#PCDATA)>]>\n"
    "<note><wrong>x</wrong></note>\n"
)


def _write(d, name, body):
    p = os.path.join(d, name)
    with open(p, "w") as fh:
        fh.write(body)
    return p


def test_find_schema_file_order(tmp_path):
    d = str(tmp_path / "xml")
    s = str(tmp_path / "schemas")
    os.makedirs(d)
    os.makedirs(s)
    xml = _write(d, "orders.xml", GOOD)
    # lowest-priority candidate first, then increasingly specific ones win
    _write(s, "default.xsd", "x")
    assert find_schema_file(xml, "xsd", s).endswith("default.xsd")
    _write(d, "schema.xsd", "x")
    assert find_schema_file(xml, "xsd", s).endswith(os.path.join("xml", "schema.xsd"))
    _write(s, "schema.xsd", "x")
    assert find_schema_file(xml, "xsd", s).endswith(os.path.join("schemas", "schema.xsd"))
    _write(d, "orders.xsd", "x")
    assert find_schema_file(xml, "xsd", s).endswith(os.path.join("xml", "orders.xsd"))
    _write(s, "orders.xsd", "x")
    assert find_schema_file(xml, "xsd", s).endswith(os.path.join("schemas", "orders.xsd"))


def test_discover_prefers_xsd_over_dtd(tmp_path):
    d = str(tmp_path)
    xml = _write(d, "a.xml", GOOD)
    _write(d, "a.dtd", "<!ELEMENT r (a)>")
    assert discover_schema_file(xml).endswith("a.dtd")
    _write(d, "a.xsd", "x")
    assert discover_schema_file(xml).endswith("a.xsd")


def test_has_internal_dtd(tmp_path):
    d = str(tmp_path)
    assert has_internal_dtd(_write(d, "d.xml", DTD_DOC_VALID))
    assert not has_internal_dtd(_write(d, "p.xml", GOOD))


def test_well_formedness_fallback(tmp_path):
    d = str(tmp_path)
    assert well_formed_check(_write(d, "good.xml", GOOD))
    assert not well_formed_check(_write(d, "bad.xml", BAD))


@pytest.mark.skipif(not HAS_LXML, reason="lxml not in this container image")
def test_internal_dtd_validation_lxml(tmp_path):
    d = str(tmp_path)
    ok = _write(d, "ok.xml", DTD_DOC_VALID)
    nok = _write(d, "nok.xml", DTD_DOC_INVALID)
    assert _check_one(ok, None) == ("success", "")
    status, err = _check_one(nok, None)
    assert status == "validation_error" and err


@pytest.mark.skipif(not HAS_LXML, reason="lxml not in this container image")
def test_external_dtd_validation_lxml(tmp_path):
    d = str(tmp_path)
    dtd = _write(d, "note.dtd", "<!ELEMENT note (to)><!ELEMENT to (#PCDATA)>")
    ok = _write(d, "ok.xml", "<note><to>x</to></note>")
    nok = _write(d, "nok.xml", "<note><wrong>x</wrong></note>")
    assert _check_one(ok, dtd) == ("success", "")
    status, err = _check_one(nok, dtd)
    assert status == "validation_error" and err
