"""Pure-stdlib XSD-subset validator (fallback for containers without lxml
or xmlschema).

Covers the constructs the reference's schemas actually use
(`schema_validator.R:19-39` parity; e.g. the shipped products.xsd):

- top-level ``xs:element`` declarations (the document root must match one)
- inline ``xs:complexType`` with an ``xs:sequence`` of child elements
- ``minOccurs`` / ``maxOccurs`` (including ``unbounded``) on sequence items
- named simple types on leaf elements: ``xs:string``, ``xs:decimal``,
  ``xs:integer``, ``xs:int``, ``xs:long``, ``xs:boolean``, ``xs:date``,
  ``xs:dateTime`` (value-parsed; string accepts anything)
- ``xs:attribute`` declarations with ``use="required"`` and simple types

Anything outside the subset (choice/all groups, named global types,
references, facets/restrictions, namespaces on the instance) is IGNORED
rather than rejected — this validator can produce false "valid" for
schemas beyond its subset, never false "invalid" for schemas within it.
Cluster images with lxml (or xmlschema) installed take the full-fidelity
branch instead; see xml_validation._check_one for the gate order.
"""

from __future__ import annotations

import re
import xml.etree.ElementTree as ET
from dataclasses import dataclass, field

_XS = "{http://www.w3.org/2001/XMLSchema}"

_SIMPLE_CHECKS = {
    "string": lambda s: True,
    "decimal": lambda s: re.fullmatch(r"[+-]?(\d+(\.\d*)?|\.\d+)", s.strip())
    is not None,
    "integer": lambda s: re.fullmatch(r"[+-]?\d+", s.strip()) is not None,
    "int": lambda s: re.fullmatch(r"[+-]?\d+", s.strip()) is not None,
    "long": lambda s: re.fullmatch(r"[+-]?\d+", s.strip()) is not None,
    "boolean": lambda s: s.strip() in ("true", "false", "0", "1"),
    "date": lambda s: re.fullmatch(r"\d{4}-\d{2}-\d{2}", s.strip())
    is not None,
    "dateTime": lambda s: re.fullmatch(
        r"\d{4}-\d{2}-\d{2}T\d{2}:\d{2}:\d{2}(\.\d+)?([+-]\d{2}:\d{2}|Z)?",
        s.strip(),
    )
    is not None,
}


@dataclass
class _ElementDecl:
    name: str
    simple_type: str | None = None  # local part of xs:* type, if any
    children: list[tuple["_ElementDecl", int, int | None]] = field(
        default_factory=list
    )  # (decl, minOccurs, maxOccurs or None=unbounded)
    required_attrs: list[str] = field(default_factory=list)
    attr_types: dict[str, str] = field(default_factory=dict)
    has_complex: bool = False


def _local_type(t: str | None) -> str | None:
    if not t:
        return None
    return t.split(":", 1)[-1]


def _parse_element(el: ET.Element) -> _ElementDecl:
    decl = _ElementDecl(name=el.get("name", ""))
    decl.simple_type = _local_type(el.get("type"))
    ct = el.find(f"{_XS}complexType")
    if ct is not None:
        decl.has_complex = True
        seq = ct.find(f"{_XS}sequence")
        if seq is not None:
            for child in seq.findall(f"{_XS}element"):
                lo = int(child.get("minOccurs", "1"))
                hi_raw = child.get("maxOccurs", "1")
                hi = None if hi_raw == "unbounded" else int(hi_raw)
                decl.children.append((_parse_element(child), lo, hi))
        for attr in ct.findall(f"{_XS}attribute"):
            name = attr.get("name", "")
            if attr.get("use") == "required":
                decl.required_attrs.append(name)
            at = _local_type(attr.get("type"))
            if at:
                decl.attr_types[name] = at
    return decl


def parse_xsd(schema_path: str) -> dict[str, _ElementDecl]:
    """Top-level element declarations by name."""
    root = ET.parse(schema_path).getroot()
    decls = {}
    for el in root.findall(f"{_XS}element"):
        d = _parse_element(el)
        decls[d.name] = d
    return decls


def _strip_ns(tag: str) -> str:
    return tag.split("}", 1)[-1]


def _check_simple(type_name: str, text: str, where: str) -> list[str]:
    check = _SIMPLE_CHECKS.get(type_name)
    if check is None:  # outside the subset: lenient
        return []
    if not check(text or ""):
        return [f"{where}: value {(text or '')!r} is not a valid {type_name}"]
    return []


def _validate_element(node: ET.Element, decl: _ElementDecl) -> list[str]:
    errors: list[str] = []
    tag = _strip_ns(node.tag)
    for attr in decl.required_attrs:
        if attr not in node.attrib:
            errors.append(f"element '{tag}': missing required attribute '{attr}'")
    for attr, at in decl.attr_types.items():
        if attr in node.attrib:
            errors.extend(
                _check_simple(at, node.attrib[attr], f"{tag}@{attr}")
            )
    if decl.simple_type and not decl.has_complex:
        errors.extend(_check_simple(decl.simple_type, node.text or "", tag))
        if len(node) > 0:
            errors.append(
                f"element '{tag}': declared simple ({decl.simple_type}) "
                f"but has child elements"
            )
        return errors
    if not decl.has_complex:
        return errors  # no type info: lenient
    # sequence matching with occurrence bounds, in declared order
    kids = list(node)
    i = 0
    for child_decl, lo, hi in decl.children:
        count = 0
        while (
            i < len(kids)
            and _strip_ns(kids[i].tag) == child_decl.name
            and (hi is None or count < hi)
        ):
            errors.extend(_validate_element(kids[i], child_decl))
            i += 1
            count += 1
        if count < lo:
            errors.append(
                f"element '{tag}': expected at least {lo} "
                f"'{child_decl.name}' (got {count})"
            )
    if i < len(kids):
        errors.append(
            f"element '{tag}': unexpected child '{_strip_ns(kids[i].tag)}'"
        )
    return errors


def validate(data: bytes, schema_path: str) -> list[str]:
    """Validate an XML document against the XSD subset.

    Returns a list of human-readable violations — empty means valid.
    Raises ``ET.ParseError`` if the document itself is not well-formed
    (callers distinguish parse errors from validation errors).
    """
    decls = parse_xsd(schema_path)
    root = ET.fromstring(data)
    root_tag = _strip_ns(root.tag)
    if root_tag not in decls:
        return [
            f"root element '{root_tag}' not declared in schema "
            f"(declared: {sorted(decls)})"
        ]
    return _validate_element(root, decls[root_tag])
