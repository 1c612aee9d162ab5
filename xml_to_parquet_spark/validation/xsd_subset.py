"""Pure-stdlib XSD-subset validator (fallback for containers without lxml
or xmlschema).

Covers the constructs the reference's schemas actually use
(`schema_validator.R:19-39` parity; e.g. the shipped products.xsd):

- top-level ``xs:element`` declarations (the document root must match one)
- inline AND named global ``xs:complexType``s (``type="T"`` references),
  with ``xs:sequence``, ``xs:choice`` (as a sequence particle or the whole
  model, with its own occurrence bounds), and ``xs:all`` content models
- ``xs:element ref="..."`` references to global element declarations
- ``minOccurs`` / ``maxOccurs`` (including ``unbounded``) on particles
- nested ``xs:choice`` alternatives (r9): an inline (1,1) ``xs:sequence``
  of plain elements as an alternative (dispatched on its required first
  element) and (1,1) choice-of-choices (flattened union) — with
  ambiguity guards (duplicate heads, repeated compound choices) that
  degrade to lenient instead of risking a false "invalid"
- ``xs:attributeGroup`` named groups and (possibly nested) ``ref``s
  (r9): referenced attributes validate exactly like inline ones
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
    # sequence particles, in declared order: ("elem", decl, lo, hi) or
    # ("choice", [decl, ...], lo, hi); hi None = unbounded
    particles: list[tuple] = field(default_factory=list)
    model: str = "sequence"  # "sequence" | "all"
    required_attrs: list[str] = field(default_factory=list)
    attr_types: dict[str, str] = field(default_factory=dict)
    has_complex: bool = False


def _local_type(t: str | None) -> str | None:
    if not t:
        return None
    return t.split(":", 1)[-1]


class _Schema:
    """Resolution context: global elements + named complexTypes, with a
    resolving stack so recursive type references degrade to lenient
    instead of recursing forever (never a false "invalid")."""

    def __init__(self, root: ET.Element):
        self.global_elements = {
            el.get("name", ""): el for el in root.findall(f"{_XS}element")
        }
        self.named_types = {
            ct.get("name", ""): ct
            for ct in root.findall(f"{_XS}complexType")
        }
        self.attr_groups = {
            ag.get("name", ""): ag
            for ag in root.findall(f"{_XS}attributeGroup")
        }
        self._stack: set[str] = set()


def _occurs(el: ET.Element) -> tuple[int, int | None]:
    lo = int(el.get("minOccurs", "1"))
    hi_raw = el.get("maxOccurs", "1")
    return lo, (None if hi_raw == "unbounded" else int(hi_raw))


def _parse_particles(
    group: ET.Element, schema: _Schema, decl: _ElementDecl
) -> None:
    """Fill decl.particles from a sequence/choice/all group. Constructs
    outside the subset leave the element lenient (particles cleared)."""
    for item in group:
        tag = item.tag
        if tag == f"{_XS}element":
            lo, hi = _occurs(item)
            decl.particles.append(
                ("elem", _parse_element(item, schema), lo, hi)
            )
        elif tag == f"{_XS}choice":
            lo, hi = _occurs(item)
            alts = _parse_choice_alts(item, schema)
            if alts is None:  # outside the (extended) subset: lenient
                decl.particles.clear()
                decl.has_complex = False
                return
            # Greedy matching is exact when the counting is unambiguous:
            # either the choice instantiates once, or every alternative
            # contributes exactly one element per instantiation.  A
            # repeated choice OVER repeatable/compound alternatives
            # (e.g. (a+|b){2}, ((b c)|a)*) admits multiple
            # decompositions — greedy could false-'invalid' there, which
            # the contract forbids → lenient.
            if (lo, hi) != (1, 1) and any(
                kind != "elem" or (alo, ahi) != (1, 1)
                for kind, _, alo, ahi in alts
            ):
                decl.particles.clear()
                decl.has_complex = False
                return
            # dispatch is by the next child's name = an alternative's
            # head; duplicate heads (UPA violations) are ambiguous
            heads = [_alt_head(a) for a in alts]
            if len(set(heads)) != len(heads):
                decl.particles.clear()
                decl.has_complex = False
                return
            # an alternative with minOccurs=0 matches the empty sequence,
            # so every required instantiation is satisfiable emptily —
            # the choice as a whole imposes no minimum (exact, not lenient)
            if any(
                kind == "elem" and alo == 0 for kind, _, alo, _ in alts
            ):
                lo = 0
            decl.particles.append(("choice", alts, lo, hi))
        elif tag == f"{_XS}sequence":
            lo, hi = _occurs(item)
            if (lo, hi) != (1, 1):  # repeated nested group: lenient
                decl.particles.clear()
                decl.has_complex = False
                return
            _parse_particles(item, schema, decl)
            if not decl.has_complex:
                return
        elif tag in (f"{_XS}annotation",):
            continue
        else:  # group ref / any / etc.: outside the subset
            decl.particles.clear()
            decl.has_complex = False
            return


def _alt_head(alt: tuple) -> str:
    """Dispatch name of a choice alternative: the element's name, or a
    sequence alternative's first (required) element's name."""
    kind, payload = alt[0], alt[1]
    return payload.name if kind == "elem" else payload[0][0].name


def _parse_choice_alts(item: ET.Element, schema: _Schema):
    """Alternatives of an ``xs:choice`` as tagged tuples (r9 extension,
    VERDICT r8 #6 — the two most-used out-of-subset shapes):

    - ``("elem", decl, lo, hi)`` — a plain element alternative;
    - ``("seq", [(decl, lo, hi), ...], 1, 1)`` — an inline (1,1)
      ``xs:sequence`` alternative whose FIRST element is required (the
      dispatch head) and whose members are all plain elements;
    - a nested (1,1) ``xs:choice`` flattens into its own alternatives
      (choice-of-choices is a union of alternatives).

    Returns None when any alternative falls outside this shape — the
    caller degrades the whole content model to lenient (the contract:
    false-valid possible, false-invalid never)."""
    alts: list[tuple] = []
    for c in item:
        if c.tag == f"{_XS}element":
            alts.append(("elem", _parse_element(c, schema), *_occurs(c)))
        elif c.tag == f"{_XS}choice" and _occurs(c) == (1, 1):
            inner = _parse_choice_alts(c, schema)
            if inner is None:
                return None
            alts.extend(inner)
        elif c.tag == f"{_XS}sequence" and _occurs(c) == (1, 1):
            items: list[tuple] = []
            for cc in c:
                if cc.tag == f"{_XS}element":
                    items.append((_parse_element(cc, schema), *_occurs(cc)))
                elif cc.tag == f"{_XS}annotation":
                    continue
                else:
                    return None
            if not items or items[0][1] < 1:
                return None  # no required head to dispatch on
            alts.append(("seq", items, 1, 1))
        elif c.tag == f"{_XS}annotation":
            continue
        else:
            return None
    return alts or None


def _parse_complex_type(
    ct: ET.Element, schema: _Schema, decl: _ElementDecl
) -> None:
    decl.has_complex = True
    seq = ct.find(f"{_XS}sequence")
    choice = ct.find(f"{_XS}choice")
    all_ = ct.find(f"{_XS}all")
    if seq is None and choice is None and all_ is None:
        # complexContent/simpleContent extensions, group refs, mixed
        # models: outside the subset → lenient, NOT empty-content
        # (empty-content semantics would reject valid children — a
        # false "invalid", which the contract forbids). A complexType
        # holding only attributes/annotations keeps its attribute
        # checks but accepts any children.
        other = [
            c
            for c in ct
            if c.tag
            not in (
                f"{_XS}attribute",
                f"{_XS}annotation",
                f"{_XS}attributeGroup",
            )
        ]
        if other:
            decl.has_complex = False
    if seq is not None:
        _parse_particles(seq, schema, decl)
    elif choice is not None:
        _parse_particles(ct, schema, decl)  # one choice particle
    elif all_ is not None:
        decl.model = "all"
        for child in all_.findall(f"{_XS}element"):
            lo, hi = _occurs(child)
            decl.particles.append(
                ("elem", _parse_element(child, schema), min(lo, 1), 1)
            )
    _collect_attrs(ct, schema, decl, set())


def _collect_attrs(
    holder: ET.Element, schema: _Schema, decl: _ElementDecl, seen: set[str]
) -> None:
    """Attributes declared directly plus through ``xs:attributeGroup``
    refs (r9, VERDICT r8 #6) — groups may nest other group refs, so a
    per-call seen-set breaks cycles (a cyclic ref degrades to whatever
    was collected before the repeat, never an infinite loop). An
    unresolvable ref contributes nothing (lenient for those attributes;
    the directly declared ones still validate)."""
    for attr in holder.findall(f"{_XS}attribute"):
        name = attr.get("name", "")
        if attr.get("use") == "required":
            decl.required_attrs.append(name)
        at = _local_type(attr.get("type"))
        if at:
            decl.attr_types[name] = at
    for ref in holder.findall(f"{_XS}attributeGroup"):
        gname = _local_type(ref.get("ref")) or ""
        grp = schema.attr_groups.get(gname)
        if grp is not None and gname not in seen:
            _collect_attrs(grp, schema, decl, seen | {gname})


def _parse_element(el: ET.Element, schema: _Schema) -> _ElementDecl:
    ref = el.get("ref")
    if ref is not None:
        target = schema.global_elements.get(_local_type(ref) or "")
        if target is not None and _local_type(ref) not in schema._stack:
            schema._stack.add(_local_type(ref))
            try:
                return _parse_element(target, schema)
            finally:
                schema._stack.discard(_local_type(ref))
        return _ElementDecl(name=_local_type(ref) or "")  # lenient
    decl = _ElementDecl(name=el.get("name", ""))
    t = el.get("type")
    ct = el.find(f"{_XS}complexType")
    if ct is None and t is not None:
        local = _local_type(t)
        named = schema.named_types.get(local or "")
        if named is not None:
            if local in schema._stack:  # recursive type: lenient
                return decl
            schema._stack.add(local)
            try:
                _parse_complex_type(named, schema, decl)
            finally:
                schema._stack.discard(local)
            return decl
        decl.simple_type = local
        return decl
    if ct is not None:
        _parse_complex_type(ct, schema, decl)
    return decl


def parse_xsd(schema_path: str) -> dict[str, _ElementDecl]:
    """Top-level element declarations by name."""
    root = ET.parse(schema_path).getroot()
    schema = _Schema(root)
    decls = {}
    for el in root.findall(f"{_XS}element"):
        d = _parse_element(el, schema)
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
    kids = list(node)
    if decl.model == "all":
        # xs:all: each declared child 0/1 or exactly 1 time, any order
        by_name = {
            d.name: (d, lo) for kind, d, lo, _ in decl.particles
        }
        seen: dict[str, int] = {}
        for kid in kids:
            kt = _strip_ns(kid.tag)
            if kt not in by_name:
                errors.append(f"element '{tag}': unexpected child '{kt}'")
                continue
            seen[kt] = seen.get(kt, 0) + 1
            if seen[kt] > 1:
                errors.append(
                    f"element '{tag}': child '{kt}' appears more than "
                    f"once in an xs:all group"
                )
            errors.extend(_validate_element(kid, by_name[kt][0]))
        for name, (_, lo) in by_name.items():
            if lo >= 1 and name not in seen:
                errors.append(
                    f"element '{tag}': missing required child '{name}'"
                )
        return errors
    # sequence matching with occurrence bounds, in declared order; a
    # choice particle greedily matches whichever alternative the next
    # child names (deterministic under XSD's Unique Particle Attribution)
    i = 0
    for particle in decl.particles:
        kind, payload, lo, hi = particle
        count = 0
        while i < len(kids) and (hi is None or count < hi):
            kt = _strip_ns(kids[i].tag)
            if kind == "elem":
                if kt != payload.name:
                    break
                errors.extend(_validate_element(kids[i], payload))
                i += 1
                count += 1
                continue
            # choice: one instantiation picks the alternative whose HEAD
            # the next child names and consumes per that alternative's
            # OWN bounds (parse-time guards ensure greedy is exact)
            alt = next((a for a in payload if _alt_head(a) == kt), None)
            if alt is None:
                break
            akind, apayload, alo, ahi = alt
            if akind == "elem":
                alt_decl = apayload
                sub = 0
                while (
                    i < len(kids)
                    and (ahi is None or sub < ahi)
                    and _strip_ns(kids[i].tag) == alt_decl.name
                ):
                    errors.extend(_validate_element(kids[i], alt_decl))
                    i += 1
                    sub += 1
                if sub == 0:  # maxOccurs=0 alt: no progress possible
                    break
                if sub < alo:
                    errors.append(
                        f"element '{tag}': expected at least {alo} "
                        f"'{alt_decl.name}' (got {sub})"
                    )
            else:  # "seq": one pass over the inline sequence's members
                for m_decl, mlo, mhi in apayload:
                    sub = 0
                    while (
                        i < len(kids)
                        and (mhi is None or sub < mhi)
                        and _strip_ns(kids[i].tag) == m_decl.name
                    ):
                        errors.extend(_validate_element(kids[i], m_decl))
                        i += 1
                        sub += 1
                    if sub < mlo:
                        errors.append(
                            f"element '{tag}': expected at least {mlo} "
                            f"'{m_decl.name}' (got {sub})"
                        )
            count += 1
        if count < lo:
            want = (
                payload.name
                if kind == "elem"
                else " | ".join(_alt_head(a) for a in payload)
            )
            errors.append(
                f"element '{tag}': expected at least {lo} "
                f"'{want}' (got {count})"
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


# --------------------------------------------------------------------------
# XSD → output typing (r12, VERDICT r11 item 5 / SURVEY.md:82): the
# reference only ever VALIDATES against the XSD (schema_validator.R:19-39)
# and leaves every extracted column a string; the declared
# xs:decimal/xs:integer/... on leaf elements is exactly the schema the
# star build wants, so expose it as a column→Spark-type mapping.
# --------------------------------------------------------------------------

_XSD_TO_SPARK = {
    # decimal(38,9) keeps exact arithmetic (oracle hash parity) with
    # headroom for any realistic measure; integer family widens to
    # bigint (XSD xs:integer is unbounded — bigint is the pragmatic
    # engine ceiling, same call DuckDB makes for its INTEGER aliases)
    "decimal": "decimal(38,9)",
    "integer": "bigint",
    "int": "bigint",
    "long": "bigint",
    "boolean": "boolean",
    "date": "date",
    # NTZ: XSD dateTime without an offset is wall-clock time; matches
    # DuckDB's TIMESTAMP semantics in the oracle
    "dateTime": "timestamp_ntz",
    "string": "string",
}


def xsd_leaf_types(schema_path: str) -> dict[str, str]:
    """Flat ``{column_name: spark_type_ddl}`` from every leaf element and
    attribute declaration reachable from the schema's global elements.

    The XML extractor flattens leaf elements and attributes into columns
    named by their local name, so the mapping is keyed the same way. A
    name declared with CONFLICTING simple types anywhere in the schema
    degrades to absent (caller keeps the string column) — same
    never-wrong-only-lenient contract as the validator. Types outside
    the subset map to nothing (column stays string)."""
    decls = parse_xsd(schema_path)
    out: dict[str, str] = {}
    ambiguous: set[str] = set()

    def _note(name: str, xsd_type: str | None) -> None:
        spark_t = _XSD_TO_SPARK.get(xsd_type or "")
        if spark_t is None or spark_t == "string":
            return
        if name in out and out[name] != spark_t:
            ambiguous.add(name)
            return
        out[name] = spark_t

    def _walk(decl: _ElementDecl, seen: frozenset[str]) -> None:
        if decl.name in seen:
            return
        seen = seen | {decl.name}
        if decl.simple_type and not decl.has_complex:
            _note(decl.name, decl.simple_type)
        for attr, at in decl.attr_types.items():
            _note(attr, at)
        for particle in decl.particles:
            kind, payload = particle[0], particle[1]
            if kind == "elem":
                _walk(payload, seen)
            else:  # choice: alternatives are elem or seq tuples
                for alt in payload:
                    if alt[0] == "elem":
                        _walk(alt[1], seen)
                    else:
                        for m_decl, _, _ in alt[1]:
                            _walk(m_decl, seen)

    for decl in decls.values():
        _walk(decl, frozenset())
    for name in ambiguous:
        out.pop(name, None)
    return out
