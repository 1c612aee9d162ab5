"""Minimal pure-Python protobuf runtime for generated ``*_pb2`` modules.

PURPOSE (r6, VERDICT r5 item 7): this container has no ``protobuf``
distribution and no network, but PySpark's ``transformWithStateInPandas``
Python worker speaks a protobuf-framed state protocol through its
generated ``StateMessage_pb2`` module. This shim implements the slice of
the public protobuf runtime that generated code and PySpark's state
clients actually use, from the public wire-format specification
(https://protobuf.dev/programming-guides/encoding/):

- parsing a serialized ``FileDescriptorProto`` (the blob embedded in a
  generated module) far enough to learn every message's fields: name,
  number, label, type, type_name, oneof membership;
- dynamic message classes: kwargs construction, attribute access with
  proto3 defaults, oneof exclusivity, ``SerializeToString`` /
  ``ParseFromString`` over the standard wire format (varint,
  zigzag-sint, fixed32/64, length-delimited, nested messages, repeated
  fields);
- enum types exposed as class attributes AND module-level constants,
  exactly as ``google.protobuf.internal.builder`` does.

It is loaded ONLY when the real ``protobuf`` package is absent (see
xml_to_parquet_spark.streaming.stateful.ensure_protobuf) — a real
installation always wins on sys.path order. Not implemented (not needed
by the state protocol): maps, groups, packed repeated scalars on the
ENCODE side (decode handles packed), extensions, unknown-field
retention, Any/well-known types, text format, JSON.
"""

from __future__ import annotations

import struct

# --- FieldDescriptorProto.type values (public descriptor.proto) ---------
TYPE_DOUBLE = 1
TYPE_FLOAT = 2
TYPE_INT64 = 3
TYPE_UINT64 = 4
TYPE_INT32 = 5
TYPE_FIXED64 = 6
TYPE_FIXED32 = 7
TYPE_BOOL = 8
TYPE_STRING = 9
TYPE_GROUP = 10
TYPE_MESSAGE = 11
TYPE_BYTES = 12
TYPE_UINT32 = 13
TYPE_ENUM = 14
TYPE_SFIXED32 = 15
TYPE_SFIXED64 = 16
TYPE_SINT32 = 17
TYPE_SINT64 = 18

LABEL_REPEATED = 3

_VARINT_TYPES = {
    TYPE_INT64, TYPE_UINT64, TYPE_INT32, TYPE_UINT32, TYPE_BOOL,
    TYPE_ENUM, TYPE_SINT32, TYPE_SINT64,
}
_FIXED64_TYPES = {TYPE_DOUBLE, TYPE_FIXED64, TYPE_SFIXED64}
_FIXED32_TYPES = {TYPE_FLOAT, TYPE_FIXED32, TYPE_SFIXED32}
_LEN_TYPES = {TYPE_STRING, TYPE_BYTES, TYPE_MESSAGE}


# --- wire primitives ----------------------------------------------------


def _enc_varint(value: int) -> bytes:
    if value < 0:  # two's-complement 64-bit, 10 bytes
        value += 1 << 64
    out = bytearray()
    while True:
        b = value & 0x7F
        value >>= 7
        if value:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _dec_varint(buf: bytes, i: int) -> tuple[int, int]:
    shift = 0
    result = 0
    while True:
        b = buf[i]
        i += 1
        result |= (b & 0x7F) << shift
        if not (b & 0x80):
            return result, i
        shift += 7
        if shift >= 70:
            raise ValueError("malformed varint")


def _zigzag_enc(v: int) -> int:
    return (v << 1) ^ (v >> 63)


def _zigzag_dec(v: int) -> int:
    return (v >> 1) ^ -(v & 1)


def _signed64(v: int) -> int:
    return v - (1 << 64) if v >= (1 << 63) else v


def iter_wire_fields(buf: bytes):
    """Yield (field_number, wire_type, raw_value) over a message body.

    raw_value: int for varint/fixed, bytes for length-delimited."""
    i, n = 0, len(buf)
    while i < n:
        tag, i = _dec_varint(buf, i)
        fno, wt = tag >> 3, tag & 7
        if wt == 0:
            v, i = _dec_varint(buf, i)
        elif wt == 1:
            v = struct.unpack_from("<Q", buf, i)[0]
            i += 8
        elif wt == 2:
            ln, i = _dec_varint(buf, i)
            v = buf[i : i + ln]
            if len(v) != ln:
                raise ValueError("truncated length-delimited field")
            i += ln
        elif wt == 5:
            v = struct.unpack_from("<I", buf, i)[0]
            i += 4
        else:
            raise ValueError(f"unsupported wire type {wt}")
        yield fno, wt, v


# --- FileDescriptorProto structural parse -------------------------------
# Hand-coded walk of descriptor.proto's stable field numbers; only the
# attributes the builder needs are extracted.


class FieldDesc:
    __slots__ = (
        "name", "number", "label", "type", "type_name", "oneof_index",
        "message_cls", "enum_default",
    )

    def __init__(self) -> None:
        self.name = ""
        self.number = 0
        self.label = 1
        self.type = 0
        self.type_name = ""
        self.oneof_index = None
        self.message_cls = None  # resolved later for TYPE_MESSAGE
        self.enum_default = 0

    @property
    def repeated(self) -> bool:
        return self.label == LABEL_REPEATED


class MessageDesc:
    def __init__(self) -> None:
        self.name = ""
        self.full_name = ""
        self.fields: list[FieldDesc] = []
        self.oneofs: list[str] = []
        self.nested: list[MessageDesc] = []
        self.enums: list[EnumDesc] = []


class EnumDesc:
    def __init__(self) -> None:
        self.name = ""
        self.full_name = ""
        self.values: list[tuple[str, int]] = []


def _parse_field(buf: bytes) -> FieldDesc:
    f = FieldDesc()
    for fno, _wt, v in iter_wire_fields(buf):
        if fno == 1:
            f.name = v.decode()
        elif fno == 3:
            f.number = v
        elif fno == 4:
            f.label = v
        elif fno == 5:
            f.type = v
        elif fno == 6:
            f.type_name = v.decode()
        elif fno == 9:
            f.oneof_index = v
    return f


def _parse_enum(buf: bytes, prefix: str) -> EnumDesc:
    e = EnumDesc()
    for fno, _wt, v in iter_wire_fields(buf):
        if fno == 1:
            e.name = v.decode()
        elif fno == 2:
            name, number = "", 0
            for f2, _w2, v2 in iter_wire_fields(v):
                if f2 == 1:
                    name = v2.decode()
                elif f2 == 2:
                    number = _signed64(v2) if v2 >= (1 << 63) else v2
            e.values.append((name, number))
    e.full_name = f"{prefix}.{e.name}" if prefix else e.name
    return e


def _parse_message(buf: bytes, prefix: str) -> MessageDesc:
    m = MessageDesc()
    for fno, _wt, v in iter_wire_fields(buf):
        if fno == 1:
            m.name = v.decode()
    m.full_name = f"{prefix}.{m.name}" if prefix else m.name
    for fno, _wt, v in iter_wire_fields(buf):
        if fno == 2:
            m.fields.append(_parse_field(v))
        elif fno == 3:
            m.nested.append(_parse_message(v, m.full_name))
        elif fno == 4:
            m.enums.append(_parse_enum(v, m.full_name))
        elif fno == 8:  # oneof_decl
            name = ""
            for f2, _w2, v2 in iter_wire_fields(v):
                if f2 == 1:
                    name = v2.decode()
            m.oneofs.append(name)
    return m


class FileDescriptorShim:
    """Stands in for google.protobuf.descriptor.FileDescriptor: holds the
    parsed model; generated modules also assign arbitrary attributes
    (``_loaded_options`` etc.), which plain instances accept."""

    def __init__(self, data: bytes) -> None:
        self.serialized_pb = data
        self.package = ""
        self.name = ""
        self.messages: list[MessageDesc] = []
        self.enums: list[EnumDesc] = []
        for fno, _wt, v in iter_wire_fields(data):
            if fno == 1:
                self.name = v.decode()
            elif fno == 2:
                self.package = v.decode()
        for fno, _wt, v in iter_wire_fields(data):
            if fno == 4:
                self.messages.append(_parse_message(v, self.package))
            elif fno == 5:
                self.enums.append(_parse_enum(v, self.package))


# --- dynamic messages ---------------------------------------------------


class ShimMessage:
    """Base for generated message classes. Field presence = explicit
    assignment (constructor kwarg, setattr, or decode) — matching how the
    state protocol uses proto3 (absent fields read as defaults on the
    peer; empty oneof submessages still serialize as zero-length)."""

    DESCRIPTOR: MessageDesc = None  # per-class
    _fields_by_name: dict = {}
    _fields_by_number: dict = {}

    def __init__(self, **kwargs) -> None:
        object.__setattr__(self, "_values", {})
        # lazy default submessages handed out by __getattr__, keyed by
        # field name; each carries a parent back-link so the first WRITE
        # through it anchors the chain (real-protobuf semantics: reading
        # msg.sub does not create presence, but msg.sub.x = 1 must stick)
        object.__setattr__(self, "_lazy_subs", {})
        object.__setattr__(self, "_anchor", None)
        for k, v in kwargs.items():
            if v is None:
                continue
            setattr(self, k, v)

    def _anchor_into_parent(self) -> None:
        """Attach this lazily-created submessage (and transitively its
        lazy ancestors) into the parent's ``_values`` on first mutation."""
        anchor = object.__getattribute__(self, "_anchor")
        if anchor is not None:
            object.__setattr__(self, "_anchor", None)
            parent, fname = anchor
            setattr(parent, fname, self)

    # -- attribute protocol --
    def __setattr__(self, name: str, value) -> None:
        f = self._fields_by_name.get(name)
        if f is None:
            raise AttributeError(
                f"{type(self).__name__} has no field {name!r}"
            )
        if f.oneof_index is not None:  # setting a oneof member clears kin
            for other in self._fields_by_name.values():
                if (
                    other.oneof_index == f.oneof_index
                    and other.name != name
                ):
                    self._values.pop(other.name, None)
        self._values[name] = value
        # invalidate any outstanding lazy handle for this field (r8 ADVICE
        # fix): a handle given out BEFORE this explicit assignment still
        # carries its (parent, field) anchor, and a later first-write
        # through it would re-anchor and silently overwrite the value just
        # set — real protobuf aliases the live field, it never time-travels
        popped = object.__getattribute__(self, "_lazy_subs").pop(name, None)
        if popped is not None and popped is not value:
            object.__setattr__(popped, "_anchor", None)
        self._anchor_into_parent()

    def __getattr__(self, name: str):
        # fields never exist as real attributes, so every field read lands
        # here (normal lookup fails); non-field misses raise AttributeError
        values = object.__getattribute__(self, "_values")
        if name in values:
            return values[name]
        f = self._fields_by_name.get(name)
        if f is None:
            raise AttributeError(
                f"{type(self).__name__} has no field {name!r}"
            )
        if f.repeated:
            fresh: list = []
            values[name] = fresh  # so appends during decode stick
            # a lazy submessage materializing a repeated field must anchor
            # now — appends can't be intercepted later
            self._anchor_into_parent()
            return fresh
        if f.type == TYPE_MESSAGE:
            # cache the default instance (identity-stable across reads) with
            # a parent back-link, so `msg.sub.field = x` anchors instead of
            # silently writing into a discarded fresh instance
            lazy = object.__getattribute__(self, "_lazy_subs")
            if name not in lazy:
                sub = f.message_cls()
                object.__setattr__(sub, "_anchor", (self, name))
                lazy[name] = sub
            return lazy[name]
        if f.type == TYPE_STRING:
            return ""
        if f.type == TYPE_BYTES:
            return b""
        if f.type == TYPE_BOOL:
            return False
        if f.type in (TYPE_DOUBLE, TYPE_FLOAT):
            return 0.0
        return 0

    # -- protobuf API subset --
    def HasField(self, name: str) -> bool:
        return name in self._values

    def WhichOneof(self, oneof_name: str):
        idx = self.DESCRIPTOR.oneofs.index(oneof_name)
        for f in self._fields_by_name.values():
            if f.oneof_index == idx and f.name in self._values:
                return f.name
        return None

    def Clear(self) -> None:
        self._values.clear()
        object.__getattribute__(self, "_lazy_subs").clear()

    def CopyFrom(self, other: "ShimMessage") -> None:
        self.Clear()
        self._values.update(other._values)

    def SerializeToString(self) -> bytes:
        out = bytearray()
        for f in sorted(
            self._fields_by_name.values(), key=lambda x: x.number
        ):
            if f.name not in self._values:
                continue
            value = self._values[f.name]
            items = value if f.repeated else [value]
            for item in items:
                out += self._encode_field(f, item)
        return bytes(out)

    @staticmethod
    def _encode_field(f: FieldDesc, item) -> bytes:
        tag_base = f.number << 3
        if f.type in _VARINT_TYPES:
            if f.type in (TYPE_SINT32, TYPE_SINT64):
                item = _zigzag_enc(int(item))
            elif f.type == TYPE_BOOL:
                item = 1 if item else 0
            return _enc_varint(tag_base | 0) + _enc_varint(int(item))
        if f.type in _FIXED64_TYPES:
            raw = (
                struct.pack("<d", float(item))
                if f.type == TYPE_DOUBLE
                else struct.pack("<q" if f.type == TYPE_SFIXED64 else "<Q",
                                 int(item))
            )
            return _enc_varint(tag_base | 1) + raw
        if f.type in _FIXED32_TYPES:
            raw = (
                struct.pack("<f", float(item))
                if f.type == TYPE_FLOAT
                else struct.pack("<i" if f.type == TYPE_SFIXED32 else "<I",
                                 int(item))
            )
            return _enc_varint(tag_base | 5) + raw
        if f.type == TYPE_STRING:
            body = item.encode("utf-8") if isinstance(item, str) else bytes(item)
        elif f.type == TYPE_BYTES:
            body = bytes(item)
        elif f.type == TYPE_MESSAGE:
            body = item.SerializeToString()
        else:
            raise ValueError(f"unsupported field type {f.type}")
        return _enc_varint(tag_base | 2) + _enc_varint(len(body)) + body

    def ParseFromString(self, data: bytes) -> int:
        self._values.clear()
        self._merge(data)
        return len(data)

    def _merge(self, data: bytes) -> None:
        for fno, wt, raw in iter_wire_fields(data):
            f = self._fields_by_number.get(fno)
            if f is None:
                continue  # unknown field: skip (not retained)
            if (
                f.repeated
                and wt == 2
                and f.type in _VARINT_TYPES | _FIXED32_TYPES | _FIXED64_TYPES
            ):
                # packed repeated scalars
                vals = []
                i = 0
                buf = raw
                while i < len(buf):
                    if f.type in _VARINT_TYPES:
                        v, i = _dec_varint(buf, i)
                        vals.append(self._from_varint(f, v))
                    elif f.type in _FIXED64_TYPES:
                        vals.append(self._from_fixed64(f, buf, i))
                        i += 8
                    else:
                        vals.append(self._from_fixed32(f, buf, i))
                        i += 4
                getattr(self, f.name).extend(vals)
                continue
            if wt == 0:
                value = self._from_varint(f, raw)
            elif wt == 1:
                value = self._from_fixed64(
                    f, struct.pack("<Q", raw), 0
                )
            elif wt == 5:
                value = self._from_fixed32(
                    f, struct.pack("<I", raw), 0
                )
            elif f.type == TYPE_STRING:
                value = raw.decode("utf-8")
            elif f.type == TYPE_BYTES:
                value = bytes(raw)
            elif f.type == TYPE_MESSAGE:
                value = f.message_cls()
                value._merge(raw)
            else:
                continue
            if f.repeated:
                getattr(self, f.name).append(value)
            else:
                setattr(self, f.name, value)

    @staticmethod
    def _from_varint(f: FieldDesc, v: int):
        if f.type in (TYPE_SINT32, TYPE_SINT64):
            return _zigzag_dec(v)
        if f.type == TYPE_BOOL:
            return bool(v)
        if f.type in (TYPE_INT32, TYPE_INT64, TYPE_ENUM):
            return _signed64(v)
        return v

    @staticmethod
    def _from_fixed64(f: FieldDesc, buf: bytes, i: int):
        if f.type == TYPE_DOUBLE:
            return struct.unpack_from("<d", buf, i)[0]
        if f.type == TYPE_SFIXED64:
            return struct.unpack_from("<q", buf, i)[0]
        return struct.unpack_from("<Q", buf, i)[0]

    @staticmethod
    def _from_fixed32(f: FieldDesc, buf: bytes, i: int):
        if f.type == TYPE_FLOAT:
            return struct.unpack_from("<f", buf, i)[0]
        if f.type == TYPE_SFIXED32:
            return struct.unpack_from("<i", buf, i)[0]
        return struct.unpack_from("<I", buf, i)[0]

    def __repr__(self) -> str:  # debugging aid
        inner = ", ".join(f"{k}={v!r}" for k, v in self._values.items())
        return f"{type(self).__name__}({inner})"


class EnumTypeShim:
    """Enum container: values as class attributes (set by the factory)."""


def build_module(file_desc: FileDescriptorShim, g: dict) -> None:
    """The builder step: create message classes, enum containers, and
    module-level enum constants into the generated module's globals."""
    classes: dict[str, type] = {}

    def make_classes(m: MessageDesc) -> None:
        cls = type(
            m.name,
            (ShimMessage,),
            {
                "DESCRIPTOR": m,
                "_fields_by_name": {f.name: f for f in m.fields},
                "_fields_by_number": {f.number: f for f in m.fields},
            },
        )
        classes[m.full_name] = cls
        g[m.name] = cls
        for nested in m.nested:
            make_classes(nested)
        for e in m.enums:
            _emit_enum(e, g, cls)

    def _emit_enum(e: EnumDesc, g: dict, owner=None) -> None:
        container = type(e.name, (EnumTypeShim,), {})
        for name, number in e.values:
            setattr(container, name, number)
            g[name] = number  # module-level constant (proto3 convention)
        g[e.name] = container
        if owner is not None:
            setattr(owner, e.name, container)

    for m in file_desc.messages:
        make_classes(m)
    for e in file_desc.enums:
        _emit_enum(e, g)

    # resolve message-typed field references (".pkg.Message" full names)
    def resolve(m: MessageDesc) -> None:
        for f in m.fields:
            if f.type == TYPE_MESSAGE:
                key = f.type_name.lstrip(".")
                if key in classes:
                    f.message_cls = classes[key]
                else:  # same-file short name fallback
                    short = key.rsplit(".", 1)[-1]
                    for full, cls in classes.items():
                        if full.rsplit(".", 1)[-1] == short:
                            f.message_cls = cls
                            break
        for nested in m.nested:
            resolve(nested)

    for m in file_desc.messages:
        resolve(m)
