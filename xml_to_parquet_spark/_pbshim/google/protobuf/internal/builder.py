"""builder shim: the two entry points generated modules call.

BuildMessageAndEnumDescriptors publishes `_MESSAGENAME` placeholder
descriptor objects (generated modules assign _serialized_start/... onto
them); BuildTopDescriptorsAndMessages creates the message classes, enum
containers, and module-level enum constants via the shim runtime."""

from google.protobuf._runtime import FileDescriptorShim, build_module
from google.protobuf.descriptor import Placeholder


def _walk_names(msg, out):
    out.append(msg.name)
    for nested in msg.nested:
        _walk_names(nested, out)


def BuildMessageAndEnumDescriptors(
    file_desc: FileDescriptorShim, g: dict
) -> None:
    names = []
    for m in file_desc.messages:
        _walk_names(m, names)
    for e in file_desc.enums:
        names.append(e.name)
    for m in file_desc.messages:
        for e in m.enums:
            names.append(e.name)
    for name in names:
        g[f"_{name.upper()}"] = Placeholder(name)


def BuildTopDescriptorsAndMessages(
    file_desc: FileDescriptorShim, _module_name: str, g: dict
) -> None:
    build_module(file_desc, g)
