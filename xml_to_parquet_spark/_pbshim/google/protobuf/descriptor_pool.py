"""descriptor_pool shim: AddSerializedFile parses the embedded
FileDescriptorProto with the shim runtime."""

from google.protobuf._runtime import FileDescriptorShim

_default = None


class _Pool:
    def __init__(self) -> None:
        self._files = {}

    def AddSerializedFile(self, data: bytes) -> FileDescriptorShim:
        fd = FileDescriptorShim(data)
        self._files[fd.name] = fd
        return fd


def Default() -> _Pool:
    global _default
    if _default is None:
        _default = _Pool()
    return _default
