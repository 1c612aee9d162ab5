"""symbol_database shim: registration is bookkeeping the shim's builder
does not need; keep the calls callable."""

_default = None


class _SymbolDatabase:
    def RegisterMessage(self, message):
        return message

    def RegisterFileDescriptor(self, fd):
        return fd

    def GetPrototype(self, descriptor):
        raise NotImplementedError("shim: GetPrototype unsupported")


def Default() -> _SymbolDatabase:
    global _default
    if _default is None:
        _default = _SymbolDatabase()
    return _default
