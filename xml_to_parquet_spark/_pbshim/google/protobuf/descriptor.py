"""descriptor module shim: generated code only checks the C-extension
flag and assigns bookkeeping attributes onto descriptor objects."""

_USE_C_DESCRIPTORS = False


class Placeholder:
    """Accepts arbitrary attribute assignment (generated modules set
    _serialized_start/_serialized_end/_loaded_options/_options)."""

    def __init__(self, name: str = "") -> None:
        self.name = name
