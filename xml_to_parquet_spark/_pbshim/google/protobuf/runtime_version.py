"""runtime_version shim: version validation is a no-op (the shim tracks
the generated code it ships with, not a C runtime)."""


class Domain:
    GOOGLE_INTERNAL = 1
    PUBLIC = 2


def ValidateProtobufRuntimeVersion(*_args, **_kwargs) -> None:
    return None
