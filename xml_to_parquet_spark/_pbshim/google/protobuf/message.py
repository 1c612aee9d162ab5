"""message module shim: the base class and DecodeError generated/client
code may reference."""

from google.protobuf._runtime import ShimMessage as Message  # noqa: F401


class DecodeError(Exception):
    pass


class EncodeError(Exception):
    pass
