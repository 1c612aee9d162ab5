"""Pure-Python protobuf runtime SHIM — see ``_runtime`` for scope and
rationale. Version string mirrors the generated-code expectation."""

__version__ = "6.33.0"
