# Namespace root of the protobuf SHIM (see protobuf/_runtime.py).
# Loaded only when the real `protobuf` distribution is absent.
