# Namespace root of the protobuf SHIM (see protobuf/_runtime.py).
#
# PYTHONPATH precedes site-packages in a spawned worker's sys.path, so this
# package can win the `google` binding even when a REAL protobuf
# distribution is installed (driver exports the shim path for protobuf-less
# drivers; workers may differ). Defer to reality: merge every other
# `google/` directory on sys.path into __path__ and sort the shim's own
# directory LAST, so `import google.protobuf` resolves a real installation
# first and falls back to the shim only when none exists.
import os as _os
from pkgutil import extend_path as _extend_path

__path__ = list(_extend_path(__path__, __name__))
_shim_dir = _os.path.dirname(_os.path.abspath(__file__))
__path__.sort(key=lambda p: _os.path.abspath(p) == _shim_dir)
del _os, _extend_path, _shim_dir
