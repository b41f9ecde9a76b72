"""Native (C++) components, compiled on demand and loaded via ctypes.

The image has g++ but no pybind11, so bindings use plain ``extern "C"``
symbols + ctypes. Compilation happens once per machine (cached .so next to
the source, rebuilt when the source is newer); every entry point degrades
gracefully to its pure-Python/numpy equivalent when no compiler is present.
"""

from forwardtacotron_tpu.native.build import load_library  # noqa: F401
