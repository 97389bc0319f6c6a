"""Loads the compiled hamming extension (built by native/build.py)."""
try:
    from . import hamming_native  # type: ignore
except ImportError:
    hamming_native = None
