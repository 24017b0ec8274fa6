"""Native host layer (C++): transpose-VCF codec and fast VCF ingest.

Build in place with:  python setup.py build_ext --inplace
Falls back to the pure-Python implementations when the extension is absent.
"""

try:
    from . import _usher_native as ext  # type: ignore

    HAVE_NATIVE = True
except ImportError:  # pragma: no cover - depends on build step
    ext = None
    HAVE_NATIVE = False
