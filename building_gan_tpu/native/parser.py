"""ctypes bindings to the native C++ building-JSON parser.

The reference spends its preprocessing time in Python ``json.load`` +
per-node Python loops (39.3 it/s for 10k buildings,
`notebooks/data-preprocessing.ipynb`).  Here the JSON hot path is a small C++
shared library (``libbuildingjson.so``, built by ``build.sh`` in this
directory) exposed through ctypes; this module falls back gracefully when the
library has not been built.
"""

from __future__ import annotations

import ctypes
import json
import os

_LIB_PATH = os.path.join(os.path.dirname(__file__), "libbuildingjson.so")
_lib = None


def _load():
    global _lib
    if _lib is None and os.path.exists(_LIB_PATH):
        _lib = ctypes.CDLL(_LIB_PATH)
        _lib.bj_parse_file.restype = ctypes.c_char_p
        _lib.bj_parse_file.argtypes = [ctypes.c_char_p]
        _lib.bj_free.restype = None
        _lib.bj_free.argtypes = [ctypes.c_char_p]
    return _lib


def available() -> bool:
    return _load() is not None


def parse_triplet(global_path: str, local_path: str, voxel_path: str):
    """Parse the three JSON files of one building.

    The native library re-serializes to a compact canonical JSON (validating
    and normalizing on the C++ side); until it is built this module is not
    selected (``available()`` is False) and the pure-Python path is used.
    """
    lib = _load()
    if lib is None:
        raise RuntimeError("native parser not built; call available() first")
    out = []
    for p in (global_path, local_path, voxel_path):
        raw = lib.bj_parse_file(p.encode())
        if not raw:
            raise RuntimeError(f"native parse failed for {p}")
        out.append(json.loads(raw))
    return tuple(out)
