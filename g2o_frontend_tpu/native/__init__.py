"""Native (C++) runtime components, loaded via ctypes.

Auto-builds the shared library on first import if a toolchain is present;
all call sites fall back to the pure-Python paths when unavailable.
"""
from __future__ import annotations

import ctypes
import os
import subprocess

_DIR = os.path.dirname(os.path.abspath(__file__))
_LIB_PATH = os.path.join(_DIR, "libfastg2o.so")


def _build() -> bool:
    src = os.path.join(_DIR, "fastg2o.cpp")
    try:
        subprocess.run(
            ["g++", "-O2", "-shared", "-fPIC", "-o", _LIB_PATH, src],
            check=True,
            capture_output=True,
            timeout=120,
        )
        return True
    except Exception:
        return False


class _CTable(ctypes.Structure):
    _fields_ = [
        ("data", ctypes.POINTER(ctypes.c_double)),
        ("rows", ctypes.c_long),
        ("cols", ctypes.c_long),
    ]


class _G2OResult(ctypes.Structure):
    _fields_ = [
        (n, _CTable)
        for n in (
            "vertex_se2",
            "vertex_xy",
            "vertex_se3",
            "edge_se2",
            "edge_se2_xy",
            "edge_se3",
            "fixed",
            "params",
            "features",
            "laser_meta",
            "laser_ranges",
            "vertex_line2d",
            "vertex_extreme",
            "edge_se2_line2d",
            "edge_line2d_xy",
        )
    ]


_lib = None


def load_library():
    """Returns the ctypes library or None (builds on demand)."""
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.isfile(_LIB_PATH) and not _build():
        return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
        # ABI check: rebuild stale libraries from older source revisions
        try:
            lib.fastg2o_abi.restype = ctypes.c_long
            abi = int(lib.fastg2o_abi())
        except AttributeError:
            abi = 1
        if abi != 2:
            del lib
            if not _build():
                return None
            lib = ctypes.CDLL(_LIB_PATH)
        lib.fastg2o_parse.restype = ctypes.POINTER(_G2OResult)
        lib.fastg2o_parse.argtypes = [ctypes.c_char_p, ctypes.c_long]
        lib.fastg2o_free.argtypes = [ctypes.POINTER(_G2OResult)]
        _lib = lib
        return lib
    except OSError:
        return None


def parse_g2o_bytes(data: bytes):
    """Parse a .g2o byte buffer -> dict of numpy arrays, or None."""
    import numpy as np

    lib = load_library()
    if lib is None:
        return None
    res = lib.fastg2o_parse(data, len(data))
    try:
        out = {}
        for name, _ in _G2OResult._fields_:
            t = getattr(res.contents, name)
            if t.rows and t.data:
                arr = np.ctypeslib.as_array(t.data, shape=(t.rows, t.cols)).copy()
            else:
                arr = np.zeros((0, t.cols if t.cols else 1))
            out[name] = arr
        return out
    finally:
        lib.fastg2o_free(res)
