"""ctypes bridge to the native C++ fast-I/O library (native/fastio.cpp).

Builds the shared library on first use with g++ (cached next to the source);
every entry degrades to a None/False return so pure-Python fallbacks keep
the framework functional where no toolchain exists.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_LOCK = threading.Lock()
_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


def _repo_root() -> str:
    return os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _build_and_load() -> Optional[ctypes.CDLL]:
    src = os.path.join(_repo_root(), "native", "fastio.cpp")
    if not os.path.exists(src):
        return None
    out = os.path.join(_repo_root(), "native", "libfastio.so")
    if not os.path.exists(out) or os.path.getmtime(out) < os.path.getmtime(src):
        cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", src, "-o", out]
        try:
            subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(out)
    except OSError:
        return None
    lib.fastio_parse.restype = ctypes.POINTER(ctypes.c_double)
    lib.fastio_parse.argtypes = [
        ctypes.c_char_p,
        ctypes.c_int,
        ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_int64),
    ]
    lib.fastio_free.argtypes = [ctypes.POINTER(ctypes.c_double)]
    lib.fastio_write_tum.restype = ctypes.c_int
    lib.fastio_write_tum.argtypes = [
        ctypes.c_char_p,
        ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_double),
        ctypes.c_int64,
    ]
    return lib


def get_lib() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    with _LOCK:
        if not _TRIED:
            _LIB = _build_and_load()
            _TRIED = True
        return _LIB


def _parse(path: str, mode: int, max_rows: Optional[int]) -> Optional[np.ndarray]:
    lib = get_lib()
    if lib is None or not os.path.exists(path):
        return None
    rows = ctypes.c_int64()
    cols = ctypes.c_int64()
    ptr = lib.fastio_parse(
        path.encode(), mode, -1 if max_rows is None else max_rows,
        ctypes.byref(rows), ctypes.byref(cols),
    )
    if not ptr:
        return None
    try:
        n = rows.value * cols.value
        # from_address + frombuffer is O(1) to create (np.ctypeslib.as_array
        # pays O(n) building the ctypes array type); one copy to own the data.
        buf = (ctypes.c_double * n).from_address(
            ctypes.addressof(ptr.contents)
        )
        return np.frombuffer(buf, dtype=np.float64).reshape(
            rows.value, cols.value
        ).copy()
    finally:
        lib.fastio_free(ptr)


def parse_events(path: str, max_events: Optional[int] = None) -> Optional[np.ndarray]:
    """Whitespace table (events/imu/gt txt) -> float64 (N,4) or None.

    Timestamps MUST stay float64: at ts~100 s float32 quantizes to ~10 us,
    which corrupts t_rel inside millisecond MCI windows (the reference keeps
    EventData::ts double, include/Event/EventData.h:36-58); the window
    builder rebases to float32 only after subtracting the window start."""
    arr = _parse(path, 0, max_events)
    if arr is None:
        return None
    return np.ascontiguousarray(arr[:, :4])


def parse_txt(path: str, max_rows: Optional[int] = None) -> Optional[np.ndarray]:
    return _parse(path, 0, max_rows)


def parse_csv(path: str, max_rows: Optional[int] = None) -> Optional[np.ndarray]:
    return _parse(path, 1, max_rows)


def write_tum(path: str, header: str, data: np.ndarray) -> bool:
    lib = get_lib()
    if lib is None:
        return False
    d = np.ascontiguousarray(data, np.float64)
    assert d.ndim == 2 and d.shape[1] == 8
    rc = lib.fastio_write_tum(
        path.encode(), header.encode(),
        d.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), d.shape[0],
    )
    return rc == 0
