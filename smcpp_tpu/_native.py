"""ctypes bindings for the native data kernels (csrc/datakernels.cpp).

Auto-builds the shared library with g++ on first import if missing; raises
ImportError when no toolchain is available, in which case the NumPy
fallbacks in data/filters.py are used.
"""

import ctypes
import os
import subprocess

import numpy as np

_HERE = os.path.dirname(__file__)
_SO = os.path.join(_HERE, "_datakernels.so")
_SRC = os.path.join(os.path.dirname(_HERE), "csrc", "datakernels.cpp")


def _build():
    subprocess.run(
        [
            "g++", "-O3", "-std=c++17", "-fPIC", "-shared",
            "-o", _SO, _SRC,
        ],
        check=True,
        capture_output=True,
    )


if not os.path.exists(_SO):
    if not os.path.exists(_SRC):
        raise ImportError("native kernels source not found")
    try:
        _build()
    except Exception as e:  # pragma: no cover
        raise ImportError(f"could not build native kernels: {e}")

_lib = ctypes.CDLL(_SO)

_i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
_i64p = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")

_lib.thin_data.restype = ctypes.c_long
_lib.thin_data.argtypes = [
    _i32p, ctypes.c_long, ctypes.c_long, ctypes.c_long, ctypes.c_long,
    _i32p, ctypes.c_long,
]
_lib.bin_observations.restype = ctypes.c_long
_lib.bin_observations.argtypes = [
    _i32p, ctypes.c_long, ctypes.c_long, _i64p, ctypes.c_long,
    _i32p, ctypes.c_long,
]
_lib.windowed_mutation_counts.restype = ctypes.c_long
_lib.windowed_mutation_counts.argtypes = [
    _i32p, ctypes.c_long, ctypes.c_long, ctypes.c_long, _i64p, ctypes.c_long,
]


def thin_data(data, thinning, offset=0):
    data = np.ascontiguousarray(data, dtype=np.int32)
    rows, cols = data.shape
    cap = int(2 * np.ceil(data[offset:, 0] / thinning).sum() + rows + 2)
    out = np.empty((cap, cols), dtype=np.int32)
    r = _lib.thin_data(data, rows, cols, thinning, offset, out, cap)
    if r < 0:
        raise RuntimeError(f"thin_data failed ({r})")
    ret = out[:r].copy()
    assert ret[:, 0].sum() == data[:, 0].sum()
    return ret


def bin_observations(data, na, w):
    data = np.ascontiguousarray(data, dtype=np.int32)
    rows, cols = data.shape
    total = int(data[:, 0].sum())
    cap = total // w + 2
    out = np.zeros((cap, cols), dtype=np.int32)
    na = np.ascontiguousarray(na, dtype=np.int64)
    r = _lib.bin_observations(data, rows, cols, na, w, out, cap)
    if r < 0:
        raise RuntimeError(f"bin_observations failed ({r})")
    return out[:r].copy()


def windowed_mutation_counts(data_rev, w):
    data_rev = np.ascontiguousarray(data_rev, dtype=np.int32)
    rows, cols = data_rev.shape
    total = int(data_rev[:, 0].sum())
    cap = total // w + 2
    out = np.zeros((cap, 2), dtype=np.int64)
    r = _lib.windowed_mutation_counts(data_rev, rows, cols, w, out, cap)
    if r < 0:
        raise RuntimeError(f"windowed_mutation_counts failed ({r})")
    return out[:r].T.copy()
