"""Native host-side components (C++ via ctypes).

The reference pulls its Poisson compositing from OpenCV's C++
``seamlessClone``; this package ships a self-contained C++ solver
(``poisson.cpp``) compiled on first use with the system toolchain and loaded
via ctypes. Build products are cached next to the source.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_DIR = os.path.dirname(__file__)
_SRC = os.path.join(_DIR, "poisson.cpp")
_SO = os.path.join(_DIR, "_poisson.so")

_lib = None


def _build():
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC",
           "-o", _SO, _SRC]
    subprocess.run(cmd, check=True, capture_output=True)


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if (not os.path.exists(_SO) or
            os.path.getmtime(_SO) < os.path.getmtime(_SRC)):
        _build()
    lib = ctypes.CDLL(_SO)
    lib.seamless_clone.restype = ctypes.c_int
    lib.seamless_clone.argtypes = [
        ctypes.POINTER(ctypes.c_uint8),  # src
        ctypes.POINTER(ctypes.c_uint8),  # dst
        ctypes.POINTER(ctypes.c_uint8),  # mask
        ctypes.c_int, ctypes.c_int,      # h, w
        ctypes.c_int, ctypes.c_int,      # center_x, center_y
        ctypes.c_int, ctypes.c_double,   # iters, omega
        ctypes.POINTER(ctypes.c_uint8),  # out
    ]
    _lib = lib
    return lib


def seamless_clone(src, dst, mask, center_xy, iters=500, omega=1.9):
    """Gradient-domain composite of ``src``'s masked region into ``dst``.

    Args:
        src/dst: uint8 RGB [H, W, 3].
        mask: uint8 [H, W], nonzero marks the clone region (src coords).
        center_xy: (x, y) target location of the mask centroid in dst.
        iters: max SOR iterations per channel.
        omega: SOR relaxation factor (1 < omega < 2).
    """
    lib = _load()
    src = np.ascontiguousarray(src, np.uint8)
    dst = np.ascontiguousarray(dst, np.uint8)
    mask = np.ascontiguousarray(mask, np.uint8)
    h, w = dst.shape[:2]
    assert src.shape == dst.shape == (h, w, 3), (src.shape, dst.shape)
    assert mask.shape == (h, w), mask.shape
    out = np.empty_like(dst)

    def p(a):
        return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))

    rc = lib.seamless_clone(p(src), p(dst), p(mask), h, w,
                            int(center_xy[0]), int(center_xy[1]),
                            int(iters), float(omega), p(out))
    if rc != 0:
        raise RuntimeError(f"seamless_clone failed with code {rc}")
    return out
