"""Native host kernels (C++ via ctypes).

Build happens lazily on first use (`g++ -O3 -shared`); set
PVPUFORMER_NO_NATIVE=1 to force the pure-numpy fallback. The only kernel so
far mirrors the reference's single compiled component (SURVEY §2.7): the BFS
click distance map used by host-only paths (the GUI demo).
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from pathlib import Path
from typing import Optional

import numpy as np

_THIS_DIR = Path(__file__).resolve().parent
_SO_PATH = _THIS_DIR / "_native.so"
_lib: Optional[ctypes.CDLL] = None
_build_failed = False


def _build() -> bool:
    src = _THIS_DIR / "dist_maps.cc"
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC",
           str(src), "-o", str(_SO_PATH)]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except (subprocess.SubprocessError, FileNotFoundError):
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _build_failed
    if _lib is not None:
        return _lib
    if _build_failed or os.environ.get("PVPUFORMER_NO_NATIVE"):
        return None
    if not _SO_PATH.exists() or \
            _SO_PATH.stat().st_mtime < (_THIS_DIR / "dist_maps.cc").stat().st_mtime:
        if not _build():
            _build_failed = True
            return None
    lib = ctypes.CDLL(str(_SO_PATH))
    lib.get_dist_maps.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_int, ctypes.c_float,
        ctypes.POINTER(ctypes.c_float)]
    lib.get_dist_maps.restype = None
    _lib = lib
    return lib


def get_dist_maps_numpy(points: np.ndarray, height: int, width: int,
                        norm_delimiter: float) -> np.ndarray:
    """Pure-python BFS fallback with identical semantics (slow; tests use it
    as the oracle for the C++ kernel)."""
    out = np.full((2, height, width), 1e6, np.float32)
    queue = []
    n = len(points)
    for i, p in enumerate(points):
        x, y = int(round(p[0])), int(round(p[1]))
        if x < 0 or y < 0 or x >= height or y >= width:
            continue
        layer = 1 if i >= n / 2 else 0
        queue.append((x, y, layer, x, y))
        out[layer, x, y] = 0.0
    head = 0
    while head < len(queue):
        x0, y0, layer, ox, oy = queue[head]
        head += 1
        for dx, dy in ((-1, 0), (0, -1), (0, 1), (1, 0)):
            x, y = x0 + dx, y0 + dy
            if not (0 <= x < height and 0 <= y < width):
                continue
            nd = ((x - ox) / norm_delimiter) ** 2 + \
                ((y - oy) / norm_delimiter) ** 2
            if out[layer, x, y] > nd:
                out[layer, x, y] = np.float32(nd)
                queue.append((x, y, layer, ox, oy))
    return out


def get_dist_maps(points: np.ndarray, height: int, width: int,
                  norm_delimiter: float = 1.0) -> np.ndarray:
    """(2N, >=2) clicks of (row, col), first half positive -> (2, H, W)
    normalized squared-distance maps (_get_dist_maps.pyx:17 signature)."""
    points = np.ascontiguousarray(points, np.float32)
    if points.ndim != 2:
        points = points.reshape(-1, points.shape[-1])
    lib = _load()
    if lib is None:
        return get_dist_maps_numpy(points, height, width, norm_delimiter)
    out = np.empty((2, height, width), np.float32)
    lib.get_dist_maps(
        points.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        points.shape[0], points.shape[1], height, width,
        ctypes.c_float(norm_delimiter),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    return out
