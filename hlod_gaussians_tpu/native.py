"""ctypes bindings for the native runtime components (native/).

* `NativeImageLoader` — threaded JPEG/PNG decode + prefetch pool
  (native/src/image_loader.cpp), the role torch DataLoader workers play in
  the reference (train_single.py:53). Falls back to PIL when the shared
  library is not built.
* `build_hierarchy_file` — offline hierarchy creator
  (native/src/hierarchy_creator.cpp), .dhier-writing equivalent of the
  reference's GaussianHierarchyCreator executable.

Build once with:  cmake -S native -B native/build && cmake --build native/build
"""

from __future__ import annotations

import ctypes
import os
from typing import List, Optional, Sequence

import numpy as np

_LIB_PATHS = [
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 "native", "build", "libhlod_native.so"),
]


def _load_lib() -> Optional[ctypes.CDLL]:
    for p in _LIB_PATHS:
        if os.path.exists(p):
            lib = ctypes.CDLL(p)
            lib.hlod_loader_create.restype = ctypes.c_void_p
            lib.hlod_loader_create.argtypes = [
                ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
                ctypes.c_int, ctypes.c_int]
            lib.hlod_loader_shape.restype = ctypes.c_int
            lib.hlod_loader_shape.argtypes = [
                ctypes.c_void_p, ctypes.c_int,
                ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int)]
            lib.hlod_loader_read.restype = ctypes.c_int
            lib.hlod_loader_read.argtypes = [
                ctypes.c_void_p, ctypes.c_int,
                ctypes.POINTER(ctypes.c_float), ctypes.c_int64]
            lib.hlod_loader_prefetch.argtypes = [
                ctypes.c_void_p, ctypes.POINTER(ctypes.c_int), ctypes.c_int]
            lib.hlod_loader_destroy.argtypes = [ctypes.c_void_p]
            lib.hlod_build_hierarchy_file.restype = ctypes.c_int
            lib.hlod_build_hierarchy_file.argtypes = [ctypes.c_char_p,
                                                      ctypes.c_char_p]
            return lib
    return None


_LIB = _load_lib()


def native_available() -> bool:
    return _LIB is not None


class NativeImageLoader:
    """Threaded prefetching image loader; returns [3,H,W] float32 in [0,1]."""

    def __init__(self, paths: Sequence[str], n_threads: int = 8,
                 max_width: int = 1600, cache_cap: int = 64):
        self.paths = list(paths)
        self.max_width = max_width
        self._handle = None
        if _LIB is not None:
            arr = (ctypes.c_char_p * len(self.paths))(
                *[p.encode() for p in self.paths])
            self._handle = _LIB.hlod_loader_create(
                arr, len(self.paths), n_threads, max_width, cache_cap)

    def prefetch(self, idxs: Sequence[int]) -> None:
        if self._handle is not None and len(idxs):
            arr = (ctypes.c_int * len(idxs))(*idxs)
            _LIB.hlod_loader_prefetch(self._handle, arr, len(idxs))

    def get(self, idx: int) -> np.ndarray:
        if self._handle is not None:
            h = ctypes.c_int()
            w = ctypes.c_int()
            if _LIB.hlod_loader_shape(self._handle, idx,
                                      ctypes.byref(h), ctypes.byref(w)) == 0:
                out = np.empty((3, h.value, w.value), np.float32)
                rc = _LIB.hlod_loader_read(
                    self._handle, idx,
                    out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                    out.size)
                if rc == 0:
                    return out
        return self._pil_get(idx)

    def _pil_get(self, idx: int) -> np.ndarray:
        from PIL import Image
        img = Image.open(self.paths[idx]).convert("RGB")
        if self.max_width > 0 and img.width > self.max_width:
            nh = round(img.height * self.max_width / img.width)
            img = img.resize((self.max_width, nh), Image.BILINEAR)
        a = np.asarray(img, np.float32) / 255.0
        return np.transpose(a, (2, 0, 1)).copy()

    def close(self):
        if self._handle is not None:
            _LIB.hlod_loader_destroy(self._handle)
            self._handle = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


def build_hierarchy_file(in_ply: str, out_dhier: str) -> int:
    """Run the native offline hierarchy creator. Returns the node count."""
    if _LIB is None:
        raise RuntimeError("native library not built "
                           "(cmake -S native -B native/build && "
                           "cmake --build native/build)")
    rc = _LIB.hlod_build_hierarchy_file(in_ply.encode(), out_dhier.encode())
    if rc < 0:
        raise RuntimeError(f"hierarchy creator failed with code {rc}")
    return rc
