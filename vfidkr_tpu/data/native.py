"""ctypes bindings for the native (C++/OpenMP) host data pipeline.

Falls back to the pure-Python path transparently when the shared library has
not been built (``make -C native``).  Augmentation *decisions* (temporal
swap, crop offsets, flips) stay in Python so the sampling distribution is
identical to the reference loader; the library does the data movement
(crop + flip + u8->f32/255 normalise + NHWC batch assembly) in parallel.
"""

from __future__ import annotations

import ctypes
import os
from typing import Optional

import numpy as np

_LIB_PATHS = [
    os.path.join(os.path.dirname(__file__), "..", "..", "native",
                 "libvfidkr_native.so"),
    "libvfidkr_native.so",
]

_lib: Optional[ctypes.CDLL] = None


def load_native() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is not None:
        return _lib
    for path in _LIB_PATHS:
        try:
            lib = ctypes.CDLL(os.path.abspath(path) if os.path.sep in path
                              else path)
        except OSError:
            continue
        lib.vfidkr_augment_triplet_batch.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
            ctypes.c_int32, ctypes.c_int32,
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
        ]
        lib.vfidkr_native_version.restype = ctypes.c_int32
        # Clamp the OpenMP pool to the cpus actually available: libgomp can
        # misdetect topology in containers and oversubscribe (measured 23x
        # END-TO-END slowdown of the Vimeo sweep on a 1-cpu host).  Respect
        # an explicit OMP_NUM_THREADS if the user set one.
        if "OMP_NUM_THREADS" not in os.environ:
            try:
                # sched_getaffinity sees cgroup/affinity limits that
                # os.cpu_count() (host logical CPUs) does not — the exact
                # container scenario the measurement above came from.
                try:
                    n_cpus = len(os.sched_getaffinity(0))
                except (AttributeError, OSError):
                    n_cpus = os.cpu_count() or 1
                lib.omp_set_num_threads(ctypes.c_int(n_cpus))
            except AttributeError:
                pass
        _lib = lib
        return _lib
    return None


def native_available() -> bool:
    return load_native() is not None


def augment_triplet_batch(im1: np.ndarray, im2: np.ndarray, im3: np.ndarray,
                          aug: np.ndarray, crop_hw):
    """im1/im2/im3: (N,H,W,3) uint8 stacks (first/mid/last frames).
    aug: (N,5) int32 records [swap, oy, ox, fliplr, flipud].
    Returns dict(x0, x1, y) float32 NHWC crops."""
    lib = load_native()
    n, h, w, _ = im1.shape
    ch, cw = crop_hw
    x0 = np.empty((n, ch, cw, 3), np.float32)
    x1 = np.empty((n, ch, cw, 3), np.float32)
    y = np.empty((n, ch, cw, 3), np.float32)

    if lib is None:
        for i in range(n):
            swap, oy, ox, flr, fud = (int(v) for v in aug[i])
            first, last = (im3, im1) if swap else (im1, im3)
            for src, dst in ((first, x0), (last, x1), (im2, y)):
                crop = src[i, oy:oy + ch, ox:ox + cw]
                if flr:
                    crop = crop[:, ::-1]
                if fud:
                    crop = crop[::-1]
                dst[i] = crop.astype(np.float32) / 255.0
        return {"x0": x0, "x1": x1, "y": y}

    im1 = np.ascontiguousarray(im1)
    im2 = np.ascontiguousarray(im2)
    im3 = np.ascontiguousarray(im3)
    aug = np.ascontiguousarray(aug, np.int32)
    lib.vfidkr_augment_triplet_batch(
        im1.ctypes.data, im2.ctypes.data, im3.ctypes.data,
        n, h, w, ch, cw,
        aug.ctypes.data, x0.ctypes.data, x1.ctypes.data, y.ctypes.data)
    return {"x0": x0, "x1": x1, "y": y}


def make_aug_records(rng: np.random.RandomState, n: int, h: int, w: int,
                     crop_hw, augment: bool) -> np.ndarray:
    """Reference-order augmentation decisions (listdatasets.py:13-41)."""
    ch, cw = crop_hw
    rec = np.zeros((n, 5), np.int32)
    for i in range(n):
        rec[i, 0] = rng.randint(0, 2) if augment else 0
        rec[i, 1] = rng.randint(0, h - ch + 1) if h > ch else 0
        rec[i, 2] = rng.randint(0, w - cw + 1) if w > cw else 0
        rec[i, 3] = rng.randint(0, 2) if augment else 0
        rec[i, 4] = rng.randint(0, 2) if augment else 0
    return rec
