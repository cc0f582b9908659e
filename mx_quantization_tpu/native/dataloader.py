"""ctypes wrapper + double-buffered iterator for the native batch decoder."""

from __future__ import annotations

import ctypes
import queue
import threading
from typing import Iterator, List, Sequence, Tuple

import numpy as np

from .build import build_and_load

_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
_STD = np.array([0.229, 0.224, 0.225], np.float32)


def _lib():
    lib = build_and_load("mxdataloader", ["dataloader.cpp"], libs=["jpeg"])
    fn = lib.mx_decode_batch
    fn.argtypes = [ctypes.POINTER(ctypes.c_char_p), ctypes.c_int,
                   ctypes.c_int, ctypes.POINTER(ctypes.c_float),
                   ctypes.POINTER(ctypes.c_float),
                   ctypes.POINTER(ctypes.c_float),
                   ctypes.POINTER(ctypes.c_uint8), ctypes.c_int]
    return fn


def decode_batch(paths: Sequence[str], img_size: int = 224,
                 threads: int = 0) -> Tuple[np.ndarray, np.ndarray]:
    """Decode paths -> ((N,3,S,S) fp32, ok mask (N,) uint8)."""
    fn = _lib()
    n = len(paths)
    out = np.empty((n, 3, img_size, img_size), np.float32)
    ok = np.empty((n,), np.uint8)
    arr = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    fn(arr, n, img_size,
       _MEAN.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
       _STD.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
       out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
       ok.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), threads)
    return out, ok


def iterate(paths: List[str], labels: List[int], batch_size: int,
            img_size: int, prefetch: int = 2
            ) -> Iterator[Tuple[np.ndarray, np.ndarray]]:
    """Double-buffered batch iterator: decode of batch i+1 overlaps the
    consumer's compute on batch i."""
    _lib()  # build before spawning the producer (raises early on failure)
    q: "queue.Queue" = queue.Queue(maxsize=prefetch)

    def producer():
        try:
            for i in range(0, len(paths), batch_size):
                bp = paths[i:i + batch_size]
                bl = np.asarray(labels[i:i + batch_size], np.int64)
                imgs, ok = decode_batch(bp, img_size)
                q.put((imgs, bl))
        finally:
            q.put(None)

    t = threading.Thread(target=producer, daemon=True)
    t.start()
    while True:
        item = q.get()
        if item is None:
            return
        yield item
