"""ctypes bindings to the native (C++) data-loading runtime.

The reference delegates audio IO to librosa on the Python side
(/root/reference/data_utils.py:43-48); here the hot host-side path (WAV/AU
decode, resample, window segmentation) is a small C++ library
(runtime/audio_loader.cc) so the input pipeline never bottlenecks the TPU.
Falls back to pure numpy when the shared library hasn't been built.
"""

from __future__ import annotations

import ctypes
import os
import wave
from typing import Optional, Tuple

import numpy as np

_LIB_PATHS = [
    os.path.join(os.path.dirname(__file__), "..", "..", "runtime", "build", "libaudio_loader.so"),
    os.path.join(os.path.dirname(__file__), "_native", "libaudio_loader.so"),
]

_lib = None
_lib_checked = False


def _load_lib() -> Optional[ctypes.CDLL]:
    global _lib, _lib_checked
    if _lib_checked:
        return _lib
    _lib_checked = True
    for p in _LIB_PATHS:
        p = os.path.abspath(p)
        if os.path.exists(p):
            try:
                lib = ctypes.CDLL(p)
                lib.vmt_load_wav.restype = ctypes.c_int
                lib.vmt_load_wav.argtypes = [
                    ctypes.c_char_p,                      # path
                    ctypes.POINTER(ctypes.c_float),       # out buffer
                    ctypes.c_long,                        # out capacity (samples)
                    ctypes.POINTER(ctypes.c_long),        # out length
                    ctypes.POINTER(ctypes.c_int),         # out sample rate
                ]
                lib.vmt_load_batch.restype = ctypes.c_long
                lib.vmt_load_batch.argtypes = [
                    ctypes.POINTER(ctypes.c_char_p), ctypes.c_long,
                    ctypes.c_int, ctypes.c_long,
                    ctypes.POINTER(ctypes.c_float),
                    ctypes.POINTER(ctypes.c_long), ctypes.c_int,
                ]
                lib.vmt_split_windows.restype = ctypes.c_long
                lib.vmt_split_windows.argtypes = [
                    ctypes.POINTER(ctypes.c_float), ctypes.c_long,
                    ctypes.c_double, ctypes.c_double,
                    ctypes.POINTER(ctypes.c_float), ctypes.c_long,
                ]
                lib.vmt_prefetcher_create.restype = ctypes.c_void_p
                lib.vmt_prefetcher_create.argtypes = [
                    ctypes.POINTER(ctypes.c_char_p), ctypes.c_long,
                    ctypes.c_int, ctypes.c_long, ctypes.c_long,
                    ctypes.c_int, ctypes.c_int, ctypes.c_uint64,
                ]
                lib.vmt_prefetcher_next.restype = ctypes.c_int
                lib.vmt_prefetcher_next.argtypes = [
                    ctypes.c_void_p, ctypes.POINTER(ctypes.c_float)]
                lib.vmt_prefetcher_destroy.restype = None
                lib.vmt_prefetcher_destroy.argtypes = [ctypes.c_void_p]
                _lib = lib
                break
            except OSError:
                continue
    return _lib


def load_batch(paths, target_sr: int, max_len: int,
               n_threads: int = 0) -> Tuple[np.ndarray, np.ndarray]:
    """Parallel decode+resample of many WAVs into a dense (N, max_len) array.

    Returns (waves, lengths); lengths[i] == -1 marks a failed file.
    Requires the native library (raises RuntimeError otherwise).
    """
    lib = _load_lib()
    if lib is None:
        raise RuntimeError("native audio loader not built (make -C runtime)")
    n = len(paths)
    c_paths = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    out = np.zeros((n, max_len), np.float32)
    lengths = np.zeros(n, np.int64)
    lib.vmt_load_batch(
        c_paths, n, target_sr, max_len,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        lengths.ctypes.data_as(ctypes.POINTER(ctypes.c_long)), n_threads)
    return out, lengths


def split_windows(signal: np.ndarray, window: float, overlap: float) -> np.ndarray:
    """Native overlapping-window segmentation (data_utils.py:65-91 semantics)."""
    lib = _load_lib()
    if lib is None:
        raise RuntimeError("native audio loader not built (make -C runtime)")
    signal = np.ascontiguousarray(signal, np.float32).reshape(-1)
    chunk = int(len(signal) * window)
    if chunk <= 0:
        return np.zeros((0, 0), np.float32)
    offset = max(int(chunk * (1.0 - overlap)), 1)
    max_segs = max((len(signal) - chunk) // offset + 1, 0)
    out = np.zeros((max_segs, chunk), np.float32)
    n = lib.vmt_split_windows(
        signal.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), len(signal),
        window, overlap,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), out.size)
    return out[:n]


def available() -> bool:
    return _load_lib() is not None


class BatchPrefetcher:
    """Native background batch pipeline: a C++ thread pool decodes+resamples
    WAV batches into a bounded ring buffer ahead of the consumer, overlapping
    host IO with device compute.  Iterate with next_batch(); batches are
    reshuffled each epoch on the native side.
    """

    def __init__(self, paths, target_sr: int, max_len: int, batch: int,
                 n_threads: int = 2, shuffle: bool = True, seed: int = 0):
        lib = _load_lib()
        if lib is None:
            raise RuntimeError("native audio loader not built (make -C runtime)")
        self._lib = lib
        self.batch = batch
        self.max_len = max_len
        self._paths = [p.encode() for p in paths]  # keep alive
        c_paths = (ctypes.c_char_p * len(self._paths))(*self._paths)
        self._handle = lib.vmt_prefetcher_create(
            c_paths, len(self._paths), target_sr, max_len, batch,
            n_threads, int(shuffle), seed)
        if not self._handle:
            raise RuntimeError("failed to create native prefetcher")

    def next_batch(self) -> np.ndarray:
        """Blocks until a prefetched (batch, max_len, 1) float32 batch is ready."""
        out = np.empty((self.batch, self.max_len), np.float32)
        rc = self._lib.vmt_prefetcher_next(
            self._handle, out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
        if rc != 0:
            raise StopIteration("prefetcher stopped")
        return out[..., None]

    def close(self):
        if self._handle:
            self._lib.vmt_prefetcher_destroy(self._handle)
            self._handle = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


def load_wav(path: str) -> Tuple[np.ndarray, int]:
    """Decode a WAV file to mono float32. Returns (samples, sample_rate)."""
    lib = _load_lib()
    if lib is not None:
        cap = os.path.getsize(path)  # bytes >= samples for 16-bit audio
        buf = np.empty(cap, dtype=np.float32)
        out_len = ctypes.c_long(0)
        out_sr = ctypes.c_int(0)
        rc = lib.vmt_load_wav(
            path.encode(), buf.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            ctypes.c_long(cap), ctypes.byref(out_len), ctypes.byref(out_sr),
        )
        if rc == 0:
            return buf[: out_len.value].copy(), out_sr.value
    # numpy fallback
    with wave.open(path, "rb") as f:
        sr = f.getframerate()
        n = f.getnframes()
        width = f.getsampwidth()
        raw = f.readframes(n)
        if width == 2:
            x = np.frombuffer(raw, dtype=np.int16).astype(np.float32) / 32768.0
        elif width == 1:
            x = (np.frombuffer(raw, dtype=np.uint8).astype(np.float32) - 128.0) / 128.0
        elif width == 4:
            x = np.frombuffer(raw, dtype=np.int32).astype(np.float32) / 2147483648.0
        else:
            raise ValueError(f"unsupported sample width {width}")
        if f.getnchannels() > 1:
            x = x.reshape(-1, f.getnchannels()).mean(axis=1)
    return x, sr
