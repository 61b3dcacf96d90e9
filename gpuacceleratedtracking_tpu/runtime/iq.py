"""ctypes binding to the native IQ ingest library (`native/iqstream`).

Builds the shared library on first use with the in-image g++ (no pybind11 in
this environment — plain C ABI + ctypes). Falls back to a NumPy decoder if no
compiler is available, so the package never hard-fails.
"""

from __future__ import annotations

import ctypes
import pathlib
import subprocess
import threading
from typing import Optional

import numpy as np

FORMATS = {"int8": 0, "int16": 1, "float32": 2}
_DTYPES = {"int8": np.int8, "int16": np.int16, "float32": np.float32}

_ROOT = pathlib.Path(__file__).resolve().parent.parent.parent
_SRC = _ROOT / "native" / "iqstream" / "iqstream.cpp"
_LIB = _ROOT / "native" / "build" / "libiqstream.so"
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_lib_failed = False


def _build_lib() -> Optional[ctypes.CDLL]:
    global _lib, _lib_failed
    with _lock:
        if _lib is not None or _lib_failed:
            return _lib
        try:
            if not _LIB.exists() or _LIB.stat().st_mtime < _SRC.stat().st_mtime:
                _LIB.parent.mkdir(parents=True, exist_ok=True)
                subprocess.run(
                    ["g++", "-O3", "-march=native", "-std=c++17", "-fPIC",
                     "-shared", "-o", str(_LIB), str(_SRC)],
                    check=True, capture_output=True, timeout=120,
                )
            lib = ctypes.CDLL(str(_LIB))
        except Exception:
            _lib_failed = True
            return None
        f32p = ctypes.POINTER(ctypes.c_float)
        lib.iq_decode.argtypes = [ctypes.c_void_p, ctypes.c_int,
                                  ctypes.c_int64, ctypes.c_float, f32p, f32p]
        lib.iq_decode.restype = ctypes.c_int
        lib.iqfile_open.argtypes = [ctypes.c_char_p, ctypes.c_int]
        lib.iqfile_open.restype = ctypes.c_void_p
        lib.iqfile_read.argtypes = [ctypes.c_void_p, ctypes.c_int64,
                                    ctypes.c_float, f32p, f32p]
        lib.iqfile_read.restype = ctypes.c_int64
        lib.iqfile_num_samples.argtypes = [ctypes.c_void_p]
        lib.iqfile_num_samples.restype = ctypes.c_int64
        lib.iqfile_close.argtypes = [ctypes.c_void_p]
        lib.iqring_create.argtypes = [ctypes.c_int64]
        lib.iqring_create.restype = ctypes.c_void_p
        lib.iqring_size.argtypes = [ctypes.c_void_p]
        lib.iqring_size.restype = ctypes.c_int64
        lib.iqring_push.argtypes = [ctypes.c_void_p, f32p, f32p,
                                    ctypes.c_int64]
        lib.iqring_push.restype = ctypes.c_int64
        lib.iqring_pop_block.argtypes = [ctypes.c_void_p, f32p, f32p,
                                         ctypes.c_int64]
        lib.iqring_pop_block.restype = ctypes.c_int64
        lib.iqring_destroy.argtypes = [ctypes.c_void_p]
        lib.resampler_create.argtypes = [ctypes.c_int64, ctypes.c_int64,
                                         ctypes.c_int, ctypes.c_double]
        lib.resampler_create.restype = ctypes.c_void_p
        lib.resampler_out_count.argtypes = [ctypes.c_void_p, ctypes.c_int64]
        lib.resampler_out_count.restype = ctypes.c_int64
        lib.resampler_process.argtypes = [ctypes.c_void_p, f32p, f32p,
                                          ctypes.c_int64, f32p, f32p,
                                          ctypes.c_int64]
        lib.resampler_process.restype = ctypes.c_int64
        lib.resampler_destroy.argtypes = [ctypes.c_void_p]
        _lib = lib
        return _lib


def native_available() -> bool:
    return _build_lib() is not None


def _fptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def decode(raw: bytes | np.ndarray, fmt: str, scale: float = 1.0):
    """Decode interleaved complex samples into SoA (re, im) float32 planes."""
    code = FORMATS[fmt]
    raw = np.frombuffer(raw, dtype=_DTYPES[fmt]) if isinstance(raw, bytes) else raw
    num = raw.size // 2
    out_re = np.empty(num, np.float32)
    out_im = np.empty(num, np.float32)
    lib = _build_lib()
    if lib is not None:
        rc = lib.iq_decode(
            raw.ctypes.data_as(ctypes.c_void_p), code, num,
            ctypes.c_float(scale), _fptr(out_re), _fptr(out_im),
        )
        if rc != 0:
            raise RuntimeError(f"iq_decode failed: {rc}")
    else:  # NumPy fallback
        x = raw.astype(np.float32) * scale
        out_re, out_im = np.ascontiguousarray(x[0::2]), np.ascontiguousarray(x[1::2])
    return out_re, out_im


class IQFile:
    """Block reader over a raw interleaved-complex capture file."""

    def __init__(self, path: str | pathlib.Path, fmt: str = "int8",
                 scale: float = 1.0):
        self.path = pathlib.Path(path)
        self.fmt = fmt
        self.scale = scale
        self._lib = _build_lib()
        if self._lib is not None:
            self._h = self._lib.iqfile_open(
                str(self.path).encode(), FORMATS[fmt]
            )
            if not self._h:
                raise FileNotFoundError(path)
            self._pos = None
        else:
            self._f = open(self.path, "rb")
            self._h = None

    @property
    def num_samples(self) -> int:
        if self._h is not None:
            return int(self._lib.iqfile_num_samples(self._h))
        import os

        bytes_per = 2 * np.dtype(_DTYPES[self.fmt]).itemsize
        return os.path.getsize(self.path) // bytes_per

    def read(self, num_samples: int):
        """Read the next block as SoA float32 planes (short read at EOF)."""
        if self._h is not None:
            out_re = np.empty(num_samples, np.float32)
            out_im = np.empty(num_samples, np.float32)
            got = int(self._lib.iqfile_read(
                self._h, num_samples, ctypes.c_float(self.scale),
                _fptr(out_re), _fptr(out_im),
            ))
            return out_re[:got], out_im[:got]
        bytes_per = 2 * np.dtype(_DTYPES[self.fmt]).itemsize
        raw = self._f.read(num_samples * bytes_per)
        return decode(raw, self.fmt, self.scale)

    def close(self):
        if self._h is not None:
            self._lib.iqfile_close(self._h)
            self._h = None
        elif getattr(self, "_f", None):
            self._f.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


class Resampler:
    """Streaming polyphase rational resampler (native C++).

    Converts front-end sample rates (10.000, 16.368, 25.000 MS/s ...) to the
    kernel-friendly power-of-two rates (8.192, 32.768 MS/s) by a rational
    factor ``up/down`` with a Kaiser-windowed-sinc anti-aliasing prototype.
    Carries filter history across `process` calls, so chunked input (file
    reads, ring pops) yields identical output to one-shot conversion.

    >>> rs = Resampler.for_rates(10.0e6, 8.192e6)   # up=512, down=625
    >>> out_re, out_im = rs.process(re, im)
    """

    def __init__(self, up: int, down: int, taps_per_phase: int = 24,
                 kaiser_beta: float = 8.0):
        lib = _build_lib()
        if lib is None:
            raise RuntimeError("native iqstream library unavailable")
        g = np.gcd(int(up), int(down))
        self.up, self.down = int(up) // g, int(down) // g
        self._lib = lib
        self._h = lib.resampler_create(
            self.up, self.down, int(taps_per_phase), float(kaiser_beta)
        )
        if not self._h:
            raise MemoryError("resampler_create failed")

    @classmethod
    def for_rates(cls, fs_in: float, fs_out: float, max_den: int = 1 << 15,
                  **kw) -> "Resampler":
        """Build from sample rates; the ratio must be rational within
        ``max_den`` (true for any pair of real front-end/kernel rates)."""
        from fractions import Fraction

        frac = Fraction(fs_out / fs_in).limit_denominator(max_den)
        got = fs_in * frac.numerator / frac.denominator
        if abs(got - fs_out) > 1e-6 * fs_out:
            raise ValueError(
                f"rate ratio {fs_out}/{fs_in} not rational within 1/{max_den}"
            )
        return cls(frac.numerator, frac.denominator, **kw)

    def process(self, re: np.ndarray, im: np.ndarray):
        """Consume SoA input planes; return the resampled SoA planes."""
        re = np.ascontiguousarray(re, np.float32)
        im = np.ascontiguousarray(im, np.float32)
        n_out = int(self._lib.resampler_out_count(self._h, re.size))
        out_re = np.empty(n_out, np.float32)
        out_im = np.empty(n_out, np.float32)
        got = int(self._lib.resampler_process(
            self._h, _fptr(re), _fptr(im), re.size,
            _fptr(out_re), _fptr(out_im), n_out,
        ))
        return out_re[:got], out_im[:got]

    def close(self):
        if getattr(self, "_h", None):
            self._lib.resampler_destroy(self._h)
            self._h = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


class IQRing:
    """Lock-free SPSC ring of SoA samples (front-end thread -> tracker)."""

    def __init__(self, capacity: int):
        lib = _build_lib()
        if lib is None:
            raise RuntimeError("native iqstream library unavailable")
        self._lib = lib
        self._h = lib.iqring_create(capacity)
        if not self._h:
            raise MemoryError("iqring_create failed")

    def __len__(self) -> int:
        return int(self._lib.iqring_size(self._h))

    def push(self, re: np.ndarray, im: np.ndarray) -> int:
        re = np.ascontiguousarray(re, np.float32)
        im = np.ascontiguousarray(im, np.float32)
        return int(self._lib.iqring_push(self._h, _fptr(re), _fptr(im),
                                         re.size))

    def pop_block(self, num_samples: int):
        """Pop exactly one correlator block, or None if not yet buffered."""
        out_re = np.empty(num_samples, np.float32)
        out_im = np.empty(num_samples, np.float32)
        got = int(self._lib.iqring_pop_block(self._h, _fptr(out_re),
                                             _fptr(out_im), num_samples))
        if got == 0:
            return None
        return out_re, out_im

    def close(self):
        if self._h:
            self._lib.iqring_destroy(self._h)
            self._h = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
