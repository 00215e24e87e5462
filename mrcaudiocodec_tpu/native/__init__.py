"""ctypes loader for the native host bitstream runtime (mrc_native.cpp).

Builds the shared library on demand with the toolchain in the image
(g++ -O2 -shared); falls back to the pure-NumPy/Python paths when no
compiler is available. `available()` reports which path is active.
"""
from __future__ import annotations

import ctypes
import functools
import os
import subprocess
import sys

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "mrc_native.cpp")
_SO = os.path.join(_DIR, f"mrc_native_{sys.implementation.cache_tag}.so")


def _build() -> str | None:
    if os.path.exists(_SO) and os.path.getmtime(_SO) >= os.path.getmtime(_SRC):
        return _SO
    tmp = f"{_SO}.tmp.{os.getpid()}"   # atomic publish; see _build_xmath
    for cxx in ("g++", "c++", "clang++"):
        try:
            subprocess.run(
                [cxx, "-O2", "-std=c++17", "-shared", "-fPIC", "-pthread",
                 _SRC, "-o", tmp],
                check=True, capture_output=True, timeout=120)
            os.replace(tmp, _SO)
            return _SO
        except (FileNotFoundError, subprocess.CalledProcessError,
                subprocess.TimeoutExpired):
            _unlink_quiet(tmp)    # failed/timed-out attempt may leave output
            continue
    return None


def _unlink_quiet(path: str) -> None:
    try:
        os.unlink(path)
    except OSError:
        pass


@functools.lru_cache(maxsize=1)
def _lib():
    so = _build()
    if so is None:
        return None
    lib = ctypes.CDLL(so)
    lib.mrc_decode_records.restype = ctypes.c_int
    lib.mrc_pack_codes.restype = ctypes.c_int64
    return lib


def available() -> bool:
    return _lib() is not None


# ---------------------------------------------------------------------------
# Strict-IEEE xmath CPU kernel (XLA FFI custom call) — see xmath_ffi.cpp
# ---------------------------------------------------------------------------

_XSRC = os.path.join(_DIR, "xmath_ffi.cpp")
_XSO = os.path.join(_DIR, f"mrc_xmath_{sys.implementation.cache_tag}.so")


def _build_xmath() -> str | None:
    return _build_ffi(_XSRC, _XSO)


_PSRC = os.path.join(_DIR, "xpsy_ffi.cpp")
_PSO = os.path.join(_DIR, f"mrc_xpsy_{sys.implementation.cache_tag}.so")


def _build_ffi(src: str, so: str) -> str | None:
    """Shared strict-IEEE FFI build: -ffp-contract=off is LOAD-BEARING
    (GCC contracts mul+add to FMA by default even without -ffast-math,
    which would break the bit-exact IEEE-sequence contract these kernels
    exist to uphold). Compile to a private temp path and os.replace()
    into place: several processes (multi-host launch, pytest-xdist) may
    race to build, and a reader must never CDLL a half-written .so."""
    if os.path.exists(so) and os.path.getmtime(so) >= os.path.getmtime(src):
        return so
    import jax.ffi
    inc = jax.ffi.include_dir()
    tmp = f"{so}.tmp.{os.getpid()}"
    for cxx in ("g++", "c++", "clang++"):
        for extra in (["-fopenmp"], []):
            try:
                subprocess.run(
                    [cxx, "-O3", "-std=c++17", "-shared", "-fPIC",
                     "-ffp-contract=off", f"-I{inc}", *extra,
                     src, "-o", tmp],
                    check=True, capture_output=True, timeout=180)
                os.replace(tmp, so)
                return so
            except (FileNotFoundError, subprocess.CalledProcessError,
                    subprocess.TimeoutExpired):
                _unlink_quiet(tmp)
                continue
    return None


@functools.lru_cache(maxsize=1)
def xpsy_ffi_registered() -> bool:
    """Build + register the mrc_xpsy CPU custom call. True if usable."""
    so = _build_ffi(_PSRC, _PSO)
    if so is None:
        return False
    import jax.ffi
    lib = ctypes.CDLL(so)
    jax.ffi.register_ffi_target(
        "mrc_xpsy", jax.ffi.pycapsule(lib.MrcXpsy), platform="cpu")
    return True


@functools.lru_cache(maxsize=1)
def xmath_ffi_registered() -> bool:
    """Build + register the mrc_xmath CPU custom call. True if usable."""
    so = _build_xmath()
    if so is None:
        return False
    import jax.ffi
    lib = ctypes.CDLL(so)
    jax.ffi.register_ffi_target(
        "mrc_xmath", jax.ffi.pycapsule(lib.MrcXmath), platform="cpu")
    return True


def _ptr(a, ty):
    return a.ctypes.data_as(ctypes.POINTER(ty))


@functools.lru_cache(maxsize=None)
def _decode_tables(fs: int):
    """Contiguous int64/int32 table arrays for the C ABI."""
    from .. import tables as T

    out = []
    for which in ("sf", "small", "mid", "esc"):
        min_len, max_len, first_code, first_sym, order = T.decode_table(which)
        if which == "sf":
            cb = T.sf_codebook()
        else:
            cb = T.spectrum_codebooks()["small mid esc".split().index(which)]
        counts = np.bincount(cb.lengths, minlength=max_len + 2).astype(np.int64)
        out.append((np.ascontiguousarray(first_code, np.int64),
                    np.ascontiguousarray(first_sym, np.int64),
                    np.ascontiguousarray(order, np.int64),
                    counts, int(min_len), int(max_len)))
    lay = T.unified_layout(fs)
    edges = np.ascontiguousarray(lay["edges"], np.int32)
    width = np.ascontiguousarray(lay["width"], np.int32)
    return out, edges, width, int(lay["nb"])


def decode_records(data: bytes, content_bit_offsets: np.ndarray, fs: int,
                   n_threads: int = 0):
    """Decode all frame records natively.

    content_bit_offsets: [R] int64 bit offset of each record's content
    (i.e. after the 20-bit length prefix).
    Returns (q [R,1024] i32, e_band [R,NB] i32, bt [R] i32, gain [R] i32)
    or None if the native library is unavailable.
    """
    lib = _lib()
    if lib is None:
        return None
    from .. import config as C

    (sf, sm, md, es), edges, width, nb = _decode_tables(fs)
    r = len(content_bit_offsets)
    q = np.zeros((r, C.LONG_COEFFS), np.int32)
    e_band = np.zeros((r, nb), np.int32)
    bt = np.zeros(r, np.int32)
    gain = np.zeros(r, np.int32)
    buf = np.frombuffer(data, np.uint8)
    offs = np.ascontiguousarray(content_bit_offsets, np.int64)

    def targs(t):
        fc, fsym, order, counts, mn, mx = t
        return (_ptr(fc, ctypes.c_int64), _ptr(fsym, ctypes.c_int64),
                _ptr(order, ctypes.c_int64), _ptr(counts, ctypes.c_int64),
                ctypes.c_int32(mn), ctypes.c_int32(mx))

    rc = lib.mrc_decode_records(
        _ptr(buf, ctypes.c_uint8), ctypes.c_int64(len(buf) * 8),
        _ptr(offs, ctypes.c_int64),
        ctypes.c_int64(r),
        *targs(sf), *targs(sm), *targs(md), *targs(es),
        _ptr(edges, ctypes.c_int32), _ptr(width, ctypes.c_int32),
        ctypes.c_int32(nb), ctypes.c_int32(C.LONG_COEFFS),
        ctypes.c_int32(n_threads),
        _ptr(q, ctypes.c_int32), _ptr(e_band, ctypes.c_int32),
        _ptr(bt, ctypes.c_int32), _ptr(gain, ctypes.c_int32))
    if rc != 0:
        raise ValueError(f"native decode failed with code {rc}")
    return q, e_band, bt, gain


def pack_records_native(q, amp, gain, bt, cb, fs: int,
                        n_threads: int = 0) -> bytes | None:
    """Emit all frame records (prefix+content+pad) natively, in parallel.

    q [R,1024] int16, amp [R,NB] int8, gain [R] int16, bt [R] int8,
    cb [R,NB] int8. Returns the concatenated record bytes, or None if the
    native library is unavailable.
    """
    lib = _lib()
    if lib is None:
        return None
    from .. import config as C
    from .. import tables as T

    ca = T.code_arrays()
    lay = T.unified_layout(fs)
    nb = int(lay["nb"])
    r = q.shape[0]
    rec_cap = 8192
    out = np.zeros(r * rec_cap, np.uint8)
    sizes = np.zeros(r, np.int64)
    args = []
    for book in ("small", "mid", "esc", "sf"):
        args.append(_ptr(np.ascontiguousarray(ca[f"codes_{book}"], np.uint32),
                         ctypes.c_uint32))
        args.append(_ptr(np.ascontiguousarray(ca[f"len_{book}"], np.int32),
                         ctypes.c_int32))
    edges = np.ascontiguousarray(lay["edges"], np.int32)
    width = np.ascontiguousarray(lay["width"], np.int32)
    rc = lib.mrc_pack_records(
        _ptr(np.ascontiguousarray(q, np.int16), ctypes.c_int16),
        _ptr(np.ascontiguousarray(amp, np.int8), ctypes.c_int8),
        _ptr(np.ascontiguousarray(gain, np.int16), ctypes.c_int16),
        _ptr(np.ascontiguousarray(bt, np.int8), ctypes.c_int8),
        _ptr(np.ascontiguousarray(cb, np.int8), ctypes.c_int8),
        ctypes.c_int64(r), *args,
        _ptr(edges, ctypes.c_int32), _ptr(width, ctypes.c_int32),
        ctypes.c_int32(nb), ctypes.c_int32(C.LONG_COEFFS),
        ctypes.c_int32(n_threads), ctypes.c_int64(rec_cap),
        _ptr(out, ctypes.c_uint8), _ptr(sizes, ctypes.c_int64))
    if rc != 0:
        raise RuntimeError(f"native record pack failed ({rc})")
    # concatenate the per-record byte runs
    reps = sizes
    idx = np.repeat(np.arange(r) * rec_cap, reps) + _ranges(reps)
    return out[idx].tobytes()


def _ranges(counts: np.ndarray) -> np.ndarray:
    """[c0, c1, ...] -> [0..c0), [0..c1), ... concatenated."""
    total = int(counts.sum())
    ends = np.cumsum(counts)
    out = np.arange(total)
    out -= np.repeat(ends - counts, counts)
    return out


def pack_codes_native(codes: np.ndarray, lengths: np.ndarray) -> bytes | None:
    """Native MSB-first packer; returns None if unavailable."""
    lib = _lib()
    if lib is None:
        return None
    codes = np.ascontiguousarray(codes, np.uint64)
    lengths = np.ascontiguousarray(lengths, np.int64)
    total = int(lengths.sum())
    out = np.zeros((total + 7) // 8, np.uint8)
    wrote = lib.mrc_pack_codes(_ptr(codes, ctypes.c_uint64),
                               _ptr(lengths, ctypes.c_int64),
                               ctypes.c_int64(len(codes)),
                               _ptr(out, ctypes.c_uint8))
    if wrote != total:
        raise RuntimeError(f"native pack wrote {wrote} of {total} bits")
    return out.tobytes()
