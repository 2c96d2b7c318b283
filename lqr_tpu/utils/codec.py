"""ctypes bridge to the native C++ image codec (native/imagecodec.cpp).

The host data-path layer replacing the reference's GIMP pixel plumbing
(/root/reference/src/io_functions.c): PNG/PNM encode+decode and buffer
marshalling (interleave/deinterleave, offset mask placement), all in C++.
Falls back gracefully (callers catch NativeCodecError and use PIL).
"""

from __future__ import annotations

import ctypes
import pathlib
import subprocess

import numpy as np

_ROOT = pathlib.Path(__file__).resolve().parent.parent.parent
_SRC = _ROOT / "native" / "imagecodec.cpp"
_BUILD = _ROOT / "native" / "build"
_SO = _BUILD / "libimagecodec.so"

_lib = None


class NativeCodecError(Exception):
    """Unsupported or corrupt input for the native codec."""


def _load():
    global _lib
    if _lib is not None:
        return _lib
    _BUILD.mkdir(parents=True, exist_ok=True)
    if not _SO.exists() or _SO.stat().st_mtime < _SRC.stat().st_mtime:
        proc = subprocess.run(
            ["g++", "-O2", "-shared", "-fPIC", "-pthread", "-o", str(_SO),
             str(_SRC), "-lz"],
            capture_output=True, text=True)
        if proc.returncode != 0:
            raise NativeCodecError(
                f"g++ failed building the native codec "
                f"({_SRC.name}):\n{proc.stderr}")
    lib = ctypes.CDLL(str(_SO))
    u8p = ctypes.POINTER(ctypes.c_uint8)
    f32p = ctypes.POINTER(ctypes.c_float)
    ip = ctypes.POINTER(ctypes.c_int)
    lp = ctypes.POINTER(ctypes.c_long)
    for name in ("lqr_png_info", "lqr_pnm_info"):
        fn = getattr(lib, name)
        fn.restype = ctypes.c_int
        fn.argtypes = [u8p, ctypes.c_long, ip, ip, ip]
    for name in ("lqr_png_decode", "lqr_pnm_decode"):
        fn = getattr(lib, name)
        fn.restype = ctypes.c_int
        fn.argtypes = [u8p, ctypes.c_long, u8p]
    for name in ("lqr_png_encode", "lqr_pnm_encode"):
        fn = getattr(lib, name)
        fn.restype = ctypes.c_int
        fn.argtypes = [u8p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
                       u8p, ctypes.c_long, lp]
    lib.lqr_deinterleave.restype = None
    lib.lqr_deinterleave.argtypes = [u8p, ctypes.c_int, ctypes.c_int,
                                     ctypes.c_int, u8p]
    lib.lqr_interleave.restype = None
    lib.lqr_interleave.argtypes = [u8p, ctypes.c_int, ctypes.c_int,
                                   ctypes.c_int, u8p]
    lib.lqr_place_mask.restype = None
    lib.lqr_place_mask.argtypes = [u8p, ctypes.c_int, ctypes.c_int,
                                   ctypes.c_int, ctypes.c_int, ctypes.c_int,
                                   ctypes.c_float, f32p, ctypes.c_int,
                                   ctypes.c_int]
    lib.lqr_stage_wave.restype = None
    lib.lqr_stage_wave.argtypes = [u8p, ctypes.c_int, ctypes.c_int,
                                   ctypes.c_int, ip, ip, ctypes.c_int,
                                   u8p, ctypes.c_int, ctypes.c_int]
    _lib = lib
    return lib


def _u8p(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


def decode(data: bytes) -> np.ndarray:
    """Decode PNG or binary PNM bytes -> uint8 [h, w, c]."""
    lib = _load()
    buf = np.frombuffer(data, np.uint8)
    h, w, c = ctypes.c_int(), ctypes.c_int(), ctypes.c_int()
    for info, dec in ((lib.lqr_png_info, lib.lqr_png_decode),
                      (lib.lqr_pnm_info, lib.lqr_pnm_decode)):
        rc = info(_u8p(buf), len(data), ctypes.byref(h), ctypes.byref(w),
                  ctypes.byref(c))
        if rc == 0:
            out = np.empty((h.value, w.value, c.value), np.uint8)
            rc = dec(_u8p(buf), len(data), _u8p(out))
            if rc != 0:
                raise NativeCodecError(f"decode failed rc={rc}")
            return out
        if rc == 2:
            raise NativeCodecError("unsupported image variant")
    raise NativeCodecError("not a PNG/PNM")


def encode(img: np.ndarray, fmt: str = "png") -> bytes:
    """Encode uint8 [h, w(,c)] -> PNG or binary PNM bytes."""
    lib = _load()
    img = np.ascontiguousarray(img, np.uint8)
    if img.ndim == 2:
        img = img[:, :, None]
    h, w, c = img.shape
    cap = h * w * c + (1 << 16) + (h * w * c) // 2
    out = np.empty(cap, np.uint8)
    n = ctypes.c_long()
    fn = lib.lqr_png_encode if fmt == "png" else lib.lqr_pnm_encode
    rc = fn(_u8p(img), h, w, c, _u8p(out), cap, ctypes.byref(n))
    if rc != 0:
        raise NativeCodecError(f"encode failed rc={rc}")
    return out[:n.value].tobytes()


def deinterleave(img: np.ndarray) -> np.ndarray:
    """uint8 [h, w, c] -> [c, h, w] (device planar layout)."""
    lib = _load()
    img = np.ascontiguousarray(img, np.uint8)
    h, w, c = img.shape
    out = np.empty((c, h, w), np.uint8)
    lib.lqr_deinterleave(_u8p(img), h, w, c, _u8p(out))
    return out


def interleave(planes: np.ndarray) -> np.ndarray:
    """uint8 [c, h, w] -> [h, w, c]."""
    lib = _load()
    planes = np.ascontiguousarray(planes, np.uint8)
    c, h, w = planes.shape
    out = np.empty((h, w, c), np.uint8)
    lib.lqr_interleave(_u8p(planes), h, w, c, _u8p(out))
    return out


def stage_wave(base: np.ndarray, dys, dxs, out_h: int, out_w: int,
               out: np.ndarray | None = None) -> np.ndarray:
    """Synthesize a wave of cyclically rolled copies of ``base`` directly
    into a zero-padded [n, out_h, out_w, c] u8 batch buffer (the cfg4/cfg5
    staging path — one host touch per byte, two C++ threads)."""
    lib = _load()
    base = np.ascontiguousarray(base, np.uint8)
    if base.ndim == 2:
        base = base[:, :, None]
    h, w, c = base.shape
    dys = np.ascontiguousarray(dys, np.int32)
    dxs = np.ascontiguousarray(dxs, np.int32)
    n = len(dys)
    assert len(dxs) == n and out_h >= h and out_w >= w
    if out is None:
        out = np.empty((n, out_h, out_w, c), np.uint8)
    else:
        assert out.shape == (n, out_h, out_w, c) and out.dtype == np.uint8
    ip = ctypes.POINTER(ctypes.c_int)
    lib.lqr_stage_wave(_u8p(base), h, w, c,
                       dys.ctypes.data_as(ip), dxs.ctypes.data_as(ip), n,
                       _u8p(out), out_h, out_w)
    return out


def place_mask(mask: np.ndarray, H: int, W: int, x_off: int = 0,
               y_off: int = 0, factor: float = 1.0,
               out: np.ndarray | None = None) -> np.ndarray:
    """Accumulate a mask strength field at an offset (SPEC.md §3 law)."""
    lib = _load()
    mask = np.ascontiguousarray(mask, np.uint8)
    if mask.ndim == 2:
        mask = mask[:, :, None]
    mh, mw, mc = mask.shape
    if out is None:
        out = np.zeros((H, W), np.float32)
    else:
        assert out.shape == (H, W) and out.dtype == np.float32
    lib.lqr_place_mask(_u8p(mask), mh, mw, mc, x_off, y_off,
                       ctypes.c_float(factor),
                       out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                       H, W)
    return out
