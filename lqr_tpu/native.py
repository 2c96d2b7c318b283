"""ctypes bridge to the native C++ reference carver (native/lqr_ref.cpp).

Builds the shared library on demand with g++ (no FMA, no fast-math — the
bit-exactness contract of SPEC.md). Exposes:

- carve(img, n)          -> visibility map (int32 [H, W])
- materialize(img, vs, w)-> uint8 [H, w, C]
- bench(img, n)          -> seconds for n seams, single core (the CPU
                            baseline for bench.py's vs_baseline)
"""

from __future__ import annotations

import ctypes
import pathlib
import subprocess

import numpy as np

_ROOT = pathlib.Path(__file__).resolve().parent.parent
_SRC = _ROOT / "native" / "lqr_ref.cpp"
_BUILD = _ROOT / "native" / "build"
_SO = _BUILD / "liblqr_ref.so"

_lib = None


def _load():
    global _lib
    if _lib is not None:
        return _lib
    _BUILD.mkdir(parents=True, exist_ok=True)
    if (not _SO.exists()
            or _SO.stat().st_mtime < _SRC.stat().st_mtime):
        proc = subprocess.run(
            ["g++", "-O2", "-shared", "-fPIC", "-o", str(_SO), str(_SRC)],
            capture_output=True, text=True)
        if proc.returncode != 0:
            from .errors import LqrError
            from .i18n import _
            raise LqrError(
                _("g++ failed building the native reference carver "
                  "({src}):\n{err}").format(src=_SRC.name,
                                            err=proc.stderr))
    lib = ctypes.CDLL(str(_SO))
    u8p = ctypes.POINTER(ctypes.c_uint8)
    f32p = ctypes.POINTER(ctypes.c_float)
    i32p = ctypes.POINTER(ctypes.c_int)
    lib.lqr_ref_carve.restype = ctypes.c_int
    lib.lqr_ref_carve.argtypes = [u8p, ctypes.c_int, ctypes.c_int,
                                  ctypes.c_int, f32p, f32p, ctypes.c_int,
                                  ctypes.c_int, ctypes.c_int, ctypes.c_int,
                                  i32p]
    lib.lqr_ref_materialize.restype = ctypes.c_int
    lib.lqr_ref_materialize.argtypes = [u8p, i32p, ctypes.c_int, ctypes.c_int,
                                        ctypes.c_int, ctypes.c_int, u8p]
    lib.lqr_ref_bench.restype = ctypes.c_double
    lib.lqr_ref_bench.argtypes = [u8p, ctypes.c_int, ctypes.c_int,
                                  ctypes.c_int, ctypes.c_int, ctypes.c_int,
                                  ctypes.c_int, ctypes.c_int]
    _lib = lib
    return lib


def _img3(img):
    img = np.ascontiguousarray(img, np.uint8)
    if img.ndim == 2:
        img = img[:, :, None]
    return img


def carve(img, n_seams: int, *, bias=None, rig=None, delta_x: int = 1,
          nrg: int = 0, ssf: int = 2) -> np.ndarray:
    lib = _load()
    img = _img3(img)
    h, w, c = img.shape
    vs = np.zeros((h, w), np.int32)
    bp = rp = None
    f32p = ctypes.POINTER(ctypes.c_float)
    if bias is not None:
        bias = np.ascontiguousarray(bias, np.float32)
        bp = bias.ctypes.data_as(f32p)
    if rig is not None:
        rig = np.ascontiguousarray(rig, np.float32)
        rp = rig.ctypes.data_as(f32p)
    rc = lib.lqr_ref_carve(
        img.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), h, w, c,
        bp, rp, delta_x, nrg, ssf, n_seams,
        vs.ctypes.data_as(ctypes.POINTER(ctypes.c_int)))
    assert rc == 0, rc
    return vs


def materialize(img, vs, w: int) -> np.ndarray:
    lib = _load()
    img = _img3(img)
    h, w0, c = img.shape
    vs = np.ascontiguousarray(vs, np.int32)
    out = np.zeros((h, w, c), np.uint8)
    rc = lib.lqr_ref_materialize(
        img.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        vs.ctypes.data_as(ctypes.POINTER(ctypes.c_int)), h, w0, c, w,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
    assert rc == 0, rc
    return out


def bench(img, n_seams: int, *, delta_x: int = 1, nrg: int = 0,
          ssf: int = 2) -> float:
    """Seconds for n_seams on a single core (the liblqr-role baseline)."""
    lib = _load()
    img = _img3(img)
    h, w, c = img.shape
    return float(lib.lqr_ref_bench(
        img.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), h, w, c,
        delta_x, nrg, ssf, n_seams))
