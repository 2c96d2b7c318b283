"""Energy functions (SPEC.md §1-§2) as fused JAX element-wise pipelines.

Replaces liblqr's builtin energy functions
(``lqr_carver_set_energy_function_builtin``, call site
/root/reference/src/render.c:234; semantics /root/reference/help/en/index.wiki:85).

All ops are element-wise f32 with a pinned evaluation order so that results
are bit-identical to the NumPy oracle (lqr_tpu/oracle.py) and the C++
reference (native/lqr_ref.cpp).

Hot-loop key fact: every builtin energy is a gradient of a per-pixel
*reader* value (brightness or luma, SPEC.md §1), and a pixel's reader value
never changes as seams are carved — compaction only moves pixels. The
engine therefore precomputes the reader plane once (``reader_plane``) and
carves it along with the image; per seam only ``energy_from_plane`` runs
(gradients + mask), which is bit-identical to recomputing from u8 pixels.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..config import EnergyFunc
from .state import INF

LUMA_W = (0.2126, 0.7152, 0.0722)

_LUMA_FAMILY = (EnergyFunc.LUMA_GRAD_XABS, EnergyFunc.LUMA_GRAD_SUMABS,
                EnergyFunc.LUMA_GRAD_NORM)


def reader(img: jnp.ndarray, use_luma: bool) -> jnp.ndarray:
    """Brightness/luma reader on a [..., H, Wb, C] u8 image -> [..., H, Wb]
    f32.

    Invalid lanes (>= current width) must be zero in ``img``; the reader maps
    them to 0 which downstream masking overrides anyway.
    """
    C = img.shape[-1]
    has_alpha = C in (2, 4)
    nc = C - (1 if has_alpha else 0)
    f = img.astype(jnp.float32)
    if use_luma and nc >= 3:
        s = jnp.float32(LUMA_W[0]) * f[..., 0]
        s = s + jnp.float32(LUMA_W[1]) * f[..., 1]
        s = s + jnp.float32(LUMA_W[2]) * f[..., 2]
        s = s * jnp.float32(1.0 / 255)
    else:
        s = f[..., 0]
        for k in range(1, nc):
            s = s + f[..., k]
        s = s * jnp.float32(1.0 / (255 * nc))
    if has_alpha:
        s = s * (f[..., -1] * jnp.float32(1.0 / 255))
    return s


def reader_plane(img: jnp.ndarray, nrg: int) -> jnp.ndarray:
    """The precomputed hot-state reader plane for energy function ``nrg``.

    img: [..., H, Wb, C] u8 (invalid lanes zeroed) -> f32 [..., H, Wb].
    NULL energy needs no reader; returns zeros.
    """
    nrg = EnergyFunc(nrg)
    if nrg == EnergyFunc.NULL:
        return jnp.zeros(img.shape[:-1], jnp.float32)
    return reader(img, nrg in _LUMA_FAMILY)


def gradients(b: jnp.ndarray, w, h=None) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Edge-replicated central differences on the first w lanes (SPEC.md §2).

    b: [H, Wb] f32 (lanes >= w are garbage/zero); w: traced current width.
    Lanes >= w of the result are garbage — callers mask them to +inf.

    h (traced, optional): the image's true height when the plane is padded
    to a taller buffer (ragged batching). The bottom-edge replication then
    happens at row h-1, bit-identical to an unpadded [h, Wb] plane; rows
    >= h are garbage — the DP treats them as pass-through rows.
    """
    H, Wb = b.shape
    lane = jnp.arange(Wb, dtype=jnp.int32)[None, :]
    br = jnp.roll(b, -1, axis=1)
    br = jnp.where(lane >= w - 1, b, br)      # replicate right edge at w-1
    bl = jnp.roll(b, 1, axis=1)
    bl = jnp.where(lane == 0, b, bl)          # replicate left edge
    gx = (br - bl) * jnp.float32(0.5)
    bd = jnp.concatenate([b[1:], b[-1:]], axis=0)   # row below (replicated)
    bu = jnp.concatenate([b[:1], b[:-1]], axis=0)   # row above (replicated)
    if h is not None:
        row = jnp.arange(H, dtype=jnp.int32)[:, None]
        bd = jnp.where(row >= h - 1, b, bd)   # replicate at the TRUE bottom
    gy = (bd - bu) * jnp.float32(0.5)
    return gx, gy


def energy_from_plane(b: jnp.ndarray, w, nrg: int, h=None) -> jnp.ndarray:
    """Energy map from a precomputed reader plane. Lanes >= w get +inf.

    Bit-identical to ``energy`` on the interleaved image: the reader value
    of a pixel is independent of carving, so gradient inputs are the same
    f32 values in the same op order. ``h``: true image height for padded
    (ragged-batch) planes — see ``gradients``.
    """
    H, Wb = b.shape
    lane = jnp.arange(Wb, dtype=jnp.int32)[None, :]
    nrg = EnergyFunc(nrg)
    if nrg == EnergyFunc.NULL:
        e = jnp.zeros((H, Wb), jnp.float32)
    else:
        gx, gy = gradients(b, w, h)
        if nrg in (EnergyFunc.GRAD_XABS, EnergyFunc.LUMA_GRAD_XABS):
            e = jnp.abs(gx)
        elif nrg in (EnergyFunc.GRAD_SUMABS, EnergyFunc.LUMA_GRAD_SUMABS):
            e = (jnp.abs(gx) + jnp.abs(gy)) * jnp.float32(0.5)
        else:
            e = jnp.sqrt(gx * gx + gy * gy)
    return jnp.where(lane < w, e, INF)


def energy(img: jnp.ndarray, w, nrg: int) -> jnp.ndarray:
    """Energy map of the compacted current image. Lanes >= w get +inf.

    img: [H, Wb, C] u8 (invalid lanes zeroed); w: traced width.
    """
    return energy_from_plane(reader_plane(img, nrg), w, nrg)
