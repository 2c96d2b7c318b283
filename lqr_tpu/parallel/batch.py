"""Batched carving — vmap over images and seam schedules.

The reference processes one image per process (SURVEY.md §2.3 "parallelism:
none"); this module is the TPU-native replacement for running N GIMP
processes: thousands of images carve together on one chip (benchmark config
#4: 4096x 1MP, 25% width reduction).

Ragged batches are padded to a common [H, Wb] with per-image widths; the
engine's traced-width masking makes seam outputs invariant to padding.
Per-image seam counts may differ: extension is masked per image.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from ..core.state import EngineConfig, MapState, round_up
from ..core import engine as eng


def init_state_batched(cfg: EngineConfig, pixels, widths,
                       bias=None, rig=None) -> MapState:
    """pixels: [B, H, Wb, C] u8 (padded; lanes >= widths[b] zero);
    widths: [B] int32. bias/rig: [B, H, Wb] f32 or None."""
    from ..core.energy import reader_plane

    B, H, Wb, C = pixels.shape
    assert (H, Wb, C) == (cfg.H, cfg.Wb, cfg.C)
    pixels = jnp.asarray(pixels, jnp.uint8)
    # absent planes stay None (pytree-empty) — a [B, H, Wb] zero field per
    # plane would dominate batch HBM at throughput batch sizes
    bias = jnp.asarray(bias, jnp.float32) if cfg.has_bias else None
    rig = jnp.asarray(rig, jnp.float32) if cfg.has_rig else None
    vs = jnp.zeros((B, H, Wb), jnp.int32)
    return MapState(ref=pixels, bias=bias, rig=rig, vs=vs, aux=(),
                    cur_b=reader_plane(pixels, cfg.nrg),
                    cur_bias=bias, cur_rig=rig,
                    ref_w=jnp.asarray(widths, jnp.int32),
                    depth=jnp.zeros((B,), jnp.int32))


@functools.partial(jax.jit, static_argnums=0)
def extend_map_batched(cfg: EngineConfig, st: MapState, k) -> MapState:
    """Carve k[b] further seams into each image's map.

    Same chunked hot path as the single-image ``extend_map`` (seam history
    committed to vs per chunk), with per-image seam counts masked inside
    the chunk loop."""
    k = jnp.asarray(k, jnp.int32)

    kmax = jnp.max(k)

    def cond(c):
        return c[-1] < kmax

    def body(c):
        cur_b, cur_bias, cur_rig, vs, depth, done = c
        kc = jnp.clip(k - done, 0, eng.KC)     # [B] seams this chunk
        cur_b, cur_bias, cur_rig, hist = jax.vmap(
            lambda cb, cbs, crg, rw, d, kk: eng._hot_chunk(
                cfg, cb, cbs, crg, rw, d, kk)
        )(cur_b, cur_bias, cur_rig, st.ref_w, depth, kc)
        vs = jax.vmap(eng._commit_hist)(vs, st.ref_w, depth, kc, hist)
        return (cur_b, cur_bias, cur_rig, vs, depth + kc,
                done + jnp.int32(eng.KC))

    cur_b, cur_bias, cur_rig, vs, depth, _ = jax.lax.while_loop(
        cond, body,
        (st.cur_b, st.cur_bias, st.cur_rig, st.vs, st.depth, jnp.int32(0)))
    return st._replace(vs=vs, cur_b=cur_b, cur_bias=cur_bias,
                       cur_rig=cur_rig, depth=depth)


@functools.partial(jax.jit, static_argnums=(0, 3))
def materialize_batched(cfg: EngineConfig, st: MapState, w, out_Wb: int):
    """Materialize each image at width w[b] -> [B, H, out_Wb, C]."""
    w = jnp.asarray(w, jnp.int32)
    return jax.vmap(
        lambda ref, vs, rw, wi: eng.materialize_array(ref, vs, rw, wi,
                                                      out_Wb)
    )(st.ref, st.vs, st.ref_w, w)


class BatchCarver:
    """Host API for batched width-carving of many images at once.

    This is the throughput path: one jitted program carves the whole batch.
    (Height carving: transpose inputs, as in the single Carver.)
    """

    def __init__(self, images, *, delta_x: int = 1, nrg: int = 0,
                 use_pallas: bool | None = None):
        """images: list of [h_i, w_i, C] u8 arrays (same C; h padded to
        max)."""
        assert len(images) > 0
        C = images[0].shape[2] if images[0].ndim == 3 else 1
        H = max(im.shape[0] for im in images)
        Wmax = max(im.shape[1] for im in images)
        Wb = max(128, round_up(Wmax, 128))
        B = len(images)
        buf = np.zeros((B, H, Wb, C), np.uint8)
        widths = np.zeros((B,), np.int32)
        heights = np.zeros((B,), np.int32)
        for i, im in enumerate(images):
            if im.ndim == 2:
                im = im[:, :, None]
            h, w = im.shape[:2]
            buf[i, :h, :w] = im
            widths[i] = w
            heights[i] = h
        # The batched path uses the scan DP: vmapping it makes every scan
        # step a [B, Wb] row-block — full VPU utilization without Pallas
        # (the Pallas kernels exist for the latency-bound single-image path).
        del use_pallas
        self.cfg = EngineConfig(H=H, Wb=Wb, C=C, delta_x=delta_x, nrg=nrg,
                                use_pallas=False)
        self.heights = heights
        self.widths = widths
        self.state = init_state_batched(self.cfg, buf, widths)

    def carve(self, n_seams):
        """Extend every map by n_seams (scalar or per-image array)."""
        n = np.broadcast_to(np.asarray(n_seams, np.int32),
                            self.widths.shape)
        self.state = extend_map_batched(self.cfg, self.state,
                                        jnp.asarray(n))
        return self

    def images_at(self, new_widths):
        """Materialize all images at the given widths (scalar or [B])."""
        w = np.broadcast_to(np.asarray(new_widths, np.int32),
                            self.widths.shape)
        out = materialize_batched(self.cfg, self.state, jnp.asarray(w),
                                  self.cfg.Wb)
        out = np.asarray(jax.device_get(out))
        return [out[i, :self.heights[i], :w[i]] for i in range(len(w))]
