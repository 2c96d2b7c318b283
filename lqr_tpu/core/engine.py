"""The arrayified carver engine: seam step, map extension, materialization.

This is the TPU-native replacement for liblqr's carving core (the hot loop of
``lqr_carver_resize``, SURVEY.md §3.1). Everything here is functional and
jittable with static shapes:

- one seam step = energy map -> row DP -> backtrack -> visibility-map record
  -> compaction, all on fixed [H, Wb] buffers with a traced current width;
- compaction is a roll+select (no gather): removing column s of a row is
  ``where(lane >= s, shift_left(row), row)`` — pure VPU work;
- seam recording needs no column map: the compacted coordinate of a visible
  reference pixel is the row-wise exclusive cumsum of visibility (SPEC.md §6).

``extend_map(state, k)`` carves k further seams (dynamic trip count — one
compile per shape bucket); ``materialize`` produces any width in
[ref_w - depth, ref_w + depth] from (ref, vs) per SPEC.md §6.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .state import EngineConfig, MapState, INF
from .energy import energy_planar
from . import dp as dp_mod


def _lane(H: int, Wb: int):
    return jnp.broadcast_to(jnp.arange(Wb, dtype=jnp.int32), (H, Wb))


def pref_is_left(s, freq: int):
    """Side preference of (1-based, traced) seam index s. SPEC.md §5."""
    if freq <= 0:
        return jnp.bool_(True)
    return (((s - 1) // freq) % 2) == 0


def seam_step(cfg: EngineConfig, st: MapState) -> MapState:
    """Carve one more seam into the map (depth += 1).

    Hot-loop design notes (all shapes static, widths traced):
    - energy + DP on planar channel arrays (no trailing channel dim);
    - seam recorded into vs via the column map: one [H]-gather + one
      broadcast-compare select — no scans, no scatters;
    - compaction is roll+select per array.
    """
    H, Wb = cfg.H, cfg.Wb
    lane = _lane(H, Wb)
    w = st.ref_w - st.depth          # current compacted width
    s = st.depth + 1                 # global seam index within this map
    pl = pref_is_left(s, cfg.side_switch_freq)

    e = energy_planar(st.cur, w, cfg.nrg)
    if cfg.has_bias:
        e = jnp.where(lane < w, e + st.cur_bias, INF)

    if cfg.use_pallas:
        from ..ops.dp_pallas import find_seam_pallas
        seam = find_seam_pallas(e, st.cur_rig, pl, cfg.delta_x, cfg.has_rig)
    else:
        seam = dp_mod.find_seam(e, st.cur_rig, pl, cfg.delta_x, cfg.has_rig)

    # record seam in reference coordinates through the column map
    orig = jnp.take_along_axis(st.colmap, seam[:, None], axis=1)
    vs = jnp.where(lane == orig, s.astype(jnp.int32), st.vs)

    # compact the current arrays: drop one lane per row at seam[y]
    ge = lane >= seam[:, None]
    keep_m = lane < (w - 1)

    def compact(a, zero):
        out = jnp.where(ge, jnp.roll(a, -1, axis=1), a)
        return jnp.where(keep_m, out, zero)

    cur = tuple(compact(ch, jnp.uint8(0)) for ch in st.cur)
    colmap = compact(st.colmap, jnp.int32(0))
    cur_bias = compact(st.cur_bias, jnp.float32(0)) if cfg.has_bias \
        else st.cur_bias
    cur_rig = compact(st.cur_rig, jnp.float32(0)) if cfg.has_rig \
        else st.cur_rig
    return st._replace(vs=vs, cur=cur, cur_bias=cur_bias, cur_rig=cur_rig,
                       colmap=colmap, depth=st.depth + 1)


@functools.partial(jax.jit, static_argnums=0)
def extend_map(cfg: EngineConfig, st: MapState, k) -> MapState:
    """Carve k further seams (k: traced int32; dynamic trip count)."""
    return jax.lax.fori_loop(0, k, lambda i, s: seam_step(cfg, s), st)


# ---------------------------------------------------------------------------
# materialization (SPEC.md §6)
# ---------------------------------------------------------------------------

def _avg_insert(a, b):
    """Value of a pixel inserted between a and b (SPEC.md §6)."""
    if a.dtype == jnp.uint8:
        return ((a.astype(jnp.uint16) + b.astype(jnp.uint16)) // 2) \
            .astype(jnp.uint8)
    return (a + b) * jnp.float32(0.5)


def materialize_array(arr, vs, ref_w, w, out_Wb: int):
    """Apply a visibility map to one reference-coordinate array.

    arr: [H, Wb] or [H, Wb, C]; vs: [H, Wb] i32; ref_w, w traced.
    Returns [H, out_Wb(,C)] with lanes >= w zeroed. Shrink and enlarge per
    SPEC.md §6; requires |w - ref_w| <= depth (caller's contract).
    """
    H, Wb = vs.shape
    lane = _lane(H, Wb)
    rows = jnp.broadcast_to(jnp.arange(H, dtype=jnp.int32)[:, None], (H, Wb))
    has_c = arr.ndim == 3
    out_shape = (H, out_Wb) + ((arr.shape[2],) if has_c else ())

    def expand(m):
        return m[:, :, None] if has_c else m

    def shrink(_):
        k = ref_w - w
        visible = ((vs == 0) | (vs > k)) & (lane < ref_w)
        pos = jnp.cumsum(visible.astype(jnp.int32), axis=1) - visible
        tgt = jnp.where(visible, pos, out_Wb)      # out-of-bounds -> dropped
        out = jnp.zeros(out_shape, arr.dtype)
        return out.at[rows, tgt].set(arr, mode='drop')

    def enlarge(_):
        k = w - ref_w
        valid = lane < ref_w
        dup = valid & (vs >= 1) & (vs <= k)
        pos = lane + jnp.cumsum(dup.astype(jnp.int32), axis=1) - dup
        nxt = jnp.roll(arr, -1, axis=1)
        nxt = jnp.where(expand(lane == ref_w - 1), arr, nxt)
        ins = _avg_insert(arr, nxt)
        out = jnp.zeros(out_shape, arr.dtype)
        out = out.at[rows, jnp.where(valid, pos, out_Wb)].set(arr,
                                                              mode='drop')
        return out.at[rows, jnp.where(dup, pos + 1, out_Wb)].set(ins,
                                                                 mode='drop')

    return jax.lax.cond(w <= ref_w, shrink, enlarge, None)


@functools.partial(jax.jit, static_argnums=(0, 3))
def materialize(cfg: EngineConfig, st: MapState, w, out_Wb: int):
    """Materialize the main image at width w -> u8 [H, out_Wb, C]."""
    return materialize_array(st.ref, st.vs, st.ref_w, w, out_Wb)


@functools.partial(jax.jit, static_argnums=(0, 3))
def materialize_all(cfg: EngineConfig, st: MapState, w, out_Wb: int):
    """Materialize main + bias + rig + all aux carvers at width w.

    Returns (img, bias, rig, aux_tuple) — the ingredients of a flatten
    (lqr_carver_flatten semantics, SPEC.md §6) and of aux write-back
    (write_aux_carver, /root/reference/src/render.c:902-916).
    """
    img = materialize_array(st.ref, st.vs, st.ref_w, w, out_Wb)
    bias = materialize_array(st.bias, st.vs, st.ref_w, w, out_Wb)
    rig = materialize_array(st.rig, st.vs, st.ref_w, w, out_Wb)
    aux = tuple(materialize_array(a, st.vs, st.ref_w, w, out_Wb)
                for a in st.aux)
    return img, bias, rig, aux
