"""Per-block local DP kernel for the column-sharded resize (VERDICT r4 #3).

The column-sharded forward DP (`parallel.sharding._dp_local_blocked`)
advances R rows per halo exchange; between exchanges each shard runs a
purely local DP on its halo-extended slab.  Rounds 2-4 ran that slab loop
as a pure-JAX ``fori_loop`` over rows — on real multi-chip TPU each shard
would carve at the slow-path rate, wasting the single-chip Pallas work.
This kernel is the per-shard hot path: ONE ``pallas_call`` per (block,
seam) runs the R sequential rows inside VMEM, with the same min-tree +
rank-ordered-equality update as ``dp_pallas._dpf_kernel`` — bit-identical
to ``core.dp.dp_forward`` restricted to the slab (reference hot loop:
/root/reference/src/render.c:318).  The layout mirrors the proven
``_dpf_kernel`` exactly: the extended width folds into [f, 128] and
backpointers are stored in CH-row chunks (a Mosaic-supported int8 store
shape; per-row [1, We] int8 stores are rejected on hardware).

Contract:
- ``m0``: [We] f32 initial frontier (the halo-extended frontier after the
  exchange; INF in lanes with no information).
- ``e_ext``: [R, We] f32 energy slab (halo-extended; INF out-of-image).
- ``rig_ext``: [R, We] f32 or None.
- ``first``: traced bool — this block contains global row 0 (whose DP row
  is the energy itself, no predecessor).
- Returns ``(m_out [We] f32, bp [R, We] int8)``.  Own-column lanes are
  bit-exact vs the unsharded DP (the halo cone argument in
  ``parallel/sharding.py``); halo lanes degrade but never reach them.

``We`` must be a multiple of 128 (the caller pads with INF energy; the
padding sits beyond the halo so the cone argument covers it too).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .dp_pallas import _rank_consts, _shift_folded, _interpret


def _dpb_kernel(sc_ref, m0_ref, e_ref, rig_ref, m_ref, bp_ref, *, R,
                delta_x, has_rig, H, f, L, CH):
    """grid=(1,): R sequential DP rows from an explicit initial frontier,
    folded layout [f, L], backpointers stored per CH-row chunk.

    sc_ref (SMEM [1, 2]): [pref_left, first_block]."""
    pref_left = sc_ref[0, 0] != 0
    first = sc_ref[0, 1] != 0
    inf = jnp.float32(jnp.inf)
    cands = _rank_consts(delta_x, H)

    def chunk_fn(k, M_prev):
        base = pl.multiple_of(k * CH, CH)
        e_chunk = e_ref[pl.ds(base, CH)]
        rig_chunk = rig_ref[pl.ds(base, CH)] if has_rig else None
        bps = []
        for j in range(CH):
            e_row = e_chunk[j]
            best = jnp.full((f, L), inf, jnp.float32)
            best_rank = jnp.full((f, L), 127, jnp.int32)
            bp = jnp.zeros((f, L), jnp.int32)
            for dx, rl, rr, rigc in cands:
                c = _shift_folded(M_prev, dx, inf, f, L)
                if has_rig and dx != 0:
                    c = c + rig_chunk[j] * rigc
                rank = jnp.where(pref_left, jnp.int32(rl), jnp.int32(rr))
                take = (c < best) | ((c == best) & (rank < best_rank))
                best = jnp.where(take, c, best)
                best_rank = jnp.where(take, rank, best_rank)
                bp = jnp.where(take, jnp.int32(dx), bp)
            m_row = e_row + best
            if j == 0:
                # global row 0 of the image has no predecessor row
                row0 = first & (k == 0)
                m_row = jnp.where(row0, e_row, m_row)
                bp = jnp.where(row0, jnp.int32(0), bp)
            bps.append(bp)
            M_prev = m_row
        bp_ref[pl.ds(base, CH)] = jnp.stack(bps).astype(jnp.int8)
        return M_prev

    M_final = jax.lax.fori_loop(0, R // CH, chunk_fn, m0_ref[:, :])
    m_ref[:, :] = M_final


@functools.partial(jax.jit, static_argnames=("delta_x", "has_rig", "R",
                                             "H"))
def dp_block_pallas(m0, e_ext, rig_ext, pref_left, first, delta_x: int,
                    has_rig: bool, R: int, H: int):
    """One halo-extended DP block on a shard's slab (see module doc)."""
    We = e_ext.shape[-1]
    assert We % 128 == 0, We
    f, L = We // 128, 128
    CH = 8 if R % 8 == 0 else R
    if rig_ext is None:
        assert not has_rig
        rig_ext = jnp.zeros((1, We), jnp.float32)
    sc = jnp.stack([jnp.asarray(pref_left, jnp.int32),
                    jnp.asarray(first, jnp.int32)]).reshape(1, 2)
    rig_spec = (pl.BlockSpec((R, f, L), lambda i: (0, 0, 0)) if has_rig
                else pl.BlockSpec((1, f, L), lambda i: (0, 0, 0)))
    m_out, bp = pl.pallas_call(
        functools.partial(_dpb_kernel, R=R, delta_x=delta_x,
                          has_rig=has_rig, H=H, f=f, L=L, CH=CH),
        grid=(1,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((f, L), lambda i: (0, 0)),
            pl.BlockSpec((R, f, L), lambda i: (0, 0, 0)),
            rig_spec,
        ],
        out_specs=(
            pl.BlockSpec((f, L), lambda i: (0, 0)),
            pl.BlockSpec((R, f, L), lambda i: (0, 0, 0)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((f, L), jnp.float32),
            jax.ShapeDtypeStruct((R, f, L), jnp.int8),
        ),
        interpret=_interpret(),
    )(sc, m0.reshape(f, L), e_ext.reshape(R, f, L), rig_ext.reshape(
        -1, f, L))
    return m_out.reshape(We), bp.reshape(R, We)
