"""Pallas TPU kernels for the seam DP hot path (SPEC.md §5).

Two kernels replace liblqr's per-seam inner loop (the hot loop of
``lqr_carver_resize``, SURVEY.md §3.1):

1. ``dp_forward``: the row recursion
   ``M[y,x] = E[y,x] + min_dx(M[y-1,x+dx] + rig·|dx|^1.5/H)`` as a
   sequential row-block grid with the frontier row resident in VMEM —
   columns fully vectorized on the VPU, energy blocks streamed HBM->VMEM by
   the pipeline. Emits the full cost map M.

2. ``backtrack``: walks the seam bottom-up by re-evaluating the transition
   argmin from M directly (bit-identical to following recorded
   backpointers, since the same f32 adds are compared with the same
   tie-ranks). Row blocks are streamed in *reverse* grid order; the chase
   position (and the boundary rigidity scalar) carry across blocks in SMEM.

Both kernels receive the side preference as a prefetched scalar so one
compiled kernel serves both tie-break orders (side-switch law,
/root/reference/src/render.c:237).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
import os


def _interpret() -> bool:
    """Interpreter mode for CPU testing (LQR_PALLAS_INTERPRET=1)."""
    return os.environ.get("LQR_PALLAS_INTERPRET", "0") == "1"


def _row_block(H: int) -> int:
    """Rows per grid step. Mosaic requires the sublane block dim to be a
    multiple of 8 or equal to the full array dim, so: 8 when H % 8 == 0,
    else the whole height in one block (callers guard VMEM for that case)."""
    return 8 if H % 8 == 0 else H


def _rank_consts(delta_x: int, H: int):
    """(dx, rank_left, rank_right, rigc) per candidate; rigc is
    f32(|dx|^1.5 / H) rounded exactly once (SPEC.md §4)."""
    out = [(0, 0, 0, np.float32(0))]
    r = 1
    for m in range(1, delta_x + 1):
        rigc = np.float32((m ** 1.5) / H)
        out.append((-m, r, r + 1, rigc))
        out.append((m, r + 1, r, rigc))
        r += 2
    return out


def _shift(arr, dx: int, inf):
    """shifted[x] = arr[x + dx] with +inf out-of-range. arr: [1, Wb]."""
    if dx == 0:
        return arr
    Wb = arr.shape[-1]
    lane = jax.lax.broadcasted_iota(jnp.int32, arr.shape, 1)
    s = pltpu.roll(arr, (-dx) % Wb, axis=1)   # pltpu.roll needs shift >= 0
    if dx > 0:
        return jnp.where(lane >= Wb - dx, inf, s)
    return jnp.where(lane < -dx, inf, s)


def _dp_kernel(pl_ref, e_ref, rig_ref, m_ref, frontier, *, BR, delta_x,
               has_rig, H):
    i = pl.program_id(0)
    pref_left = pl_ref[0] != 0
    inf = jnp.float32(jnp.inf)
    cands = _rank_consts(delta_x, H)

    for r in range(BR):
        e_row = e_ref[r:r + 1, :]
        is_first = (i == 0) & (r == 0) if r == 0 else False

        prev = frontier[0:1, :]
        best = jnp.full(prev.shape, inf, jnp.float32)
        best_rank = jnp.full(prev.shape, 127, jnp.int32)
        if has_rig:
            rig_row = rig_ref[r:r + 1, :]
        for dx, rl, rr, rigc in cands:
            c = _shift(prev, dx, inf)
            if has_rig and dx != 0:
                c = c + rig_row * rigc
            rank = jnp.where(pref_left, jnp.int32(rl), jnp.int32(rr))
            take = (c < best) | ((c == best) & (rank < best_rank))
            best = jnp.where(take, c, best)
            best_rank = jnp.where(take, rank, best_rank)
        m_row = e_row + best

        if r == 0:
            # row 0 of the whole map has no predecessor row
            m_row = jnp.where(is_first, e_row, m_row)
        m_ref[r:r + 1, :] = m_row
        frontier[0:1, :] = m_row


@functools.partial(jax.jit, static_argnames=("delta_x", "has_rig"))
def dp_forward_pallas(e_tot, rig, pref_left, delta_x: int, has_rig: bool):
    """e_tot: [H, Wb] f32 (+inf at invalid lanes); returns M [H, Wb] f32."""
    H, Wb = e_tot.shape
    BR = _row_block(H)
    grid = (H // BR,)
    pl_arr = jnp.asarray(pref_left, jnp.int32).reshape(1)
    kernel = functools.partial(_dp_kernel, BR=BR, delta_x=delta_x,
                               has_rig=has_rig, H=H)
    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((BR, Wb), lambda i, *_: (i, 0)),
                pl.BlockSpec((BR, Wb), lambda i, *_: (i, 0)),
            ],
            out_specs=pl.BlockSpec((BR, Wb), lambda i, *_: (i, 0)),
            scratch_shapes=[pltpu.VMEM((1, Wb), jnp.float32)],
        ),
        out_shape=jax.ShapeDtypeStruct((H, Wb), jnp.float32),
        interpret=_interpret(),
    )(pl_arr, e_tot, rig)


def _window_argmin(m_row, x, srig, pref_left, delta_x, has_rig, H, Wb):
    """Vectorized argmin over the dx window at scalar position x.

    m_row: [1, Wb]; x: i32 scalar; srig: f32 scalar rigidity at the target
    pixel. Returns new x (i32 scalar). Tie law = SPEC.md §5.
    """
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, Wb), 1)
    d = lane - x
    ad = jnp.abs(d)
    inwin = ad <= delta_x
    cost = m_row
    if has_rig:
        # per-|dx| rigidity constants, each rounded to f32 exactly once
        rig_add = jnp.zeros_like(m_row)
        for m in range(delta_x, 0, -1):
            rigc = np.float32((m ** 1.5) / H)
            rig_add = jnp.where(ad == m, srig * rigc, rig_add)
        cost = cost + rig_add
    # rank: 0 at dx=0; else 2|dx|-1 for the preferred side, 2|dx| otherwise.
    # (int arithmetic instead of bool-vector selects — Mosaic cannot
    # legalize arith.select on i1 vectors)
    pl_i = pref_left.astype(jnp.int32)
    pref_neg = (pl_i * (d < 0).astype(jnp.int32)
                + (1 - pl_i) * (d > 0).astype(jnp.int32))
    rank = jnp.where(d == 0, 0, 2 * ad - pref_neg)
    big = jnp.float32(jnp.inf)
    mmin = jnp.min(jnp.where(inwin, cost, big))
    cand = inwin & (cost == mmin)
    rmin = jnp.min(jnp.where(cand, rank, 1 << 20))
    xn = jnp.min(jnp.where(cand & (rank == rmin), lane, Wb))
    return xn.astype(jnp.int32)


def _bt_kernel(pl_ref, m_ref, rig_ref, seam_ref, carry_x, carry_rig, *,
               BR, delta_x, has_rig, H, Wb):
    i = pl.program_id(0)
    n = pl.num_programs(0)
    pref_left = pl_ref[0] != 0

    # start: global argmin of the last row (only at the first grid step)
    @pl.when(i == 0)
    def _():
        m_row = m_ref[BR - 1:BR, :]
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, Wb), 1)
        mmin = jnp.min(m_row)
        eq = m_row == mmin
        left_x = jnp.min(jnp.where(eq, lane, Wb))
        right_x = jnp.max(jnp.where(eq, lane, -1))
        carry_x[0] = jnp.where(pref_left, left_x, right_x).astype(jnp.int32)
        carry_rig[0] = jnp.float32(0)

    x = carry_x[0]
    # Rows of this block, walked bottom-up. At i == 0 the start position is
    # the global argmin just computed; at i > 0 we first hop from the row
    # below (previous block's bottom row in walk order) into this block's
    # last row, using the carried boundary rigidity scalar.
    for idx, r in enumerate(range(BR - 1, -1, -1)):
        if idx == 0:
            bx = _window_argmin(m_ref[BR - 1:BR, :], x, carry_rig[0],
                                pref_left, delta_x, has_rig, H, Wb)
            x = jnp.where(i > 0, bx, x)
        seam_ref[r, 0] = x

        def _rig_at(row_idx, xx):
            # dynamic scalar VMEM loads are not legalizable; extract the
            # rigidity scalar with a masked reduction instead
            if not has_rig:
                return jnp.float32(0)
            lane = jax.lax.broadcasted_iota(jnp.int32, (1, Wb), 1)
            return jnp.sum(jnp.where(lane == xx,
                                     rig_ref[row_idx:row_idx + 1, :], 0.0))

        if r > 0:
            x = _window_argmin(m_ref[r - 1:r, :], x, _rig_at(r, x),
                               pref_left, delta_x, has_rig, H, Wb)
    # save carry for the next (upper) block
    carry_x[0] = x
    carry_rig[0] = _rig_at(0, x)


@functools.partial(jax.jit, static_argnames=("delta_x", "has_rig"))
def backtrack_pallas(M, rig, pref_left, delta_x: int, has_rig: bool):
    """Seam from the DP cost map. M: [H, Wb] f32. Returns [H] i32."""
    H, Wb = M.shape
    BR = _row_block(H)
    n = H // BR
    pl_arr = jnp.asarray(pref_left, jnp.int32).reshape(1)
    kernel = functools.partial(_bt_kernel, BR=BR, delta_x=delta_x,
                               has_rig=has_rig, H=H, Wb=Wb)
    rev = lambda i, *_: (n - 1 - i, 0)  # noqa: E731 — reversed block order
    seam = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(n,),
            in_specs=[
                pl.BlockSpec((BR, Wb), rev),
                pl.BlockSpec((BR, Wb), rev),
            ],
            out_specs=pl.BlockSpec((BR, 1), rev, memory_space=pltpu.SMEM),
            scratch_shapes=[pltpu.SMEM((1,), jnp.int32),
                            pltpu.SMEM((1,), jnp.float32)],
        ),
        out_shape=jax.ShapeDtypeStruct((H, 1), jnp.int32),
        interpret=_interpret(),
    )(pl_arr, M, rig)
    return seam[:, 0]


def find_seam_pallas(e_tot, rig, pref_left, delta_x: int, has_rig: bool):
    """Drop-in replacement for core.dp.find_seam on TPU."""
    M = dp_forward_pallas(e_tot, rig, pref_left, delta_x, has_rig)
    return backtrack_pallas(M, rig, pref_left, delta_x, has_rig)
