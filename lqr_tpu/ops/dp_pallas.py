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

Both kernels receive the side preference as a plain SMEM scalar input so one
compiled kernel serves both tie-break orders (side-switch law,
/root/reference/src/render.c:237). Deliberately NOT a
PrefetchScalarGridSpec scalar: scalar-prefetch mode serializes the block DMA
pipeline on this backend (~1 ms/call extra, measured).
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
    """Rows per grid step. Large blocks amortize the per-grid-step cost
    (~3-5us each — it dominates at BR=8); Mosaic requires the sublane block
    dim to be a multiple of 8 or equal to the full array dim."""
    for b in (256, 128, 64, 32, 16, 8):
        if H % b == 0:
            return b
    return H


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


def _dp_kernel(pl_ref, e_ref, rig_ref, m_ref, bp_ref, frontier, *, BR,
               delta_x, has_rig, H):
    i = pl.program_id(0)
    n = pl.num_programs(0)
    pref_left = pl_ref[0, 0] != 0
    inf = jnp.float32(jnp.inf)
    cands = _rank_consts(delta_x, H)

    # row 0 of the whole map has no predecessor row
    @pl.when(i == 0)
    def _():
        frontier[0:1, :] = e_ref[0:1, :]
        bp_ref[0:1, :] = jnp.zeros_like(bp_ref[0:1, :])

    start = jnp.where(i == 0, 1, 0)

    def row_fn(r, M_prev):
        e_row = e_ref[pl.ds(r, 1), :]
        best = jnp.full(M_prev.shape, inf, jnp.float32)
        best_rank = jnp.full(M_prev.shape, 127, jnp.int32)
        bp = jnp.zeros(M_prev.shape, jnp.int32)
        if has_rig:
            rig_row = rig_ref[pl.ds(r, 1), :]
        for dx, rl, rr, rigc in cands:
            c = _shift(M_prev, dx, inf)
            if has_rig and dx != 0:
                c = c + rig_row * rigc
            rank = jnp.where(pref_left, jnp.int32(rl), jnp.int32(rr))
            take = (c < best) | ((c == best) & (rank < best_rank))
            best = jnp.where(take, c, best)
            best_rank = jnp.where(take, rank, best_rank)
            bp = jnp.where(take, jnp.int32(dx), bp)
        m_row = e_row + best
        bp_ref[pl.ds(r, 1), :] = bp
        return m_row

    M_final = jax.lax.fori_loop(start, BR, row_fn, frontier[0:1, :])
    frontier[0:1, :] = M_final
    # publish the final frontier once, at the last grid step
    @pl.when(i == n - 1)
    def _():
        m_ref[0:1, :] = M_final


@functools.partial(jax.jit, static_argnames=("delta_x", "has_rig"))
def dp_forward_pallas(e_tot, rig, pref_left, delta_x: int, has_rig: bool):
    """Forward DP. e_tot: [H, Wb] f32 (+inf at invalid lanes, bias folded
    in). Returns (M_last [Wb] f32, bp [H, Wb] i32 backpointers)."""
    H, Wb = e_tot.shape
    if rig is None:                # absent rigidity plane (state stores None)
        assert not has_rig
        rig = jnp.zeros((1, Wb), jnp.float32)
    BR = _row_block(H)
    grid = (H // BR,)
    pl_arr = jnp.asarray(pref_left, jnp.int32).reshape(1, 1)
    kernel = functools.partial(_dp_kernel, BR=BR, delta_x=delta_x,
                               has_rig=has_rig, H=H)
    rig_spec = (pl.BlockSpec((BR, Wb), lambda i: (i, 0)) if has_rig
                else pl.BlockSpec((1, Wb), lambda i: (0, 0)))
    # NOTE: the side-preference scalar is a plain SMEM input, NOT a
    # PrefetchScalarGridSpec scalar — scalar-prefetch mode serializes the
    # block DMA pipeline on this backend (~1ms/call measured).
    m_last, bp = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((BR, Wb), lambda i: (i, 0)),
            rig_spec,
        ],
        out_specs=(
            pl.BlockSpec((8, Wb), lambda i: (0, 0)),
            pl.BlockSpec((BR, Wb), lambda i: (i, 0)),
        ),
        scratch_shapes=[pltpu.VMEM((1, Wb), jnp.float32)],
        out_shape=(
            jax.ShapeDtypeStruct((8, Wb), jnp.float32),
            jax.ShapeDtypeStruct((H, Wb), jnp.int32),
        ),
        interpret=_interpret(),
    )(pl_arr, e_tot, rig)
    return m_last[0], bp


def _bt_kernel(pl_ref, m_ref, bp_ref, oh_ref, oh_scr, *, BR, delta_x, Wb):
    """One-hot backpointer walk — fully vectorized, no scalar chases.

    The seam position at each row is carried as a one-hot [1, Wb] vector in
    VMEM scratch; following a backpointer dx is a roll of the masked
    one-hot. Tie-breaking already happened in the forward pass (bp encodes
    the chosen dx), so this walk is exact.
    """
    i = pl.program_id(0)
    pref_left = pl_ref[0, 0] != 0
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, Wb), 1)

    @pl.when(i == 0)
    def _():
        # start: argmin of the last M row; ties leftmost (pref LEFT) else
        # rightmost (SPEC.md §5)
        m_row = m_ref[0:1, :]
        mmin = jnp.min(m_row)
        eq = m_row == mmin
        left_x = jnp.min(jnp.where(eq, lane, Wb))
        right_x = jnp.max(jnp.where(eq, lane, -1))
        x0 = jnp.where(pref_left, left_x, right_x)
        oh_scr[0:1, :] = (lane == x0).astype(jnp.int32)

    def row_fn(k, oh):
        r = BR - 1 - k
        oh_ref[pl.ds(r, 1), :] = oh
        # walk: position x moves to x + bp[r, x]
        bp_row = bp_ref[pl.ds(r, 1), :]
        nxt = oh * (bp_row == 0).astype(jnp.int32)
        for d in range(1, delta_x + 1):
            m_neg = oh * (bp_row == -d).astype(jnp.int32)
            m_pos = oh * (bp_row == d).astype(jnp.int32)
            nxt = nxt + pltpu.roll(m_neg, (-d) % Wb, axis=1)
            nxt = nxt + pltpu.roll(m_pos, d, axis=1)
        return nxt

    oh_final = jax.lax.fori_loop(0, BR, row_fn, oh_scr[0:1, :])
    oh_scr[0:1, :] = oh_final


@functools.partial(jax.jit, static_argnames=("delta_x",))
def backtrack_pallas(M_last, bp, pref_left, delta_x: int):
    """Seam from (last DP row, backpointers). Returns [H] i32."""
    H, Wb = bp.shape
    BR = _row_block(H)
    n = H // BR
    pl_arr = jnp.asarray(pref_left, jnp.int32).reshape(1, 1)
    m8 = jnp.broadcast_to(M_last, (8, Wb))
    kernel = functools.partial(_bt_kernel, BR=BR, delta_x=delta_x, Wb=Wb)
    rev = lambda i, *_: (n - 1 - i, 0)  # noqa: E731 — reversed block order
    oh = pl.pallas_call(
        kernel,
        grid=(n,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((8, Wb), lambda i: (0, 0)),
            pl.BlockSpec((BR, Wb), rev),
        ],
        out_specs=pl.BlockSpec((BR, Wb), rev),
        scratch_shapes=[pltpu.VMEM((1, Wb), jnp.int32)],
        out_shape=jax.ShapeDtypeStruct((H, Wb), jnp.int32),
        interpret=_interpret(),
    )(pl_arr, m8, bp)
    lane = jnp.arange(Wb, dtype=jnp.int32)[None, :]
    return jnp.sum(oh * lane, axis=1, dtype=jnp.int32)


# ---------------------------------------------------------------------------
# Folded-row kernels (production path)
#
# A [1, Wb] row uses 1 of 8 VPU sublanes (Wb/128 vregs per op). Folding each
# row to [f, L] (x = s*L + l, f*L = Wb) makes every row op use the full
# (8, 128) vector shape — 8x fewer vector ops per row. Cross-fold-boundary
# shifts are patched with one sublane roll + lane select (global order is
# preserved exactly; results are bit-identical to the flat kernels).
# ---------------------------------------------------------------------------

def _fold_factor(Wb: int) -> int:
    for f in (8, 4, 2):
        if Wb % f == 0 and (Wb // f) % 128 == 0:
            return f
    return 1


def _shift_folded(M, d: int, fill, f: int, L: int, edge: bool = True):
    """shifted[x] = M[x + d] on a folded row [f, L]; out-of-range -> fill.

    Select-before-roll: the fold-crossing merge is done in PRE-roll lane
    coordinates (the lanes that will wrap pick the sublane-rolled copy),
    then ONE lane roll finishes the shift — 3 vector ops per shift
    instead of the naive 4 (roll, roll-sublane, roll, select).

    edge=False skips the out-of-range fill select — for callers that can
    prove the edge region is never read or never populated (e.g. one-hot
    seam walks whose position provably stays in range: a spurious wrapped
    value would require a backpointer pointing out of the DP's +inf
    guard band, which the forward pass cannot produce)."""
    if d == 0:
        return M
    lane = jax.lax.broadcasted_iota(jnp.int32, (f, L), 1)
    sub = jax.lax.broadcasted_iota(jnp.int32, (f, L), 0)
    glane = sub * L + lane
    W = f * L
    if d > 0:
        ms = pltpu.roll(M, (f - 1) % f if f > 1 else 0, axis=0)  # M[s+1]
        pre = jnp.where(lane < d, ms, M)        # lanes that will wrap
        out = pltpu.roll(pre, (-d) % L, axis=1)
        if not edge:
            return out
        return jnp.where(glane >= W - d, fill, out)
    dd = -d
    ms = pltpu.roll(M, 1 % f if f > 1 else 0, axis=0)            # M[s-1]
    pre = jnp.where(lane >= L - dd, ms, M)
    out = pltpu.roll(pre, dd, axis=1)
    if not edge:
        return out
    return jnp.where(glane < dd, fill, out)


def _shift_stack(M, d: int, fill, f: int, L: int, lane, glane_row,
                 edge: bool = True):
    """Batched _shift_folded: M is (R*f, L) holding R independent folded
    rows (each row = f consecutive sublanes). shifted[x] = row[x + d] per
    row, out-of-range -> fill.

    One global sublane roll serves every row's fold crossing: the values a
    row borrows from its neighbor row land only at positions the per-row
    ``glane_row`` edge mask fills anyway (positions x >= W - d for d > 0,
    x < -d for d < 0), so results are bit-identical to per-row
    _shift_folded.

    edge=False skips the out-of-range fill select — callers that mask the
    edge region themselves (the energy stencil's edge-replicate selects
    subsume it, and compaction's width zeroing likewise) save one op."""
    if d == 0:
        return M
    Rf = M.shape[0]
    W = f * L
    if d > 0:
        ms = pltpu.roll(M, Rf - 1, axis=0)          # global M[s+1]
        pre = jnp.where(lane < d, ms, M)            # select-before-roll
        out = pltpu.roll(pre, (-d) % L, axis=1)
        if not edge:
            return out
        return jnp.where(glane_row >= W - d, fill, out)
    dd = -d
    ms = pltpu.roll(M, 1 % Rf, axis=0)              # global M[s-1]
    pre = jnp.where(lane >= L - dd, ms, M)
    out = pltpu.roll(pre, dd, axis=1)
    if not edge:
        return out
    return jnp.where(glane_row < dd, fill, out)


# Rows unrolled per fori iteration (amortizes loop overhead). Bigger
# chunks help until compile-size/issue effects bite; the optimum is
# size-dependent (v5e devtime A/B, r4): 16 wins at 2048^2 (318 -> 284
# us/seam; 32 regresses), while the VMEM-resident kernel prefers 64
# (see carve_resident._chunk_res). TUNE.dp_chunk overrides for
# experiments (ops.tune — the one knob surface, read once at import).
from .tune import TUNE
_CHUNK_ENV = TUNE.dp_chunk
_CHUNK = _CHUNK_ENV if _CHUNK_ENV else 16


def _chunk_for(rows: int) -> int:
    """Largest supported chunk dividing the given row-block size.

    Interpreter mode (CPU tests) stays at 8: XLA:CPU segfaults compiling
    the larger unrolled interpret-mode kernels once a long pytest process
    has accumulated enough executables (same upstream cliff as the
    test_pallas_dp module fixture); the chunk size is semantically
    neutral, so tests still cover the kernels bit-exactly."""
    cands = (8,) if _interpret() else (_CHUNK, 16, 8)
    for c in cands:
        if c <= rows and rows % c == 0:
            return c
    return rows

# Forward-wedge kill switch (ops.tune: read once at import).
_FWD_WEDGE = TUNE.fwd_wedge
_FWD_KW = TUNE.fwd_kw

# backpointer dtype of the folded kernels: |dx| <= 10 fits int8, which
# quarters the DP's store + backtrack's load traffic (TUNE.bp_i32 for
# experiments / fallback)
_BP_DT = jnp.int32 if TUNE.bp_i32 else jnp.int8


def _dpf_kernel(pl_ref, e_ref, rig_ref, m_ref, bp_ref, frontier, *, BR,
                delta_x, has_rig, H, f, L, CH):
    i = pl.program_id(0)
    n = pl.num_programs(0)
    pref_left = pl_ref[0, 0] != 0
    inf = jnp.float32(jnp.inf)
    cands = _rank_consts(delta_x, H)
    by_left = sorted(cands, key=lambda c: c[1])
    by_right = sorted(cands, key=lambda c: c[2])

    def dp_row(M_prev, e_row, rig_row):
        # values: plain min tree — the M[y-1] -> M[y] critical chain
        # carries no tie-rank bookkeeping (min is order-invariant);
        # backpointers come from rank-ordered equality OFF the chain
        shifted = {}
        for dx, rl, rr, rigc in cands:
            c = _shift_folded(M_prev, dx, inf, f, L)
            if has_rig and dx != 0:
                c = c + rig_row * rigc
            shifted[dx] = c
        best = shifted[0]
        for dx in shifted:
            if dx != 0:
                best = jnp.minimum(best, shifted[dx])
        eqs = {dx: shifted[dx] == best for dx, _, _, _ in cands}

        def nested(order):
            bp = jnp.full((f, L), jnp.int32(order[-1][0]))
            for dx, _, _, _ in reversed(order[:-1]):
                bp = jnp.where(eqs[dx], jnp.int32(dx), bp)
            return bp
        bp = jnp.where(pref_left, nested(by_left), nested(by_right))
        return e_row + best, bp

    def chunk_fn(k, M_prev):
        base = k * CH
        e_chunk = e_ref[pl.ds(base, CH)]
        rig_chunk = rig_ref[pl.ds(base, CH)] if has_rig else None
        bps = []
        for j in range(CH):
            e_row = e_chunk[j]
            m_row, bp = dp_row(M_prev, e_row,
                               rig_chunk[j] if has_rig else None)
            if j == 0:
                # row 0 of the whole map has no predecessor row
                first = (i == 0) & (k == 0)
                m_row = jnp.where(first, e_row, m_row)
                bp = jnp.where(first, jnp.int32(0), bp)
            bps.append(bp)
            M_prev = m_row
        bp_ref[pl.ds(base, CH)] = jnp.stack(bps).astype(_BP_DT)
        return M_prev

    # roll-free WEDGE chunk (see ops.carve_resident.wedge_rows — same
    # transformation, dynamic first-row guard): maintain all shifted
    # copies S_d = shift_d(M) so the per-row dependency chain carries
    # only min,min,add (a chained cross-lane roll costs ~50-70 ns on
    # v5e vs ~2.5 ns for min/add, and the sweep is latency-bound).
    # Exact: shift_d distributes elementwise over min and +.
    KW = _FWD_KW

    # rigidity in the wedge (r5): the rig term is ROW-LOCAL (off-chain)
    # and distributes exactly over shifts — shift_d(shift_dx(M) + rt) =
    # P[d+dx] + shift_d(rt) with rt = rig_row * rigc — so masked/rigidity
    # configs get the same min,min,add chain as the plain path instead of
    # the rank-based kernel's two chained cross-lane rolls per row.
    rigc1 = cands[1][3] if delta_x >= 1 else np.float32(0)

    def chunk_fn_wedge(k, M_prev):
        base = k * CH
        e_chunk = e_ref[pl.ds(base, CH)]
        rig_chunk = rig_ref[pl.ds(base, CH)] if has_rig else None
        first = (i == 0) & (k == 0)
        bps = []
        for blk in range(CH // KW):
            P = {d: _shift_folded(M_prev, d, inf, f, L)
                 for d in range(-KW, KW + 1)}
            for jj in range(KW):
                j = blk * KW + jj
                e_row = e_chunk[j]
                band = KW - 1 - jj
                if has_rig:
                    rt = rig_chunk[j] * rigc1      # off-chain, row-local
                    cm, c0, cp = P[-1] + rt, P[0], P[1] + rt
                else:
                    cm, c0, cp = P[-1], P[0], P[1]
                best = jnp.minimum(jnp.minimum(c0, cm), cp)
                eq0 = c0 == best
                eqm = cm == best
                eqp = cp == best
                bp = jnp.where(
                    eq0, jnp.int32(0),
                    jnp.where(pref_left,
                              jnp.where(eqm, jnp.int32(-1),
                                        jnp.int32(1)),
                              jnp.where(eqp, jnp.int32(1),
                                        jnp.int32(-1))))
                row0 = blk == 0 and jj == 0          # static position
                if row0:                             # dynamic image row 0
                    bp = jnp.where(first, jnp.int32(0), bp)
                newP = {0: e_row + (jnp.where(first, jnp.float32(0), best)
                                    if row0 else best)}
                for d in range(-band, band + 1):
                    if d == 0:
                        continue
                    e_sh = _shift_folded(e_row, d, inf, f, L)
                    if has_rig:
                        # fill 0: edge lanes are dominated by P's inf
                        rt_sh = _shift_folded(rt, d, jnp.float32(0), f,
                                              L)
                        m3 = jnp.minimum(
                            jnp.minimum(P[d], P[d - 1] + rt_sh),
                            P[d + 1] + rt_sh)
                    else:
                        m3 = jnp.minimum(jnp.minimum(P[d], P[d - 1]),
                                         P[d + 1])
                    if row0:
                        m3 = jnp.where(first, jnp.float32(0), m3)
                    newP[d] = e_sh + m3
                P = newP
                bps.append(bp)
            M_prev = P[0]
        bp_ref[pl.ds(base, CH)] = jnp.stack(bps).astype(_BP_DT)
        return M_prev

    use_wedge = (delta_x == 1 and CH % KW == 0 and _FWD_WEDGE)
    body = chunk_fn_wedge if use_wedge else chunk_fn
    M_final = jax.lax.fori_loop(0, BR // CH, body, frontier[:, :])
    frontier[:, :] = M_final

    @pl.when(i == n - 1)
    def _():
        m_ref[:, :] = M_final


def _btf_kernel(pl_ref, m_ref, bp_ref, seam_ref, oh_scr, *, BR, delta_x,
                f, L, CH):
    i = pl.program_id(0)
    pref_left = pl_ref[0, 0] != 0
    lane = jax.lax.broadcasted_iota(jnp.int32, (f, L), 1)
    sub = jax.lax.broadcasted_iota(jnp.int32, (f, L), 0)
    glane = sub * L + lane
    W = f * L

    @pl.when(i == 0)
    def _():
        m_row = m_ref[:, :]
        mmin = jnp.min(m_row)
        eq = m_row == mmin
        left_x = jnp.min(jnp.where(eq, glane, W))
        right_x = jnp.max(jnp.where(eq, glane, -1))
        x0 = jnp.where(pref_left, left_x, right_x)
        oh_scr[:, :] = (glane == x0).astype(jnp.int32)

    def chunk_fn(k, oh):
        base = BR - (k + 1) * CH
        bp_chunk = bp_ref[pl.ds(base, CH)].astype(jnp.int32)
        ohs = [None] * CH
        for j in range(CH - 1, -1, -1):
            ohs[j] = oh
            bp_row = bp_chunk[j]
            nxt = oh * (bp_row == 0).astype(jnp.int32)
            for d in range(1, delta_x + 1):
                m_neg = oh * (bp_row == -d).astype(jnp.int32)
                m_pos = oh * (bp_row == d).astype(jnp.int32)
                nxt = nxt + _shift_folded(m_neg, d, jnp.int32(0), f, L)
                nxt = nxt + _shift_folded(m_pos, -d, jnp.int32(0), f, L)
            oh = nxt
        # vector stores only — per-row scalar reductions/stores cost ~0.5us
        # each and would dominate the whole kernel
        seam_ref[pl.ds(base, CH)] = jnp.stack(ohs)
        return oh

    oh_final = jax.lax.fori_loop(0, BR // CH, chunk_fn, oh_scr[:, :])
    oh_scr[:, :] = oh_final


# Roll-free WEDGE backtrack (delta_x == 1): the chase chain per row is
# mul,add,add (~7.5 ns) instead of two chained cross-lane rolls (~125 ns
# measured at 2048^2 — scripts/phase2048.py attributed 278 of 384 us/seam
# to the old chase). Maintain shifted one-hot copies P_e = shift_e(oh),
# |e| <= KW, rebuilt from oh once per KW rows (one roll-level amortized
# over KW rows); each row then updates every copy with products of
# PRECOMPUTED shifted backpointer masks:
#   oh'        = sum_d shift_d(oh * c_d)            (c_d = (bp == -d))
#   P'_e       = sum_d P_{e+d} * shift_{e+d}(c_d)
# Exactness: _shift_folded with edge=False is a true per-row cyclic
# permutation pi_t, and pi_t(a*b) = pi_t(a)*pi_t(b), pi_e(pi_d(x)) =
# pi_{e+d}(x), so P_e == pi_e(oh) holds inductively, bit-exactly; the
# consumed oh is the exact walk (the walker provably never wraps: a wrap
# would need a backpointer crossing the DP's +inf guard). Knobs in
# ops.tune (read once at import): bt_wedge disables, bt_kw sets KW.
_BT_WEDGE = TUNE.bt_wedge
_BT_KW = TUNE.bt_kw


def _btw_kernel(pl_ref, m_ref, bp_ref, rec_ref, oh_scr, *, BR, f, L, KW,
                CH):
    """Wedge backtrack: emits [BR, L] seam-record rows (one nonzero per
    row = compacted seam column + 1, fold-reduced) instead of the full
    one-hot plane — H*L*4 bytes out instead of H*Wb*4."""
    i = pl.program_id(0)
    pref_left = pl_ref[0, 0] != 0
    lane = jax.lax.broadcasted_iota(jnp.int32, (f, L), 1)
    sub = jax.lax.broadcasted_iota(jnp.int32, (f, L), 0)
    glane = sub * L + lane
    W = f * L
    zero = jnp.int32(0)

    @pl.when(i == 0)
    def _():
        m_row = m_ref[:, :]
        mmin = jnp.min(m_row)
        eq = m_row == mmin
        left_x = jnp.min(jnp.where(eq, glane, W))
        right_x = jnp.max(jnp.where(eq, glane, -1))
        x0 = jnp.where(pref_left, left_x, right_x)
        oh_scr[:, :] = (glane == x0).astype(jnp.int32)

    glp1 = glane + 1

    def chunk_fn(k, oh):
        base = pl.multiple_of(BR - (k + 1) * CH, CH)
        bp_chunk = bp_ref[pl.ds(base, CH)].astype(jnp.int32)
        # c_d = (bp == -d): the walker at x+d with bp -d moves to x
        cst = {d: (bp_chunk == -d).astype(jnp.int32) for d in (-1, 0, 1)}

        def crow(d, j):
            return jax.lax.slice_in_dim(cst[d], j, j + 1, axis=0)[0]

        recs = [None] * CH
        for blk in range(CH // KW - 1, -1, -1):
            # rebuild the copy band from the current one-hot: one
            # roll-level (all shifts independent) per KW rows
            P = {e: (_shift_folded(oh, e, zero, f, L, edge=False)
                     if e else oh) for e in range(-KW, KW + 1)}
            for step in range(KW):
                j = blk * KW + KW - 1 - step
                recs[j] = jnp.sum(P[0] * glp1, axis=0, keepdims=True)
                # off-chain: shifted masks of row j
                mt = {}
                for d in (-1, 0, 1):
                    for e in range(-(KW - 1 - step), KW - step):
                        t = e + d
                        if (d, t) not in mt:
                            mt[(d, t)] = (
                                _shift_folded(crow(d, j), t, zero, f, L,
                                              edge=False)
                                if t else crow(d, j))
                newP = {}
                for e in range(-(KW - 1 - step), KW - step):
                    acc = None
                    for d in (-1, 0, 1):
                        term = P[e + d] * mt[(d, e + d)]
                        acc = term if acc is None else acc + term
                    newP[e] = acc
                P = newP
            oh = P[0]
        rec_ref[pl.ds(base, CH)] = jnp.concatenate(recs, axis=0)
        return oh

    oh_final = jax.lax.fori_loop(0, BR // CH, chunk_fn, oh_scr[:, :])
    oh_scr[:, :] = oh_final


@functools.partial(jax.jit, static_argnames=("delta_x", "has_rig"))
def find_seam_pallas(e_tot, rig, pref_left, delta_x: int, has_rig: bool):
    """Production TPU seam search: folded-row DP + one-hot backtrack.

    Drop-in replacement for core.dp.find_seam (bit-identical output).
    """
    H, Wb = e_tot.shape
    if rig is None:                # absent rigidity plane (state stores None)
        assert not has_rig
        rig = jnp.zeros((1, Wb), jnp.float32)
    f = _fold_factor(Wb)
    BR = min(_row_block(H), 128)   # cap block VMEM footprint
    ch = _chunk_for(BR)
    # H % BR != 0: _row_block returned H itself (H not a multiple of 8)
    # but the 128 cap re-introduced a remainder — the grid of H // BR
    # blocks would silently drop the last H % BR rows.  dp_forward_pallas
    # handles such shapes as a single block.  (_chunk_for always returns
    # a divisor of BR, so no BR % ch guard is needed.)
    if f == 1 or H % BR != 0:
        M_last, bp = dp_forward_pallas(e_tot, rig, pref_left, delta_x,
                                       has_rig)
        return backtrack_pallas(M_last, bp, pref_left, delta_x)
    L = Wb // f
    n = H // BR
    pl_arr = jnp.asarray(pref_left, jnp.int32).reshape(1, 1)
    e_f = e_tot.reshape(H, f, L)
    rig_f = rig.reshape(-1, f, L)
    # without rigidity, stream only a dummy 1-row rig block
    rig_spec = (pl.BlockSpec((BR, f, L), lambda i: (i, 0, 0)) if has_rig
                else pl.BlockSpec((1, f, L), lambda i: (0, 0, 0)))

    m_last, bp = pl.pallas_call(
        functools.partial(_dpf_kernel, BR=BR, delta_x=delta_x,
                          has_rig=has_rig, H=H, f=f, L=L, CH=ch),
        grid=(n,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((BR, f, L), lambda i: (i, 0, 0)),
            rig_spec,
        ],
        out_specs=(
            pl.BlockSpec((f, L), lambda i: (0, 0)),
            pl.BlockSpec((BR, f, L), lambda i: (i, 0, 0)),
        ),
        scratch_shapes=[pltpu.VMEM((f, L), jnp.float32)],
        out_shape=(
            jax.ShapeDtypeStruct((f, L), jnp.float32),
            jax.ShapeDtypeStruct((H, f, L), _BP_DT),
        ),
        interpret=_interpret(),
    )(pl_arr, e_f, rig_f)

    if delta_x == 1 and _BT_WEDGE and ch % _BT_KW == 0:
        rec = pl.pallas_call(
            functools.partial(_btw_kernel, BR=BR, f=f, L=L, KW=_BT_KW,
                              CH=ch),
            grid=(n,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec((f, L), lambda i: (0, 0)),
                pl.BlockSpec((BR, f, L), lambda i: (n - 1 - i, 0, 0)),
            ],
            out_specs=pl.BlockSpec((BR, L), lambda i: (n - 1 - i, 0)),
            scratch_shapes=[pltpu.VMEM((f, L), jnp.int32)],
            out_shape=jax.ShapeDtypeStruct((H, L), jnp.int32),
            interpret=_interpret(),
        )(pl_arr, m_last, bp)
        return jnp.sum(rec, axis=1, dtype=jnp.int32) - 1

    oh = pl.pallas_call(
        functools.partial(_btf_kernel, BR=BR, delta_x=delta_x, f=f, L=L,
                          CH=ch),
        grid=(n,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((f, L), lambda i: (0, 0)),
            pl.BlockSpec((BR, f, L), lambda i: (n - 1 - i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((BR, f, L), lambda i: (n - 1 - i, 0, 0)),
        scratch_shapes=[pltpu.VMEM((f, L), jnp.int32)],
        out_shape=jax.ShapeDtypeStruct((H, f, L), jnp.int32),
        interpret=_interpret(),
    )(pl_arr, m_last, bp)
    sub = jnp.arange(f, dtype=jnp.int32)[None, :, None]
    lane = jnp.arange(L, dtype=jnp.int32)[None, None, :]
    glane = sub * L + lane
    return jnp.sum(oh * glane, axis=(1, 2), dtype=jnp.int32)


# ---------------------------------------------------------------------------
# Fully fused per-seam kernels (production hot path)
#
# Two passes per seam, nothing else touches HBM:
#   1. _dpef_kernel: energy computed on the fly from the reader plane
#      (gradients + bias + width mask, bit-identical op order to
#      core.energy.energy_from_plane) feeding the row DP. Reads the plane
#      once, writes backpointers once — the separately materialized energy
#      map (one full write + read per seam) disappears.
#   2. _btcf_kernel: backtrack + seam-index broadcast + compaction of every
#      carried plane in one reverse sweep. The seam position is carried as a
#      one-hot; a cyclic log-reduction broadcasts the seam index to all
#      lanes, giving both the [H] seam output and the >=seam compaction mask
#      without any scalar reductions (0.5us each — they would dominate).
#
# Requirements (else callers fall back to the unfused path):
# H % 8 == 0, fold factor > 1, and L = Wb/f a power of two (the cyclic
# log-reduction needs it).
# ---------------------------------------------------------------------------


def _is_pow2(x: int) -> bool:
    return x > 0 and (x & (x - 1)) == 0


def fused_ok(H: int, Wb: int, delta_x: int = 1) -> bool:
    f = _fold_factor(Wb)
    if f <= 1:
        return False
    BR = min(_row_block(H), 128)
    ch = _chunk_for(BR)
    if H % BR != 0:      # grid would drop the last H % BR rows
        return False
    if delta_x == 1 and _BT_WEDGE and ch % _BT_KW == 0:
        return True          # wedge backward needs no pow2 L
    return _is_pow2(Wb // f)


def _energy_row_folded(b_row, b_up, b_dn, w, glane, nrg: int, f: int,
                       L: int):
    """One energy row from reader-plane rows (SPEC.md §2 op order)."""
    if nrg == 6:                                        # NULL
        return jnp.zeros((f, L), jnp.float32)
    br = _shift_folded(b_row, 1, jnp.float32(0), f, L)
    br = jnp.where(glane >= w - 1, b_row, br)           # replicate right edge
    bl = _shift_folded(b_row, -1, jnp.float32(0), f, L)
    bl = jnp.where(glane == 0, b_row, bl)               # replicate left edge
    gx = (br - bl) * jnp.float32(0.5)
    if nrg in (0, 3):                                   # *_XABS
        return jnp.abs(gx)
    gy = (b_dn - b_up) * jnp.float32(0.5)
    if nrg in (1, 4):                                   # *_SUMABS
        return (jnp.abs(gx) + jnp.abs(gy)) * jnp.float32(0.5)
    return jnp.sqrt(gx * gx + gy * gy)                  # *_NORM


def _dpef_kernel(*refs, BR, delta_x, has_bias, has_rig, nrg, H, f, L,
                 CH):
    it = iter(refs)
    sc_ref = next(it)
    b_ref = next(it)
    bnext_ref = next(it)
    bias_ref = next(it) if has_bias else None
    rig_ref = next(it) if has_rig else None
    m_ref = next(it)
    bp_ref = next(it)
    frontier = next(it)
    prevb = next(it)

    i = pl.program_id(0)
    n = pl.num_programs(0)
    pref_left = sc_ref[0, 0] != 0
    w = sc_ref[0, 1]
    inf = jnp.float32(jnp.inf)
    cands = _rank_consts(delta_x, H)
    lane = jax.lax.broadcasted_iota(jnp.int32, (f, L), 1)
    sub = jax.lax.broadcasted_iota(jnp.int32, (f, L), 0)
    glane = sub * L + lane

    def dp_row(M_prev, e_row, rig_row):
        best = jnp.full((f, L), inf, jnp.float32)
        best_rank = jnp.full((f, L), 127, jnp.int32)
        bp = jnp.zeros((f, L), jnp.int32)
        for dx, rl, rr, rigc in cands:
            c = _shift_folded(M_prev, dx, inf, f, L)
            if has_rig and dx != 0:
                c = c + rig_row * rigc
            rank = jnp.where(pref_left, jnp.int32(rl), jnp.int32(rr))
            take = (c < best) | ((c == best) & (rank < best_rank))
            best = jnp.where(take, c, best)
            best_rank = jnp.where(take, rank, best_rank)
            bp = jnp.where(take, jnp.int32(dx), bp)
        return e_row + best, bp

    def chunk_fn(k, carry):
        M_prev, b_prev = carry
        base = k * CH
        bch = b_ref[pl.ds(base, CH)]                   # [CH, f, L]
        bias_ch = bias_ref[pl.ds(base, CH)] if has_bias else None
        rig_ch = rig_ref[pl.ds(base, CH)] if has_rig else None
        nbase = jnp.minimum(base + CH, BR - 1)
        in_row = b_ref[pl.ds(nbase, 1)]                # [1, f, L]
        is_last = base + CH >= BR
        nxt_row = jnp.where(is_last, bnext_ref[0:1], in_row)[0]
        bps = []
        for j in range(CH):
            r = i * BR + base + j                      # global row (traced)
            b_row = bch[j]
            b_up = jnp.where(r == 0, b_row, b_prev if j == 0 else bch[j - 1])
            b_dn_raw = bch[j + 1] if j + 1 < CH else nxt_row
            b_dn = jnp.where(r == H - 1, b_row, b_dn_raw)
            e = _energy_row_folded(b_row, b_up, b_dn, w, glane, nrg, f, L)
            if has_bias:
                e = e + bias_ch[j]
            e_tot = jnp.where(glane < w, e, inf)
            m_row, bp = dp_row(M_prev, e_tot,
                               rig_ch[j] if has_rig else None)
            # row 0 of the whole map has no predecessor row
            m_row = jnp.where(r == 0, e_tot, m_row)
            bp = jnp.where(r == 0, jnp.int32(0), bp)
            bps.append(bp)
            M_prev = m_row
        bp_ref[pl.ds(base, CH)] = jnp.stack(bps).astype(_BP_DT)
        return (M_prev, bch[CH - 1])

    # roll-free WEDGE chunk with the energy stencil inline (see
    # _dpf_kernel.chunk_fn_wedge): the energy rows are computed from the
    # reader plane (off the M chain) and feed the shifted-copy update
    # S'_d = shift_d(e) + min(S_{d-1}, S_d, S_{d+1}) — only min,min,add
    # on the M[y-1] -> M[y] dependency chain.
    KW = 4

    def chunk_fn_wedge(k, carry):
        M_prev, b_prev = carry
        base = k * CH
        bch = b_ref[pl.ds(base, CH)]
        bias_ch = bias_ref[pl.ds(base, CH)] if has_bias else None
        nbase = jnp.minimum(base + CH, BR - 1)
        in_row = b_ref[pl.ds(nbase, 1)]
        is_last = base + CH >= BR
        nxt_row = jnp.where(is_last, bnext_ref[0:1], in_row)[0]
        first = (i == 0) & (k == 0)
        bps = []
        for blk in range(CH // KW):
            P = {d: _shift_folded(M_prev, d, inf, f, L)
                 for d in range(-KW, KW + 1)}
            for jj in range(KW):
                j = blk * KW + jj
                r = i * BR + base + j              # global row (traced)
                b_row = bch[j]
                b_up = jnp.where(r == 0, b_row,
                                 b_prev if j == 0 else bch[j - 1])
                b_dn_raw = bch[j + 1] if j + 1 < CH else nxt_row
                b_dn = jnp.where(r == H - 1, b_row, b_dn_raw)
                e = _energy_row_folded(b_row, b_up, b_dn, w, glane, nrg,
                                       f, L)
                if has_bias:
                    e = e + bias_ch[j]
                e_row = jnp.where(glane < w, e, inf)
                band = KW - 1 - jj
                cm, c0, cp = P[-1], P[0], P[1]
                best = jnp.minimum(jnp.minimum(c0, cm), cp)
                eq0 = c0 == best
                eqm = cm == best
                eqp = cp == best
                bp = jnp.where(
                    eq0, jnp.int32(0),
                    jnp.where(pref_left,
                              jnp.where(eqm, jnp.int32(-1),
                                        jnp.int32(1)),
                              jnp.where(eqp, jnp.int32(1),
                                        jnp.int32(-1))))
                row0 = blk == 0 and jj == 0        # static position
                if row0:                           # dynamic image row 0
                    bp = jnp.where(first, jnp.int32(0), bp)
                newP = {0: e_row + (jnp.where(first, jnp.float32(0), best)
                                    if row0 else best)}
                for d in range(-band, band + 1):
                    if d == 0:
                        continue
                    e_sh = _shift_folded(e_row, d, inf, f, L)
                    m3 = jnp.minimum(jnp.minimum(P[d], P[d - 1]),
                                     P[d + 1])
                    if row0:
                        m3 = jnp.where(first, jnp.float32(0), m3)
                    newP[d] = e_sh + m3
                P = newP
                bps.append(bp)
            M_prev = P[0]
        bp_ref[pl.ds(base, CH)] = jnp.stack(bps).astype(_BP_DT)
        return (M_prev, bch[CH - 1])

    use_wedge = (delta_x == 1 and not has_rig and CH % KW == 0
                 and _FWD_WEDGE)
    body = chunk_fn_wedge if use_wedge else chunk_fn
    M0 = frontier[:, :]
    b0 = prevb[:, :]
    M_final, b_last = jax.lax.fori_loop(0, BR // CH, body, (M0, b0))
    frontier[:, :] = M_final
    prevb[:, :] = b_last

    @pl.when(i == n - 1)
    def _():
        m_ref[:, :] = M_final


def _broadcast_sum(p, f: int, L: int):
    """All-lanes broadcast of the total sum of p (cyclic log-reduce;
    needs L, f powers of two)."""
    t = 1
    while t < L:
        p = p + pltpu.roll(p, t, axis=1)
        t *= 2
    t = 1
    while t < f:
        p = p + pltpu.roll(p, t, axis=0)
        t *= 2
    return p


def _btcf_kernel(*refs, BR, delta_x, has_bias, has_rig, f, L):
    it = iter(refs)
    sc_ref = next(it)
    m_ref = next(it)
    bp_ref = next(it)
    b_ref = next(it)
    bias_ref = next(it) if has_bias else None
    rig_ref = next(it) if has_rig else None
    seam_ref = next(it)
    bo_ref = next(it)
    biaso_ref = next(it) if has_bias else None
    rigo_ref = next(it) if has_rig else None
    oh_scr = next(it)

    i = pl.program_id(0)
    pref_left = sc_ref[0, 0] != 0
    w = sc_ref[0, 1]
    lane = jax.lax.broadcasted_iota(jnp.int32, (f, L), 1)
    sub = jax.lax.broadcasted_iota(jnp.int32, (f, L), 0)
    glane = sub * L + lane
    W = f * L

    @pl.when(i == 0)
    def _():
        m_row = m_ref[:, :]
        mmin = jnp.min(m_row)
        eq = m_row == mmin
        left_x = jnp.min(jnp.where(eq, glane, W))
        right_x = jnp.max(jnp.where(eq, glane, -1))
        x0 = jnp.where(pref_left, left_x, right_x)
        oh_scr[:, :] = (glane == x0).astype(jnp.int32)

    CH = _CHUNK          # legacy delta_x>1 fused backward: module default

    def compact(a_row, ge):
        out = jnp.where(ge, _shift_folded(a_row, 1, jnp.float32(0), f, L),
                        a_row)
        return jnp.where(glane < w - 1, out, jnp.float32(0))

    def chunk_fn(k, oh):
        base = BR - (k + 1) * CH
        bp_chunk = bp_ref[pl.ds(base, CH)].astype(jnp.int32)
        b_chunk = b_ref[pl.ds(base, CH)]
        bias_chunk = bias_ref[pl.ds(base, CH)] if has_bias else None
        rig_chunk = rig_ref[pl.ds(base, CH)] if has_rig else None
        seams, bos, biasos, rigos = [None] * CH, [None] * CH, \
            [None] * CH, [None] * CH
        for j in range(CH - 1, -1, -1):
            s_bcast = _broadcast_sum(oh * glane, f, L)   # seam idx everywhere
            seams[j] = s_bcast[0:1, 0:128]
            ge = glane >= s_bcast
            bos[j] = compact(b_chunk[j], ge)
            if has_bias:
                biasos[j] = compact(bias_chunk[j], ge)
            if has_rig:
                rigos[j] = compact(rig_chunk[j], ge)
            # walk to the previous row: x moves to x + bp[r, x]
            bp_row = bp_chunk[j]
            nxt = oh * (bp_row == 0).astype(jnp.int32)
            for d in range(1, delta_x + 1):
                m_neg = oh * (bp_row == -d).astype(jnp.int32)
                m_pos = oh * (bp_row == d).astype(jnp.int32)
                nxt = nxt + _shift_folded(m_neg, d, jnp.int32(0), f, L)
                nxt = nxt + _shift_folded(m_pos, -d, jnp.int32(0), f, L)
            oh = nxt
        seam_ref[pl.ds(base, CH)] = jnp.concatenate(seams, axis=0)
        bo_ref[pl.ds(base, CH)] = jnp.stack(bos)
        if has_bias:
            biaso_ref[pl.ds(base, CH)] = jnp.stack(biasos)
        if has_rig:
            rigo_ref[pl.ds(base, CH)] = jnp.stack(rigos)
        return oh

    oh_final = jax.lax.fori_loop(0, BR // CH, chunk_fn, oh_scr[:, :])
    oh_scr[:, :] = oh_final


def _btwc_kernel(*refs, BR, has_bias, has_rig, f, L, KW, CH):
    """Fused WEDGE backtrack + compact (delta_x == 1).

    Combines the roll-free chase of _btw_kernel (shifted one-hot copies,
    mul/add-only chain) with the resident kernel's incremental >=seam
    mask law (ge' = ge - oh*(bp==+1) + shift_1(oh*(bp==-1)), expressed
    through the same precomputed mask products) and a per-chunk batched
    compaction of every carried plane. Emits [BR, L] fold-reduced seam
    records; compacted planes stream back out block by block — the
    separate XLA compact pass (2 full planes of HBM per seam) disappears.
    """
    it = iter(refs)
    sc_ref = next(it)
    m_ref = next(it)
    bp_ref = next(it)
    b_ref = next(it)
    bias_ref = next(it) if has_bias else None
    rig_ref = next(it) if has_rig else None
    rec_ref = next(it)
    bo_ref = next(it)
    biaso_ref = next(it) if has_bias else None
    rigo_ref = next(it) if has_rig else None
    oh_scr = next(it)
    ge_scr = next(it)

    i = pl.program_id(0)
    pref_left = sc_ref[0, 0] != 0
    w = sc_ref[0, 1]
    lane = jax.lax.broadcasted_iota(jnp.int32, (f, L), 1)
    sub = jax.lax.broadcasted_iota(jnp.int32, (f, L), 0)
    glane = sub * L + lane
    laneS = jax.lax.broadcasted_iota(jnp.int32, (CH * f, L), 1)
    subS = jax.lax.broadcasted_iota(jnp.int32, (CH * f, L), 0)
    glaneS = (subS % f) * L + laneS
    W = f * L
    zero = jnp.int32(0)
    glp1 = glane + 1

    @pl.when(i == 0)
    def _():
        m_row = m_ref[:, :]
        mmin = jnp.min(m_row)
        eq = m_row == mmin
        left_x = jnp.min(jnp.where(eq, glane, W))
        right_x = jnp.max(jnp.where(eq, glane, -1))
        x0 = jnp.where(pref_left, left_x, right_x)
        oh_scr[:, :] = (glane == x0).astype(jnp.int32)
        ge_scr[:, :] = (glane >= x0).astype(jnp.int32)

    def chunk_fn(k, carry):
        oh, ge = carry
        base = pl.multiple_of(BR - (k + 1) * CH, CH)
        bp_chunk = bp_ref[pl.ds(base, CH)].astype(jnp.int32)
        # c_d = (bp == -d): the walker at x+d with bp -d moves to x
        cst = {d: (bp_chunk == -d).astype(jnp.int32) for d in (-1, 0, 1)}

        def crow(d, j):
            return jax.lax.slice_in_dim(cst[d], j, j + 1, axis=0)[0]

        recs = [None] * CH
        ges = [None] * CH
        for blk in range(CH // KW - 1, -1, -1):
            P = {e: (_shift_folded(oh, e, zero, f, L, edge=False)
                     if e else oh) for e in range(-KW, KW + 1)}
            for step in range(KW):
                j = blk * KW + KW - 1 - step
                recs[j] = jnp.sum(P[0] * glp1, axis=0, keepdims=True)
                ges[j] = ge
                mt = {}

                def m_of(d, t, j=j):
                    if (d, t) not in mt:
                        mt[(d, t)] = (_shift_folded(crow(d, j), t, zero,
                                                    f, L, edge=False)
                                      if t else crow(d, j))
                    return mt[(d, t)]

                newP = {}
                for e in range(-(KW - 1 - step), KW - step):
                    acc = None
                    for d in (-1, 0, 1):
                        term = P[e + d] * m_of(d, e + d)
                        acc = term if acc is None else acc + term
                    newP[e] = acc
                # incremental >=seam mask: seam moved right (bp == +1,
                # i.e. c_{-1}) uncovers its old column; moved left
                # (c_{+1}) covers the new one
                ge = ge - P[0] * m_of(-1, 0) + P[1] * m_of(1, 1)
                P = newP
            oh = P[0]
        rec_ref[pl.ds(base, CH)] = jnp.concatenate(recs, axis=0)

        # batched compaction of this chunk from the collected ge rows;
        # _shift_stack edge=False wraps cross-row values only at
        # positions >= w-1, which the width zeroing overwrites anyway
        geS = jnp.concatenate(ges, axis=0) != 0
        sl = pl.ds(base, CH)

        def compact3(src, dst, fill):
            a2 = src[sl].reshape(CH * f, L)
            sh = _shift_stack(a2, 1, fill, f, L, laneS, glaneS,
                              edge=False)
            out = jnp.where(geS, sh, a2)
            out = jnp.where(glaneS < w - 1, out, fill)
            dst[sl] = out.reshape(CH, f, L)

        compact3(b_ref, bo_ref, jnp.float32(0))
        if has_bias:
            compact3(bias_ref, biaso_ref, jnp.float32(0))
        if has_rig:
            compact3(rig_ref, rigo_ref, jnp.float32(0))
        return (oh, ge)

    oh_f, ge_f = jax.lax.fori_loop(0, BR // CH, chunk_fn,
                                   (oh_scr[:, :], ge_scr[:, :]))
    oh_scr[:, :] = oh_f
    ge_scr[:, :] = ge_f


@functools.partial(jax.jit,
                   static_argnames=("delta_x", "has_bias", "has_rig", "nrg",
                                    "fuse_energy"))
def carve_step_pallas(cur_b, cur_bias, cur_rig, w, pref_left, delta_x: int,
                      has_bias: bool, has_rig: bool, nrg: int,
                      fuse_energy: bool = False):
    """One fused seam step on the reader plane.

    cur_b/[cur_bias]/[cur_rig]: [H, Wb] f32 compacted planes; w: traced
    current width; pref_left: traced bool. Returns (seam [H] i32, cur_b',
    cur_bias', cur_rig') — bit-identical to energy_from_plane + find_seam +
    roll/select compaction. Caller must check fused_ok(H, Wb).

    fuse_energy folds the energy stencil into the sequential DP kernel.
    Measured on v5e it LOSES: energy is embarrassingly parallel and cheap
    as an XLA pass (~0.13 ms at 2048^2), while inside the row-sequential
    kernel its ~15 vector ops/row extend the critical path (~+0.15 ms).
    Default is therefore the XLA energy pass + fused
    backtrack/seam/compact reverse sweep, which removes the 16 MB one-hot
    write + read and the separate compaction pass.
    """
    H, Wb = cur_b.shape
    f = _fold_factor(Wb)
    L = Wb // f
    BR = min(_row_block(H), 128)
    ch = _chunk_for(BR)
    n = H // BR
    sc = jnp.stack([jnp.asarray(pref_left, jnp.int32),
                    jnp.asarray(w, jnp.int32)]).reshape(1, 2)
    b3 = cur_b.reshape(H, f, L)
    blk = pl.BlockSpec((BR, f, L), lambda i: (i, 0, 0))
    blk_rev = pl.BlockSpec((BR, f, L), lambda i: (n - 1 - i, 0, 0))

    if fuse_energy:
        # inputs: [sc, b3, b3 (next-block 8-row slice for the gy halo),
        # bias?, rig?]
        fwd_in = [sc, b3, b3]
        fwd_specs = [
            pl.BlockSpec(memory_space=pltpu.SMEM),
            blk,
            pl.BlockSpec(
                (8, f, L),
                lambda i: (jnp.minimum(i + 1, n - 1) * (BR // 8), 0, 0)),
        ]
        if has_bias:
            fwd_in.append(cur_bias.reshape(H, f, L))
            fwd_specs.append(blk)
        if has_rig:
            fwd_in.append(cur_rig.reshape(H, f, L))
            fwd_specs.append(blk)

        m_last, bp = pl.pallas_call(
            functools.partial(_dpef_kernel, BR=BR, delta_x=delta_x,
                              has_bias=has_bias, has_rig=has_rig, nrg=nrg,
                              H=H, f=f, L=L, CH=ch),
            grid=(n,),
            in_specs=fwd_specs,
            out_specs=(pl.BlockSpec((f, L), lambda i: (0, 0)), blk),
            scratch_shapes=[pltpu.VMEM((f, L), jnp.float32),
                            pltpu.VMEM((f, L), jnp.float32)],
            out_shape=(jax.ShapeDtypeStruct((f, L), jnp.float32),
                       jax.ShapeDtypeStruct((H, f, L), _BP_DT)),
            interpret=_interpret(),
        )(*fwd_in)
    else:
        # energy as a parallel XLA pass, DP on the precomputed total energy
        from ..core.energy import energy_from_plane
        from ..core.state import INF
        lane2 = jnp.arange(Wb, dtype=jnp.int32)[None, :]
        e_tot = energy_from_plane(cur_b, w, nrg)
        if has_bias:
            e_tot = jnp.where(lane2 < w, e_tot + cur_bias, INF)
        rig3 = (cur_rig if cur_rig is not None
                else jnp.zeros((1, Wb), jnp.float32)).reshape(-1, f, L)
        rig_spec = (blk if has_rig
                    else pl.BlockSpec((1, f, L), lambda i: (0, 0, 0)))
        m_last, bp = pl.pallas_call(
            functools.partial(_dpf_kernel, BR=BR, delta_x=delta_x,
                              has_rig=has_rig, H=H, f=f, L=L, CH=ch),
            grid=(n,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                      blk, rig_spec],
            out_specs=(pl.BlockSpec((f, L), lambda i: (0, 0)), blk),
            scratch_shapes=[pltpu.VMEM((f, L), jnp.float32)],
            out_shape=(jax.ShapeDtypeStruct((f, L), jnp.float32),
                       jax.ShapeDtypeStruct((H, f, L), _BP_DT)),
            interpret=_interpret(),
        )(sc[:, 0:1], e_tot.reshape(H, f, L), rig3)

    use_btw = delta_x == 1 and _BT_WEDGE and ch % _BT_KW == 0
    bwd_in = [sc, m_last, bp, b3]
    bwd_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec((f, L), lambda i: (0, 0)),
        blk_rev,
        blk_rev,
    ]
    rec_spec = (pl.BlockSpec((BR, L), lambda i: (n - 1 - i, 0)) if use_btw
                else pl.BlockSpec((BR, 128), lambda i: (n - 1 - i, 0)))
    rec_shape = (jax.ShapeDtypeStruct((H, L), jnp.int32) if use_btw
                 else jax.ShapeDtypeStruct((H, 128), jnp.int32))
    out_specs = [rec_spec, blk_rev]
    out_shape = [rec_shape,
                 jax.ShapeDtypeStruct((H, f, L), jnp.float32)]
    if has_bias:
        bwd_in.append(cur_bias.reshape(H, f, L))
        bwd_specs.append(blk_rev)
        out_specs.append(blk_rev)
        out_shape.append(jax.ShapeDtypeStruct((H, f, L), jnp.float32))
    if has_rig:
        bwd_in.append(cur_rig.reshape(H, f, L))
        bwd_specs.append(blk_rev)
        out_specs.append(blk_rev)
        out_shape.append(jax.ShapeDtypeStruct((H, f, L), jnp.float32))

    if use_btw:
        kernel = functools.partial(_btwc_kernel, BR=BR, has_bias=has_bias,
                                   has_rig=has_rig, f=f, L=L, KW=_BT_KW,
                                   CH=ch)
        scratch = [pltpu.VMEM((f, L), jnp.int32),
                   pltpu.VMEM((f, L), jnp.int32)]
    else:
        kernel = functools.partial(_btcf_kernel, BR=BR, delta_x=delta_x,
                                   has_bias=has_bias, has_rig=has_rig,
                                   f=f, L=L)
        scratch = [pltpu.VMEM((f, L), jnp.int32)]

    outs = pl.pallas_call(
        kernel,
        grid=(n,),
        in_specs=bwd_specs,
        out_specs=tuple(out_specs),
        scratch_shapes=scratch,
        out_shape=tuple(out_shape),
        interpret=_interpret(),
    )(*bwd_in)

    seam = (jnp.sum(outs[0], axis=1, dtype=jnp.int32) - 1 if use_btw
            else outs[0][:, 0])
    b_out = outs[1].reshape(H, Wb)
    k = 2
    bias_out = cur_bias
    rig_out = cur_rig
    if has_bias:
        bias_out = outs[k].reshape(H, Wb)
        k += 1
    if has_rig:
        rig_out = outs[k].reshape(H, Wb)
    return seam, b_out, bias_out, rig_out
