"""VMEM-resident multi-seam carve kernel — the latency-floor attack.

The chunked hot path (engine._hot_chunk) launches 2 Pallas kernels + XLA
energy/compact passes PER SEAM; at small sizes the per-launch and
inter-kernel HBM round-trips dominate. This kernel carves a whole chunk of
up to KC seams in ONE ``pallas_call``:

- grid = (KC,), one sequential grid step per seam;
- every compacted plane (reader plane, bias, rigidity, column->reference
  ``posmap``) lives in VMEM scratch for the whole chunk — DMA'd in once
  from HBM at step 0 and back out at the last step
  (``input_output_aliases`` keeps HBM in place);
- per seam: a forward sweep (energy + row DP) and a backward sweep
  (seam chase + record + in-place compaction).

Latency-vs-issue design (v5e, measured round 3): the two sequential
sweeps are LATENCY-bound on their per-row dependency chains, not
issue-bound — adding the whole backpointer select tree to the row loop
costs ~nothing (it hides in the chain's stalls), while a chained
cross-lane ROLL costs ~50-70 ns and a chained min/add ~2.5 ns. The two
irreducible chains at (f, L):

  forward  — the M[y-1] -> M[y] min chain. With delta_x == 1 and no
             rigmask it runs as the roll-free WEDGE (see wedge_rows):
             all shifted copies of M ride along so the chain is
             min,min,add only; otherwise the per-row shifted min tree.
  backward — the one-hot seam chase x[y-1] = x[y] + bp[y, x[y]].

Batched per chunk: the energy stencil (+bias), the rigidity
premultiplies, the seam-record rows, and the compaction of every plane
(from the ge rows the chase emits).

The resident ``posmap`` plane (the compacted-column -> reference-column
map, liblqr's vmap bookkeeping analog, /root/reference/src/
io_functions.c:216-219) lets the kernel record every seam directly in
REFERENCE coordinates: the engine's per-chunk history commit becomes one
scatter — the former 127-step column-map composition + row sort
(~1.9 ms per 128-seam chunk at 512x384) disappears.

Numerics are bit-identical to engine._carve_once: the same f32 adds and
compares in the same elementwise order (batching a shift/stencil over rows
does not change any per-element operation, and min is order-invariant for
values).

Measured-negative experiments kept for the record (v5e, 512x384):
- precomputing the NEXT seam's energy during the backward sweep (ESCR)
  LOSES (85 vs 68 us/seam): the backward sweep is issue-bound like the
  forward one, so the moved energy ops cost more there than they save;
- packing M and b into one (2f, L) array so +-1 shifts serve both the DP
  window and the energy gradient: NEUTRAL (within noise);
- fusing the energy stencil into the sequential DP row loop (vs batching
  it per chunk off-chain): the per-row variant was the r2 design — the
  chunk-batched form in this file replaces it (see BENCH_r03).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .dp_pallas import (_shift_folded, _shift_stack, _rank_consts,
                        _interpret, _CHUNK, _CHUNK_ENV, _BT_WEDGE, _BT_KW)

# Profiling / experiment knobs, read ONCE at import (ADVICE r3 #4: a
# trace-time read inside the jitted kernel does not key the jit cache,
# so flipping them mid-process would silently run stale kernels — and
# NO_BP / NO_ENERGY intentionally produce WRONG results for perf
# decomposition). Single-shot semantics: set before importing lqr_tpu.
from .tune import TUNE
_FWD_ONLY = TUNE.resident_fwd_only
_NO_BP = TUNE.resident_no_bp
_NO_ENERGY = TUNE.resident_no_energy
_KW = TUNE.wedge_k
_USE_WEDGE = TUNE.fwd_wedge
# backward-chase wedge block size for THIS kernel: at resident fold
# sizes ((f, L) of 2-4 sublane tiles) the copy-rebuild amortization wins
# over the issue growth up to KW=4 (v5e A/B at 512x384: KW=2 36.4,
# KW=4 32.1, KW=8 37.3 us/seam), while the non-resident backtrack at
# 2048^2 prefers KW=2 (dp_pallas._BT_KW) — its (f, L) ops are 2x wider
_BT_KW_RES = TUNE.bt_kw_res

_wedge_gate_noted = False


def _note_wedge_gate_miss(CH: int):
    """One-time trace-time note when the wedge chase is requested but the
    CH/KW divisibility gate fails (ADVICE r4: LQR_DP_CHUNK and
    LQR_BT_WEDGE_K_RES are independently tunable, and a mismatch silently
    fell through to the ~40% slower generic chase loop)."""
    global _wedge_gate_noted
    if not _wedge_gate_noted:
        _wedge_gate_noted = True
        import warnings
        warnings.warn(
            f"lqr_tpu resident kernel: wedge backtrack disabled — chunk "
            f"CH={CH} is not divisible by LQR_BT_WEDGE_K_RES="
            f"{_BT_KW_RES}; falling back to the generic chase loop "
            f"(correct but slower)", RuntimeWarning, stacklevel=3)


def _chunk_res(H: int):
    """Rows per unrolled chunk for the resident kernel, or None.

    Larger chunks amortize the fori overhead further here than in the
    streamed kernels because every plane is already VMEM-resident (v5e
    devtime A/B at 512x384: CH=8 32.3, 16 29.0, 32 25.8, 64 24.4
    us/seam). LQR_DP_CHUNK (read at dp_pallas import) overrides."""
    if _interpret():
        cands = [8]          # see dp_pallas._chunk_for's interpret note
    else:
        cands = ([int(_CHUNK_ENV)] if _CHUNK_ENV else []) + [64, 32, 16, 8]
    for c in cands:
        if c <= H and H % c == 0:
            return c
    return None


def _layout(H: int, Wb: int, has_bias: bool, has_rig: bool):
    """(f, L) fold layout for the resident kernel, or None.

    Exact fold: f = Wb/128, L = 128; the DP shifts carry the out-of-range
    +inf fill select. (Measured negative, r4: a padded GUARD layout with
    f = Wb/128 + 1 — dropping that select — hit a Mosaic compile
    pathology at odd fold factors (>570 s at f=5) for a marginal
    projected win; its plumbing was removed in r5.)
    """
    if Wb % 128 != 0 or _chunk_res(H) is None:
        return None
    planes = 2 + int(has_bias) + int(has_rig)   # reader + posmap (+aux)
    f = Wb // 128
    if f < 1:
        return None
    # planes (4B) + backpointers (1B) + double-buffered record plane
    vmem = H * f * 128 * (4 * planes + 1) + 2 * H * 128 * 4
    if vmem > (14 << 20):                        # 16 MB/core - pipeline
        return None
    return f, 128


def resident_ok(H: int, Wb: int, has_bias: bool, has_rig: bool,
                nrg: int = 0) -> bool:
    """Whether the resident kernel applies: CH-divisible 128-multiple
    geometry within a ~14 MB VMEM budget (see _layout)."""
    return _layout(H, Wb, has_bias, has_rig) is not None


def _energy_stack(bst, b_up, b_dn, w, nrg: int, f: int, L: int,
                  lane, glane_row):
    """Batched energy stencil over a (CH*f, L) stack of reader-plane rows
    (same elementwise op order as core.energy.energy_from_plane /
    SPEC.md §2). b_up / b_dn: the stack shifted one ROW up / down with
    edge rows replicated (unused for the row-local nrg families)."""
    if nrg == 6:                                        # NULL
        return jnp.zeros(bst.shape, jnp.float32)
    # edge=False: the out-of-range positions (glane >= W-1 / glane == 0)
    # are inside the replicate selects' regions (w <= W), so the fill
    # select would be overwritten anyway
    br = _shift_stack(bst, 1, jnp.float32(0), f, L, lane, glane_row,
                      edge=False)
    br = jnp.where(glane_row >= w - 1, bst, br)         # replicate right edge
    bl = _shift_stack(bst, -1, jnp.float32(0), f, L, lane, glane_row,
                      edge=False)
    bl = jnp.where(glane_row == 0, bst, bl)             # replicate left edge
    gx = (br - bl) * jnp.float32(0.5)
    if nrg in (0, 3):                                   # *_XABS
        return jnp.abs(gx)
    gy = (b_dn - b_up) * jnp.float32(0.5)
    if nrg in (1, 4):                                   # *_SUMABS
        return (jnp.abs(gx) + jnp.abs(gy)) * jnp.float32(0.5)
    return jnp.sqrt(gx * gx + gy * gy)                  # *_NORM


def _kernel(*refs, KC, delta_x, has_bias, has_rig, nrg, ssf, H, f, L,
            CH):
    """Grid-stepped multi-seam kernel: grid = (KC,), one seam per step.

    A gridless variant (single invocation, dynamic fori over seams,
    double-buffered async record DMA) was measured SLOWER on v5e
    (70.6 vs 66.6 us true per-seam at 512x384): Mosaic's grid stepping
    machinery is cheaper than an scf.while iteration plus explicit DMA
    bookkeeping per seam. Kept grid-stepped."""
    it = iter(refs)
    sc_ref = next(it)                      # SMEM [1, 3]: w0, d0, kc
    b_hbm = next(it)                       # ANY  [H*f, L] f32
    bias_hbm = next(it) if has_bias else None
    rig_hbm = next(it) if has_rig else None
    pm_hbm = next(it)                      # ANY  [H*f, L] i32
    seam_ref = next(it)                    # VMEM block [1, H, L] i32
    bo_hbm = next(it)                      # ANY (aliased)
    biaso_hbm = next(it) if has_bias else None
    rigo_hbm = next(it) if has_rig else None
    pmo_hbm = next(it)                     # ANY (aliased)
    b_scr = next(it)                       # VMEM [H*f, L] f32
    bias_scr = next(it) if has_bias else None
    rig_scr = next(it) if has_rig else None
    pm_scr = next(it)                      # VMEM [H*f, L] i32
    bp_scr = next(it)                      # VMEM [H*f, L] i8
    sem = next(it)

    i = pl.program_id(0)
    w0 = sc_ref[0, 0]
    d0 = sc_ref[0, 1]
    kc = sc_ref[0, 2]
    inf = jnp.float32(jnp.inf)
    cands = _rank_consts(delta_x, H)
    by_left = sorted(cands, key=lambda c: c[1])
    by_right = sorted(cands, key=lambda c: c[2])
    NC = H // CH
    fwd_only = _FWD_ONLY
    # perf-decomposition knobs (WRONG RESULTS — profiling only)
    no_bp = _NO_BP
    no_energy = _NO_ENERGY
    # wedge fwd sweep (see wedge_rows; default ON where it applies —
    # measured 34.4 -> 15.7 us/seam fwd at 512x384); KW rows per block
    KW = _KW
    use_wedge = _USE_WEDGE and delta_x == 1 and CH % KW == 0

    # loop-constant index maps: per-row geometry for single rows (f, L)
    # and for CH-row stacks (CH*f, L)
    lane = jax.lax.broadcasted_iota(jnp.int32, (f, L), 1)
    sub = jax.lax.broadcasted_iota(jnp.int32, (f, L), 0)
    glane = sub * L + lane
    laneS = jax.lax.broadcasted_iota(jnp.int32, (CH * f, L), 1)
    subS = jax.lax.broadcasted_iota(jnp.int32, (CH * f, L), 0)
    glaneS = (subS % f) * L + laneS
    W = f * L

    @pl.when(i == 0)
    def _():
        for src, dst in ((b_hbm, b_scr), (bias_hbm, bias_scr),
                         (rig_hbm, rig_scr), (pm_hbm, pm_scr)):
            if src is not None:
                cp = pltpu.make_async_copy(src, dst, sem)
                cp.start()
                cp.wait()

    def wedge_rows(e_tot, rig_st, M_in, pref_left, first_chunk: bool):
        """CH rows of DP via KW-row WEDGES — the roll-free chain.

        Measured on v5e: a chained cross-lane roll costs ~50-70 ns of
        latency while a chained min/add costs ~2.5 ns, and the row loop
        is latency-bound. So instead of shifting M by +-1 every row
        (rolls on the chain), maintain ALL shifted copies
        S_d = shift_d(M) for the block: the per-row update
          S'_d = shift_d(e) + min(S_{d-1}, S_d, S_{d+1})
        has only min,min,add on the dependency chain; every roll touches
        e (off-chain) or the once-per-block boundary rebuild. Bit-exact:
        shift_d distributes elementwise over min and +, so S_d stays
        bitwise equal to shift_d of the sequential row, and the center
        states feed the same backpointer eqs as the per-row path.
        The band shrinks by 1 per row (only |d| <= KW-1-j matter), so a
        KW-block costs KW^2-ish extra e-shift issue — cheap vs the
        removed roll latency. Requires delta_x == 1.

        Rigidity (r5): the rig term is ROW-LOCAL (off-chain) and
        distributes exactly over shifts — shift_d(P[dx] + rt) =
        P[d+dx] + shift_d(rt) — so masked configs keep the min,min,add
        chain (same algebra as dp_pallas's streamed wedge)."""
        rigc1 = cands[1][3]
        bps = []
        M_prev = M_in
        nblk = CH // KW
        for blk in range(nblk):
            first_blk = first_chunk and blk == 0
            if not first_blk:
                P = {d: _shift_folded(M_prev, d, inf, f, L)
                     for d in range(-KW, KW + 1)}
            for jj in range(KW):
                j = blk * KW + jj
                e_row = jax.lax.slice_in_dim(e_tot, j * f, (j + 1) * f,
                                             axis=0)
                band = KW - 1 - jj
                if first_blk and jj == 0:  # global row 0: M_0 = e_0
                    P = {d: _shift_folded(e_row, d, inf, f, L)
                         for d in range(-band, band + 1)}
                    bps.append(jnp.zeros((f, L), jnp.int32))
                    continue
                newP = {}
                if has_rig:
                    rt = jax.lax.slice_in_dim(
                        rig_st, j * f, (j + 1) * f, axis=0) * rigc1
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
                              jnp.where(eqm, jnp.int32(-1), jnp.int32(1)),
                              jnp.where(eqp, jnp.int32(1),
                                        jnp.int32(-1))))
                bps.append(bp)
                newP[0] = e_row + best
                for d in range(-band, band + 1):
                    if d == 0:
                        continue
                    e_sh = _shift_folded(e_row, d, inf, f, L)
                    if has_rig:
                        # fill 0: edge lanes are dominated by P's inf
                        rt_sh = _shift_folded(rt, d, jnp.float32(0), f, L)
                        newP[d] = e_sh + jnp.minimum(
                            jnp.minimum(P[d], P[d - 1] + rt_sh),
                            P[d + 1] + rt_sh)
                    else:
                        newP[d] = e_sh + jnp.minimum(
                            jnp.minimum(P[d], P[d - 1]), P[d + 1])
                P = newP
            M_prev = P[0]
        return M_prev, bps

    def fwd_chunk(base_v, M_in, prev_last, w, pref_left,
                  first_chunk: bool):
        """Forward-process CH rows starting at vector row base_v (= row
        index * f): energy batched at (CH*f, L) full-vreg occupancy, then
        the sequential DP VALUE chain row by row (plain min tree + add —
        the irreducible per-row ops), then the backpointers derived
        BATCHED per chunk from the stored M rows: rank-ordered first
        equality against the recomputed min reproduces a take-chain's
        tie-breaks exactly, at 1/CH the issue cost of in-loop
        derivation. Returns (M_last, last plane row of the chunk)."""
        bst = b_scr[pl.ds(base_v, CH * f)]
        if nrg in (1, 2, 4, 5):            # gy-dependent energies
            b_up = jnp.concatenate([prev_last, bst[:-f]], axis=0)
            nb = jnp.minimum(base_v + CH * f, (H - 1) * f)
            nxt = b_scr[pl.ds(nb, f)]
            b_dn = jnp.concatenate([bst[f:], nxt], axis=0)
        else:
            b_up = b_dn = None
        if no_energy:                      # profiling knob: skip stencil
            e = bst
        else:
            e = _energy_stack(bst, b_up, b_dn, w, nrg, f, L, laneS,
                              glaneS)
        if has_bias:
            e = e + bias_scr[pl.ds(base_v, CH * f)]
        e_tot = jnp.where(glaneS < w, e, inf)
        if has_rig:
            rig_st = rig_scr[pl.ds(base_v, CH * f)]
        else:
            rig_st = None

        # Per-row DP: value chain + backpointers.
        #
        # The sweep is LATENCY-bound, not issue-bound (measured: adding
        # the full bp select tree to the loop costs ~nothing — it hides
        # in the value chain's stalls; batching the bp derivation per
        # chunk was even SLOWER, +2.4 us/seam). So the optimization
        # target is the DEPENDENT-op depth per row. The +-1 shifted
        # candidates are built from PRE-ROTATED, PRE-EDGE-MASKED copies
        # of M (Mu = M[s+1] view with +inf planted at the out-of-range
        # wrap slot, Md = M[s-1] view likewise) that are computed OFF
        # the chain in the previous row's stall shadow. Chain per row:
        # pre-select(1) -> lane-roll(2) -> min(3) -> min(4) -> +e(5),
        # vs 7 for the naive shift (sub-roll, select, roll, edge-fill
        # before the mins even start).
        if use_wedge:
            M_prev, bps = wedge_rows(e_tot, rig_st, M_in, pref_left,
                                     first_chunk)
            bp_scr[pl.ds(base_v, CH * f)] = \
                jnp.concatenate(bps, axis=0).astype(jnp.int8)
            return M_prev, bst[(CH - 1) * f:]

        M_prev = M_in
        # rotated+masked views of M_in (off-chain for the first row)
        up_m = (sub == f - 1) & (lane < delta_x)      # wrap slots, d > 0
        dn_m = (sub == 0) & (lane >= L - delta_x)     # wrap slots, d < 0
        Mu_prev = jnp.where(up_m, inf,
                            pltpu.roll(M_in, (f - 1) % f, axis=0))
        Md_prev = jnp.where(dn_m, inf,
                            pltpu.roll(M_in, 1 % f, axis=0))
        bps = []
        for j in range(CH):
            e_row = jax.lax.slice_in_dim(e_tot, j * f, (j + 1) * f, axis=0)
            if first_chunk and j == 0:     # global row 0: no predecessor
                M_row = e_row
                bps.append(jnp.zeros((f, L), jnp.int32))
            else:
                if has_rig:
                    rr = jax.lax.slice_in_dim(rig_st, j * f, (j + 1) * f,
                                              axis=0)
                shifted = {}
                best = None
                for dx, _, _, rigc in cands:
                    if dx == 0:
                        c = M_prev
                    elif dx > 0:
                        pre = jnp.where(lane < dx, Mu_prev, M_prev)
                        c = pltpu.roll(pre, (-dx) % L, axis=1)
                    else:
                        pre = jnp.where(lane >= L + dx, Md_prev, M_prev)
                        c = pltpu.roll(pre, -dx, axis=1)
                    if has_rig and dx != 0:
                        c = c + rr * rigc
                    shifted[dx] = c
                    best = c if best is None else jnp.minimum(best, c)
                if no_bp:                  # profiling knob: value chain
                    # garbage bp DERIVED from best so the value chain
                    # stays live under DCE
                    bp = best.astype(jnp.int32)
                else:
                    eqs = {dx: shifted[dx] == best
                           for dx, _, _, _ in cands}
                    if delta_x == 1:
                        # shared-eq0 form of the same rank chains:
                        # by_left = [0,-1,+1], by_right = [0,+1,-1]
                        bp = jnp.where(
                            eqs[0], jnp.int32(0),
                            jnp.where(pref_left,
                                      jnp.where(eqs[-1], jnp.int32(-1),
                                                jnp.int32(1)),
                                      jnp.where(eqs[1], jnp.int32(1),
                                                jnp.int32(-1))))
                    else:
                        def nested(order):
                            bp = jnp.full((f, L),
                                          jnp.int32(order[-1][0]))
                            for dx, _, _, _ in reversed(order[:-1]):
                                bp = jnp.where(eqs[dx], jnp.int32(dx),
                                               bp)
                            return bp
                        bp = jnp.where(pref_left, nested(by_left),
                                       nested(by_right))
                M_row = e_row + best
                bps.append(bp)
            M_prev = M_row
            if j < CH - 1:                 # off-chain: next row's views
                Mu_prev = jnp.where(up_m, inf,
                                    pltpu.roll(M_row, (f - 1) % f,
                                               axis=0))
                Md_prev = jnp.where(dn_m, inf,
                                    pltpu.roll(M_row, 1 % f, axis=0))
        bp_scr[pl.ds(base_v, CH * f)] = \
            jnp.concatenate(bps, axis=0).astype(jnp.int8)
        return M_prev, bst[(CH - 1) * f:]

    def seam_body():
        w = w0 - i                         # current compacted width
        s_idx = d0 + i + 1                 # global 1-based seam index
        if ssf > 0:
            pref_left = (((s_idx - 1) // ssf) % 2) == 0
        else:
            pref_left = jnp.bool_(True)

        # ---- forward: chunk 0 peeled (static first_chunk=True)
        M0, last0 = fwd_chunk(0, jnp.zeros((f, L), jnp.float32),
                              b_scr[0:f], w, pref_left, first_chunk=True)

        def fwd_loop(k, carry):
            M_in, prev_last = carry
            base_v = pl.multiple_of(k * CH * f, CH * f)
            return fwd_chunk(base_v, M_in, prev_last, w, pref_left,
                             first_chunk=False)

        M_last, _ = jax.lax.fori_loop(1, NC, fwd_loop, (M0, last0))

        # ---- start position: argmin of the last row, side-tie rule
        mmin = jnp.min(M_last)
        eq = M_last == mmin
        left_x = jnp.min(jnp.where(eq, glane, W))
        right_x = jnp.max(jnp.where(eq, glane, -1))
        x0 = jnp.where(pref_left, left_x, right_x)
        oh0 = (glane == x0).astype(jnp.int32)
        ge0 = (glane >= x0).astype(jnp.int32)   # i32: bool carries don't
        # legalize through Mosaic's scf.for lowering

        if fwd_only:                       # perf debug knob
            seam_ref[0, :, :] = jnp.zeros((H, L), jnp.int32)
            return

        # ---- backward: chase the seam (sequential one-hot walk), record
        # in REFERENCE coordinates via the resident posmap, and compact
        # every plane in place. The >=seam compaction mask ``ge`` rides the
        # chase incrementally: moving the seam by d just clears/sets the
        # columns between old and new positions — O(delta_x^2) cheap ops
        # instead of a log-width broadcast per row.
        #
        # Compaction does NOT zero the vacated column x >= w-1: values at
        # x >= current width are never read (the energy width mask, the
        # +inf DP guard and the in-range seam walk all exclude them), so
        # the scan-path contract (zeros there) is restored by one batched
        # zeroing pass at the end of the kernel instead of a select per
        # row per plane per seam.
        def _bwd_tail(base, base_v, recs, ges, pm_ch, oh, ge):
            """Store the chunk's records; compact every plane from the
            collected ge rows — one (CH*f, L) shift+select per plane
            (values at x >= current width are garbage either way; the
            final-grid-step zeroing pass restores the contract)."""
            seam_ref[0, pl.ds(base, CH), :] = \
                jnp.concatenate(recs, axis=0)
            ge_st = jnp.concatenate(ges, axis=0) != 0
            sl = pl.ds(base_v, CH * f)

            def compact_st(a_st, fill):
                return jnp.where(
                    ge_st, _shift_stack(a_st, 1, fill, f, L, laneS,
                                        glaneS, edge=False), a_st)

            b_scr[sl] = compact_st(b_scr[sl], jnp.float32(0))
            pm_scr[sl] = compact_st(pm_ch, jnp.int32(0))
            if has_bias:
                bias_scr[sl] = compact_st(bias_scr[sl], jnp.float32(0))
            if has_rig:
                rig_scr[sl] = compact_st(rig_scr[sl], jnp.float32(0))
            return (oh, ge)

        def bwd_chunk(k, carry):
            oh, ge = carry
            base = pl.multiple_of(H - (k + 1) * CH, CH)
            base_v = pl.multiple_of(base * f, CH * f)
            bp_ch = bp_scr[pl.ds(base_v, CH * f)].astype(jnp.int32)
            pm_ch = pm_scr[pl.ds(base_v, CH * f)]
            pm1_ch = pm_ch + 1                     # batched once per chunk

            def row_of(st, j):
                return jax.lax.slice_in_dim(st, j * f, (j + 1) * f, axis=0)

            recs = [None] * CH
            ges = [None] * CH
            if delta_x == 1 and _BT_WEDGE and CH % _BT_KW_RES != 0:
                _note_wedge_gate_miss(CH)
            if delta_x == 1 and _BT_WEDGE and CH % _BT_KW_RES == 0:
                # roll-free WEDGE chase (the r4 law of
                # dp_pallas._btw_kernel, ported here because this chase's
                # per-row chain carried two chained cross-lane rolls —
                # the binding latency at resident sizes): shifted one-hot
                # copies P_e = shift_e(oh) update each row with products
                # of shifted backpointer masks (mul,add,add on the
                # chain), rebuilt from oh once per KW rows; the ge mask
                # and the posmap record ride the same products. Exact by
                # the cyclic-permutation algebra (see _btw_kernel).
                cst = {d: (bp_ch == -d).astype(jnp.int32)
                       for d in (-1, 0, 1)}
                zero = jnp.int32(0)
                KWb = _BT_KW_RES
                for blk in range(CH // KWb - 1, -1, -1):
                    P = {e: (_shift_folded(oh, e, zero, f, L, edge=False)
                             if e else oh) for e in range(-KWb, KWb + 1)}
                    for step in range(KWb):
                        j = blk * KWb + KWb - 1 - step
                        recs[j] = jnp.sum(P[0] * row_of(pm1_ch, j),
                                          axis=0, keepdims=True)
                        ges[j] = ge
                        mt = {}

                        def m_of(d, t, j=j, mt=mt):
                            if (d, t) not in mt:
                                mt[(d, t)] = (
                                    _shift_folded(row_of(cst[d], j), t,
                                                  zero, f, L, edge=False)
                                    if t else row_of(cst[d], j))
                            return mt[(d, t)]

                        newP = {}
                        for e in range(-(KWb - 1 - step), KWb - step):
                            acc = None
                            for d in (-1, 0, 1):
                                term = P[e + d] * m_of(d, e + d)
                                acc = term if acc is None else acc + term
                            newP[e] = acc
                        # seam moved right (bp == +1 = cst[-1]) uncovers
                        # its old column; moved left (cst[+1]) covers new
                        ge = ge - P[0] * m_of(-1, 0) + P[1] * m_of(1, 1)
                        P = newP
                    oh = P[0]
                return _bwd_tail(base, base_v, recs, ges, pm_ch, oh, ge)

            for j in range(CH - 1, -1, -1):
                # record: fold-reduce the one-hot against the posmap to a
                # [1, L] row whose single nonzero is (ref column + 1)
                recs[j] = jnp.sum(oh * row_of(pm1_ch, j), axis=0,
                                  keepdims=True)
                ges[j] = ge                        # ge mask of row j
                bp_row = row_of(bp_ch, j)
                nxt = oh * (bp_row == 0).astype(jnp.int32)
                m_pos = []
                for d in range(1, delta_x + 1):
                    # edge=False: a spurious wrap would need a backpointer
                    # crossing the +inf guard band — impossible
                    mn = oh * (bp_row == -d).astype(jnp.int32)
                    mp = oh * (bp_row == d).astype(jnp.int32)
                    m_pos.append(mp)
                    nxt = nxt + _shift_folded(mn, d, jnp.int32(0), f, L,
                                              edge=False)
                    nxt = nxt + _shift_folded(mp, -d, jnp.int32(0), f, L,
                                              edge=False)
                # ge update: remove columns [s, s_prev) when the seam moved
                # right (d > 0); adding shifts of oh_prev covers
                # [s_prev, s_prev + delta_x), a superset of the newly
                # uncovered [s_prev, s) and otherwise redundant
                rm = jnp.zeros((f, L), jnp.int32)
                for d in range(1, delta_x + 1):
                    for j2 in range(d):
                        t = (m_pos[d - 1] if j2 == 0 else
                             _shift_folded(m_pos[d - 1], -j2, jnp.int32(0),
                                           f, L))
                        rm = rm + t
                add = nxt
                for j2 in range(1, delta_x):
                    add = add + _shift_folded(nxt, -j2, jnp.int32(0), f, L)
                ge = jnp.where(rm != 0, jnp.int32(0), ge)
                ge = jnp.where(add != 0, jnp.int32(1), ge)
                oh = nxt

            return _bwd_tail(base, base_v, recs, ges, pm_ch, oh, ge)

        jax.lax.fori_loop(0, NC, bwd_chunk, (oh0, ge0))

    @pl.when(i < kc)
    def _():
        seam_body()

    # at the last grid step: restore the scan-path contract (zeros at
    # x >= final width — per-seam compaction skips that select), then
    # write the planes back once
    @pl.when(i == KC - 1)
    def _():
        w_final = w0 - kc

        def zero_chunk(k, _):
            base_v = pl.multiple_of(k * CH * f, CH * f)
            keep = glaneS < w_final
            sl = pl.ds(base_v, CH * f)
            b_scr[sl] = jnp.where(keep, b_scr[sl], jnp.float32(0))
            pm_scr[sl] = jnp.where(keep, pm_scr[sl], jnp.int32(0))
            if has_bias:
                bias_scr[sl] = jnp.where(keep, bias_scr[sl],
                                         jnp.float32(0))
            if has_rig:
                rig_scr[sl] = jnp.where(keep, rig_scr[sl], jnp.float32(0))
            return 0

        jax.lax.fori_loop(0, NC, zero_chunk, 0)
        for src, dst in ((b_scr, bo_hbm), (bias_scr, biaso_hbm),
                         (rig_scr, rigo_hbm), (pm_scr, pmo_hbm)):
            if dst is not None:
                cp = pltpu.make_async_copy(src, dst, sem)
                cp.start()
                cp.wait()


@functools.partial(jax.jit, static_argnames=("delta_x", "has_bias",
                                             "has_rig", "nrg", "ssf", "KC"))
def carve_chunk_resident(cur_b, cur_bias, cur_rig, posmap, w0, d0, kc,
                         delta_x: int, has_bias: bool, has_rig: bool,
                         nrg: int, ssf: int, KC: int):
    """Carve up to KC seams VMEM-resident.

    cur_b/[cur_bias]/[cur_rig]: [H, Wb] f32 compacted planes; posmap:
    [H, Wb] i32 compacted-column -> reference-column map; w0 = current
    width (traced); d0 = current depth (traced); kc = seams to carve
    (traced, <= KC; grid steps past kc are skipped). Returns
    (hist [KC, H] i32 — REFERENCE-coordinate seam columns, rows >= kc
    garbage; cur_b'; cur_bias'; cur_rig'; posmap'). Caller gates on
    resident_ok.
    """
    H, Wb = cur_b.shape
    f, L = _layout(H, Wb, has_bias, has_rig)
    assert f * L == Wb, (f, L, Wb)    # _layout only folds exact multiples
    sc = jnp.stack([jnp.asarray(w0, jnp.int32), jnp.asarray(d0, jnp.int32),
                    jnp.asarray(kc, jnp.int32)]).reshape(1, 3)

    ins = [sc, cur_b.reshape(H * f, L)]
    in_specs = [pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pl.ANY)]
    out_specs = [pl.BlockSpec((1, H, L), lambda i: (i, 0, 0)),
                 pl.BlockSpec(memory_space=pl.ANY)]
    out_shape = [jax.ShapeDtypeStruct((KC, H, L), jnp.int32),
                 jax.ShapeDtypeStruct((H * f, L), jnp.float32)]
    aliases = {1: 1}
    scratch = [pltpu.VMEM((H * f, L), jnp.float32)]
    if has_bias:
        ins.append(cur_bias.reshape(H * f, L))
        in_specs.append(pl.BlockSpec(memory_space=pl.ANY))
        out_specs.append(pl.BlockSpec(memory_space=pl.ANY))
        out_shape.append(jax.ShapeDtypeStruct((H * f, L), jnp.float32))
        aliases[len(ins) - 1] = len(out_shape) - 1
        scratch.append(pltpu.VMEM((H * f, L), jnp.float32))
    if has_rig:
        ins.append(cur_rig.reshape(H * f, L))
        in_specs.append(pl.BlockSpec(memory_space=pl.ANY))
        out_specs.append(pl.BlockSpec(memory_space=pl.ANY))
        out_shape.append(jax.ShapeDtypeStruct((H * f, L), jnp.float32))
        aliases[len(ins) - 1] = len(out_shape) - 1
        scratch.append(pltpu.VMEM((H * f, L), jnp.float32))
    ins.append(posmap.reshape(H * f, L))
    in_specs.append(pl.BlockSpec(memory_space=pl.ANY))
    out_specs.append(pl.BlockSpec(memory_space=pl.ANY))
    out_shape.append(jax.ShapeDtypeStruct((H * f, L), jnp.int32))
    aliases[len(ins) - 1] = len(out_shape) - 1
    scratch.append(pltpu.VMEM((H * f, L), jnp.int32))
    scratch.append(pltpu.VMEM((H * f, L), jnp.int8))
    scratch.append(pltpu.SemaphoreType.DMA)

    outs = pl.pallas_call(
        functools.partial(_kernel, KC=KC, delta_x=delta_x,
                          has_bias=has_bias, has_rig=has_rig, nrg=nrg,
                          ssf=ssf, H=H, f=f, L=L,
                          CH=_chunk_res(H)),
        grid=(KC,),
        in_specs=in_specs,
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shape),
        scratch_shapes=scratch,
        input_output_aliases=aliases,
        interpret=_interpret(),
    )(*ins)

    # seam rows were recorded fold-reduced: one nonzero = ref column + 1
    hist = jnp.sum(outs[0], axis=2, dtype=jnp.int32) - 1

    def unfold(o):
        return o.reshape(H, Wb)

    b_out = unfold(outs[1])
    k = 2
    bias_out = cur_bias
    rig_out = cur_rig
    if has_bias:
        bias_out = unfold(outs[k])
        k += 1
    if has_rig:
        rig_out = unfold(outs[k])
        k += 1
    pm_out = unfold(outs[k])
    return hist, b_out, bias_out, rig_out, pm_out
