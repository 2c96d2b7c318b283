"""VMEM-resident multi-seam carve kernel — the latency-floor attack.

The chunked hot path (engine._hot_chunk) launches 2 Pallas kernels + XLA
energy/compact passes PER SEAM; at small sizes the per-launch and
inter-kernel HBM round-trips dominate (VERDICT r1 "next" #3: 512x384 was
~126 us/seam of which the row DP is only ~30 us). This kernel carves a
whole chunk of up to KC seams in ONE ``pallas_call``:

- grid = (KC,), one sequential grid step per seam;
- every compacted plane (reader plane, bias, rigidity) lives in VMEM
  scratch for the whole chunk — DMA'd in once from HBM at step 0 and back
  out at the last step (``input_output_aliases`` keeps HBM in place);
- per seam: energy rows computed on the fly from the resident reader
  plane, the forward DP runs with a PLAIN-MIN value chain (the tie-rank
  bookkeeping is moved OFF the critical M[y-1] -> M[y] dependency chain:
  backpointers are derived by rank-ordered equality against the min, which
  depends on the same values but feeds nothing downstream), and one
  reverse sweep walks the seam, records it, and compacts the planes
  in place.

Numerics are bit-identical to engine._carve_once: the same f32 adds and
compares in the same order (min is order-invariant for the values, and
rank-ordered equality reproduces the take-chain's tie-breaks exactly).

Seam rows are emitted fold-reduced into a [KC, H, L] i32 output (one
nonzero per row = column index + 1; a full-width index broadcast would
cost ~18 rolls per row, a scalar store ~0.5 us); the caller sum-reduces
the lane dim to the [KC, H] history that engine._commit_hist consumes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .dp_pallas import (_fold_factor, _is_pow2, _shift_folded, _rank_consts,
                        _energy_row_folded, _interpret, _CHUNK)


def _use_escr(nrg: int) -> bool:
    """Precompute the NEXT seam's energy during the backward sweep
    (possible for the row-local x-gradient/null families) and have the
    forward sweep read it from VMEM.

    Measured on v5e: LOSES (85 vs 68 us/seam at 512x384) — the backward
    sweep is issue-bound like the forward one, so the moved energy ops
    cost more there (plus an extra plane of VMEM traffic) than they save.
    Kept behind LQR_RESIDENT_ESCR=1 for future hardware where the chase
    chain's latency dominates the backward sweep."""
    import os
    return (os.environ.get("LQR_RESIDENT_ESCR") == "1"
            and nrg in (0, 3, 6))


def resident_ok(H: int, Wb: int, has_bias: bool, has_rig: bool,
                nrg: int = 0) -> bool:
    """Whether the resident kernel applies: folded rows with pow-2 lane
    groups, CH-divisible height, and all planes + backpointers within a
    ~14 MB VMEM budget (16 MB/core minus pipeline buffers)."""
    f = _fold_factor(Wb)
    if f <= 1 or not _is_pow2(Wb // f):
        return False
    if H % _CHUNK != 0:
        return False
    planes = 1 + int(has_bias) + int(has_rig) + int(_use_escr(nrg))
    vmem = H * Wb * (4 * planes + 1) + 2 * H * 128 * 4
    return vmem <= (14 << 20)


def _kernel(*refs, KC, BRH, delta_x, has_bias, has_rig, nrg, ssf, H, f, L):
    it = iter(refs)
    sc_ref = next(it)                      # SMEM [1, 3]: w0, d0, kc
    b_hbm = next(it)                       # ANY  [H, f, L] f32
    bias_hbm = next(it) if has_bias else None
    rig_hbm = next(it) if has_rig else None
    seam_ref = next(it)                    # VMEM block [1, H, 128] i32
    bo_hbm = next(it)                      # ANY  [H, f, L] f32 (aliased)
    biaso_hbm = next(it) if has_bias else None
    rigo_hbm = next(it) if has_rig else None
    b_scr = next(it)                       # VMEM [H, f, L] f32
    bias_scr = next(it) if has_bias else None
    rig_scr = next(it) if has_rig else None
    use_e = _use_escr(nrg)
    e_scr = next(it) if use_e else None    # VMEM [H, f, L] f32 (energy+bias)
    bp_scr = next(it)                      # VMEM [H, f, L] i8
    sem = next(it)

    i = pl.program_id(0)
    w0 = sc_ref[0, 0]
    d0 = sc_ref[0, 1]
    kc = sc_ref[0, 2]
    inf = jnp.float32(jnp.inf)
    cands = _rank_consts(delta_x, H)
    by_left = sorted(cands, key=lambda c: c[1])
    by_right = sorted(cands, key=lambda c: c[2])
    lane = jax.lax.broadcasted_iota(jnp.int32, (f, L), 1)
    sub = jax.lax.broadcasted_iota(jnp.int32, (f, L), 0)
    glane = sub * L + lane
    W = f * L
    CH = _CHUNK

    @pl.when(i == 0)
    def _():
        for src, dst in ((b_hbm, b_scr), (bias_hbm, bias_scr),
                         (rig_hbm, rig_scr)):
            if src is not None:
                cp = pltpu.make_async_copy(src, dst, sem)
                cp.start()
                cp.wait()

    s_idx = d0 + i + 1                     # global 1-based seam index
    w = w0 - i                             # current compacted width
    if ssf > 0:
        pref_left = (((s_idx - 1) // ssf) % 2) == 0
    else:
        pref_left = jnp.bool_(True)

    def shifted_cands(M_prev, rig_row):
        out = []
        for dx, rl, rr, rigc in cands:
            c = _shift_folded(M_prev, dx, inf, f, L)
            if has_rig and dx != 0:
                c = c + rig_row * rigc
            out.append((dx, rl, rr, c))
        return out

    # NOTE perf provenance (v5e measurements, 512x384, 400-seam slope):
    # - packing M and b into one (2f, L) array so +-1 shifts serve both
    #   the DP window and the energy gradient: NEUTRAL (77.5 vs 76 us,
    #   within noise) — rejected as unjustified complexity;
    # - precomputing the next seam's energy in the backward sweep: LOSES
    #   (see _use_escr). The residual per-seam cost is per-op issue at
    #   half-vreg (f, L) shapes across ~2H sequential rows; the next
    #   structural lever would be a bit-exactness-preserving multi-row
    #   composition of the backward chase.

    def dp_row(M_prev, e_tot, rig_row, first=False):
        """first=True (static): global row 0, no predecessor (peeled so
        the common row never pays a select on the M value chain)."""
        if first:
            return e_tot, jnp.zeros((f, L), jnp.int32)
        cs = shifted_cands(M_prev, rig_row)
        shifted = {dx: c for dx, _, _, c in cs}
        # value chain: plain min tree (tie-ranks don't affect values)
        best = cs[0][3]
        for _, _, _, c in cs[1:]:
            best = jnp.minimum(best, c)
        M_row = e_tot + best
        # backpointers: rank-ordered first equality vs the min — same
        # choices as a take-chain, but OFF the M dependency chain. One
        # shared equality set, then a reverse-nested select per side.
        eqs = {dx: shifted[dx] == best for dx, _, _, _ in cs}

        def nested(order):
            bp = jnp.full((f, L), jnp.int32(order[-1][0]))
            for dx, _, _, _ in reversed(order[:-1]):
                bp = jnp.where(eqs[dx], jnp.int32(dx), bp)
            return bp
        return M_row, jnp.where(pref_left, nested(by_left),
                                nested(by_right))

    def _carve(read_e: bool):
        # ---- forward: energy read from e_scr (precomputed by the
        # previous seam's backward sweep) or computed on the fly; M values
        # only on the chain, bp off-chain
        def fwd_rows(base, M_prev, b_prev, bch, bias_ch, rig_ch, e_ch,
                     nxt_row, first_chunk: bool):
            bps = []
            for j in range(CH):
                r = base + j
                first = first_chunk and j == 0
                if read_e:
                    e = e_ch[j]
                else:
                    b_row = bch[j]
                    if first:
                        b_up = b_row                    # top edge replicate
                    else:
                        b_up = b_prev if j == 0 else bch[j - 1]
                    b_dn_raw = bch[j + 1] if j + 1 < CH else nxt_row
                    b_dn = jnp.where(r == H - 1, b_row, b_dn_raw)
                    e = _energy_row_folded(b_row, b_up, b_dn, w, glane,
                                           nrg, f, L)
                    if has_bias:
                        e = e + bias_ch[j]
                e_tot = jnp.where(glane < w, e, inf)
                M_prev, bp = dp_row(M_prev, e_tot,
                                    rig_ch[j] if has_rig else None,
                                    first=first)
                bps.append(bp)
            return M_prev, jnp.stack(bps).astype(jnp.int8)

        def fwd_chunk(k, carry):
            M_prev, b_prev = carry
            base = k * CH
            if read_e:
                bch = None
                e_ch = e_scr[pl.ds(base, CH)]
                nxt_row = b_prev
            else:
                bch = b_scr[pl.ds(base, CH)]
                e_ch = None
                nbase = jnp.minimum(base + CH, H - 1)
                nxt_row = b_scr[pl.ds(nbase, 1)][0]
            bias_ch = (bias_scr[pl.ds(base, CH)]
                       if (has_bias and not read_e) else None)
            rig_ch = rig_scr[pl.ds(base, CH)] if has_rig else None
            M_prev, bps = fwd_rows(base, M_prev, b_prev, bch, bias_ch,
                                   rig_ch, e_ch, nxt_row,
                                   first_chunk=False)
            bp_scr[pl.ds(base, CH)] = bps
            return (M_prev, b_prev if read_e else bch[CH - 1])

        # chunk 0 peeled (static first_chunk=True: row 0 pays no selects)
        if read_e:
            bch0 = None
            e_ch0 = e_scr[0:CH]
            nxt0 = jnp.zeros((f, L), jnp.float32)
            bias0 = None
        else:
            bch0 = b_scr[0:CH]
            e_ch0 = None
            nxt0 = b_scr[CH:CH + 1][0] if H > CH else b_scr[H - 1:H][0]
            bias0 = bias_scr[0:CH] if has_bias else None
        rig0 = rig_scr[0:CH] if has_rig else None
        M0, bps0 = fwd_rows(0, None, None, bch0, bias0, rig0, e_ch0, nxt0,
                            first_chunk=True)
        bp_scr[0:CH] = bps0

        M_last, _ = jax.lax.fori_loop(
            1, H // CH, fwd_chunk,
            (M0, nxt0 if read_e else bch0[CH - 1]))

        # ---- start position: argmin of the last row, side-tie rule
        mmin = jnp.min(M_last)
        eq = M_last == mmin
        left_x = jnp.min(jnp.where(eq, glane, W))
        right_x = jnp.max(jnp.where(eq, glane, -1))
        x0 = jnp.where(pref_left, left_x, right_x)
        oh0 = (glane == x0).astype(jnp.int32)
        ge0 = (glane >= x0).astype(jnp.int32)   # i32: bool carries don't
        # legalize through Mosaic's scf.for lowering

        # ---- backward: record seam (as a one-hot row — computing the
        # broadcast column index costs ~18 rolls/row), compact planes in
        # place, chase bp. The >=seam compaction mask ``ge`` rides the
        # chase incrementally: moving the seam by d just clears/sets the
        # columns between old and new positions — O(delta_x^2) cheap ops
        # instead of a log-width broadcast per row.
        def compact(a_row, ge):
            out = jnp.where(ge, _shift_folded(a_row, 1, jnp.float32(0),
                                              f, L), a_row)
            return jnp.where(glane < w - 1, out, jnp.float32(0))

        import os as _os
        if _os.environ.get("LQR_RESIDENT_FWD_ONLY"):   # perf debug knob
            seam_ref[0, :, :] = jnp.zeros((H, L), jnp.int32)
            return

        def bwd_chunk(k, carry):
            oh, ge = carry
            base = H - (k + 1) * CH
            bp_ch = bp_scr[pl.ds(base, CH)].astype(jnp.int32)
            b_ch = b_scr[pl.ds(base, CH)]
            bias_ch = bias_scr[pl.ds(base, CH)] if has_bias else None
            rig_ch = rig_scr[pl.ds(base, CH)] if has_rig else None
            ohs = [None] * CH
            bos = [None] * CH
            biasos = [None] * CH
            rigos = [None] * CH
            es = [None] * CH
            for j in range(CH - 1, -1, -1):
                # encoded record: fold-reduce the one-hot to a [1, L] row
                # whose single nonzero is (column index + 1) — 4 cheap ops
                # vs a log-width broadcast; the +1 disambiguates column 0
                ohs[j] = jnp.sum(oh * (glane + 1), axis=0, keepdims=True)
                ge_b = ge != 0
                bos[j] = compact(b_ch[j], ge_b)
                if has_bias:
                    biasos[j] = compact(bias_ch[j], ge_b)
                if has_rig:
                    rigos[j] = compact(rig_ch[j], ge_b)
                if use_e:
                    # next seam's energy from the compacted row (x-gradient
                    # family: row-local) — rides the chase chain's idle
                    # issue slots; bias pre-folded, width mask in fwd
                    er = _energy_row_folded(bos[j], bos[j], bos[j],
                                            w - 1, glane, nrg, f, L)
                    if has_bias:
                        er = er + biasos[j]
                    es[j] = er
                bp_row = bp_ch[j]
                nxt = oh * (bp_row == 0).astype(jnp.int32)
                m_pos = []
                for d in range(1, delta_x + 1):
                    mn = oh * (bp_row == -d).astype(jnp.int32)
                    mp = oh * (bp_row == d).astype(jnp.int32)
                    m_pos.append(mp)
                    nxt = nxt + _shift_folded(mn, d, jnp.int32(0), f, L)
                    nxt = nxt + _shift_folded(mp, -d, jnp.int32(0), f, L)
                # ge update: remove columns [s, s_prev) when the seam moved
                # right (d > 0); adding shifts of oh_prev covers
                # [s_prev, s_prev + delta_x), which is a superset of the
                # newly-uncovered [s_prev, s) and otherwise redundant
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
            seam_ref[0, pl.ds(base, CH), :] = jnp.concatenate(ohs, axis=0)
            b_scr[pl.ds(base, CH)] = jnp.stack(bos)
            if has_bias:
                bias_scr[pl.ds(base, CH)] = jnp.stack(biasos)
            if has_rig:
                rig_scr[pl.ds(base, CH)] = jnp.stack(rigos)
            if use_e:
                e_scr[pl.ds(base, CH)] = jnp.stack(es)
            return (oh, ge)

        jax.lax.fori_loop(0, H // CH, bwd_chunk, (oh0, ge0))

    if use_e:
        @pl.when(i == 0)
        def _():
            _carve(read_e=False)

        @pl.when((i > 0) & (i < kc))
        def _():
            _carve(read_e=True)
    else:
        @pl.when(i < kc)
        def _():
            _carve(read_e=False)

    # write the planes back once, at the last grid step (active or not)
    @pl.when(i == KC - 1)
    def _():
        for src, dst in ((b_scr, bo_hbm), (bias_scr, biaso_hbm),
                         (rig_scr, rigo_hbm)):
            if dst is not None:
                cp = pltpu.make_async_copy(src, dst, sem)
                cp.start()
                cp.wait()


@functools.partial(jax.jit, static_argnames=("delta_x", "has_bias",
                                             "has_rig", "nrg", "ssf", "KC"))
def carve_chunk_resident(cur_b, cur_bias, cur_rig, w0, d0, kc,
                         delta_x: int, has_bias: bool, has_rig: bool,
                         nrg: int, ssf: int, KC: int):
    """Carve up to KC seams VMEM-resident.

    cur_b/[cur_bias]/[cur_rig]: [H, Wb] f32 compacted planes; w0 = current
    width (traced); d0 = current depth (traced); kc = seams to carve
    (traced, <= KC; grid steps past kc are skipped). Returns
    (hist [KC, H] i32 — compacted per-frame seam coords, rows >= kc
    garbage; cur_b'; cur_bias'; cur_rig'). Caller gates on resident_ok.
    """
    H, Wb = cur_b.shape
    f = _fold_factor(Wb)
    L = Wb // f
    sc = jnp.stack([jnp.asarray(w0, jnp.int32), jnp.asarray(d0, jnp.int32),
                    jnp.asarray(kc, jnp.int32)]).reshape(1, 3)

    ins = [sc, cur_b.reshape(H, f, L)]
    in_specs = [pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pl.ANY)]
    out_specs = [pl.BlockSpec((1, H, L), lambda i: (i, 0, 0)),
                 pl.BlockSpec(memory_space=pl.ANY)]
    out_shape = [jax.ShapeDtypeStruct((KC, H, L), jnp.int32),
                 jax.ShapeDtypeStruct((H, f, L), jnp.float32)]
    aliases = {1: 1}
    scratch = [pltpu.VMEM((H, f, L), jnp.float32)]
    if has_bias:
        ins.append(cur_bias.reshape(H, f, L))
        in_specs.append(pl.BlockSpec(memory_space=pl.ANY))
        out_specs.append(pl.BlockSpec(memory_space=pl.ANY))
        out_shape.append(jax.ShapeDtypeStruct((H, f, L), jnp.float32))
        aliases[len(ins) - 1] = len(out_shape) - 1
        scratch.append(pltpu.VMEM((H, f, L), jnp.float32))
    if has_rig:
        ins.append(cur_rig.reshape(H, f, L))
        in_specs.append(pl.BlockSpec(memory_space=pl.ANY))
        out_specs.append(pl.BlockSpec(memory_space=pl.ANY))
        out_shape.append(jax.ShapeDtypeStruct((H, f, L), jnp.float32))
        aliases[len(ins) - 1] = len(out_shape) - 1
        scratch.append(pltpu.VMEM((H, f, L), jnp.float32))
    if _use_escr(nrg):
        scratch.append(pltpu.VMEM((H, f, L), jnp.float32))
    scratch.append(pltpu.VMEM((H, f, L), jnp.int8))
    scratch.append(pltpu.SemaphoreType.DMA)

    outs = pl.pallas_call(
        functools.partial(_kernel, KC=KC, BRH=H, delta_x=delta_x,
                          has_bias=has_bias, has_rig=has_rig, nrg=nrg,
                          ssf=ssf, H=H, f=f, L=L),
        grid=(KC,),
        in_specs=in_specs,
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shape),
        scratch_shapes=scratch,
        input_output_aliases=aliases,
        interpret=_interpret(),
    )(*ins)

    # seam rows were recorded fold-reduced: one nonzero = column index + 1
    hist = jnp.sum(outs[0], axis=2, dtype=jnp.int32) - 1
    b_out = outs[1].reshape(H, Wb)
    k = 2
    bias_out = cur_bias
    rig_out = cur_rig
    if has_bias:
        bias_out = outs[k].reshape(H, Wb)
        k += 1
    if has_rig:
        rig_out = outs[k].reshape(H, Wb)
    return hist, b_out, bias_out, rig_out
