"""Pallas DP/backtrack kernels vs the pure-JAX reference implementation.

Runs in interpreter mode on CPU (LQR_PALLAS_INTERPRET=1); the same kernels
compile for real on TPU (exercised by bench.py / __graft_entry__).
"""

import os

os.environ["LQR_PALLAS_INTERPRET"] = "1"

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import pytest  # noqa: E402

from lqr_tpu.core import dp as jdp  # noqa: E402
from lqr_tpu.ops import dp_pallas  # noqa: E402


# executable-arena cache clearing lives in conftest.py's autouse
# per-module fixture so it applies regardless of file ordering

def _random_energy(rng, H, W, Wb):
    e = np.full((H, Wb), np.inf, np.float32)
    e[:, :W] = rng.random((H, W), dtype=np.float32)
    # inject ties so tie-break rules are actually exercised
    e[:, :W] = np.round(e[:, :W] * 8) / 8
    return e


@pytest.mark.parametrize("delta_x", [1, 2])
@pytest.mark.parametrize("pref_left", [True, False])
@pytest.mark.parametrize("H", [16, 24])
def test_pallas_matches_jax(delta_x, pref_left, H):
    rng = np.random.default_rng(7)
    W, Wb = 40, 128
    e = _random_energy(rng, H, W, Wb)
    rig = np.zeros((H, Wb), np.float32)
    ref = np.asarray(jdp.find_seam(jnp.asarray(e), jnp.asarray(rig),
                                   jnp.bool_(pref_left), delta_x, False))
    got = np.asarray(dp_pallas.find_seam_pallas(
        jnp.asarray(e), jnp.asarray(rig), jnp.bool_(pref_left), delta_x,
        False))
    assert np.array_equal(ref, got)


def test_pallas_with_rigidity():
    rng = np.random.default_rng(3)
    H, W, Wb = 24, 40, 128
    e = _random_energy(rng, H, W, Wb)
    rig = np.zeros((H, Wb), np.float32)
    rig[:, :W] = np.abs(rng.standard_normal((H, W))).astype(np.float32)
    for pref in (True, False):
        ref = np.asarray(jdp.find_seam(jnp.asarray(e), jnp.asarray(rig),
                                       jnp.bool_(pref), 2, True))
        got = np.asarray(dp_pallas.find_seam_pallas(
            jnp.asarray(e), jnp.asarray(rig), jnp.bool_(pref), 2, True))
        assert np.array_equal(ref, got)


def test_pallas_folded_path():
    """Wb >= 1024 engages the folded-row kernels (fold factor > 1); they
    must stay bit-identical to the scan DP, including side preference and
    rigidity."""
    rng = np.random.default_rng(21)
    H, W, Wb = 16, 1000, 1024
    e = _random_energy(rng, H, W, Wb)
    rig = np.zeros((H, Wb), np.float32)
    from lqr_tpu.ops.dp_pallas import _fold_factor
    assert _fold_factor(Wb) > 1
    for pref in (True, False):
        for dx in (1, 2):
            ref = np.asarray(jdp.find_seam(jnp.asarray(e), jnp.asarray(rig),
                                           jnp.bool_(pref), dx, False))
            got = np.asarray(dp_pallas.find_seam_pallas(
                jnp.asarray(e), jnp.asarray(rig), jnp.bool_(pref), dx,
                False))
            assert np.array_equal(ref, got), (pref, dx)
    rig[:, :W] = np.abs(rng.standard_normal((H, W))).astype(np.float32)
    ref = np.asarray(jdp.find_seam(jnp.asarray(e), jnp.asarray(rig),
                                   jnp.bool_(True), 2, True))
    got = np.asarray(dp_pallas.find_seam_pallas(
        jnp.asarray(e), jnp.asarray(rig), jnp.bool_(True), 2, True))
    assert np.array_equal(ref, got)


def test_pallas_rig_wedge_delta1():
    """delta_x=1 WITH rigidity rides the forward wedge since r5 (the rig
    term is row-local and distributes exactly over shifts); must stay
    bit-identical to the scan DP including ties and both preferences."""
    rng = np.random.default_rng(33)
    H, W, Wb = 32, 1000, 1024
    e = _random_energy(rng, H, W, Wb)
    rig = np.zeros((H, Wb), np.float32)
    rig[:, :W] = np.round(
        np.abs(rng.standard_normal((H, W))) * 4) / 4 * 30
    from lqr_tpu.ops.dp_pallas import _fold_factor
    assert _fold_factor(Wb) > 1
    for pref in (True, False):
        ref = np.asarray(jdp.find_seam(jnp.asarray(e), jnp.asarray(rig),
                                       jnp.bool_(pref), 1, True))
        got = np.asarray(dp_pallas.find_seam_pallas(
            jnp.asarray(e), jnp.asarray(rig), jnp.bool_(pref), 1, True))
        assert np.array_equal(ref, got), pref


def test_pallas_folded_ragged_rows():
    """H > 128 and H not a multiple of 8 (e.g. 300): _row_block returns H,
    the 128 cap leaves H % BR = 44 remainder rows, and the grid of H // BR
    blocks would silently drop them (ADVICE r4 medium).  find_seam_pallas
    must detect the shape and fall back to the single-block kernels;
    fused_ok must reject it so Carver's escape also fires."""
    rng = np.random.default_rng(44)
    H, W, Wb = 300, 1000, 1024
    from lqr_tpu.ops.dp_pallas import _fold_factor, fused_ok
    assert _fold_factor(Wb) > 1
    assert not fused_ok(H, Wb, 1)
    e = _random_energy(rng, H, W, Wb)
    rig = np.zeros((H, Wb), np.float32)
    ref = np.asarray(jdp.find_seam(jnp.asarray(e), jnp.asarray(rig),
                                   jnp.bool_(True), 1, False))
    got = np.asarray(dp_pallas.find_seam_pallas(
        jnp.asarray(e), jnp.asarray(rig), jnp.bool_(True), 1, False))
    assert np.array_equal(ref, got)


def test_pallas_forward_costmap():
    """Last DP row and backpointers must match the scan DP bit-for-bit."""
    rng = np.random.default_rng(11)
    H, W, Wb = 16, 30, 128
    e = _random_energy(rng, H, W, Wb)
    rig = np.zeros((H, Wb), np.float32)
    M_ref, bp_ref = jdp.dp_forward(jnp.asarray(e), jnp.asarray(rig),
                                   jnp.bool_(True), 1, False)
    M_pal, bp_pal = dp_pallas.dp_forward_pallas(
        jnp.asarray(e), jnp.asarray(rig), jnp.bool_(True), 1, False)
    assert np.array_equal(np.asarray(M_ref)[:W], np.asarray(M_pal)[:W])
    assert np.array_equal(np.asarray(bp_ref)[:, :W].astype(np.int32),
                          np.asarray(bp_pal)[:, :W])


def _ref_carve_once(cur_b, cur_bias, cur_rig, w, pref, delta_x,
                    has_bias, has_rig, nrg):
    """The unfused reference: energy_from_plane + scan DP + roll/select
    compaction (the exact ops the fused kernel replaces)."""
    from lqr_tpu.core.energy import energy_from_plane
    from lqr_tpu.core.state import INF
    H, Wb = cur_b.shape
    lane = jnp.broadcast_to(jnp.arange(Wb, dtype=jnp.int32), (H, Wb))
    e = energy_from_plane(cur_b, w, nrg)
    if has_bias:
        e = jnp.where(lane < w, e + cur_bias, INF)
    seam = jdp.find_seam(e, cur_rig, pref, delta_x, has_rig)
    ge = lane >= seam[:, None]
    keep = lane < (w - 1)

    def compact(a):
        out = jnp.where(ge, jnp.roll(a, -1, axis=1), a)
        return jnp.where(keep, out, jnp.float32(0))

    return (seam, compact(cur_b),
            compact(cur_bias) if has_bias else cur_bias,
            compact(cur_rig) if has_rig else cur_rig)


@pytest.mark.parametrize("nrg", [0, 1, 2, 6])
@pytest.mark.parametrize("masks", [(False, False), (True, False),
                                   (True, True)])
@pytest.mark.parametrize("fuse_energy", [False, True])
def test_fused_carve_step(nrg, masks, fuse_energy):
    """The fully fused energy+DP+backtrack+compact kernel pair must be
    bit-identical to the unfused path (seam and all compacted planes) —
    in both energy modes (fuse_energy=True is the r4 production hot path:
    energy-inline wedge forward + wedge backward with compaction)."""
    has_bias, has_rig = masks
    rng = np.random.default_rng(5)
    H, W, Wb = 32, 1000, 1024
    assert dp_pallas.fused_ok(H, Wb)
    b = np.zeros((H, Wb), np.float32)
    b[:, :W] = np.round(rng.random((H, W), dtype=np.float32) * 16) / 16
    bias = np.zeros((H, Wb), np.float32)
    rig = np.zeros((H, Wb), np.float32)
    if has_bias:
        bias[:, :W] = np.round(
            rng.standard_normal((H, W)) * 4).astype(np.float32)
    if has_rig:
        rig[:, :W] = np.abs(rng.standard_normal((H, W))).astype(np.float32)
    for pref in (True, False):
        for dx in (1, 2):
            args = (jnp.asarray(b), jnp.asarray(bias), jnp.asarray(rig),
                    jnp.int32(W), jnp.bool_(pref), dx, has_bias, has_rig,
                    nrg)
            ref = _ref_carve_once(*args)
            got = dp_pallas.carve_step_pallas(*args,
                                              fuse_energy=fuse_energy)
            for r, g, name in zip(ref, got, ("seam", "b", "bias", "rig")):
                assert np.array_equal(np.asarray(r), np.asarray(g)), \
                    (name, pref, dx)


def test_fused_carve_step_nonpow2_L():
    """fused_ok admits non-power-of-two L for delta_x == 1 (the wedge
    backward has no log-reduction); results stay bit-identical.

    Runs with the persistent compile cache disabled: jaxlib 0.9.0
    segfaults deserializing this interpret-mode executable from the
    on-disk cache (readback of a fresh same-process compile is fine)."""
    import jax
    jax.config.update("jax_enable_compilation_cache", False)
    try:
        _run_nonpow2_case()
    finally:
        jax.config.update("jax_enable_compilation_cache", True)


def _run_nonpow2_case():
    rng = np.random.default_rng(11)
    H, W, Wb = 24, 760, 768            # f=2, L=384 (not a power of two)
    assert dp_pallas._fold_factor(Wb) > 1
    assert not dp_pallas._is_pow2(Wb // dp_pallas._fold_factor(Wb))
    assert dp_pallas.fused_ok(H, Wb, 1)
    b = np.zeros((H, Wb), np.float32)
    b[:, :W] = np.round(rng.random((H, W), dtype=np.float32) * 8) / 8
    z = jnp.zeros((H, Wb), jnp.float32)
    for pref in (True, False):
        args = (jnp.asarray(b), z, z, jnp.int32(W), jnp.bool_(pref), 1,
                False, False, 0)
        ref = _ref_carve_once(*args)
        got = dp_pallas.carve_step_pallas(*args, fuse_energy=True)
        assert np.array_equal(np.asarray(ref[0]), np.asarray(got[0]))
        assert np.array_equal(np.asarray(ref[1]), np.asarray(got[1]))


def test_fused_carve_step_sqrt_energy_shrinking_width():
    """GRAD_NORM + successive widths (the in-loop situation)."""
    rng = np.random.default_rng(9)
    H, W, Wb = 16, 512, 512
    assert dp_pallas.fused_ok(H, Wb)
    b = np.zeros((H, Wb), np.float32)
    b[:, :W] = rng.random((H, W), dtype=np.float32)
    bias = np.zeros((H, Wb), np.float32)
    rig = np.zeros((H, Wb), np.float32)
    bj = jnp.asarray(b)
    for k in range(4):
        w = W - k
        args = (bj, jnp.asarray(bias), jnp.asarray(rig), jnp.int32(w),
                jnp.bool_(k % 2 == 0), 1, False, False, 2)
        ref = _ref_carve_once(*args)
        got = dp_pallas.carve_step_pallas(*args)
        assert np.array_equal(np.asarray(ref[0]), np.asarray(got[0])), k
        assert np.array_equal(np.asarray(ref[1]), np.asarray(got[1])), k
        bj = got[1]
