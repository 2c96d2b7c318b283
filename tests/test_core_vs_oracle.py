"""Engine-vs-oracle differential tests (SURVEY.md §4 test strategy):
energy maps, single seams, full visibility maps, materialization — the JAX
engine must match the NumPy oracle bit-for-bit."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from lqr_tpu import oracle
from lqr_tpu.config import EnergyFunc
from lqr_tpu.core import (EngineConfig, init_state, extend_map, materialize,
                          round_up)
from lqr_tpu.core.energy import energy as j_energy
from lqr_tpu.core import dp as j_dp
from lqr_tpu.core.engine import materialize_all, pref_is_left


def make_cfg(img, **kw):
    h, w = img.shape[:2]
    c = 1 if img.ndim == 2 else img.shape[2]
    return EngineConfig(H=h, Wb=round_up(w, 128), C=c, **kw)


ALL_NRG = list(EnergyFunc)
# sqrt is not correctly rounded in XLA (1-2 ulp vs IEEE), so the NORM
# energies are compared with a tight tolerance instead of bit-exact; every
# other op in the pipeline is exactly rounded and must match exactly.
NORM_NRG = (EnergyFunc.GRAD_NORM, EnergyFunc.LUMA_GRAD_NORM)
EXACT_NRG = [n for n in ALL_NRG if n not in NORM_NRG]


def test_energy_matches_oracle(make_image):
    for c in [1, 2, 3, 4]:
        img = make_image(h=20, w=30, c=c)
        for nrg in ALL_NRG:
            e_np = oracle.energy(img, nrg)
            cfg = make_cfg(img, nrg=int(nrg))
            pad = np.zeros((20, cfg.Wb, c), np.uint8)
            pad[:, :30] = img
            e_j = np.asarray(j_energy(jnp.asarray(pad), jnp.int32(30),
                                      int(nrg)))
            if nrg in NORM_NRG:
                np.testing.assert_allclose(e_j[:, :30], e_np, rtol=1e-6,
                                           atol=0)
            else:
                assert np.array_equal(e_j[:, :30], e_np), (
                    f"nrg={nrg} c={c} "
                    f"max diff {np.abs(e_j[:, :30] - e_np).max()}")
            assert np.all(np.isinf(e_j[:, 30:]))


@pytest.mark.parametrize("delta_x", [1, 2, 5])
@pytest.mark.parametrize("pref_left", [True, False])
def test_single_seam_matches_oracle(make_image, delta_x, pref_left):
    img = make_image(h=24, w=40)
    e_np = oracle.energy(img, EnergyFunc.GRAD_XABS)
    rig_np = np.zeros_like(e_np)
    seam_np = oracle.find_seam(e_np, rig_np, delta_x, pref_left, 24)

    Wb = 128
    e_pad = np.full((24, Wb), np.inf, np.float32)
    e_pad[:, :40] = e_np
    seam_j = np.asarray(j_dp.find_seam(
        jnp.asarray(e_pad), jnp.zeros((24, Wb), jnp.float32),
        jnp.bool_(pref_left), delta_x, False))
    assert np.array_equal(seam_j, seam_np)
    # connectivity invariant
    assert np.all(np.abs(np.diff(seam_np)) <= delta_x)


def test_single_seam_with_rigidity(make_image):
    img = make_image(h=24, w=40)
    e_np = oracle.energy(img, EnergyFunc.GRAD_XABS)
    rig_np = np.full_like(e_np, 7.5)
    seam_np = oracle.find_seam(e_np, rig_np, 3, True, 24)
    Wb = 128
    e_pad = np.full((24, Wb), np.inf, np.float32)
    e_pad[:, :40] = e_np
    rig_pad = np.zeros((24, Wb), np.float32)
    rig_pad[:, :40] = rig_np
    seam_j = np.asarray(j_dp.find_seam(
        jnp.asarray(e_pad), jnp.asarray(rig_pad), jnp.bool_(True), 3, True))
    assert np.array_equal(seam_j, seam_np)


@pytest.mark.parametrize("nrg,delta_x",
                         [(EnergyFunc.GRAD_XABS, 1),
                          (EnergyFunc.GRAD_XABS, 3),
                          (EnergyFunc.LUMA_GRAD_SUMABS, 1)])
def test_vs_map_matches_oracle(make_image, nrg, delta_x):
    img = make_image(h=20, w=28)
    n = 9
    vs_np = oracle.compute_vs_map(img, n, nrg=nrg, delta_x=delta_x)
    cfg = make_cfg(img, nrg=int(nrg), delta_x=delta_x)
    st = init_state(cfg, img)
    st = extend_map(cfg, st, jnp.int32(n))
    vs_j = np.asarray(st.vs)[:, :28]
    assert np.array_equal(vs_j, vs_np)
    # each seam removes exactly one pixel per row
    for s in range(1, n + 1):
        assert np.all((vs_np == s).sum(axis=1) == 1)


def test_vs_map_multi_chunk_matches_oracle(make_image):
    """k > KC crosses a chunk-commit boundary inside the flat while loop
    (r5: the commit rides a lax.cond every KC-th seam and hist rows are
    REUSED across chunks — stale rows must stay masked)."""
    from lqr_tpu.core.engine import KC
    img = make_image(h=12, w=KC + 40)
    n = KC + 17
    vs_np = oracle.compute_vs_map(img, n)
    cfg = make_cfg(img)
    st = init_state(cfg, img)
    st = extend_map(cfg, st, jnp.int32(n))
    assert np.array_equal(np.asarray(st.vs)[:, :KC + 40], vs_np)


def test_commit_slab_path_bit_exact(make_image, monkeypatch):
    """The slabbed chunk-reduce (the [KC, H, Wb] OOM-cliff guard,
    VERDICT r4 weak #4) must be bit-identical to the fused single reduce.
    Forcing the threshold to 0 routes THIS shape's fresh trace through
    the slab loop."""
    from lqr_tpu.core import engine
    monkeypatch.setattr(engine, "_COMMIT_SLAB_ELEMS", 0)
    img = make_image(h=13, w=29)        # unique shape -> fresh trace
    n = 7
    vs_np = oracle.compute_vs_map(img, n)
    cfg = make_cfg(img)
    st = init_state(cfg, img)
    st = extend_map(cfg, st, jnp.int32(n))
    assert np.array_equal(np.asarray(st.vs)[:, :29], vs_np)


def test_vs_map_with_bias_and_rig(make_image, rng):
    img = make_image(h=18, w=26)
    bias = (rng.standard_normal((18, 26)) * 0.5).astype(np.float32)
    rig = np.abs(rng.standard_normal((18, 26))).astype(np.float32)
    n = 6
    vs_np = oracle.compute_vs_map(img, n, bias=bias, rig=rig, delta_x=2)
    cfg = make_cfg(img, delta_x=2, has_bias=True, has_rig=True)
    st = init_state(cfg, img, bias=bias, rig=rig)
    st = extend_map(cfg, st, jnp.int32(n))
    assert np.array_equal(np.asarray(st.vs)[:, :26], vs_np)


def test_materialize_shrink_matches_oracle(make_image):
    img = make_image(h=16, w=24)
    vs = oracle.compute_vs_map(img, 8)
    cfg = make_cfg(img)
    st = init_state(cfg, img)
    st = extend_map(cfg, st, jnp.int32(8))
    for w in [24, 20, 16]:
        out_np = oracle.materialize(img, vs, w)
        out_j = np.asarray(materialize(cfg, st, jnp.int32(w), cfg.Wb))
        assert np.array_equal(out_j[:, :w], out_np), f"w={w}"
        assert np.all(out_j[:, w:] == 0)


def test_materialize_enlarge_matches_oracle(make_image):
    img = make_image(h=16, w=24)
    vs = oracle.compute_vs_map(img, 8)
    cfg = make_cfg(img)
    st = init_state(cfg, img)
    st = extend_map(cfg, st, jnp.int32(8))
    for w in [25, 28, 32]:
        out_np = oracle.materialize(img, vs, w)
        out_j = np.asarray(materialize(cfg, st, jnp.int32(w), cfg.Wb))
        assert np.array_equal(out_j[:, :w], out_np), f"w={w}"


def test_materialize_enlarge_beyond_buffer_width(make_image):
    """Enlarge to a target WIDER than the state buffer Wb (cfg3's 1.5x
    flow): out_Wb > Wb means placement keys exceed 2*Wb — a Wb-derived
    sort sentinel silently corrupts the output (caught in round 3 by
    cfg3's byte-exactness check; keep it caught here)."""
    img = make_image(h=16, w=120)
    k = 60
    vs = oracle.compute_vs_map(img, k)
    cfg = make_cfg(img)                       # Wb = 128
    st = init_state(cfg, img)
    st = extend_map(cfg, st, jnp.int32(k))
    w = 180                                   # > Wb + 2
    out_np = oracle.materialize(img, vs, w)
    out_j = np.asarray(materialize(cfg, st, jnp.int32(w), 256))
    assert np.array_equal(out_j[:, :w], out_np)
    assert np.all(out_j[:, w:] == 0)


def test_carve_reinsert_roundtrip(make_image):
    """Carve k then materialize back at ref width == original (identity)."""
    img = make_image(h=16, w=24)
    cfg = make_cfg(img)
    st = init_state(cfg, img)
    st = extend_map(cfg, st, jnp.int32(10))
    out = np.asarray(materialize(cfg, st, jnp.int32(24), cfg.Wb))
    assert np.array_equal(out[:, :24], img)


def test_aux_carvers_follow_main(make_image, rng):
    img = make_image(h=16, w=24)
    aux1 = rng.integers(0, 256, (16, 24, 4)).astype(np.uint8)
    aux2 = rng.integers(0, 256, (16, 24, 1)).astype(np.uint8)
    cfg = make_cfg(img, aux_channels=(4, 1))
    st = init_state(cfg, img, aux=(aux1, aux2))
    st = extend_map(cfg, st, jnp.int32(6))
    vs = np.asarray(st.vs)[:, :24]
    _, _, _, aux_out = materialize_all(cfg, st, jnp.int32(18), cfg.Wb)
    for a_in, a_out in [(aux1, aux_out[0]), (aux2, aux_out[1])]:
        expect = oracle.materialize(a_in, vs, 18)
        assert np.array_equal(np.asarray(a_out)[:, :18], expect)


def test_side_switch_preference():
    freq = 2
    prefs = [bool(oracle.pref_is_left(s, freq)) for s in range(1, 9)]
    assert prefs == [True, True, False, False, True, True, False, False]
    j = [bool(pref_is_left(jnp.int32(s), freq)) for s in range(1, 9)]
    assert j == prefs


def test_seam_monotone_energy_decrease(make_image):
    """Sanity: successively carved seams have nondecreasing cost on a static
    energy field is NOT guaranteed, but total pixels removed per seam is."""
    img = make_image(h=12, w=20)
    vs = oracle.compute_vs_map(img, 5)
    assert vs.max() == 5
    assert (vs > 0).sum() == 5 * 12
