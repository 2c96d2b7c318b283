"""VMEM-resident multi-seam kernel vs the scan hot chunk (bit-exact).

Runs the Pallas kernel in interpreter mode on CPU (LQR_PALLAS_INTERPRET);
on TPU the same kernel is the production small-image hot path
(engine._extend_hot gates on carve_resident.resident_ok).

The resident kernel records seams in REFERENCE coordinates (via its
resident posmap plane); the scan chunk records compacted-frame
coordinates. Equivalence is asserted where it matters: the committed
visibility maps must be bit-equal.
"""

import os

import numpy as np
import jax.numpy as jnp
import pytest

from lqr_tpu.core.state import EngineConfig, init_state
from lqr_tpu.core import engine as eng
from lqr_tpu.ops.carve_resident import resident_ok, carve_chunk_resident


@pytest.fixture(autouse=True)
def _interpret():
    prev = os.environ.get("LQR_PALLAS_INTERPRET")
    os.environ["LQR_PALLAS_INTERPRET"] = "1"
    yield
    if prev is None:
        os.environ.pop("LQR_PALLAS_INTERPRET", None)
    else:
        os.environ["LQR_PALLAS_INTERPRET"] = prev


def _setup(rng, has_bias, has_rig, nrg, dx, H=16, Wb=256):
    img = (rng.integers(0, 8, (H, Wb, 3)) * 32).astype(np.uint8)  # ties
    bias = (rng.standard_normal((H, Wb)).astype(np.float32)
            if has_bias else None)
    rig = (np.abs(rng.standard_normal((H, Wb))).astype(np.float32)
           if has_rig else None)
    cfg = EngineConfig(H=H, Wb=Wb, C=3, delta_x=dx, nrg=nrg,
                       has_bias=has_bias, has_rig=has_rig, use_pallas=False)
    return cfg, init_state(cfg, img, bias=bias, rig=rig)


@pytest.mark.parametrize("has_bias,has_rig,nrg,dx", [
    (False, False, 0, 1),       # benchmark config #1 shape
    (True, True, 0, 1),         # config #2 shape (masks + rigidity)
    (True, True, 1, 2),
    (False, True, 2, 3),
    (True, False, 5, 1),
    (False, False, 6, 1),       # NULL energy
])
def test_resident_matches_scan_chunk(rng, has_bias, has_rig, nrg, dx):
    cfg, st = _setup(rng, has_bias, has_rig, nrg, dx)
    assert resident_ok(cfg.H, cfg.Wb, has_bias, has_rig, nrg)
    kc = jnp.int32(6)
    b1, bias1, rig1, hist1 = eng._hot_chunk(
        cfg, st.cur_b, st.cur_bias, st.cur_rig, st.ref_w, jnp.int32(0), kc)
    pm0 = eng._posmap_from_vs(st.vs, st.ref_w)
    hist2, b2, bias2, rig2, pm2 = carve_chunk_resident(
        st.cur_b, st.cur_bias, st.cur_rig, pm0, st.ref_w, jnp.int32(0), kc,
        dx, has_bias, has_rig, nrg, cfg.side_switch_freq, eng.KC)
    # the committed visibility maps must agree bit-exactly
    vs1 = eng._commit_hist(st.vs, st.ref_w, jnp.int32(0), kc, hist1)
    vs2 = eng._commit_ref_hist(st.vs, jnp.int32(0), kc, hist2)
    assert np.array_equal(np.asarray(vs1), np.asarray(vs2))
    assert np.array_equal(np.asarray(b1), np.asarray(b2))
    if has_bias:
        assert np.array_equal(np.asarray(bias1), np.asarray(bias2))
    if has_rig:
        assert np.array_equal(np.asarray(rig1), np.asarray(rig2))
    # the returned posmap is the compacted map of the new frame
    pm_expect = eng._posmap_from_vs(vs2, st.ref_w)
    w_new = int(st.ref_w) - 6
    assert np.array_equal(np.asarray(pm2)[:, :w_new],
                          np.asarray(pm_expect)[:, :w_new])


def test_resident_extension_depth(rng):
    """Chunked extension (d0 > 0) composes identically to one chunk."""
    cfg, st = _setup(rng, False, False, 0, 1)
    _, _, _, h1 = eng._hot_chunk(cfg, st.cur_b, st.cur_bias, st.cur_rig,
                                 st.ref_w, jnp.int32(0), jnp.int32(8))
    vs1 = eng._commit_hist(st.vs, st.ref_w, jnp.int32(0), jnp.int32(8), h1)
    pm0 = eng._posmap_from_vs(st.vs, st.ref_w)
    h2a, b2a, _, _, pm2a = carve_chunk_resident(
        st.cur_b, None, None, pm0, st.ref_w, jnp.int32(0), jnp.int32(4),
        1, False, False, 0, 2, eng.KC)
    h2b, b2b, _, _, _ = carve_chunk_resident(
        b2a, None, None, pm2a, st.ref_w - 4, jnp.int32(4), jnp.int32(4),
        1, False, False, 0, 2, eng.KC)
    vs2 = eng._commit_ref_hist(st.vs, jnp.int32(0), jnp.int32(4), h2a)
    vs2 = eng._commit_ref_hist(vs2, jnp.int32(4), jnp.int32(4), h2b)
    assert np.array_equal(np.asarray(vs1), np.asarray(vs2))


def test_resident_ok_gates():
    assert not resident_ok(2048, 2048, False, False)   # VMEM too large
    assert not resident_ok(20, 384, False, False)      # H not CH-divisible
    assert resident_ok(16, 384, False, False)  # 384 = 3*128: exact fold
    assert resident_ok(384, 512, False, False)         # benchmark config #1
    assert resident_ok(768, 1024, True, True)          # benchmark config #2
