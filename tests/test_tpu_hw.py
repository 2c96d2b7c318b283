"""Real-TPU test tier (VERDICT r3 weak #7): `pytest -m tpu`.

The regular suite exercises the Pallas kernels only in interpreter mode
on CPU; before this tier, the wedge/resident kernels' real-hardware
validation lived solely in the bench's bit-exact spot checks. These tests
run the ACTUAL compiled kernels on the chip and bit-check against the
single-core C++ reference carver.

Run with:  LQR_TESTS_ON_TPU=1 python -m pytest tests/ -m tpu
(without LQR_TESTS_ON_TPU the conftest pins the suite to the virtual CPU
mesh and every test here skips).
"""

import os

import numpy as np
import pytest

pytestmark = pytest.mark.tpu


def _on_tpu() -> bool:
    if not os.environ.get("LQR_TESTS_ON_TPU"):
        return False
    import jax
    return jax.default_backend() == "tpu"


skip_no_tpu = pytest.mark.skipif(
    not _on_tpu(), reason="needs a real TPU (LQR_TESTS_ON_TPU=1 + chip)")


def _img(h, w, seed=0):
    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, (h, w, 3)).astype(np.float32)
    for _ in range(2):
        img = (img + np.roll(img, 1, 0) + np.roll(img, 1, 1)
               + np.roll(img, -1, 0) + np.roll(img, -1, 1)) / 5.0
    return np.clip(img, 0, 255).astype(np.uint8)


@skip_no_tpu
@pytest.mark.parametrize("h,w,seams", [
    (384, 512, 24),      # resident kernel (fits the VMEM budget)
    (256, 640, 16),      # folded kernels, fold > 1
    (128, 1152, 12),     # wider fold (f=8, non-pow2 L = 144... bucket pads)
])
def test_engine_on_chip_bit_exact(h, w, seams):
    """extend_map on the real chip == the C++ reference, bit for bit
    (the fuzz triangle's Pallas leg, compiled for TPU instead of
    interpret mode)."""
    import jax.numpy as jnp
    from lqr_tpu.core.state import EngineConfig, init_state, round_up
    from lqr_tpu.core.engine import extend_map
    from lqr_tpu import native

    img = _img(h, w, seed=h + w)
    cfg = EngineConfig(H=h, Wb=round_up(w, 128), C=3, use_pallas=True)
    st = extend_map(cfg, init_state(cfg, img), jnp.int32(seams))
    vs_ref = native.carve(img, seams)
    assert np.array_equal(np.asarray(st.vs)[:, :w], vs_ref)


@skip_no_tpu
def test_wedge_backtrack_on_chip():
    """The roll-free wedge backtrack (dp_pallas._btw_kernel) compiled on
    hardware, against the C++ reference at a non-resident size."""
    import jax.numpy as jnp
    from lqr_tpu.core.state import EngineConfig, init_state, round_up
    from lqr_tpu.core.engine import extend_map
    from lqr_tpu.ops import dp_pallas
    from lqr_tpu import native

    assert dp_pallas._BT_WEDGE
    h, w, seams = 1536, 1536, 8          # beyond the resident VMEM budget
    from lqr_tpu.ops.carve_resident import resident_ok
    assert not resident_ok(h, round_up(w, 128), False, False)
    img = _img(h, w, seed=3)
    cfg = EngineConfig(H=h, Wb=round_up(w, 128), C=3, use_pallas=True)
    st = extend_map(cfg, init_state(cfg, img), jnp.int32(seams))
    assert np.array_equal(np.asarray(st.vs)[:, :w], native.carve(img, seams))


@skip_no_tpu
def test_masks_and_rigidity_on_chip():
    """bias + rigmask path (rank-based kernels, no wedge) on hardware."""
    import jax.numpy as jnp
    from lqr_tpu.core.state import EngineConfig, init_state, round_up
    from lqr_tpu.core.engine import extend_map
    from lqr_tpu import native

    h, w, seams = 384, 512, 16
    rng = np.random.default_rng(7)
    img = _img(h, w, seed=9)
    bias = np.zeros((h, w), np.float32)
    bias[h // 4:h // 2, w // 4:w // 2] += 1.0
    bias[h // 2:, w // 2:] -= 0.7
    rig = np.abs(rng.standard_normal((h, w))).astype(np.float32) * 20
    cfg = EngineConfig(H=h, Wb=round_up(w, 128), C=3, has_bias=True,
                       has_rig=True, use_pallas=True)
    st = init_state(cfg, img, bias=bias, rig=rig)
    st = extend_map(cfg, st, jnp.int32(seams))
    vs_ref = native.carve(img, seams, bias=bias, rig=rig)
    assert np.array_equal(np.asarray(st.vs)[:, :w], vs_ref)


@skip_no_tpu
def test_delta_x2_on_chip():
    """delta_x=2 rides the non-wedge kernels; bit-exact on hardware."""
    import jax.numpy as jnp
    from lqr_tpu.core.state import EngineConfig, init_state, round_up
    from lqr_tpu.core.engine import extend_map
    from lqr_tpu import native

    h, w, seams = 256, 384, 10
    img = _img(h, w, seed=5)
    cfg = EngineConfig(H=h, Wb=round_up(w, 128), C=3, delta_x=2,
                       use_pallas=True)
    st = extend_map(cfg, init_state(cfg, img), jnp.int32(seams))
    assert np.array_equal(np.asarray(st.vs)[:, :w],
                          native.carve(img, seams, delta_x=2))


@skip_no_tpu
def test_enlarge_materialize_on_chip():
    """Enlargement map + materialize (sort-based placement with pixel
    averaging) compiled on hardware — previously interpret-only
    (VERDICT r4 weak #5)."""
    from lqr_tpu import Carver, native

    h, w = 256, 384
    img = _img(h, w, seed=21)
    c = Carver(img)
    c.resize(int(w * 1.3), h)
    vs = native.carve(img, int(w * 0.3))
    exp = native.materialize(img, vs, int(w * 1.3))
    assert np.array_equal(np.asarray(c.get_image()), exp)


@skip_no_tpu
def test_multipass_enlarge_on_chip():
    """>enl_step enlargement (flatten-and-restart) end-to-end on chip."""
    from lqr_tpu import Carver, native

    h, w = 192, 256
    img = _img(h, w, seed=23)
    c = Carver(img)
    c.set_enl_step(1.5)
    target = int(w * 2.2)
    c.resize(target, h)
    cur = img
    while cur.shape[1] < target:
        ref = cur.shape[1]
        pt = min(target, max(ref + 1, int(ref * 1.5)))
        k = min(pt - ref, ref - 1)
        vs = native.carve(cur, k)
        cur = native.materialize(cur, vs, ref + k)
    assert np.array_equal(np.asarray(c.get_image()), cur)


@skip_no_tpu
def test_resident_chunk_depth_beyond_kc_on_chip():
    """The VMEM-resident kernel's posmap-commit path across a chunk
    boundary (depth > KC) on hardware."""
    import jax.numpy as jnp
    from lqr_tpu.core.state import EngineConfig, init_state, round_up
    from lqr_tpu.core.engine import extend_map, KC
    from lqr_tpu.ops.carve_resident import resident_ok
    from lqr_tpu import native

    h, w = 384, 512
    seams = KC + 20
    assert resident_ok(h, round_up(w, 128), False, False)
    img = _img(h, w, seed=29)
    cfg = EngineConfig(H=h, Wb=round_up(w, 128), C=3, use_pallas=True)
    st = extend_map(cfg, init_state(cfg, img), jnp.int32(seams))
    assert np.array_equal(np.asarray(st.vs)[:, :w],
                          native.carve(img, seams))


@skip_no_tpu
def test_batch_scan_pallas_tier_on_chip():
    """extend_map_scan_pallas (the equal-height Pallas batch tier) on a
    4-image batch, against solo native carves."""
    from lqr_tpu.parallel.batch import BatchCarver
    from lqr_tpu import native

    h, w, seams = 256, 384, 12
    imgs = [_img(h, w, seed=40 + i) for i in range(4)]
    bc = BatchCarver(imgs)
    assert bc.scan_pallas          # the tier under test
    bc.carve(seams)
    vs = np.asarray(bc.state.vs)
    for i, im in enumerate(imgs):
        assert np.array_equal(vs[i, :, :w], native.carve(im, seams)), i


@skip_no_tpu
def test_interactive_retarget_on_chip():
    """A second resize on the SAME map (the interactive dialog's
    retarget: deepen the map, slice shallower) on hardware."""
    from lqr_tpu import Carver, native

    h, w = 256, 384
    img = _img(h, w, seed=31)
    c = Carver(img)
    c.resize(w - 30, h)
    first = np.asarray(c.get_image())
    vs = native.carve(img, 40)
    assert np.array_equal(first, native.materialize(img, vs, w - 30))
    c.resize(w - 10, h)            # shallower: same map, no new carving
    assert np.array_equal(np.asarray(c.get_image()),
                          native.materialize(img, vs, w - 10))
    c.resize(w - 40, h)            # deeper: extends the same map
    assert np.array_equal(np.asarray(c.get_image()),
                          native.materialize(img, vs, w - 40))


@skip_no_tpu
def test_sharded_step_compiles_on_chip():
    """extend_map_sharded with the Pallas block DP (ops.dp_block) on a
    degenerate 1-device (data=1, cols=1) mesh — compiles the sharded
    program, including dp_block_pallas, for real hardware and bit-checks
    it (VERDICT r4 #3's on-chip leg; the 8-way sharding itself is
    exercised on the virtual mesh and by the driver's dryrun)."""
    import dataclasses
    import numpy as _np
    from lqr_tpu.parallel.batch import BatchCarver
    from lqr_tpu.parallel.sharding import make_mesh, extend_map_sharded
    from lqr_tpu import native

    h, w, seams = 256, 384, 6
    imgs = [_img(h, w, seed=50 + i) for i in range(2)]
    mesh = make_mesh(1, data=1)
    bc = BatchCarver(imgs)                  # state builder only
    cfg = dataclasses.replace(bc.cfg, use_pallas=True)
    st = extend_map_sharded(mesh, cfg, bc.state,
                            _np.full((2,), seams, _np.int32))
    vs = np.asarray(st.vs)
    for i, im in enumerate(imgs):
        assert np.array_equal(vs[i, :, :w], native.carve(im, seams)), i


@skip_no_tpu
@pytest.mark.parametrize("fuse_energy", [False, True])
def test_fused_carve_step_on_chip(fuse_energy):
    """carve_step_pallas (wedge fwd + wedge bwd w/ compact) compiled for
    the chip, vs the split path's outputs."""
    import jax
    import jax.numpy as jnp
    from lqr_tpu.core.state import EngineConfig, init_state, round_up, INF
    from lqr_tpu.core.energy import energy_from_plane
    from lqr_tpu.ops import dp_pallas

    h, w = 256, 1000
    Wb = round_up(w, 128)
    img = _img(h, w, seed=11)
    cfg = EngineConfig(H=h, Wb=Wb, C=3, use_pallas=True)
    b = init_state(cfg, img).cur_b
    z = jnp.zeros((h, Wb), jnp.float32)
    lane = jnp.arange(Wb, dtype=jnp.int32)[None, :]
    for pref in (True, False):
        e = energy_from_plane(b, jnp.int32(w), 0)
        seam_ref = dp_pallas.find_seam_pallas(e, None, jnp.bool_(pref), 1,
                                              False)
        seam, b2, _, _ = dp_pallas.carve_step_pallas(
            b, z, z, jnp.int32(w), jnp.bool_(pref), 1, False, False, 0,
            fuse_energy=fuse_energy)
        assert np.array_equal(np.asarray(seam), np.asarray(seam_ref))
        ge = lane >= seam_ref[:, None]
        exp = jnp.where(ge, jnp.roll(b, -1, axis=1), b)
        exp = jnp.where(lane < (w - 1), exp, jnp.float32(0))
        assert np.array_equal(np.asarray(b2), np.asarray(exp))
