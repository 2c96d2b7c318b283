"""Batching and sharding tests on the virtual 8-device CPU mesh:
shard-count invariance of seams, padding invariance of batched carving."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from lqr_tpu import oracle
from lqr_tpu.core import dp as jdp
from lqr_tpu.parallel.batch import BatchCarver
from lqr_tpu.parallel.sharding import make_mesh, find_seam_sharded


def test_batch_carver_matches_oracle(make_image):
    imgs = [make_image(h=16, w=24), make_image(h=16, w=20),
            make_image(h=12, w=24)]
    bc = BatchCarver(imgs)
    bc.carve(4)
    outs = bc.images_at(bc.widths - 4)
    for im, out in zip(imgs, outs):
        expect = oracle.carve_width(im, im.shape[1] - 4)
        assert np.array_equal(out, expect)


def test_batch_carver_ragged_seam_counts(make_image):
    imgs = [make_image(h=14, w=30), make_image(h=14, w=30)]
    bc = BatchCarver(imgs)
    bc.carve(np.array([3, 7]))
    outs = bc.images_at(np.array([27, 23]))
    assert np.array_equal(outs[0], oracle.carve_width(imgs[0], 27))
    assert np.array_equal(outs[1], oracle.carve_width(imgs[1], 23))


@pytest.mark.parametrize("n_shards", [2, 4, 8])
def test_sharded_dp_invariance(n_shards):
    """Seams must be bitwise invariant to the number of column shards."""
    if len(jax.devices()) < n_shards:
        pytest.skip("not enough devices")
    rng = np.random.default_rng(5)
    H, Wb = 16, 128 * n_shards
    e = rng.random((H, Wb), dtype=np.float32)
    e = np.round(e * 8) / 8  # inject ties
    rig = np.zeros((H, Wb), np.float32)
    ref = np.asarray(jdp.find_seam(jnp.asarray(e), jnp.asarray(rig),
                                   jnp.bool_(True), 1, False))
    mesh = make_mesh(n_shards, data=1)
    got = np.asarray(find_seam_sharded(mesh, jnp.asarray(e),
                                       jnp.asarray(rig), jnp.bool_(True),
                                       1, False))
    assert np.array_equal(ref, got)


def test_sharded_dp_delta2_rig():
    if len(jax.devices()) < 4:
        pytest.skip("not enough devices")
    rng = np.random.default_rng(9)
    H, Wb = 16, 512
    e = rng.random((H, Wb), dtype=np.float32)
    rig = np.abs(rng.standard_normal((H, Wb))).astype(np.float32)
    for pref in (True, False):
        ref = np.asarray(jdp.find_seam(jnp.asarray(e), jnp.asarray(rig),
                                       jnp.bool_(pref), 2, True))
        mesh = make_mesh(4, data=1)
        got = np.asarray(find_seam_sharded(mesh, jnp.asarray(e),
                                           jnp.asarray(rig),
                                           jnp.bool_(pref), 2, True))
        assert np.array_equal(ref, got)


def test_graft_entry_dryrun():
    import sys
    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as ge
    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    jax.block_until_ready(out)
    ge.dryrun_multichip(8)
