"""Profiling utilities: roofline model sanity + stopwatch."""

import numpy as np

from lqr_tpu.profiling import seam_roofline, Stopwatch


def test_roofline_model():
    r = seam_roofline(2048, 2048, hbm_gbps=819.0)
    # one seam at 2048^2 moves tens of MB; SoL must be in the k-seams/s
    # range on v5e-class HBM
    assert 50 << 20 < r.hbm_bytes < 200 << 20
    assert 3000 < r.sol_seams_per_s < 20000
    assert r.efficiency(r.sol_seams_per_s) == 1.0
    # masks add compaction traffic
    r2 = seam_roofline(2048, 2048, has_bias=True, has_rig=True,
                       hbm_gbps=819.0)
    assert r2.hbm_bytes > r.hbm_bytes


def test_stopwatch(make_image):
    import jax.numpy as jnp
    sw = Stopwatch()
    x = jnp.zeros((8, 8)) + 1
    dt = sw.lap("op", x)
    assert dt >= 0
    assert "op" in sw.report()
