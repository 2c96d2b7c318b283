"""C++ reference carver vs NumPy oracle: bit-exact cross-check of the two
host-side implementations of SPEC.md (the C++ one is the CPU baseline)."""

import numpy as np
import pytest

from lqr_tpu import oracle, native
from lqr_tpu.config import EnergyFunc


@pytest.mark.parametrize("nrg", list(EnergyFunc))
def test_native_vs_oracle_vsmap(make_image, nrg):
    img = make_image(h=20, w=28, c=3)
    n = 7
    vs_np = oracle.compute_vs_map(img, n, nrg=nrg)
    vs_cc = native.carve(img, n, nrg=int(nrg))
    assert np.array_equal(vs_cc, vs_np), f"nrg={nrg}"


def test_native_vs_oracle_bias_rig(make_image, rng):
    img = make_image(h=18, w=26)
    bias = (rng.standard_normal((18, 26)) * 0.5).astype(np.float32)
    rig = np.abs(rng.standard_normal((18, 26))).astype(np.float32)
    vs_np = oracle.compute_vs_map(img, 6, bias=bias, rig=rig, delta_x=2)
    vs_cc = native.carve(img, 6, bias=bias, rig=rig, delta_x=2)
    assert np.array_equal(vs_cc, vs_np)


def test_native_materialize(make_image):
    img = make_image(h=16, w=24, c=4)
    vs = native.carve(img, 8)
    for w in [16, 20, 24, 28, 32]:
        out_np = oracle.materialize(img, vs, w)
        out_cc = native.materialize(img, vs, w)
        assert np.array_equal(out_cc, out_np), f"w={w}"


def test_native_alpha_channels(make_image):
    for c in [1, 2, 4]:
        img = make_image(h=14, w=20, c=c)
        vs_np = oracle.compute_vs_map(img, 4)
        vs_cc = native.carve(img, 4)
        assert np.array_equal(vs_cc, vs_np), f"c={c}"


def test_native_bench_runs(make_image):
    img = make_image(h=32, w=48)
    t = native.bench(img, 8)
    assert t > 0
