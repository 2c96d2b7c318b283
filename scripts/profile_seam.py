"""Per-component timing of the seam step at full size (dev tool)."""

import time
import numpy as np
import jax
import jax.numpy as jnp

import sys
sys.path.insert(0, "/root/repo")
from lqr_tpu.core.state import EngineConfig, init_state, round_up  # noqa
from lqr_tpu.core import engine as eng  # noqa
from lqr_tpu.core.energy import energy_from_plane  # noqa
from lqr_tpu.core import dp as jdp  # noqa
from lqr_tpu.ops import dp_pallas  # noqa
from bench import make_test_image  # noqa


def timeit(fn, *args, n=30, warm=2):
    for _ in range(warm):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n * 1e3


def main(N=2048):
    img = make_test_image(N)
    cfg = EngineConfig(H=N, Wb=round_up(N, 128), C=3, use_pallas=True)
    st = init_state(cfg, img)
    w = jnp.int32(N)
    pl = jnp.bool_(True)

    e_fn = jax.jit(lambda b: energy_from_plane(b, w, cfg.nrg))
    e = e_fn(st.cur_b)
    rig = st.cur_rig
    print(f"energy:          {timeit(e_fn, st.cur_b):8.3f} ms")

    fs = jax.jit(lambda e, r: dp_pallas.find_seam_pallas(e, r, pl, 1, False))
    seam = fs(e, rig)
    print(f"find_seam(pal):  {timeit(fs, e, rig):8.3f} ms")

    fss = jax.jit(lambda e, r: jdp.find_seam(e, r, pl, 1, False))
    print(f"find_seam(scan): {timeit(fss, e, rig):8.3f} ms")

    lane = jnp.broadcast_to(jnp.arange(cfg.Wb, dtype=jnp.int32),
                            (N, cfg.Wb))

    def compact(b, seam):
        ge = lane >= seam[:, None]
        keep = lane < (w - 1)
        out = jnp.where(ge, jnp.roll(b, -1, axis=1), b)
        return jnp.where(keep, out, jnp.float32(0))
    cp = jax.jit(compact)
    print(f"compact(f32):    {timeit(cp, st.cur_b, seam):8.3f} ms")

    carve = jax.jit(lambda b: eng._carve_once(
        cfg, b, st.cur_bias, st.cur_rig, w, jnp.int32(1)))
    print(f"carve_once:      {timeit(carve, st.cur_b, n=10):8.3f} ms")

    chunk = jax.jit(lambda s: eng._hot_chunk(
        cfg, s.cur_b, s.cur_bias, s.cur_rig, s.ref_w, s.depth,
        jnp.int32(eng.KC)))
    ms = timeit(chunk, st, n=2, warm=1)
    print(f"hot_chunk[{eng.KC}]:  {ms:8.3f} ms  "
          f"({ms / eng.KC:6.3f} ms/seam)")

    commit = jax.jit(lambda s, h: eng._commit_hist(
        s.vs, s.ref_w, s.depth, jnp.int32(eng.KC), h))
    hist = jnp.zeros((eng.KC, N), jnp.int32)
    print(f"commit_hist:     {timeit(commit, st, hist):8.3f} ms")

    step = jax.jit(lambda s: eng.seam_step(cfg, s))
    print(f"full seam_step:  {timeit(step, st, n=10):8.3f} ms")


if __name__ == "__main__":
    import argparse
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=2048)
    a = p.parse_args()
    main(a.n)
