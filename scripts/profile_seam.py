"""Per-component timing of the seam step at full size (dev tool)."""

import time
import numpy as np
import jax
import jax.numpy as jnp

import sys
sys.path.insert(0, "/root/repo")
from lqr_tpu.core.state import EngineConfig, init_state, round_up  # noqa
from lqr_tpu.core import engine as eng  # noqa
from lqr_tpu.core.energy import energy  # noqa
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

    e_fn = jax.jit(lambda cur: energy(cur, w, 0))
    e = e_fn(st.cur)
    rig = st.cur_rig
    print(f"energy:          {timeit(e_fn, st.cur):8.3f} ms")

    dpf = jax.jit(lambda e, r: dp_pallas.dp_forward_pallas(e, r, pl, 1,
                                                           False))
    M_last, bp = dpf(e, rig)
    print(f"dp_forward(pal): {timeit(lambda *a: dpf(*a)[1], e, rig):8.3f} ms")

    btf = jax.jit(lambda m, b: dp_pallas.backtrack_pallas(m, b, pl, 1))
    seam = btf(M_last, bp)
    print(f"backtrack(pal):  {timeit(btf, M_last, bp):8.3f} ms")

    dps = jax.jit(lambda e, r: jdp.dp_forward(e, r, pl, 1, False))
    Ms, bp = dps(e, rig)
    print(f"dp_forward(scan):{timeit(dps, e, rig):8.3f} ms")
    bts = jax.jit(lambda M, bp: jdp.backtrack(M, bp, pl))
    print(f"backtrack(scan): {timeit(bts, Ms, bp):8.3f} ms")

    lane = jnp.broadcast_to(jnp.arange(cfg.Wb, dtype=jnp.int32),
                            (N, cfg.Wb))

    def vs_update(vs, seam):
        visible = (vs == 0) & (lane < w)
        pos = jnp.cumsum(visible.astype(jnp.int32), axis=1) - visible
        hit = visible & (pos == seam[:, None])
        return jnp.where(hit, jnp.int32(1), vs)
    vsu = jax.jit(vs_update)
    print(f"vs_update:       {timeit(vsu, st.vs, seam):8.3f} ms")

    def compact(cur, seam):
        ge = (lane >= seam[:, None])[:, :, None]
        keep = (lane < (w - 1))[:, :, None]
        out = jnp.where(ge, jnp.roll(cur, -1, axis=1), cur)
        return jnp.where(keep, out, jnp.uint8(0))
    cp = jax.jit(compact)
    print(f"compact(img u8): {timeit(cp, st.cur, seam):8.3f} ms")

    step = jax.jit(lambda s: eng.seam_step(cfg, s))
    print(f"full seam_step:  {timeit(step, st, n=10):8.3f} ms")


if __name__ == "__main__":
    import argparse
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=2048)
    a = p.parse_args()
    main(a.n)
