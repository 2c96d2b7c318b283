"""Device-internal phase attribution of the per-seam cost at big sizes.

Runs ablated variants of the seam step inside one jitted fori_loop
(single dispatch; slope-timed over two trip counts), so the ~25 ms tunnel
dispatch latency cancels and phases are attributed by differencing:

  full        energy + DP fwd + backtrack + compact
  no_energy   e := cur_b (stencil skipped)
  no_bwd      backtrack replaced by a fake seam derived from M_last
  fwd_only    no backtrack, no compact (cur_b rolled to keep the loop live)

Usage: python scripts/phase2048.py [N] [iters]
"""

import os
import sys
import time

import numpy as np

N = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
IT = int(sys.argv[2]) if len(sys.argv) > 2 else 64

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from bench import make_test_image  # noqa: E402
from lqr_tpu.core.state import EngineConfig, init_state, round_up  # noqa: E402
from lqr_tpu.core.energy import energy_from_plane  # noqa: E402
from lqr_tpu.core.state import INF  # noqa: E402
from lqr_tpu.ops import dp_pallas  # noqa: E402


def main():
    cfg = EngineConfig(H=N, Wb=round_up(N, 128), C=3, use_pallas=True)
    H, Wb = cfg.H, cfg.Wb
    lane = jnp.broadcast_to(jnp.arange(Wb, dtype=jnp.int32), (H, Wb))
    w = jnp.int32(N)

    def step(cur_b, j, *, energy=True, bwd=True, compact=True):
        pl_ = (j % 4) < 2
        e = energy_from_plane(cur_b, w, cfg.nrg) if energy else cur_b
        if bwd:
            seam = dp_pallas.find_seam_pallas(e, None, pl_, 1, False)
        else:
            f = dp_pallas._fold_factor(Wb)
            L = Wb // f
            e_f = e.reshape(H, f, L)
            from functools import partial
            from jax.experimental import pallas as pl
            BR = min(dp_pallas._row_block(H), 128)
            n = H // BR
            pl_arr = jnp.asarray(pl_, jnp.int32).reshape(1, 1)
            rig_f = jnp.zeros((1, f, L), jnp.float32)
            m_last, bp = pl.pallas_call(
                partial(dp_pallas._dpf_kernel, BR=BR, delta_x=1,
                        has_rig=False, H=H, f=f, L=L,
                        CH=dp_pallas._chunk_for(BR)),
                grid=(n,),
                in_specs=[pl.BlockSpec(memory_space=dp_pallas.pltpu.SMEM),
                          pl.BlockSpec((BR, f, L), lambda i: (i, 0, 0)),
                          pl.BlockSpec((1, f, L), lambda i: (0, 0, 0))],
                out_specs=(pl.BlockSpec((f, L), lambda i: (0, 0)),
                           pl.BlockSpec((BR, f, L), lambda i: (i, 0, 0))),
                scratch_shapes=[dp_pallas.pltpu.VMEM((f, L), jnp.float32)],
                out_shape=(jax.ShapeDtypeStruct((f, L), jnp.float32),
                           jax.ShapeDtypeStruct((H, f, L),
                                                dp_pallas._BP_DT)),
            )(pl_arr, e_f, rig_f)
            # fake seam keeps the data dependence without a backtrack
            seam = (m_last.reshape(-1)[:H].astype(jnp.int32) % w)
        if compact:
            ge = lane >= seam[:, None]
            out = jnp.where(ge, jnp.roll(cur_b, -1, axis=1), cur_b)
            return jnp.where(lane < (w - 1), out, jnp.float32(0))
        # keep the loop live without the compact's select
        return cur_b + jnp.float32(1e-30) * seam[:, None].astype(jnp.float32)

    def loop(kwargs):
        def run(b0, iters):
            def body(j, b):
                return step(b, j, **kwargs)
            return jax.lax.fori_loop(0, iters, body, b0)
        return jax.jit(run, static_argnums=1)

    variants = {
        "full":      dict(energy=True, bwd=True, compact=True),
        "no_energy": dict(energy=False, bwd=True, compact=True),
        "no_bwd":    dict(energy=True, bwd=False, compact=True),
        "fwd_only":  dict(energy=True, bwd=False, compact=False),
    }

    def timed(fn, seed, iters):
        b0 = init_state(cfg, make_test_image(N, seed=seed)).cur_b
        np.asarray(jax.device_get(b0[:1, :1]))
        t0 = time.perf_counter()
        o = fn(b0, iters)
        np.asarray(jax.device_get(o[:1, :1]))
        return time.perf_counter() - t0

    for name, kw in variants.items():
        fn = loop(kw)
        timed(fn, 1, 4)
        timed(fn, 1, IT)
        ts = min(timed(fn, 70 + i, 4) for i in range(3))
        tb = min(timed(fn, 80 + i, IT) for i in range(3))
        per = (tb - ts) / (IT - 4)
        print(f"{name:10s}: {per * 1e6:8.1f} us/iter", flush=True)


if __name__ == "__main__":
    main()
