"""Amortized per-seam device cost: ONE dispatch runs N full carves
back-to-back inside a single jit (lax.scan over stacked states), so the
~25 ms (and heavily jittered) tunnel dispatch latency is amortized to
noise. The per-seam figure divides out N*(seams - 4) against a 4-seam
chained baseline (cancels per-carve fixed costs: posmap build, compile
constants).

Usage: python scripts/devtime.py [W] [H] [N] [seams] [reps]
"""

import os
import sys
import time

import numpy as np

args = [a for a in sys.argv[1:] if not a.startswith("--")]
W = int(args[0]) if args else 512
H = int(args[1]) if len(args) > 1 else 384
N = int(args[2]) if len(args) > 2 else 16
SEAMS = int(args[3]) if len(args) > 3 else 400
REPS = int(args[4]) if len(args) > 4 else 5

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from bench import make_test_image  # noqa: E402
from lqr_tpu.core.state import EngineConfig, init_state, round_up  # noqa: E402
from lqr_tpu.core.engine import _extend_hot  # noqa: E402


def main():
    cfg = EngineConfig(H=H, Wb=round_up(W, 128), C=3, use_pallas=True)

    def stack(seed0):
        sts = [init_state(cfg, make_test_image(max(W, H),
                                               seed=seed0 + i)[:H, :W])
               for i in range(N)]
        return jax.tree.map(lambda *xs: jnp.stack(xs), *sts)

    @jax.jit
    def run(sts, k):
        def body(c, st):
            o = _extend_hot(cfg, st, k)
            return c + jnp.sum(o.vs), 0       # data-dependent: no pruning
        tot, _ = jax.lax.scan(body, jnp.int32(0), sts)
        return tot

    def timed(sts, k):
        # fresh inputs each timed call: the remote relay caches identical
        # executions, so never time a repeat of the same (sts, k).
        # device_get, not block_until_ready: only a fetch forces
        # completion through the relay.
        np.asarray(jax.device_get(jax.tree.leaves(sts)[0]))
        t0 = time.perf_counter()
        np.asarray(jax.device_get(run(sts, jnp.int32(k))))
        return time.perf_counter() - t0

    s_all = stack(10)
    timed(s_all, 4)                      # compile both trip counts
    timed(s_all, SEAMS)
    ts, tb = [], []
    for r in range(REPS):
        ts.append(timed(stack(100 + 50 * r), 4))
        tb.append(timed(stack(500 + 50 * r), SEAMS))
    t_s, t_b = np.median(ts), np.median(tb)
    per_seam = (t_b - t_s) / (N * (SEAMS - 4))
    print(f"{W}x{H} N={N} seams={SEAMS} reps={REPS}: "
          f"{per_seam*1e6:.2f} us/seam ({1.0/per_seam:.0f} seams/s) "
          f"[tbig={t_b*1e3:.0f}ms t4={t_s*1e3:.0f}ms "
          f"sprB={np.ptp(tb)*1e3:.0f}ms spr4={np.ptp(ts)*1e3:.0f}ms]")


if __name__ == "__main__":
    main()
