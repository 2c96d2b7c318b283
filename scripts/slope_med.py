"""Robust per-seam slope at a given size: interleaved t(small)/t(big)
samples, median-of-N — the tunnel backend timeshares, so min-of-3 is not
enough. Usage: python scripts/slope_med.py [W] [H] [reps] [n_big]"""

import os
import sys
import time

import numpy as np

args = [a for a in sys.argv[1:] if not a.startswith("--")]
W = int(args[0]) if args else 512
H = int(args[1]) if len(args) > 1 else 384
REPS = int(args[2]) if len(args) > 2 else 9
NBIG = int(args[3]) if len(args) > 3 else 100

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from bench import make_test_image  # noqa: E402
from lqr_tpu.core.state import EngineConfig, init_state, round_up  # noqa: E402
from lqr_tpu.core.engine import extend_map  # noqa: E402


def main():
    cfg = EngineConfig(H=H, Wb=round_up(W, 128), C=3, use_pallas=True)

    def sync(x):
        np.asarray(jax.device_get(x))

    def one(n_seams, seed):
        img = make_test_image(max(W, H), seed=seed)[:H, :W]
        st = init_state(cfg, np.ascontiguousarray(img))
        sync(st.depth)
        t0 = time.perf_counter()
        o = extend_map(cfg, st, jnp.int32(n_seams))
        sync(o.depth)
        return time.perf_counter() - t0

    for k in (4, NBIG):
        one(k, seed=1)
    ts, tb = [], []
    for i in range(REPS):
        ts.append(one(4, seed=100 + i))
        tb.append(one(NBIG, seed=200 + i))
    t_s, t_b = np.median(ts), np.median(tb)
    per_seam = (t_b - t_s) / (NBIG - 4)
    print(f"{W}x{H} n_big={NBIG} median-of-{REPS}: "
          f"{per_seam*1e6:.1f} us/seam ({1.0/per_seam:.0f} seams/s)  "
          f"[t4={t_s*1e3:.1f}ms tbig={t_b*1e3:.1f}ms "
          f"spread4={np.ptp(ts)*1e3:.1f}ms spreadB={np.ptp(tb)*1e3:.1f}ms]")


if __name__ == "__main__":
    main()
