"""Decompose the resident kernel's per-seam cost at a given size.

Slope-timed (fresh inputs each call; fixed ~25 ms tunnel latency cancelled),
comparing: full resident carve vs forward-sweep-only (LQR_RESIDENT_FWD_ONLY).

Usage: python scripts/profile_resident.py [W] [H] [--fwd-only]
"""

import os
import sys
import time

import numpy as np

fwd_only = "--fwd-only" in sys.argv
if fwd_only:
    os.environ["LQR_RESIDENT_FWD_ONLY"] = "1"
args = [a for a in sys.argv[1:] if not a.startswith("--")]
W = int(args[0]) if args else 512
H = int(args[1]) if len(args) > 1 else 384

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

    n_full = 100
    for k in (4, n_full):
        one(k, seed=1)
    t_small = min(one(4, seed=70 + i) for i in range(3))
    t_full = min(one(n_full, seed=80 + i) for i in range(3))
    per_seam = (t_full - t_small) / (n_full - 4)
    mode = "fwd_only" if fwd_only else "full"
    print(f"{W}x{H} {mode}: {per_seam*1e6:.1f} us/seam "
          f"({1.0/per_seam:.0f} seams/s)")


if __name__ == "__main__":
    main()
