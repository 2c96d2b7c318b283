"""Measure the claim behind BatchCarver's `del use_pallas` (VERDICT r2
weak #7): for batched carving, does the vmapped scan DP actually beat
running the Pallas resident kernel per image?

Compares, for a cfg4-shaped wave (1MP images, width 1024):
  a) BatchCarver.extend (vmapped scan DP over the whole batch)
  b) the single-image resident-kernel path (ops.carve_resident via
     engine.extend_map) looped over the same images
Prints one JSON line; the loser's cost is the recorded evidence.

Usage: python scripts/bench_batch_paths.py [B] [seams]
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from bench import make_test_image  # noqa: E402

B = int(sys.argv[1]) if len(sys.argv) > 1 else 16
SEAMS = int(sys.argv[2]) if len(sys.argv) > 2 else 64
H, W = 1024, 1024


def main():
    import jax
    import jax.numpy as jnp
    from lqr_tpu.parallel.batch import BatchCarver
    from lqr_tpu.core.state import EngineConfig, init_state
    from lqr_tpu.core.engine import extend_map

    def sync(x):
        np.asarray(jax.device_get(x))

    def imgs(seed):
        return [make_test_image(W, seed=seed + i)[:H] for i in range(B)]

    # --- a) batched scan path
    def run_batch(seed):
        bc = BatchCarver(imgs(seed))
        sync(bc.state.depth)
        t0 = time.perf_counter()
        bc.extend(SEAMS)
        sync(bc.state.depth)
        return time.perf_counter() - t0

    run_batch(1)                                  # compile
    t_batch = min(run_batch(100 + i) for i in range(2))

    # --- b) resident kernel per image
    cfg = EngineConfig(H=H, Wb=W, C=3, use_pallas=True)

    def run_resident(seed):
        sts = [init_state(cfg, im) for im in imgs(seed)]
        for st in sts:
            sync(st.depth)
        t0 = time.perf_counter()
        outs = [extend_map(cfg, st, jnp.int32(SEAMS)) for st in sts]
        for o in outs:
            sync(o.depth)
        return time.perf_counter() - t0

    run_resident(1)
    t_res = min(run_resident(300 + i) for i in range(2))

    rate_b = B * SEAMS / t_batch
    rate_r = B * SEAMS / t_res
    print(json.dumps({
        "metric": "batched_scan_vs_resident_per_image",
        "images": B, "seams": SEAMS, "size": f"{W}x{H}",
        "batched_scan_img_seams_per_s": round(rate_b, 1),
        "resident_loop_img_seams_per_s": round(rate_r, 1),
        "scan_over_resident": round(rate_b / rate_r, 2),
        "verdict": ("batched scan wins" if rate_b > rate_r
                    else "resident loop wins"),
    }))


if __name__ == "__main__":
    main()
