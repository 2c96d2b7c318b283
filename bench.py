"""Benchmark: seams/sec/chip at 2048x2048, 100-seam removal (BASELINE.md).

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "seams/s", "vs_baseline": N}

- value: seams/sec on the default backend (the real TPU chip under the
  driver; falls back to whatever backend is available).
- vs_baseline: ratio to the single-core C++ reference carver
  (native/lqr_ref.cpp — the liblqr stand-in; liblqr itself is not
  installable here, see SPEC.md). BASELINE.md's north star is >= 50x.

Also verifies correctness en passant: the TPU visibility map of the first
K seams must equal the C++ reference's bit-for-bit.

Resilience contract (VERDICT r3 weak #1): the tunneled TPU backend can
throw transient FAILED_PRECONDITION/UNAVAILABLE errors mid-phase. Every
device phase runs under a bounded retry that clears JAX caches and
rebuilds state from scratch; and no matter what fails, this script emits
exactly one JSON line (with an "error" field naming what was lost and
whatever phases did succeed) and exits 0. A driver capture can therefore
never record rc=1 because the chip hiccuped.

Usage: python bench.py [--size 2048] [--seams 100] [--ref-seams 12]
"""

import argparse
import json
import sys
import time

import numpy as np


def make_test_image(n: int, seed: int = 0) -> np.ndarray:
    """Smooth structured test image (pure noise has degenerate seams)."""
    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, (n, n, 3)).astype(np.float32)
    for _ in range(3):
        img = (img + np.roll(img, 1, 0) + np.roll(img, 1, 1)
               + np.roll(img, -1, 0) + np.roll(img, -1, 1)) / 5.0
    yy, xx = np.mgrid[0:n, 0:n]
    img[:, :, 0] += 60 * np.sin(xx / 37.0) + 40 * np.cos(yy / 53.0)
    img[:, :, 1] += 50 * np.cos((xx + yy) / 41.0)
    return np.clip(img, 0, 255).astype(np.uint8)


def _is_transient(e: BaseException) -> bool:
    """Device/runtime errors worth retrying (vs programming errors)."""
    name = type(e).__name__
    if name in ("JaxRuntimeError", "XlaRuntimeError", "InternalError"):
        return True
    s = str(e)
    return any(tag in s for tag in (
        "FAILED_PRECONDITION", "UNAVAILABLE", "DEADLINE_EXCEEDED",
        "INTERNAL", "ABORTED", "RESOURCE_EXHAUSTED", "TPU backend error"))


def device_retry(fn, what: str, attempts: int = 3, sleep_s: float = 3.0):
    """Run fn(); on a transient backend error, clear JAX caches (dropping
    any executable whose underlying device state went bad) and retry with
    linear backoff. fn must rebuild all device state itself — callers pass
    closures that start from host arrays. Non-transient errors propagate
    immediately; the last transient attempt's error propagates too."""
    import jax
    for a in range(attempts):
        try:
            return fn()
        except Exception as e:  # noqa: BLE001 — classified below
            if not _is_transient(e) or a == attempts - 1:
                raise
            sys.stderr.write(
                f"[bench] transient device error in {what} "
                f"(attempt {a + 1}/{attempts}): {type(e).__name__}: "
                f"{str(e)[:200]}; clearing caches and retrying\n")
            try:
                jax.clear_caches()
            except Exception:  # noqa: BLE001 — best-effort cleanup
                pass
            time.sleep(sleep_s * (a + 1))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=2048)
    ap.add_argument("--seams", type=int, default=100)
    ap.add_argument("--ref-seams", type=int, default=12,
                    help="seams timed on the single-core C++ baseline "
                         "(scaled; full 100 would take minutes)")
    ap.add_argument("--check-seams", type=int, default=6,
                    help="seams cross-checked bit-exact vs the C++ ref")
    ap.add_argument("--no-pallas", action="store_true")
    args = ap.parse_args()

    n = args.size
    result = {
        "metric": f"seams_per_sec_{n}x{n}_remove{args.seams}",
        "value": 0.0,
        "unit": "seams/s",
        "vs_baseline": 0.0,
    }
    errors = []

    try:
        _run(args, result, errors)
    except Exception as e:  # noqa: BLE001 — the JSON line must still go out
        errors.append(f"fatal:{type(e).__name__}:{str(e)[:300]}")
    if errors:
        result["error"] = "; ".join(errors)
    print(json.dumps(result))
    return 0


def _run(args, result, errors):
    import jax
    import jax.numpy as jnp
    from lqr_tpu.core.state import EngineConfig, init_state, round_up
    from lqr_tpu.core.engine import extend_map
    from lqr_tpu import native

    n = args.size
    img = make_test_image(n)

    backend = jax.default_backend()
    use_pallas = (backend == "tpu") and not args.no_pallas
    result["backend"] = backend
    result["pallas"] = use_pallas
    cfg = EngineConfig(H=n, Wb=round_up(n, 128), C=3,
                       use_pallas=use_pallas)

    # --- CPU single-core baseline first (no device state; can't be lost
    # to a chip transient). Best-of-2 favors the baseline on this noisy
    # 2-core host.
    cpu_sps = max(args.ref_seams / native.bench(img, args.ref_seams)
                  for _ in range(2))
    result["cpu_singlecore_seams_per_sec"] = round(cpu_sps, 3)

    # --- correctness cross-check (small depth, bit-exact)
    def check():
        st0 = init_state(cfg, img)
        stc = extend_map(cfg, st0, jnp.int32(args.check_seams))
        return np.asarray(jax.device_get(stc.vs))[:, :n]

    try:
        vs_dev = device_retry(check, "bit-exact check")
        vs_ref = native.carve(img, args.check_seams)
        exact = bool(np.array_equal(vs_dev, vs_ref))
        result["bit_exact_vs_ref"] = exact
        if not exact:
            result["mismatch_frac"] = float((vs_dev != vs_ref).mean())
    except Exception as e:  # noqa: BLE001
        errors.append(f"check:{type(e).__name__}:{str(e)[:200]}")

    # --- device timing: warmup (compile), then SLOPE timing.
    # NOTE measurement hygiene on this backend (axon, a tunneled chip):
    # (a) the remote relay caches identical (program, inputs) pairs, so
    #     every timed call uses a fresh image;
    # (b) each dispatch+sync round-trip costs a FIXED ~25 ms of tunnel
    #     latency regardless of the work inside (measured: a jitted no-op
    #     costs the same as 400 fused loop iterations). The device rate is
    #     therefore measured as a slope: (t(N seams) - t(4 seams)) / (N-4),
    #     min-of-3 each, which cancels the fixed dispatch+sync latency.
    def sync(x):
        np.asarray(jax.device_get(x))

    def one(n_seams, seed):
        st = init_state(cfg, make_test_image(n, seed=seed))
        sync(st.depth)          # H2D transfer + init are not carve time
        t0 = time.perf_counter()
        o = extend_map(cfg, st, jnp.int32(n_seams))
        sync(o.depth)
        return time.perf_counter() - t0

    def timed():
        for k in (4, args.seams):   # compile both trip counts
            one(k, seed=1)
        t_small = min(one(4, seed=70 + i) for i in range(3))
        t_full = min(one(args.seams, seed=80 + i) for i in range(3))
        return t_small, t_full

    try:
        t_small, t_full = device_retry(timed, "slope timing")
    except Exception as e:  # noqa: BLE001
        errors.append(f"timing:{type(e).__name__}:{str(e)[:200]}")
        return

    per_seam = (t_full - t_small) / (args.seams - 4)
    dev_sps = 1.0 / per_seam

    from lqr_tpu.profiling import seam_roofline
    rf = seam_roofline(n, n)

    result.update({
        "value": round(dev_sps, 3),
        "vs_baseline": round(dev_sps / cpu_sps, 2),
        "roofline_frac": round(dev_sps / rf.sol_seams_per_s, 3),
        # what bounds the remainder (VERDICT r2 #10): the sequential
        # dependency chains, not HBM — see profiling.seam_roofline
        "bound": rf.bound,
        "chain_floor_frac": round(dev_sps / rf.chain_floor_seams_per_s,
                                  3),
        "chain_calibration": rf.chain_calibration,
        "per_seam_us": round(per_seam * 1e6, 1),
        "dispatch_roundtrip_ms_excluded": round(t_small * 1e3, 1),
    })


if __name__ == "__main__":
    sys.exit(main())
