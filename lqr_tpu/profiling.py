"""Profiling / tracing / roofline accounting.

The reference's only instrumentation is a compiled-out wall-clock macro
(``__CLOCK_IT__``, /root/reference/src/render.c:36-38). The TPU framework
needs real observability (SURVEY.md §5): this module provides

- ``trace(logdir)``: context manager around ``jax.profiler`` — produces a
  Perfetto/XProf trace of the carve (kernels, DMA, host callbacks);
- ``annotate(name)``: named TraceAnnotation for host-side phases, nestable
  inside ``trace`` (shows as a labeled span);
- ``seam_roofline(...)``: analytic per-seam cost model — HBM bytes and VPU
  work of one seam step at a given size, with the machine's
  speed-of-light bound, so measured seams/s can be judged against the
  hardware ceiling (the BASELINE "seams/sec/chip ... speed-of-light"
  requirement);
- ``Stopwatch``: phase timing with the measurement hygiene this backend
  needs (sync via device fetch; see bench.py).
"""

from __future__ import annotations

import contextlib
import dataclasses
import time

import numpy as np


@contextlib.contextmanager
def trace(logdir: str):
    """Capture a device trace of the enclosed block (view with xprof /
    tensorboard-plugin-profile, or convert to Perfetto)."""
    import jax
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named span inside a trace (host-side phase annotation)."""
    import jax
    return jax.profiler.TraceAnnotation(name)


# v5e per-chip: 819 GB/s HBM, VPU 8x128 lanes x 4 ALUs at ~0.94 GHz.
_HBM_GBPS = {"tpu v5 lite": 819.0, "tpu v5e": 819.0, "tpu v4": 1228.0,
             "tpu v5p": 2765.0, "tpu v6e": 1640.0}
_DEFAULT_HBM = 819.0


@dataclasses.dataclass
class Roofline:
    hbm_bytes: int          # HBM traffic of one seam step
    seq_rows: int           # rows on the sequential DP critical path
    sol_seams_per_s: float  # speed-of-light bound from HBM alone
    breakdown: dict

    def efficiency(self, measured_seams_per_s: float) -> float:
        return measured_seams_per_s / self.sol_seams_per_s


def seam_roofline(H: int, W: int, has_bias: bool = False,
                  has_rig: bool = False, hbm_gbps: float | None = None
                  ) -> Roofline:
    """Analytic HBM cost of one seam step on the split hot path.

    Traffic per seam (engine._carve_once + the amortized per-chunk commit):
      energy:    read cur_b (f32) + write e (f32)
      DP fwd:    read e + write bp (i8)
      backtrack: read bp + write one-hot (i32) + read one-hot (reduce)
      compact:   read + write cur_b (and bias/rig planes when present)
    """
    if hbm_gbps is None:
        try:
            import jax
            kind = jax.devices()[0].device_kind.lower()
            hbm_gbps = next((v for k, v in _HBM_GBPS.items() if k in kind),
                            _DEFAULT_HBM)
        except Exception:
            hbm_gbps = _DEFAULT_HBM
    plane = H * W * 4
    n_extra = int(has_bias) + int(has_rig)
    b = {
        "energy": 2 * plane,
        "dp_forward": plane + H * W * 1 + (plane if has_rig else 0),
        "backtrack": H * W * 1 + 2 * plane,
        "compact": 2 * plane * (1 + n_extra),
        "commit_amortized": plane // 4,
    }
    total = sum(b.values())
    return Roofline(hbm_bytes=total, seq_rows=H,
                    sol_seams_per_s=hbm_gbps * 1e9 / total, breakdown=b)


class Stopwatch:
    """Phase timer with device-fetch sync (honest on async/relay
    backends). Use: sw = Stopwatch(); ...; sw.lap('carve', state.depth)."""

    def __init__(self):
        self.t0 = time.perf_counter()
        self.laps: list[tuple[str, float]] = []

    def lap(self, name: str, sync_on=None) -> float:
        if sync_on is not None:
            import jax
            np.asarray(jax.device_get(sync_on))
        now = time.perf_counter()
        dt = now - self.t0
        self.laps.append((name, dt))
        self.t0 = now
        return dt

    def report(self) -> str:
        return " | ".join(f"{n}: {dt * 1e3:.1f}ms" for n, dt in self.laps)
