"""Attribute the extend_map-vs-raw-loop per-seam gap at big sizes (r5).

Round-4 measured ~210 us/seam for a bare fori_loop of the carve step but
~310 us/seam for engine extend_map at 2048^2 (BENCH_r04); the ~100 us
difference was never pinned.  This script stacks the suspects one at a
time, each slope-timed ((t(IT) - t(8)) / (IT - 8), min-of-3, fresh input
content per rep — see memory: the relay caches identical executions and
every dispatch costs ~25 ms flat):

  raw        static-bound fori_loop of (energy + DP + backtrack + compact)
  raw_dyn    the same loop with a TRACED bound (while lowering, like kc)
  hist       raw_dyn + [KC, H] history carry + dynamic_update_slice
  hotchunk   engine._hot_chunk verbatim (adds pref_is_left, pack/unpack)
  extend     engine._extend_hot verbatim (adds outer while + chunk commit;
             IT <= KC so commit cost is fixed and cancels in the slope)

Usage: python scripts/attr2048.py [N] [IT]
"""

import os
import sys
import time

import numpy as np

N = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
IT = int(sys.argv[2]) if len(sys.argv) > 2 else 72
I0 = 8

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from bench import make_test_image  # noqa: E402
from lqr_tpu.core.state import EngineConfig, init_state, round_up  # noqa: E402
from lqr_tpu.core.energy import energy_from_plane  # noqa: E402
from lqr_tpu.core import engine  # noqa: E402
from lqr_tpu.ops import dp_pallas  # noqa: E402


def main():
    cfg = EngineConfig(H=N, Wb=round_up(N, 128), C=3, use_pallas=True)
    H, Wb = cfg.H, cfg.Wb
    lane = jnp.broadcast_to(jnp.arange(Wb, dtype=jnp.int32), (H, Wb))
    w0 = jnp.int32(N)

    def step(cur_b, j):
        pl_ = engine.pref_is_left(j + 1, cfg.side_switch_freq)
        e = energy_from_plane(cur_b, w0, cfg.nrg)
        seam = dp_pallas.find_seam_pallas(e, None, pl_, 1, False)
        ge = lane >= seam[:, None]
        out = jnp.where(ge, jnp.roll(cur_b, -1, axis=1), cur_b)
        return seam, jnp.where(lane < (w0 - 1), out, jnp.float32(0))

    # every variant reduces its live outputs to ONE scalar INSIDE the jit
    # (memory: the relay does not reliably sync on buffer readiness; a
    # 4-byte computed scalar fetch is the only trustworthy completion
    # barrier, and in-jit reduction also rules out transfer time)

    def raw_fn(b0, iters):
        def body(j, b):
            return step(b, j)[1]
        out = jax.lax.fori_loop(0, iters, body, b0)
        return jnp.sum(out, dtype=jnp.float32)

    raw_static = jax.jit(raw_fn, static_argnums=1)
    raw_dyn = jax.jit(raw_fn)

    @jax.jit
    def hist_v(b0, iters):
        h0 = jnp.zeros((engine.KC, H), jnp.int32)

        def body(j, c):
            b, hist = c
            seam, b = step(b, j)
            hist = jax.lax.dynamic_update_slice(hist, seam[None], (j, 0))
            return b, hist
        b, hist = jax.lax.fori_loop(0, iters, body, (b0, h0))
        return jnp.sum(b, dtype=jnp.float32) + jnp.sum(hist).astype(
            jnp.float32)

    @jax.jit
    def hotchunk(b0, iters):
        b, _, _, hist = engine._hot_chunk(cfg, b0, None, None, w0,
                                          jnp.int32(0), iters)
        return jnp.sum(b, dtype=jnp.float32) + jnp.sum(hist).astype(
            jnp.float32)

    @jax.jit
    def extend(st, iters):
        o = engine._extend_hot(cfg, st, iters)
        return (jnp.sum(o.cur_b, dtype=jnp.float32)
                + jnp.sum(o.vs).astype(jnp.float32))

    @jax.jit
    def extend_nowhile(st, iters):
        """One chunk, no outer while: _hot_chunk + commit, traced state."""
        kc = jnp.minimum(jnp.int32(engine.KC), iters)
        b, _, _, hist = engine._hot_chunk(cfg, st.cur_b, None, None,
                                          st.ref_w, st.depth, kc)
        vs = engine._commit_hist(st.vs, st.ref_w, st.depth, kc, hist)
        return (jnp.sum(b, dtype=jnp.float32)
                + jnp.sum(vs).astype(jnp.float32))

    @jax.jit
    def extend_nocommit(st, iters):
        """_extend_hot's while structure, commit ablated."""
        k = jnp.asarray(iters, jnp.int32)

        def cond(c):
            return c[-1] < k

        def body(c):
            cur_b, vs, depth, done = c
            kc = jnp.minimum(jnp.int32(engine.KC), k - done)
            cur_b, _, _, hist = engine._hot_chunk(
                cfg, cur_b, None, None, st.ref_w, depth, kc)
            vs = vs + jnp.sum(hist).astype(jnp.int32)   # keep hist live
            return (cur_b, vs, depth + kc, done + kc)

        cur_b, vs, depth, _ = jax.lax.while_loop(
            cond, body, (st.cur_b, st.vs, st.depth, jnp.int32(0)))
        return (jnp.sum(cur_b, dtype=jnp.float32)
                + jnp.sum(vs).astype(jnp.float32))

    extend_donate = jax.jit(
        lambda st, iters: (lambda o: jnp.sum(o.cur_b, dtype=jnp.float32)
                           + jnp.sum(o.vs).astype(jnp.float32))(
            engine._extend_hot(cfg, st, iters)),
        donate_argnums=0)

    @jax.jit
    def fused_step(b0, iters):
        """fori of carve_step_pallas (XLA energy + fused
        backtrack-with-compact) — re-measuring the r4 negative under the
        r5 flat-loop conditions."""
        z = jnp.zeros((H, Wb), jnp.float32)

        def body(j, b):
            pl_ = engine.pref_is_left(j + 1, cfg.side_switch_freq)
            _, b2, _, _ = dp_pallas.carve_step_pallas(
                b, z, z, w0, pl_, 1, False, False, cfg.nrg)
            return b2
        out = jax.lax.fori_loop(0, iters, body, b0)
        return jnp.sum(out, dtype=jnp.float32)

    def fetch(x):
        return float(np.asarray(jax.device_get(x)))

    def timed(fn, seed, iters, state=False, static=False):
        st = init_state(cfg, make_test_image(N, seed=seed))
        arg = st if state else st.cur_b
        fetch(jnp.max(st.cur_b))          # full-reduce: transfer complete
        t0 = time.perf_counter()
        o = fn(arg, iters if static else jnp.int32(iters))
        fetch(o)
        return time.perf_counter() - t0

    import os as _os
    sel = _os.environ.get("ATTR_VARIANTS")
    variants = [
        ("hotchunk",       dict()),
        ("extend",         dict(state=True)),
        ("extend_nowhile", dict(state=True)),
        ("extend_nocommit", dict(state=True)),
        ("extend_donate",  dict(state=True)),
        ("fused_step",     dict()),
    ]
    if sel:
        want = sel.split(",")
        variants = [v for v in variants if v[0] in want]
    fns = dict(raw_static=raw_static, raw_dyn=raw_dyn, hist=hist_v,
               hotchunk=hotchunk, extend=extend,
               extend_nowhile=extend_nowhile,
               extend_nocommit=extend_nocommit,
               extend_donate=extend_donate, fused_step=fused_step)

    for name, kw in variants:
        fn = fns[name]
        timed(fn, 1, I0, **kw)          # compile both trip counts
        timed(fn, 1, IT, **kw)
        ts = min(timed(fn, 70 + i, I0, **kw) for i in range(3))
        tb = min(timed(fn, 80 + i, IT, **kw) for i in range(3))
        per = (tb - ts) / (IT - I0)
        print(f"{name:11s}: {per * 1e6:8.1f} us/seam   "
              f"(t{I0}={ts*1e3:7.1f} ms  t{IT}={tb*1e3:7.1f} ms)",
              flush=True)


if __name__ == "__main__":
    main()
