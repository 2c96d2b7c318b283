"""Microbenchmark VPU primitive costs inside a Pallas kernel.

Measures (a) dependent-chain latency and (b) independent-op throughput for
lane rolls / sublane rolls / elementwise, across array shapes. Slope-timed
across two iteration counts so fixed dispatch+tunnel latency cancels.

Usage: python scripts/microbench_ops.py
"""

import functools
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

K = 8   # parallel accumulators for throughput mode


def make_kernel(op_name, mode, f, L):
    def one(acc, v, salt):
        if op_name == "mul":
            return acc * v
        if op_name == "roll_lane":
            return pltpu.roll(acc, 1, axis=1)
        if op_name == "roll_sub":
            return pltpu.roll(acc, 1, axis=0)
        if op_name == "roll_lane_mul":        # roll + dependent elementwise
            return pltpu.roll(acc, 1, axis=1) * v
        raise ValueError(op_name)

    def kernel(x_ref, o_ref, *, iters):
        v = x_ref[:, :]
        if mode == "latency":
            def body(i, acc):
                for k in range(K):
                    acc = one(acc, v, k)
                return acc + jnp.float32(1e-30) * i
            o_ref[:, :] = jax.lax.fori_loop(0, iters, body, v)
        else:
            # K independent chains; each iter does K independent ops
            def body(i, accs):
                return tuple(one(a, v, k) + jnp.float32(1e-30) * i
                             for k, a in enumerate(accs))
            init = tuple(v + jnp.float32(k) for k in range(K))
            outs = jax.lax.fori_loop(0, iters, body, init)
            acc = outs[0]
            for a in outs[1:]:
                acc = acc + a
            o_ref[:, :] = acc
    return kernel


def timeit(op_name, mode, f, L, iters):
    kern = functools.partial(make_kernel(op_name, mode, f, L), iters=iters)
    fn = jax.jit(pl.pallas_call(
        kern, out_shape=jax.ShapeDtypeStruct((f, L), jnp.float32)))
    ts = []
    for s in range(3):
        x = jnp.asarray(np.random.rand(f, L) + s, jnp.float32)
        np.asarray(fn(x))
        t0 = time.perf_counter()
        np.asarray(fn(x + 1))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    it_lo, it_hi = 1000, 5000
    cases = [
        ("roll_lane", "latency", 4, 128),
        ("roll_lane", "thru", 4, 128),
        ("roll_lane", "thru", 8, 128),
        ("roll_lane", "thru", 32, 128),
        ("roll_sub", "latency", 4, 128),
        ("roll_sub", "thru", 4, 128),
        ("roll_sub", "thru", 32, 128),
        ("mul", "thru", 4, 128),
        ("mul", "thru", 32, 128),
        ("roll_lane_mul", "latency", 4, 128),
    ]
    for op, mode, f, L in cases:
        t_lo = timeit(op, mode, f, L, it_lo)
        t_hi = timeit(op, mode, f, L, it_hi)
        ns = (t_hi - t_lo) / ((it_hi - it_lo) * K) * 1e9
        print(f"  {op:14s} {mode:8s} ({f:3d},{L}): {ns:7.2f} ns/op")
        sys.stdout.flush()


if __name__ == "__main__":
    main()
