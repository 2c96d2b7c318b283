"""Multi-chip sharding: batch data-parallelism + column sharding of the DP.

The reference is a single-threaded C library (SURVEY.md §2.3: "parallelism:
none"); this module is the scaling design mandated by BASELINE.md:

- axis ``data``: images of a batch sharded across chips (pure DP-style
  parallelism — no communication inside a step);
- axis ``cols``: image columns sharded across chips; the row-DP frontier
  exchanges delta_x-wide halos with neighbors every row via ``ppermute``
  (the sequence-parallel analog: rows are the sequential dimension, columns
  the parallel one — SURVEY.md §5 "long context").

Seam outputs are bitwise invariant to the shard count: the halo-extended
windowed min performs the identical f32 adds/compares as the unsharded scan.

Collectives ride ICI under ``shard_map``; no custom transport (XLA runtime
is the NCCL-equivalent, SURVEY.md §2.3 table).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax.experimental.shard_map import shard_map

from ..core.state import INF
from ..core import dp as dp_mod
from ..core.energy import energy as energy_fn


def make_mesh(n_devices: int | None = None, data: int | None = None):
    """Build a (data, cols) mesh over the available devices."""
    devs = jax.devices()
    n = n_devices or len(devs)
    devs = devs[:n]
    if data is None:
        # favor column sharding for few devices, split for many
        data = 1 if n <= 4 else 2
    assert n % data == 0
    import numpy as np
    return Mesh(np.array(devs).reshape(data, n // data), ("data", "cols"))


def _dp_local(e_loc, rig_loc, pref_left, delta_x: int, has_rig: bool,
              H: int, n_shards: int):
    """Per-shard forward DP with per-row halo exchange. Runs inside
    shard_map over 'cols'. e_loc: [H, Wl]."""
    Wl = e_loc.shape[-1]
    idx = jax.lax.axis_index("cols")
    rank_l, rank_r = dp_mod.rank_tables(delta_x)
    dxs = sorted(rank_l.keys(), key=lambda d: rank_l[d])
    d = delta_x

    right_perm = [(i, i + 1) for i in range(n_shards - 1)]
    left_perm = [(i + 1, i) for i in range(n_shards - 1)]

    def exchange(M_prev):
        """Extend the local frontier with neighbor halos -> [Wl + 2d]."""
        if n_shards == 1:
            halo_l = jnp.full((d,), INF)
            halo_r = jnp.full((d,), INF)
        else:
            # our rightmost d lanes -> right neighbor's left halo, etc.
            halo_l = jax.lax.ppermute(M_prev[-d:], "cols", right_perm)
            halo_r = jax.lax.ppermute(M_prev[:d], "cols", left_perm)
            halo_l = jnp.where(idx == 0, INF, halo_l)
            halo_r = jnp.where(idx == n_shards - 1, INF, halo_r)
        return jnp.concatenate([halo_l, M_prev, halo_r])

    def row_step(M_prev, row):
        e_row, rig_row = row
        ext = exchange(M_prev)                  # [2d + Wl]
        best = jnp.full((Wl,), INF)
        best_rank = jnp.full((Wl,), 127, jnp.int32)
        bp = jnp.zeros((Wl,), jnp.int8)
        for dx in dxs:
            # ext[d + x + dx] == M_prev[x + dx] with halo continuation
            c = jax.lax.dynamic_slice(ext, (d + dx,), (Wl,))
            if has_rig and dx != 0:
                rigc = jnp.float32((abs(dx) ** 1.5) / float(H))
                c = c + rig_row * rigc
            rank = jnp.where(pref_left, jnp.int32(rank_l[dx]),
                             jnp.int32(rank_r[dx]))
            take = (c < best) | ((c == best) & (rank < best_rank))
            best = jnp.where(take, c, best)
            best_rank = jnp.where(take, rank, best_rank)
            bp = jnp.where(take, jnp.int8(dx), bp)
        M = e_row + best
        return M, bp

    M0 = e_loc[0]
    M_last, bp_rest = jax.lax.scan(row_step, M0, (e_loc[1:], rig_loc[1:]))
    bp = jnp.concatenate(
        [jnp.zeros((1, Wl), jnp.int8), bp_rest], axis=0)
    return M_last, bp


def find_seam_sharded(mesh: Mesh, e_tot, rig, pref_left, delta_x: int,
                      has_rig: bool):
    """Column-sharded seam search. e_tot: [H, Wb] (+inf at invalid lanes).

    The forward DP runs sharded over 'cols' with halo exchange; the
    backtrack (a scalar chase) runs on the gathered backpointer map.
    Bitwise-identical to core.dp.find_seam.
    """
    H, Wb = e_tot.shape
    n_shards = mesh.shape["cols"]

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(P(None, "cols"), P(None, "cols"), P()),
        out_specs=(P("cols"), P(None, "cols")),
        check_rep=False)
    def run(e, r, pl):
        M_last, bp = _dp_local(e, r, pl, delta_x, has_rig, H, n_shards)
        return M_last, bp

    M_last, bp = run(e_tot, rig, pref_left)
    return dp_mod.backtrack(M_last, bp, pref_left)


@functools.partial(jax.jit,
                   static_argnames=("mesh", "delta_x", "nrg", "has_rig"))
def sharded_seam_step(mesh: Mesh, images, widths, pref_left,
                      delta_x: int = 1, nrg: int = 0,
                      has_rig: bool = False):
    """One full carve step over a batch, sharded (data, cols).

    images: [B, H, Wb, C] u8, batch sharded over 'data', columns over
    'cols'. Computes energy (sharded elementwise), runs the column-sharded
    DP per image, backtracks, and compacts — the unit that iterates in a
    sharded resize. Returns (new_images, seams [B, H]).
    """
    B, H, Wb, C = images.shape

    def per_image(img, w):
        e = energy_fn(img, w, nrg)
        rig = jnp.zeros((H, Wb), jnp.float32)
        seam = find_seam_sharded(mesh, e, rig, pref_left, delta_x, has_rig)
        # compact (roll+select, elementwise — shards over cols fine)
        lane = jnp.broadcast_to(jnp.arange(Wb, dtype=jnp.int32), (H, Wb))
        ge = (lane >= seam[:, None])[:, :, None]
        keep = (lane < (w - 1))[:, :, None]
        out = jnp.where(ge, jnp.roll(img, -1, axis=1), img)
        out = jnp.where(keep, out, jnp.uint8(0))
        return out, seam

    return jax.vmap(per_image)(images, widths)
