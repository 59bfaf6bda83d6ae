"""Offline simulation: how much sweep volume would in-kernel gating save?

For the bounce-like wavefront on the 82k-tri icosphere, reproduces the
production sort + cull lists, then counts, per tile and per front-to-back
chunk rank, whether the chunk survives
  (a) no gate              (current batched sweep: all union chunks)
  (b) a per-8-chunk-sub-block gate with ORACLE t_cur (= final hit t)
  (c) a per-chunk gate with oracle t_cur
The oracle numbers upper-bound what any in-kernel gate can save (real
 t_cur converges to the oracle only as the sweep progresses).

PYTHONPATH=/root/repo:/root/.axon_site python tools/trav_gate_sim.py
"""
import sys

import jax
import jax.numpy as jnp
import numpy as np

from tpu_path_tracer.core.config import LAMBERTIAN
from tpu_path_tracer.kernels.pallas.traversal import (
    CHUNKS_PER_STEP, TILE, _inv_dir, _morton_key6d, _slab_entries,
    chunk_cull, pack_tris, scene_diam, tile_closest_hit)
from tpu_path_tracer.scene import procedural
from tpu_path_tracer.scene.builder import SceneBuilder

N = 512 * 512


def main():
    b = SceneBuilder()
    m = b.add_material("w", LAMBERTIAN, [0.7, 0.7, 0.7])
    b.add_mesh(procedural.icosphere(subdivisions=6, radius=0.8), m)
    scene, meta = b.build(bvh="median")
    tris, bvh = scene.triangles, scene.bvh
    packed = pack_tris(tris)
    e0, e1, e2, tcol, cmin, cmax = packed
    nt = int(tris.count)
    n_chunks = int(cmin.shape[0])

    k = np.random.default_rng(11)
    op = k.normal(size=(N, 3))
    op /= np.linalg.norm(op, axis=1, keepdims=True)
    dd = k.normal(size=(N, 3))
    dd /= np.linalg.norm(dd, axis=1, keepdims=True)
    o_b = jnp.asarray((op * 0.81).astype(np.float32))
    d_b = jnp.asarray(dd.astype(np.float32))
    t0 = jnp.full((N,), 1e9, jnp.float32)

    # True hit t (production traversal).
    t_hit, i_hit = tile_closest_hit(o_b, d_b, bvh, packed, t0,
                                    t_min=1e-4, n_tris=nt)
    diam = scene_diam(o_b, cmin, cmax)
    t_oracle = jnp.where(i_hit >= 0, t_hit, jnp.minimum(t0, diam))

    # Production sort.
    morton = _morton_key6d(o_b, d_b, bvh.mins[0], bvh.maxs[0])
    (_, ox, oy, oz, dx, dy, dz, ts, tor) = jax.lax.sort(
        [morton, o_b[:, 0], o_b[:, 1], o_b[:, 2],
         d_b[:, 0], d_b[:, 1], d_b[:, 2], t0, t_oracle], num_keys=1)
    o_s = jnp.stack([ox, oy, oz], axis=1)
    d_s = jnp.stack([dx, dy, dz], axis=1)

    order, entry_sorted, count = chunk_cull(o_s, d_s, ts, cmin, cmax)
    n_tiles = N // TILE
    print("union sum", int(jnp.sum(count)),
          "avg", float(jnp.sum(count)) / n_tiles)

    # Per (tile, rank): does any ray exact-slab-hit the chunk below its
    # oracle t?  Blocked over tiles.
    cp = order.shape[1]
    iv_s = _inv_dir(d_s)

    @jax.jit
    def gate_counts(o_s, iv_s, tor, order):
        def tile_block(carry, inp):
            o_t, iv_t, tc_t, order_t = inp     # [TB*TILE,...], [TB, cp]
            tb = order_t.shape[0]
            ent = _slab_entries(o_t, iv_t, tc_t, cmin, cmax)  # [TB*T, C]
            ent = jnp.concatenate(
                [ent, jnp.full((ent.shape[0], 1), 3e38)], axis=1)
            live = (ent <= tc_t[:, None]).reshape(tb, TILE, n_chunks + 1)
            # gather per-rank liveness: [TB, TILE, cp]
            lr = jnp.take_along_axis(
                live, jnp.broadcast_to(order_t[:, None, :],
                                       (tb, TILE, cp)), axis=2)
            any_r = jnp.any(lr, axis=1)                      # [TB, cp]
            chunk_live = jnp.sum(any_r, axis=1)              # per tile
            sb = any_r.reshape(tb, cp // CHUNKS_PER_STEP,
                               CHUNKS_PER_STEP)
            sb_live = jnp.sum(jnp.any(sb, axis=2), axis=1)
            return carry, (chunk_live, sb_live)

        TB = 64
        nb = n_tiles // TB
        _, (cl, sl) = jax.lax.scan(
            tile_block, None,
            (o_s.reshape(nb, TB * TILE, 3),
             iv_s.reshape(nb, TB * TILE, 3),
             tor.reshape(nb, TB * TILE),
             order.reshape(nb, TB, cp)))
        return jnp.sum(cl), jnp.sum(sl)

    cl, sl = gate_counts(o_s, iv_s, tor, order)
    union = int(jnp.sum(count))
    print(f"oracle per-chunk gate: {int(cl)} swept "
          f"({int(cl)/union:.2%} of union)")
    print(f"oracle per-sub-block(8) gate: {int(sl)*CHUNKS_PER_STEP} swept "
          f"({int(sl)*CHUNKS_PER_STEP/union:.2%} of union)")


if __name__ == "__main__":
    main()
