"""Per-ray candidate statistics for the pair-phase design.

For coherent / bounce-like wavefronts on the 82k-tri icosphere, measures:
  * per-ray EXACT candidate chunk count (slab vs all chunks, t_cap = diam)
  * rank of the winning chunk in the ray's front-to-back candidate order
  * count after capping t to the true hit t (how many chunks a perfect
    front-to-back walk would visit)

PYTHONPATH=/root/repo:/root/.axon_site python tools/trav_stats.py
"""
import sys

import jax
import jax.numpy as jnp
import numpy as np

from tpu_path_tracer.core.config import LAMBERTIAN
from tpu_path_tracer.kernels.pallas.traversal import (
    pack_tris, scene_diam, tile_closest_hit, _inv_dir, _slab_entries)
from tpu_path_tracer.scene import procedural
from tpu_path_tracer.scene.builder import SceneBuilder

N = 512 * 512


def main():
    subdiv = int(sys.argv[sys.argv.index("--subdiv") + 1]) \
        if "--subdiv" in sys.argv else 6
    b = SceneBuilder()
    m = b.add_material("w", LAMBERTIAN, [0.7, 0.7, 0.7])
    b.add_mesh(procedural.icosphere(subdivisions=subdiv, radius=0.8), m)
    scene, meta = b.build(bvh="median")
    tris, bvh = scene.triangles, scene.bvh
    packed = pack_tris(tris)
    e0, e1, e2, tcol, cmin, cmax = packed
    nt = int(tris.count)
    n_chunks = int(cmin.shape[0])
    print("tris", nt, "chunks", n_chunks)

    k = np.random.default_rng(11)
    xs = (np.arange(512) + 0.5) / 512 * 2 - 1
    px, py = np.meshgrid(xs, xs)
    d = np.stack([px.ravel() * 0.6, py.ravel() * 0.6, -np.ones(N)], axis=1)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    o_c = np.tile(np.array([[0.0, 0.0, 3.0]], np.float32), (N, 1))
    d_c = d.astype(np.float32)

    op = k.normal(size=(N, 3))
    op /= np.linalg.norm(op, axis=1, keepdims=True)
    dd = k.normal(size=(N, 3))
    dd /= np.linalg.norm(dd, axis=1, keepdims=True)
    o_b = (op * 0.81).astype(np.float32)
    d_b = dd.astype(np.float32)

    t0 = jnp.full((N,), 1e9, jnp.float32)

    @jax.jit
    def stats(o, dvec, t_hit, has_hit):
        diam = scene_diam(o, cmin, cmax)
        iv = _inv_dir(dvec)
        t_cap = jnp.minimum(t0, diam)

        def block(carry, inp):
            ob, ivb, tc, th, hh = inp
            ent = _slab_entries(ob, ivb, tc, cmin, cmax)   # [B, C]
            cand = ent < 1e30
            n_cand = jnp.sum(cand, axis=1)
            # candidates whose entry <= true hit t (a perfect walk visits
            # exactly these before terminating)
            n_before = jnp.sum(cand & (ent <= th[:, None]), axis=1)
            n_before = jnp.where(hh, n_before, n_cand)
            return carry, (n_cand, n_before)

        B = 8192
        nb = N // B
        _, (n_cand, n_before) = jax.lax.scan(
            block, None,
            (o.reshape(nb, B, 3), iv.reshape(nb, B, 3),
             t_cap.reshape(nb, B), t_hit.reshape(nb, B),
             has_hit.reshape(nb, B)))
        return n_cand.reshape(-1), n_before.reshape(-1)

    for name, oo, dd_ in [("coherent", o_c, d_c), ("bounce", o_b, d_b)]:
        oo, dd_ = jnp.asarray(oo), jnp.asarray(dd_)
        t, i = tile_closest_hit(oo, dd_, bvh, packed, t0,
                                t_min=1e-4, n_tris=nt)
        hit = np.asarray(i) >= 0
        th = jnp.where(jnp.asarray(hit), t, jnp.float32(3e38))
        nc, nbef = map(np.asarray, stats(oo, dd_, th, jnp.asarray(hit)))
        print(f"{name}: hits {hit.sum()}/{N}")
        for lbl, arr in [("cand", nc), ("visited(term)", nbef)]:
            q = np.percentile(arr, [50, 90, 99, 100])
            print(f"  {lbl}: mean {arr.mean():.2f} p50 {q[0]:.0f} "
                  f"p90 {q[1]:.0f} p99 {q[2]:.0f} max {q[3]:.0f} "
                  f"sum {arr.sum()}")


if __name__ == "__main__":
    main()
