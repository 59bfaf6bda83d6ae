"""Component-level MARGINAL timing of the traversal pipeline on hardware.

Chained-marginal methodology (see bench.py docstring): each iteration's
input depends on the previous output, and the reported number is the
marginal cost between a short and a long chain, so the ~25-30 ms fixed
axon dispatch overhead cancels.

PYTHONPATH=/root/repo:/root/.axon_site python tools/trav_prof.py
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

from tpu_path_tracer.core.config import LAMBERTIAN
from tpu_path_tracer.kernels.pallas import traversal as T
from tpu_path_tracer.scene import procedural
from tpu_path_tracer.scene.builder import SceneBuilder

N = 512 * 512


def timeit(make_step, iters=10):
    step = jax.jit(make_step)
    float(step(jnp.float32(0)))

    def run(n):
        e = jnp.float32(0)
        t0 = time.perf_counter()
        for _ in range(n):
            e = step(e)
        float(e)
        return time.perf_counter() - t0

    t1, t2 = run(2), run(2 + iters)
    return (t2 - t1) / iters


def main():
    import sys
    subdiv = int(sys.argv[sys.argv.index("--subdiv") + 1]) \
        if "--subdiv" in sys.argv else 6
    b = SceneBuilder()
    m = b.add_material("w", LAMBERTIAN, [0.7, 0.7, 0.7])
    b.add_mesh(procedural.icosphere(subdivisions=subdiv, radius=0.8), m)
    scene, meta = b.build(bvh="median")
    tris, bvh = scene.triangles, scene.bvh
    packed = T.pack_tris(tris)
    e0, e1, e2, tcol, cmin, cmax = packed
    C = int(cmin.shape[0])
    g = T._superchunk_size(C)
    smin, smax = T.superchunk_boxes(cmin, cmax, g)
    print(f"C {C} g {g} S {smin.shape[0]}", flush=True)

    k = np.random.default_rng(11)
    xs = (np.arange(512) + 0.5) / 512 * 2 - 1
    px, py = np.meshgrid(xs, xs)
    d = np.stack([px.ravel() * 0.6, py.ravel() * 0.6, -np.ones(N)], axis=1)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    o = np.tile(np.array([[0.0, 0.0, 3.0]], np.float32), (N, 1))
    o_c = jnp.asarray(o.astype(np.float32))
    d_c = jnp.asarray(d.astype(np.float32))
    op = k.normal(size=(N, 3)); op /= np.linalg.norm(op, axis=1, keepdims=True)
    dd = k.normal(size=(N, 3)); dd /= np.linalg.norm(dd, axis=1, keepdims=True)
    o_b = jnp.asarray((op * 0.81).astype(np.float32))
    d_b = jnp.asarray(dd.astype(np.float32))
    t0v = jnp.full((N,), 1e9, jnp.float32)

    def chain(x):
        return jnp.float32(x) * 0e-30

    for name, oo, ddv in [("coherent", o_c, d_c), ("bounce", o_b, d_b)]:
        def lead_step(e, oo=oo, ddv=ddv):
            lead = T.lead_superchunk(oo + e, ddv, t0v, smin, smax)
            return chain(jnp.sum(lead)) + e * 0.5

        def mor_step(e, oo=oo, ddv=ddv):
            mk = T._morton_key6d(oo + e, ddv, bvh.mins[0], bvh.maxs[0])
            return chain(jnp.sum(mk)) + e * 0.5

        def sort_step(e, oo=oo, ddv=ddv):
            mk = T._morton_key6d(oo + e, ddv, bvh.mins[0], bvh.maxs[0])
            p = jnp.argsort(mk)
            return chain(jnp.sum(p)) + e * 0.5

        # cull pieces on pre-sorted rays
        lead0 = T.lead_superchunk(oo, ddv, t0v, smin, smax)
        mor0 = T._morton_key6d(oo, ddv, bvh.mins[0], bvh.maxs[0])
        key0 = ((jnp.asarray(lead0).astype(jnp.uint32) << jnp.uint32(24))
                | (mor0.astype(jnp.uint32) >> jnp.uint32(6)))
        perm = jnp.argsort(key0)
        o_s, d_s, t_s = oo[perm], ddv[perm], t0v[perm]

        def cull_step(e, o_s=o_s, d_s=d_s, t_s=t_s):
            order, ent, count = T.chunk_cull(o_s + e, d_s, t_s, cmin, cmax)
            return chain(jnp.sum(count)) + e * 0.5

        def full_step(e, oo=oo, ddv=ddv):
            t, i = T.tile_closest_hit(oo + e, ddv, bvh, packed, t0v,
                                      t_min=1e-4, n_tris=int(tris.count))
            return chain(jnp.sum(i)) + e * 0.5

        r = {}
        for nm, st in [("lead", lead_step), ("morton", mor_step),
                       ("mor+argsort", sort_step), ("cull", cull_step),
                       ("full", full_step)]:
            r[nm] = timeit(st) * 1e3
        order, ent, count = jax.jit(T.chunk_cull)(o_s, d_s, t_s, cmin, cmax)
        cnt = int(np.asarray(count).sum())
        sweep = r["full"] - r["cull"] - r["mor+argsort"] - r["lead"]
        print(f"{name}: lead {r['lead']:.2f} morton {r['morton']:.2f} "
              f"mor+argsort {r['mor+argsort']:.2f} cull {r['cull']:.2f} "
              f"full {r['full']:.2f} (sweep~{sweep:.2f}) ms "
              f"chunks {cnt}", flush=True)


if __name__ == "__main__":
    main()
