"""Measure tile_closest_hit throughput: coherent vs incoherent rays.

PYTHONPATH=/root/repo:/root/.axon_site python tools/trav_perf.py
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

from tpu_path_tracer.core.config import LAMBERTIAN
from tpu_path_tracer.kernels.pallas.traversal import (
    CHUNKS_PER_STEP, TILE, _interval_slab_entries, _inv_dir, _morton_key6d,
    _superchunk_size, _tile_ray_bounds, chunk_cull, pack_tris, scene_diam,
    superchunk_boxes, closest_hit, tile_closest_hit)
from tpu_path_tracer.scene import procedural
from tpu_path_tracer.scene.builder import SceneBuilder

N = 512 * 512


def timeit(make_step, iters=8):
    """Chained marginal timing: this runtime defers/pipelines dispatch, so
    each iteration's input must depend on the previous output and the
    final result must be host-materialized (see bench.py docstring)."""
    step = jax.jit(make_step)
    float(step(jnp.float32(0)))  # compile + warm

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
    print("devices:", jax.devices())
    b = SceneBuilder()
    m = b.add_material("w", LAMBERTIAN, [0.7, 0.7, 0.7])
    b.add_mesh(procedural.icosphere(subdivisions=subdiv, radius=0.8), m)
    scene, meta = b.build(bvh="median")
    tris, bvh = scene.triangles, scene.bvh
    print("tris", int(tris.count), "nodes", int(bvh.count))
    packed = pack_tris(tris)
    e0, e1, e2, tcol, cmin, cmax = packed

    k = np.random.default_rng(11)
    # Coherent: primary rays through a 512x512 image plane from one origin.
    xs = (np.arange(512) + 0.5) / 512 * 2 - 1
    px, py = np.meshgrid(xs, xs)
    d = np.stack([px.ravel() * 0.6, py.ravel() * 0.6, -np.ones(N)], axis=1)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    o = np.tile(np.array([[0.0, 0.0, 3.0]], np.float32), (N, 1))
    o_c = jnp.asarray(o.astype(np.float32))
    d_c = jnp.asarray(d.astype(np.float32))

    # Incoherent: same rays, randomly permuted (what bounce wavefronts look
    # like in framebuffer order).
    perm = k.permutation(N)
    o_i = o_c[perm]
    d_i = d_c[perm]

    # Diffuse-bounce-like: origins on the sphere, directions random hemis.
    op = k.normal(size=(N, 3))
    op /= np.linalg.norm(op, axis=1, keepdims=True)
    dd = k.normal(size=(N, 3))
    dd /= np.linalg.norm(dd, axis=1, keepdims=True)
    o_b = jnp.asarray((op * 0.81).astype(np.float32))
    d_b = jnp.asarray(dd.astype(np.float32))

    t0 = jnp.full((N,), 1e9, jnp.float32)
    nt = int(tris.count)

    g = _superchunk_size(int(cmin.shape[0]))
    smin, smax = superchunk_boxes(cmin, cmax, g)

    def sort_rays(o, d, t):
        # Mirror tile_closest_hit's sort: Morton key, data as lax.sort
        # payloads (argsort+gather costs ~4 ms per [262k] column).
        morton = _morton_key6d(o, d, bvh.mins[0], bvh.maxs[0])
        (_, ox, oy, oz, dx, dy, dz, ts) = jax.lax.sort(
            [morton, o[:, 0], o[:, 1], o[:, 2],
             d[:, 0], d[:, 1], d[:, 2], t], num_keys=1)
        return (jnp.stack([ox, oy, oz], axis=1),
                jnp.stack([dx, dy, dz], axis=1), ts)

    @jax.jit
    def cull(o, d, t):
        os_, ds_, ts_ = sort_rays(o, d, t)
        return chunk_cull(os_, ds_, ts_, cmin, cmax)

    @jax.jit
    def probe_kmax(o, d, t):
        # The cull tier statistic (worst tile's candidate superchunks in
        # the beam-interval coarse pass), Morton-sorted.
        diam = scene_diam(o, cmin, cmax)
        os_, ds_, ts_ = sort_rays(o, d, t)
        bounds = _tile_ray_bounds(os_, ds_, _inv_dir(ds_),
                                  jnp.minimum(ts_, diam), N // TILE)
        ent = _interval_slab_entries(bounds, smin, smax)
        return jnp.max(jnp.sum(ent < 1e30, axis=1))

    for name, oo, dd_ in [("coherent", o_c, d_c), ("permuted", o_i, d_i),
                          ("bounce-like", o_b, d_b)]:
        def cull_step(e, oo=oo, dd_=dd_):
            _, _, count = cull(oo + e, dd_, t0)
            return jnp.float32(jnp.sum(count)) * 0e-30 + e * 0.5

        def full_step(e, oo=oo, dd_=dd_):
            _, i = closest_hit(oo + e, dd_, bvh, packed, t0,
                               t_min=1e-4, n_tris=nt)
            return jnp.float32(jnp.sum(i)) * 0e-30 + e * 0.5

        dt_cull = timeit(cull_step)
        _, _, count = cull(oo, dd_, t0)
        work = int(np.asarray(jnp.sum(count)))
        kmax = int(np.asarray(probe_kmax(oo, dd_, t0)))
        dt = timeit(full_step)
        hits = int((np.asarray(closest_hit(
            oo, dd_, bvh, packed, t0, t_min=1e-4, n_tris=nt)[1]) >= 0).sum())
        print(f"{name}: cull {dt_cull*1e3:.2f} ms, total {dt*1e3:.2f} ms, "
              f"{N/dt/1e6:.1f} Mray/s, hits {hits}, kmax {kmax}, "
              f"chunks {work} (avg {work/(N//TILE):.1f}/tile of "
              f"{cmin.shape[0]})", flush=True)


if __name__ == "__main__":
    main()
