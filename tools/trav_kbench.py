"""Microbenchmark the resident sweep kernel's per-step cost on hardware.

Synthetic queues isolate: block-switch overhead (tile changes per step),
copy+matmul compute (vg), and the no-op floor (vg=0).

PYTHONPATH=/root/repo:/root/.axon_site python tools/trav_kbench.py
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

from tpu_path_tracer.kernels.pallas.traversal import (
    CHUNKS_PER_STEP, RAY_K, SUBS_PER_STEP, TILE, _combined_table,
    _sweep_round_resident, pack_tris)
from tpu_path_tracer.core.config import LAMBERTIAN
from tpu_path_tracer.scene import procedural
from tpu_path_tracer.scene.builder import SceneBuilder

N = 512 * 512
N_TILES = N // TILE
STEP_C = CHUNKS_PER_STEP * SUBS_PER_STEP


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
    b = SceneBuilder()
    m = b.add_material("w", LAMBERTIAN, [0.7, 0.7, 0.7])
    b.add_mesh(procedural.icosphere(subdivisions=6, radius=0.8), m)
    scene, meta = b.build(bvh="median")
    e0, e1, e2, tcol, cmin, cmax = pack_tris(scene.triangles)
    etab = _combined_table(e0, e1, e2, tcol)
    n_chunks = int(cmin.shape[0])
    bx = jnp.concatenate(
        [jnp.concatenate([cmin, cmax], axis=1),
         jnp.full((1, 6), np.float32(1e30), jnp.float32)]).reshape(-1)

    k = np.random.default_rng(0)
    ray_dm = jnp.asarray(k.normal(size=(N, RAY_K)).astype(np.float32))
    ray_o1 = jnp.asarray(k.normal(size=(N, RAY_K)).astype(np.float32))
    t_b = jnp.full((N, 1), 1e9, jnp.float32)
    i_b = jnp.full((N, 1), -1.0, jnp.float32)
    ids_rand = jnp.asarray(
        k.integers(0, n_chunks, size=(N_TILES, STEP_C)).astype(np.int32))
    ids_dummy = jnp.full((N_TILES, STEP_C), n_chunks, jnp.int32)

    cases = {
        "switch+vg1": (jnp.arange(N_TILES, dtype=jnp.int32),
                       jnp.ones((N_TILES,), jnp.int32),
                       jnp.ones((N_TILES,), jnp.int32), ids_rand),
        "switch+vg4": (jnp.arange(N_TILES, dtype=jnp.int32),
                       jnp.ones((N_TILES,), jnp.int32),
                       jnp.full((N_TILES,), SUBS_PER_STEP, jnp.int32),
                       ids_rand),
        "same-tile+vg1": (jnp.zeros((N_TILES,), jnp.int32),
                          (jnp.arange(N_TILES) == 0).astype(jnp.int32),
                          jnp.ones((N_TILES,), jnp.int32), ids_rand),
        "switch+vg0": (jnp.arange(N_TILES, dtype=jnp.int32),
                       jnp.ones((N_TILES,), jnp.int32),
                       jnp.zeros((N_TILES,), jnp.int32), ids_dummy),
    }
    for name, (tos, isf, vg, ids) in cases.items():
        def step(e, tos=tos, isf=isf, vg=vg, ids=ids):
            t, i = _sweep_round_resident(
                ray_dm + e, ray_o1, t_b, i_b, tos, isf, vg, ids, bx,
                etab, 1e-4, False)
            return jnp.float32(jnp.sum(i)) * 0e-30 + e * 0.5

        dt = timeit(step)
        print(f"{name}: {dt*1e3:.2f} ms total, "
              f"{dt/N_TILES*1e6:.2f} us/step", flush=True)


if __name__ == "__main__":
    main()
