"""Benchmark harness — prints ONE JSON line with the headline metric.

Headline (BASELINE.json): Mray/s/chip forward+backward at 4 bounces.
A "ray" here is a primary path (pixel sample), matching the derived anchor in
BASELINE.md: 900x600 x 1 spp x 104 fps ≈ 56 Mray/s on the reference's
browser GPU (forward only; our headline includes the full reverse-mode sweep
w.r.t. emitter radiance + BSDF parameters, a strictly harder workload).

Timing methodology (IMPORTANT): this runtime defers/pipelines device work in
ways that make ``block_until_ready`` unreliable for wall-clock timing —
un-materialized result chains measured 100-1000x faster than real execution.
Every measurement here therefore (a) chains each step's output into the next
step's input so no dispatch can be elided, and (b) ends with a full host
materialization (``np.asarray``), then reports the MARGINAL cost between a
short and a long run so the one-time transfer cost cancels out.

Workloads:
  * headline — analytic Cornell (spheres + quads + NEE/MIS), 512x512, 1 spp,
    4 bounces, value_and_grad of an L2 image loss (wavefront integrator).
  * extras — forward-only wavefront, forward-only Pallas megakernel (the
    fused single-dispatch path), and a bunny-scale (82k tri) BVH mesh scene.
"""

import json
import time

import numpy as np
import jax
import jax.numpy as jnp


def _marginal(run, n1, n2):
    """Marginal per-iteration seconds between a short and a long run."""
    t1 = run(n1)
    t2 = run(n2)
    return max((t2 - t1) / (n2 - n1), 1e-9)


def _chain_run(step, init):
    """Build run(iters): fold ``step`` serially and materialize the result."""
    def run(iters):
        cur = init
        t0 = time.perf_counter()
        for _ in range(iters):
            cur = step(cur)
        jax.tree.map(np.asarray, cur)
        return time.perf_counter() - t0
    return run


def _pixel_grid(width, height):
    n = width * height
    pix = jnp.arange(n, dtype=jnp.uint32)
    px = (pix % jnp.uint32(width)).astype(jnp.int32)
    py = (pix // jnp.uint32(width)).astype(jnp.int32)
    return n, pix, px, py


def bench_fwd_bwd(width=512, height=512, bounces=4):
    import tpu_path_tracer as tpt
    from tpu_path_tracer.core import rng
    from tpu_path_tracer.diff.params import apply_params, extract_params
    from tpu_path_tracer.integrator.render import path_trace_pixels

    scene, meta, _ = tpt.builtin.cornell_box()
    cfg = tpt.RenderConfig(width=width, height=height, max_bounces=bounces,
                           importance_sampling=True)
    cam = tpt.Camera(eye=[0, 0, 3.2], center=[0, 0, 0])
    view = jnp.asarray(cam.view_matrix)
    n, pix, px, py = _pixel_grid(width, height)
    params = extract_params(scene, groups=("emission", "bsdf"))
    target = jnp.zeros((n, 3), jnp.float32)

    def loss_fn(params, scene, pix, px, py, view, target, frame_num):
        s = apply_params(scene, params)
        rs = rng.seed(pix, frame_num)
        _, radiance = path_trace_pixels(rs, view, px, py, s, meta, cfg)
        return jnp.mean((radiance - target) ** 2)

    vg = jax.value_and_grad(loss_fn)

    # Every array-valued input is an explicit argument: closure-captured
    # device arrays become jaxpr constants, which this runtime punishes with
    # a synchronous round-trip per dispatch (see core/rng.py).  The params
    # update chains each step's gradients into the next step's input.
    @jax.jit
    def train_step(params, frame_num, scene, pix, px, py, view, target):
        loss, g = vg(params, scene, pix, px, py, view, target, frame_num)
        params = jax.tree.map(lambda p, gg: p - 0.0 * gg, params, g)
        return params, frame_num + jnp.int32(1)

    def step(state):
        p, f = state
        return train_step(p, f, scene, pix, px, py, view, target)

    init = (params, jnp.int32(1))
    jax.tree.map(np.asarray, step(init))  # compile + warm
    dt = _marginal(_chain_run(step, init), 2, 10)
    return n / dt / 1e6, dt


def bench_fwd_wavefront(width=512, height=512, bounces=4):
    import tpu_path_tracer as tpt
    from tpu_path_tracer.core import rng
    from tpu_path_tracer.integrator.render import path_trace_pixels

    scene, meta, _ = tpt.builtin.cornell_box()
    cfg = tpt.RenderConfig(width=width, height=height, max_bounces=bounces,
                           importance_sampling=True)
    cam = tpt.Camera(eye=[0, 0, 3.2], center=[0, 0, 0])
    view = jnp.asarray(cam.view_matrix)
    n, pix, px, py = _pixel_grid(width, height)
    rs0 = rng.seed(pix, jnp.int32(7))

    @jax.jit
    def frame(rs, view, px, py, scene):
        r = path_trace_pixels(rs, view, px, py, scene, meta, cfg)[1]
        return rs + r[:, 0].astype(jnp.uint32)

    step = lambda rs: frame(rs, view, px, py, scene)
    np.asarray(step(rs0))
    dt = _marginal(_chain_run(step, rs0), 3, 23)
    return n / dt / 1e6, dt


def bench_fwd_pallas(width=512, height=512, bounces=4):
    import tpu_path_tracer as tpt
    from tpu_path_tracer.core import rng
    from tpu_path_tracer.kernels.pallas.megakernel import (
        path_trace_pixels_pallas)

    scene, meta, _ = tpt.builtin.cornell_box()
    cfg = tpt.RenderConfig(width=width, height=height, max_bounces=bounces,
                           importance_sampling=True)
    cam = tpt.Camera(eye=[0, 0, 3.2], center=[0, 0, 0])
    view = jnp.asarray(cam.view_matrix)
    n, pix, px, py = _pixel_grid(width, height)
    rs0 = rng.seed(pix, jnp.int32(7))

    @jax.jit
    def frame(rs, view, px, py, scene):
        r = path_trace_pixels_pallas(rs, view, px, py, scene, meta, cfg)
        return rs + r[:, 0].astype(jnp.uint32)

    step = lambda rs: frame(rs, view, px, py, scene)
    np.asarray(step(rs0))
    dt = _marginal(_chain_run(step, rs0), 3, 23)
    return n / dt / 1e6, dt


def bench_mesh_bvh(width=512, height=512, bounces=4, subdivisions=6):
    """Bunny-scale triangle mesh (20*4^6 = 81,920 tris — the reference's
    bunny is 69,451, ``benchmarks.txt:1``) behind the BVH traversal path."""
    import tpu_path_tracer as tpt
    from tpu_path_tracer.core import rng
    from tpu_path_tracer.core.config import LAMBERTIAN, MIRROR
    from tpu_path_tracer.integrator.render import path_trace_pixels
    from tpu_path_tracer.scene import procedural
    from tpu_path_tracer.scene.builder import SceneBuilder

    b = SceneBuilder()
    b.add_material("default", LAMBERTIAN, [1, 0, 0])
    white = b.add_material("white", LAMBERTIAN, [0.73, 0.73, 0.73])
    light = b.add_material("light", LAMBERTIAN, [0, 0, 0], emission=[2, 2, 2])
    mirror = b.add_material("mirror", MIRROR, [0.9, 0.9, 0.9])
    b.add_quad([-2, -2, -2], [4, 0, 0], [0, 4, 0], white)
    b.add_quad([-2, 2, 2], [4, 0, 0], [0, 0, -4], light)
    b.add_quad([-2, -2, 2], [4, 0, 0], [0, 0, -4], white)
    t0 = time.perf_counter()
    b.add_mesh(procedural.icosphere(subdivisions=subdivisions, radius=0.8),
               mirror)
    scene, meta = b.build(bvh="median")
    build_s = time.perf_counter() - t0

    cfg = tpt.RenderConfig(width=width, height=height, max_bounces=bounces)
    cam = tpt.Camera(eye=[0, 0, 3.2], center=[0, 0, 0])
    view = jnp.asarray(cam.view_matrix)
    n, pix, px, py = _pixel_grid(width, height)
    rs0 = rng.seed(pix, jnp.int32(7))

    @jax.jit
    def frame(rs, view, px, py, scene):
        r = path_trace_pixels(rs, view, px, py, scene, meta, cfg)[1]
        return rs + r[:, 0].astype(jnp.uint32)

    step = lambda rs: frame(rs, view, px, py, scene)
    np.asarray(step(rs0))
    dt = _marginal(_chain_run(step, rs0), 1, 5)
    return n / dt / 1e6, dt, build_s, int(scene.triangles.count)


def main():
    device = jax.devices()[0]
    fwd_bwd_mrays, step_s = bench_fwd_bwd()
    wf_mrays, wf_s = bench_fwd_wavefront()
    pk_mrays, pk_s = bench_fwd_pallas()
    mesh_mrays, mesh_s, build_s, n_tris = bench_mesh_bvh()
    baseline = 56.0  # BASELINE.md derived anchor (fwd-only browser GPU)
    print(json.dumps({
        "metric": "Mray/s/chip fwd+bwd @4 bounces (Cornell 512x512, NEE)",
        "value": round(fwd_bwd_mrays, 3),
        "unit": "Mray/s",
        "vs_baseline": round(fwd_bwd_mrays / baseline, 4),
        "extra": {
            "fwd_wavefront_mrays": round(wf_mrays, 3),
            "fwd_pallas_megakernel_mrays": round(pk_mrays, 3),
            "fwd_mesh_bvh_82k_tris_mrays": round(mesh_mrays, 3),
            "fwd_bwd_step_ms": round(step_s * 1e3, 3),
            "fwd_wavefront_ms": round(wf_s * 1e3, 3),
            "fwd_pallas_ms": round(pk_s * 1e3, 3),
            "mesh_frame_ms": round(mesh_s * 1e3, 3),
            "mesh_bvh_build_ms": round(build_s * 1e3, 1),
            "mesh_tris": n_tris,
            "device": str(device),
        },
    }))


if __name__ == "__main__":
    main()
