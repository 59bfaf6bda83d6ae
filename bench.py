"""Benchmark harness — prints ONE JSON line with the headline metric.

Headline (BASELINE.json): Mray/s/chip forward+backward at 4 bounces.
A "ray" here is a primary path (pixel sample), matching the derived anchor in
BASELINE.md: 900x600 x 1 spp x 104 fps ≈ 56 Mray/s on the reference's
browser GPU (forward only; our number includes the full reverse-mode sweep
w.r.t. emitter radiance + BSDF parameters, a strictly harder workload).

Workload: the analytic Cornell scene (spheres + quads + NEE/MIS), 512x512,
1 spp, 4 bounces, value_and_grad of an L2 image loss — steady-state timed
over repeated steps on one chip.
"""

import json
import time

import jax
import jax.numpy as jnp


def bench_fwd_bwd(width=512, height=512, bounces=4, iters=10, warmup=2):
    import tpu_path_tracer as tpt
    from tpu_path_tracer.core import rng
    from tpu_path_tracer.core.types import Ray
    from tpu_path_tracer.diff.params import apply_params, extract_params
    from tpu_path_tracer.integrator.render import path_trace_pixels

    scene, meta, _ = tpt.builtin.cornell_box()
    cfg = tpt.RenderConfig(width=width, height=height, max_bounces=bounces,
                           importance_sampling=True)
    cam = tpt.Camera(eye=[0, 0, 3.2], center=[0, 0, 0])
    view = jnp.asarray(cam.view_matrix)
    n = width * height
    pix = jnp.arange(n, dtype=jnp.uint32)
    px = (pix % jnp.uint32(width)).astype(jnp.int32)
    py = (pix // jnp.uint32(width)).astype(jnp.int32)
    params = extract_params(scene, groups=("emission", "bsdf"))
    target = jnp.zeros((n, 3), jnp.float32)

    # Everything array-valued is an explicit argument: closure-captured
    # device arrays become jaxpr constants, which this runtime punishes with
    # a synchronous round-trip per dispatch (see core/rng.py).
    def loss_fn(params, scene, pix, px, py, view, target, frame_num):
        s = apply_params(scene, params)
        rs = rng.seed(pix, frame_num)
        _, radiance = path_trace_pixels(rs, view, px, py, s, meta, cfg)
        return jnp.mean((radiance - target) ** 2)

    step = jax.jit(jax.value_and_grad(loss_fn))
    args = (scene, pix, px, py, view, target)
    for i in range(warmup):
        out = step(params, *args, jnp.int32(i + 1))
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for i in range(iters):
        out = step(params, *args, jnp.int32(100 + i))
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters
    return n / dt / 1e6, dt


def bench_fwd_only(width=512, height=512, bounces=4, iters=10, warmup=2):
    import tpu_path_tracer as tpt

    scene, meta, _ = tpt.builtin.cornell_box()
    cfg = tpt.RenderConfig(width=width, height=height, max_bounces=bounces)
    cam = tpt.Camera(eye=[0, 0, 3.2], center=[0, 0, 0])
    view = jnp.asarray(cam.view_matrix)
    n = width * height
    fb = jnp.zeros((n, 3), jnp.float32)
    for i in range(warmup):
        fb = tpt.render_frame(fb, jnp.int32(i + 1), jnp.bool_(i == 0), view,
                              scene, meta, cfg)
    fb.block_until_ready()
    t0 = time.perf_counter()
    for i in range(iters):
        fb = tpt.render_frame(fb, jnp.int32(100 + i), jnp.bool_(False), view,
                              scene, meta, cfg)
    fb.block_until_ready()
    dt = (time.perf_counter() - t0) / iters
    return n / dt / 1e6, dt


def main():
    device = jax.devices()[0]
    fwd_bwd_mrays, step_s = bench_fwd_bwd()
    fwd_mrays, frame_s = bench_fwd_only()
    baseline = 56.0  # BASELINE.md derived anchor (fwd-only browser GPU)
    print(json.dumps({
        "metric": "Mray/s/chip fwd+bwd @4 bounces (Cornell 512x512, NEE)",
        "value": round(fwd_bwd_mrays, 3),
        "unit": "Mray/s",
        "vs_baseline": round(fwd_bwd_mrays / baseline, 4),
        "extra": {
            "fwd_only_mrays": round(fwd_mrays, 3),
            "fwd_bwd_step_ms": round(step_s * 1e3, 3),
            "fwd_frame_ms": round(frame_s * 1e3, 3),
            "device": str(device),
        },
    }))


if __name__ == "__main__":
    main()
