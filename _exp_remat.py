"""Experiment: does remat of the bounce body speed up fwd+bwd on TPU?"""
import time
import numpy as np
import jax
import jax.numpy as jnp

import tpu_path_tracer as tpt
from tpu_path_tracer.core import rng
from tpu_path_tracer.diff.params import apply_params, extract_params
from tpu_path_tracer.integrator.render import path_trace_pixels
import tpu_path_tracer.integrator.path_tracer as pt

W = H = 512


def measure(label):
    scene, meta, _ = tpt.builtin.cornell_box()
    cfg = tpt.RenderConfig(width=W, height=H, max_bounces=4,
                           importance_sampling=True)
    cam = tpt.Camera(eye=[0, 0, 3.2], center=[0, 0, 0])
    view = jnp.asarray(cam.view_matrix)
    n = W * H
    pix = jnp.arange(n, dtype=jnp.uint32)
    px = (pix % jnp.uint32(W)).astype(jnp.int32)
    py = (pix // jnp.uint32(W)).astype(jnp.int32)
    params = extract_params(scene, groups=("emission", "bsdf"))
    target = jnp.zeros((n, 3), jnp.float32)

    def loss_fn(params, scene, pix, px, py, view, target, frame_num):
        s = apply_params(scene, params)
        rs = rng.seed(pix, frame_num)
        _, radiance = path_trace_pixels(rs, view, px, py, s, meta, cfg)
        return jnp.mean((radiance - target) ** 2)

    vg = jax.value_and_grad(loss_fn)

    @jax.jit
    def train_step(params, frame_num, scene, pix, px, py, view, target):
        loss, g = vg(params, scene, pix, px, py, view, target, frame_num)
        params = jax.tree.map(lambda p, gg: p - 0.0 * gg, params, g)
        return params, frame_num + jnp.int32(1)

    def run(iters):
        cur = (params, jnp.int32(1))
        t0 = time.perf_counter()
        for _ in range(iters):
            cur = train_step(cur[0], cur[1], scene, pix, px, py, view, target)
        jax.tree.map(np.asarray, cur)
        return time.perf_counter() - t0

    run(1)  # compile
    t1, t2 = run(2), run(12)
    dt = max((t2 - t1) / 10, 1e-9)
    print(f"{label}: {n/dt/1e6:.2f} Mray/s fwd+bwd, {dt*1e3:.3f} ms/step")


if __name__ == "__main__":
    measure("baseline (no remat)")
    orig_trace = pt.trace

    # Variant: remat the whole bounce body.
    import functools
    real_scan = jax.lax.scan

    def scan_remat(f, init, xs, **kw):
        return real_scan(jax.checkpoint(f, prevent_cse=False), init, xs, **kw)

    pt.jax.lax = jax.lax  # no-op; keep reference
    jax.lax_scan_orig = real_scan
    # monkeypatch inside the module
    class _LaxProxy:
        def __getattr__(self, k):
            if k == "scan":
                return scan_remat
            return getattr(jax.lax, k)
    pt.jax = type("J", (), {"lax": _LaxProxy(),
                            "checkpoint": jax.checkpoint})()
    measure("remat bounce body")
