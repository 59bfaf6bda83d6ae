import time, jax, jax.numpy as jnp
import tpu_path_tracer as tpt
from tpu_path_tracer.core import rng
from tpu_path_tracer.integrator.render import path_trace_pixels
from tpu_path_tracer.kernels.pallas.megakernel import path_trace_pixels_pallas

scene, meta, _ = tpt.builtin.cornell_box()
W=H=512; n=W*H
cfg = tpt.RenderConfig(width=W, height=H, max_bounces=4, importance_sampling=True)
cam = tpt.Camera(eye=[0,0,3.2], center=[0,0,0])
view = jnp.asarray(cam.view_matrix)
pix = jnp.arange(n, dtype=jnp.uint32)
px = (pix % jnp.uint32(W)).astype(jnp.int32)
py = (pix // jnp.uint32(W)).astype(jnp.int32)
rs0 = rng.seed(pix, jnp.int32(7))

@jax.jit
def step_pallas(rs, view, px, py, scene):
    r = path_trace_pixels_pallas(rs, view, px, py, scene, meta, cfg)
    return rs + r[:, 0].astype(jnp.uint32), r

@jax.jit
def step_wave(rs, view, px, py, scene):
    r = path_trace_pixels(rs, view, px, py, scene, meta, cfg)[1]
    return rs + r[:, 0].astype(jnp.uint32), r

for name, f in [("pallas", step_pallas), ("wavefront", step_wave)]:
    rs, r = f(rs0, view, px, py, scene); jax.block_until_ready((rs, r))
    for iters in (1, 10, 50, 200):
        rs = rs0
        t0=time.perf_counter()
        for i in range(iters):
            rs, r = f(rs, view, px, py, scene)
        jax.block_until_ready((rs, r))
        dt=(time.perf_counter()-t0)
        print(f"{name} iters={iters}: total {dt*1e3:.2f} ms  per-iter {dt/iters*1e3:.3f} ms")
