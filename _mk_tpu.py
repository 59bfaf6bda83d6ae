import time, numpy as np, jax, jax.numpy as jnp
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
rs = rng.seed(pix, jnp.int32(7))

f_pallas = jax.jit(lambda rs, view, px, py, scene: path_trace_pixels_pallas(rs, view, px, py, scene, meta, cfg))
f_wave = jax.jit(lambda rs, view, px, py, scene: path_trace_pixels(rs, view, px, py, scene, meta, cfg)[1])

out = np.asarray(f_pallas(rs, view, px, py, scene))
ref = np.asarray(f_wave(rs, view, px, py, scene))
d = np.abs(out-ref)
print("TPU parity: frac_bad", (d>1e-3).any(1).mean(), "mean delta", (out-ref).mean())

for name, f in [("pallas", f_pallas), ("wavefront", f_wave)]:
    r = f(rs, view, px, py, scene); r.block_until_ready()
    iters=30
    t0=time.perf_counter()
    for i in range(iters):
        r = f(rs + jnp.uint32(i), view, px, py, scene)
    r.block_until_ready()
    dt=(time.perf_counter()-t0)/iters
    print(f"{name}: {dt*1e3:.3f} ms  {n/dt/1e6:.1f} Mray/s")
