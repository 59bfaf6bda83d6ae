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
rs_list = [rng.seed(pix, jnp.int32(7+i)) for i in range(30)]
jax.block_until_ready(rs_list)

f_pallas = jax.jit(lambda rs, view, px, py, scene: path_trace_pixels_pallas(rs, view, px, py, scene, meta, cfg))
f_wave = jax.jit(lambda rs, view, px, py, scene: path_trace_pixels(rs, view, px, py, scene, meta, cfg)[1])

for name, f in [("pallas", f_pallas), ("wavefront", f_wave)]:
    r = f(rs_list[0], view, px, py, scene); r.block_until_ready()
    t0=time.perf_counter()
    for rs in rs_list:
        r = f(rs, view, px, py, scene)
    r.block_until_ready()
    dt=(time.perf_counter()-t0)/len(rs_list)
    print(f"{name}: {dt*1e3:.3f} ms  {n/dt/1e6:.1f} Mray/s")

# bench.py's exact fwd path: render_frame (donated fb), IS defaults False
cfg0 = tpt.RenderConfig(width=W, height=H, max_bounces=4)
fb = jnp.zeros((n,3), jnp.float32)
fb = tpt.render_frame(fb, jnp.int32(1), jnp.bool_(True), view, scene, meta, cfg0)
fb.block_until_ready()
t0=time.perf_counter()
for i in range(30):
    fb = tpt.render_frame(fb, jnp.int32(100+i), jnp.bool_(False), view, scene, meta, cfg0)
fb.block_until_ready()
dt=(time.perf_counter()-t0)/30
print(f"render_frame(IS=False): {dt*1e3:.3f} ms {n/dt/1e6:.1f} Mray/s")
# and IS=True via render_frame
fb = jnp.zeros((n,3), jnp.float32)
fb = tpt.render_frame(fb, jnp.int32(1), jnp.bool_(True), view, scene, meta, cfg)
fb.block_until_ready()
t0=time.perf_counter()
for i in range(30):
    fb = tpt.render_frame(fb, jnp.int32(100+i), jnp.bool_(False), view, scene, meta, cfg)
fb.block_until_ready()
dt=(time.perf_counter()-t0)/30
print(f"render_frame(IS=True): {dt*1e3:.3f} ms {n/dt/1e6:.1f} Mray/s")
