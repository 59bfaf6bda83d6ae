import time, numpy as np, jax, jax.numpy as jnp
import tpu_path_tracer as tpt
from tpu_path_tracer.core import rng
from tpu_path_tracer.integrator.render import path_trace_pixels
from tpu_path_tracer.kernels.pallas.megakernel import path_trace_pixels_pallas
from tpu_path_tracer.diff.params import apply_params, extract_params

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
    iters=30
    t0=time.perf_counter()
    for i in range(iters):
        rs, r = f(rs, view, px, py, scene)
    jax.block_until_ready((rs, r))
    dt=(time.perf_counter()-t0)/iters
    print(f"{name}: {dt*1e3:.3f} ms  {n/dt/1e6:.1f} Mray/s")

def loss_fn(params, scene, pix, px, py, view, target, frame_num):
    s = apply_params(scene, params)
    rs = rng.seed(pix, frame_num)
    _, radiance = path_trace_pixels(rs, view, px, py, s, meta, cfg)
    return jnp.mean((radiance - target) ** 2)
vg = jax.value_and_grad(loss_fn)
@jax.jit
def step_fb(params, scene, pix, px, py, view, target, frame_num):
    loss, g = vg(params, scene, pix, px, py, view, target, frame_num)
    params = jax.tree.map(lambda p, gg: p - 0.0*gg, params, g)
    return params, loss
params = extract_params(scene, groups=("emission","bsdf"))
target = jnp.zeros((n,3), jnp.float32)
fnum = jnp.int32(1)
p, l = step_fb(params, scene, pix, px, py, view, target, fnum); jax.block_until_ready((p,l))
iters=20
t0=time.perf_counter()
for i in range(iters):
    fnum = fnum + l.astype(jnp.int32) + jnp.int32(1)  # chained
    p, l = step_fb(p, scene, pix, px, py, view, target, fnum)
jax.block_until_ready((p,l))
dt=(time.perf_counter()-t0)/iters
print(f"wavefront fwd+bwd: {dt*1e3:.3f} ms {n/dt/1e6:.1f} Mray/s")
