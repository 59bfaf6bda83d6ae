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

# Chained: rs_{k+1} depends on radiance_k -> every step must execute.
def chain(f):
    def step(rs):
        r = f(rs, view, px, py, scene)
        return rs + r[:, 0].astype(jnp.uint32), r
    return jax.jit(step)

f_pallas = chain(lambda rs,v,x,y,s: path_trace_pixels_pallas(rs,v,x,y,s,meta,cfg))
f_wave   = chain(lambda rs,v,x,y,s: path_trace_pixels(rs,v,x,y,s,meta,cfg)[1])

for name, f in [("pallas", f_pallas), ("wavefront", f_wave)]:
    rs, r = f(rs0); jax.block_until_ready((rs, r))
    iters=30
    t0=time.perf_counter()
    for i in range(iters):
        rs, r = f(rs)
    jax.block_until_ready((rs, r))
    dt=(time.perf_counter()-t0)/iters
    print(f"{name}: {dt*1e3:.3f} ms  {n/dt/1e6:.1f} Mray/s")

# fwd+bwd with chained params (loss feeds back in)
def loss_fn(params, scene, pix, px, py, view, target, frame_num):
    s = apply_params(scene, params)
    rs = rng.seed(pix, frame_num)
    _, radiance = path_trace_pixels(rs, view, px, py, s, meta, cfg)
    return jnp.mean((radiance - target) ** 2)
params = extract_params(scene, groups=("emission","bsdf"))
target = jnp.zeros((n,3), jnp.float32)
vg = jax.value_and_grad(loss_fn)
@jax.jit
def step(params, frame_num):
    loss, g = vg(params, scene, pix, px, py, view, target, frame_num)
    # chain: params <- params - 0*g (forces grad each iter)
    params = jax.tree.map(lambda p, gg: p - 0.0*gg, params, g)
    return params, loss
p, l = step(params, jnp.int32(1)); jax.block_until_ready((p,l))
iters=20
t0=time.perf_counter()
for i in range(iters):
    p, l = step(p, jnp.int32(100+i))
jax.block_until_ready((p,l))
dt=(time.perf_counter()-t0)/iters
print(f"wavefront fwd+bwd (chained): {dt*1e3:.3f} ms {n/dt/1e6:.1f} Mray/s")
