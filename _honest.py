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
    return rs + r[:, 0].astype(jnp.uint32)

@jax.jit
def step_wave(rs, view, px, py, scene):
    r = path_trace_pixels(rs, view, px, py, scene, meta, cfg)[1]
    return rs + r[:, 0].astype(jnp.uint32)

def loss_fn(params, scene, pix, px, py, view, target, frame_num):
    s = apply_params(scene, params)
    rs = rng.seed(pix, frame_num)
    _, radiance = path_trace_pixels(rs, view, px, py, s, meta, cfg)
    return jnp.mean((radiance - target) ** 2)
vg = jax.value_and_grad(loss_fn)
@jax.jit
def step_fb(params, scene, pix, px, py, view, target, frame_num):
    loss, g = vg(params, scene, pix, px, py, view, target, frame_num)
    return jax.tree.map(lambda p, gg: p - 0.0*gg, params, g), frame_num + jnp.int32(1)

def marginal(run, n1=3, n2=23):
    t1, t2 = run(n1), run(n2)
    return (t2-t1)/(n2-n1)

def make_run(f, init):
    def run(iters):
        cur = init
        t0=time.perf_counter()
        for _ in range(iters):
            cur = f(cur)
        _ = jax.tree.map(np.asarray, cur)
        return time.perf_counter()-t0
    return run

for name, f in [("pallas fwd", lambda rs: step_pallas(rs, view, px, py, scene)),
                ("wavefront fwd", lambda rs: step_wave(rs, view, px, py, scene))]:
    _ = np.asarray(f(rs0))
    dt = marginal(make_run(f, rs0))
    print(f"{name}: {dt*1e3:.3f} ms  {n/dt/1e6:.1f} Mray/s")

params = extract_params(scene, groups=("emission","bsdf"))
target = jnp.zeros((n,3), jnp.float32)
fwb = lambda st: step_fb(st[0], scene, pix, px, py, view, target, st[1])
_ = jax.tree.map(np.asarray, fwb((params, jnp.int32(1))))
dt = marginal(make_run(fwb, (params, jnp.int32(1))), 3, 13)
print(f"wavefront fwd+bwd: {dt*1e3:.3f} ms  {n/dt/1e6:.1f} Mray/s")
