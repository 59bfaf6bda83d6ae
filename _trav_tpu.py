import time, numpy as np, jax, jax.numpy as jnp
import tpu_path_tracer as tpt
from tpu_path_tracer.scene.builder import SceneBuilder
from tpu_path_tracer.scene import procedural
from tpu_path_tracer.core.config import LAMBERTIAN
from tpu_path_tracer.kernels.pallas import traversal as pt

b = SceneBuilder()
b.add_material("default", LAMBERTIAN, [1,0,0])
white = b.add_material("white", LAMBERTIAN, [0.7,0.7,0.7])
b.add_mesh(procedural.icosphere(subdivisions=6, radius=0.8), white)
import sys
ml = int(sys.argv[1]) if len(sys.argv)>1 else 4
scene, meta = b.build(bvh="sah", max_leaf=ml)
tris, bvh = scene.triangles, scene.bvh
print("tris", tris.count, "nodes", bvh.count, "max_leaf", meta.max_leaf)

# primary-like coherent rays, 512x512 from a camera
W=H=512; N=W*H
cam = tpt.Camera(eye=[0,0,3.2], center=[0,0,0])
view = jnp.asarray(cam.view_matrix)
xs = (jnp.arange(N) % W).astype(jnp.float32)/W*2-1
ys = ((jnp.arange(N) // W).astype(jnp.float32)/H*2-1)
d = xs[:,None]*view[:3,0][None] + (-ys)[:,None]*view[:3,1][None] - 1.732*view[:3,2][None]
d = d / jnp.linalg.norm(d, axis=1, keepdims=True)
o = jnp.broadcast_to(view[:3,3][None], d.shape)
# incoherent rays: random dirs from random points in box
ko, kd = jax.random.PRNGKey(0), jax.random.PRNGKey(1)
oi = jax.random.uniform(ko, (N,3), jnp.float32, -1, 1)
di = jax.random.normal(kd, (N,3), jnp.float32)
di = di / jnp.linalg.norm(di, axis=1, keepdims=True)
t0 = jnp.full((N,), 1e9, jnp.float32)

nodes_p = pt.pack_nodes(bvh)
tris_p = pt.pack_tris(tris)
jax.block_until_ready((nodes_p, tris_p))

@jax.jit
def step(o, d, t0, nodes_p, tris_p):
    t, idx = pt.tile_closest_hit(o, d, nodes_p, tris_p, t0, 1e-6, int(tris.count), int(bvh.count))
    return t, idx

def marginal(o, d):
    t, idx = step(o, d, t0, nodes_p, tris_p)
    hits = int(np.asarray(idx >= 0).sum())
    def run(iters):
        cur = t0
        tt0=time.perf_counter()
        for _ in range(iters):
            tcur, idx = step(o, d, cur, nodes_p, tris_p)
            cur = jnp.where(idx>=0, tcur*0+1e9, 1e9)  # chain dependency, keep t0 semantics
        np.asarray(cur)
        return time.perf_counter()-tt0
    t1, t2 = run(2), run(8)
    return (t2-t1)/6, hits

dt, hits = marginal(o, d)
print(f"coherent (primary): {dt*1e3:.3f} ms  {N/dt/1e6:.1f} Mray/s  hits={hits}")
dt, hits = marginal(oi, di)
print(f"incoherent:         {dt*1e3:.3f} ms  {N/dt/1e6:.1f} Mray/s  hits={hits}")
