import time, jax, jax.numpy as jnp
import tpu_path_tracer as tpt
from tpu_path_tracer.scene.builder import SceneBuilder
from tpu_path_tracer.scene import procedural
from tpu_path_tracer.core.config import LAMBERTIAN, MIRROR

def mesh_scene(subdiv=6, bvh="median", max_leaf=4):
    b = SceneBuilder()
    b.add_material("default", LAMBERTIAN, [1,0,0])
    white = b.add_material("white", LAMBERTIAN, [0.73,0.73,0.73])
    light = b.add_material("light", LAMBERTIAN, [0,0,0], emission=[2,2,2])
    mirror = b.add_material("mirror", MIRROR, [0.9,0.9,0.9])
    # room
    b.add_quad([-2,-2,-2],[4,0,0],[0,4,0], white)   # back
    b.add_quad([-2,2,2],[4,0,0],[0,0,-4], light)    # top light
    b.add_quad([-2,-2,2],[4,0,0],[0,0,-4], white)   # floor
    mesh = procedural.icosphere(subdivisions=subdiv, radius=0.8)
    b.add_mesh(mesh, mirror)
    s, m = b.build(bvh=bvh, max_leaf=max_leaf); return s, m, b

t0=time.perf_counter()
scene, meta, _ = mesh_scene()
print("build+flatten s:", time.perf_counter()-t0, "tris:", scene.triangles.count, "nodes:", scene.bvh.count, "max_leaf:", meta.max_leaf)

cfg = tpt.RenderConfig(width=512, height=512, max_bounces=4)
cam = tpt.Camera(eye=[0,0,3.2], center=[0,0,0])
view = jnp.asarray(cam.view_matrix)
n = 512*512
fb = jnp.zeros((n,3), jnp.float32)
t0=time.perf_counter()
fb = tpt.render_frame(fb, jnp.int32(1), jnp.bool_(True), view, scene, meta, cfg)
fb.block_until_ready()
print("compile+first s:", time.perf_counter()-t0)
iters=5
t0=time.perf_counter()
for i in range(iters):
    fb = tpt.render_frame(fb, jnp.int32(2+i), jnp.bool_(False), view, scene, meta, cfg)
fb.block_until_ready()
dt=(time.perf_counter()-t0)/iters
print(f"frame ms: {dt*1e3:.2f}  Mray/s: {n/dt/1e6:.2f}  (ref bunny best: 9.6ms/104fps)")
