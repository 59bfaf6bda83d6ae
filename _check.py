import numpy as np, jax.numpy as jnp, jax
import tpu_path_tracer as tpt
from tpu_path_tracer.scene.builder import SceneBuilder
from tpu_path_tracer.scene import procedural
from tpu_path_tracer.core.config import LAMBERTIAN, MIRROR

def mesh_scene(subdiv, bvh, max_leaf=4):
    b = SceneBuilder()
    b.add_material("default", LAMBERTIAN, [1,0,0])
    white = b.add_material("white", LAMBERTIAN, [0.73,0.73,0.73])
    light = b.add_material("light", LAMBERTIAN, [0,0,0], emission=[2,2,2])
    mirror = b.add_material("mirror", MIRROR, [0.9,0.9,0.9])
    b.add_quad([-2,-2,-2],[4,0,0],[0,4,0], white)
    b.add_quad([-2,2,2],[4,0,0],[0,0,-4], light)
    b.add_quad([-2,-2,2],[4,0,0],[0,0,-4], white)
    b.add_mesh(procedural.icosphere(subdivisions=subdiv, radius=0.8), mirror)
    return b.build(bvh=bvh, max_leaf=max_leaf)

cfg = tpt.RenderConfig(width=128, height=128, max_bounces=4)
cam = tpt.Camera(eye=[0,0,3.2], center=[0,0,0])
view = jnp.asarray(cam.view_matrix)
n = 128*128
imgs = {}
for mode in ["none","median"]:
    scene, meta = mesh_scene(3, mode)
    print(mode, "traversal:", meta.traversal)
    fb = jnp.zeros((n,3), jnp.float32)
    for i in range(8):
        fb = tpt.render_frame(fb, jnp.int32(i+1), jnp.bool_(i==0), view, scene, meta, cfg)
    imgs[mode] = np.asarray(fb)/8
a,bv = imgs["none"], imgs["median"]
print("mean brute", a.mean(), "mean bvh", bv.mean())
print("max abs diff", np.abs(a-bv).max(), "mean abs diff", np.abs(a-bv).mean())
