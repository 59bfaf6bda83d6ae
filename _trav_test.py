import os
os.environ["JAX_PLATFORMS"] = "cpu"
import numpy as np, jax, jax.numpy as jnp
import tpu_path_tracer as tpt
from tpu_path_tracer.scene.builder import SceneBuilder
from tpu_path_tracer.scene import procedural
from tpu_path_tracer.core.config import LAMBERTIAN
from tpu_path_tracer.kernels import traversal as jt
from tpu_path_tracer.kernels.pallas import traversal as pt

b = SceneBuilder()
b.add_material("default", LAMBERTIAN, [1,0,0])
white = b.add_material("white", LAMBERTIAN, [0.7,0.7,0.7])
b.add_mesh(procedural.icosphere(subdivisions=3, radius=0.8), white)
scene, meta = b.build(bvh="median")
tris, bvh = scene.triangles, scene.bvh
print("tris", tris.count, "nodes", bvh.count, "max_leaf", meta.max_leaf)

N = 2048
key = jax.random.PRNGKey(0)
o = jax.random.uniform(key, (N,3), jnp.float32, -2, 2)
d = jax.random.normal(jax.random.PRNGKey(1), (N,3), jnp.float32)
d = d / jnp.linalg.norm(d, axis=1, keepdims=True)
t_min = 1e-6
t0 = jnp.full((N,), 1e9, jnp.float32)

t_ref, i_ref = jt.bvh_closest_hit(o, d, bvh, tris, t_min, t0, meta.max_leaf)
nodes_p = pt.pack_nodes(bvh)
tris_p = pt.pack_tris(tris)
t_new, i_new = pt.tile_closest_hit(o, d, nodes_p, tris_p, t0, t_min, int(tris.count), int(bvh.count), interpret=True)

t_ref, i_ref, t_new, i_new = map(np.asarray, (t_ref, i_ref, t_new, i_new))
hit_ref = i_ref >= 0
hit_new = i_new >= 0
print("hits ref/new:", hit_ref.sum(), hit_new.sum())
print("idx mismatches:", (i_ref != i_new).sum())
m = hit_ref & hit_new
print("t maxdiff on common hits:", np.abs(t_ref[m]-t_new[m]).max() if m.any() else 0)
bad = np.where(i_ref != i_new)[0][:5]
for i in bad:
    print("lane", i, "ref", i_ref[i], t_ref[i], "new", i_new[i], t_new[i])
