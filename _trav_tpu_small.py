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
print("tris", tris.count, "nodes", bvh.count)

N = 2048
o = jax.random.uniform(jax.random.PRNGKey(0), (N,3), jnp.float32, -2, 2)
d = jax.random.normal(jax.random.PRNGKey(1), (N,3), jnp.float32)
d = d / jnp.linalg.norm(d, axis=1, keepdims=True)
t0 = jnp.full((N,), 1e9, jnp.float32)
t_ref, i_ref = jt.bvh_closest_hit(o, d, bvh, tris, 1e-6, t0, meta.max_leaf)
nodes_p, tris_p = pt.pack_nodes(bvh), pt.pack_tris(tris)
t_new, i_new = pt.tile_closest_hit(o, d, nodes_p, tris_p, t0, 1e-6, int(tris.count), int(bvh.count))
t_ref, i_ref, t_new, i_new = map(np.asarray, (t_ref, i_ref, t_new, i_new))
print("hits ref/new:", (i_ref>=0).sum(), (i_new>=0).sum(), "idx mismatch:", (i_ref!=i_new).sum())
