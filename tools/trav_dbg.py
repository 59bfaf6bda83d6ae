"""Minimal TPU repro for the tile traversal kernel."""
import numpy as np
import jax
import jax.numpy as jnp

from tpu_path_tracer.core.config import LAMBERTIAN
from tpu_path_tracer.kernels.pallas.traversal import (
    pack_tris, tile_closest_hit)
from tpu_path_tracer.kernels import traversal as jnp_trav
from tpu_path_tracer.scene import procedural
from tpu_path_tracer.scene.builder import SceneBuilder

print("devices:", jax.devices())

b = SceneBuilder()
m = b.add_material("w", LAMBERTIAN, [0.7, 0.7, 0.7])
b.add_mesh(procedural.icosphere(subdivisions=3, radius=0.8), m)
scene, meta = b.build(bvh="median")
tris, bvh = scene.triangles, scene.bvh
print("tris", int(tris.count), "nodes", int(bvh.count))

k = np.random.default_rng(11)
n = 2048
origin = np.tile(np.array([[0.0, 0.0, 3.0]], np.float32), (n, 1))
target = k.uniform(-1, 1, (n, 3)).astype(np.float32)
d = target - origin
d /= np.linalg.norm(d, axis=1, keepdims=True)
origin = jnp.asarray(origin)
direction = jnp.asarray(d)
t0 = jnp.full((n,), 1e9, jnp.float32)

t_got, i_got = tile_closest_hit(
    origin, direction, bvh, pack_tris(tris), t0,
    t_min=1e-4, n_tris=int(tris.count))
t_got = np.asarray(t_got)
i_got = np.asarray(i_got)
print("pallas ok, hits:", (i_got >= 0).sum())

t_ref, i_ref = jnp_trav.bvh_closest_hit(
    origin, direction, bvh, tris, 1e-4, t0, meta.max_leaf)
i_ref = np.asarray(i_ref)
print("jnp hits:", (i_ref >= 0).sum())
assert ((i_got >= 0) == (i_ref >= 0)).all()
hr = i_ref >= 0
# rtol 1e-4: the Pallas path multiplies on the MXU at Precision.HIGHEST
# (bf16x3 ≈ f32 with different rounding than the jnp VPU path).
np.testing.assert_allclose(t_got[hr], np.asarray(t_ref)[hr], rtol=1e-4,
                           atol=1e-4)
print("MATCH")
