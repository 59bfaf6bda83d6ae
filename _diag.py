import time, numpy as np, jax, jax.numpy as jnp
import tpu_path_tracer as tpt
from tpu_path_tracer.core import rng
from tpu_path_tracer.kernels.hit import find_hit, shade_hit
from tpu_path_tracer.integrator.bsdf import material_scatter
from tpu_path_tracer.core.types import Ray

scene, meta, _ = tpt.builtin.cornell_box()
W=H=512; n=W*H
cfg = tpt.RenderConfig(width=W, height=H, max_bounces=4, importance_sampling=True)
pix = jnp.arange(n, dtype=jnp.uint32)
rs0 = rng.seed(pix, jnp.int32(7))
o = jnp.zeros((n,3)) + jnp.asarray([0.,0.,3.2])
import tpu_path_tracer.core.vecmath as vm
d = vm.normalize(jnp.concatenate([ (pix[:,None].astype(jnp.float32)%512)/512-0.5,
      (pix[:,None].astype(jnp.float32)//512)/512-0.5, -jnp.ones((n,1))], axis=1))
ray = Ray(origin=o, dir=d)

@jax.jit
def f_find(rs, ray, scene):
    rs, pt, pi, vu = find_hit(rs, ray, scene, meta, cfg)
    return rs + pt.astype(jnp.uint32) + pi.astype(jnp.uint32)

@jax.jit
def f_find_shade(rs, ray, scene):
    rs, pt, pi, vu = find_hit(rs, ray, scene, meta, cfg)
    rec = shade_hit(ray, pt, pi, vu, scene, cfg)
    return rs + rec.t.astype(jnp.uint32)

@jax.jit
def f_all(rs, ray, scene):
    rs, pt, pi, vu = find_hit(rs, ray, scene, meta, cfg)
    rec = shade_hit(ray, pt, pi, vu, scene, cfg)
    rs, srec = material_scatter(rs, ray.dir, rec, scene.materials)
    return rs + srec.dir[:,0].astype(jnp.uint32)

def marginal(f, *args):
    rs, *rest = args
    # warm
    out = f(rs, *rest); _ = np.asarray(out)
    def run(iters):
        cur = rs
        t0=time.perf_counter()
        for _ in range(iters):
            cur = f(cur, *rest)
        _ = np.asarray(cur)
        return time.perf_counter()-t0
    t1, t2 = run(3), run(23)
    return (t2-t1)/20

print("find_hit:        %.3f ms" % (marginal(f_find, rs0, ray, scene)*1e3))
print("find+shade:      %.3f ms" % (marginal(f_find_shade, rs0, ray, scene)*1e3))
print("find+shade+scat: %.3f ms" % (marginal(f_all, rs0, ray, scene)*1e3))
