import os
os.environ["JAX_PLATFORMS"] = "cpu"
import numpy as np, jax, jax.numpy as jnp
import tpu_path_tracer as tpt
from tpu_path_tracer.core import rng
from tpu_path_tracer.integrator.render import path_trace_pixels
from tpu_path_tracer.kernels.pallas.megakernel import path_trace_pixels_pallas, supported

scene, meta, _ = tpt.builtin.cornell_box()
for IS in (False, True):
    cfg = tpt.RenderConfig(width=64, height=64, max_bounces=3, importance_sampling=IS)
    cam = tpt.Camera(eye=[0,0,3.2], center=[0,0,0])
    view = jnp.asarray(cam.view_matrix)
    n = 64*64
    pix = jnp.arange(n, dtype=jnp.uint32)
    px = (pix % jnp.uint32(64)).astype(jnp.int32)
    py = (pix // jnp.uint32(64)).astype(jnp.int32)
    rs = rng.seed(pix, jnp.int32(7))
    _, ref = path_trace_pixels(rs, view, px, py, scene, meta, cfg)
    out = path_trace_pixels_pallas(rs, view, px, py, scene, meta, cfg, interpret=True)
    ref, out = np.asarray(ref), np.asarray(out)
    d = np.abs(ref-out)
    bad = (d > 1e-3).any(axis=1).mean()
    print(f"IS={IS} mean ref {ref.mean():.5f} mean out {out.mean():.5f} maxdiff {d.max():.2e} frac_bad {bad:.5f}")
