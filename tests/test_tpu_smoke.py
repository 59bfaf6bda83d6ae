"""On-hardware smoke tests (non-interpret Mosaic lowering).

Round 1 shipped a chip-crashing kernel while interpret-mode parity passed
(VERDICT.md, ADVICE.md) — interpret mode never exercises real Mosaic
lowering.  These tests run the Pallas kernels compiled for the actual TPU
and are skipped everywhere else.  conftest.py pins tests to CPU, so this
file must be run explicitly against hardware:

    PYTHONPATH=. TPT_TPU_SMOKE=1 python -m pytest tests/test_tpu_smoke.py

(the driver-facing `.claude/skills/verify/SKILL.md` includes this gate).
First compiles go through the remote Mosaic service and can take several
minutes per kernel — run with a generous timeout.
"""

import os

import numpy as np
import pytest

requires_tpu = pytest.mark.skipif(
    not os.environ.get("TPT_TPU_SMOKE"),
    reason="set TPT_TPU_SMOKE=1 (and run outside the CPU conftest pin) "
           "to run on-hardware smoke tests")


@pytest.fixture(scope="module")
def tpu():
    import jax
    # conftest pins jax_platforms=cpu for the rest of the suite; undo it
    # for this module so the real chip is visible.
    jax.config.update("jax_platforms", None)
    if jax.default_backend() != "tpu":
        pytest.skip("no TPU backend available")
    return jax


@requires_tpu
def test_tile_traversal_on_tpu(tpu):
    import jax.numpy as jnp
    from tpu_path_tracer.core.config import LAMBERTIAN
    from tpu_path_tracer.kernels import traversal as jnp_trav
    from tpu_path_tracer.kernels.pallas.traversal import (
        pack_tris, tile_closest_hit)
    from tpu_path_tracer.scene import procedural
    from tpu_path_tracer.scene.builder import SceneBuilder

    b = SceneBuilder()
    m = b.add_material("w", LAMBERTIAN, [0.7, 0.7, 0.7])
    b.add_mesh(procedural.icosphere(subdivisions=3, radius=0.8), m)
    scene, meta = b.build(bvh="median")
    tris, bvh = scene.triangles, scene.bvh

    k = np.random.default_rng(11)
    n = 2048
    origin = np.tile(np.array([[0.0, 0.0, 3.0]], np.float32), (n, 1))
    target = k.uniform(-1, 1, (n, 3)).astype(np.float32)
    d = target - origin
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    t0 = jnp.full((n,), 1e9, jnp.float32)

    t_got, i_got = tile_closest_hit(
        jnp.asarray(origin), jnp.asarray(d), bvh, pack_tris(tris), t0,
        t_min=1e-4, n_tris=int(tris.count))
    t_ref, i_ref = jnp_trav.bvh_closest_hit(
        jnp.asarray(origin), jnp.asarray(d), bvh, tris, 1e-4, t0,
        meta.max_leaf)
    i_got, i_ref = np.asarray(i_got), np.asarray(i_ref)
    np.testing.assert_array_equal(i_got >= 0, i_ref >= 0)
    hr = i_ref >= 0
    # rtol 1e-4: MXU Precision.HIGHEST rounding vs the jnp VPU path.
    np.testing.assert_allclose(np.asarray(t_got)[hr],
                               np.asarray(t_ref)[hr], rtol=1e-4, atol=1e-4)


@requires_tpu
def test_megakernel_on_tpu(tpu):
    import jax.numpy as jnp
    import tpu_path_tracer as tpt
    from tpu_path_tracer.core import rng
    from tpu_path_tracer.integrator.render import path_trace_pixels
    from tpu_path_tracer.kernels.pallas.megakernel import (
        path_trace_pixels_pallas, supported)

    scene, meta, _ = tpt.builtin.cornell_box()
    cfg = tpt.RenderConfig(width=128, height=64, max_bounces=4,
                           importance_sampling=True)
    assert supported(scene, meta, cfg)
    cam = tpt.Camera(eye=[0, 0, 3.2], center=[0, 0, 0])
    view = jnp.asarray(cam.view_matrix)
    n = cfg.width * cfg.height
    pix = jnp.arange(n, dtype=jnp.uint32)
    px = (pix % jnp.uint32(cfg.width)).astype(jnp.int32)
    py = (pix // jnp.uint32(cfg.width)).astype(jnp.int32)
    rs = rng.seed(pix, jnp.int32(3))
    _, ref = path_trace_pixels(rs, view, px, py, scene, meta, cfg)
    got = path_trace_pixels_pallas(rs, view, px, py, scene, meta, cfg)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-3, atol=2e-3)


@requires_tpu
def test_mesh_render_frame_on_tpu(tpu):
    """End-to-end mesh frame through the default TPU path (use_pallas)."""
    import jax.numpy as jnp
    import tpu_path_tracer as tpt

    scene, meta, _ = tpt.builtin.reference_scene(include_mesh=True)
    cfg = tpt.RenderConfig(width=64, height=64, max_bounces=4,
                           use_pallas=True)
    cam = tpt.Camera(eye=[0.5, 0.0, 2.5], center=[0, 0, 0])
    view = jnp.asarray(cam.view_matrix)
    fb = jnp.zeros((cfg.width * cfg.height, 3), jnp.float32)
    fb = tpt.render_frame(fb, jnp.int32(1), jnp.bool_(True), view, scene,
                          meta, cfg)
    fb = np.asarray(fb)
    assert np.isfinite(fb).all()
    assert fb.max() > 0.0
