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
    # for this module so the real chip is visible, and RESTORE the pin on
    # teardown so a mixed-suite process cannot leak TPU execution into
    # later CPU-pinned tests.  (No-op if a backend already initialized —
    # hence the docstring's run-this-file-alone instruction.)
    prev = jax.config.jax_platforms
    jax.config.update("jax_platforms", None)
    if jax.default_backend() != "tpu":
        jax.config.update("jax_platforms", prev)
        pytest.skip("no TPU backend available")
    yield jax
    jax.config.update("jax_platforms", prev)


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
    ref, got = np.asarray(ref), np.asarray(got)
    # Estimator-level contract on hardware: XLA (wavefront) and Mosaic
    # (megakernel) round fused float ops differently, and one ULP at a
    # branch (hit test, RR, material draw) resends that pixel's whole path
    # — so a small fraction of pixels legitimately diverges even though
    # every draw is replayed in the same order.  CPU interpret mode holds
    # the strict pixel-for-pixel contract (tests/test_pallas.py); here we
    # bound the flip fraction and require estimator (mean-image) agreement.
    err = np.abs(got - ref).max(1)
    rel = err / (np.abs(ref).max(1) + 1e-3)
    flip_frac = float((rel > 2e-3).mean())
    assert flip_frac < 0.10, f"{flip_frac:.1%} pixels diverged"
    mean_diff = np.abs(got.mean(0) - ref.mean(0)).max()
    assert mean_diff < 2e-2, f"mean image diff {mean_diff}"


@requires_tpu
def test_megakernel_vjp_on_tpu(tpu):
    """The custom-VJP backward kernel compiles and runs on hardware, and
    its table gradients agree with the wavefront's autodiff at the
    estimator level (branch flips perturb individual paths; the summed
    per-material gradients must still agree)."""
    import jax
    import jax.numpy as jnp
    import tpu_path_tracer as tpt
    from tpu_path_tracer.core import rng
    from tpu_path_tracer.diff.params import apply_params, extract_params
    from tpu_path_tracer.integrator.render import path_trace_pixels
    from tpu_path_tracer.kernels.pallas.megakernel import (
        path_trace_pixels_pallas, vjp_supported)

    scene, meta, _ = tpt.builtin.cornell_box()
    cfg = tpt.RenderConfig(width=128, height=64, max_bounces=4,
                           importance_sampling=True)
    assert vjp_supported(scene, meta, cfg)
    cam = tpt.Camera(eye=[0, 0, 3.2], center=[0, 0, 0])
    view = jnp.asarray(cam.view_matrix)
    n = cfg.width * cfg.height
    pix = jnp.arange(n, dtype=jnp.uint32)
    px = (pix % jnp.uint32(cfg.width)).astype(jnp.int32)
    py = (pix // jnp.uint32(cfg.width)).astype(jnp.int32)
    params = extract_params(scene, groups=("emission", "bsdf"))

    def loss_wave(params):
        s = apply_params(scene, params)
        rs = rng.seed(pix, 7)
        return jnp.mean(path_trace_pixels(rs, view, px, py, s, meta,
                                          cfg)[1] ** 2)

    def loss_mk(params):
        s = apply_params(scene, params)
        rs = rng.seed(pix, 7)
        return jnp.mean(path_trace_pixels_pallas(rs, view, px, py, s,
                                                 meta, cfg) ** 2)

    gw = jax.grad(loss_wave)(params)
    gm = jax.grad(loss_mk)(params)
    for k in ("emission", "color"):
        a, b = np.asarray(gw[k]), np.asarray(gm[k])
        assert np.all(np.isfinite(b)), k
        scale = max(np.max(np.abs(a)), 1e-8)
        # Bound tracks the cross-compiler pixel-flip fraction (~5%, see
        # test_megakernel_on_tpu): each flipped pixel contributes a
        # different (still unbiased) path sample to the summed gradient.
        assert np.max(np.abs(a - b)) / scale < 0.12, (
            f"{k}: wavefront {a} vs megakernel {b}")


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
