"""Integrator behavior tests: emission masking, energy conservation,
accumulation, determinism, estimator-level NEE parity (SURVEY.md §4 golden
tier — the jnp integrator itself is the golden reference implementation
required by BASELINE.json)."""

import numpy as np
import jax.numpy as jnp
import pytest

import tpu_path_tracer as tpt
from tpu_path_tracer.core import rng
from tpu_path_tracer.core.types import Ray
from tpu_path_tracer.core.config import LAMBERTIAN, MIRROR
from tpu_path_tracer.integrator.path_tracer import trace
from tpu_path_tracer.integrator import film


def emissive_box_scene(emission=(1.0, 2.0, 3.0)):
    """Closed box whose walls all emit: first-bounce radiance == emission."""
    b = tpt.SceneBuilder()
    m = b.add_material("glow", LAMBERTIAN, [0, 0, 0], emission=emission)
    s = 1.0
    b.add_quad([-s, -s, -s], [2 * s, 0, 0], [0, 2 * s, 0], m)   # back
    b.add_quad([-s, -s, s], [0, 0, -2 * s], [0, 2 * s, 0], m)   # left
    b.add_quad([s, -s, -s], [0, 0, 2 * s], [0, 2 * s, 0], m)    # right
    b.add_quad([-s, s, -s], [2 * s, 0, 0], [0, 0, 2 * s], m)    # top
    b.add_quad([s, -s, -s], [-2 * s, 0, 0], [0, 0, 2 * s], m)   # bottom
    b.add_quad([s, -s, s], [-2 * s, 0, 0], [0, 2 * s, 0], m)    # front
    return b.build()


def random_dirs(n, seed=0):
    r = np.random.default_rng(seed)
    d = r.normal(size=(n, 3))
    return jnp.asarray(d / np.linalg.norm(d, axis=1, keepdims=True),
                       jnp.float32)


def test_emissive_enclosure_exact():
    """Every ray sees a front-facing emitter: radiance == emission exactly
    (first bounce terminates nothing, but emission is added once with
    throughput 1; later bounces add black-walled emission again...).  With
    color=0 the throughput dies after bounce 1, so the estimate is exact."""
    scene, meta = emissive_box_scene()
    cfg = tpt.RenderConfig(max_bounces=4)
    n = 64
    ray = Ray(origin=jnp.zeros((n, 3)), dir=random_dirs(n))
    rs = rng.seed(jnp.arange(n, dtype=jnp.uint32), 1)
    _, radiance = trace(rs, ray, scene, meta, cfg)
    np.testing.assert_allclose(np.asarray(radiance),
                               np.tile([[1.0, 2.0, 3.0]], (n, 1)), atol=1e-5)


def test_emission_is_unidirectional():
    """Back faces don't emit (traceRay.wgsl:19-22): a one-sided emissive quad
    seen from behind is culled by hit_quad, so the ray escapes to the
    background."""
    b = tpt.SceneBuilder()
    m = b.add_material("glow", LAMBERTIAN, [0, 0, 0], emission=(5, 5, 5))
    b.add_quad([-1, -1, 0], [2, 0, 0], [0, 2, 0], m)  # normal +z
    scene, meta = b.build()
    cfg = tpt.RenderConfig(max_bounces=2, background=(0.25, 0.5, 0.75))
    o = jnp.array([[0.0, 0, 1], [0, 0, -1]])
    d = jnp.array([[0.0, 0, -1], [0, 0, 1]])
    rs = rng.seed(jnp.arange(2, dtype=jnp.uint32), 1)
    _, radiance = trace(rs, Ray(o, d), scene, meta, cfg)
    np.testing.assert_allclose(radiance[0], [5, 5, 5], atol=1e-5)
    np.testing.assert_allclose(radiance[1], [0.25, 0.5, 0.75], atol=1e-5)


def test_furnace_white_diffuse():
    """Energy conservation: a perfectly white diffuse sphere in a uniform
    background must reflect (on average) exactly the background radiance."""
    b = tpt.SceneBuilder()
    white = b.add_material("w", LAMBERTIAN, [1, 1, 1])
    b.add_sphere([0, 0, 0], 1.0, white)
    scene, meta = b.build()
    cfg = tpt.RenderConfig(max_bounces=50, background=(1.0, 1.0, 1.0))
    n = 4096
    o = jnp.tile(jnp.array([[0.0, 0, 3]]), (n, 1))
    d = random_dirs(n, seed=2) * jnp.array([0.2, 0.2, 1.0])
    d = d / jnp.linalg.norm(d, axis=1, keepdims=True)
    d = d * jnp.array([1.0, 1.0, -1.0])
    rs = rng.seed(jnp.arange(n, dtype=jnp.uint32), 3)
    _, radiance = trace(rs, Ray(o, d), scene, meta, cfg)
    mean = np.asarray(radiance).mean()
    assert abs(mean - 1.0) < 0.02, mean


def test_mirror_reflection_path():
    """A perfect mirror bounces the ray deterministically into the emitter."""
    b = tpt.SceneBuilder()
    mirror = b.add_material("m", MIRROR, [1, 1, 1], roughness=0.0)
    glow = b.add_material("g", LAMBERTIAN, [0, 0, 0], emission=(2, 2, 2))
    b.add_quad([-1, -1, 0], [2, 0, 0], [0, 2, 0], mirror)     # mirror at z=0
    b.add_quad([-1, -1, 4], [0, 2, 0], [2, 0, 0], glow)       # emitter z=4,
    scene, meta = b.build()                                   # normal -z
    cfg = tpt.RenderConfig(max_bounces=3, background=(0, 0, 0))
    o = jnp.array([[0.0, 0, 1]])
    d = jnp.array([[0.0, 0, -1]])
    rs = rng.seed(jnp.arange(1, dtype=jnp.uint32), 1)
    _, radiance = trace(rs, Ray(o, d), scene, meta, cfg)
    np.testing.assert_allclose(radiance[0], [2, 2, 2], atol=1e-5)


def _render(cfg, frames, importance):
    scene, meta, _ = tpt.builtin.cornell_box()
    cfg = cfg.replace(importance_sampling=importance)
    cam = tpt.Camera(eye=[0, 0, 3.2], center=[0, 0, 0])
    fb = jnp.zeros((cfg.width * cfg.height, 3), jnp.float32)
    view = jnp.asarray(cam.view_matrix)
    for f in range(1, frames + 1):
        fb = tpt.render_frame(fb, jnp.int32(f), jnp.bool_(f == 1), view,
                              scene, meta, cfg)
    return np.asarray(fb) / frames


def test_nee_matches_plain_estimator():
    """NEE/MIS (traceRay.wgsl:24-58) and plain BSDF sampling estimate the
    same integral: per-image means agree within Monte-Carlo noise."""
    cfg = tpt.RenderConfig(width=32, height=32, max_bounces=5)
    plain = _render(cfg, frames=60, importance=False)
    nee = _render(cfg, frames=60, importance=True)
    # Compare mean image brightness channel-wise.
    np.testing.assert_allclose(nee.mean(axis=0), plain.mean(axis=0),
                               rtol=0.06)
    # And NEE should not be wildly noisier (sanity).
    assert np.isfinite(nee).all()


def test_accumulation_and_reset():
    scene, meta, _ = tpt.builtin.cornell_box()
    cfg = tpt.RenderConfig(width=8, height=8, max_bounces=2)
    cam = tpt.Camera(eye=[0, 0, 3.2], center=[0, 0, 0])
    view = jnp.asarray(cam.view_matrix)
    fb = jnp.zeros((64, 3), jnp.float32)
    f1 = tpt.render_frame(fb, jnp.int32(1), jnp.bool_(True), view, scene,
                          meta, cfg)
    f1_np = np.asarray(f1)  # snapshot: the framebuffer arg is donated
    f2 = tpt.render_frame(f1, jnp.int32(2), jnp.bool_(False), view, scene,
                          meta, cfg)
    f2_np = np.asarray(f2)
    assert (f2_np >= f1_np - 1e-6).all()  # accumulation
    f3 = tpt.render_frame(f2, jnp.int32(1), jnp.bool_(True), view, scene,
                          meta, cfg)
    np.testing.assert_allclose(np.asarray(f3), f1_np, atol=1e-6)


def test_determinism():
    scene, meta, _ = tpt.builtin.cornell_box()
    cfg = tpt.RenderConfig(width=8, height=8, max_bounces=3)
    cam = tpt.Camera(eye=[0, 0, 3.2], center=[0, 0, 0])
    view = jnp.asarray(cam.view_matrix)
    fb = jnp.zeros((64, 3), jnp.float32)
    a = tpt.render_frame(fb, jnp.int32(1), jnp.bool_(True), view, scene,
                         meta, cfg)
    b = tpt.render_frame(jnp.zeros((64, 3)), jnp.int32(1), jnp.bool_(True),
                         view, scene, meta, cfg)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_display_transform_range():
    fb = jnp.asarray(np.random.default_rng(0).uniform(0, 50, (64, 3)),
                     jnp.float32)
    img = film.display_transform(fb, 10)
    assert (np.asarray(img) >= 0).all() and (np.asarray(img) <= 1).all()
    np.testing.assert_array_equal(
        np.asarray(film.to_uint8(img)) <= 255, True)


def test_stratified_sampling_runs():
    scene, meta, _ = tpt.builtin.cornell_box()
    cfg = tpt.RenderConfig(width=8, height=8, max_bounces=2,
                           samples_per_pixel=4, stratify=True)
    cam = tpt.Camera(eye=[0, 0, 3.2], center=[0, 0, 0])
    fb = tpt.render_frame(jnp.zeros((64, 3)), jnp.int32(1), jnp.bool_(True),
                          jnp.asarray(cam.view_matrix), scene, meta, cfg)
    assert np.isfinite(np.asarray(fb)).all()
