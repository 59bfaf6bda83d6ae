"""Differentiability tests: reverse-mode vs finite differences
(BASELINE.json configs[3]; SURVEY.md §4 gradient tier).

Strategy: with a fixed seed the renderer is a deterministic function of the
scene parameters; parameters that do not flip discrete decisions (emitter
radiance, albedo, geometry within a stable-hit regime) admit clean
finite-difference checks.  The discrete hit structure is detached by design
(kernels/hit.py), so geometry gradients flow through the re-shaded hit point.
"""

import numpy as np
import jax
import jax.numpy as jnp

import tpu_path_tracer as tpt
from tpu_path_tracer.core import rng
from tpu_path_tracer.core.config import LAMBERTIAN
from tpu_path_tracer.core.types import Ray
from tpu_path_tracer.integrator.path_tracer import trace
from tpu_path_tracer.kernels.hit import find_hit, shade_hit


def _cornell(emission_scale=1.0):
    scene, meta, _ = tpt.builtin.cornell_box()
    return scene, meta


def _mean_radiance(scene, meta, cfg, n=256, seed=5):
    r = np.random.default_rng(seed)
    o = jnp.tile(jnp.array([[0.0, 0, 3.0]], jnp.float32), (n, 1))
    d = r.normal(size=(n, 3))
    d[:, 2] = -np.abs(d[:, 2]) - 1.0
    d = jnp.asarray(d / np.linalg.norm(d, axis=1, keepdims=True), jnp.float32)
    rs = rng.seed(jnp.arange(n, dtype=jnp.uint32), 9)
    _, radiance = trace(rs, Ray(o, d), scene, meta, cfg)
    return jnp.mean(radiance)


def test_emission_gradient_exact_linearity():
    """Radiance is linear in emitter radiance along any fixed path set, so
    d(mean)/d(emission_scale) * scale == contribution — check autodiff
    against the exact linear prediction."""
    scene, meta = _cornell()
    cfg = tpt.RenderConfig(max_bounces=4, background=(0.0, 0.0, 0.0))

    def loss(scale):
        mats = scene.materials._replace(
            emission=scene.materials.emission * scale)
        s2 = scene._replace(materials=mats)
        return _mean_radiance(s2, meta, cfg)

    g = jax.grad(loss)(1.0)
    l0 = loss(0.0)
    l1 = loss(1.0)
    # Linear in emission: grad == l1 - l0 exactly (same RNG stream).
    np.testing.assert_allclose(np.asarray(g), np.asarray(l1 - l0),
                               rtol=1e-4)
    assert float(g) > 0.0


def test_albedo_gradient_finite_difference():
    scene, meta = _cornell()
    cfg = tpt.RenderConfig(max_bounces=3, background=(0.0, 0.0, 0.0))

    def loss(albedo_scale):
        mats = scene.materials._replace(
            color=scene.materials.color * albedo_scale)
        return _mean_radiance(scene._replace(materials=mats), meta, cfg)

    g = jax.grad(loss)(1.0)
    eps = 1e-3
    fd = (loss(1.0 + eps) - loss(1.0 - eps)) / (2 * eps)
    np.testing.assert_allclose(np.asarray(g), np.asarray(fd), rtol=2e-2)


def test_vertex_position_gradient_through_shading():
    """Geometry gradient through the differentiable re-shade: moving a
    triangle along the ray changes the hit distance one-for-one."""
    b = tpt.SceneBuilder()
    m = b.add_material("d", LAMBERTIAN, [1, 1, 1])
    b.add_mesh(tpt.procedural.cube(0.5), m)
    scene, meta = b.build(bvh="none")
    cfg = tpt.RenderConfig()
    o = jnp.array([[0.0, 0.1, 3.0]])
    d = jnp.array([[0.0, 0.0, -1.0]])
    ray = Ray(o, d)
    rs = jnp.zeros(1, jnp.uint32)
    _, pt, pi, vu = find_hit(rs, ray, scene, meta, cfg)

    def hit_t(dz):
        tris = scene.triangles
        shift = jnp.array([0.0, 0.0, dz])
        tris = tris._replace(a=tris.a + shift, b=tris.b + shift,
                             c=tris.c + shift)
        rec = shade_hit(ray, pt, pi, vu, scene._replace(triangles=tris), cfg)
        return rec.t[0]

    g = jax.grad(hit_t)(0.0)
    np.testing.assert_allclose(np.asarray(g), -1.0, atol=1e-4)


def test_sphere_radius_gradient():
    """d(t)/d(radius) = -1 for a head-on ray hitting a sphere front."""
    b = tpt.SceneBuilder()
    m = b.add_material("d", LAMBERTIAN, [1, 1, 1])
    b.add_sphere([0, 0, 0], 1.0, m)
    scene, meta = b.build()
    cfg = tpt.RenderConfig()
    ray = Ray(jnp.array([[0.0, 0, 5.0]]), jnp.array([[0.0, 0, -1.0]]))
    rs = jnp.zeros(1, jnp.uint32)
    _, pt, pi, vu = find_hit(rs, ray, scene, meta, cfg)

    def hit_t(dr):
        sph = scene.spheres._replace(radius=scene.spheres.radius + dr)
        rec = shade_hit(ray, pt, pi, vu, scene._replace(spheres=sph), cfg)
        return rec.t[0]

    g = jax.grad(hit_t)(0.0)
    np.testing.assert_allclose(np.asarray(g), -1.0, atol=1e-4)


def test_full_render_is_differentiable():
    """jax.grad through the whole multi-bounce scan (incl. the detached hit
    search) compiles and yields finite, nonzero parameter gradients."""
    scene, meta = _cornell()
    cfg = tpt.RenderConfig(max_bounces=3)

    def loss(params):
        mats = scene.materials._replace(emission=params["emission"],
                                        color=params["color"])
        return _mean_radiance(scene._replace(materials=mats), meta, cfg,
                              n=128)

    params = {"emission": scene.materials.emission,
              "color": scene.materials.color}
    grads = jax.jit(jax.grad(loss))(params)
    ge = np.asarray(grads["emission"])
    gc = np.asarray(grads["color"])
    assert np.isfinite(ge).all() and np.isfinite(gc).all()
    assert (np.abs(ge) > 0).any() and (np.abs(gc) > 0).any()
