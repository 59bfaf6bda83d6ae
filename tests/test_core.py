"""Unit tests: vector math, RNG, camera (SURVEY.md §4 unit-test tier)."""

import numpy as np
import jax.numpy as jnp

from tpu_path_tracer.core import rng, vecmath as vm
from tpu_path_tracer.core.camera import Camera, target_to


def test_normalize_and_dot():
    v = jnp.array([[3.0, 0.0, 4.0], [0.0, 2.0, 0.0]])
    n = vm.normalize(v)
    np.testing.assert_allclose(vm.length(n), [1.0, 1.0], atol=1e-6)
    np.testing.assert_allclose(vm.dot(n[0], n[0]), 1.0, atol=1e-6)


def test_onb_orthonormal():
    """ONB invariants of onb_build_from_w (importanceSampling.wgsl:60-67),
    including the helper-axis switch at |w.x| > 0.9."""
    w = jnp.array([[0.0, 0.0, 1.0], [1.0, 0.01, 0.0], [0.5, -0.5, 0.7],
                   [0.95, 0.1, 0.1]])
    u, v, uw = vm.onb_from_w(w)
    for a, b in [(u, v), (v, uw), (u, uw)]:
        np.testing.assert_allclose(vm.dot(a, b), np.zeros(4), atol=1e-6)
    np.testing.assert_allclose(vm.length(u), np.ones(4), atol=1e-6)
    # Local->world with (0,0,1) recovers unit w (onb_get_local).
    z = jnp.tile(jnp.array([[0.0, 0.0, 1.0]]), (4, 1))
    np.testing.assert_allclose(vm.onb_local(u, v, uw, z), uw, atol=1e-6)


def test_reflect_refract():
    d = vm.normalize(jnp.array([[1.0, -1.0, 0.0]]))
    n = jnp.array([[0.0, 1.0, 0.0]])
    r = vm.reflect(d, n)
    np.testing.assert_allclose(r, vm.normalize(jnp.array([[1.0, 1.0, 0.0]])),
                               atol=1e-6)
    # Straight-through refraction at eta ratio 1.
    rr = vm.refract(d, n, jnp.ones(1))
    np.testing.assert_allclose(rr, d, atol=1e-6)


def _pcg_reference(state):
    """Direct integer-arithmetic port of rand2D (common.wgsl:7-12)."""
    state = (state * 747796405 + 2891336453) & 0xFFFFFFFF
    word = (((state >> ((state >> 28) + 4)) ^ state) * 277803737) & 0xFFFFFFFF
    return state, ((word >> 22) ^ word) / 4294967295.0


def test_pcg_bit_exact():
    """The lane RNG reproduces the reference PCG stream bit-exactly."""
    state = jnp.asarray([0, 1, 12345, 719393, 2**31], jnp.uint32)
    py_state = [0, 1, 12345, 719393, 2**31]
    for _ in range(5):
        state, u = rng.uniform(state)
        expected = []
        for i, s in enumerate(py_state):
            s, val = _pcg_reference(s)
            py_state[i] = s
            expected.append(val)
        np.testing.assert_array_equal(np.asarray(state), np.asarray(
            py_state, np.uint32))
        np.testing.assert_allclose(np.asarray(u), expected, atol=1e-6)


def test_rng_uniformity():
    state = rng.seed(jnp.arange(10000, dtype=jnp.uint32), 1)
    state, u = rng.uniform(state)
    u = np.asarray(u)
    assert 0.0 <= u.min() and u.max() <= 1.0
    assert abs(u.mean() - 0.5) < 0.02


def test_cosine_sampling_pdf():
    """Cosine-weighted z samples: E[z] = 2/3 for pdf = cos/pi."""
    state = rng.seed(jnp.arange(20000, dtype=jnp.uint32), 7)
    state, d = rng.cosine_wrt_z(state)
    z = np.asarray(d[:, 2])
    assert abs(z.mean() - 2.0 / 3.0) < 0.01
    np.testing.assert_allclose(np.asarray(vm.length(d)), 1.0, atol=1e-5)


def test_target_to():
    """gl-matrix targetTo semantics: translation = eye, -z looks at target."""
    m = target_to(np.array([0.5, 0, 2.5]), np.zeros(3), np.array([0, 1, 0.0]))
    np.testing.assert_allclose(m[:3, 3], [0.5, 0, 2.5], atol=1e-6)
    fwd = -m[:3, 2]  # camera looks along -z basis
    expect = -np.array([0.5, 0, 2.5])
    expect /= np.linalg.norm(expect)
    np.testing.assert_allclose(fwd, expect, atol=1e-6)


def test_camera_orbit_zoom_pan():
    cam = Camera(eye=[0.0, 0.0, 2.0], center=[0, 0, 0])
    r0 = np.linalg.norm(cam.eye)
    cam.orbit((0, 0), (500, 0))
    assert abs(np.linalg.norm(cam.eye) - r0) < 1e-5  # orbit preserves radius
    assert cam.consume_motion_flags()
    cam.moving = False
    assert not cam.consume_motion_flags()
    cam.zoom(-1.0)
    assert np.linalg.norm(cam.eye) < r0  # zoom moved along view dir
    eye_before = cam.eye.copy()
    cam.move_left()
    assert cam.eye[0] - eye_before[0] == np.float32(0.1)
