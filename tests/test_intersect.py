"""Intersector unit tests vs. analytic cases (SURVEY.md §4)."""

import numpy as np
import jax.numpy as jnp

from tpu_path_tracer.kernels import intersect
from tpu_path_tracer.core.config import MAX_FLOAT

TMIN, TMAX = 1e-6, MAX_FLOAT


def test_sphere_hit_and_inside():
    o = jnp.array([[0.0, 0, 5], [0, 0, 0], [0, 0, 5]])
    d = jnp.array([[0.0, 0, -1], [0, 0, -1], [0, 1, 0]])
    c = jnp.zeros((3, 3))
    r = jnp.ones(3)
    t = intersect.sphere_t(o, d, c, r, TMIN, TMAX)
    np.testing.assert_allclose(t[0], 4.0, atol=1e-5)   # outside: near root
    np.testing.assert_allclose(t[1], 1.0, atol=1e-5)   # inside: far root
    assert t[2] > MAX_FLOAT                            # miss


def test_quad_one_sided():
    """hit_quad culls rays approaching from behind (common.wgsl:150)."""
    q = jnp.array([[-1.0, -1, 0]])
    u = jnp.array([[2.0, 0, 0]])
    v = jnp.array([[0.0, 2, 0]])
    normal, d_plane, w = intersect.quad_derived(q, u, v)
    # normal = +z; front approach (dir -z) hits, back approach culled.
    o_front = jnp.array([[0.0, 0, 2]])
    o_back = jnp.array([[0.0, 0, -2]])
    dir_front = jnp.array([[0.0, 0, -1]])
    dir_back = jnp.array([[0.0, 0, 1]])
    t1 = intersect.quad_t(o_front, dir_front, q, u, v, normal, d_plane, w,
                          TMIN, TMAX)
    t2 = intersect.quad_t(o_back, dir_back, q, u, v, normal, d_plane, w,
                          TMIN, TMAX)
    np.testing.assert_allclose(t1, 2.0, atol=1e-5)
    assert t2[0] > MAX_FLOAT
    # Outside the parallelogram bounds -> miss.
    o_out = jnp.array([[5.0, 0, 2]])
    t3 = intersect.quad_t(o_out, dir_front, q, u, v, normal, d_plane, w,
                          TMIN, TMAX)
    assert t3[0] > MAX_FLOAT


def test_triangle_barycentrics():
    a = jnp.array([[0.0, 0, 0]])
    b = jnp.array([[1.0, 0, 0]])
    c = jnp.array([[0.0, 1, 0]])
    o = jnp.array([[0.25, 0.25, 1.0]])
    d = jnp.array([[0.0, 0, -1]])
    t, u, v, w = intersect.triangle_t(o, d, a, b, c, TMIN, TMAX)
    np.testing.assert_allclose(t, 1.0, atol=1e-5)
    np.testing.assert_allclose(u, 0.25, atol=1e-5)  # weight of B
    np.testing.assert_allclose(v, 0.25, atol=1e-5)  # weight of C
    np.testing.assert_allclose(w, 0.5, atol=1e-5)   # weight of A
    # Outside -> miss.
    o2 = jnp.array([[0.9, 0.9, 1.0]])
    t2, *_ = intersect.triangle_t(o2, d, a, b, c, TMIN, TMAX)
    assert t2[0] > MAX_FLOAT


def test_aabb_slab():
    o = jnp.array([[0.0, 0, 5], [3, 3, 5]])
    d = jnp.array([[0.0, 0, -1], [0, 0, -1]])
    inv = jnp.reciprocal(d)
    hit = intersect.aabb_hit(o, inv, jnp.array([-1.0, -1, -1]),
                             jnp.array([1.0, 1, 1]), TMIN,
                             jnp.full((2,), TMAX))
    assert bool(hit[0]) and not bool(hit[1])
    # t_max pruning: box behind an existing closer hit is skipped.
    hit2 = intersect.aabb_hit(o[:1], inv[:1], jnp.array([-1.0, -1, -1]),
                              jnp.array([1.0, 1, 1]), TMIN, jnp.array([2.0]))
    assert not bool(hit2[0])


def test_volume_interval_and_sampling():
    o = jnp.array([[0.0, 0, 5]])
    d = jnp.array([[0.0, 0, -1]])
    c = jnp.zeros((1, 3))
    r = jnp.ones(1)
    rec1, rec2, ok = intersect.volume_interval(o, d, c, r, TMIN, TMAX)
    assert bool(ok[0])
    np.testing.assert_allclose(rec1, 4.0, atol=1e-5)
    np.testing.assert_allclose(rec2, 6.0, atol=1e-5)
    # u -> 1 means hit_dist -> 0: scatter right at entry.
    t = intersect.volume_t(o, d, c, r, jnp.full(1, -1 / 5.0),
                           jnp.array([0.999999]), TMIN, TMAX)
    np.testing.assert_allclose(t, 4.0, atol=1e-4)
    # Tiny u -> huge free flight -> passes through.
    t2 = intersect.volume_t(o, d, c, r, jnp.full(1, -1 / 5.0),
                            jnp.array([1e-9]), TMIN, TMAX)
    assert t2[0] > MAX_FLOAT


def test_volume_free_flight_distribution():
    """Mean free path = 1/density along an infinite chord."""
    n = 50000
    o = jnp.tile(jnp.array([[0.0, 0, 50]]), (n, 1))
    d = jnp.tile(jnp.array([[0.0, 0, -1]]), (n, 1))
    c = jnp.zeros((n, 3))
    r = jnp.full(n, 40.0)
    density = 2.0
    u = jnp.asarray(np.random.default_rng(0).uniform(1e-12, 1, n), jnp.float32)
    t = intersect.volume_t(o, d, c, r, jnp.full(n, -1 / density), u,
                           TMIN, TMAX)
    entry = 10.0
    flights = np.asarray(t)[np.asarray(t) < MAX_FLOAT] - entry
    assert abs(flights.mean() - 1 / density) < 0.02


def test_triangle_tiny_det_not_rejected():
    """A finely tessellated mesh has unnormalized normals ~edge_len^2 far
    below scene epsilons; the parallel-ray cull must be scale-robust.
    Round-4 regression: the reference's |det| < t_min guard
    (common.wgsl:205) silently rejected EVERY triangle of a 327k-tri
    icosphere (|n| ~ 5e-5 < 1e-4)."""
    a = jnp.asarray([[0.0, 0.0, 0.8]])
    b = jnp.asarray([[6e-3, 0.0, 0.8]])
    c = jnp.asarray([[3e-3, 5e-3, 0.8]])
    o = jnp.asarray([[3e-3, 2e-3, 3.0]])
    d = jnp.asarray([[0.0, 0.0, -1.0]])
    t, u, v, w = intersect.triangle_t(o, d, a, b, c, 1e-4, 1e9)
    np.testing.assert_allclose(float(t[0]), 2.2, rtol=1e-5)
