"""Vectorized ray/primitive intersection math (pure jnp; VPU-shaped).

Each WGSL per-thread intersector from ``shaders/common.wgsl`` becomes a
batched, branch-free function over dense ray/primitive broadcasts: a single
ray batch ``[N]`` is tested against a primitive table ``[P]`` producing
``[N, P]`` hit distances (invalid lanes = +inf), which downstream code
min-reduces.  No per-lane control flow — misses are masked, not branched,
which is what the TPU VPU wants.

These functions are fully differentiable w.r.t. the primitive parameters; the
discrete closest-hit *selection* is made non-differentiable one level up
(``tpu_path_tracer.kernels.hit``).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..core import vecmath as vm
from ..core.config import MAX_FLOAT

# "No hit" sentinel beyond any valid t_max.  NumPy scalar on purpose: a
# jnp scalar would be a 0-d DEVICE constant captured into every jitted
# caller, which this runtime punishes with a sync round-trip per dispatch.
INF = np.float32(MAX_FLOAT * 1.01)
# Parallel-ray cull for Möller-Trumbore: |det| below this is treated as
# "ray parallel to the triangle plane".  Absolute and tiny on purpose —
# det scales with the unnormalized normal (~edge_len^2), so any guard at
# scene-epsilon scale (the reference's |det| < t_min, common.wgsl:205)
# silently rejects every triangle of a finely tessellated mesh.
DET_EPS = np.float32(1e-12)


def sphere_roots(origin, direction, center, radius):
    """Both quadratic roots of ray/sphere, broadcast.

    ``origin``/``direction``: [..., 3]; ``center``: [..., 3]; ``radius``: [...].
    Returns (root_near, root_far, discriminant) with roots ordered.
    Math of ``hit_sphere`` / ``hit_sphere_local`` (``common.wgsl:29-100``).
    """
    oc = origin - center
    a = vm.dot(direction, direction)
    half_b = vm.dot(direction, oc)
    c = vm.dot(oc, oc) - radius * radius
    disc = half_b * half_b - a * c
    sq = vm.safe_sqrt(disc)  # NaN-free gradient at disc <= 0 (grazing/miss)
    inv_a = jnp.reciprocal(a)
    return (-half_b - sq) * inv_a, (-half_b + sq) * inv_a, disc


def sphere_t(origin, direction, center, radius, t_min, t_max):
    """Closest valid sphere hit distance, or INF.

    Root selection matches ``hit_sphere`` (``common.wgsl:39-52``): try the near
    root; if outside (t_min, t_max) take the far root; reject if both invalid.
    """
    r0, r1, disc = sphere_roots(origin, direction, center, radius)
    near_ok = (r0 > t_min) & (r0 < t_max)
    root = jnp.where(near_ok, r0, r1)
    ok = (disc >= 0.0) & (root > t_min) & (root < t_max)
    return jnp.where(ok, root, INF)


def quad_t(origin, direction, q, u, v, normal, d, w, t_min, t_max):
    """One-sided quad hit distance, or INF — ``hit_quad``
    (``common.wgsl:148-187``): cull back side, plane solve, bilinear
    containment via the precomputed ``w`` vector."""
    denom = vm.dot(normal, direction)
    t = (d - vm.dot(normal, origin)) / denom
    p = origin + t[..., None] * direction
    rel = p - q
    alpha = vm.dot(w, vm.cross(rel, v))
    beta = vm.dot(w, vm.cross(u, rel))
    ok = (
        (vm.dot(direction, normal) <= 0.0)     # one-sided, common.wgsl:150
        & (jnp.abs(denom) >= 1e-8)
        & (t > t_min) & (t < t_max)
        & (alpha >= 0.0) & (alpha <= 1.0)
        & (beta >= 0.0) & (beta <= 1.0)
    )
    return jnp.where(ok, t, INF)


def quad_derived(q, u, v):
    """Plane data precompute, identical math to the host packer
    (``lib/primitives/quad.js:21-27``): n = cross(u, v); normal = n/|n|;
    D = normal.Q; w = n/(n.n).  Differentiable — the shading path recomputes
    these from (q, u, v) so gradients reach the raw quad geometry."""
    n = vm.cross(u, v)
    normal = vm.normalize(n)
    d = vm.dot(normal, q)
    w = n / vm.dot(n, n)[..., None]
    return normal, d, w


def triangle_t(origin, direction, a, b, c, t_min, t_max):
    """Moller-Trumbore, broadcast; returns (t_or_INF, u, v, w).

    Matches ``hit_triangle`` (``common.wgsl:191-242``) *in world space* — the
    reference transforms the ray into object space per test because its GPU
    triangle buffer is object-space; ours is baked to world space at scene
    build (see ``core.types``), so the test runs directly.  Note the
    reference's unusual barycentric guards (each must exceed t_min, not 0)
    — preserved for parity.  The reference ALSO culls on ``|det| < t_min``
    (``common.wgsl:205``): that guard is scale-DEPENDENT — det carries the
    unnormalized normal's magnitude ~edge_len^2, so a 327k-triangle mesh
    (edge ~0.02 → |n| ~5e-5 < 1e-4) would reject EVERY triangle.  We use a
    tiny absolute parallel-ray epsilon instead; for the reference's own
    scene scales the two are indistinguishable (its meshes never get near
    |n| = 1e-4).
    """
    ab = b - a
    ac = c - a
    n = vm.cross(ab, ac)
    det = -vm.dot(direction, n)
    ao = origin - a
    dao = vm.cross(ao, direction)
    inv_det = jnp.reciprocal(det)
    t = vm.dot(ao, n) * inv_det
    u = vm.dot(ac, dao) * inv_det
    v = -vm.dot(ab, dao) * inv_det
    w = 1.0 - u - v
    ok = (
        (jnp.abs(det) >= DET_EPS)
        & (t >= t_min) & (t <= t_max)
        & (u >= t_min) & (v >= t_min) & (w >= t_min)
    )
    return jnp.where(ok, t, INF), u, v, w


def aabb_hit(origin, inv_dir, box_min, box_max, t_min, t_max):
    """Slab test — ``hit_aabb`` (``common.wgsl:245-256``).  ``t_max`` may be a
    per-ray running closest-hit to prune (the traversal passes t_best)."""
    t0 = (box_min - origin) * inv_dir
    t1 = (box_max - origin) * inv_dir
    smaller = jnp.minimum(t0, t1)
    bigger = jnp.maximum(t0, t1)
    lo = jnp.maximum(t_min, jnp.max(smaller, axis=-1))
    hi = jnp.minimum(t_max, jnp.min(bigger, axis=-1))
    return hi > lo


def volume_interval(origin, direction, center, radius, t_min, t_max):
    """Entry/exit parametric interval of a constant-density medium sphere.

    Mirrors ``hit_volume`` (``common.wgsl:102-129``): rec1 = smaller root
    (unbounded search), rec2 = larger root (must exceed rec1 + 1e-4), clamp
    rec1 to [max(t_min, 0), .] and rec2 to t_max.  Returns
    (rec1, rec2, interval_valid)."""
    r0, r1, disc = sphere_roots(origin, direction, center, radius)
    ok = (disc >= 0.0) & (r1 > r0 + 0.0001)
    rec1 = jnp.maximum(r0, t_min)
    rec2 = jnp.minimum(r1, t_max)
    ok = ok & (rec1 < rec2)
    rec1 = jnp.maximum(rec1, 0.0)
    return rec1, rec2, ok


def volume_t(origin, direction, center, radius, neg_inv_density, u, t_min, t_max):
    """Sampled scattering distance inside a medium sphere, or INF.

    ``hit_dist = neg_inv_density * log(u)`` with the material's ``roughness``
    channel storing ``-1/density`` (``common.wgsl:130-140``; densities set at
    ``lib/scene.js:46-76``).  ``u`` is an externally sampled uniform so the
    discrete accept/reject can be replayed differentiably."""
    rec1, rec2, ok = volume_interval(origin, direction, center, radius,
                                     t_min, t_max)
    ray_len = vm.length(direction)
    dist_inside = (rec2 - rec1) * ray_len
    hit_dist = neg_inv_density * jnp.log(jnp.maximum(u, 1e-12))
    ok = ok & (hit_dist <= dist_inside)
    t = rec1 + hit_dist / ray_len
    return jnp.where(ok, t, INF)
