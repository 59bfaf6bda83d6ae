"""BVH build invariants + traversal equivalence (SURVEY.md §4: every leaf
reachable, parent boxes contain children, flatten order left = cur+1,
traversal result == brute force)."""

import numpy as np
import jax.numpy as jnp
import pytest

from tpu_path_tracer.accel import bvh as bvh_mod
from tpu_path_tracer.core.types import FlatBVH, Triangles
from tpu_path_tracer.kernels import traversal


def random_triangles(n, seed=0, spread=10.0):
    r = np.random.default_rng(seed)
    a = r.uniform(-spread, spread, (n, 3)).astype(np.float32)
    b = a + r.uniform(-1, 1, (n, 3)).astype(np.float32)
    c = a + r.uniform(-1, 1, (n, 3)).astype(np.float32)
    return a, b, c


def check_invariants(arrs: bvh_mod.FlatBVHArrays, n_prims):
    b = len(arrs.mins)
    leaves = arrs.right < 0
    interior = ~leaves
    # Permutation validity.
    assert sorted(arrs.order.tolist()) == list(range(n_prims))
    # Every primitive covered exactly once by leaf ranges.
    covered = np.zeros(n_prims, np.int64)
    for s, c in zip(arrs.prim_start[leaves], arrs.prim_count[leaves]):
        covered[s:s + c] += 1
    assert (covered == 1).all()
    # Parent boxes contain children; left child is node+1.
    for i in np.nonzero(interior)[0]:
        left, right = i + 1, arrs.right[i]
        assert 0 < right < b
        for ch in (left, right):
            assert (arrs.mins[i] <= arrs.mins[ch] + 1e-5).all()
            assert (arrs.maxs[i] >= arrs.maxs[ch] - 1e-5).all()
    # Skip pointers: miss[i] is the first preorder node outside subtree i,
    # always > i, and the sentinel only at the end.
    assert (arrs.miss > np.arange(b)).all()
    assert (arrs.miss <= b).all()
    assert arrs.miss[0] == b


@pytest.mark.parametrize("builder,kw", [
    ("median", {}),
    ("sah", {"max_leaf": 8}),
    ("lbvh", {"leaf_size": 4}),
])
def test_build_invariants(builder, kw):
    a, b, c = random_triangles(257, seed=3)
    mins, maxs = bvh_mod.triangle_aabbs(a, b, c)
    arrs = bvh_mod.BUILDERS[builder](mins, maxs, **kw)
    check_invariants(arrs, 257)


def test_median_leaf_is_single_primitive():
    """Reference parity: the median builder's leaves hold exactly one
    primitive (bvhNode.js:47-53)."""
    a, b, c = random_triangles(64, seed=1)
    mins, maxs = bvh_mod.triangle_aabbs(a, b, c)
    arrs = bvh_mod.build_median(mins, maxs)
    leaves = arrs.right < 0
    assert (arrs.prim_count[leaves] == 1).all()
    assert leaves.sum() == 64
    assert len(arrs.mins) == 127  # 2n-1 nodes


def _to_device(arrs, a, b, c):
    order = arrs.order
    a, b, c = a[order], b[order], c[order]
    tris = Triangles(a=jnp.asarray(a), b=jnp.asarray(b), c=jnp.asarray(c),
                     na=jnp.asarray(a), nb=jnp.asarray(b), nc=jnp.asarray(c),
                     material_id=jnp.zeros(len(a), jnp.int32))
    flat = FlatBVH(mins=jnp.asarray(arrs.mins), maxs=jnp.asarray(arrs.maxs),
                   right=jnp.asarray(arrs.right),
                   prim_start=jnp.asarray(arrs.prim_start),
                   prim_count=jnp.asarray(arrs.prim_count),
                   miss=jnp.asarray(arrs.miss), axis=jnp.asarray(arrs.axis),
                   prim_lo=jnp.asarray(arrs.prim_lo),
                   prim_hi=jnp.asarray(arrs.prim_hi))
    return flat, tris


@pytest.mark.parametrize("builder", ["median", "sah", "lbvh"])
def test_traversal_matches_brute_force(builder):
    """The stackless skip-link walk finds the identical closest hit as the
    dense sweep (the reference kept hit_bruteForce as this cross-check,
    hitRay.wgsl:188-221)."""
    a, b, c = random_triangles(300, seed=7)
    mins, maxs = bvh_mod.triangle_aabbs(a, b, c)
    arrs = bvh_mod.BUILDERS[builder](mins, maxs)
    flat, tris = _to_device(arrs, a, b, c)

    r = np.random.default_rng(11)
    n_rays = 256
    o = jnp.asarray(r.uniform(-15, 15, (n_rays, 3)), jnp.float32)
    d = jnp.asarray(r.normal(size=(n_rays, 3)), jnp.float32)
    d = d / jnp.linalg.norm(d, axis=1, keepdims=True)

    t0 = jnp.full((n_rays,), 1e9, jnp.float32)
    tb, ib = traversal.brute_force_closest_hit(o, d, tris, 1e-6, t0)
    tv, iv = traversal.bvh_closest_hit(o, d, flat, tris, 1e-6, t0,
                                       int(arrs.prim_count.max()))
    hit_b = np.asarray(ib) >= 0
    hit_v = np.asarray(iv) >= 0
    np.testing.assert_array_equal(hit_b, hit_v)
    np.testing.assert_allclose(np.asarray(tv)[hit_b], np.asarray(tb)[hit_b],
                               rtol=1e-5)
    # Same triangle found (ties in t could differ; allow t-equal substitutes).
    same = np.asarray(iv) == np.asarray(ib)
    assert same[hit_b].mean() > 0.99
