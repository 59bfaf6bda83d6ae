"""Wavefront stackless BVH traversal (pure jnp, gather-based).

The reference walks its BVH with a per-thread stack and front-to-back child
ordering (``shaders/hitRay.wgsl:42-110``, ``STACK_SIZE=20``).  Per-lane stacks
are the wrong shape for a TPU's wide SIMD lanes, so this is the *skip-pointer*
(threaded) walk the reference also ships but keeps disabled
(``hitRay.wgsl:128-184``; links built by ``lib/BVH/bvhNode.js:76-93``):

    next = node + 1      if the ray hits the node's AABB   (descend / leaf-adv)
    next = miss[node]    otherwise                          (skip the subtree)

In DFS preorder, ``node + 1`` is both "left child" for interior nodes and
"DFS successor == miss link" for leaves, so a single per-lane ``int32`` node
pointer suffices; every lane advances each iteration of one
``lax.while_loop`` and dead lanes idle at the ``num_nodes`` sentinel.  All
memory traffic is XLA gathers over the node/triangle SoA — the idiomatic TPU
substitute for divergent pointer chasing.

This function is used only inside the non-differentiable hit-finding pass
(``kernels.hit.find_hit``); gradients re-enter through differentiable
re-shading keyed on the returned triangle index.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..core.types import FlatBVH, Triangles
from . import intersect


def bvh_closest_hit(origin, direction, bvh: FlatBVH, tris: Triangles,
                    t_min: float, t_best0, max_leaf: int):
    """Closest triangle along each ray via stackless skip-link traversal.

    Args:
      origin, direction: ``[N, 3]`` ray batch.
      bvh: flattened DFS-preorder BVH (see ``accel.bvh``).
      tris: triangle SoA, ordered to match ``bvh.prim_start`` ranges.
      t_min: scalar epsilon.
      t_best0: ``[N]`` initial closest-hit bound (prunes against hits already
        found on spheres/quads — the reference gets the same pruning from its
        running ``closest_so_far``, ``hitRay.wgsl:54``).
      max_leaf: static upper bound on leaf primitive count (from the builder).

    Returns:
      (t [N], tri_index [N] int32, -1 for miss)
    """
    n_nodes = bvh.count
    num_rays = origin.shape[0]
    sentinel = np.int32(n_nodes)
    inv_dir = jnp.reciprocal(direction)

    def cond(state):
        node, _, _ = state
        return jnp.any(node < sentinel)

    def body(state):
        node, t_best, idx_best = state
        active = node < sentinel
        ni = jnp.minimum(node, sentinel - 1)  # clamp for safe gathers
        bmin = bvh.mins[ni]
        bmax = bvh.maxs[ni]
        a_hit = intersect.aabb_hit(origin, inv_dir, bmin, bmax,
                                   t_min, t_best) & active
        is_leaf = bvh.right[ni] < 0
        leaf_hit = a_hit & is_leaf
        start = bvh.prim_start[ni]
        count = bvh.prim_count[ni]
        # Leaf primitive loop — static unroll to the builder's leaf bound
        # (the reference loops prim_count at hitRay.wgsl:61-68).
        for j in range(max_leaf):
            tid = jnp.clip(start + j, 0, tris.count - 1)
            valid = leaf_hit & (j < count)
            t, _, _, _ = intersect.triangle_t(
                origin, direction, tris.a[tid], tris.b[tid], tris.c[tid],
                t_min, t_best)
            better = valid & (t < t_best)
            t_best = jnp.where(better, t, t_best)
            idx_best = jnp.where(better, tid, idx_best)
        node = jnp.where(active,
                         jnp.where(a_hit, node + 1, bvh.miss[ni]),
                         node)
        return node, t_best, idx_best

    # Derive carry inits from a per-ray input so their varying-manual-axes
    # type matches the loop outputs under shard_map (literal zeros are
    # 'replicated' while the walked state is 'varying' — same construction
    # as integrator.path_tracer.trace's varying zero).
    vzero = (t_best0 * 0.0).astype(jnp.int32)
    node0 = vzero
    idx0 = vzero - 1
    _, t, idx = jax.lax.while_loop(cond, body, (node0, t_best0, idx0))
    return jnp.where(idx >= 0, t, intersect.INF), idx


def brute_force_closest_hit(origin, direction, tris: Triangles,
                            t_min: float, t_best0):
    """Dense ``[N, T]`` triangle sweep — the reference's commented-out
    cross-check (``hitRay.wgsl:188-221``).  No gathers at all: for small
    meshes this outruns traversal on TPU and is the fallback when no BVH was
    built.  Returns (t [N], tri_index [N], -1 for miss)."""
    o = origin[:, None, :]
    d = direction[:, None, :]
    t, _, _, _ = intersect.triangle_t(
        o, d, tris.a[None], tris.b[None], tris.c[None], t_min,
        t_best0[:, None])
    idx = jnp.argmin(t, axis=1).astype(jnp.int32)
    t_min_v = jnp.min(t, axis=1)
    hit = t_min_v < t_best0
    return (jnp.where(hit, t_min_v, intersect.INF),
            jnp.where(hit, idx, -1))
