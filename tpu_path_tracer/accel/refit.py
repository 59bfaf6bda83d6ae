"""On-device BVH refit: recompute node bounds for moved vertices.

The reference rebuilds its BVH from scratch whenever geometry changes (there
is no refit anywhere in ``lib/BVH/``); differentiable-geometry training moves
vertices every step, so a full host rebuild per step would dominate.  Because
our flatten gives every node a CONTIGUOUS triangle range ``[prim_lo,
prim_hi)`` over the reordered triangle array (``accel/bvh.py`` ``finish``),
refitting is a batch of range-min/max queries — no tree walk at all.

TPU-native formulation: build a sparse table (doubling prefix min/max) over
the per-triangle AABBs in ``O(T log T)`` fully vectorized work, then answer
all ``B`` node ranges with two gathers each.  No scatter, no sequential
bottom-up pass, jit/grad-safe (bounds are conservative data for the detached
hit search; the refit itself is wrapped in ``stop_gradient``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..core.types import FlatBVH, Triangles

_PAD = 5e-5  # AABB.pad epsilon — lib/BVH/AABB.js:35-51


def _range_minmax(vals_min, vals_max, lo, hi):
    """Min/max of vals over each [lo, hi) range via a doubling sparse table.

    vals_min/vals_max: [T, 3]; lo/hi: [B] i32 with hi > lo.
    Returns ([B, 3] mins, [B, 3] maxs).
    """
    t = vals_min.shape[0]
    levels_min = [vals_min]
    levels_max = [vals_max]
    k = 1
    while k < t:
        prev_min, prev_max = levels_min[-1], levels_max[-1]
        shifted_min = jnp.concatenate([prev_min[k:], prev_min[-k:]], axis=0)
        shifted_max = jnp.concatenate([prev_max[k:], prev_max[-k:]], axis=0)
        levels_min.append(jnp.minimum(prev_min, shifted_min))
        levels_max.append(jnp.maximum(prev_max, shifted_max))
        k *= 2
    n_levels = len(levels_min)
    st_min = jnp.stack(levels_min)  # [L, T, 3]
    st_max = jnp.stack(levels_max)

    span = jnp.maximum(hi - lo, 1)
    # Level of the largest power of two <= span.
    lvl = (31 - jnp.clip(jax.lax.clz(span), 0, 31)).astype(jnp.int32)
    lvl = jnp.clip(lvl, 0, n_levels - 1)
    width = jnp.left_shift(jnp.int32(1), lvl)
    a = jnp.clip(lo, 0, t - 1)
    b = jnp.clip(hi - width, 0, t - 1)
    mins = jnp.minimum(st_min[lvl, a], st_min[lvl, b])
    maxs = jnp.maximum(st_max[lvl, a], st_max[lvl, b])
    return mins, maxs


def refit_bvh(bvh: FlatBVH, tris: Triangles) -> FlatBVH:
    """Return ``bvh`` with node bounds recomputed from current vertices.

    Topology (miss links, prim ranges, axes) is preserved — valid as long as
    the triangle ORDER is unchanged, which vertex-position training satisfies.
    Tree quality degrades gracefully as geometry drifts (bounds stay correct,
    overlap grows); rebuild on host when the drift is large.
    """
    tris = jax.lax.stop_gradient(tris)
    tmin = jnp.minimum(jnp.minimum(tris.a, tris.b), tris.c)
    tmax = jnp.maximum(jnp.maximum(tris.a, tris.b), tris.c)
    thin = (tmax - tmin) < _PAD
    tmin = jnp.where(thin, tmin - _PAD / 2, tmin)
    tmax = jnp.where(thin, tmax + _PAD / 2, tmax)
    mins, maxs = _range_minmax(tmin, tmax, bvh.prim_lo, bvh.prim_hi)
    return bvh._replace(mins=mins, maxs=maxs)
