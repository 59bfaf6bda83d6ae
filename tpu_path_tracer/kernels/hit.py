"""Scene-level closest-hit: discrete find + differentiable re-shade.

The reference's ``hitScene`` (``shaders/hitRay.wgsl:1-113``) runs per thread:
a sphere loop routing solid vs. volumetric materials, a quad loop, then BVH
traversal, mutating a private ``hitRec``.  The TPU-native split is two
passes:

1. ``find_hit`` — NON-differentiable winner search.  Dense ``[N, P]``
   broadcasts per primitive family, min-reduced into a running
   ``(t_best, prim_type, prim_index)`` per lane, in the same precedence
   order as the reference's sequential loop (strict ``<`` keeps the earlier
   primitive on ties).  All scene inputs are ``stop_gradient``-ed: the
   discrete selection (and the ``lax.while_loop`` BVH walk inside) never
   enters the autodiff graph.

2. ``shade_hit`` — differentiable re-shading.  Gathers only the winning
   primitive per lane and recomputes ``t``, hit point, and shading normal
   from raw geometry in closed form, so reverse-mode gradients flow to
   vertex positions, sphere/quad parameters, and (through the medium
   density) material parameters — the standard "detach the discrete event,
   differentiate the continuous integrand" construction for path-space
   gradients.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..core import rng, vecmath as vm
from ..core.config import ISOTROPIC, RenderConfig
from ..core.gather import TableGather
from ..core.types import HitRecord, Ray, SceneData, SceneMeta
from . import intersect, traversal

# Winner primitive-type codes (per-lane).
MISS, SPHERE, QUAD, TRIANGLE, VOLUME = -1, 0, 1, 2, 3


def find_hit(rand_state, ray: Ray, scene: SceneData, meta: SceneMeta,
             cfg: RenderConfig, alive=None):
    """Find the closest primitive per ray lane (non-differentiable).

    Returns ``(rand_state, prim_type [N] i32, prim_index [N] i32,
    vol_u [N] f32)`` where ``vol_u`` is the uniform variate that produced a
    volumetric scattering event (replayed by ``shade_hit``).

    ``alive`` (optional ``[N]`` bool) marks lanes whose result is consumed;
    dead lanes seed ``t_best = -INF`` (a negative sentinel — see the inline
    comment below for why ``t_min`` would be wrong) so every ``t < t_best``
    update fails and — critically — the BVH traversal's per-ray chunk cull
    (``kernels/pallas/traversal.py``) empties their candidate lists, so
    retired lanes cost no sweep work.  The reference has no analogue (its
    threads simply ``break``, ``traceRay.wgsl:14``); on TPU the lane keeps
    executing, so the prune must ride the closest-hit bound instead.
    """
    ray = jax.lax.stop_gradient(ray)
    scene = jax.lax.stop_gradient(scene)
    o, d = ray.origin, ray.dir
    n_rays = o.shape[0]
    t_min = cfg.t_min

    t_best = jnp.full((n_rays,), cfg.t_max, jnp.float32)
    if alive is not None:
        # Negative sentinel, not t_min: a dead lane's stale origin can sit
        # ON the mesh, where a t_min cap still keeps the containing chunks
        # (slab entry 0 <= t_min).  No real chunk entry is < 0, so the
        # negative bound empties the candidate list outright.
        t_best = jnp.where(jax.lax.stop_gradient(alive), t_best,
                           -intersect.INF)
    ptype = jnp.full((n_rays,), MISS, jnp.int32)
    pidx = jnp.zeros((n_rays,), jnp.int32)

    sph = scene.spheres
    if sph.count:
        # Solid spheres — the medium-type routing of hitRay.wgsl:8-24.
        is_vol = scene.materials.mtype[sph.material_id] == ISOTROPIC
        ts = intersect.sphere_t(o[:, None], d[:, None], sph.center[None],
                                sph.radius[None], t_min, cfg.t_max)
        ts = jnp.where(is_vol[None, :], intersect.INF, ts)
        t_s = jnp.min(ts, axis=1)
        i_s = jnp.argmin(ts, axis=1).astype(jnp.int32)
        upd = t_s < t_best
        t_best = jnp.where(upd, t_s, t_best)
        ptype = jnp.where(upd, SPHERE, ptype)
        pidx = jnp.where(upd, i_s, pidx)

    qd = scene.quads
    if qd.count:
        ts = intersect.quad_t(o[:, None], d[:, None], qd.q[None], qd.u[None],
                              qd.v[None], qd.normal[None], qd.d[None],
                              qd.w[None], t_min, cfg.t_max)
        t_q = jnp.min(ts, axis=1)
        i_q = jnp.argmin(ts, axis=1).astype(jnp.int32)
        upd = t_q < t_best
        t_best = jnp.where(upd, t_q, t_best)
        ptype = jnp.where(upd, QUAD, ptype)
        pidx = jnp.where(upd, i_q, pidx)

    tris = scene.triangles
    if tris.count and meta.traversal != "none":
        if meta.traversal == "bvh" and scene.bvh is not None:
            if cfg.use_pallas and jax.default_backend() == "tpu":
                # Two-level cull (XLA) + Pallas sweep: per-lane gathers
                # are ~1 row/cycle on TPU, putting the jnp skip-link walk
                # 3-4 orders of magnitude off speed-of-light; this path
                # prunes with dense slab math and intersects with MXU
                # matmuls (kernels/pallas/traversal.py) — ray-major pair
                # binning for VMEM-resident meshes, tile-major gather
                # sweep beyond.  Packing is a reshape of the triangle
                # table — trivial next to one traversal.
                from .pallas.traversal import closest_hit, pack_tris
                t_t, i_t = closest_hit(
                    o, d, scene.bvh, pack_tris(tris), t_best,
                    t_min=t_min, n_tris=int(tris.count))
            else:
                t_t, i_t = traversal.bvh_closest_hit(
                    o, d, scene.bvh, tris, t_min, t_best, meta.max_leaf)
        else:
            t_t, i_t = traversal.brute_force_closest_hit(o, d, tris, t_min,
                                                         t_best)
        upd = (i_t >= 0) & (t_t < t_best)
        t_best = jnp.where(upd, t_t, t_best)
        ptype = jnp.where(upd, TRIANGLE, ptype)
        pidx = jnp.where(upd, i_t, pidx)

    vol_u = jnp.zeros((n_rays,), jnp.float32)
    if sph.count and meta.has_volumes:
        # Volumetric pass, clipped by the closest solid hit.  The reference
        # interleaves volumes into the sphere loop with a running
        # closest_so_far (hitRay.wgsl:17-24); by the memorylessness of the
        # free-flight exponential, clipping by the FINAL solid distance and
        # min-reducing independent per-volume samples is the same
        # distribution — and is order-independent, which the lanes need.
        us = []
        for _ in range(sph.count):
            rand_state, u = rng.uniform(rand_state)
            us.append(u)
        us = jnp.stack(us, axis=1)  # [N, S]
        neg_inv_density = scene.materials.roughness[sph.material_id]
        is_vol = scene.materials.mtype[sph.material_id] == ISOTROPIC
        tv = intersect.volume_t(o[:, None], d[:, None], sph.center[None],
                                sph.radius[None], neg_inv_density[None], us,
                                t_min, t_best[:, None])
        tv = jnp.where(is_vol[None, :], tv, intersect.INF)
        t_v = jnp.min(tv, axis=1)
        i_v = jnp.argmin(tv, axis=1).astype(jnp.int32)
        upd = t_v < t_best
        t_best = jnp.where(upd, t_v, t_best)
        ptype = jnp.where(upd, VOLUME, ptype)
        pidx = jnp.where(upd, i_v, pidx)
        vol_u = jnp.where(upd, jnp.take_along_axis(
            us, i_v[:, None], axis=1)[:, 0], vol_u)

    return rand_state, ptype, pidx, jax.lax.stop_gradient(vol_u)


def shade_hit(ray: Ray, ptype, pidx, vol_u, scene: SceneData,
              cfg: RenderConfig) -> HitRecord:
    """Differentiably recompute the hit record for each lane's winner.

    Produces the WGSL ``hitRec`` fields (``header.wgsl:119-125``): t, p,
    front-face-flipped shading normal, and material id.  Each primitive
    family's math is evaluated on gathered winner data and selected by
    ``prim_type`` — four scalar-per-lane closed forms instead of the
    reference's branch ladder.
    """
    o, d = ray.origin, ray.dir
    n_rays = o.shape[0]
    t_min = cfg.t_min

    t = jnp.full((n_rays,), cfg.t_max, jnp.float32)
    normal = jnp.zeros((n_rays, 3), jnp.float32) + np.asarray(
        [0.0, 0.0, 1.0], np.float32)
    material_id = jnp.zeros((n_rays,), jnp.int32)

    sph = scene.spheres
    if sph.count:
        si = jnp.clip(pidx, 0, sph.count - 1)
        # One-hot gathers: tiny tables x huge index vectors are pathological
        # for XLA's gather lowering on TPU (see core.gather).  Also
        # differentiable via a matmul transpose instead of scatter-add.
        gs = TableGather(si, sph.count)
        ctr = gs(sph.center)
        rad = gs(sph.radius)
        sel_s = ptype == SPHERE
        t_s = intersect.sphere_t(o, d, ctr, rad, t_min, cfg.t_max)
        # Mask unselected lanes to a finite dummy BEFORE deriving positions:
        # a missing lane's t is INF, and the inf/NaN it breeds in p_s/n_s
        # poisons *geometry gradients* through the select (0 * inf = NaN in
        # reverse mode) even though the forward value is discarded.
        t_s = jnp.where(sel_s, t_s, 1.0)
        p_s = o + t_s[:, None] * d
        n_s = vm.normalize((p_s - ctr) / rad[:, None])  # common.wgsl:60
        t = jnp.where(sel_s, t_s, t)
        normal = jnp.where(sel_s[:, None], n_s, normal)
        sph_mid = gs(sph.material_id)
        material_id = jnp.where(sel_s, sph_mid, material_id)

        # Volumetric event on the same sphere table (common.wgsl:130-143):
        # t = rec1 + (-1/density) * log(u) / |d|, normal radial, front_face
        # forced true.  neg_inv_density rides the material roughness channel.
        sel_v = ptype == VOLUME
        r0, _, _ = intersect.sphere_roots(o, d, ctr, rad)
        rec1 = jnp.maximum(jnp.maximum(r0, t_min), 0.0)
        # Per-sphere material roughness resolved table-side (an [S]-sized
        # gather) so the per-lane lookup shares the sphere one-hot.
        nid = gs(scene.materials.roughness[sph.material_id])
        hit_dist = nid * jnp.log(jnp.maximum(vol_u, 1e-12))
        t_v = rec1 + hit_dist / vm.length(d)
        p_v = o + t_v[:, None] * d
        n_v = vm.normalize(p_v - ctr)
        t = jnp.where(sel_v, t_v, t)
        normal = jnp.where(sel_v[:, None], n_v, normal)
        material_id = jnp.where(sel_v, sph_mid, material_id)

    qd = scene.quads
    if qd.count:
        qi = jnp.clip(pidx, 0, qd.count - 1)
        sel = ptype == QUAD
        gq = TableGather(qi, qd.count)
        # Recompute plane data from raw (q, u, v) so gradients reach the quad
        # geometry (the stored derived fields are a non-diff fast path).
        nq, dq, _ = intersect.quad_derived(gq(qd.q), gq(qd.u), gq(qd.v))
        # Unselected lanes can have n.d == 0 (parallel rays) — keep the
        # division NaN-free so quad-geometry gradients stay finite.
        den = vm.dot(nq, d)
        t_q = (dq - vm.dot(nq, o)) / jnp.where(sel, den, 1.0)
        t = jnp.where(sel, t_q, t)
        normal = jnp.where(sel[:, None], nq, normal)
        material_id = jnp.where(sel, gq(qd.material_id), material_id)

    tris = scene.triangles
    if tris.count:
        ti = jnp.clip(pidx, 0, tris.count - 1)
        sel = ptype == TRIANGLE
        t_t, bu, bv, bw = intersect.triangle_t(
            o, d, tris.a[ti], tris.b[ti], tris.c[ti], t_min, cfg.t_max)
        t_t = jnp.where(sel, t_t, 1.0)  # see sphere-path masking note
        # Degenerate unselected lanes (clipped index 0, det ~ 0) give inf
        # barycentrics — mask before they feed the shading normal.
        bu = jnp.where(sel, bu, 1.0 / 3.0)
        bv = jnp.where(sel, bv, 1.0 / 3.0)
        bw = jnp.where(sel, bw, 1.0 / 3.0)
        # Smooth barycentric normal — common.wgsl:230 (already world-space).
        n_t = vm.normalize(tris.na[ti] * bw[:, None]
                           + tris.nb[ti] * bu[:, None]
                           + tris.nc[ti] * bv[:, None])
        t = jnp.where(sel, t_t, t)
        normal = jnp.where(sel[:, None], n_t, normal)
        material_id = jnp.where(sel, tris.material_id[ti], material_id)

    hit = ptype != MISS
    p = o + t[:, None] * d
    # Front-face determination + normal flip (common.wgsl:64-68,179-183,
    # 233-237); volumetric hits force front_face (common.wgsl:143).
    is_vol_lane = ptype == VOLUME
    front = vm.dot(d, normal) < 0.0
    normal = jnp.where((front | is_vol_lane)[:, None], normal, -normal)
    front = front | is_vol_lane
    return HitRecord(hit=hit, t=t, p=p, normal=normal, front_face=front,
                     material_id=material_id)
