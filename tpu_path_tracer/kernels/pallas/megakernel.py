"""Fused path-tracing megakernel (Pallas/TPU) for analytic scenes.

The reference renders with ONE GPU megakernel: camera-ray gen, the bounce
loop, intersection, and shading all live in a single WGSL dispatch
(``shaders/main.wgsl:1-27`` -> ``shootRay/traceRay/hitRay/scatterRay``), so
per-ray state never leaves registers.  Our default TPU design is the opposite
— a wavefront ``lax.scan`` (``integrator.path_tracer``) whose carry
materializes to HBM at every bounce boundary.  This kernel brings the
megakernel shape back: the full sample
and bounce loops run inside one ``pallas_call``, all ray state (PCG state,
ray, radiance, throughput, liveness) stays in VMEM planes for the whole
path, and the only HBM traffic is one read of (rand_state, px, py) and one
write of the radiance image.

Scope: sphere + quad scenes (the reference's default scene family,
``lib/scene.js:36-162``) with all four BSDFs and NEE/MIS, plus SMALL
triangle meshes (<= MAX_MEGAKERNEL_TRIS, statically unrolled — covers the
default scene's 12-triangle glass cube, so the flagship scene runs the
single-dispatch fast path like the reference's one megakernel,
``shaders/main.wgsl:1-27``).  Large meshes keep the wavefront + chunk-sweep
traversal (``kernels/pallas/traversal.py``).

Semantics contract: this kernel replays the wavefront integrator draw-for-
draw — the same per-lane PCG32 (``core.rng``, bit-exact integer math), the
same draw order (8 uniforms per bounce in ``material_scatter`` + 2 for the
camera + 3 for NEE + 1 for RR, + one per sphere for volumes when present),
and the same bounce algebra (``integrator.path_tracer.trace``).  Tests
assert the two paths agree pixel-for-pixel up to float reassociation.

Differentiability: :func:`path_trace_pixels_pallas` carries a
``jax.custom_vjp``.  The backward pass is a SECOND Pallas kernel
(:func:`_bwd_call`) that replays the identical PCG stream and bounce chain
— the shared tracer body is built once by :func:`_make_tracer` and used by
both kernels — with the scene tables resident in VMEM as *values*, and
applies in-kernel reverse-mode AD (``jax.grad`` inside the kernel body; the
bounce/sample loops are statically unrolled so every residual stays in
VMEM).  Per-tile cotangents reduce to per-table-row gradients accumulated
across the sequential grid into revisited output blocks.  Gradient
semantics therefore match the wavefront integrator's autodiff exactly
(detached RNG draws, attached Russian-roulette compensation, NEE pdf
chain), and the cotangents flow back through :func:`pack_tables`'s XLA
gathers to the material/geometry pytree leaves.

Data layout: rays are tiled as ``(TILE_ROWS, 128)`` f32 *planes* (one plane
per vector component — SoA all the way down), the VPU-native shape.  Scene
tables ride in SMEM (forward) / VMEM (backward) and are walked with a
statically unrolled primitive loop — each sphere/quad is a handful of
scalar broadcasts against the tile, and the winning primitive's material is
select-merged into per-lane planes, so there are NO gathers anywhere in the
kernel.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...core.config import (GLASS, ISOTROPIC, LAMBERTIAN, MIRROR, PI,
                            RenderConfig)
from ...core.types import SceneData, SceneMeta
from ..intersect import DET_EPS

# Rays per program instance = TILE_ROWS * 128.
TILE_ROWS = 32
LANES = 128
# The backward kernel holds every unrolled-bounce residual in VMEM at the
# forward/backward boundary; the tile must keep that live set under the
# ~16 MB VMEM budget at deep bounce counts.  32 rows matches the forward
# tile and measured 106 -> 202 Mray/s on the 4-bounce fwd+bwd headline
# vs round-3's 16 rows; 64 rows fails to compile (VMEM overflow in the
# unrolled reverse sweep).
BWD_TILE_ROWS = 32
# Bounce x sample unroll budget for the differentiable path: the backward
# kernel unrolls ``max_bounces * spp`` copies of the bounce body (so AD
# residuals stay in VMEM).  Past this, fall back to the wavefront.
MAX_UNROLL_BOUNCES = 64

# PCG32 constants — bit-exact with core.rng (shaders/common.wgsl:7-12).
_MULT = np.uint32(747796405)
_INC = np.uint32(2891336453)
_XSH = np.uint32(277803737)
_INV_U32 = np.float32(1.0 / 4294967295.0)

_F32 = jnp.float32


# ---------------------------------------------------------------- plane math
# Component-plane vector helpers: a "vec3" is a triple of [R, 128] planes.

def _dot3(ax, ay, az, bx, by, bz):
    return ax * bx + ay * by + az * bz


def _norm3(x, y, z, eps=1e-20):
    # reciprocal(sqrt(.)) not rsqrt: bit-parity with core.vecmath.normalize
    # keeps branch decisions aligned between this kernel and the wavefront.
    inv = jnp.reciprocal(jnp.sqrt(jnp.maximum(_dot3(x, y, z, x, y, z), eps)))
    return x * inv, y * inv, z * inv


def _cross3(ax, ay, az, bx, by, bz):
    return (ay * bz - az * by, az * bx - ax * bz, ax * by - ay * bx)


def _reflect3(dx, dy, dz, nx, ny, nz):
    k = 2.0 * _dot3(dx, dy, dz, nx, ny, nz)
    return dx - k * nx, dy - k * ny, dz - k * nz


def _mix(a, b, t):
    return a + (b - a) * t


def _safe_sqrt(x):
    """``sqrt(max(x, 0))`` with a NaN-free gradient (core.vecmath.safe_sqrt):
    the backward kernel differentiates this body in-kernel, so the same
    double-``where`` guard applies here."""
    pos = x > 0.0
    return jnp.where(pos, jnp.sqrt(jnp.where(pos, x, 1.0)), 0.0)


def _u32_to_f32(word):
    """Bit-exact uint32 -> float32 value cast (Mosaic has no direct lowering).

    ``hi * 2^16`` is exact in f32 and the single rounding in the add matches
    the round-to-nearest-even of a native cast, so this reproduces
    ``word.astype(float32)`` bit-for-bit — keeping the kernel's PCG stream
    identical to ``core.rng.uniform``."""
    hi = (word >> np.uint32(16)).astype(jnp.int32).astype(_F32)
    lo = (word & np.uint32(0xFFFF)).astype(jnp.int32).astype(_F32)
    return hi * np.float32(65536.0) + lo


def _pcg(state):
    """One PCG step per lane (vectorized ``core.rng.uniform``)."""
    state = state * _MULT + _INC
    shift = (state >> np.uint32(28)) + np.uint32(4)
    word = ((state >> shift) ^ state) * _XSH
    return state, _u32_to_f32((word >> np.uint32(22)) ^ word) * _INV_U32


# Scene-table field layouts (columns of the packed tables).
# Sphere row: cx cy cz r | col3 spec3 emi3 sstr rough eta mtype  (17)
SPH_COLS = 17
# Quad row: q3 u3 v3 n3 d w3 | col3 spec3 emi3 sstr rough eta mtype (29)
QUAD_COLS = 29
# Triangle row: a3 b3 c3 na3 nb3 nc3 | mat13 (31)
TRI_COLS = 31
# Small-mesh budget for the unrolled triangle loop: the reference's ONE
# megakernel dispatch covers its mesh too (shaders/main.wgsl:1-27 ->
# hitRay.wgsl:42-110); here each triangle is ~45 statically unrolled VPU
# ops per bounce, so tiny meshes (the default scene's 12-tri glass cube,
# lib/scene.js:164-251) ride the fast path while big meshes keep the
# wavefront + chunk-sweep traversal.
MAX_MEGAKERNEL_TRIS = 64


def _mat_cols(materials, mid):
    """Gather one material row (13 cols) at XLA level for table packing."""
    return [
        materials.color[mid, 0], materials.color[mid, 1],
        materials.color[mid, 2],
        materials.specular_color[mid, 0], materials.specular_color[mid, 1],
        materials.specular_color[mid, 2],
        materials.emission[mid, 0], materials.emission[mid, 1],
        materials.emission[mid, 2],
        materials.specular_strength[mid], materials.roughness[mid],
        materials.eta[mid], materials.mtype[mid].astype(_F32),
    ]


def pack_tables(scene: SceneData):
    """Flatten the scene into the kernel's packed tables (traced XLA ops).

    Differentiable: the gathers here transpose to scatter-adds, so table
    cotangents from the backward kernel flow to the material/geometry
    pytree leaves."""
    sph = scene.spheres
    if sph.count:
        sph_tab = jnp.stack(
            [sph.center[:, 0], sph.center[:, 1], sph.center[:, 2],
             sph.radius] + _mat_cols(scene.materials, sph.material_id),
            axis=1)
    else:
        sph_tab = jnp.zeros((1, SPH_COLS), _F32)
    qd = scene.quads
    if qd.count:
        quad_tab = jnp.stack(
            [qd.q[:, 0], qd.q[:, 1], qd.q[:, 2],
             qd.u[:, 0], qd.u[:, 1], qd.u[:, 2],
             qd.v[:, 0], qd.v[:, 1], qd.v[:, 2],
             qd.normal[:, 0], qd.normal[:, 1], qd.normal[:, 2],
             qd.d, qd.w[:, 0], qd.w[:, 1], qd.w[:, 2]]
            + _mat_cols(scene.materials, qd.material_id), axis=1)
    else:
        quad_tab = jnp.zeros((1, QUAD_COLS), _F32)
    tr = scene.triangles
    if tr.count:
        tri_tab = jnp.stack(
            [tr.a[:, 0], tr.a[:, 1], tr.a[:, 2],
             tr.b[:, 0], tr.b[:, 1], tr.b[:, 2],
             tr.c[:, 0], tr.c[:, 1], tr.c[:, 2],
             tr.na[:, 0], tr.na[:, 1], tr.na[:, 2],
             tr.nb[:, 0], tr.nb[:, 1], tr.nb[:, 2],
             tr.nc[:, 0], tr.nc[:, 1], tr.nc[:, 2]]
            + _mat_cols(scene.materials, tr.material_id), axis=1)
    else:
        tri_tab = jnp.zeros((1, TRI_COLS), _F32)
    li = jnp.clip(scene.light_index, 0, max(qd.count - 1, 0))
    light_tab = (jnp.concatenate([qd.q[li], qd.u[li], qd.v[li]])[None]
                 if qd.count else jnp.zeros((1, 9), _F32))
    return sph_tab, quad_tab, tri_tab, light_tab


def _make_tracer(n_spheres: int, n_quads: int, n_tris: int,
                 cfg: RenderConfig, meta: SceneMeta, spp: int,
                 unroll: bool):
    """Build the shared tile tracer with all static facts baked in.

    Returns ``trace_tile(sph_at, quad_at, tri_at, light_at, cam_at,
    state0, pxf, pyf) -> (r, g, b)`` where the ``*_at(i, k)`` accessors
    read one scene scalar — SMEM ref reads in the forward kernel, value
    indexing in the differentiable backward kernel.  ``unroll=True``
    replaces the sample/bounce ``fori_loop``s with static Python unrolls
    so in-kernel reverse-mode AD keeps its residuals as VMEM SSA values.
    """
    w = np.float32(cfg.width)
    h = np.float32(cfg.height)
    aspect = np.float32(w / h)
    fov_factor = np.float32(
        1.0 / math.tan(cfg.fov_degrees * (PI / 180.0) / 2.0))
    t_min = np.float32(cfg.t_min)
    t_max = np.float32(cfg.t_max)
    inf = np.float32(cfg.t_max * 1.01)
    bg = np.asarray(cfg.background, np.float32)
    p_light = np.float32(cfg.light_sample_prob)
    inv_pi = np.float32(1.0 / PI)
    two_pi = np.float32(2.0 * PI)
    use_nee = cfg.importance_sampling and meta.has_light
    has_volumes = meta.has_volumes
    grid_n = max(int(cfg.samples_per_pixel ** 0.5), 1) if cfg.stratify else 1
    sub_scale = np.float32(1.0 / grid_n)

    def trace_tile(sph_at, quad_at, tri_at, light_at, cam_at, state0,
                   pxf, pyf):
        # Camera basis columns + origin (shaders/main.wgsl:8,
        # shootRay.wgsl:54-60) — scene scalars broadcast per use.
        b0x, b0y, b0z = cam_at(0, 0), cam_at(1, 0), cam_at(2, 0)
        b1x, b1y, b1z = cam_at(0, 1), cam_at(1, 1), cam_at(2, 1)
        b2x, b2y, b2z = cam_at(0, 2), cam_at(1, 2), cam_at(2, 2)
        eyex, eyey, eyez = cam_at(0, 3), cam_at(1, 3), cam_at(2, 3)

        def sphere_hit_t(ox, oy, oz, dx, dy, dz, cx, cy, cz, r):
            """Closest valid sphere root per lane (common.wgsl:29-52)."""
            ocx, ocy, ocz = ox - cx, oy - cy, oz - cz
            a = _dot3(dx, dy, dz, dx, dy, dz)
            half_b = _dot3(dx, dy, dz, ocx, ocy, ocz)
            c = _dot3(ocx, ocy, ocz, ocx, ocy, ocz) - r * r
            disc = half_b * half_b - a * c
            sq = _safe_sqrt(disc)
            inv_a = jnp.reciprocal(a)
            r0 = (-half_b - sq) * inv_a
            r1 = (-half_b + sq) * inv_a
            near_ok = (r0 > t_min) & (r0 < t_max)
            root = jnp.where(near_ok, r0, r1)
            ok = (disc >= 0.0) & (root > t_min) & (root < t_max)
            return jnp.where(ok, root, inf)

        def quad_fields(i):
            return ((quad_at(i, 0), quad_at(i, 1), quad_at(i, 2)),
                    (quad_at(i, 3), quad_at(i, 4), quad_at(i, 5)),
                    (quad_at(i, 6), quad_at(i, 7), quad_at(i, 8)),
                    (quad_at(i, 9), quad_at(i, 10), quad_at(i, 11)),
                    quad_at(i, 12),
                    (quad_at(i, 13), quad_at(i, 14), quad_at(i, 15)))

        def quad_hit_t(ox, oy, oz, dx, dy, dz, q, u, v, n, d, wv):
            """One-sided quad test (common.wgsl:148-187)."""
            denom = n[0] * dx + n[1] * dy + n[2] * dz
            t = (d - (n[0] * ox + n[1] * oy + n[2] * oz)) / denom
            rx = ox + t * dx - q[0]
            ry = oy + t * dy - q[1]
            rz = oz + t * dz - q[2]
            # alpha = w . (rel x v); beta = w . (u x rel)
            cx, cy, cz = _cross3(rx, ry, rz, v[0], v[1], v[2])
            alpha = wv[0] * cx + wv[1] * cy + wv[2] * cz
            cx, cy, cz = _cross3(u[0], u[1], u[2], rx, ry, rz)
            beta = wv[0] * cx + wv[1] * cy + wv[2] * cz
            ok = ((denom <= 0.0) & (jnp.abs(denom) >= 1e-8)
                  & (t > t_min) & (t < t_max)
                  & (alpha >= 0.0) & (alpha <= 1.0)
                  & (beta >= 0.0) & (beta <= 1.0))
            return jnp.where(ok, t, inf)

        def bounce_step(state, ox, oy, oz, dx, dy, dz,
                        rad, thr, alive, bounce_idx):
            """One bounce — plane-form of integrator.path_tracer.trace."""
            zero = jnp.zeros_like(ox)

            # ---- hit pass: unrolled primitive loop, select-merged winner.
            t_best = jnp.full_like(ox, inf)
            # Selected per-lane planes (kind: 0 miss, 1 sphere, 2 quad,
            # 3 volume, 4 triangle).
            kind = zero
            scx, scy, scz, sr = zero, zero, zero, zero + 1.0
            qnx, qny, qnz = zero, zero, zero
            tnx, tny, tnz = zero, zero, zero + 1.0
            mat = [zero] * 13  # col3 spec3 emi3 sstr rough eta mtype

            for i in range(n_spheres):
                cx, cy, cz = sph_at(i, 0), sph_at(i, 1), sph_at(i, 2)
                r = sph_at(i, 3)
                mrow = [sph_at(i, 4 + k) for k in range(13)]
                t = sphere_hit_t(ox, oy, oz, dx, dy, dz, cx, cy, cz, r)
                if has_volumes:
                    # Solid pass skips ISOTROPIC spheres (hitRay.wgsl:8-24);
                    # mtype is a table scalar so this is a scalar select.
                    t = jnp.where(mrow[12] == float(ISOTROPIC), inf, t)
                win = t < t_best
                t_best = jnp.where(win, t, t_best)
                kind = jnp.where(win, 1.0, kind)
                scx = jnp.where(win, cx, scx)
                scy = jnp.where(win, cy, scy)
                scz = jnp.where(win, cz, scz)
                sr = jnp.where(win, r, sr)
                mat = [jnp.where(win, mrow[k], mat[k]) for k in range(13)]

            for i in range(n_quads):
                q, u, v, n, d, wv = quad_fields(i)
                mrow = [quad_at(i, 16 + k) for k in range(13)]
                t = quad_hit_t(ox, oy, oz, dx, dy, dz, q, u, v, n, d, wv)
                win = t < t_best
                t_best = jnp.where(win, t, t_best)
                kind = jnp.where(win, 2.0, kind)
                qnx = jnp.where(win, n[0], qnx)
                qny = jnp.where(win, n[1], qny)
                qnz = jnp.where(win, n[2], qnz)
                mat = [jnp.where(win, mrow[k], mat[k]) for k in range(13)]

            for i in range(n_tris):
                # Möller-Trumbore in world space, scalar triangle data vs
                # per-lane ray planes (semantics of kernels.intersect
                # .triangle_t incl. the reference's odd t_min barycentric
                # guards, common.wgsl:191-242).
                ax_, ay_, az_ = tri_at(i, 0), tri_at(i, 1), tri_at(i, 2)
                bx_, by_, bz_ = tri_at(i, 3), tri_at(i, 4), tri_at(i, 5)
                cx_, cy_, cz_ = tri_at(i, 6), tri_at(i, 7), tri_at(i, 8)
                mrow = [tri_at(i, 18 + k) for k in range(13)]
                abx, aby, abz = bx_ - ax_, by_ - ay_, bz_ - az_
                acx, acy, acz = cx_ - ax_, cy_ - ay_, cz_ - az_
                nx_ = aby * acz - abz * acy
                ny_ = abz * acx - abx * acz
                nz_ = abx * acy - aby * acx
                det = -(dx * nx_ + dy * ny_ + dz * nz_)
                aox, aoy, aoz = ox - ax_, oy - ay_, oz - az_
                daox, daoy, daoz = _cross3(aox, aoy, aoz, dx, dy, dz)
                # Parallel-ray cull at a tiny ABSOLUTE epsilon, not t_min: det
                # scales with the unnormalized normal (~edge^2), and a
                # t_min-scale guard rejects every triangle of a finely
                # tessellated mesh (kernels.intersect.DET_EPS).
                det_ok = jnp.abs(det) >= DET_EPS
                # Guarded reciprocal: an unguarded 1/0 breeds inf that
                # NaNs vertex gradients through the select (0 * inf in
                # reverse mode — same hazard class as kernels/hit.py).
                invd = jnp.reciprocal(jnp.where(det_ok, det, 1.0))
                tt = (aox * nx_ + aoy * ny_ + aoz * nz_) * invd
                uu_ = (acx * daox + acy * daoy + acz * daoz) * invd
                vv_ = -(abx * daox + aby * daoy + abz * daoz) * invd
                ww_ = 1.0 - uu_ - vv_
                okt = (det_ok & (tt >= t_min) & (tt <= t_max)
                       & (uu_ >= t_min) & (vv_ >= t_min) & (ww_ >= t_min))
                tt = jnp.where(okt, tt, inf)
                win = tt < t_best
                # Smooth barycentric shading normal (common.wgsl:230),
                # blended per candidate so only 3 planes select-merge.
                bu = jnp.where(okt, uu_, 1.0 / 3.0)
                bv = jnp.where(okt, vv_, 1.0 / 3.0)
                bw = jnp.where(okt, ww_, 1.0 / 3.0)
                bnx = (tri_at(i, 9) * bw + tri_at(i, 12) * bu
                       + tri_at(i, 15) * bv)
                bny = (tri_at(i, 10) * bw + tri_at(i, 13) * bu
                       + tri_at(i, 16) * bv)
                bnz = (tri_at(i, 11) * bw + tri_at(i, 14) * bu
                       + tri_at(i, 17) * bv)
                t_best = jnp.where(win, tt, t_best)
                kind = jnp.where(win, 4.0, kind)
                tnx = jnp.where(win, bnx, tnx)
                tny = jnp.where(win, bny, tny)
                tnz = jnp.where(win, bnz, tnz)
                mat = [jnp.where(win, mrow[k], mat[k]) for k in range(13)]

            if has_volumes:
                # Volumetric pass clipped by the final solid distance —
                # same construction as kernels.hit.find_hit (free-flight
                # memorylessness makes it order-independent).  One uniform
                # per sphere per lane, same draw order as the wavefront.
                ray_len = jnp.sqrt(jnp.maximum(
                    _dot3(dx, dy, dz, dx, dy, dz), 1e-20))
                for i in range(n_spheres):
                    state, uu = _pcg(state)
                    cx, cy, cz = sph_at(i, 0), sph_at(i, 1), sph_at(i, 2)
                    r = sph_at(i, 3)
                    mrow = [sph_at(i, 4 + k) for k in range(13)]
                    ocx, ocy, ocz = ox - cx, oy - cy, oz - cz
                    a = _dot3(dx, dy, dz, dx, dy, dz)
                    half_b = _dot3(dx, dy, dz, ocx, ocy, ocz)
                    c = _dot3(ocx, ocy, ocz, ocx, ocy, ocz) - r * r
                    disc = half_b * half_b - a * c
                    sq = _safe_sqrt(disc)
                    inv_a = jnp.reciprocal(a)
                    r0 = (-half_b - sq) * inv_a
                    r1 = (-half_b + sq) * inv_a
                    ok = (disc >= 0.0) & (r1 > r0 + 0.0001)
                    rec1 = jnp.maximum(r0, t_min)
                    rec2 = jnp.minimum(r1, t_best)
                    ok = ok & (rec1 < rec2)
                    rec1 = jnp.maximum(rec1, 0.0)
                    dist_inside = (rec2 - rec1) * ray_len
                    neg_inv_density = mrow[10]  # roughness channel
                    hit_dist = neg_inv_density * jnp.log(
                        jnp.maximum(uu, 1e-12))
                    ok = ok & (hit_dist <= dist_inside)
                    tv = rec1 + hit_dist / ray_len
                    tv = jnp.where(ok, tv, inf)
                    # Only ISOTROPIC spheres scatter volumetrically.
                    tv = jnp.where(mrow[12] == float(ISOTROPIC), tv, inf)
                    win = tv < t_best
                    t_best = jnp.where(win, tv, t_best)
                    kind = jnp.where(win, 3.0, kind)
                    scx = jnp.where(win, cx, scx)
                    scy = jnp.where(win, cy, scy)
                    scz = jnp.where(win, cz, scz)
                    sr = jnp.where(win, r, sr)
                    mat = [jnp.where(win, mrow[k], mat[k])
                           for k in range(13)]

            hit = kind > 0.5
            # ---- shading frame (kernels.hit.shade_hit).
            hx = ox + t_best * dx
            hy = oy + t_best * dy
            hz = oz + t_best * dz
            snx, sny, snz = _norm3(hx - scx, hy - scy, hz - scz)
            is_quad = kind == 2.0
            nx = jnp.where(is_quad, qnx, snx)
            ny = jnp.where(is_quad, qny, sny)
            nz = jnp.where(is_quad, qnz, snz)
            if n_tris:
                tbx, tby, tbz = _norm3(tnx, tny, tnz)
                is_tri = kind == 4.0
                nx = jnp.where(is_tri, tbx, nx)
                ny = jnp.where(is_tri, tby, ny)
                nz = jnp.where(is_tri, tbz, nz)
            is_vol_lane = kind == 3.0
            front = (_dot3(dx, dy, dz, nx, ny, nz) < 0.0) | is_vol_lane
            flip = jnp.where(front, 1.0, -1.0)
            nx, ny, nz = nx * flip, ny * flip, nz * flip

            # ---- miss / emission accumulation (traceRay.wgsl:12-22).
            miss = alive & ~hit
            for k in range(3):
                rad[k] = rad[k] + jnp.where(miss, bg[k] * thr[k], 0.0)
            live = alive & hit
            emit_scale = jnp.where(front, 1.0, 0.0)
            for k in range(3):
                rad[k] = rad[k] + jnp.where(
                    live, mat[6 + k] * emit_scale * thr[k], 0.0)

            # ---- material_scatter (integrator.bsdf), exact draw order.
            sstr, rough, eta, mtype = mat[9], mat[10], mat[11], mat[12]
            # ONB about the shading normal (importanceSampling.wgsl:60-67).
            big_x = jnp.abs(nx) > 0.9
            axx = jnp.where(big_x, 0.0, 1.0)
            axy = jnp.where(big_x, 1.0, 0.0)
            ovx, ovy, ovz = _norm3(*_cross3(nx, ny, nz, axx, axy, zero))
            oux, ouy, ouz = _cross3(nx, ny, nz, ovx, ovy, ovz)
            # cosine_wrt_z draws (r1, r2).
            state, r1 = _pcg(state)
            state, r2 = _pcg(state)
            phi = two_pi * r1
            sq = jnp.sqrt(r2)
            lx = jnp.cos(phi) * sq
            ly = jnp.sin(phi) * sq
            lz = jnp.sqrt(jnp.maximum(1.0 - r2, 0.0))
            ddx, ddy, ddz = _norm3(oux * lx + ovx * ly + nx * lz,
                                   ouy * lx + ovy * ly + ny * lz,
                                   ouz * lx + ovz * ly + nz * lz)
            state, u_spec = _pcg(state)
            do_spec = jnp.where(u_spec < sstr, 1.0, 0.0)
            rfx, rfy, rfz = _reflect3(dx, dy, dz, nx, ny, nz)
            spx, spy, spz = _norm3(_mix(rfx, ddx, rough),
                                   _mix(rfy, ddy, rough),
                                   _mix(rfz, ddz, rough))
            lamx, lamy, lamz = _norm3(_mix(ddx, spx, do_spec),
                                      _mix(ddy, spy, do_spec),
                                      _mix(ddz, spz, do_spec))
            lam_skip = do_spec > 0.5
            # MIRROR — fuzz draw (uniform_in_unit_sphere: r1, r2).
            state, f1 = _pcg(state)
            state, f2 = _pcg(state)
            fphi = f1 * two_pi
            fcos = jnp.clip(2.0 * f2 - 1.0, -1.0, 1.0)
            fsin = jnp.sqrt(jnp.maximum(1.0 - fcos * fcos, 0.0))
            fx = fsin * jnp.cos(fphi)
            fy = fsin * jnp.sin(fphi)
            fz = fcos
            mrx, mry, mrz = _norm3(rfx + rough * fx, rfy + rough * fy,
                                   rfz + rough * fz)
            # GLASS (scatterRay.wgsl:44-71).
            ir = jnp.where(front, jnp.reciprocal(jnp.maximum(eta, 1e-8)),
                           eta)
            ux, uy, uz = _norm3(dx, dy, dz)
            cos_t = jnp.minimum(-_dot3(ux, uy, uz, nx, ny, nz), 1.0)
            sin_t = _safe_sqrt(1.0 - cos_t * cos_t)
            state, u_refl = _pcg(state)
            r0s = (1.0 - ir) / (1.0 + ir)
            r0s = r0s * r0s
            one_m = 1.0 - cos_t
            schlick = r0s + (1.0 - r0s) * (one_m * one_m) * (
                one_m * one_m) * one_m
            must_reflect = (ir * sin_t > 1.0) | (schlick > u_refl)
            grx, gry, grz = _reflect3(ux, uy, uz, nx, ny, nz)
            # refract (vecmath.refract): perp + parallel components.
            rpx = ir * (ux + cos_t * nx)
            rpy = ir * (uy + cos_t * ny)
            rpz = ir * (uz + cos_t * nz)
            par = -_safe_sqrt(1.0 - _dot3(rpx, rpy, rpz, rpx, rpy, rpz))
            gtx = rpx + par * nx
            gty = rpy + par * ny
            gtz = rpz + par * nz
            glx, gly, glz = _norm3(jnp.where(must_reflect, grx, gtx),
                                   jnp.where(must_reflect, gry, gty),
                                   jnp.where(must_reflect, grz, gtz))
            # ISOTROPIC — HG phase about the incident dir.
            state, u_hg = _pcg(state)
            g = sstr
            safe_g = jnp.where(jnp.abs(g) < 1e-4, 1.0, g)
            frac = (1.0 - g * g) / (1.0 - g + 2.0 * g * u_hg)
            hg_gen = (1.0 + g * g - frac * frac) / (2.0 * safe_g)
            cos_hg = jnp.clip(jnp.where(jnp.abs(g) < 1e-4, 1.0 - 2.0 * u_hg,
                                        hg_gen), -1.0, 1.0)
            sin_hg = _safe_sqrt(1.0 - cos_hg * cos_hg)
            state, u_phi = _pcg(state)
            hphi = two_pi * u_phi
            hlx = sin_hg * jnp.cos(hphi)
            hly = sin_hg * jnp.sin(hphi)
            hlz = cos_hg
            wux, wuy, wuz = _norm3(dx, dy, dz)
            big_wx = jnp.abs(wux) > 0.9
            waxx = jnp.where(big_wx, 0.0, 1.0)
            waxy = jnp.where(big_wx, 1.0, 0.0)
            wvx, wvy, wvz = _norm3(*_cross3(wux, wuy, wuz, waxx, waxy, zero))
            wuxx, wuxy, wuxz = _cross3(wux, wuy, wuz, wvx, wvy, wvz)
            isx, isy, isz = _norm3(wuxx * hlx + wvx * hly + wux * hlz,
                                   wuxy * hlx + wvy * hly + wuy * hlz,
                                   wuxz * hlx + wvz * hly + wuz * hlz)
            # Select by material type (bsdf.material_scatter:123-131).
            is_lam = mtype == float(LAMBERTIAN)
            is_mir = mtype == float(MIRROR)
            is_gls = mtype == float(GLASS)
            sdx = jnp.where(is_lam, lamx,
                            jnp.where(is_mir, mrx,
                                      jnp.where(is_gls, glx, isx)))
            sdy = jnp.where(is_lam, lamy,
                            jnp.where(is_mir, mry,
                                      jnp.where(is_gls, gly, isy)))
            sdz = jnp.where(is_lam, lamz,
                            jnp.where(is_mir, mrz,
                                      jnp.where(is_gls, glz, isz)))
            skip_pdf = lam_skip | ~is_lam  # non-lambertian always skips MIS
            dsf = jnp.where(is_lam, do_spec, 0.0)
            att = [_mix(mat[k], mat[3 + k], dsf) for k in range(3)]

            if use_nee:
                # NEE/MIS mixing for diffuse lanes (traceRay.wgsl:26-57).
                lq = [light_at(0, k) for k in range(3)]
                lu = [light_at(0, 3 + k) for k in range(3)]
                lv = [light_at(0, 6 + k) for k in range(3)]
                state, lr1 = _pcg(state)
                state, lr2 = _pcg(state)
                ldx = lq[0] + lr1 * lu[0] + lr2 * lv[0] - hx
                ldy = lq[1] + lr1 * lu[1] + lr2 * lv[1] - hy
                ldz = lq[2] + lr1 * lu[2] + lr2 * lv[2] - hz
                ldx, ldy, ldz = _norm3(ldx, ldy, ldz)
                state, u_mix = _pcg(state)
                take_bsdf = u_mix > p_light
                chx = jnp.where(take_bsdf, ddx, ldx)
                chy = jnp.where(take_bsdf, ddy, ldy)
                chz = jnp.where(take_bsdf, ddz, ldz)
                lam_pdf = jnp.maximum(
                    0.0, _dot3(chx, chy, chz, nx, ny, nz) * inv_pi)
                # quad_light_pdf (importanceSampling.wgsl:88-125).
                nrx, nry, nrz = _cross3(lu[0], lu[1], lu[2],
                                        lv[0], lv[1], lv[2])
                n_len = jnp.sqrt(jnp.maximum(
                    nrx * nrx + nry * nry + nrz * nrz, 1e-20))
                lnx, lny, lnz = nrx / n_len, nry / n_len, nrz / n_len
                d_plane = lnx * lq[0] + lny * lq[1] + lnz * lq[2]
                # 1e-12 floors, not 1e-20: (1e-20)^2 underflows f32 in the
                # division VJP -> NaN geometry grads (see lights.py).
                inv_nn = 1.0 / jnp.maximum(
                    nrx * nrx + nry * nry + nrz * nrz, 1e-12)
                lwx, lwy, lwz = nrx * inv_nn, nry * inv_nn, nrz * inv_nn
                denom = lnx * chx + lny * chy + lnz * chz
                # Grazing lanes (denom ~ 0) are rejected by `valid` below;
                # guard the division so quad gradients stay NaN-free
                # (integrator.lights.quad_light_pdf has the same guard).
                grazing = jnp.abs(denom) < 1e-8
                tl = ((d_plane - (lnx * hx + lny * hy + lnz * hz))
                      / jnp.where(grazing, 1.0, denom))
                prx = hx + tl * chx - lq[0]
                pry = hy + tl * chy - lq[1]
                prz = hz + tl * chz - lq[2]
                ccx, ccy, ccz = _cross3(prx, pry, prz, lv[0], lv[1], lv[2])
                alpha = lwx * ccx + lwy * ccy + lwz * ccz
                ccx, ccy, ccz = _cross3(lu[0], lu[1], lu[2], prx, pry, prz)
                beta = lwx * ccx + lwy * ccy + lwz * ccz
                valid = ((denom <= 0.0) & (jnp.abs(denom) >= 1e-8)
                         & (tl > 0.001) & (tl < t_max)
                         & (alpha >= 0.0) & (alpha <= 1.0)
                         & (beta >= 0.0) & (beta <= 1.0))
                dist_sq = tl * tl  # chosen dir is unit length
                cosine = jnp.abs(denom)
                l_pdf = jnp.where(
                    valid, dist_sq / jnp.maximum(cosine * n_len, 1e-12),
                    np.float32(0.0001))
                pdf = p_light * l_pdf + (1.0 - p_light) * lam_pdf
                degenerate = pdf <= 1e-5
                inv_pdf = jnp.reciprocal(jnp.maximum(pdf, 1e-12))
                use_mis = live & ~skip_pdf
                ndx = jnp.where(use_mis, chx, sdx)
                ndy = jnp.where(use_mis, chy, sdy)
                ndz = jnp.where(use_mis, chz, sdz)
                mis_w = lam_pdf * inv_pdf
                nthr = [jnp.where(use_mis, thr[k] * mis_w * att[k],
                                  thr[k] * att[k]) for k in range(3)]
                live = live & ~(use_mis & degenerate)
            else:
                ndx, ndy, ndz = sdx, sdy, sdz
                nthr = [thr[k] * att[k] for k in range(3)]

            thr = [jnp.where(live, nthr[k], thr[k]) for k in range(3)]
            ox = jnp.where(live, hx, ox)
            oy = jnp.where(live, hy, oy)
            oz = jnp.where(live, hz, oz)
            dx = jnp.where(live, ndx, dx)
            dy = jnp.where(live, ndy, dy)
            dz = jnp.where(live, ndz, dz)
            alive = live

            # ---- Russian roulette (traceRay.wgsl:70-79).
            state, u_rr = _pcg(state)
            p_surv = jnp.maximum(jnp.maximum(thr[0], thr[1]), thr[2])
            rr_on = bounce_idx >= cfg.rr_start_bounce
            kill = rr_on & (u_rr > p_surv) & alive
            alive = alive & ~kill
            comp = rr_on & alive
            inv_p = jnp.reciprocal(jnp.maximum(p_surv, 1e-12))
            thr = [jnp.where(comp, thr[k] * inv_p, thr[k]) for k in range(3)]
            return state, ox, oy, oz, dx, dy, dz, rad, thr, alive

        def one_sample(state, sample_idx):
            """Camera ray + full bounce loop for one sample per lane."""
            state, u1 = _pcg(state)
            state, u2 = _pcg(state)
            if cfg.stratify:
                if isinstance(sample_idx, int):  # unrolled sample loop
                    offx = np.float32(sample_idx // grid_n)
                    offy = np.float32(sample_idx % grid_n)
                else:
                    offx = (sample_idx // grid_n).astype(_F32)
                    offy = jnp.remainder(sample_idx, grid_n).astype(_F32)
                jx = sub_scale * (offx + u1)
                jy = sub_scale * (offy + u2)
            else:
                jx, jy = u1, u2
            s = aspect * (2.0 * ((pxf - 0.5 + jx) / w) - 1.0)
            t = -(2.0 * ((pyf - 0.5 + jy) / h) - 1.0)
            dx = s * b0x + t * b1x - fov_factor * b2x
            dy = s * b0y + t * b1y - fov_factor * b2y
            dz = s * b0z + t * b1z - fov_factor * b2z
            dx, dy, dz = _norm3(dx, dy, dz)
            ox = jnp.zeros_like(dx) + eyex
            oy = jnp.zeros_like(dx) + eyey
            oz = jnp.zeros_like(dx) + eyez
            zero = jnp.zeros_like(dx)
            rad = [zero, zero, zero]
            one = zero + 1.0
            thr = [one, one, one]

            if unroll:
                alive = jnp.ones_like(dx, jnp.bool_)
                for i in range(cfg.max_bounces):
                    state, ox, oy, oz, dx, dy, dz, rad, thr, alive = \
                        bounce_step(state, ox, oy, oz, dx, dy, dz,
                                    rad, thr, alive, i)
                return state, rad[0], rad[1], rad[2]

            def body(i, carry):
                # Liveness rides the carry as f32 — Mosaic cannot legalize
                # i1-vector loop carries ("failed to legalize scf.for").
                state, ox, oy, oz, dx, dy, dz, r0, r1c, r2c, t0, t1, t2, \
                    alive_f = carry
                state, ox, oy, oz, dx, dy, dz, radl, thrl, alive = \
                    bounce_step(state, ox, oy, oz, dx, dy, dz,
                                [r0, r1c, r2c], [t0, t1, t2],
                                alive_f > 0.5, i)
                return (state, ox, oy, oz, dx, dy, dz, radl[0], radl[1],
                        radl[2], thrl[0], thrl[1], thrl[2],
                        jnp.where(alive, 1.0, 0.0))

            carry = (state, ox, oy, oz, dx, dy, dz, rad[0], rad[1], rad[2],
                     thr[0], thr[1], thr[2], jnp.ones_like(dx))
            carry = jax.lax.fori_loop(0, cfg.max_bounces, body, carry)
            return carry[0], carry[7], carry[8], carry[9]

        zero = jnp.zeros_like(pxf)
        inv_spp = np.float32(1.0 / spp)
        if unroll:
            state, ar, ag, ab = state0, zero, zero, zero
            for k in range(spp):
                state, rr, rg, rb = one_sample(state, k)
                ar, ag, ab = ar + rr, ag + rg, ab + rb
        else:
            def sample_loop(k, carry):
                state, ar, ag, ab = carry
                state, rr, rg, rb = one_sample(state, k)
                return state, ar + rr, ag + rg, ab + rb

            state, ar, ag, ab = jax.lax.fori_loop(
                0, spp, sample_loop, (state0, zero, zero, zero))
        return ar * inv_spp, ag * inv_spp, ab * inv_spp

    return trace_tile


def _resolved_spp(cfg: RenderConfig) -> int:
    return (max(int(cfg.samples_per_pixel ** 0.5), 1) ** 2
            if cfg.stratify else cfg.samples_per_pixel)


def supported(scene: SceneData, meta: SceneMeta, cfg: RenderConfig) -> bool:
    """Whether the megakernel covers this (scene, config): analytic
    spheres/quads plus small meshes (unrolled triangle loop, like the
    reference's single dispatch over its whole scene)."""
    return (int(scene.triangles.count) <= MAX_MEGAKERNEL_TRIS
            and (int(scene.spheres.count) + int(scene.quads.count)
                 + int(scene.triangles.count)) > 0)


def vjp_supported(scene: SceneData, meta: SceneMeta,
                  cfg: RenderConfig) -> bool:
    """Whether the differentiable (custom-VJP) megakernel path applies: the
    backward kernel statically unrolls ``max_bounces * spp`` bounce bodies,
    so deep-bounce configs keep the wavefront's rematerialized scan."""
    return (supported(scene, meta, cfg)
            and cfg.max_bounces * _resolved_spp(cfg) <= MAX_UNROLL_BOUNCES)


def _fwd_call(meta, cfg, interpret, n_tris, sph_tab, quad_tab, tri_tab,
              light_tab, cam, st2, px2, py2):
    """Forward pallas_call: SMEM scene tables, fori_loop sample/bounce.

    ``n_tris`` is the REAL triangle count (static): a triangle-free scene
    still packs a one-row dummy table (pallas inputs need >= 1 row) but
    skips the unrolled loop entirely."""
    rows = st2.shape[0]
    n_sph, n_quads = sph_tab.shape[0], quad_tab.shape[0]
    tracer = _make_tracer(n_sph, n_quads, n_tris, cfg, meta,
                          _resolved_spp(cfg), unroll=False)

    def kernel(sph_ref, quad_ref, tri_ref, light_ref, cam_ref, st_ref,
               px_ref, py_ref, r_ref, g_ref, b_ref):
        r, g, b = tracer(
            lambda i, k: sph_ref[i, k], lambda i, k: quad_ref[i, k],
            lambda i, k: tri_ref[i, k],
            lambda i, k: light_ref[i, k], lambda i, k: cam_ref[i, k],
            st_ref[:], px_ref[:].astype(_F32), py_ref[:].astype(_F32))
        r_ref[:] = r
        g_ref[:] = g
        b_ref[:] = b

    grid = (rows // TILE_ROWS,)
    smem = functools.partial(pl.BlockSpec, memory_space=pltpu.SMEM)
    lane_spec = pl.BlockSpec((TILE_ROWS, LANES), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((rows, LANES), _F32)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[smem(), smem(), smem(), smem(), smem(),
                  lane_spec, lane_spec, lane_spec],
        out_specs=(lane_spec, lane_spec, lane_spec),
        out_shape=(out_shape, out_shape, out_shape),
        interpret=interpret,
    )(sph_tab, quad_tab, tri_tab, light_tab, cam, st2, px2, py2)


def _bwd_call(meta, cfg, interpret, n_tris, sph_tab, quad_tab, tri_tab,
              light_tab, cam, st2, px2, py2, g_r, g_g, g_b):
    """Backward pallas_call: replay the identical PCG stream with the scene
    tables as VMEM *values* and differentiate the unrolled tracer in-kernel
    (``jax.grad`` inside the kernel body — residuals stay in VMEM).  Table
    cotangents accumulate across the sequential grid into revisited output
    blocks."""
    spp = _resolved_spp(cfg)
    if cfg.max_bounces * spp > MAX_UNROLL_BOUNCES:
        raise NotImplementedError(
            f"megakernel backward unrolls max_bounces*spp = "
            f"{cfg.max_bounces * spp} bounce bodies (budget "
            f"{MAX_UNROLL_BOUNCES}); use the wavefront integrator "
            f"(use_megakernel=False) for deep-bounce training")
    rows = st2.shape[0]
    n_sph, n_quads = sph_tab.shape[0], quad_tab.shape[0]
    tracer = _make_tracer(n_sph, n_quads, n_tris, cfg, meta, spp,
                          unroll=True)

    def kernel(sph_ref, quad_ref, tri_ref, light_ref, cam_ref, st_ref,
               px_ref, py_ref, gr_ref, gg_ref, gb_ref,
               dsph_ref, dquad_ref, dtri_ref, dlight_ref, dcam_ref):
        state0 = st_ref[:]
        pxf = px_ref[:].astype(_F32)
        pyf = py_ref[:].astype(_F32)
        gr, gg, gb = gr_ref[:], gg_ref[:], gb_ref[:]

        def scalar_loss(sph, quad, tri, light, camv):
            r, g, b = tracer(
                lambda i, k: sph[i, k], lambda i, k: quad[i, k],
                lambda i, k: tri[i, k],
                lambda i, k: light[i, k], lambda i, k: camv[i, k],
                state0, pxf, pyf)
            return jnp.sum(r * gr + g * gg + b * gb)

        ds, dq, dt, dl, dc = jax.grad(scalar_loss, argnums=(0, 1, 2, 3, 4))(
            sph_ref[:], quad_ref[:], tri_ref[:], light_ref[:], cam_ref[:])

        step = pl.program_id(0)

        @pl.when(step == 0)
        def _():
            dsph_ref[:] = jnp.zeros(dsph_ref.shape, _F32)
            dquad_ref[:] = jnp.zeros(dquad_ref.shape, _F32)
            dtri_ref[:] = jnp.zeros(dtri_ref.shape, _F32)
            dlight_ref[:] = jnp.zeros(dlight_ref.shape, _F32)
            dcam_ref[:] = jnp.zeros(dcam_ref.shape, _F32)

        dsph_ref[:] += ds
        dquad_ref[:] += dq
        dtri_ref[:] += dt
        dlight_ref[:] += dl
        dcam_ref[:] += dc

    grid = (rows // BWD_TILE_ROWS,)
    vmem = functools.partial(pl.BlockSpec, memory_space=pltpu.VMEM)
    lane_spec = pl.BlockSpec((BWD_TILE_ROWS, LANES), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)
    acc_spec = pl.BlockSpec(memory_space=pltpu.VMEM)  # revisited, whole
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[vmem(), vmem(), vmem(), vmem(), vmem(),
                  lane_spec, lane_spec, lane_spec,
                  lane_spec, lane_spec, lane_spec],
        out_specs=(acc_spec, acc_spec, acc_spec, acc_spec, acc_spec),
        out_shape=(jax.ShapeDtypeStruct(sph_tab.shape, _F32),
                   jax.ShapeDtypeStruct(quad_tab.shape, _F32),
                   jax.ShapeDtypeStruct(tri_tab.shape, _F32),
                   jax.ShapeDtypeStruct(light_tab.shape, _F32),
                   jax.ShapeDtypeStruct(cam.shape, _F32)),
        interpret=interpret,
    )(sph_tab, quad_tab, tri_tab, light_tab, cam, st2, px2, py2,
      g_r, g_g, g_b)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2, 3))
def _megakernel(meta, cfg, interpret, n_tris, sph_tab, quad_tab, tri_tab,
                light_tab, cam, st2, px2, py2):
    """Differentiable megakernel core over packed tables.

    Forward = :func:`_fwd_call`; backward = :func:`_bwd_call` (full PCG
    replay + in-kernel reverse AD).  RNG state / pixel coords are integer
    inputs with no tangent space."""
    return _fwd_call(meta, cfg, interpret, n_tris, sph_tab, quad_tab,
                     tri_tab, light_tab, cam, st2, px2, py2)


def _megakernel_fwd(meta, cfg, interpret, n_tris, sph_tab, quad_tab,
                    tri_tab, light_tab, cam, st2, px2, py2):
    out = _fwd_call(meta, cfg, interpret, n_tris, sph_tab, quad_tab,
                    tri_tab, light_tab, cam, st2, px2, py2)
    return out, (sph_tab, quad_tab, tri_tab, light_tab, cam, st2, px2, py2)


def _megakernel_bwd(meta, cfg, interpret, n_tris, res, cts):
    sph_tab, quad_tab, tri_tab, light_tab, cam, st2, px2, py2 = res
    g_r, g_g, g_b = cts
    ds, dq, dt, dl, dc = _bwd_call(meta, cfg, interpret, n_tris, sph_tab,
                                   quad_tab, tri_tab, light_tab, cam,
                                   st2, px2, py2, g_r, g_g, g_b)
    return ds, dq, dt, dl, dc, None, None, None


_megakernel.defvjp(_megakernel_fwd, _megakernel_bwd)


@functools.partial(jax.jit, static_argnames=("meta", "cfg", "interpret"))
def path_trace_pixels_pallas(rand_state, view_matrix, px, py,
                             scene: SceneData, meta: SceneMeta,
                             cfg: RenderConfig, interpret: bool = False):
    """Drop-in Pallas replacement for ``integrator.render.path_trace_pixels``
    on analytic scenes.  Returns radiance ``[N, 3]`` (the trailing RNG state
    is not returned; callers discard it).  Differentiable w.r.t. ``scene``
    (material tables, sphere/quad geometry, light quad) and ``view_matrix``
    via the custom-VJP backward kernel.  ``interpret=True`` runs the Mosaic
    interpreter — used by CPU tests."""
    n = px.shape[0]
    tile = TILE_ROWS * LANES
    n_pad = -(-n // tile) * tile
    rows = n_pad // LANES

    def pad2d(x, dtype):
        x = jnp.pad(x.astype(dtype), (0, n_pad - n))
        return x.reshape(rows, LANES)

    st2 = pad2d(rand_state, jnp.uint32)
    px2 = pad2d(px, jnp.int32)
    py2 = pad2d(py, jnp.int32)
    sph_tab, quad_tab, tri_tab, light_tab = pack_tables(scene)
    cam = view_matrix.astype(_F32)

    r, g, b = _megakernel(meta, cfg, interpret,
                          int(scene.triangles.count), sph_tab, quad_tab,
                          tri_tab, light_tab, cam, st2, px2, py2)
    radiance = jnp.stack([r.reshape(-1)[:n], g.reshape(-1)[:n],
                          b.reshape(-1)[:n]], axis=-1)
    return radiance
