"""Wavefront path-tracing integrator.

The reference's per-thread radiance loop (``ray_color``,
``shaders/traceRay.wgsl:3-83``) becomes one ``lax.scan`` over bounce index:
every live lane advances one bounce per step as dense SoA state
``(rng, ray, radiance, throughput, alive)``.  Divergent ``break``/``continue``
become lane masks (SURVEY.md §5 "masked lanes"); Russian roulette kills lanes
by mask instead of exiting threads.  The scan is reverse-differentiable end
to end — the discrete hit search inside is gradient-detached
(``kernels.hit``), gradients flow through the re-shaded geometry, BSDF
attenuations, and emitter radiance.

Semantics preserved per bounce (plain mode, ``traceRay.wgsl:60-68``):
miss → radiance += background * throughput, lane dies; hit → radiance +=
front-face emission * throughput, then throughput *= mix(color, specColor,
doSpecular), ray re-aimed by ``material_scatter``.  NEE/MIS mode
(``traceRay.wgsl:24-58``): diffuse lanes mix a light-quad sample (p=0.2) with
the BSDF sample (p=0.8) under the combined pdf; specular-ish lanes skip via
``skip_pdf``.  Known reference quirk NOT copied: on a degenerate pdf the
reference *returns* ``emission * throughput``, discarding radiance already
accumulated (``traceRay.wgsl:51-53``); we terminate the lane instead, keeping
its accumulated radiance (documented deviation).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.ad_checkpoint import checkpoint_name

from ..core import rng, vecmath as vm
from ..core.config import RenderConfig
from ..core.gather import take_rows
from ..core.types import Ray, SceneData, SceneMeta
from ..kernels.hit import find_hit, shade_hit
from . import lights
from .bsdf import lambertian_pdf, material_scatter


def trace(rand_state, ray: Ray, scene: SceneData, meta: SceneMeta,
          cfg: RenderConfig):
    """Estimate radiance along each ray; returns ``(rand_state,
    radiance [N, 3])``."""
    n_rays = ray.origin.shape[0]
    background = np.asarray(cfg.background, np.float32)

    def bounce(carry, bounce_idx):
        rs, cur_ray, radiance, throughput, alive = carry

        rs, ptype, pidx, vol_u = find_hit(rs, cur_ray, scene, meta, cfg,
                                          alive=alive)
        # Named for the remat policy below: the discrete hit results are
        # tiny ([N] i32/f32 per bounce) but their recomputation is the
        # whole traversal — the single most expensive thing the backward
        # sweep could ever rematerialize.
        ptype = checkpoint_name(ptype, "hit_ptype")
        pidx = checkpoint_name(pidx, "hit_pidx")
        vol_u = checkpoint_name(vol_u, "hit_vol_u")
        rec = shade_hit(cur_ray, ptype, pidx, vol_u, scene, cfg)

        # Miss: background * throughput, lane retires (traceRay.wgsl:12-16).
        miss = alive & ~rec.hit
        radiance = radiance + jnp.where(
            miss[:, None], background * throughput, 0.0)
        live = alive & rec.hit

        # Unidirectional emission: front faces only (traceRay.wgsl:18-22).
        emission = take_rows(scene.materials.emission, rec.material_id)
        emission = jnp.where(rec.front_face[:, None], emission, 0.0)
        radiance = radiance + jnp.where(
            live[:, None], emission * throughput, 0.0)

        rs, srec = material_scatter(rs, cur_ray.dir, rec, scene.materials)

        if cfg.importance_sampling and meta.has_light:
            # NEE/MIS for non-skip (pure diffuse) lanes — traceRay.wgsl:26-57.
            lq, lu, lv = lights.light_quad(scene)
            lq, lu, lv = lq[None], lu[None], lv[None]
            rs, light_dir = lights.sample_on_quad(rs, lq, lu, lv, rec.p)
            rs, u_mix = rng.uniform(rs)
            chosen = jnp.where((u_mix > cfg.light_sample_prob)[:, None],
                               srec.diffuse_dir, light_dir)
            lam_pdf = lambertian_pdf(chosen, rec.normal)
            l_pdf = lights.quad_light_pdf(rec.p, chosen, lq, lu, lv)
            pdf = (cfg.light_sample_prob * l_pdf
                   + (1.0 - cfg.light_sample_prob) * lam_pdf)
            degenerate = pdf <= 1e-5
            mis_thr = throughput * (
                lam_pdf[:, None] * srec.attenuation
                / jnp.maximum(pdf, 1e-12)[:, None])
            use_mis = live & ~srec.skip_pdf
            new_dir = jnp.where(use_mis[:, None], chosen, srec.dir)
            new_thr = jnp.where(use_mis[:, None],
                                mis_thr, throughput * srec.attenuation)
            live = live & ~(use_mis & degenerate)
        else:
            new_dir = srec.dir
            new_thr = throughput * srec.attenuation

        throughput = jnp.where(live[:, None], new_thr, throughput)
        cur_ray = Ray(
            origin=jnp.where(live[:, None], rec.p, cur_ray.origin),
            dir=jnp.where(live[:, None], new_dir, cur_ray.dir))
        alive = live

        # Russian roulette after bounce rr_start_bounce-1
        # (traceRay.wgsl:70-79): survive with p = max throughput channel,
        # survivors compensate by 1/p.
        rs, u_rr = rng.uniform(rs)
        p_survive = jnp.max(throughput, axis=-1)
        rr_active = bounce_idx >= cfg.rr_start_bounce
        kill = rr_active & (u_rr > p_survive) & alive
        alive = alive & ~kill
        comp = rr_active & alive
        throughput = jnp.where(
            comp[:, None],
            throughput / jnp.maximum(p_survive, 1e-12)[:, None],
            throughput)

        return (rs, cur_ray, radiance, throughput, alive), None

    if cfg.remat_bounces:
        # Rematerialize each bounce in the backward sweep instead of saving
        # every bounce's full SoA state to HBM — the backward pass of the
        # scan is bandwidth-bound on those saves (round-1 headline fwd+bwd
        # was 5x slower than 2x-forward cost would predict).  With
        # checkpointing the scan saves only the (small) carry between
        # bounces and re-traces each bounce's interior on the way back —
        # EXCEPT the discrete hit results: saving those [N]-sized indices
        # (a few MB per bounce) lets the replay skip the BVH traversal,
        # which is ~95% of a mesh frame (round 4: fwd+bwd step cost on the
        # 82k-tri scene was 2.5x the forward frame before this).
        bounce = jax.checkpoint(
            bounce,
            policy=jax.checkpoint_policies.save_only_these_names(
                "hit_ptype", "hit_pidx", "hit_vol_u"))

    # Under shard_map, the scan carry's varying-manual-axes type must be
    # consistent from step 0, but literal constants (and even the broadcast
    # camera origin) are 'replicated' while the post-bounce carry is
    # 'varying'.  Derive every carry init from the per-lane RNG state —
    # always varying when the pixel axis is sharded — via a varying zero.
    # Outside shard_map this folds away.
    del n_rays
    vzero = (rand_state & jnp.uint32(0)).astype(jnp.float32)[:, None]  # [N,1]
    init = (
        rand_state,
        Ray(origin=ray.origin + vzero, dir=ray.dir + vzero),
        vzero + jnp.zeros((3,), jnp.float32),  # acc_radiance, traceRay.wgsl:6
        vzero + jnp.ones((3,), jnp.float32),   # throughput,   traceRay.wgsl:7
        (rand_state | np.uint32(1)) > 0,      # alive (all True, varying)
    )
    (rand_state, _, radiance, _, _), _ = jax.lax.scan(
        bounce, init, jnp.arange(cfg.max_bounces))
    return rand_state, radiance
