"""Branchless BSDF sampling for all four material families.

The reference's ``material_scatter`` (``shaders/scatterRay.wgsl:2-95``) is a
four-way per-thread branch; here every lane evaluates all four samplers as
dense VPU math and the result is selected by material type — the standard
TPU trade of redundant flops for zero divergence.  Per-family semantics are
kept exactly:

* LAMBERTIAN (``scatterRay.wgsl:6-34``): cosine-weighted hemisphere sample in
  the normal's ONB; with probability ``specularStrength`` the lane goes
  specular — reflect direction lerped toward the diffuse sample by
  ``roughness`` — and sets ``skip_pdf`` (bypasses NEE/MIS).
* MIRROR (``:36-42``): reflect + ``roughness`` * uniform-sphere fuzz.
* GLASS (``:44-71``): Schlick reflectance / total internal reflection,
  ``eta`` flipped on front faces.
* ISOTROPIC (``:73-92``): Henyey-Greenstein phase sampling about the incident
  direction with ``g = specularStrength``.

Throughput attenuation is ``mix(color, specularColor, doSpecular)``
(``traceRay.wgsl:32,56,65``) — ``doSpecular`` only ever set on lambertian
lanes (``scatterRay.wgsl:1,14``).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from ..core import rng, vecmath as vm
from ..core.config import GLASS, ISOTROPIC, LAMBERTIAN, MIRROR, PI
from ..core.gather import TableGather
from ..core.types import HitRecord, Materials


class ScatterRecord(NamedTuple):
    """SoA of WGSL ``ScatterRecord`` (header.wgsl:127-131) plus what the
    NEE/MIS combiner needs (the reference keeps these in thread-privates)."""
    dir: jnp.ndarray          # [N, 3] sampled outgoing direction
    attenuation: jnp.ndarray  # [N, 3] throughput multiplier
    skip_pdf: jnp.ndarray     # [N] bool — specular-ish lanes bypass MIS
    diffuse_dir: jnp.ndarray  # [N, 3] the pure-diffuse candidate (NEE mixing)


def schlick_reflectance(cosine, ref_idx):
    """``reflectance`` — importanceSampling.wgsl:1-5."""
    r0 = (1.0 - ref_idx) / (1.0 + ref_idx)
    r0 = r0 * r0
    return r0 + (1.0 - r0) * (1.0 - cosine) ** 5


def henyey_greenstein_cos(g, u):
    """Sample cos(theta) from the HG phase function
    (``scatterRay.wgsl:80``), with the isotropic g→0 limit made explicit
    (the reference divides by 2g and relies on never hitting g=0)."""
    safe_g = jnp.where(jnp.abs(g) < 1e-4, 1.0, g)
    frac = (1.0 - g * g) / (1.0 - g + 2.0 * g * u)
    general = (1.0 + g * g - frac * frac) / (2.0 * safe_g)
    isotropic = 1.0 - 2.0 * u
    return jnp.clip(jnp.where(jnp.abs(g) < 1e-4, isotropic, general),
                    -1.0, 1.0)


def material_scatter(rand_state, wi: jnp.ndarray, rec: HitRecord,
                     materials: Materials):
    """Sample an outgoing ray for every lane; returns
    ``(rand_state, ScatterRecord)``.

    RNG note: all branch samplers draw for every lane (8 uniforms per lane
    per bounce) whereas the reference draws only the taken branch's — the
    per-lane PCG streams diverge from the reference after the first bounce,
    which is fine: parity is defined at the estimator level (SURVEY.md §7).
    """
    mid = rec.material_id
    # One-hot matmul lookup — XLA's gather lowering for tiny-table/huge-index
    # reads is pathological on TPU (core.gather docstring has the numbers).
    gm = TableGather(mid, materials.count)
    mtype = gm(materials.mtype)
    color = gm(materials.color)
    spec_color = gm(materials.specular_color)
    spec_strength = gm(materials.specular_strength)
    roughness = gm(materials.roughness)
    eta = gm(materials.eta)
    n = rec.normal

    # --- LAMBERTIAN ---------------------------------------------------
    ub, vb, wb = vm.onb_from_w(n)
    rand_state, cos_local = rng.cosine_wrt_z(rand_state)
    diffuse_dir = vm.normalize(vm.onb_local(ub, vb, wb, cos_local))
    rand_state, u_spec = rng.uniform(rand_state)
    do_specular = (u_spec < spec_strength).astype(jnp.float32)
    reflected = vm.reflect(wi, n)
    specular_dir = vm.normalize(
        vm.mix(reflected, diffuse_dir, roughness[:, None]))
    lam_dir = vm.normalize(
        vm.mix(diffuse_dir, specular_dir, do_specular[:, None]))
    lam_skip = do_specular > 0.5

    # --- MIRROR -------------------------------------------------------
    rand_state, fuzz = rng.uniform_in_unit_sphere(rand_state)
    mirror_dir = vm.normalize(reflected + roughness[:, None] * fuzz)

    # --- GLASS --------------------------------------------------------
    # eta is 0 on non-glass materials; every lane evaluates the glass math,
    # so an unguarded 1/eta puts inf/NaN in forward intermediates and NaNs
    # the eta *gradient* even when the glass branch is never selected.
    ir = jnp.where(rec.front_face, 1.0 / jnp.maximum(eta, 1e-8), eta)
    unit = vm.normalize(wi)
    cos_t = jnp.minimum(vm.dot(-unit, n), 1.0)
    sin_t = vm.safe_sqrt(1.0 - cos_t * cos_t)
    rand_state, u_refl = rng.uniform(rand_state)
    must_reflect = (ir * sin_t > 1.0) | (schlick_reflectance(cos_t, ir)
                                         > u_refl)
    glass_dir = vm.normalize(jnp.where(
        must_reflect[:, None], vm.reflect(unit, n),
        vm.refract(unit, n, ir)))

    # --- ISOTROPIC (Henyey-Greenstein about the incident dir) ---------
    g = spec_strength
    rand_state, u_hg = rng.uniform(rand_state)
    cos_hg = henyey_greenstein_cos(g, u_hg)
    sin_hg = vm.safe_sqrt(1.0 - cos_hg * cos_hg)
    rand_state, u_phi = rng.uniform(rand_state)
    phi = 2.0 * PI * u_phi
    hg_local = jnp.stack(
        [sin_hg * jnp.cos(phi), sin_hg * jnp.sin(phi), cos_hg], axis=-1)
    uw, vw, ww = vm.onb_from_w(wi)
    iso_dir = vm.normalize(vm.onb_local(uw, vw, ww, hg_local))

    # --- select by material type --------------------------------------
    mt = mtype[:, None]
    out_dir = jnp.where(
        mt == LAMBERTIAN, lam_dir,
        jnp.where(mt == MIRROR, mirror_dir,
                  jnp.where(mt == GLASS, glass_dir, iso_dir)))
    skip_pdf = jnp.where(mtype == LAMBERTIAN, lam_skip, True)
    do_spec_final = jnp.where(mtype == LAMBERTIAN, do_specular, 0.0)
    attenuation = vm.mix(color, spec_color, do_spec_final[:, None])

    return rand_state, ScatterRecord(
        dir=out_dir, attenuation=attenuation, skip_pdf=skip_pdf,
        diffuse_dir=diffuse_dir)


def lambertian_pdf(direction, normal):
    """``onb_lambertian_scattering_pdf`` (importanceSampling.wgsl:73-76):
    max(0, cos(theta)/pi) against the shading normal."""
    cosine = vm.dot(vm.normalize(direction), vm.normalize(normal))
    return jnp.maximum(0.0, cosine / PI)
