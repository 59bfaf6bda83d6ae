"""Camera ray generation and the per-frame render step.

Ray generation follows ``shaders/shootRay.wgsl``: pixel centers at integer
coordinates, one jittered sample per pixel per frame (or a stratified
sqrt(spp) x sqrt(spp) sub-pixel grid when ``cfg.stratify``,
``shootRay.wgsl:9-46``), and camera rays through the view matrix with a
60-degree vertical FOV factor (``shootRay.wgsl:54-60``, ``main.wgsl:7-8``).

Deviation (documented): the reference computes the pixel y coordinate with a
float divide that leaks the x-fraction into y
(``pixelCoords``, ``shaders/main.wgsl:5`` — ``f32(pixelIndex) / W`` has no
floor), shearing every row by up to one pixel.  We use the integer floor
divide that code plainly intends.

The per-frame step is one jitted function: seed per-pixel PCG states
(``main.wgsl:16``), scan over samples, trace, average, accumulate.  The
framebuffer should be donated by the caller for in-place accumulation.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..core import rng, vecmath as vm
from ..core.config import PI, RenderConfig
from ..core.types import Ray, SceneData, SceneMeta
from . import film
from .path_tracer import trace


def camera_rays(rand_state, view_matrix, px, py, cfg: RenderConfig,
                sub_offset=None, sub_scale: float = 1.0):
    """Jittered primary rays through pixel coords (px, py).

    ``sub_offset``/``sub_scale`` implement the stratified sub-pixel grid:
    jitter = sub_scale * (sub_offset + u) instead of plain u
    (``shootRay.wgsl:19-22`` vs ``:37-39``).
    Returns (rand_state, Ray).
    """
    w = np.float32(cfg.width)
    h = np.float32(cfg.height)
    aspect = w / h
    rand_state, u1 = rng.uniform(rand_state)
    rand_state, u2 = rng.uniform(rand_state)
    if sub_offset is not None:
        jx = sub_scale * (sub_offset[0] + u1)
        jy = sub_scale * (sub_offset[1] + u2)
    else:
        jx, jy = u1, u2
    s = aspect * (2.0 * ((px.astype(jnp.float32) - 0.5 + jx) / w) - 1.0)
    t = -1.0 * (2.0 * ((py.astype(jnp.float32) - 0.5 + jy) / h) - 1.0)

    fov_factor = np.float32(1.0 / np.tan(cfg.fov_degrees * (PI / 180.0) / 2.0))
    # dir = normalize(viewMatrix @ [s, t, -fovFactor, 0]).xyz
    basis = view_matrix[:3, :3]  # columns: camera x, y, z axes
    d = (s[:, None] * basis[:, 0][None]
         + t[:, None] * basis[:, 1][None]
         - fov_factor * basis[:, 2][None])
    origin = jnp.broadcast_to(view_matrix[:3, 3][None], d.shape)
    return rand_state, Ray(origin=origin, dir=vm.normalize(d))


def path_trace_pixels(rand_state, view_matrix, px, py, scene: SceneData,
                      meta: SceneMeta, cfg: RenderConfig):
    """``pathTrace`` (``shootRay.wgsl:5-49``): average ``samples_per_pixel``
    estimates per pixel (stratified grid when configured).  Returns
    (rand_state, radiance [N, 3]).

    When ``cfg.use_megakernel`` is set and the scene is analytic
    (spheres/quads only), the whole trace routes through the fused Pallas
    megakernel with its custom-VJP backward kernel
    (``kernels.pallas.megakernel``) — the reference's single-dispatch shape
    (``shaders/main.wgsl:1-27``).  The megakernel does not thread the RNG
    state back out; the returned ``rand_state`` is the caller's input
    (callers reseed per frame from ``(pixel, frame_num)``, ``main.wgsl:16``,
    so no stream reuse occurs across frames).  On non-TPU backends the
    kernel runs in Mosaic interpreter mode — same semantics, test-grade
    speed."""
    from ..kernels.pallas import megakernel as mk

    if cfg.use_megakernel and mk.supported(scene, meta, cfg):
        radiance = mk.path_trace_pixels_pallas(
            rand_state, view_matrix, px, py, scene, meta, cfg,
            interpret=jax.default_backend() != "tpu")
        return rand_state, radiance

    n = px.shape[0]
    # Varying zero for scan-carry inits under shard_map (see
    # path_tracer.trace for the full explanation).
    vzero3 = ((rand_state & jnp.uint32(0)).astype(jnp.float32)[:, None]
              + jnp.zeros((3,), jnp.float32))

    if cfg.stratify:
        # sqrt(spp) x sqrt(spp) stratified grid; like the reference, a
        # non-square spp renders floor(sqrt(spp))^2 actual samples
        # (shootRay.wgsl:11-30).
        grid = int(cfg.samples_per_pixel ** 0.5)
        grid = max(grid, 1)
        offsets = jnp.stack(
            jnp.meshgrid(jnp.arange(grid, dtype=jnp.float32),
                         jnp.arange(grid, dtype=jnp.float32),
                         indexing="ij"), axis=-1).reshape(-1, 2)
        recip = 1.0 / grid

        def sample(carry, off):
            rs, acc = carry
            rs, ray = camera_rays(rs, view_matrix, px, py, cfg,
                                  sub_offset=(off[0], off[1]),
                                  sub_scale=recip)
            rs, radiance = trace(rs, ray, scene, meta, cfg)
            return (rs, acc + radiance), None

        (rand_state, total), _ = jax.lax.scan(
            sample, (rand_state, vzero3), offsets)
        return rand_state, total / (grid * grid)

    def sample(carry, _):
        rs, acc = carry
        rs, ray = camera_rays(rs, view_matrix, px, py, cfg)
        rs, radiance = trace(rs, ray, scene, meta, cfg)
        return (rs, acc + radiance), None

    (rand_state, total), _ = jax.lax.scan(
        sample, (rand_state, vzero3), None,
        length=cfg.samples_per_pixel)
    return rand_state, total / cfg.samples_per_pixel


@partial(jax.jit, static_argnames=("meta", "cfg"), donate_argnames=("framebuffer",))
def render_frame(framebuffer, frame_num, reset, view_matrix,
                 scene: SceneData, meta: SceneMeta, cfg: RenderConfig):
    """One progressive frame — the compute-pass dispatch equivalent
    (``renderer.js:187-188`` + ``shaders/main.wgsl``).

    Args:
      framebuffer: [H*W, 3] accumulated radiance (donated).
      frame_num: traced int32 — RNG decorrelation across frames
        (``main.wgsl:16``) and accumulation divisor.
      reset: traced bool — overwrite instead of accumulate.
      view_matrix: [4, 4] camera matrix (the frame's only "uniform upload",
        ``renderer.js:183-184``).
    Returns the new framebuffer.
    """
    n = cfg.width * cfg.height
    pix = jnp.arange(n, dtype=jnp.uint32)
    px = (pix % jnp.uint32(cfg.width)).astype(jnp.int32)
    py = (pix // jnp.uint32(cfg.width)).astype(jnp.int32)
    rand_state = rng.seed(pix, frame_num)
    _, radiance = path_trace_pixels(rand_state, view_matrix, px, py,
                                    scene, meta, cfg)
    return film.accumulate(framebuffer, radiance, reset)
