"""Command-line interface.

The reference runs only as a browser page (``index.html`` → ``index.js``);
headless TPU rendering needs a CLI instead (SURVEY.md §7: ``render``,
``bench``, ``grad-check``).  ``render`` is the ``start()``/
``renderAnimation()`` analogue; ``train`` exercises the differentiable path
(inverse rendering); ``grad-check`` runs the finite-difference validation
from BASELINE.json configs[3].
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def _build_scene(args):
    from . import builtin
    from .scene.builder import SceneBuilder
    from .scene.objreader import load_obj
    from .core.config import LAMBERTIAN

    if args.scene == "cornell":
        scene, meta, _ = builtin.cornell_box(bvh=args.bvh)
        eye = [0.0, 0.0, 3.2]
    elif args.scene == "reference":
        scene, meta, _ = builtin.reference_scene(bvh=args.bvh)
        eye = [0.5, 0.0, 2.5]  # index.js:39
    else:  # an OBJ path
        b = SceneBuilder()
        white = b.add_material("white", LAMBERTIAN, [0.73, 0.73, 0.73])
        light = b.add_material("light", LAMBERTIAN, [0, 0, 0],
                               emission=(15, 15, 15))
        b.add_quad([-0.4, 0.999, -0.4], [0.8, 0, 0], [0, 0, 0.8], light)
        b.add_quad([-1, -1, -1], [2, 0, 0], [0, 2, 0], white)
        b.add_quad([-1, 1, -1], [2, 0, 0], [0, 0, 2], white)
        b.add_quad([1, -1, -1], [-2, 0, 0], [0, 0, 2], white)
        b.add_mesh(load_obj(args.scene), white)
        scene, meta = b.build(bvh=args.bvh)
        eye = [0.0, 0.0, 3.2]
    return scene, meta, eye


def _add_common(p):
    p.add_argument("--scene", default="cornell",
                   help="cornell | reference | path/to/mesh.obj")
    p.add_argument("--width", type=int, default=900)    # index.html:17
    p.add_argument("--height", type=int, default=600)   # index.html:18
    p.add_argument("--bounces", type=int, default=100)  # header.wgsl:10
    p.add_argument("--spp", type=int, default=1)
    p.add_argument("--frames", type=int, default=64)
    p.add_argument("--bvh", default="auto",
                   choices=["auto", "median", "sah", "lbvh", "none"])
    p.add_argument("--importance-sampling", action="store_true")
    p.add_argument("--stratify", action="store_true")
    p.add_argument("--eye", type=float, nargs=3, default=None)
    p.add_argument("--devices", type=int, default=0,
                   help="shard rays over this many devices (0 = single)")
    p.add_argument("--multihost", action="store_true",
                   help="bootstrap jax.distributed before device use so "
                        "the mesh spans every host (JAX_COORDINATOR_"
                        "ADDRESS/JAX_NUM_PROCESSES/JAX_PROCESS_ID env "
                        "vars, or TPU-pod auto-detection)")
    p.add_argument("--megakernel", action="store_true",
                   help="route tracing through the fused Pallas "
                        "megakernel (analytic scenes + small meshes)")


def _make_cfg(args):
    from .core.config import RenderConfig
    return RenderConfig(width=args.width, height=args.height,
                        samples_per_pixel=args.spp, max_bounces=args.bounces,
                        importance_sampling=args.importance_sampling,
                        stratify=args.stratify,
                        use_megakernel=getattr(args, "megakernel", False))


def _maybe_multihost(args):
    """Bootstrap multi-host execution BEFORE any device use (the mesh then
    spans every host; the shard_map specs are host-count agnostic)."""
    if getattr(args, "multihost", False):
        from .dist.sharding import init_distributed
        idx = init_distributed()
        print(f"multihost: process {idx} of "
              f"{__import__('jax').process_count()}")


def cmd_render(args):
    from .core.camera import Camera
    from .renderer import Renderer

    _maybe_multihost(args)
    scene, meta, eye = _build_scene(args)
    cfg = _make_cfg(args)
    cam = Camera(eye=args.eye or eye, center=[0, 0, 0])
    mesh = None
    if args.devices:
        from .dist.sharding import make_mesh
        mesh = make_mesh(n_devices=args.devices)
    r = Renderer(scene, meta, cfg, cam, mesh=mesh,
                 log_performance=args.log_performance,
                 log_count_of_samples=args.log_samples)
    if args.resume:
        r.load_checkpoint(args.resume)
        print(f"resumed at frame {r.frame_num}")
    if args.interactive:
        from .preview import run_preview
        run_preview(r, max_fps=args.max_fps)
        r.save_png(args.output)
        print(f"wrote {args.output}")
        return
    t0 = time.time()
    r.render_animation(args.frames, checkpoint_path=args.checkpoint,
                       checkpoint_every=args.checkpoint_every)
    import jax
    jax.block_until_ready(r.framebuffer)
    dt = time.time() - t0
    n_rays = args.frames * cfg.width * cfg.height * cfg.samples_per_pixel
    print(f"{args.frames} frames ({r.frame_num} accumulated) in {dt:.2f}s "
          f"= {n_rays / dt / 1e6:.1f} Mray/s")
    r.save_png(args.output)
    print(f"wrote {args.output}")
    if args.checkpoint:
        r.save_checkpoint(args.checkpoint)
        print(f"checkpoint -> {args.checkpoint}")


def cmd_bench(args):
    import bench as bench_mod  # repo-root harness
    bench_mod.main()


def cmd_grad_check(args):
    """Finite differences vs reverse-mode on emitter radiance, BSDF albedo,
    and sphere geometry (BASELINE.json configs[3])."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from .core import rng
    from .core.camera import Camera
    from .core.types import Ray
    from .diff.params import apply_params, extract_params
    from .integrator.render import path_trace_pixels

    scene, meta, eye = _build_scene(args)
    cfg = _make_cfg(args).replace(width=64, height=64,
                                  max_bounces=min(args.bounces, 4))
    cam = Camera(eye=args.eye or eye, center=[0, 0, 0])
    view = jnp.asarray(cam.view_matrix)
    n = cfg.width * cfg.height
    pix = jnp.arange(n, dtype=jnp.uint32)
    px = (pix % jnp.uint32(cfg.width)).astype(jnp.int32)
    py = (pix // jnp.uint32(cfg.width)).astype(jnp.int32)

    base = extract_params(scene, groups=("emission", "bsdf"))

    def loss(scale_e, scale_c, scene, pix, px, py, view):
        p = dict(base)
        p["emission"] = base["emission"] * scale_e
        p["color"] = base["color"] * scale_c
        s = apply_params(scene, p)
        rs = rng.seed(pix, 7)
        _, radiance = path_trace_pixels(rs, view, px, py, s, meta, cfg)
        return jnp.mean(radiance)

    f = jax.jit(loss)
    args_t = (scene, pix, px, py, view)
    g_e, g_c = jax.jit(jax.grad(loss, argnums=(0, 1)))(1.0, 1.0, *args_t)
    eps = 1e-3
    fd_e = (f(1 + eps, 1.0, *args_t) - f(1 - eps, 1.0, *args_t)) / (2 * eps)
    fd_c = (f(1.0, 1 + eps, *args_t) - f(1.0, 1 - eps, *args_t)) / (2 * eps)
    rows = [
        ("emission", float(g_e), float(fd_e)),
        ("albedo", float(g_c), float(fd_c)),
    ]
    ok = True
    for name, ad, fd in rows:
        rel = abs(ad - fd) / max(abs(fd), 1e-8)
        ok &= rel < 0.02
        print(f"{name:10s} autodiff={ad:+.6f} finite-diff={fd:+.6f} "
              f"rel-err={rel:.2e}")
    print("grad-check:", "PASS" if ok else "FAIL")
    sys.exit(0 if ok else 1)


def cmd_train(args):
    """Inverse rendering: recover emitter radiance + albedos from a target
    image rendered with known parameters."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax
    from .core import rng
    from .core.camera import Camera
    from .diff.params import apply_params, extract_params
    from .dist.render_dist import make_train_step, padded_pixels
    from .dist.sharding import make_mesh, ray_sharding, shard_scene

    _maybe_multihost(args)
    scene, meta, eye = _build_scene(args)
    cfg = _make_cfg(args).replace(width=64, height=64,
                                  max_bounces=min(args.bounces, 4))
    cam = Camera(eye=args.eye or eye, center=[0, 0, 0])
    view = jnp.asarray(cam.view_matrix)
    mesh = make_mesh(n_devices=args.devices or None)
    scene = shard_scene(scene, mesh)
    n_pix = padded_pixels(cfg, mesh)

    # Target: the true scene rendered at a fixed seed.
    from .dist.render_dist import make_sharded_frame_fn
    frame = make_sharded_frame_fn(mesh, meta, cfg)
    target = jax.device_put(jnp.zeros((n_pix, 3), jnp.float32),
                            ray_sharding(mesh))
    target = frame(target, jnp.int32(1), jnp.bool_(True), view, scene)

    # Perturb and recover.  Vertex training goes through apply_params'
    # automatic BVH refit (diff/params.py), so meshes stay traversable as
    # geometry moves.
    groups = tuple(g.strip() for g in args.params.split(",") if g.strip())
    true_params = extract_params(scene, groups=groups)

    def perturb(path, x):
        name = path[-1].key if hasattr(path[-1], "key") else str(path[-1])
        if name.startswith(("tri_", "sphere_", "quad_")):
            # Geometry: small additive offset, not a scale (x0.5 would
            # collapse the mesh through walls).
            return x + 0.05
        return x * 0.5

    params = jax.tree_util.tree_map_with_path(perturb, true_params)
    optimizer = optax.adam(args.lr)
    opt_state = optimizer.init(params)
    step = make_train_step(mesh, scene, meta, cfg, apply_params, optimizer)
    for i in range(args.steps):
        params, opt_state, loss = step(params, opt_state, target,
                                       jnp.int32(1), view)
        if (i + 1) % max(args.steps // 10, 1) == 0:
            print(f"step {i+1:4d}  loss {float(loss):.6f}")
    err = jax.tree_util.tree_map(
        lambda a, b: float(jnp.max(jnp.abs(a - b))), params, true_params)
    print("max param error per group:",
          json.dumps({k: round(v, 4) for k, v in err.items()}))


def cmd_info(args):
    import jax
    from . import __version__
    print(f"tpu-path-tracer {__version__}")
    print(f"jax {jax.__version__}, devices: {jax.devices()}")
    from .accel.native import available
    print(f"native (C++) accel: {'available' if available() else 'missing'}")


def main(argv=None):
    p = argparse.ArgumentParser(prog="tpu-path-tracer")
    sub = p.add_subparsers(dest="cmd", required=True)

    pr = sub.add_parser("render", help="progressive render to PNG")
    _add_common(pr)
    pr.add_argument("--output", "-o", default="render.png")
    pr.add_argument("--checkpoint", default=None)
    pr.add_argument("--checkpoint-every", type=int, default=0)
    pr.add_argument("--resume", default=None)
    pr.add_argument("--log-performance", action="store_true")
    pr.add_argument("--log-samples", action="store_true")
    pr.add_argument("--interactive", action="store_true",
                    help="terminal orbit-camera preview (a/d orbit, w/s "
                         "zoom, arrows pan, q quit) — the reference's "
                         "interactive UX over ssh")
    pr.add_argument("--max-fps", type=float, default=0.0)
    pr.set_defaults(fn=cmd_render)

    pb = sub.add_parser("bench", help="run the benchmark harness")
    pb.set_defaults(fn=cmd_bench)

    pg = sub.add_parser("grad-check",
                        help="autodiff vs finite differences")
    _add_common(pg)
    pg.set_defaults(fn=cmd_grad_check)

    pt = sub.add_parser("train", help="inverse-rendering demo")
    _add_common(pt)
    pt.add_argument("--steps", type=int, default=100)
    pt.add_argument("--lr", type=float, default=5e-2)
    pt.add_argument("--params", default="emission,bsdf",
                    help="comma-separated parameter groups to recover: "
                         "emission,bsdf,vertices,spheres,quads")
    pt.set_defaults(fn=cmd_train)

    pi = sub.add_parser("info", help="environment info")
    pi.set_defaults(fn=cmd_info)

    args = p.parse_args(argv)
    args.fn(args)


if __name__ == "__main__":
    main()
