"""Renderer orchestration — the ``renderer.js`` equivalent.

Owns the framebuffer, frame counter, camera-motion reset, FPS cap, stats,
periodic perf logging, and checkpoint/resume.  Maps the reference's loop
(``renderer.js:163-215``) onto the jitted frame step:

* per-frame "uniform upload" = passing ``(frame_num, reset, view_matrix)``
  to the jitted step (``renderer.js:173-184``),
* compute+display passes = ``integrator.render.render_frame`` +
  ``film.display_transform`` (``renderer.js:187-191``),
* FPS cap via sleep (``renderer.js:206-209``),
* stats/perf logs behind the same flags as ``renderParams``
  (``index.js:27-34``),
* ``render_single_frame`` — functional here, unlike the reference's
  known-broken version (``renderer.js:219-249``).

Multi-chip: pass a ``jax.sharding.Mesh`` and the renderer shards the
framebuffer over the ray axis via ``dist.render_dist`` transparently.
"""

from __future__ import annotations

import time
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from .core.camera import Camera
from .core.config import RenderConfig
from .core.types import SceneData, SceneMeta
from .integrator import film
from .integrator.render import render_frame as _frame_step
from .utils import checkpoint as ckpt
from .utils.image import write_png
from .utils.profiling import FrameStats


class Renderer:
    def __init__(self, scene: SceneData, meta: SceneMeta, cfg: RenderConfig,
                 camera: Optional[Camera] = None, mesh=None,
                 show_fps: bool = False, max_fps: float = 0.0,
                 log_count_of_samples: bool = False,
                 log_performance: bool = False):
        self.scene = scene
        self.meta = meta
        self.cfg = cfg
        self.camera = camera or Camera(eye=[0.5, 0.0, 2.5])  # index.js:39
        self.mesh = mesh
        self.show_fps = show_fps
        self.max_fps = max_fps          # renderParams.maxFPS, index.js:30
        self.log_count_of_samples = log_count_of_samples
        self.log_performance = log_performance
        self.stats = FrameStats()
        self.frame_num = 0

        if mesh is not None:
            from .dist.render_dist import (make_sharded_frame_fn,
                                           padded_pixels)
            from .dist.sharding import ray_sharding, shard_scene
            self._n_pixels = padded_pixels(cfg, mesh)
            self.scene = shard_scene(scene, mesh)
            self._sharding = ray_sharding(mesh)
            self._step = make_sharded_frame_fn(mesh, meta, cfg)
            self.framebuffer = jax.device_put(
                jnp.zeros((self._n_pixels, 3), jnp.float32), self._sharding)
        else:
            self._n_pixels = cfg.width * cfg.height
            self._step = None
            self.framebuffer = jnp.zeros((self._n_pixels, 3), jnp.float32)

    # -- core stepping -------------------------------------------------
    def step(self, reset: Optional[bool] = None):
        """Advance one progressive frame.  ``reset`` defaults to the camera
        motion flags, like renderer.js:174-180."""
        if reset is None:
            reset = self.camera.consume_motion_flags()
        if reset:
            self.frame_num = 0
        self.frame_num += 1
        view = jnp.asarray(self.camera.view_matrix)
        args = (self.framebuffer, jnp.int32(self.frame_num),
                jnp.bool_(reset), view, self.scene)
        if self._step is not None:
            self.framebuffer = self._step(*args)
        else:
            self.framebuffer = _frame_step(*args, self.meta, self.cfg)
        if self.log_count_of_samples:  # renderer.js:169-170
            print(f"Total Samples: "
                  f"{self.frame_num * self.cfg.samples_per_pixel}")
        return self.framebuffer

    def render_animation(self, num_frames: int,
                         checkpoint_path: Optional[str] = None,
                         checkpoint_every: int = 0):
        """The renderAnimation loop (renderer.js:163-215) for headless use:
        fixed frame budget instead of requestAnimationFrame recursion."""
        rays = self._n_pixels * self.cfg.samples_per_pixel
        for i in range(num_frames):
            self.stats.begin()
            self.step()
            if self.show_fps or self.log_performance:
                jax.block_until_ready(self.framebuffer)
            self.stats.end()
            if self.log_performance and self.stats.frames % 100 == 0:
                print(self.stats.report(rays))  # renderer.js:197-204
            if (checkpoint_every and checkpoint_path
                    and (i + 1) % checkpoint_every == 0):
                self.save_checkpoint(checkpoint_path)
            if self.max_fps > 0:  # renderer.js:206-209
                budget = 1.0 / self.max_fps
                elapsed = self.stats.times[-1] if self.stats.times else 0.0
                if elapsed < budget:
                    time.sleep(budget - elapsed)
        return self.framebuffer

    def render_single_frame(self, spp: Optional[int] = None):
        """One converged frame at high spp in a single call (the feature
        renderer.js:219-249 ships but marks not working)."""
        if spp is not None and spp != self.cfg.samples_per_pixel:
            self.cfg = self.cfg.replace(samples_per_pixel=spp)
            if self._step is not None:
                from .dist.render_dist import make_sharded_frame_fn
                self._step = make_sharded_frame_fn(self.mesh, self.meta,
                                                   self.cfg)
        self.frame_num = 0
        return self.step(reset=True)

    # -- output --------------------------------------------------------
    def display(self) -> np.ndarray:
        """Tone-mapped uint8 image [H, W, 3] (fragment.js:22-36)."""
        img = film.display_transform(self.framebuffer, self.frame_num)
        img = np.asarray(film.to_uint8(img))
        n = self.cfg.width * self.cfg.height
        return img[:n].reshape(self.cfg.height, self.cfg.width, 3)

    def save_png(self, path: str):
        write_png(path, self.display())

    # -- checkpoint / resume -------------------------------------------
    def save_checkpoint(self, path: str):
        ckpt.save_checkpoint(path, self.framebuffer, self.frame_num,
                             self.camera)

    def load_checkpoint(self, path: str):
        fb, frame_num, cam = ckpt.load_checkpoint(path)
        assert fb.shape[0] == self._n_pixels, (
            f"checkpoint framebuffer {fb.shape} does not match "
            f"{self._n_pixels} pixels")
        fb = jnp.asarray(fb)
        if self.mesh is not None:
            fb = jax.device_put(fb, self._sharding)
        self.framebuffer = fb
        self.frame_num = frame_num
        if cam is not None:
            self.camera = cam
