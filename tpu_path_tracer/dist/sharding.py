"""Device-mesh setup and ray-axis sharding.

The reference's only parallelism is single-GPU SPMD over pixels
(``workgroup_size(64)``, ``(W*H)/64+1`` workgroups — ``shaders/main.wgsl:1``,
``renderer.js:187-188``).  The TPU-native scale-out axis is the same one,
lifted across chips: the pixel/ray dimension is sharded over a 1-D
``jax.sharding.Mesh`` ("rays" axis), the scene/BVH is replicated (it is small
relative to HBM and every ray needs random access), and gradients of scene
parameters are summed across shards — XLA inserts the ``psum`` when the
parameter sharding is replicated, riding ICI (SURVEY.md §5, BASELINE north
star).  Multi-host: the same mesh spans hosts after
``jax.distributed.initialize`` — no code change.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

RAY_AXIS = "rays"


def init_distributed(coordinator_address: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> int:
    """Multi-host bootstrap: ``jax.distributed.initialize``, env-driven.

    Call once per process before any device use (the ``cli.py --multihost``
    flag routes here).  Arguments default to the standard JAX env vars
    (``JAX_COORDINATOR_ADDRESS``/``JAX_NUM_PROCESSES``/``JAX_PROCESS_ID``);
    on TPU pod slices all three may be omitted and are auto-detected from the
    TPU metadata server.  After this returns, ``jax.devices()`` spans every
    host and ``make_mesh()`` builds the global mesh — no other code changes
    (the shard_map specs in this package are host-count agnostic).

    Returns this process's index.  Safe to call when already initialized or
    single-process (returns 0).
    """
    import os

    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS")
    if num_processes is None and "JAX_NUM_PROCESSES" in os.environ:
        num_processes = int(os.environ["JAX_NUM_PROCESSES"])
    if process_id is None and "JAX_PROCESS_ID" in os.environ:
        process_id = int(os.environ["JAX_PROCESS_ID"])
    if coordinator_address is None and num_processes is None:
        # Single explicit process or TPU-pod auto-detection.
        try:
            jax.distributed.initialize()
        except Exception:
            return 0  # single-host (no pod metadata) — nothing to do
        return jax.process_index()
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)
    return jax.process_index()


def make_mesh(devices: Optional[Sequence] = None,
              n_devices: Optional[int] = None) -> Mesh:
    """1-D mesh over the ray axis.  ``n_devices`` takes the first N visible
    devices (used by the multichip dry run on virtual CPU devices)."""
    if devices is None:
        devices = jax.devices()
        if n_devices is not None:
            devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (RAY_AXIS,))


def ray_sharding(mesh: Mesh) -> NamedSharding:
    """Leading axis sharded across devices (framebuffers, ray batches)."""
    return NamedSharding(mesh, P(RAY_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    """Fully replicated (scene arrays, BVH, camera matrix)."""
    return NamedSharding(mesh, P())


def shard_scene(scene, mesh: Mesh):
    """Replicate every scene leaf on the mesh."""
    rep = replicated(mesh)
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, rep), scene)


def pad_to_multiple(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m
