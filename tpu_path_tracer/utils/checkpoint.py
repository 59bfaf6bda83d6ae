"""Checkpoint / resume for progressive renders.

The reference has none: the accumulated framebuffer lives only in GPU memory
and any camera motion discards it (``renderer.js:174-180``); a lost device
restarts the whole app (``webgpu-utils.js:192-198``).  The TPU equivalent
(SURVEY.md §5): progressive accumulation is naturally checkpointable — one
snapshot of ``(framebuffer, frame_num, camera pose)`` makes a render
restartable across preemptions, which is what long multi-host renders need.
NPZ on purpose (single-host render state, no sharded pytrees); orbax would
be the tool if per-shard training state ever needs checkpointing.
"""

from __future__ import annotations

import os
import tempfile
from typing import Optional, Tuple

import numpy as np

from ..core.camera import Camera


def save_checkpoint(path: str, framebuffer, frame_num: int,
                    camera: Optional[Camera] = None) -> None:
    """Atomic snapshot (write tmp + rename, preemption-safe)."""
    payload = {
        "framebuffer": np.asarray(framebuffer),
        "frame_num": np.int64(frame_num),
    }
    if camera is not None:
        payload["eye"] = camera.eye
        payload["center"] = camera.center
        payload["up"] = camera.up
    d = os.path.dirname(os.path.abspath(path)) or "."
    fd, tmp = tempfile.mkstemp(dir=d, suffix=".tmp.npz")
    os.close(fd)
    try:
        np.savez(tmp, **payload)
        os.replace(tmp, path)
    finally:
        if os.path.exists(tmp):
            os.unlink(tmp)


def load_checkpoint(path: str) -> Tuple[np.ndarray, int, Optional[Camera]]:
    """Returns (framebuffer, frame_num, camera-or-None)."""
    with np.load(path) as z:
        fb = z["framebuffer"]
        frame_num = int(z["frame_num"])
        cam = None
        if "eye" in z:
            cam = Camera(eye=z["eye"], center=z["center"], up=z["up"])
    return fb, frame_num, cam
