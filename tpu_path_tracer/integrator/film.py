"""Progressive accumulation + display transform.

Accumulation semantics of the compute pass (``shaders/main.wgsl:22-27``):
add this frame's 1-spp estimate into the framebuffer, or overwrite when the
reset flag is up (camera moved, ``renderer.js:174-180``).  Display semantics
of the blit fragment shader (``shaders/fragment.js:22-36``): mean = buffer /
frameNum, ACES filmic curve (``common.wgsl:273-282``), gamma 1/2.2.  The
reference's display pass also zeroes the framebuffer as a side effect on
reset — here reset is handled purely in ``accumulate`` (functional, no
cross-pass side channel).
"""

from __future__ import annotations

import jax.numpy as jnp


def accumulate(framebuffer, frame_radiance, reset):
    """``framebuffer``: [N, 3]; ``frame_radiance``: [N, 3]; ``reset``: scalar
    bool (traced).  Donate the framebuffer under jit for in-place update —
    the functional analogue of the read_write storage binding."""
    return jnp.where(reset, frame_radiance, framebuffer + frame_radiance)


def aces_approx(v):
    """ACES filmic tone map — ``common.wgsl:273-282`` (Narkowicz fit),
    including the 0.6 pre-exposure."""
    v1 = v * 0.6
    a, b, c, d, e = 2.51, 0.03, 2.43, 0.59, 0.14
    return jnp.clip((v1 * (a * v1 + b)) / (v1 * (c * v1 + d) + e), 0.0, 1.0)


def display_transform(framebuffer, frame_num):
    """[N, 3] accumulated radiance -> [N, 3] display-ready in [0, 1]
    (``fragment.js:25-29``)."""
    mean = framebuffer / jnp.maximum(frame_num, 1).astype(jnp.float32)
    return aces_approx(mean) ** (1.0 / 2.2)


def to_uint8(img01):
    return jnp.clip(jnp.round(img01 * 255.0), 0, 255).astype(jnp.uint8)
