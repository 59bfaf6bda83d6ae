"""Counter-free lane RNG: the reference's PCG hash, vectorized.

The reference seeds one 32-bit PCG state per pixel
(``shaders/main.wgsl:16``: ``randState = pixelIndex + frameNum * 719393``) and
advances it with the PCG output hash (``shaders/common.wgsl:7-12``).  On TPU we
keep a dense ``uint32 [N]`` state array — one state per ray lane — and advance
all lanes with a handful of fused integer VPU ops.  This reproduces the
reference generator bit-exactly per lane, is trivially jit/shard-safe (the
state threads through ``lax.scan``), and costs far less than threading
``jax.random`` keys per sample.

All sampling helpers mirror ``shaders/importanceSampling.wgsl`` /
``common.wgsl`` semantics and return ``(new_state, sample)``.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from .config import PI
from . import vecmath as vm

# NumPy scalars, NOT jnp arrays: module-level jnp constants are 0-d *device*
# buffers that get captured into every jitted caller; on this runtime each
# such capture forces a synchronous host round-trip per dispatch (measured:
# ~26 ms/call).  NumPy scalars inline as HLO literals instead.
_MULT = np.uint32(747796405)
_INC = np.uint32(2891336453)
_XSH = np.uint32(277803737)
_INV_U32_MAX = np.float32(1.0 / 4294967295.0)
_U32_28 = np.uint32(28)
_U32_22 = np.uint32(22)
_U32_4 = np.uint32(4)


def seed(pixel_index: jnp.ndarray, frame_num) -> jnp.ndarray:
    """Per-lane seeding — ``shaders/main.wgsl:16``."""
    return (pixel_index.astype(jnp.uint32)
            + jnp.asarray(frame_num).astype(jnp.uint32) * np.uint32(719393))


def uniform(state: jnp.ndarray):
    """One PCG step per lane; returns (new_state, float32 in [0, 1]).

    Bit-exact port of ``rand2D`` (``shaders/common.wgsl:7-12``): the state is
    advanced first, then the output hash is applied to the *new* state.
    """
    state = state * _MULT + _INC
    word = ((state >> ((state >> _U32_28) + _U32_4)) ^ state) * _XSH
    return state, ((word >> _U32_22) ^ word).astype(jnp.float32) * _INV_U32_MAX


def uniform2(state):
    state, a = uniform(state)
    state, b = uniform(state)
    return state, a, b


def normal(state):
    """Box-Muller — ``randNormalDist`` (``common.wgsl:15-19``)."""
    state, u1 = uniform(state)
    state, u2 = uniform(state)
    theta = 2.0 * PI * u1
    rho = jnp.sqrt(-2.0 * jnp.log(jnp.maximum(u2, 1e-12)))
    return state, rho * jnp.cos(theta)


def uniform_in_unit_sphere(state):
    """``uniform_random_in_unit_sphere`` (``importanceSampling.wgsl:7-16``) —
    actually a uniform direction on the unit sphere (it normalizes)."""
    state, r1 = uniform(state)
    state, r2 = uniform(state)
    phi = r1 * 2.0 * PI
    theta = jnp.arccos(jnp.clip(2.0 * r2 - 1.0, -1.0, 1.0))
    sin_t = jnp.sin(theta)
    d = jnp.stack([sin_t * jnp.cos(phi), sin_t * jnp.sin(phi), jnp.cos(theta)],
                  axis=-1)
    return state, vm.normalize(d)


def in_unit_disk(state):
    """``random_in_unit_disk`` (``importanceSampling.wgsl:18-22``).  Note the
    reference normalizes the 3-vector, yielding points on the unit circle —
    we preserve that behavior."""
    state, r1 = uniform(state)
    state, r2 = uniform(state)
    theta = 2.0 * PI * r1
    r = jnp.sqrt(r2)
    d = jnp.stack([r * jnp.cos(theta), r * jnp.sin(theta), jnp.zeros_like(r)],
                  axis=-1)
    return state, vm.normalize(d)


def cosine_wrt_z(state):
    """Cosine-weighted hemisphere sample about +Z
    (``cosine_sampling_wrt_Z``, ``importanceSampling.wgsl:35-45``)."""
    state, r1 = uniform(state)
    state, r2 = uniform(state)
    phi = 2.0 * PI * r1
    sq = jnp.sqrt(r2)
    d = jnp.stack([jnp.cos(phi) * sq, jnp.sin(phi) * sq,
                   jnp.sqrt(jnp.maximum(1.0 - r2, 0.0))], axis=-1)
    return state, d
