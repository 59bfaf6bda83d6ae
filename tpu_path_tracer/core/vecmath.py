"""Vector math over trailing-3 axes.

All functions operate on arrays shaped ``[..., 3]`` so the same code path is
used for a single vector, a ray batch ``[N, 3]``, or a tiled broadcast
``[N, P, 3]``.  This is the TPU-native replacement for the WGSL ``vec3f``
helpers scattered through ``shaders/common.wgsl`` / ``importanceSampling.wgsl``
— one fused VPU expression per batch instead of per-thread scalar ops.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

# Module-level helper constants are NumPy (HLO literals), never jnp (device
# buffers) — see core/rng.py for why this matters on this runtime.
_AXIS_Y = np.asarray([0.0, 1.0, 0.0], np.float32)
_AXIS_X = np.asarray([1.0, 0.0, 0.0], np.float32)


def dot(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Batched dot product over the trailing axis; keeps no dims."""
    return jnp.sum(a * b, axis=-1)


def safe_sqrt(x: jnp.ndarray) -> jnp.ndarray:
    """``sqrt(max(x, 0))`` with a NaN-free reverse-mode gradient.

    ``sqrt`` has an infinite derivative at 0, and under reverse-mode AD an
    ``inf * 0`` from a clamped/unselected branch poisons *parameter*
    cotangents with NaN (e.g. ``eta`` gradients through the glass refract
    math on all-diffuse scenes).  The double-``where`` keeps the forward
    value bit-identical and zeroes the gradient at ``x <= 0``.
    """
    pos = x > 0.0
    return jnp.where(pos, jnp.sqrt(jnp.where(pos, x, 1.0)), 0.0)


def length(v: jnp.ndarray) -> jnp.ndarray:
    return jnp.sqrt(jnp.maximum(dot(v, v), 0.0))


def normalize(v: jnp.ndarray, eps: float = 1e-20) -> jnp.ndarray:
    """Safe normalize (rsqrt of clamped squared length)."""
    sq = jnp.maximum(dot(v, v), eps)
    return v * jnp.reciprocal(jnp.sqrt(sq))[..., None]


def cross(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return jnp.cross(a, b)


def reflect(d: jnp.ndarray, n: jnp.ndarray) -> jnp.ndarray:
    """Mirror reflection, WGSL ``reflect`` semantics (d - 2*dot(d,n)*n)."""
    return d - 2.0 * dot(d, n)[..., None] * n


def refract(uv: jnp.ndarray, n: jnp.ndarray, eta_ratio: jnp.ndarray) -> jnp.ndarray:
    """WGSL ``refract`` semantics used by the glass BSDF
    (``shaders/scatterRay.wgsl:60``).  ``uv`` must be unit length; ``n`` unit
    normal; ``eta_ratio`` = eta_incident / eta_transmitted, broadcast scalar or
    ``[...]``."""
    eta_ratio = jnp.asarray(eta_ratio)[..., None] if jnp.ndim(eta_ratio) else eta_ratio
    cos_theta = jnp.minimum(dot(-uv, n), 1.0)[..., None]
    r_out_perp = eta_ratio * (uv + cos_theta * n)
    r_out_parallel = -safe_sqrt(
        1.0 - dot(r_out_perp, r_out_perp))[..., None] * n
    return r_out_perp + r_out_parallel


def mix(a: jnp.ndarray, b: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """WGSL ``mix``: a*(1-t) + b*t (t broadcast over trailing axis if scalar-per-lane)."""
    return a + (b - a) * t


def onb_from_w(w: jnp.ndarray):
    """Orthonormal basis from a (not necessarily unit) ``w`` vector.

    Matches ``onb_build_from_w`` (``shaders/importanceSampling.wgsl:60-67``):
    pick helper axis ``(0,1,0)`` when ``|w.x| > 0.9`` else ``(1,0,0)``;
    v = normalize(cross(w, a)); u = cross(w, v).  Returns (u, v, unit_w).
    """
    unit_w = normalize(w)
    cond = (jnp.abs(unit_w[..., 0]) > 0.9)[..., None]
    a = jnp.where(cond, _AXIS_Y, _AXIS_X)
    v = normalize(cross(unit_w, a))
    u = cross(unit_w, v)
    return u, v, unit_w


def onb_local(u, v, w, a):
    """``onb_get_local`` (``importanceSampling.wgsl:69-71``): u*a.x + v*a.y + w*a.z."""
    return u * a[..., 0:1] + v * a[..., 1:2] + w * a[..., 2:3]
