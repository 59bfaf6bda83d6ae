"""Render configuration.

The reference splits configuration between a host-side ``renderParams`` object
(``index.js:27-34``) and compile-time WGSL constants (``shaders/header.wgsl:1-13``:
``NUM_SAMPLES``, ``MAX_BOUNCES``, ``STRATIFY``, ``IMPORTANCE_SAMPLING``,
``STACK_SIZE``).  Changing the WGSL constants requires recompiling the shader
module; the TPU-native equivalent is a frozen (hashable) dataclass passed as a
*static* argument to ``jax.jit`` — changing a field triggers a retrace/recompile
with identical semantics.
"""

from __future__ import annotations

import dataclasses

# Material type enum — shaders/header.wgsl:4-8.
LAMBERTIAN = 0
MIRROR = 1
GLASS = 2
ISOTROPIC = 3
ANISOTROPIC = 4  # declared but unused in the reference

# Numeric guards — shaders/header.wgsl:1-3, :37-38.
PI = 3.1415926535897932385
MIN_FLOAT = 0.0001
MAX_FLOAT = 999999999.999
RAY_TMIN = 0.000001


@dataclasses.dataclass(frozen=True)
class RenderConfig:
    """Static render parameters (jit-static; hashable).

    Defaults mirror the reference: 1 spp/frame, up to 100 bounces, no
    stratification, no NEE/MIS (``shaders/header.wgsl:9-12``), cyan background
    (``shaders/traceRay.wgsl:8``), 60 degree vertical FOV
    (``shaders/main.wgsl:7``), Russian roulette after bounce 2
    (``shaders/traceRay.wgsl:70-79``).
    """

    width: int = 900            # index.html:17
    height: int = 600           # index.html:18
    samples_per_pixel: int = 1  # NUM_SAMPLES, header.wgsl:9
    max_bounces: int = 100      # MAX_BOUNCES, header.wgsl:10
    stratify: bool = False      # STRATIFY, header.wgsl:11
    importance_sampling: bool = False  # IMPORTANCE_SAMPLING, header.wgsl:12
    light_sample_prob: float = 0.2     # traceRay.wgsl:43,49
    rr_start_bounce: int = 3           # "i > 2" — traceRay.wgsl:71
    background: tuple = (0.0, 1.0, 1.0)  # traceRay.wgsl:8
    fov_degrees: float = 60.0          # main.wgsl:7
    t_min: float = RAY_TMIN            # header.wgsl:37
    t_max: float = MAX_FLOAT           # header.wgsl:38
    # TPU-specific knobs (no reference equivalent):
    #   ray batch padding multiple — keeps lanes aligned to the 8x128 VPU tile.
    lane_multiple: int = 1024
    # Use the Pallas chunk-sweep kernel for BVH triangle hits (gated on the
    # TPU backend at trace time; falls back to jnp elsewhere).
    use_pallas: bool = True
    # Route whole-frame tracing through the fused Pallas megakernel when the
    # scene supports it (analytic sphere/quad scenes); falls back to the
    # wavefront integrator elsewhere.  The megakernel is differentiable via
    # a custom-VJP backward kernel that statically unrolls the bounce chain
    # (kernels/pallas/megakernel.py) — taking gradients requires
    # max_bounces * samples_per_pixel <= MAX_UNROLL_BOUNCES (64); deeper
    # configs should keep the wavefront's rematerialized scan.
    use_megakernel: bool = False
    # Rematerialize each bounce of the wavefront scan in the backward sweep
    # (jax.checkpoint) instead of saving all per-bounce state to HBM.
    remat_bounces: bool = True

    def replace(self, **kw) -> "RenderConfig":
        return dataclasses.replace(self, **kw)
