"""tpu-path-tracer: a TPU-native differentiable Monte Carlo path tracer.

Brand-new JAX/XLA/Pallas framework with the capabilities of the
WebGPU-Path-Tracer reference (see SURVEY.md), re-architected wavefront-style
for TPU hardware.  Public API re-exports below; see README.md.
"""

from .core.camera import Camera
from .core.config import (GLASS, ISOTROPIC, LAMBERTIAN, MIRROR, RenderConfig)
from .core.types import (FlatBVH, HitRecord, Materials, Quads, Ray, SceneData,
                         SceneMeta, Spheres, Triangles)
from .scene.builder import SceneBuilder
from .scene.objreader import MeshData, load_obj, parse_obj
from .scene import builtin, procedural
from .scene.transform import Transform
from .integrator.render import render_frame
from .renderer import Renderer
from .integrator import film

__version__ = "0.1.0"
