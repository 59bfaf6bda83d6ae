"""Device-side scene and ray data structures.

The reference defines an implicit CPU/GPU ABI: JS-side packers emit flat
``Float32Array`` records (``lib/primitives/sphere.js:25-30``,
``quad.js:21-36``, ``triangle.js:42-52``, ``mesh.js:58-63``, materials
``lib/scene.js:265-271``, BVH nodes ``lib/BVH/bvhBuilder.js:45-49``) that must
match the WGSL structs (``shaders/header.wgsl:53-117``) field-for-field,
padding lanes included.  The TPU-native replacement is a typed struct-of-arrays
pytree: each field is its own dense array with an explicit dtype, so XLA lays
out/fuses freely, sharding annotations attach per-field, and there is no
padding-lane bookkeeping to get wrong.

All NamedTuples here are automatically JAX pytrees (jit/grad/shard-transparent).

Design deviation from the reference (documented): triangles are baked to
*world space* at scene build time (vertices through the mesh model matrix,
normals through its inverse-transpose).  The reference keeps object-space
triangles and transforms each ray per intersection test
(``shaders/common.wgsl:194-197``) — but it already builds its BVH over
world-space triangle bounds (``lib/primitives/triangle.js:27-39``), so the two
formulations are mathematically identical; baking removes a per-hit 4x4 gather
and multiply from the hot loop, which matters on TPU where gathers are the
bottleneck.  Object-space data is retained host-side in the SceneBuilder for
transform edits/differentiation.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional

import jax.numpy as jnp


class Ray(NamedTuple):
    """A batch of rays — SoA equivalent of WGSL ``Ray`` (header.wgsl:48-51)."""
    origin: jnp.ndarray  # [N, 3] f32
    dir: jnp.ndarray     # [N, 3] f32


class Materials(NamedTuple):
    """SoA of WGSL ``Material`` (header.wgsl:53-61) minus padding lanes."""
    color: jnp.ndarray              # [M, 3] f32 — diffuse color
    specular_color: jnp.ndarray     # [M, 3] f32
    emission: jnp.ndarray           # [M, 3] f32
    specular_strength: jnp.ndarray  # [M] f32 — percentSpecular
    roughness: jnp.ndarray          # [M] f32 (stores -1/density for ISOTROPIC,
    #                                          see lib/scene.js:46-76)
    eta: jnp.ndarray                # [M] f32 — refractive index
    mtype: jnp.ndarray              # [M] i32 — LAMBERTIAN/MIRROR/GLASS/ISOTROPIC

    @property
    def count(self) -> int:
        return self.color.shape[0]


class Spheres(NamedTuple):
    """SoA of WGSL ``Sphere`` (header.wgsl:68-74)."""
    center: jnp.ndarray       # [S, 3] f32
    radius: jnp.ndarray       # [S] f32
    material_id: jnp.ndarray  # [S] i32

    @property
    def count(self) -> int:
        return self.center.shape[0]


class Quads(NamedTuple):
    """SoA of WGSL ``Quad`` (header.wgsl:76-86).  ``normal``/``d``/``w`` are
    precomputed on host exactly as ``lib/primitives/quad.js:21-36``."""
    q: jnp.ndarray            # [Q, 3] f32 — corner point
    u: jnp.ndarray            # [Q, 3] f32 — edge 1
    v: jnp.ndarray            # [Q, 3] f32 — edge 2
    normal: jnp.ndarray       # [Q, 3] f32 — normalize(cross(u, v))
    d: jnp.ndarray            # [Q] f32 — plane offset, dot(normal, q)
    w: jnp.ndarray            # [Q, 3] f32 — n / dot(n, n)
    material_id: jnp.ndarray  # [Q] i32

    @property
    def count(self) -> int:
        return self.q.shape[0]


class Triangles(NamedTuple):
    """SoA of WGSL ``Triangle`` (header.wgsl:88-98), baked to world space
    (see module docstring).  ``material_id`` is pre-resolved from the owning
    mesh (``header.wgsl:100-105``, ``common.wgsl:239``)."""
    a: jnp.ndarray            # [T, 3] f32
    b: jnp.ndarray            # [T, 3] f32
    c: jnp.ndarray            # [T, 3] f32
    na: jnp.ndarray           # [T, 3] f32 — per-corner shading normals
    nb: jnp.ndarray           # [T, 3] f32
    nc: jnp.ndarray           # [T, 3] f32
    material_id: jnp.ndarray  # [T] i32

    @property
    def count(self) -> int:
        return self.a.shape[0]


class FlatBVH(NamedTuple):
    """Flattened BVH in DFS-preorder — SoA of the reference's 12-float node
    (``lib/BVH/bvhBuilder.js:45-49``, WGSL ``AABB`` header.wgsl:107-117).

    DFS-preorder invariant: an interior node's left child is ``i + 1``
    (``bvhBuilder.js:41``); a leaf's DFS successor ``i + 1`` equals its miss
    link.  So the stackless traversal rule is uniform:
    ``next = i + 1 if aabb_hit else miss[i]`` (skip-pointer layout,
    ``lib/BVH/bvhNode.js:76-93``).  ``miss == num_nodes`` is the exit
    sentinel (the reference uses null/-1)."""
    mins: jnp.ndarray        # [B, 3] f32
    maxs: jnp.ndarray        # [B, 3] f32
    right: jnp.ndarray       # [B] i32 — right-child index (interior), -1 leaf
    prim_start: jnp.ndarray  # [B] i32 — first triangle (leaf), -1 interior
    prim_count: jnp.ndarray  # [B] i32 — triangle count (leaf), 0 interior
    miss: jnp.ndarray        # [B] i32 — skip pointer; num_nodes = done
    axis: jnp.ndarray        # [B] i32 — split axis (front-to-back ordering)
    # Subtree triangle range [prim_lo, prim_hi): contiguous by construction
    # in DFS preorder (children partition the parent's reordered range).
    # The Pallas tile traversal emits these ranges as dense sweep spans
    # (kernels.pallas.traversal) — no reference equivalent.
    prim_lo: jnp.ndarray     # [B] i32
    prim_hi: jnp.ndarray     # [B] i32

    @property
    def count(self) -> int:
        return self.mins.shape[0]


class SceneData(NamedTuple):
    """Everything the integrator needs on device.  The differentiable scene
    parameters (BASELINE.json north star) are ``materials`` (BSDF params +
    emitter radiance), ``triangles`` vertices, and sphere/quad geometry."""
    materials: Materials
    spheres: Spheres
    quads: Quads
    triangles: Triangles
    bvh: Optional[FlatBVH]
    # The reference picks the FIRST emissive quad as "the light"
    # (get_lights, shaders/common.wgsl:258-269); index into quads, or -1.
    light_index: jnp.ndarray  # [] i32


@dataclasses.dataclass(frozen=True)
class SceneMeta:
    """Static (hashable, jit-static) facts about a scene that select code
    paths at trace time.  The reference resolves these per-thread at runtime
    (e.g. the solid-vs-volume material branch at ``shaders/hitRay.wgsl:8-9``);
    under XLA they are compile-time specialization knobs."""
    has_volumes: bool = False        # any ISOTROPIC-material sphere present
    traversal: str = "brute"         # "brute" | "bvh" | "none" (no triangles)
    max_leaf: int = 1                # static leaf-primitive bound of the BVH
    has_light: bool = False          # an emissive quad exists (NEE possible)


class HitRecord(NamedTuple):
    """SoA of WGSL ``HitRecord`` (header.wgsl:119-125) over a ray batch, plus
    the discrete hit identity (prim type/index) that the differentiable
    re-shading path keys on."""
    hit: jnp.ndarray          # [N] bool
    t: jnp.ndarray            # [N] f32
    p: jnp.ndarray            # [N, 3] f32
    normal: jnp.ndarray       # [N, 3] f32 (front-face flipped)
    front_face: jnp.ndarray   # [N] bool
    material_id: jnp.ndarray  # [N] i32 (0 when no hit — material fields are
    #                                    masked by ``hit`` downstream)
