"""Scene construction: host-side DSL -> device SoA arrays.

The TPU-native replacement for the reference's ``Scene`` class
(``lib/scene.js``): materials registered by name into a packed table
(``lib/scene.js:261-273``), spheres/quads/meshes accumulated with ids, meshes
exploded to triangles with per-mesh transforms (``lib/scene.js:164-251``,
``lib/primitives/mesh.js:19-50``), a BVH built over the triangles
(``lib/scene.js:253-259``), and everything flattened for the device
(``lib/scene.js:304-310``).  Instead of 16-float padded records matching WGSL
struct layouts, ``build()`` emits the dtype-checked SoA pytree of
``core.types`` plus a static ``SceneMeta`` describing which trace-time code
paths the scene needs.
"""

from __future__ import annotations

import dataclasses
import os
import time
from typing import List, Optional

import numpy as np
import jax.numpy as jnp

from ..accel import bvh as bvh_mod
from ..core.config import ISOTROPIC
from ..core.types import (FlatBVH, Materials, Quads, SceneData, SceneMeta,
                          Spheres, Triangles)
from .objreader import MeshData
from .transform import Transform

# Auto traversal threshold: below this triangle count the dense [N, T] brute
# sweep beats gather-based traversal on TPU (no BVH build needed either).
BRUTE_FORCE_MAX_TRIS = 256


@dataclasses.dataclass
class _MeshEntry:
    data: MeshData
    material: int
    transform: Transform


class SceneBuilder:
    """Programmatic scene description, mirroring the reference's builder
    methods but declarative and host-side only."""

    def __init__(self):
        self._mat = {
            "color": [], "specular_color": [], "emission": [],
            "specular_strength": [], "roughness": [], "eta": [], "mtype": [],
        }
        self.material_names = {}
        self._spheres: List = []
        self._quads: List = []
        self._meshes: List[_MeshEntry] = []

    # -- materials -----------------------------------------------------
    def add_material(self, name, material_type, color,
                     specular_color=(0.0, 0.0, 0.0),
                     emission=(0.0, 0.0, 0.0),
                     specular_strength=0.0, roughness=0.0,
                     eta=0.0) -> int:
        """Same signature order as ``Scene.add_material``
        (``lib/scene.js:261``); returns the material id."""
        mat_id = len(self._mat["mtype"])
        self.material_names[name] = mat_id
        self._mat["color"].append(tuple(color))
        self._mat["specular_color"].append(tuple(specular_color))
        self._mat["emission"].append(tuple(emission))
        self._mat["specular_strength"].append(float(specular_strength))
        self._mat["roughness"].append(float(roughness))
        self._mat["eta"].append(float(eta))
        self._mat["mtype"].append(int(material_type))
        return mat_id

    def material(self, name: str) -> int:
        """Lookup by name — the reference's ``material_dict``."""
        return self.material_names[name]

    # -- primitives ----------------------------------------------------
    def add_sphere(self, center, radius, material: int) -> int:
        self._spheres.append((np.asarray(center, np.float32), float(radius),
                              int(material)))
        return len(self._spheres) - 1

    def add_quad(self, q, u, v, material: int) -> int:
        self._quads.append((np.asarray(q, np.float32),
                            np.asarray(u, np.float32),
                            np.asarray(v, np.float32), int(material)))
        return len(self._quads) - 1

    def add_mesh(self, data: MeshData, material: int,
                 transform: Optional[Transform] = None) -> _MeshEntry:
        entry = _MeshEntry(data=data, material=int(material),
                           transform=transform or Transform())
        self._meshes.append(entry)
        return entry

    # -- build ---------------------------------------------------------
    def _bake_triangles(self):
        """Explode meshes to world-space triangles (bake transforms — see
        ``core.types`` docstring for why this deviates from the reference's
        object-space GPU buffers)."""
        a_l, b_l, c_l, na_l, nb_l, nc_l, mat_l = [], [], [], [], [], [], []
        for entry in self._meshes:
            verts = entry.transform.apply_points(
                entry.data.vertices.astype(np.float64)).astype(np.float32)
            norms = entry.transform.apply_normals(
                entry.data.normals.astype(np.float64)).astype(np.float32)
            a_l.append(verts[0::3])
            b_l.append(verts[1::3])
            c_l.append(verts[2::3])
            na_l.append(norms[0::3])
            nb_l.append(norms[1::3])
            nc_l.append(norms[2::3])
            mat_l.append(np.full(len(verts) // 3, entry.material, np.int32))

        if not a_l:
            zero3 = np.zeros((0, 3), np.float32)
            return (zero3,) * 6 + (np.zeros((0,), np.int32),)
        return (np.concatenate(a_l), np.concatenate(b_l), np.concatenate(c_l),
                np.concatenate(na_l), np.concatenate(nb_l),
                np.concatenate(nc_l), np.concatenate(mat_l))

    def build(self, bvh: str = "auto", max_leaf: int = 4,
              timings: Optional[dict] = None):
        """Returns ``(SceneData, SceneMeta)``.

        ``bvh``: "auto" | "median" | "sah" | "lbvh" | "none".  "auto" uses
        the dense brute-force sweep for tiny meshes and LBVH otherwise.
        ``timings``: optional dict that receives split host-side timings —
        ``bake_s`` (mesh -> world-space triangles) and ``bvh_build_s`` (the
        BVH construction alone, native or NumPy).  Device upload is NOT in
        either number: ``jnp.asarray`` transfers complete asynchronously
        (block on the returned scene to measure them).  The reference logs
        only a combined build time (``lib/BVH/bvhBuilder.js:8-29``).
        """
        # Materials.
        materials = Materials(
            color=jnp.asarray(np.asarray(self._mat["color"], np.float32)
                              .reshape(-1, 3)),
            specular_color=jnp.asarray(
                np.asarray(self._mat["specular_color"], np.float32)
                .reshape(-1, 3)),
            emission=jnp.asarray(np.asarray(self._mat["emission"], np.float32)
                                 .reshape(-1, 3)),
            specular_strength=jnp.asarray(
                np.asarray(self._mat["specular_strength"], np.float32)),
            roughness=jnp.asarray(np.asarray(self._mat["roughness"],
                                             np.float32)),
            eta=jnp.asarray(np.asarray(self._mat["eta"], np.float32)),
            mtype=jnp.asarray(np.asarray(self._mat["mtype"], np.int32)),
        )

        # Spheres.
        if self._spheres:
            centers = np.stack([s[0] for s in self._spheres])
            radii = np.asarray([s[1] for s in self._spheres], np.float32)
            smat = np.asarray([s[2] for s in self._spheres], np.int32)
        else:
            centers = np.zeros((0, 3), np.float32)
            radii = np.zeros((0,), np.float32)
            smat = np.zeros((0,), np.int32)
        spheres = Spheres(center=jnp.asarray(centers),
                          radius=jnp.asarray(radii),
                          material_id=jnp.asarray(smat))

        # Quads with precomputed plane data (lib/primitives/quad.js:21-27).
        if self._quads:
            q = np.stack([x[0] for x in self._quads]).astype(np.float64)
            u = np.stack([x[1] for x in self._quads]).astype(np.float64)
            v = np.stack([x[2] for x in self._quads]).astype(np.float64)
            qmat = np.asarray([x[3] for x in self._quads], np.int32)
            n = np.cross(u, v)
            normal = n / np.maximum(
                np.linalg.norm(n, axis=-1, keepdims=True), 1e-20)
            d = np.sum(normal * q, axis=-1)
            w = n / np.maximum(np.sum(n * n, axis=-1, keepdims=True), 1e-30)
        else:
            q = u = v = normal = w = np.zeros((0, 3), np.float64)
            d = np.zeros((0,), np.float64)
            qmat = np.zeros((0,), np.int32)
        quads = Quads(q=jnp.asarray(q, jnp.float32),
                      u=jnp.asarray(u, jnp.float32),
                      v=jnp.asarray(v, jnp.float32),
                      normal=jnp.asarray(normal, jnp.float32),
                      d=jnp.asarray(d, jnp.float32),
                      w=jnp.asarray(w, jnp.float32),
                      material_id=jnp.asarray(qmat))

        # Triangles + acceleration structure.
        t_bake = time.perf_counter()
        a, b, c, na, nb, nc, tmat = self._bake_triangles()
        if timings is not None:
            timings["bake_s"] = time.perf_counter() - t_bake
        n_tris = len(a)
        flat_bvh = None
        traversal = "none"
        leaf_bound = 1
        if n_tris:
            if bvh == "auto":
                bvh = "none" if n_tris <= BRUTE_FORCE_MAX_TRIS else "lbvh"
            if bvh == "none":
                traversal = "brute"
            else:
                t_bvh = time.perf_counter()
                mins, maxs = bvh_mod.triangle_aabbs(a, b, c)
                # Native C++ builder when available (accel/bvh_native.cpp);
                # the NumPy builders remain the reference implementation.
                leaf_param = 1 if bvh == "median" else max_leaf
                arrs = None
                if not os.environ.get("TPT_NO_NATIVE"):
                    from ..accel.native import build_bvh_native
                    arrs = build_bvh_native(bvh, mins, maxs, leaf_param)
                if arrs is None:
                    builder = bvh_mod.BUILDERS[bvh]
                    if bvh == "median":
                        arrs = builder(mins, maxs)
                    elif bvh == "sah":
                        arrs = builder(mins, maxs, max_leaf=max_leaf)
                    else:
                        arrs = builder(mins, maxs, leaf_size=max_leaf)
                if timings is not None:
                    timings["bvh_build_s"] = time.perf_counter() - t_bvh
                order = arrs.order
                a, b, c = a[order], b[order], c[order]
                na, nb, nc = na[order], nb[order], nc[order]
                tmat = tmat[order]
                flat_bvh = FlatBVH(
                    mins=jnp.asarray(arrs.mins), maxs=jnp.asarray(arrs.maxs),
                    right=jnp.asarray(arrs.right),
                    prim_start=jnp.asarray(arrs.prim_start),
                    prim_count=jnp.asarray(arrs.prim_count),
                    miss=jnp.asarray(arrs.miss),
                    axis=jnp.asarray(arrs.axis),
                    prim_lo=jnp.asarray(arrs.prim_lo),
                    prim_hi=jnp.asarray(arrs.prim_hi))
                traversal = "bvh"
                leaf_bound = int(arrs.prim_count.max())
        triangles = Triangles(
            a=jnp.asarray(a), b=jnp.asarray(b), c=jnp.asarray(c),
            na=jnp.asarray(na), nb=jnp.asarray(nb), nc=jnp.asarray(nc),
            material_id=jnp.asarray(tmat))

        # First emissive quad is "the light" (common.wgsl:258-269).
        emissions = np.asarray(self._mat["emission"], np.float32).reshape(-1, 3)
        light_index = -1
        for i, m in enumerate(qmat):
            if emissions[m][0] > 0.0:
                light_index = i
                break

        mtypes = np.asarray(self._mat["mtype"], np.int32)
        has_volumes = bool(len(smat)) and bool(
            (mtypes[smat] == ISOTROPIC).any())

        scene = SceneData(
            materials=materials, spheres=spheres, quads=quads,
            triangles=triangles, bvh=flat_bvh,
            light_index=jnp.asarray(light_index, jnp.int32))
        meta = SceneMeta(has_volumes=has_volumes, traversal=traversal,
                         max_leaf=leaf_bound, has_light=light_index >= 0)
        return scene, meta
