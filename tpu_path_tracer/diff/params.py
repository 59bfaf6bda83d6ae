"""Differentiable scene-parameter pytrees.

The north-star gradient targets (BASELINE.json): vertex positions, BSDF
parameters, and emitter radiance.  ``extract_params`` pulls the requested
groups out of a ``SceneData`` into a flat dict pytree; ``apply_params``
splices them back.  Everything not extracted stays constant (and the discrete
hit structure is detached inside the kernels regardless — ``kernels/hit.py``).
"""

from __future__ import annotations

from typing import Dict, Iterable

import jax.numpy as jnp

from ..core.types import SceneData

GROUPS = ("emission", "bsdf", "vertices", "spheres", "quads")


def extract_params(scene: SceneData,
                   groups: Iterable[str] = ("emission", "bsdf")) -> Dict:
    params: Dict = {}
    g = set(groups)
    unknown = g - set(GROUPS)
    if unknown:
        raise ValueError(f"unknown param groups {unknown}; valid: {GROUPS}")
    if "emission" in g:
        params["emission"] = scene.materials.emission
    if "bsdf" in g:
        params["color"] = scene.materials.color
        params["specular_color"] = scene.materials.specular_color
        params["specular_strength"] = scene.materials.specular_strength
        params["roughness"] = scene.materials.roughness
        params["eta"] = scene.materials.eta
    if "vertices" in g:
        params["tri_a"] = scene.triangles.a
        params["tri_b"] = scene.triangles.b
        params["tri_c"] = scene.triangles.c
    if "spheres" in g:
        params["sphere_center"] = scene.spheres.center
        params["sphere_radius"] = scene.spheres.radius
    if "quads" in g:
        params["quad_q"] = scene.quads.q
        params["quad_u"] = scene.quads.u
        params["quad_v"] = scene.quads.v
    return params


def apply_params(scene: SceneData, params: Dict) -> SceneData:
    """Splice a (possibly partial) parameter dict back into the scene.

    Geometry note: moving triangle vertices invalidates BVH node bounds,
    so when the ``vertices`` group is present and the scene carries a BVH,
    the bounds are refreshed in the same trace via
    ``accel.refit.refit_bvh`` (on-device range-min/max over the unchanged
    topology — no host rebuild; the refit itself is gradient-detached like
    the rest of the hit search).  Every training path that goes through
    ``apply_params`` — ``cli train``, the benchmark loss, the sharded
    ``dist.render_dist`` step — therefore keeps traversal correct as
    vertices move."""
    mats = scene.materials
    if "emission" in params:
        mats = mats._replace(emission=params["emission"])
    if "color" in params:
        mats = mats._replace(
            color=params["color"],
            specular_color=params["specular_color"],
            specular_strength=params["specular_strength"],
            roughness=params["roughness"],
            eta=params["eta"])
    scene = scene._replace(materials=mats)
    if "tri_a" in params:
        scene = scene._replace(triangles=scene.triangles._replace(
            a=params["tri_a"], b=params["tri_b"], c=params["tri_c"]))
        if scene.bvh is not None:
            from ..accel.refit import refit_bvh
            scene = scene._replace(bvh=refit_bvh(scene.bvh,
                                                 scene.triangles))
    if "sphere_center" in params:
        scene = scene._replace(spheres=scene.spheres._replace(
            center=params["sphere_center"], radius=params["sphere_radius"]))
    if "quad_q" in params:
        q, u, v = params["quad_q"], params["quad_u"], params["quad_v"]
        # Keep the stored derived plane data consistent (quad.js:21-27).
        n = jnp.cross(u, v)
        normal = n / jnp.maximum(
            jnp.linalg.norm(n, axis=-1, keepdims=True), 1e-20)
        d = jnp.sum(normal * q, axis=-1)
        w = n / jnp.maximum(jnp.sum(n * n, axis=-1, keepdims=True), 1e-30)
        scene = scene._replace(quads=scene.quads._replace(
            q=q, u=u, v=v, normal=normal, d=d, w=w))
    return scene
