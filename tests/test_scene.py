"""Scene building, OBJ parsing, transforms, built-in scene parity."""

import numpy as np
import jax.numpy as jnp

import tpu_path_tracer as tpt
from tpu_path_tracer.core.config import GLASS, ISOTROPIC, LAMBERTIAN
from tpu_path_tracer.scene import procedural
from tpu_path_tracer.scene.objreader import parse_obj
from tpu_path_tracer.scene.transform import Transform

OBJ_VVN = """
v 0 0 0
v 1 0 0
v 0 1 0
vn 0 0 1
f 1//1 2//1 3//1
"""

OBJ_VVTVN = """
v 0 0 0
v 1 0 0
v 0 1 0
v 1 1 0
vt 0 0
vt 1 0
vt 0 1
vn 0 0 1
f 1/1/1 2/2/1 3/3/1 4/3/1
"""


def test_parse_v_vn():
    m = parse_obj(OBJ_VVN)
    assert m.num_triangles == 1
    np.testing.assert_allclose(m.vertices,
                               [[0, 0, 0], [1, 0, 0], [0, 1, 0]])
    np.testing.assert_allclose(m.normals, [[0, 0, 1]] * 3)


def test_parse_v_vt_vn_and_fan():
    m = parse_obj(OBJ_VVTVN)
    assert m.num_triangles == 2  # quad fan-triangulated
    np.testing.assert_allclose(m.normals, [[0, 0, 1]] * 6)


def test_parse_reference_cube_asset():
    """The real asset the reference scene loads (lib/scene.js:289)."""
    import os
    path = "/root/reference/assets/cube.obj"
    if not os.path.exists(path):
        import pytest
        pytest.skip("reference assets not mounted")
    m = tpt.load_obj(path)
    assert m.num_triangles == 12
    assert abs(np.abs(m.vertices).max() - 0.270893) < 1e-6
    # Normals are axis-aligned unit vectors.
    np.testing.assert_allclose(np.linalg.norm(m.normals, axis=1), 1.0,
                               atol=1e-5)


def test_procedural_cube_matches_asset_geometry():
    m = procedural.cube()
    assert m.num_triangles == 12
    assert abs(np.abs(m.vertices).max() - 0.270893) < 1e-6
    # Closed surface: signed volume = (2h)^3.
    a, b, c = m.vertices[0::3], m.vertices[1::3], m.vertices[2::3]
    vol = np.sum(np.einsum("ij,ij->i", a, np.cross(b, c))) / 6.0
    assert abs(vol - (2 * 0.270893) ** 3) < 1e-5


def test_icosphere_scaling():
    m = procedural.icosphere(subdivisions=3, radius=2.0)
    assert m.num_triangles == 20 * 4 ** 3
    r = np.linalg.norm(m.vertices, axis=1)
    np.testing.assert_allclose(r, 2.0, atol=1e-5)


def test_transform_compose_order():
    """update(A, B) applies A first (lib/transform.js:42-58)."""
    t = Transform()
    t.update(Transform.scale(2, 2, 2), Transform.translate(1, 0, 0))
    p = t.apply_points(np.array([[1.0, 0, 0]]))
    np.testing.assert_allclose(p, [[3.0, 0, 0]])  # scale then translate
    # Normals via inverse-transpose stay perpendicular under nonuniform scale.
    t2 = Transform()
    t2.update(Transform.scale(1, 4, 1))
    n = t2.apply_normals(np.array([[0.0, 1 / np.sqrt(2), 1 / np.sqrt(2)]]))
    tangent = t2.apply_points(np.array([[0.0, 1, -1]]))  # surface tangent
    assert abs(np.dot(n[0], tangent[0])) < 1e-9


def test_builder_light_and_meta():
    scene, meta, b = tpt.builtin.cornell_box()
    assert int(scene.light_index) == 0      # light quad added first
    assert meta.has_light and not meta.has_volumes
    assert scene.quads.count == 6
    assert scene.spheres.count == 2
    # Quad derived data matches the host packer formulas (quad.js:21-27).
    n = np.cross(np.asarray(scene.quads.u), np.asarray(scene.quads.v))
    np.testing.assert_allclose(
        np.asarray(scene.quads.normal),
        n / np.linalg.norm(n, axis=1, keepdims=True), atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(scene.quads.d),
        np.sum(np.asarray(scene.quads.normal) * np.asarray(scene.quads.q),
               axis=1), atol=1e-6)


def test_reference_scene_parity_counts():
    """Structure of the default scene (lib/scene.js:36-187): 18 spheres
    (9 fog+glass pairs), 8 quads with the emissive ceiling first, 12 cube
    triangles, volumes present."""
    scene, meta, b = tpt.builtin.reference_scene()
    assert scene.spheres.count == 19  # 9 pairs + 1 lone glass sphere
    assert scene.quads.count == 8
    assert scene.triangles.count == 12
    assert meta.has_volumes and meta.has_light
    assert int(scene.light_index) == 0
    mt = np.asarray(scene.materials.mtype)
    smat = np.asarray(scene.spheres.material_id)
    assert (mt[smat] == ISOTROPIC).sum() == 9
    assert (mt[smat] == GLASS).sum() == 10
    # Emissive ceiling is [2,2,2] (lib/scene.js:119).
    li = int(scene.light_index)
    lm = int(np.asarray(scene.quads.material_id)[li])
    np.testing.assert_allclose(np.asarray(scene.materials.emission)[lm],
                               [2, 2, 2])


def test_world_space_baking():
    """Mesh transform is baked into triangle vertices at build (deviation
    note in core/types.py): rotating the cube moves its AABB accordingly."""
    import math
    b = tpt.SceneBuilder()
    m = b.add_material("d", LAMBERTIAN, [1, 1, 1])
    t = Transform()
    t.update(Transform.rotate(math.pi / 4, [0, 1, 0]),
             Transform.translate(5, 0, 0))
    b.add_mesh(procedural.cube(0.5), m, t)
    scene, meta = b.build(bvh="none")
    verts = np.concatenate([np.asarray(scene.triangles.a),
                            np.asarray(scene.triangles.b),
                            np.asarray(scene.triangles.c)])
    center = verts.mean(axis=0)
    np.testing.assert_allclose(center, [5, 0, 0], atol=1e-5)
    # 45-degree rotation widens the x-extent to sqrt(2)/2 * 2.
    assert abs((verts[:, 0].max() - verts[:, 0].min()) - np.sqrt(2)) < 1e-4
