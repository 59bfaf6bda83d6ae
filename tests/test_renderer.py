"""Renderer orchestration, checkpoint/resume, CLI, native accel parity."""

import os
import subprocess
import sys

import numpy as np
import jax.numpy as jnp
import pytest

import tpu_path_tracer as tpt
from tpu_path_tracer.core.camera import Camera
from tpu_path_tracer.utils import checkpoint as ckpt
from tpu_path_tracer.utils.image import read_png, write_png


def small_renderer(**kw):
    scene, meta, _ = tpt.builtin.cornell_box()
    cfg = tpt.RenderConfig(width=16, height=12, max_bounces=3)
    cam = Camera(eye=[0, 0, 3.2], center=[0, 0, 0])
    return tpt.Renderer(scene, meta, cfg, cam, **kw)


def test_progressive_accumulation_and_motion_reset():
    r = small_renderer()
    r.render_animation(3)
    assert r.frame_num == 3
    fb3 = np.asarray(r.framebuffer).copy()
    # Camera motion resets accumulation on the next frame
    # (renderer.js:174-180 semantics).
    r.camera.zoom(-1.0)
    r.step()
    assert r.frame_num == 1
    assert not np.allclose(np.asarray(r.framebuffer), fb3)


def test_render_single_frame_and_display():
    r = small_renderer()
    r.render_single_frame(spp=4)
    assert r.frame_num == 1
    img = r.display()
    assert img.shape == (12, 16, 3) and img.dtype == np.uint8


def test_checkpoint_roundtrip(tmp_path):
    r = small_renderer()
    r.render_animation(2)
    path = str(tmp_path / "ck.npz")
    r.save_checkpoint(path)
    fb = np.asarray(r.framebuffer).copy()

    r2 = small_renderer()
    r2.load_checkpoint(path)
    assert r2.frame_num == 2
    np.testing.assert_array_equal(np.asarray(r2.framebuffer), fb)
    np.testing.assert_allclose(r2.camera.eye, r.camera.eye)
    # Resumed render continues identically to an uninterrupted one.
    r.step(reset=False)
    r2.step(reset=False)
    np.testing.assert_array_equal(np.asarray(r.framebuffer),
                                  np.asarray(r2.framebuffer))


def test_sharded_renderer_matches_single():
    """8-device ray-sharded renderer produces the same image as single-device
    (SURVEY.md §4 distributed tests on a virtual CPU mesh)."""
    from tpu_path_tracer.dist.sharding import make_mesh
    r1 = small_renderer()
    r1.render_animation(2)
    mesh = make_mesh(n_devices=8)
    r8 = small_renderer(mesh=mesh)
    r8.render_animation(2)
    n = 16 * 12
    np.testing.assert_allclose(np.asarray(r8.framebuffer)[:n],
                               np.asarray(r1.framebuffer), rtol=2e-5,
                               atol=1e-5)


def test_png_roundtrip(tmp_path):
    img = (np.random.default_rng(0).uniform(0, 255, (7, 5, 3))
           .astype(np.uint8))
    p = str(tmp_path / "t.png")
    write_png(p, img)
    np.testing.assert_array_equal(read_png(p), img)


def test_native_builders_match_numpy():
    from tpu_path_tracer.accel import bvh as bvh_mod
    from tpu_path_tracer.accel.native import available, build_bvh_native
    if not available():
        pytest.skip("no C++ toolchain")
    r = np.random.default_rng(5)
    a = r.uniform(-5, 5, (500, 3)).astype(np.float32)
    b = a + r.uniform(-1, 1, (500, 3)).astype(np.float32)
    c = a + r.uniform(-1, 1, (500, 3)).astype(np.float32)
    mins, maxs = bvh_mod.triangle_aabbs(a, b, c)
    from test_bvh import check_invariants
    for method, leaf in [("median", 1), ("sah", 8), ("lbvh", 4)]:
        arrs = build_bvh_native(method, mins, maxs, leaf)
        check_invariants(arrs, 500)
    # median: identical node count to the NumPy reference builder (2n-1).
    arrs = build_bvh_native("median", mins, maxs, 1)
    ref = bvh_mod.build_median(mins, maxs)
    assert len(arrs.mins) == len(ref.mins) == 999


def test_native_obj_matches_python():
    from tpu_path_tracer.accel.native import available, parse_obj_native
    from tpu_path_tracer.scene.objreader import parse_obj
    if not available():
        pytest.skip("no C++ toolchain")
    text = ("v 0 0 0\nv 1 0 0\nv 0 1 0\nv 1 1 0\nvn 0 0 1\n"
            "f 1//1 2//1 3//1\nf 1/9/1 2/9/1 4/9/1\nf 1 2 3\n")
    out = parse_obj_native(text)
    ref = parse_obj(text, use_native=False)
    np.testing.assert_allclose(out[0], ref.vertices)
    np.testing.assert_allclose(out[1], ref.normals)


def test_cli_render_and_grad_check(tmp_path):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PALLAS_AXON_POOL_IPS"] = ""
    out = str(tmp_path / "out.png")
    res = subprocess.run(
        [sys.executable, "-m", "tpu_path_tracer.cli", "render",
         "--scene", "cornell", "--width", "16", "--height", "12",
         "--frames", "2", "--bounces", "3", "-o", out],
        capture_output=True, text=True, env=env,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    assert res.returncode == 0, res.stderr[-2000:]
    assert os.path.exists(out)
    assert read_png(out).shape == (12, 16, 3)

    res = subprocess.run(
        [sys.executable, "-m", "tpu_path_tracer.cli", "grad-check",
         "--scene", "cornell", "--bounces", "3"],
        capture_output=True, text=True, env=env,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    assert res.returncode == 0, res.stdout + res.stderr[-2000:]
    assert "PASS" in res.stdout
