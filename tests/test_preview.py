"""Interactive preview: painter, key handling, and the camera-motion
accumulation-reset loop (the parts that run without a tty)."""

import numpy as np
import pytest

import tpu_path_tracer as tpt
from tpu_path_tracer.preview import _paint, run_preview
from tpu_path_tracer.renderer import Renderer


def test_paint_half_blocks():
    img = np.zeros((4, 3, 3), np.uint8)
    img[0, :] = [255, 0, 0]   # top row red
    img[1, :] = [0, 255, 0]   # bottom row green
    out = _paint(img)
    lines = out.split("\n")
    assert len(lines) == 2                      # 4 rows -> 2 cell lines
    assert lines[0].count("▀") == 3
    assert "38;2;255;0;0" in lines[0]           # fg = top pixel
    assert "48;2;0;255;0" in lines[0]           # bg = bottom pixel
    assert lines[0].endswith("\x1b[0m")


def test_paint_odd_height_drops_last_row():
    img = np.full((5, 2, 3), 7, np.uint8)
    assert len(_paint(img).split("\n")) == 2


def test_preview_requires_tty(monkeypatch):
    scene, meta, _ = tpt.builtin.cornell_box()
    cfg = tpt.RenderConfig(width=8, height=8, max_bounces=1)
    r = Renderer(scene, meta, cfg)
    monkeypatch.setattr("sys.stdin", type("F", (), {
        "isatty": staticmethod(lambda: False)})())
    with pytest.raises(RuntimeError, match="tty"):
        run_preview(r)


def test_camera_motion_resets_accumulation():
    """The interactive loop's contract: orbit/zoom/pan set motion flags and
    the next step restarts accumulation at frame 1 (renderer.js:174-180)."""
    scene, meta, _ = tpt.builtin.cornell_box()
    cfg = tpt.RenderConfig(width=8, height=8, max_bounces=1)
    r = Renderer(scene, meta, cfg,
                 camera=tpt.Camera(eye=[0, 0, 3.2], center=[0, 0, 0]))
    r.step()
    r.step()
    assert r.frame_num == 2
    r.camera.orbit((0.0, 0.0), (500.0, 0.0))
    r.step()
    assert r.frame_num == 1          # reset by the motion flag
    r.camera.moving = False          # mouse-up
    r.step()
    assert r.frame_num == 2          # accumulating again
    r.camera.zoom(1.0)
    r.step()
    assert r.frame_num == 1
    r.camera.move_left()
    r.step()
    assert r.frame_num == 1
