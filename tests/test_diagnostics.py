"""Render statistics / observability tests."""

import numpy as np

from splatapult_tpu.core import transforms as T
from splatapult_tpu.diagnostics import phase_timer, render_stats
from splatapult_tpu.io.gaussians import make_debug_scene
from splatapult_tpu.render import Camera, RenderConfig


def test_render_stats():
    scene = make_debug_scene()
    cam = Camera.from_fov(
        T.look_at(eye=[1.2, 1.1, 1.3], target=[0.3, 0.3, 0.3], up=[0, 1, 0]),
        fovy=np.pi / 4, width=64, height=64,
    )
    cfg = RenderConfig(width=64, height=64, pipeline="tiled", tile_size=16,
                       tile_block=8, max_instance_mult=20)
    stats = render_stats(scene, cam, cfg)
    assert stats["num_splats"] == 16
    assert 0 < stats["num_visible"] <= 16
    assert stats["num_instances"] > 0
    assert stats["num_culled_instances"] == 0
    assert stats["tiles"] == 16
    assert stats["max_tile_instances"] >= stats["mean_tile_instances"]


def test_phase_timer():
    sink = {}
    with phase_timer(sink, "a"):
        pass
    with phase_timer(sink, "a"):
        pass
    assert sink["a"] >= 0.0
