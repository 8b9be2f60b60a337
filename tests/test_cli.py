"""CLI smoke tests: every subcommand drives the real pipeline end to end."""

import json
import os

import numpy as np
import pytest

from splatapult_tpu.cli import main
from splatapult_tpu.utils.image import load_png


def test_cli_info(capsys, test_ply_path):
    main(["info", test_ply_path])
    out = capsys.readouterr().out
    assert "splats:      16" in out
    assert "sh degree:   3" in out
    assert "test_vr.json" in out


def test_cli_render(tmp_path, test_ply_path):
    out = str(tmp_path / "render.png")
    main([
        "render", test_ply_path, "-o", out, "--width", "64", "--height", "48",
        "--eye", "0", "0.5", "2.5", "--pipeline", "global", "--no-floor",
    ])
    img = load_png(out)
    assert img.shape == (48, 64, 3)
    assert img.max() > 0.05  # something visible


def test_cli_render_vr_pose(tmp_path, test_ply_path):
    # default camera + discovered test_vr.json floor transform
    out = str(tmp_path / "vr.png")
    main(["render", test_ply_path, "-o", out, "--width", "64", "--height", "48",
          "--pipeline", "global"])
    assert os.path.exists(out)


def test_cli_render_nosh_fp16(tmp_path, test_ply_path):
    out = str(tmp_path / "nosh.png")
    main([
        "render", test_ply_path, "-o", out, "--width", "32", "--height", "32",
        "--eye", "0", "0.5", "2.5", "--nosh", "--fp16", "--pipeline", "global",
        "--no-floor",
    ])
    assert os.path.exists(out)


def test_cli_export_and_prune(tmp_path, test_ply_path):
    out = str(tmp_path / "export.ply")
    main(["export", test_ply_path, "-o", out, "--prune", "8"])
    from splatapult_tpu.io.gaussians import load_gaussian_ply

    scene = load_gaussian_ply(out)
    assert scene.num_gaussians == 8


def test_cli_path(tmp_path, test_ply_path):
    # synthesize a scene dir with cameras.json next to a copy of the ply
    import shutil

    scene_dir = tmp_path / "scene"
    scene_dir.mkdir()
    ply = scene_dir / "model.ply"
    shutil.copy(test_ply_path, ply)
    cams = []
    for i, a in enumerate((0.0, 0.7)):
        cams.append({
            "id": i, "width": 64, "height": 48,
            "position": [2.0 * np.cos(a), 0.5, 2.0 * np.sin(a)],
            "rotation": np.eye(3).tolist(),
            "fx": 60.0, "fy": 60.0,
        })
    (scene_dir / "cameras.json").write_text(json.dumps(cams))
    out = str(tmp_path / "frames.png")
    main(["path", str(ply), "-o", out, "--width", "64", "--height", "48",
          "--pipeline", "global", "--no-floor"])
    stem = out[:-4]
    assert os.path.exists(f"{stem}_0000.png")
    assert os.path.exists(f"{stem}_0001.png")


def test_cli_points(tmp_path):
    from splatapult_tpu.io.points import make_debug_points, save_point_ply

    ply = str(tmp_path / "input.ply")
    save_point_ply(ply, make_debug_points())
    out = str(tmp_path / "points.png")
    main(["points", ply, "-o", out, "--width", "48", "--height", "48",
          "--eye", "1", "1", "1", "--target", "0.3", "0.3", "0.3",
          "--pipeline", "global"])
    img = load_png(out)
    assert img.max() > 0.05


def test_cli_save_pose(tmp_path, test_ply_path):
    # the Return-key pose save (ref: src/app.cpp:700-732): write a floor
    # transform, then confirm a render discovers and applies it
    import shutil

    ply = str(tmp_path / "scene.ply")
    shutil.copy(test_ply_path, ply)
    main(["save-pose", ply, "--eye", "0", "0.5", "2.5", "--no-floor"])
    vr = str(tmp_path / "scene_vr.json")
    assert os.path.exists(vr)
    mat = np.asarray(json.load(open(vr))["floorMat"], np.float32).reshape(4, 4).T
    # floorMat = camera pose lowered 1.5 m along its own up axis
    assert np.isfinite(mat).all() and abs(mat[3, 3] - 1.0) < 1e-6
    out = str(tmp_path / "posed.png")
    main(["render", ply, "-o", out, "--width", "32", "--height", "32",
          "--pipeline", "global"])
    assert os.path.exists(out)


def test_cli_save_pose_idempotent(tmp_path, test_ply_path):
    # repeated saves with the same inputs must write the same matrix — the
    # saved floor transform must never compound into the next save
    import shutil

    ply = str(tmp_path / "scene.ply")
    shutil.copy(test_ply_path, ply)
    vr = str(tmp_path / "scene_vr.json")
    main(["save-pose", ply, "--eye", "0", "0.5", "2.5"])
    first = json.load(open(vr))["floorMat"]
    main(["save-pose", ply, "--eye", "0", "0.5", "2.5"])
    second = json.load(open(vr))["floorMat"]
    np.testing.assert_array_equal(first, second)
    # explicit -o out.png is honored verbatim (no sentinel-default surprise)
    out = str(tmp_path / "out.png")
    main(["save-pose", ply, "--eye", "0", "0.5", "2.5", "-o", out])
    assert os.path.exists(out) and json.load(open(out))["floorMat"] == first


def test_cli_synth_garden_roundtrip(tmp_path, capsys):
    out = str(tmp_path / "garden.ply")
    main(["synth", "garden", "-o", out, "--splats", "3000", "--seed", "2"])
    assert "3000 splats, SH degree 3" in capsys.readouterr().out
    png = str(tmp_path / "garden.png")
    main(["render", out, "-o", png, "--width", "64", "--height", "48",
          "--eye", "4.2", "1.6", "0", "--pipeline", "tiled"])
    img = load_png(png)
    assert img.shape == (48, 64, 3)
    assert img.max() > 0.05


def test_cli_synth_debug(tmp_path, capsys):
    out = str(tmp_path / "debug.ply")
    main(["synth", "debug", "-o", out])
    assert "16 splats" in capsys.readouterr().out


def test_cli_render_stereo_shared_bins(tmp_path, test_ply_path):
    # --stereo drives the shared-binning stereo path (splatapult_tpu/stereo.py)
    out = str(tmp_path / "stereo.png")
    main([
        "render", test_ply_path, "-o", out, "--width", "32", "--height", "32",
        "--eye", "0", "0.5", "2.5", "--stereo", "--shared-bins",
        "--pipeline", "tiled", "--no-floor",
    ])
    img = load_png(out)
    assert img.shape == (32, 64, 3)  # L/R side by side


def test_cli_render_stereo_global_fallback(tmp_path, test_ply_path):
    # --stereo with --pipeline global (or --supersample > 1) cannot use the
    # shared-binning path (tiled-only); it must fall back to the per-eye
    # render_batch path and still honor both flags (ADVICE r3)
    out = str(tmp_path / "stereo_g.png")
    main([
        "render", test_ply_path, "-o", out, "--width", "32", "--height", "32",
        "--eye", "0", "0.5", "2.5", "--stereo", "--pipeline", "global",
        "--supersample", "2", "--no-floor",
    ])
    img = load_png(out)
    assert img.shape == (32, 64, 3)  # L/R side by side
