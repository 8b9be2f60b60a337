"""PLY parser/writer + GaussianScene conversion tests (SURVEY.md section 4, item 1)."""

import io

import numpy as np

from splatapult_tpu.io.ply import read_ply, write_ply, make_ply
from splatapult_tpu.io.gaussians import (
    load_gaussian_ply,
    make_debug_scene,
    prune_splats,
    scene_from_ply,
    scene_to_ply,
)


def test_read_test_ply_header(test_ply_path):
    ply = read_ply(test_ply_path)
    assert ply.num_vertices == 16
    # schema the reference expects (ref: src/gaussiancloud.cpp:170-228)
    assert ply.has("x", "y", "z", "opacity")
    assert ply.has(*[f"f_dc_{i}" for i in range(3)])
    assert ply.has(*[f"f_rest_{i}" for i in range(45)])
    assert ply.has(*[f"scale_{i}" for i in range(3)])
    assert ply.has(*[f"rot_{i}" for i in range(4)])


def test_roundtrip_byte_exact(test_ply_path):
    with open(test_ply_path, "rb") as f:
        original = f.read()
    ply = read_ply(test_ply_path)
    buf = io.BytesIO()
    write_ply(buf, ply)
    ply2 = read_ply(io.BytesIO(buf.getvalue()))
    assert ply2.property_names == ply.property_names
    assert ply2.vertices.tobytes() == ply.vertices.tobytes()
    # vertex blob must be byte-identical to the original file's tail
    assert buf.getvalue().endswith(ply.vertices.tobytes())
    assert original.endswith(ply.vertices.tobytes())


def test_scene_from_ply_layout(test_ply_path):
    ply = read_ply(test_ply_path)
    scene = scene_from_ply(ply)
    n = ply.num_vertices
    assert scene.means.shape == (n, 3)
    assert scene.sh.shape == (n, 3, 16)
    assert scene.sh_degree == 3
    # SH channel-block layout (ref: src/gaussiancloud.cpp:265-314)
    np.testing.assert_array_equal(scene.sh[:, 0, 0], ply.column("f_dc_0"))
    np.testing.assert_array_equal(scene.sh[:, 1, 0], ply.column("f_dc_1"))
    np.testing.assert_array_equal(scene.sh[:, 2, 0], ply.column("f_dc_2"))
    np.testing.assert_array_equal(scene.sh[:, 0, 1], ply.column("f_rest_0"))
    np.testing.assert_array_equal(scene.sh[:, 1, 1], ply.column("f_rest_15"))
    np.testing.assert_array_equal(scene.sh[:, 2, 14], ply.column("f_rest_43"))
    np.testing.assert_array_equal(scene.quats[:, 0], ply.column("rot_0"))


def test_scene_nosh_degrade(test_ply_path):
    scene = load_gaussian_ply(test_ply_path, use_full_sh=False)
    assert scene.sh.shape[-1] == 1
    assert scene.sh_degree == 0


def test_scene_export_roundtrip(test_ply_path, tmp_path):
    scene = load_gaussian_ply(test_ply_path)
    out = tmp_path / "roundtrip.ply"
    ply2 = scene_to_ply(scene)
    write_ply(str(out), ply2)
    scene2 = load_gaussian_ply(str(out))
    for a, b in zip(
        (scene.means, scene.sh, scene.opacities, scene.log_scales, scene.quats),
        (scene2.means, scene2.sh, scene2.opacities, scene2.log_scales, scene2.quats),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_ascii_ply():
    text = b"""ply
format ascii 1.0
element vertex 2
property float x
property float y
end_header
1.5 2.5
-3 4
"""
    ply = read_ply(io.BytesIO(text))
    np.testing.assert_allclose(ply.column("x"), [1.5, -3.0])
    np.testing.assert_allclose(ply.column("y"), [2.5, 4.0])


def test_make_ply_mixed_dtypes():
    ply = make_ply(
        {
            "x": np.asarray([1.0, 2.0], np.float32),
            "red": np.asarray([255, 0], np.uint8),
        }
    )
    buf = io.BytesIO()
    write_ply(buf, ply)
    back = read_ply(io.BytesIO(buf.getvalue()))
    np.testing.assert_array_equal(back.column("red"), [255, 0])
    assert back.vertices.dtype["red"] == np.uint8


def test_debug_scene_matches_reference_constants():
    # ref: GaussianCloud::InitDebugCloud (src/gaussiancloud.cpp:505-578)
    scene = make_debug_scene()
    assert scene.num_gaussians == 16
    sh_one = 1.0 / (2.0 * 0.28209479177387814)
    # first x-axis splat is red at (0.2, 0, 0)
    np.testing.assert_allclose(scene.means[0], [0.2, 0.0, 0.0], atol=1e-7)
    np.testing.assert_allclose(scene.sh[0, 0, 0], sh_one)
    np.testing.assert_allclose(scene.sh[0, 1, 0], -sh_one)
    # origin splat is white
    np.testing.assert_allclose(scene.means[15], [0.0, 0.0, 0.0])
    np.testing.assert_allclose(scene.sh[15, :, 0], [sh_one] * 3)
    # baked covariance reproduces the reference's COV_DIAG = 0.005
    from splatapult_tpu.core.transforms import bake_covariance

    cov = np.asarray(bake_covariance(scene.quats, scene.log_scales))
    np.testing.assert_allclose(cov[0], np.eye(3) * 0.005, atol=1e-9)


def test_prune_splats_keeps_nearest():
    scene = make_debug_scene()
    pruned = prune_splats(scene, origin=[0.0, 0.0, 0.0], num_splats=4)
    assert pruned.num_gaussians == 4
    dists = np.linalg.norm(np.asarray(pruned.means), axis=-1)
    all_dists = np.sort(np.linalg.norm(np.asarray(scene.means), axis=-1))
    np.testing.assert_allclose(np.sort(dists), all_dists[:4])
