"""Path-cluster shared-binning tests (splatapult_tpu/cluster.py).

Shared binning across a view cluster is EXACT for pure in-plane translations
(the stereo invariance, generalized to K views) and bounded-approximate for
real path steps (the reference-depth ordering); see the module docstring."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from splatapult_tpu.cluster import (
    calibrate_config_cluster,
    cluster_shareable,
    render_cluster,
    render_path_clustered,
)
from splatapult_tpu.core import transforms as T
from splatapult_tpu.io.gaussians import GaussianScene
from splatapult_tpu.render import Camera, RenderConfig, render, render_batch

CFG = RenderConfig(
    width=64, height=64, pipeline="tiled", tile_size=16, tile_block=8,
    max_instance_mult=60,
)


def _camera(eye=(1.2, 1.1, 1.3), target=(0.3, 0.3, 0.3)):
    c2w = T.look_at(eye=list(eye), target=list(target), up=[0.0, 1.0, 0.0])
    return Camera.from_fov(c2w, fovy=np.pi / 4, width=CFG.width, height=CFG.height)


def _random_scene(rng, n=64, spread=0.8):
    quats = rng.standard_normal((n, 4)).astype(np.float32)
    quats /= np.linalg.norm(quats, axis=-1, keepdims=True)
    return GaussianScene(
        means=jnp.asarray(rng.uniform(-spread, spread, (n, 3)), jnp.float32),
        sh=jnp.asarray(rng.standard_normal((n, 3, 1)) * 0.5, jnp.float32),
        opacities=jnp.asarray(rng.uniform(-1.0, 2.5, (n,)), jnp.float32),
        log_scales=jnp.asarray(rng.uniform(-3.5, -1.5, (n, 3)), jnp.float32),
        quats=jnp.asarray(quats),
    )


def _batch(cams):
    return Camera(cam_to_world=jnp.stack([c.cam_to_world for c in cams]),
                  proj=jnp.stack([c.proj for c in cams]))


def _inplane_cluster(k=3, step=0.12):
    """K cameras differing by pure in-plane (right/up) translation: view
    depth is invariant, so shared binning is order-exact (the stereo case)."""
    base = _camera()
    right = np.asarray(base.cam_to_world)[:3, 0]
    up = np.asarray(base.cam_to_world)[:3, 1]
    cams = []
    for i in range(k):
        m = np.asarray(base.cam_to_world).copy()
        m[:3, 3] += (i - k // 2) * step * right + (i % 2) * 0.5 * step * up
        cams.append(Camera(cam_to_world=jnp.asarray(m), proj=base.proj))
    return _batch(cams)


def _path_cluster(k=4, dt=0.05):
    """K consecutive views of a circular path (translation along view axis +
    rotation): the realistic config-4 workload, approximate under sharing."""
    cams = []
    for i in range(k):
        a = 0.3 + i * dt
        cams.append(_camera(eye=(1.6 * np.cos(a), 1.0, 1.6 * np.sin(a)),
                            target=(0.0, 0.2, 0.0)))
    return _batch(cams)


def _per_view(scene, cameras, cfg):
    return np.stack([
        np.asarray(render(scene, Camera(cam_to_world=cameras.cam_to_world[i],
                                        proj=cameras.proj[i]), cfg))
        for i in range(cameras.cam_to_world.shape[0])
    ])


def test_cluster_inplane_matches_per_view_exactly(rng):
    scene = _random_scene(rng)
    cams = _inplane_cluster(k=3, step=0.15)
    want = _per_view(scene, cams, CFG)
    got = np.asarray(render_cluster(scene, cams, CFG))
    assert got.shape == want.shape == (3, 64, 64, 4)
    # depth is invariant under in-plane translation: same exactness class as
    # stereo (only block-association noise at the 1/256 cutoff boundary)
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_cluster_path_views_bounded_error():
    # OWN deterministic generator (not the shared session rng): the committed
    # error contract below is scene-dependent, and the shared fixture makes
    # the drawn scene depend on which tests ran first in the session
    # (ADVICE r4: passes alone, fails after test_tiled/test_render).
    scene = _random_scene(np.random.default_rng(1234), n=96)
    cams = _path_cluster(k=4, dt=0.04)
    want = _per_view(scene, cams, CFG)
    got = np.asarray(render_cluster(scene, cams, CFG))
    # reference-depth ordering: error appears only where the pose delta
    # reorders nearly-equal-depth splats; tight path steps stay small
    diff = np.abs(got - want)
    assert diff.max() < 0.06, diff.max()
    assert diff.mean() < 2e-3, diff.mean()
    # the reference view itself is order-exact
    np.testing.assert_allclose(got[0], want[0], atol=2e-5)


def test_cluster_per_view_culling_zero_contribution(rng):
    # camera close in: some splats cull in some views only; the shared list
    # must contribute exactly zero for the culled view
    scene = _random_scene(rng, n=96, spread=1.2)
    cams = _inplane_cluster(k=3, step=0.5)
    want = _per_view(scene, cams, CFG)
    got = np.asarray(render_cluster(scene, cams, CFG))
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_cluster_grads_close_to_per_view(rng):
    scene = _random_scene(rng, n=48)
    cams = _inplane_cluster(k=2, step=0.1)

    def loss_shared(s):
        return jnp.mean(render_cluster(s, cams, CFG) ** 2)

    def loss_per_view(s):
        return jnp.mean(render_batch(s, cams, CFG) ** 2)

    la, ga = jax.value_and_grad(loss_shared)(scene)
    lb, gb = jax.value_and_grad(loss_per_view)(scene)
    np.testing.assert_allclose(float(la), float(lb), rtol=1e-5)
    for name in ("means", "sh", "opacities", "log_scales", "quats"):
        a, b = np.asarray(getattr(ga, name)), np.asarray(getattr(gb, name))
        scale = np.abs(b).max() + 1e-8
        np.testing.assert_allclose(a / scale, b / scale, atol=2e-4, err_msg=name)


def test_render_path_clustered_shapes_and_gate(rng):
    scene = _random_scene(rng)
    cams = _path_cluster(k=6, dt=0.04)
    # permissive gate: shares (clusters of 4 + 2)
    out = np.asarray(render_path_clustered(scene, cams, CFG, cluster_size=4))
    assert out.shape == (6, 64, 64, 4)
    # strict gate: every cluster falls back to per-view -> exact
    strict = np.asarray(render_path_clustered(
        scene, cams, CFG, cluster_size=4, max_depth_shift=1e-9))
    want = _per_view(scene, cams, CFG)
    np.testing.assert_allclose(strict, want, atol=1e-6)
    # cluster_size=1 is per-view by construction
    one = np.asarray(render_path_clustered(scene, cams, CFG, cluster_size=1))
    np.testing.assert_allclose(one, want, atol=1e-6)


def test_cluster_shareable_gate():
    tight = _path_cluster(k=4, dt=0.01)
    far = _path_cluster(k=4, dt=0.8)
    assert cluster_shareable(tight, max_depth_shift=0.2)
    assert not cluster_shareable(far, max_depth_shift=0.2)
    # in-plane translation induces zero depth shift however large a step
    # (up to f32 pose-matrix noise, snapped/bounded well under 1e-3)
    inplane = _inplane_cluster(k=3, step=0.5)
    assert cluster_shareable(inplane, max_depth_shift=1e-3)


def test_calibrate_config_cluster_fits_union(rng):
    scene = _random_scene(rng)
    cams = _inplane_cluster(k=3, step=0.4)
    cfg = dataclasses.replace(CFG, max_instance_mult=0.01)  # would overflow
    cal = calibrate_config_cluster(scene, cams, cfg, cluster_size=3)
    assert cal.max_instance_mult > cfg.max_instance_mult
    want = _per_view(scene, cams, cal)
    got = np.asarray(render_cluster(scene, cams, cal))
    np.testing.assert_allclose(got, want, atol=2e-5)
