"""Probe: how many AABB tile instances does an exact ellipse-vs-tile test cull?

Computes, for the default bench scene/camera, the rect-based instance count
(what ops/binning enumerates today) vs the count surviving an exact
min-of-quadratic-over-tile-rect test at the per-splat opacity-aware power
threshold k2 = 2*ln(alpha/cutoff) — the lossless cull bound (any culled
instance would have every pixel below the 1/256 discard).

Run on CPU (pure jnp, no Pallas): python tools/probe_exact_cull.py [n_splats]
"""
import os
import sys

import jax

# sitecustomize pins JAX_PLATFORMS=axon at interpreter startup; env vars set
# here are too late — the platform must be overridden through jax.config
# (same as tests/conftest.py). Keeps this probe off the single-client tunnel.
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import make_bench_scene
from splatapult_tpu.io.synth import garden_cameras
from splatapult_tpu.render import RenderConfig, prepare_splats
from splatapult_tpu.ops.binning import TileGrid, _tile_rects


def qmin_rect(mx, my, A, B, C, x0, x1, y0, y1):
    """Min of q = A X^2 + 2B XY + C Y^2 (X=x-mx, Y=y-my) over rect, exact."""
    X0, X1, Y0, Y1 = x0 - mx, x1 - mx, y0 - my, y1 - my
    inside = (X0 <= 0) & (X1 >= 0) & (Y0 <= 0) & (Y1 >= 0)

    def v_edge(Xe):
        Yc = jnp.clip(-B * Xe / jnp.maximum(C, 1e-30), Y0, Y1)
        return A * Xe * Xe + 2 * B * Xe * Yc + C * Yc * Yc

    def h_edge(Ye):
        Xc = jnp.clip(-B * Ye / jnp.maximum(A, 1e-30), X0, X1)
        return A * Xc * Xc + 2 * B * Xc * Ye + C * Ye * Ye

    q = jnp.minimum(jnp.minimum(v_edge(X0), v_edge(X1)),
                    jnp.minimum(h_edge(Y0), h_edge(Y1)))
    return jnp.where(inside, 0.0, q)


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 300_000
    w, h, ts = 1920, 1080, 32
    scene = make_bench_scene("garden", n)
    cam = garden_cameras(1, width=w, height_px=h)
    cfg = RenderConfig(width=w, height=h, pipeline="tiled", tile_size=ts)
    d = jax.jit(lambda s, c: prepare_splats(s, c, cfg, sort=False))(scene, cam)

    grid = TileGrid.create(width=w, height=h, num_splats=n, tile_size=ts)
    x0, r0, nx, ny, cnt = _tile_rects(d["mean2d"], d["extent"], grid)
    x0, r0, nx, ny, cnt = map(np.asarray, (x0, r0, nx, ny, cnt))
    mean2d = np.asarray(d["mean2d"]); conic = np.asarray(d["conic"])
    alpha = np.asarray(d["alpha"])
    k2 = 2.0 * np.log(np.maximum(alpha, 1e-37) / cfg.alpha_cutoff)

    total_rect = int(cnt.sum())
    # exact test, vectorized over splats for each (di, dj) offset up to the
    # max rect size; instances beyond a splat's rect are masked out
    # cap the probed rect size: instances of bigger rects counted as kept
    # (conservative; big rects are rare)
    cap = 16
    max_nx, max_ny = min(int(nx.max()), cap), min(int(ny.max()), cap)
    big_inst = int(cnt[(nx > cap) | (ny > cap)].sum())
    mx, my = mean2d[:, 0], mean2d[:, 1]
    A, B, C = conic[:, 0], conic[:, 1], conic[:, 2]
    live = big_inst
    live_small = 0
    rect_small = 0
    small = cnt <= 16
    qf = jax.jit(qmin_rect)
    probed = (nx <= cap) & (ny <= cap)
    for dj in range(max_ny):
        for di in range(max_nx):
            sel = probed & (di < nx) & (dj < ny) & (cnt > 0)
            if not sel.any():
                continue
            tx = x0 + di
            trow = r0 + dj
            xx0 = tx * ts; xx1 = xx0 + ts
            yy1 = h - trow * ts; yy0 = yy1 - ts
            q = np.asarray(qf(mx, my, A, B, C,
                              xx0.astype(np.float32), xx1.astype(np.float32),
                              yy0.astype(np.float32), yy1.astype(np.float32)))
            keep = sel & (q <= k2)
            live += int(keep.sum())
            live_small += int((keep & small).sum())
            rect_small += int(sel[small].sum())
    hist = np.bincount(np.clip(cnt, 0, 20))
    print(f"n={n} rect instances={total_rect} ({total_rect/n:.2f}/splat)")
    print(f"exact-live instances={live} ({live/n:.2f}/splat)  "
          f"culled {100*(1-live/max(total_rect,1)):.1f}%")
    print(f"rects<=16 tiles: {int(small.sum())}/{n} splats, "
          f"{rect_small} rect inst -> {live_small} live "
          f"({100*(1-live_small/max(rect_small,1)):.1f}% culled)")
    print("rect-size histogram (tiles: count):",
          {i: int(v) for i, v in enumerate(hist) if v})


if __name__ == "__main__":
    main()
