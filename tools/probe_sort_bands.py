"""Accounting probe for the single-chip banded sort (RenderConfig.sort_bands).

Measures bin_splats alone at 5M, unbanded vs 2 interleaved bands (each with
its calibrated per-band capacity), DCE-proof (chained through jnp.sum over
every output). Quantifies where the end-to-end banding negative comes from:
the banded step measured 644.5 ms vs 491.1 unbanded (bench.py r5), so the
2^23-cliff saving on the sorts is swamped by duplicated per-band work — the
prime suspect is the per-band COMPACTION sort: with ~half the splats culled
per band, the expand kernel's in-place window-span check fails and each band
pays the 5-operand N-row partition sort the unbanded path skips.

Usage: python tools/probe_sort_bands.py [--splats 5000000]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--splats", type=int, default=5_000_000)
    ap.add_argument("--mult-full", type=float, default=1.819)
    ap.add_argument("--mult-band", type=float, default=0.910)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from bench import make_scene
    from splatapult_tpu.core import transforms as T
    from splatapult_tpu.ops.binning import TileGrid, bin_splats
    from splatapult_tpu.render import Camera, RenderConfig, prepare_splats
    import splatapult_tpu.ops.binning as B

    scene = jax.tree.map(jnp.asarray, make_scene(args.splats))
    cfg = RenderConfig(width=1920, height=1080, pipeline="tiled")
    cam = Camera.from_fov(
        T.look_at(eye=[0.0, 0.8, 4.5], target=[0, 0, 0], up=[0, 1, 0]),
        fovy=np.pi / 4, width=1920, height=1080)
    d = jax.jit(lambda s, c: prepare_splats(s, c, cfg, sort=False))(scene, cam)
    m2, ext, dep = d["mean2d"], d["extent"], d["depth"]

    def bench(fn):
        """fn() -> list of bins dicts; K-chained DCE-proof timing."""
        def chain(k):
            def body(_, acc):
                tot = jnp.float32(0.0)
                for b in fn():
                    for v in b.values():
                        tot = tot + jnp.sum(v).astype(jnp.float32) * 1e-30
                return acc + tot
            return jax.lax.fori_loop(0, k, body, jnp.float32(0.0))

        cj = jax.jit(chain)
        float(cj(jnp.int32(1)))

        def run(k):
            t0 = time.perf_counter()
            float(cj(jnp.int32(k)))
            return time.perf_counter() - t0

        t1 = min(run(1) for _ in range(3))
        t6 = min(run(6) for _ in range(3))
        return (t6 - t1) / 5 * 1e3

    g1 = TileGrid.create(1920, 1080, args.splats, tile_size=32, block=128,
                         max_instance_mult=args.mult_full, depth_bits=20)
    t_un = bench(lambda: [bin_splats(m2, ext, g1, depth=dep)])
    print(f"unbanded bin_splats (mult {args.mult_full}): {t_un:.1f} ms")

    g2 = TileGrid.create(1920, 1088, args.splats, tile_size=32, block=128,
                         max_instance_mult=args.mult_band, depth_bits=20,
                         row_stride=2)
    m2b = m2 + jnp.asarray([0.0, 8.0], jnp.float32)
    t_b = bench(lambda: [bin_splats(m2b, ext, g2, depth=dep, row_offset=o)
                         for o in (0, 1)])
    print(f"banded x2 bin_splats (mult {args.mult_band}/band): {t_b:.1f} ms")

    # forced-compaction A/B on the banded grids: "always" vs the auto span
    # check tells us whether the per-band compaction sort is the tax
    for mode in ("always", "never"):
        B._COMPACT_MODE = mode
        t_m = bench(lambda: [bin_splats(m2b, ext, g2, depth=dep, row_offset=o)
                             for o in (0, 1)])
        print(f"banded x2, compact={mode}: {t_m:.1f} ms"
              + (" (UNSAFE mode: timing only)" if mode == "never" else ""))
    B._COMPACT_MODE = "auto"


if __name__ == "__main__":
    main()
