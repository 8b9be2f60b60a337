"""Scene-scale image evidence for the depth_bits=16 production default
(VERDICT r3 item 5).

The bench default packs (tile << 16 | top-16 f32 depth bits) into one sort
key; ordering within a tile is bf16-precision depth with the reference's
submission-order tie-break. Small-scene ordering tests exist
(tests/test_tiled.py); this probe renders PRODUCTION-SCALE scenes (1M ball,
1.5M garden stand-in; 1080p) with depth_bits 16 vs 32 on the real chip and
prints the image diff — the committed evidence the default rests on. The
reference reverted its own 24-bit radix keys over visible artifacts
(src/splatrenderer.cpp:165-169); 16-bit MANTISSA-truncated f32 depth is a
different beast (relative precision everywhere, not absolute), and the
numbers below are the proof.

Run: python tools/probe_depth16_image.py [--save-png]
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--save-png", action="store_true",
                    help="write the depth16/depth32 pair + diff to tools/out_*")
    ap.add_argument("--splats", type=int, default=0, help="0 = both scenes")
    ap.add_argument("--bits", type=int, default=16, choices=(16, 20),
                    help="packed-key variant to diff against exact depth 32")
    args = ap.parse_args()

    import dataclasses

    import jax
    import jax.numpy as jnp

    import bench
    from splatapult_tpu.render import RenderConfig, calibrate_config, render

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/splatapult_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass

    jobs = ([("ball", 1_000_000), ("garden", 1_500_000)]
            if args.splats == 0 else [("ball", args.splats)])
    for kind, n in jobs:
        scene = jax.tree.map(jnp.asarray, bench.make_bench_scene(kind, n))
        ns = argparse.Namespace(views=1, width=1920, height=1080)
        cam = bench._make_cameras(ns, kind)
        cfg = RenderConfig(width=1920, height=1080, pipeline="tiled",
                           forward_only=True, early_stop_eps=1e-4)
        cfg = calibrate_config(scene, cam, cfg, bucket=1.0)
        imgs = {}
        for bits in (32, args.bits):
            c = dataclasses.replace(cfg, depth_bits=bits)
            imgs[bits] = np.asarray(render(scene, cam, c))
        d = np.abs(imgs[args.bits].astype(np.float64) - imgs[32].astype(np.float64))
        n_diff = int((d.max(axis=-1) > 1e-6).sum())
        print(f"{kind} {n} 1080p depth{args.bits}-vs-32: max {d.max():.3e} "
              f"mean {d.mean():.3e} p99.9 {np.quantile(d, 0.999):.3e} "
              f"pixels-differing {n_diff} "
              f"({100.0 * n_diff / (1920 * 1080):.4f}%)", flush=True)
        if args.save_png:
            from splatapult_tpu.utils.image import save_png

            for bits in (args.bits, 32):
                save_png(f"tools/out_{kind}_depth{bits}.png", imgs[bits])
            amp = np.clip(d[..., :3] * 100.0, 0.0, 1.0).astype(np.float32)
            save_png(f"tools/out_{kind}_depthdiff_x100.png",
                     np.concatenate([amp, np.ones_like(amp[..., :1])], axis=-1))


if __name__ == "__main__":
    main()
