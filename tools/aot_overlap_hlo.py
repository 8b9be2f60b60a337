"""AOT-compile the SPMD train step for a v5e 2x4 topology; inspect overlap.

The north-star claim — grad all-reduces overlapped with backward compute —
needs >= 2 real chips to *time*, but the XLA:TPU *schedule* is decided at
compile time. jax.experimental.topologies lets us compile the exact
multi-chip program for a v5e-8 slice without owning one, then read the
compiled module:

- `all-reduce-start` / `all-reduce-done` pairs = async collectives;
- the number of (fusion/matmul/sort) ops scheduled BETWEEN a start and its
  done = compute XLA hides under that collective's ICI time.

Usage: python tools/aot_overlap_hlo.py [--splats 40000] [--sh-chunks 1|4]
"""

import argparse
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--splats", type=int, default=40000)
    ap.add_argument("--width", type=int, default=512)
    ap.add_argument("--height", type=int, default=256)
    ap.add_argument("--sh-chunks", type=int, default=1)
    ap.add_argument("--allreduce", default="psum", choices=("psum", "ring"),
                    help="ring = the manual ppermute ring all-reduce "
                         "(parallel/mesh.ring_all_reduce); the report then "
                         "counts compute scheduled between the ring's "
                         "collective-permute steps")
    ap.add_argument("--topology", default="v5e:2x4")
    ap.add_argument("--dump", default="")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.experimental import topologies
    from jax.sharding import Mesh

    topo = topologies.get_topology_desc(platform="tpu",
                                        topology_name=args.topology)
    devs = np.asarray(topo.devices).reshape(1, -1)
    mesh = Mesh(devs, ("views", "tiles"))
    n_dev = devs.size
    print(f"AOT topology {args.topology}: {n_dev} devices")

    from bench import make_bench_scene
    from splatapult_tpu.io.synth import garden_cameras
    from splatapult_tpu.parallel import mesh as M
    from splatapult_tpu.render import Camera, RenderConfig

    config = RenderConfig(width=args.width, height=args.height,
                          pipeline="tiled", max_instance_mult=6.0,
                          early_stop_eps=1e-4)

    def step(scene, cams, targets):
        return M._sharded_value_and_grad(
            scene, cams, targets, config, mesh, sh_psum_chunks=args.sh_chunks,
            grad_allreduce=args.allreduce)

    scene = make_bench_scene("garden", args.splats)
    cam1 = garden_cameras(1, width=args.width, height_px=args.height)
    cams = Camera(cam_to_world=cam1.cam_to_world[None], proj=cam1.proj[None])
    h_pad = M._padded_height(config, mesh.shape["tiles"])
    tshape = jax.ShapeDtypeStruct((1, h_pad, args.width, 4), jnp.float32)
    abstract = jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(np.shape(x), jnp.float32),
        (scene, cams))
    lowered = jax.jit(step).trace(*abstract, tshape).lower()
    compiled = lowered.compile()
    txt = compiled.as_text()
    if args.dump:
        with open(args.dump, "w") as f:
            f.write(txt)

    lines = txt.splitlines()
    op_re = re.compile(r"= \S+ (fusion|sort|dot|custom-call|convolution)")

    def report_pairs(kind):
        starts = [i for i, l in enumerate(lines) if f"{kind}-start" in l
                  and "=" in l and "done" not in l]
        print(f"async {kind} pairs in compiled HLO: {len(starts)}")
        total_between = 0
        for i in starts:
            m = re.search(rf"%?({kind}-start[.\w]*)", lines[i])
            name = m.group(1) if m else "?"
            done_idx = next(
                (j for j in range(i + 1, len(lines))
                 if f"{kind}-done" in lines[j] and name in lines[j]),
                None)
            if done_idx is None:
                continue
            between = sum(1 for l in lines[i + 1:done_idx] if op_re.search(l))
            total_between += between
            # bytes of the collective operand
            mb = re.search(r"f32\[([\d,]+)\]", lines[i])
            size = np.prod([int(x) for x in mb.group(1).split(",")]) * 4 if mb else 0
            print(f"  {name}: {between} compute ops scheduled between "
                  f"start/done ({size / 1e6:.1f} MB operand)")
        return len(starts), total_between

    n_ar, _ = report_pairs("all-reduce")
    n_cp, cp_between = report_pairs("collective-permute")
    if args.allreduce == "ring":
        # Additionally: compute interleaved anywhere WITHIN the ring chain
        # (between one permute's done and the next one's start) also hides
        # ring latency — the ring's win doesn't need async pairs at all
        cp_lines = [i for i, l in enumerate(lines) if "collective-permute" in l
                    and "=" in l]
        if len(cp_lines) >= 2:
            inner = sum(1 for l in lines[cp_lines[0]:cp_lines[-1]]
                        if op_re.search(l))
            print(f"ring chain: {len(cp_lines)} collective-permute ops; "
                  f"{inner} compute ops scheduled inside the chain span")


if __name__ == "__main__":
    main()
