"""Time the PRODUCTION feature gather in isolation at a given scene scale.

Builds real bins (onehot kernel path) for the ball scene at N splats and
times exactly what composite_from_feats does: jnp.take of the packed
[N+1, 8]-int32 feature table at bins["inst_splat"] ([mcap] indices, real
distribution incl. nulls/pads). Settles the 5M sort-transport question
(PERF.md round-2, "5M superlinearity") with a direct number.

Usage: python tools/probe_gather_real.py [n_splats]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time

import numpy as np


def _t(f):
    t0 = time.perf_counter()
    f()
    return time.perf_counter() - t0


def main():
    import jax
    import jax.numpy as jnp

    from bench import make_scene
    from splatapult_tpu.core import transforms as T
    from splatapult_tpu.ops.binning import TileGrid, bin_splats
    from splatapult_tpu.ops.composite import _pack_color_feats
    from splatapult_tpu.ops.tiled import pack_features
    from splatapult_tpu.render import Camera, RenderConfig, prepare_splats

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 5_000_000
    w, h = 1920, 1080
    scene = make_scene(n)
    cam = Camera.from_fov(
        T.look_at(eye=[0.0, 0.8, 4.5], target=[0, 0, 0], up=[0, 1, 0]),
        fovy=np.pi / 4, width=w, height=h,
    )
    cfg = RenderConfig(width=w, height=h, pipeline="tiled", packed_colors=True)
    grid = TileGrid.create(width=w, height=h, num_splats=n, tile_size=32,
                           block=128, max_instance_mult=1.82,
                           packed_colors=True)

    @jax.jit
    def build(s, c):
        d = prepare_splats(s, c, cfg, sort=False)
        bins = bin_splats(d["mean2d"], d["extent"], grid, depth=d["depth"])
        feats = pack_features(d["mean2d"], d["conic"], d["rgb"], d["alpha"])
        return _pack_color_feats(feats), bins["inst_splat"]

    table, idx = jax.block_until_ready(build(scene, cam))
    m = idx.shape[0]
    print(f"n={n} mcap={m} table={table.shape} ({table.nbytes/1e6:.0f} MB)")

    k = 6

    def k_steps(tab, ix, kk):
        def body(_, carry):
            g = jnp.take(tab + carry.astype(tab.dtype), ix, axis=0)
            return jnp.sum(g.astype(jnp.float32)) * 1e-30

        return jax.lax.fori_loop(0, kk, body, jnp.float32(0.0))

    r = jax.jit(k_steps)

    def run(name, ix):
        float(r(table, ix, jnp.int32(1)))
        t1 = min(_t(lambda: float(r(table, ix, jnp.int32(1)))) for _ in range(3))
        tk = min(_t(lambda: float(r(table, ix, jnp.int32(k)))) for _ in range(3))
        dt = (tk - t1) / (k - 1) if tk > t1 else tk / k
        print(f"{name:36s} {dt * 1e3:8.2f} ms  ({dt / m * 1e9:5.2f} ns/idx)",
              flush=True)

    rng = np.random.default_rng(0)
    run("production idx (tile,depth-sorted)", idx)
    # same count, same table: which part of the production cost is the
    # PATTERN vs the table size?
    run("uniform random idx",
        jnp.asarray(rng.integers(0, n, m, dtype=np.int32)))
    run("production idx, ascending-sorted", jnp.sort(idx))
    run("random idx confined to n/8 window",
        jnp.asarray(rng.integers(0, max(n // 8, 1), m, dtype=np.int32)))

    # column-split: two [N, 4] tables of half the bytes each — if the ~3x
    # small-table speedup is VMEM residency (the 1M/32MB production gather
    # runs 3.5 ns/idx; >= 170 MB pays ~15), two sequential half-width
    # gathers may each enjoy it
    ta, tb = table[:, :4], table[:, 4:]

    def k_steps2(a, b, ix, kk):
        def body(_, carry):
            ga = jnp.take(a + carry.astype(a.dtype), ix, axis=0)
            gb = jnp.take(b + carry.astype(b.dtype), ix, axis=0)
            return (jnp.sum(ga.astype(jnp.float32))
                    + jnp.sum(gb.astype(jnp.float32))) * 1e-30

        return jax.lax.fori_loop(0, kk, body, jnp.float32(0.0))

    r2 = jax.jit(k_steps2)
    float(r2(ta, tb, idx, jnp.int32(1)))
    t1 = min(_t(lambda: float(r2(ta, tb, idx, jnp.int32(1)))) for _ in range(3))
    tk = min(_t(lambda: float(r2(ta, tb, idx, jnp.int32(k)))) for _ in range(3))
    dt = (tk - t1) / (k - 1) if tk > t1 else tk / k
    print(f"{'column-split 2 x [N,4] gathers':36s} {dt * 1e3:8.2f} ms  "
          f"({dt / m * 1e9:5.2f} ns/idx combined)")


if __name__ == "__main__":
    main()
