"""Multi-chip SPMD: tile/view sharding over a jax.sharding.Mesh.

The reference is strictly single-process, single-GPU (SURVEY.md section 2.3);
everything here is new design required by the BASELINE north star:

- **Tile parallelism** (the data-parallel axis of this domain): the image's
  tile *rows* are sharded across the ``tiles`` mesh axis. Each chip runs the
  identical jitted pipeline on its horizontal band — projection/SH are
  computed replicated (cheap, O(N)); binning, the in-sort depth ordering and
  compositing touch only the chip's own band (the dominant cost,
  O(instances * pixels)).
- **View parallelism**: camera batches shard over a ``views`` axis
  (the scaled-up analog of the reference's stereo pair, src/app.cpp:603-607).
- **Gradients**: parameter gradients are partial per shard and completed by an
  explicit psum AFTER per-shard differentiation (_sharded_value_and_grad); XLA
  schedules those collectives asynchronously against the remaining backward
  compute over ICI.

Everything works identically on a real pod slice and on the CPU host platform
with ``--xla_force_host_platform_device_count=N`` (how tests and the driver's
dry-run exercise it).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P

from splatapult_tpu.render import Camera, RenderConfig, prepare_splats


def make_render_mesh(num_tile_shards: Optional[int] = None, num_view_shards: int = 1,
                     devices=None) -> Mesh:
    """Mesh with ('views', 'tiles') axes over the available devices."""
    devices = list(devices if devices is not None else jax.devices())
    if num_tile_shards is None:
        num_tile_shards = len(devices) // num_view_shards
    n = num_view_shards * num_tile_shards
    assert n <= len(devices), (n, len(devices))
    import numpy as np

    dev_array = np.asarray(devices[:n]).reshape(num_view_shards, num_tile_shards)
    return Mesh(dev_array, ("views", "tiles"))


def _padded_height(config: RenderConfig, num_shards: int) -> int:
    """Image height padded so tile rows divide evenly across shards."""
    band = config.tile_size * num_shards
    return -(-config.height // band) * band


def _shard_config(config: RenderConfig, num_shards: int) -> RenderConfig:
    return dataclasses.replace(config, height=_padded_height(config, num_shards) // num_shards)


def _composite_band(sorted_splats, shard_index, num_shards, config: RenderConfig):
    """Composite this chip's horizontal band of the image.

    The band becomes a standalone image of height H/num_shards by shifting the
    splats' screen-space y so the band's bottom edge is y = 0; binning and the
    Pallas kernels run unchanged.
    """
    from splatapult_tpu.ops.tiled import composite_tiled

    cfg_band = _shard_config(config, num_shards)
    h_pad = _padded_height(config, num_shards)
    band_h = cfg_band.height
    # band d covers image rows [d*band_h, (d+1)*band_h) from the top; in gl
    # (+y up) coordinates its bottom edge sits at h_pad - (d+1)*band_h... but
    # mean2d was produced against the *true* height, so shift relative to that.
    y_bottom = config.height - (shard_index + 1) * band_h
    shifted = dict(sorted_splats)
    shifted["mean2d"] = sorted_splats["mean2d"] - jnp.stack(
        [jnp.zeros_like(y_bottom, dtype=jnp.float32), y_bottom.astype(jnp.float32)]
    )
    return composite_tiled(shifted, cfg_band)  # [band_h, W, 4]


def render_sharded(scene, camera: Camera, config: RenderConfig, mesh: Mesh) -> jax.Array:
    """Single view, tiles sharded across the mesh's 'tiles' axis -> [H, W, 4].

    Scene parameters and the camera are replicated; the output image is sharded
    by rows. Crops away the shard-divisibility padding.
    """
    num_shards = mesh.shape["tiles"]

    def shard_fn(scene, camera):
        splats = prepare_splats(scene, camera, config, sort=False)
        d = lax.axis_index("tiles")
        return _composite_band(splats, d, num_shards, config)

    out = jax.shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(P(), P()),
        out_specs=P("tiles", None, None),
        check_vma=False,
    )(scene, camera)
    return out[: config.height]


def render_batch_sharded(scene, cameras: Camera, config: RenderConfig, mesh: Mesh) -> jax.Array:
    """[V]-batched cameras -> [V, H, W, 4]; views over 'views', tiles over 'tiles'."""
    num_shards = mesh.shape["tiles"]

    def shard_fn(scene, cameras):
        def one_view(cam):
            splats = prepare_splats(scene, cam, config, sort=False)
            d = lax.axis_index("tiles")
            return _composite_band(splats, d, num_shards, config)

        return jax.vmap(one_view)(cameras)

    out = jax.shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(P(), P("views")),
        out_specs=P("views", "tiles", None, None),
        check_vma=False,
    )(scene, cameras)
    return out[:, : config.height]


@functools.lru_cache(maxsize=32)
def make_sharded_train_step(config: RenderConfig, mesh: Mesh, optimizer=None,
                            sh_psum_chunks: int = 1,
                            grad_allreduce: str = "psum"):
    """Build (and cache) the jitted SPMD train step for (config, mesh, optimizer).

    Rebuilding the shard_map per call would re-trace and re-compile the whole
    SPMD program every step; training loops must reuse this compiled function.

    NOTE the lru_cache keys on the ``optimizer`` OBJECT: optax
    GradientTransformations are NamedTuples of fresh closures, so two
    `optax.adam(1e-3)` calls are DIFFERENT keys — construct the optimizer
    once and reuse it, or every call recompiles the whole SPMD program
    (and the cache retains up to 32 of them).
    """

    def step_fn(scene, cameras, targets, opt_state):
        loss, grads = _sharded_value_and_grad(
            scene, cameras, targets, config, mesh,
            sh_psum_chunks=sh_psum_chunks, grad_allreduce=grad_allreduce)
        if optimizer is None:
            return loss, grads, None
        updates, opt_state = optimizer.update(grads, opt_state, scene)
        import optax

        new_scene = optax.apply_updates(scene, updates)
        return loss, new_scene, opt_state

    return jax.jit(step_fn)


def sharded_train_step(scene, cameras: Camera, targets, config: RenderConfig, mesh: Mesh,
                       optimizer=None, opt_state=None, sh_psum_chunks: int = 1,
                       grad_allreduce: str = "psum"):
    """One SPMD optimization step: render camera batch, L2 loss vs targets,
    grads to all splat parameters all-reduced across the mesh, optional optax
    update. Returns (loss, grads_or_updated_scene, new_opt_state).

    Compiled once per (config, mesh, optimizer) via make_sharded_train_step.
    """
    return make_sharded_train_step(config, mesh, optimizer, sh_psum_chunks,
                                   grad_allreduce)(
        scene, cameras, targets, opt_state)


def ring_all_reduce(x, axis_name: str):
    """All-reduce over ONE named axis as an explicit ppermute ring.

    The manual alternative SURVEY.md section 5 names for the north-star
    overlap: a ring reduce-scatter (D-1 permute+add steps) followed by a ring
    all-gather (D-1 permute steps), all expressed as `lax.ppermute` — 2(D-1)
    INDEPENDENT small collectives instead of one monolithic all-reduce. A
    monolithic terminal all-reduce is combined and sunk by this XLA (AOT
    evidence: tools/aot_overlap_hlo.py), leaving nothing to overlap; a chain
    of permutes gives the latency-hiding scheduler points to interleave the
    remaining backward compute. Bandwidth-optimal: each element crosses each
    link 2(D-1)/D times, the same as the ring the all-reduce would run.
    """
    d = lax.psum(1, axis_name)  # static axis size
    if d == 1:
        return x
    idx = lax.axis_index(axis_name)
    shape = x.shape
    flat = x.reshape(-1)
    pad = (-flat.shape[0]) % d
    if pad:
        flat = jnp.pad(flat, (0, pad))
    flat = flat.reshape(d, -1)
    fwd = [(i, (i + 1) % d) for i in range(d)]

    def chunk(k):
        return lax.dynamic_index_in_dim(flat, lax.rem(k + 2 * d, d), axis=0,
                                        keepdims=False)

    # reduce-scatter: a partial created at device m targets chunk (m - 1);
    # after D-1 permute+add hops, device i holds the full sum of chunk i
    acc = chunk(idx - 1)
    for s in range(d - 1):
        acc = lax.ppermute(acc, axis_name, fwd)
        acc = acc + chunk(idx - s - 2)
    # all-gather: circulate the finished chunks back around the ring
    out = lax.dynamic_update_index_in_dim(
        jnp.zeros_like(flat), acc, lax.rem(idx + 2 * d, d), axis=0)
    cur = acc
    for s in range(d - 1):
        cur = lax.ppermute(cur, axis_name, fwd)
        out = lax.dynamic_update_index_in_dim(
            out, cur, lax.rem(idx - s - 1 + 2 * d, d), axis=0)
    out = out.reshape(-1)
    if pad:
        out = out[: out.shape[0] - pad]
    return out.reshape(shape)


def ring_psum(x, axes) -> jax.Array:
    """All-reduce over the named axes via sequential per-axis ppermute rings
    (ring over 'tiles', then 'views' — a sum of sums is the total sum)."""
    for ax in axes:
        x = ring_all_reduce(x, ax)
    return x


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def _psum_in_bwd(x, axes):
    """Identity forward; all-reduces the COTANGENT across ``axes``.

    Placing the gradient all-reduce *inside* the backward graph — at the
    exact point the cotangent materializes — instead of after value_and_grad
    returns is what makes overlap possible at all: AOT-compiling the train
    step for a v5e-8 topology (tools/aot_overlap_hlo.py) showed that
    post-hoc leaf psums get combined into ONE tuple all-reduce scheduled
    dead last (after the entire backward), where no compute remains to hide
    it behind. d_sh materializes at the SH-basis transpose matmul, BEFORE
    the projection backward (d_means/d_quats/d_scales) runs, so an
    all-reduce issued here has the whole projection backward to overlap
    with on a real slice.
    """
    return x


def _psum_in_bwd_fwd(x, axes):
    return x, None


def _psum_in_bwd_bwd(axes, _, g):
    return (lax.psum(g, axes),)


_psum_in_bwd.defvjp(_psum_in_bwd_fwd, _psum_in_bwd_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def _ring_psum_in_bwd(x, axes):
    """_psum_in_bwd with the cotangent all-reduced as an explicit ppermute
    ring (see ring_all_reduce) instead of one monolithic lax.psum."""
    return x


def _ring_psum_in_bwd_fwd(x, axes):
    return x, None


def _ring_psum_in_bwd_bwd(axes, _, g):
    return (ring_psum(g, axes),)


_ring_psum_in_bwd.defvjp(_ring_psum_in_bwd_fwd, _ring_psum_in_bwd_bwd)


def _sharded_value_and_grad(scene, cameras: Camera, targets, config: RenderConfig, mesh: Mesh,
                           sh_psum_chunks: int = 1, grad_allreduce: str = "psum"):
    """(loss, grads) with tile/view sharding and explicit cross-chip psum.

    The SH gradient — 48 of the 61 gradient floats per splat, the
    all-reduce's byte budget — is all-reduced INSIDE the backward via
    _psum_in_bwd, as early as its cotangent exists; the small remaining
    leaves (means/opacities/scales/quats, 13 floats) ride one final psum.
    The reference, being forward-only and single-GPU, has no analog
    (SURVEY.md section 2.3).

    ``sh_psum_chunks > 1`` additionally splits the in-backward SH all-reduce
    into that many coefficient-band chunks with one psum each, giving the
    scheduler independent smaller collectives to pipeline
    (tools/profile_overlap.py / tools/aot_overlap_hlo.py measure this).

    ``grad_allreduce="ring"`` swaps the in-backward SH all-reduce for the
    manual chunked ppermute ring (ring_all_reduce): this XLA combines and
    sinks monolithic terminal all-reduces where nothing can hide them (AOT
    evidence, PERF.md "grad-overlap"); a ring of 2(D-1) independent permutes
    gives the scheduler interleaving points without waiting for async
    all-reduce support. "psum" stays the default.
    """
    assert grad_allreduce in ("psum", "ring"), grad_allreduce
    num_shards = mesh.shape["tiles"]
    band_h = _shard_config(config, num_shards).height
    axes = ("views", "tiles")
    marker = _psum_in_bwd if grad_allreduce == "psum" else _ring_psum_in_bwd

    def shard_loss(scene, cameras, targets):
        # SH grads all-reduce in-backward (see _psum_in_bwd). The marker
        # sits OUTSIDE the view vmap: its cotangent is this shard's full
        # d_sh (already summed over the shard's views).
        k = scene.sh.shape[-1]
        if sh_psum_chunks > 1 and k % sh_psum_chunks == 0:
            step = k // sh_psum_chunks
            sh = jnp.concatenate(
                [marker(scene.sh[..., i * step:(i + 1) * step], axes)
                 for i in range(sh_psum_chunks)], axis=-1)
        else:
            sh = marker(scene.sh, axes)
        scene = dataclasses.replace(scene, sh=sh)
        d = lax.axis_index("tiles")

        def one_view(cam, tgt):
            splats = prepare_splats(scene, cam, config, sort=False)
            band = _composite_band(splats, d, num_shards, config)
            # crop the padded rows out of the loss on the last band
            row0 = d * band_h
            rows = row0 + jnp.arange(band_h)
            valid = (rows < config.height)[:, None, None]
            return jnp.sum(jnp.where(valid, (band - tgt) ** 2, 0.0))

        # local (this shard's) sum only — the cross-shard psum happens AFTER
        # differentiation; differentiating through lax.psum would scale the
        # cotangents by the device count (psum's transpose is psum).
        return jnp.sum(jax.vmap(one_view)(cameras, targets))

    def loss_fn(scene, cameras, targets):
        denom = targets.shape[0] * mesh.shape["views"] * config.height * config.width * 4
        return shard_loss(scene, cameras, targets) / denom

    grad_fn = jax.value_and_grad(loss_fn)

    def shard_step(scene, cameras, targets):
        loss, grads = grad_fn(scene, cameras, targets)
        # grads.sh was already all-reduced inside the backward (_psum_in_bwd,
        # where compute remains to hide it behind); the small remaining
        # leaves ride one terminal psum. Do NOT tree-map over grads: a
        # second psum of sh would double-count.
        loss = lax.psum(loss, axes)
        grads = dataclasses.replace(
            grads,
            means=lax.psum(grads.means, axes),
            opacities=lax.psum(grads.opacities, axes),
            log_scales=lax.psum(grads.log_scales, axes),
            quats=lax.psum(grads.quats, axes),
        )
        return loss, grads

    return jax.shard_map(
        shard_step,
        mesh=mesh,
        in_specs=(P(), P("views"), P("views", "tiles", None, None)),
        out_specs=(P(), P()),
        check_vma=False,
    )(scene, cameras, targets)


def shard_targets(targets, config: RenderConfig, mesh: Mesh):
    """Pad [V, H, W, 4] target images to the sharded height and return them
    (callers place them with P('views', 'tiles') sharding)."""
    num_shards = mesh.shape["tiles"]
    h_pad = _padded_height(config, num_shards)
    pad = h_pad - targets.shape[1]
    if pad:
        targets = jnp.pad(targets, ((0, 0), (0, pad), (0, 0), (0, 0)))
    return targets
