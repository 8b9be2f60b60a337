from splatapult_tpu.parallel.mesh import (
    band_instance_demands,
    calibrate_config_sharded,
    make_render_mesh,
    make_sharded_fit_steps,
    prepare_splats_sharded,
    render_sharded,
    render_batch_sharded,
    shard_targets,
    sharded_train_step,
)

__all__ = [
    "band_instance_demands",
    "calibrate_config_sharded",
    "make_render_mesh",
    "make_sharded_fit_steps",
    "prepare_splats_sharded",
    "render_sharded",
    "render_batch_sharded",
    "shard_targets",
    "sharded_train_step",
]
