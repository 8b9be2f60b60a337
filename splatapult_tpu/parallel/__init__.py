from splatapult_tpu.parallel.mesh import (
    make_render_mesh,
    render_sharded,
    render_batch_sharded,
    sharded_train_step,
)

__all__ = [
    "make_render_mesh",
    "render_sharded",
    "render_batch_sharded",
    "sharded_train_step",
]
