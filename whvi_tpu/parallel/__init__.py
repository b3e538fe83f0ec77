from whvi_tpu.parallel.mesh import (
    make_mesh,
    make_sharded_train_step,
    sharded_loss_fn,
)

__all__ = ["make_mesh", "make_sharded_train_step", "sharded_loss_fn"]
