from whvi_tpu.parallel.distributed import init_distributed, is_multi_host
from whvi_tpu.parallel.mesh import (
    make_mesh,
    make_sharded_predict,
    make_sharded_train_step,
    sharded_loss_fn,
)

__all__ = [
    "init_distributed",
    "is_multi_host",
    "make_mesh",
    "make_sharded_predict",
    "make_sharded_train_step",
    "sharded_loss_fn",
]
