"""Model families built on the kernel ladder."""

from .transformer import (
    ModelConfig,
    data_sharding,
    forward,
    init_params,
    loss_fn,
    param_shardings,
    sgd_train_step,
)

__all__ = [
    "ModelConfig",
    "data_sharding",
    "forward",
    "init_params",
    "loss_fn",
    "param_shardings",
    "sgd_train_step",
]
