"""Model families built on the kernel ladder."""

from .losses import blockwise_softmax_xent, loss_fn_blockwise
from .lora import (
    LoRAConfig,
    init_lora,
    lora_loss_fn,
    lora_num_params,
    make_lora_train_step,
    merge_lora,
)
from .transformer import (
    ModelConfig,
    data_sharding,
    forward,
    init_params,
    loss_fn,
    param_shardings,
    sgd_train_step,
)
from .wquant import WEIGHT_QUANT_TARGETS, quantize_weights

__all__ = [
    "LoRAConfig",
    "ModelConfig",
    "blockwise_softmax_xent",
    "loss_fn_blockwise",
    "data_sharding",
    "forward",
    "init_lora",
    "init_params",
    "lora_loss_fn",
    "lora_num_params",
    "loss_fn",
    "make_lora_train_step",
    "merge_lora",
    "param_shardings",
    "quantize_weights",
    "sgd_train_step",
    "WEIGHT_QUANT_TARGETS",
]
