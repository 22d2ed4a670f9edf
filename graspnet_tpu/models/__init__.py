from graspnet_tpu.models.graspnet import (
    init_graspnet,
    graspnet_forward,
    pred_decode,
)

__all__ = ["init_graspnet", "graspnet_forward", "pred_decode"]
