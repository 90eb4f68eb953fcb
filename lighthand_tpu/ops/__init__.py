from lighthand_tpu.ops.heatmap import (
    generate_target,
    generate_target_batch,
    generate_heatmap_max,
)
from lighthand_tpu.ops.decode import get_max_preds, soft_argmax_preds
from lighthand_tpu.ops.metrics import (
    bbox_diagonal,
    pck_2d,
    pck_2d_visible,
    pck_curve,
    epe_train,
    epe_visible,
    joints_mse_loss,
)
from lighthand_tpu.ops.procrustes import (
    compute_similarity_transform,
    reconstruction_error,
)

__all__ = [
    "generate_target",
    "generate_target_batch",
    "generate_heatmap_max",
    "get_max_preds",
    "soft_argmax_preds",
    "bbox_diagonal",
    "pck_2d",
    "pck_2d_visible",
    "pck_curve",
    "epe_train",
    "epe_visible",
    "joints_mse_loss",
    "compute_similarity_transform",
    "reconstruction_error",
]
