"""TPU-native op library: the compute primitives under every model.

Each module documents which reference native op it replaces
(see SURVEY.md section 2.2).
"""

from .warp import grid_sample, flow_warp, fb_consistency_check, coords_grid
from .resize import resize_2x_window, resize_bilinear, resize_nearest, upflow8
from .patches import unfold, fold, fold_normalizer
from .pool import max_pool2d, avg_pool2d
from .conv import (
    conv2d,
    conv3d,
    pconv2d,
    pconv3d,
    linear,
    leaky_relu,
    layer_norm,
    instance_norm,
    batch_norm_eval,
)
from .deform_conv import deform_conv2d
from .dilation import binary_dilation, binarize

__all__ = [
    "grid_sample",
    "flow_warp",
    "fb_consistency_check",
    "coords_grid",
    "resize_2x_window",
    "resize_bilinear",
    "resize_nearest",
    "upflow8",
    "unfold",
    "fold",
    "fold_normalizer",
    "max_pool2d",
    "avg_pool2d",
    "conv2d",
    "conv3d",
    "pconv2d",
    "pconv3d",
    "linear",
    "leaky_relu",
    "layer_norm",
    "instance_norm",
    "batch_norm_eval",
    "deform_conv2d",
    "binary_dilation",
    "binarize",
]
