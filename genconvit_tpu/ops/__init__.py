"""Functional NHWC ops for the TPU compute path.

All ops are pure functions over explicit parameter dicts. Conventions:
  - activations: NHWC
  - conv kernels: HWIO (depthwise via feature_group_count)
  - conv-transpose kernels: HWIO of the *forward* conv view (converter handles
    the torch IOHW + spatial-flip transform)
  - linear kernels: (in, out), y = x @ w + b
"""

from genconvit_tpu.ops.act import gelu, leaky_relu, relu, sigmoid  # noqa: F401
from genconvit_tpu.ops.conv import conv2d, conv_transpose2d  # noqa: F401
from genconvit_tpu.ops.linear import linear  # noqa: F401
from genconvit_tpu.ops.norm import batch_norm, layer_norm  # noqa: F401
from genconvit_tpu.ops.pool import global_avg_pool, max_pool2d  # noqa: F401
from genconvit_tpu.ops.resize import (  # noqa: F401
    resize_area,
    resize_bilinear_torch,
    resize_weight_matrix,
)
