"""GenConViT ED branch (Network A): autoencoder + ConvNeXt on both the
reconstruction and the original, concat features, 2-layer GELU head.

Spec source (behavior, not code): ref model/genconvit_ed.py —
  Encoder :8-36   5x [Conv3x3 s1 p1 -> ReLU -> MaxPool2], 3->16->32->64->128->256 (224->7)
  Decoder :38-61  5x [ConvT2x2 s2 -> ReLU], 256->128->64->32->16->3 (7->224)
  GenConViTED :63-88  x1 = backbone(dec(enc(img))), x2 = backbone(img),
                      cat -> GELU -> fc(2F->F/2) -> GELU -> fc2 -> [N,2]
Note the concat order is (reconstruction, original) — the VAE branch uses the
opposite order (SURVEY.md §3.3).
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

from genconvit_tpu.models.convnext import convnext_apply, head_out_features, init_convnext
from genconvit_tpu.ops import conv2d, conv_transpose2d, gelu, linear, max_pool2d, relu
from genconvit_tpu.ops.init import conv_init, conv_transpose_init, linear_init

_ENC_CH = (3, 16, 32, 64, 128, 256)
_DEC_CH = (256, 128, 64, 32, 16, 3)


def init_ed(key: jax.Array, backbone: str = "convnext_tiny",
            num_classes: int = 2, backbone_classes: int = 1000,
            carry_dead_params: bool = False,
            embedder: str = "swin_tiny_patch4_window7_224",
            head_act: str = "default") -> Dict:
    keys = jax.random.split(key, 16)
    ki = iter(keys)
    params: Dict[str, Any] = {
        "encoder": [
            conv_init(next(ki), 3, 3, _ENC_CH[i], _ENC_CH[i + 1]) for i in range(5)
        ],
        "decoder": [
            conv_transpose_init(next(ki), 2, 2, _DEC_CH[i], _DEC_CH[i + 1]) for i in range(5)
        ],
        "backbone": init_convnext(next(ki), backbone, backbone_classes),
    }
    num_features = backbone_classes * 2
    if head_act == "swiglu":
        # research head (docs/genconvit_v2.md): fc emits gate pairs,
        # swiglu halves them back to fc2's input width
        params["fc"] = linear_init(next(ki), num_features, num_features // 2)
    else:
        params["fc"] = linear_init(next(ki), num_features, num_features // 4)
    params["fc2"] = linear_init(next(ki), num_features // 4, num_classes)
    if carry_dead_params:
        # Checkpoint-shape parity with the reference (SURVEY.md §8 B9/Q1):
        # the Swin embedder + HybridEmbed proj exist in .pth files but never
        # run; kept here so native checkpoints mirror converted ones.
        from genconvit_tpu.models.swin import init_swin
        params["embedder"] = init_swin(next(ki), embedder, backbone_classes)
        params["hybrid_proj"] = conv_init(next(ki), 1, 1, backbone_classes, 768)
    return params


def ed_encode(params: Dict, x: jax.Array) -> jax.Array:
    for layer in params["encoder"]:
        x = conv2d(x, layer["kernel"], layer["bias"], stride=1, padding=1)
        x = relu(x)
        x = max_pool2d(x, 2, 2)
    return x


def ed_decode(params: Dict, x: jax.Array) -> jax.Array:
    for layer in params["decoder"]:
        x = conv_transpose2d(x, layer["kernel"], layer["bias"], stride=2)
        x = relu(x)
    return x


def ed_apply(params: Dict, images: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """images: [N,H,W,3] normalized. Returns (logits [N,2], recon [N,H,W,3]).

    The reference returns logits only; we also surface the reconstruction for
    the training MSE-style uses and observability (it is free under XLA DCE
    when unused)."""
    enc = ed_encode(params, images)
    dec = ed_decode(params, enc)
    # One 2N-batch backbone call instead of two N-batch calls — bitwise
    # identical (ConvNeXt has no cross-batch ops) but doubles the conv batch
    # the MXU sees and halves kernel launches.
    both = convnext_apply(params["backbone"],
                          jnp.concatenate([dec, images], axis=0))
    n = images.shape[0]
    x1, x2 = both[:n], both[n:]
    x = jnp.concatenate([x1, x2], axis=1)
    x = gelu(x)
    x = linear(x, params["fc"]["kernel"], params["fc"]["bias"])
    # head activation is shape-driven: a swiglu-head checkpoint's fc emits
    # 2x fc2's input width (gate pairs); the reference head uses GELU
    if x.shape[-1] == 2 * params["fc2"]["kernel"].shape[0]:
        from genconvit_tpu.ops.act import swiglu

        x = swiglu(x)
    else:
        x = gelu(x)
    logits = linear(x, params["fc2"]["kernel"], params["fc2"]["bias"])
    return logits, dec
