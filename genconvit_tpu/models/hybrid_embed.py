"""HybridEmbed equivalent (ref: model/model_embedder.py:4-44).

Q1 resolution (SURVEY.md §8): the reference assigns
`convnext.patch_embed = HybridEmbed(swin, ...)` but timm's ConvNeXt forward
never calls `patch_embed`, so these parameters are checkpoint-only. Moreover
the reference HybridEmbed *would crash if executed* with a full Swin model:
`swin(x)` returns [N,1000] logits, and `Conv2d.proj` cannot consume a 2-D
tensor — further proof the path never runs.

We therefore provide:
  * init_hybrid_embed — parameter group matching the reference checkpoint
    layout (a 1x1 conv proj with feature_dim inferred the same way: the
    embedder's *final output* channel count, i.e. its classifier width), so
    converted .pth files round-trip (SURVEY.md §8 B9);
  * hybrid_embed_tokens — a *working* research path (`use_hybrid_embed=True`)
    that projects Swin token features [N,L,768] -> [N,L,embed_dim], which is
    what the HybridEmbed docstring describes but the reference never does.
"""

from __future__ import annotations

from typing import Dict

import jax

from genconvit_tpu.models.swin import SWIN_CFGS, init_swin, swin_features
from genconvit_tpu.ops import linear
from genconvit_tpu.ops.init import conv_init


def init_hybrid_embed(key: jax.Array, embedder: str = "swin_tiny_patch4_window7_224",
                      embed_dim: int = 768, backbone_classes: int = 1000) -> Dict:
    k_swin, k_proj = jax.random.split(key)
    # feature_dim probes the embedder's output: a full timm Swin classifier
    # returns [N, num_classes] -> feature_dim == 1000 in the shipped checkpoints.
    return {
        "backbone": init_swin(k_swin, embedder, num_classes=backbone_classes),
        "proj": conv_init(k_proj, 1, 1, backbone_classes, embed_dim),
    }


def hybrid_embed_tokens(params: Dict, x: jax.Array,
                        embedder: str = "swin_tiny_patch4_window7_224") -> jax.Array:
    """Working token path: [N,H,W,3] -> [N, L, embed_dim]."""
    feats = swin_features(params["backbone"], x, embedder)  # [N, L, C_final]
    # proj kernel is [1,1,feature_dim,embed_dim]; tokens use it as a dense map
    # over the channel axis. C_final (e.g. 768) may differ from the checkpoint
    # feature_dim (1000, the classifier width) — the research path projects
    # from the true token width instead.
    k = params["proj"]["kernel"][0, 0]
    if k.shape[0] != feats.shape[-1]:
        raise ValueError(
            f"hybrid-embed proj expects {k.shape[0]} channels, got {feats.shape[-1]}; "
            "init a research-path proj with feature_dim == swin token width"
        )
    return linear(feats, k, params["proj"]["bias"])
