"""GenConViT VAE branch (Network B): conv VAE + ConvNeXt on both the original
and the reconstruction, concat features, 2-layer ReLU head.

Spec source (behavior, not code): ref model/genconvit_vae.py —
  Encoder :10-60  4x [Conv3x3 s2 p1 -> BN -> LeakyReLU], 3->16->32->64->128
                  (224->14); flatten (torch CHW order); mu/var: Linear(25088->12544)
  reparameterize :43-49  **quirk B4**: std = exp(0.5 * mu(x)); z = eps*std + mu(x)
                  (the `var` head feeds only the KL term :56-58, kl_weight=0.5)
  Decoder :62-88  unflatten z -> (256,7,7); 4x [ConvT2x2 s2 -> LeakyReLU] -> 3@112
  GenConViTVAE :90-115  x1 = backbone(x), x2 = backbone(x_hat) (order is
                  original-then-recon — opposite of ED), cat -> ReLU -> fc ->
                  ReLU -> fc2; returns (logits, resize224(x_hat))
Dead parameter groups carried for checkpoint round-trip (SURVEY.md §8 B9):
encoder fc1/fc2, model-level fc3.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from genconvit_tpu.models.convnext import convnext_apply, init_convnext
from genconvit_tpu.ops import (
    batch_norm,
    conv2d,
    conv_transpose2d,
    leaky_relu,
    linear,
    relu,
    resize_bilinear_torch,
)
from genconvit_tpu.ops.init import (
    batch_norm_init,
    conv_init,
    conv_transpose_init,
    linear_init,
)

_ENC_CH = (3, 16, 32, 64, 128)
_DEC_CH = (256, 64, 32, 16, 3)
KL_WEIGHT = 0.5  # ref model/genconvit_vae.py:40


def init_vae(key: jax.Array, backbone: str = "convnext_tiny", img_size: int = 224,
             latent_dims: Optional[int] = None, num_classes: int = 2,
             backbone_classes: int = 1000, carry_dead_params: bool = False,
             embedder: str = "swin_tiny_patch4_window7_224",
             head_act: str = "default", skip_latent_heads: bool = False) -> Dict:
    """skip_latent_heads omits the two ~315M-param mu/var Linears (the caller
    generates them elsewhere, e.g. directly on the accelerator — see
    infer/engine.py random-init path); the key stream is advanced identically
    so every other leaf matches the skip_latent_heads=False tree."""
    feat_hw = img_size // 16          # 14 for 224
    flat = 128 * feat_hw * feat_hw    # 25088 for 224
    if latent_dims is None:
        latent_dims = 256 * (img_size // 32) ** 2  # 12544 for 224
    keys = jax.random.split(key, 20)
    ki = iter(keys)
    enc: Dict[str, Any] = {
        "convs": [conv_init(next(ki), 3, 3, _ENC_CH[i], _ENC_CH[i + 1]) for i in range(4)],
        "bns": [batch_norm_init(_ENC_CH[i + 1]) for i in range(4)],
    }
    k_mu, k_var = next(ki), next(ki)
    if not skip_latent_heads:
        enc["mu"] = linear_init(k_mu, flat, latent_dims)
        enc["var"] = linear_init(k_var, flat, latent_dims)
    if carry_dead_params:
        enc["fc1"] = linear_init(next(ki), flat, 256)  # dead (B9)
        enc["fc2"] = linear_init(next(ki), 256, 128)   # dead (B9)
    params: Dict[str, Any] = {
        "encoder": enc,
        "decoder": [
            conv_transpose_init(next(ki), 2, 2, _DEC_CH[i], _DEC_CH[i + 1]) for i in range(4)
        ],
        "backbone": init_convnext(next(ki), backbone, backbone_classes),
    }
    num_feature = backbone_classes * 2
    if head_act == "swiglu":  # research head, see docs/genconvit_v2.md
        params["fc"] = linear_init(next(ki), num_feature, num_feature // 2)
    else:
        params["fc"] = linear_init(next(ki), num_feature, num_feature // 4)
    params["fc2"] = linear_init(next(ki), num_feature // 4, num_classes)
    if carry_dead_params:
        params["fc3"] = linear_init(next(ki), num_feature // 2, num_feature // 4)  # dead (B9)
        from genconvit_tpu.models.swin import init_swin
        params["embedder"] = init_swin(next(ki), embedder, backbone_classes)
        params["hybrid_proj"] = conv_init(next(ki), 1, 1, backbone_classes, 768)
    return params


def permute_latent_heads_hwc(vae_params: Dict) -> Dict:
    """Inference-time layout optimization: fold the torch CHW flatten into the
    mu/var head weights so the hot path never materializes a transposed
    [N, 25088] tensor (profiled ~0.8ms/launch of gather-fused copies each way
    on the v5e).

      * rows are re-indexed CHW -> HWC, so `x.reshape(n, -1)` (the native
        NHWC flatten) replaces `x.transpose(0,3,1,2).reshape(n, -1)`;
      * columns are re-indexed so z comes out in HWC order and the decoder
        unflattens with a plain `z.reshape(n, s, s, 256)` (vs reshape to
        (n,256,s,s) + transpose).

    Every z element is the exact same dot product relocated (equal up to
    fp32 contraction-order rounding, ~1e-7 relative). With eval-time
    sampling (quirk B3/B4) the iid
    eps values pair with relocated latent positions — a different but
    identically-distributed draw. Engine-only (core/checkpoint round-trips
    never see the permuted tree); presence of 'mu_hwc' selects the path in
    vae_encode/vae_decode. Ref being optimized: model/genconvit_vae.py:37-41
    (torch.flatten of NCHW) and :63 (nn.Unflatten(256,7,7))."""
    import numpy as np

    enc = dict(vae_params["encoder"])
    flat_n, latent = np.shape(enc["mu"]["kernel"])
    fh = int(round((flat_n / 128) ** 0.5))
    s = int(round((latent / 256) ** 0.5))
    # One fancy-index gather per array instead of two reshape-transpose
    # copies: the heads are 630MB each in bf16 (1.26GB f32). Warm-page the
    # two-copy form is ~0.6s faster, but it allocates TWO full-size
    # temporaries per kernel, and on hosts with slow first-touch page
    # faults those allocations dominated engine cold start (measured 730s
    # for this function on a degraded sandbox host; at full head scale
    # unwarmed, gather 9s vs two-copy 65s). The engine also bf16-casts
    # BEFORE calling this, halving every byte moved here.
    # row_perm/col_perm are the exact index maps of the original
    # reshape(128,fh,fh,L).transpose(1,2,0,3) row shuffle and
    # reshape(N,256,s,s).transpose(0,2,3,1) column shuffle.
    row_perm = np.arange(flat_n).reshape(128, fh, fh).transpose(1, 2, 0).ravel()
    col_perm = np.arange(latent).reshape(256, s, s).transpose(1, 2, 0).ravel()
    for name in ("mu", "var"):
        w = np.asarray(enc[name]["kernel"])[np.ix_(row_perm, col_perm)]
        b = np.asarray(enc[name]["bias"])[col_perm]
        enc[name + "_hwc"] = {"kernel": jnp.asarray(w), "bias": jnp.asarray(b)}
        del enc[name]
    out = dict(vae_params)
    out["encoder"] = enc
    if isinstance(out.get("decoder"), dict):
        # updated-VAE variant: its decoder_input Linear consumes z directly,
        # so its rows get the same CHW -> HWC latent re-index
        dec = dict(out["decoder"])
        wi = np.asarray(dec["input"]["kernel"])[col_perm]
        dec["input"] = {"kernel": jnp.asarray(wi), "bias": dec["input"]["bias"]}
        out["decoder"] = dec
    return out


def quantize_latent_heads_int8(vae_params: Dict) -> Dict:
    """Weight-only int8 for the 630M-param latent heads (engine load step,
    opt-in via GENCONVIT_INT8_HEADS=1): the mu matmul is pure weight-read
    bandwidth at inference (M=V*F rows), so int8 halves its time. Symmetric
    per-output-column scales keep the matmul exact in the scale; rounding is
    ~0.4% of each column max — same order as the bf16 weight cast the
    default path applies, documented as a deviation. Runs after
    permute_latent_heads_hwc (quantizes whichever layout is present)."""
    enc = dict(vae_params["encoder"])
    from genconvit_tpu.ops.pallas.int8_matmul import quantize_wint8

    for name in ("mu_hwc", "var_hwc", "mu", "var"):
        if name in enc:
            wq, s = quantize_wint8(enc[name]["kernel"])
            enc[name + "_q"] = {"wq": jnp.asarray(wq),
                                "scale": jnp.asarray(s),
                                "bias": enc[name]["bias"]}
            del enc[name]
    out = dict(vae_params)
    out["encoder"] = enc
    return out


def _latent_head(enc: Dict, flat: jax.Array, name: str) -> jax.Array:
    q = enc.get(name + "_q")
    if q is not None:
        from genconvit_tpu.ops.pallas.int8_matmul import matmul_wint8

        return matmul_wint8(flat, q["wq"], q["scale"], q["bias"])
    return linear(flat, enc[name]["kernel"], enc[name]["bias"])


def vae_encode(
    params: Dict, x: jax.Array, rng: Optional[jax.Array], *,
    sample: bool = True, train: bool = False,
) -> Tuple[jax.Array, Dict[str, Any]]:
    """Returns (z, aux) with aux = {'kl', 'mu', 'logvar', 'bn_stats'(train)}."""
    enc = params["encoder"]
    new_bn = []
    for conv, bn in zip(enc["convs"], enc["bns"]):
        x = conv2d(x, conv["kernel"], conv["bias"], stride=2, padding=1)
        x, stats = batch_norm(x, bn, train=train)
        new_bn.append(stats)
        x = leaky_relu(x)
    n = x.shape[0]
    if "mu_hwc" in enc or "mu_hwc_q" in enc:
        # permuted heads (permute_latent_heads_hwc): native NHWC flatten
        flat = x.reshape(n, -1)
        mu = _latent_head(enc, flat, "mu_hwc")
        logvar = _latent_head(enc, flat, "var_hwc")
    elif "mu_q" in enc:
        flat = x.transpose(0, 3, 1, 2).reshape(n, -1)
        mu = _latent_head(enc, flat, "mu")
        logvar = _latent_head(enc, flat, "var")
    else:
        # torch flattens CHW-order: NHWC -> NCHW -> [N, C*H*W] (conversion-critical)
        flat = x.transpose(0, 3, 1, 2).reshape(n, -1)
        mu = linear(flat, enc["mu"]["kernel"], enc["mu"]["bias"])
        logvar = linear(flat, enc["var"]["kernel"], enc["var"]["bias"])
    # Quirk B4 (reproduced exactly): std derives from the *mu* head, and
    # sampling happens in eval too unless sample=False (our deterministic mode).
    if sample:
        if rng is None:
            raise ValueError("vae_encode(sample=True) needs an rng key")
        std = jnp.exp(0.5 * mu)
        eps = jax.random.normal(rng, std.shape, dtype=std.dtype)
        z = eps * std + mu
    else:
        z = mu
    kl = KL_WEIGHT * jnp.mean(
        -0.5 * jnp.sum(1.0 + logvar - jnp.square(mu) - jnp.exp(logvar), axis=1)
    )
    return z, {"kl": kl, "mu": mu, "logvar": logvar, "bn_stats": new_bn if train else None}


def vae_decode(params: Dict, z: jax.Array) -> jax.Array:
    """z: [N, latent] -> [N, s*16, s*16, 3] where s = sqrt(latent/256).
    The unflatten matches torch's (256, s, s) channel-major view; with the
    permuted heads (permute_latent_heads_hwc) z already arrives HWC-ordered
    and unflattens without a transpose."""
    n, latent = z.shape
    s = int(round((latent / 256) ** 0.5))
    enc = params.get("encoder", {})
    if "mu_hwc" in enc or "mu_hwc_q" in enc:
        x = z.reshape(n, s, s, 256)
    else:
        x = z.reshape(n, 256, s, s).transpose(0, 2, 3, 1)  # NCHW view -> NHWC
    for layer in params["decoder"]:
        x = conv_transpose2d(x, layer["kernel"], layer["bias"], stride=2)
        x = leaky_relu(x)
    return x


def init_vae_updated(key: jax.Array, backbone: str = "convnext_tiny",
                     img_size: int = 224, latent_dims: Optional[int] = None,
                     num_classes: int = 2, backbone_classes: int = 1000,
                     carry_dead_params: bool = False,
                     embedder: str = "swin_tiny_patch4_window7_224") -> Dict:
    """The `genconvit_vae_updated` variant (ref model/genconvit_vae_updated.py):
    same encoder, but a *correct* reparameterization (std from the var head,
    :51-55), a decoder with a latent->feature Linear + BN'd ConvTranspose
    stack ending in Tanh (:69-107), and a dropout classifier (:137-168).
    Identified structurally: decoder is a dict (original: a list)."""
    if latent_dims is None:
        latent_dims = 256 * (img_size // 32) ** 2
    s = img_size // 16
    keys = jax.random.split(key, 24)
    ki = iter(keys)
    base = init_vae(key, backbone, img_size, latent_dims, num_classes,
                    backbone_classes, carry_dead_params, embedder)
    dec_ch = (128, 64, 32, 16, 3)
    base["decoder"] = {
        "input": linear_init(next(ki), latent_dims, 128 * s * s),
        "convs": [conv_transpose_init(next(ki), 2, 2, dec_ch[i], dec_ch[i + 1])
                  for i in range(4)],
        "bns": [batch_norm_init(dec_ch[i + 1]) for i in range(3)],
    }
    return base


def vae_updated_decode(params: Dict, z: jax.Array, *, train: bool = False
                       ) -> Tuple[jax.Array, Any]:
    """decoder_input Linear -> unflatten (128,s,s) (torch channel-major) ->
    3x [ConvT 2x2 s2 + BN + LeakyReLU] -> ConvT -> Tanh
    (ref model/genconvit_vae_updated.py:69-107)."""
    dec = params["decoder"]
    h = linear(z, dec["input"]["kernel"], dec["input"]["bias"])
    n = h.shape[0]
    s = int(round((h.shape[1] / 128) ** 0.5))
    x = h.reshape(n, 128, s, s).transpose(0, 2, 3, 1)  # NCHW view -> NHWC
    new_bn = []
    for i, layer in enumerate(dec["convs"]):
        x = conv_transpose2d(x, layer["kernel"], layer["bias"], stride=2)
        if i < 3:
            x, stats = batch_norm(x, dec["bns"][i], train=train)
            new_bn.append(stats)
            x = leaky_relu(x)
        else:
            x = jnp.tanh(x)
    return x, (new_bn if train else None)


def vae_updated_apply(
    params: Dict, x: jax.Array, rng: Optional[jax.Array] = None, *,
    sample: bool = True, train: bool = False,
) -> Tuple[jax.Array, jax.Array, Dict[str, Any]]:
    """Updated-variant forward (ref model/genconvit_vae_updated.py:170-199):
    encoder -> CORRECT reparameterize(mu, var) -> decoder(Tanh, full size) ->
    backbone(x), backbone(x_hat) -> relu/dropout classifier. Dropout is
    eval-identity; training callers apply their own dropout rng if desired
    (the reference's train_updated.py keeps default torch semantics)."""
    enc = params["encoder"]
    h = x
    new_bn = []
    for conv, bn in zip(enc["convs"], enc["bns"]):
        h = conv2d(h, conv["kernel"], conv["bias"], stride=2, padding=1)
        h, stats = batch_norm(h, bn, train=train)
        new_bn.append(stats)
        h = leaky_relu(h)
    n = h.shape[0]
    if "mu_hwc" in enc or "mu_hwc_q" in enc:
        # hwc-folded (and optionally int8) heads — see permute_latent_heads_hwc
        # (the updated decoder's input rows get the matching re-index there)
        flat = h.reshape(n, -1)
        mu = _latent_head(enc, flat, "mu_hwc")
        logvar = _latent_head(enc, flat, "var_hwc")
    else:
        flat = h.transpose(0, 3, 1, 2).reshape(n, -1)
        mu = _latent_head(enc, flat, "mu")
        logvar = _latent_head(enc, flat, "var")
    if sample:
        if rng is None:
            raise ValueError("vae_updated_apply(sample=True) needs an rng key")
        std = jnp.exp(0.5 * logvar)  # the FIXED reparameterization (:51-55)
        eps = jax.random.normal(rng, std.shape, dtype=std.dtype)
        z = eps * std + mu
    else:
        z = mu
    kl = KL_WEIGHT * jnp.mean(
        -0.5 * jnp.sum(1.0 + logvar - jnp.square(mu) - jnp.exp(logvar), axis=1))
    x_hat, dec_bn = vae_updated_decode(params, z, train=train)
    # the reference resizes both to 224 before the backbone (:188-190);
    # generalized: resize to the backbone's native input (= x's size here)
    if x_hat.shape[1] != x.shape[1]:
        x_hat_bb = resize_bilinear_torch(x_hat, (x.shape[1], x.shape[2]))
    else:
        x_hat_bb = x_hat
    # One 2N-batch backbone call instead of two N-batch calls — bitwise
    # identical (ConvNeXt has no cross-batch ops), doubles the conv batch
    # the MXU sees and halves kernel launches.
    both = convnext_apply(params["backbone"],
                          jnp.concatenate([x, x_hat_bb], axis=0))
    n = x.shape[0]
    x1, x2 = both[:n], both[n:]
    h = jnp.concatenate([x1, x2], axis=1)
    h = relu(h)  # dropout(0.5) is identity at eval
    h = linear(h, params["fc"]["kernel"], params["fc"]["bias"])
    h = relu(h)
    logits = linear(h, params["fc2"]["kernel"], params["fc2"]["bias"])
    aux = {"kl": kl, "mu": mu, "logvar": logvar,
           "bn_stats": (new_bn + (dec_bn or [])) if train else None}
    return logits, x_hat_bb, aux


def is_updated_vae(params: Dict) -> bool:
    """Structural variant detection: the updated decoder is a dict with a
    decoder_input Linear; the original decoder is a plain list of ConvTs."""
    return isinstance(params.get("decoder"), dict)


def vae_apply(
    params: Dict, x: jax.Array, rng: Optional[jax.Array] = None, *,
    sample: bool = True, train: bool = False,
) -> Tuple[jax.Array, jax.Array, Dict[str, Any]]:
    """x: [N,H,W,3] normalized. Returns (logits [N,2], recon_resized [N,H,W,3], aux).

    recon is resized to the input size with the torchvision-bilinear-antialias
    equivalent (ref model/genconvit_vae.py:105,115). Updated-variant trees
    (init_vae_updated / converted genconvit_vae_updated checkpoints) dispatch
    structurally."""
    if is_updated_vae(params):
        return vae_updated_apply(params, x, rng, sample=sample, train=train)
    z, aux = vae_encode(params, x, rng, sample=sample, train=train)
    x_hat = vae_decode(params, z)
    # Backbone inputs differ in size (x_hat is H/2); batching them into one
    # call is only exact when shapes match, so keep two calls here — the
    # recon pass is a quarter of the pixels anyway.
    x1 = convnext_apply(params["backbone"], x)
    x2 = convnext_apply(params["backbone"], x_hat)
    h = jnp.concatenate([x1, x2], axis=1)
    h = relu(h)
    h = linear(h, params["fc"]["kernel"], params["fc"]["bias"])
    if h.shape[-1] == 2 * params["fc2"]["kernel"].shape[0]:
        from genconvit_tpu.ops.act import swiglu

        h = swiglu(h)  # swiglu-head checkpoint (docs/genconvit_v2.md)
    else:
        h = relu(h)
    logits = linear(h, params["fc2"]["kernel"], params["fc2"]["bias"])
    recon = resize_bilinear_torch(x_hat, (x.shape[1], x.shape[2]))
    return logits, recon, aux
