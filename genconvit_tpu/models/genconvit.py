"""GenConViT ensemble wrapper: ED and/or VAE branch dispatch.

Spec source: ref model/genconvit.py —
  net='ed'   -> ED logits                       (:66-68)
  net='vae'  -> VAE logits (recon dropped)      (:69-70)
  net='genconvit' -> concat(ED, VAE) on the **batch** axis (:71-74), so the
  downstream per-frame sigmoid-mean doubles as the ensemble average.

Unlike the reference CLI (where single-branch selection is unreachable, B14),
`net` here actually works. `arch_type='v2'` is accepted and behaviorally
identical (ref model/genconvit_v2.py is a no-op wrapper, SURVEY.md §8 B12).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from genconvit_tpu.config import Config
from genconvit_tpu.models.ed import ed_apply, init_ed
from genconvit_tpu.models.vae import init_vae, init_vae_updated, vae_apply

VALID_NETS = ("ed", "vae", "genconvit")


def vae_latent_head_spec(config: Config):
    """(flat_in, latent_dims, init_bound) of the VAE mu/var Linear heads.

    The single source of the head geometry: init_genconvit's latent-dims
    selection (explicit at 224, derived otherwise — ref model/config.yaml
    latent_dims vs model/genconvit_vae.py:36-37 Linear(flat, latent)) and
    the torch Linear default bound 1/sqrt(fan_in). Shared by host init and
    the engine's on-device random-init path so they cannot drift."""
    feat_hw = config.img_size // 16
    flat = 128 * feat_hw * feat_hw
    latent = (config.model.latent_dims if config.img_size == 224
              else config.derived_latent_dims())
    return flat, latent, flat ** -0.5


def init_genconvit(key: jax.Array, config: Config, net: str = "genconvit",
                   skip_vae_latent_heads: bool = False) -> Dict:
    """Param tree with 'ed' and/or 'vae' branches per `net`.

    skip_vae_latent_heads (original VAE variant only) omits the two
    ~315M-param latent heads so the caller can generate them directly on
    the accelerator (infer/engine.py random-init path)."""
    k_ed, k_vae = jax.random.split(key)
    params: Dict[str, Any] = {}
    backbone = config.model.backbone
    if net in ("ed", "genconvit"):
        params["ed"] = init_ed(k_ed, backbone, config.num_classes,
                               carry_dead_params=config.model.carry_dead_params,
                               embedder=config.model.embedder)
    if net in ("vae", "genconvit"):
        updated = getattr(config.model, "vae_variant", "original") == "updated"
        init_fn = init_vae_updated if updated else init_vae
        kwargs: Dict[str, Any] = {}
        if not updated:
            kwargs["skip_latent_heads"] = skip_vae_latent_heads
        params["vae"] = init_fn(
            k_vae, backbone, config.img_size,
            latent_dims=vae_latent_head_spec(config)[1],
            num_classes=config.num_classes,
            carry_dead_params=config.model.carry_dead_params,
            embedder=config.model.embedder,
            **kwargs,
        )
    return params


def genconvit_apply(
    params: Dict, x: jax.Array, *, net: str = "genconvit",
    rng: Optional[jax.Array] = None, sample: bool = True, train: bool = False,
) -> Tuple[jax.Array, Dict[str, Any]]:
    """x: [N,H,W,3] normalized. Returns (logits, aux).

    logits: [N,2] for 'ed'/'vae'; [2N,2] for 'genconvit' (batch-axis concat,
    ED rows first — exact reference semantics, model/genconvit.py:74).
    aux carries recon/kl for training and observability.
    """
    if net not in VALID_NETS:
        raise ValueError(f"net must be one of {VALID_NETS}, got {net!r}")
    aux: Dict[str, Any] = {}
    if net == "ed":
        logits, recon = ed_apply(params["ed"], x)
        aux["ed_recon"] = recon
        return logits, aux
    if net == "vae":
        logits, recon, vaux = vae_apply(params["vae"], x, rng, sample=sample, train=train)
        aux["vae_recon"] = recon
        aux.update({f"vae_{k}": v for k, v in vaux.items()})
        return logits, aux
    ed_logits, ed_recon = ed_apply(params["ed"], x)
    vae_logits, vae_recon, vaux = vae_apply(params["vae"], x, rng, sample=sample, train=train)
    aux["ed_recon"] = ed_recon
    aux["vae_recon"] = vae_recon
    aux.update({f"vae_{k}": v for k, v in vaux.items()})
    return jnp.concatenate([ed_logits, vae_logits], axis=0), aux
