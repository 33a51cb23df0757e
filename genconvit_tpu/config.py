"""Typed configuration.

Mirrors the reference's single YAML config (ref: model/config.yaml:1-12,
model/config.py:6-10) but as a dataclass with explicit fields, robust path
handling (the reference's loader is CWD-relative and breaks outside the repo
root — SURVEY.md §8 B11), and CLI override hooks.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Any, Dict, Optional

import yaml

# Derived constants for the canonical 224x224 models (ref: model/config.yaml).
_DEFAULT_IMG_SIZE = 224
_DEFAULT_LATENT = 12544  # == 256 * (224//32)**2 (ref: model/genconvit_vae.py:83)


@dataclasses.dataclass
class ModelConfig:
    backbone: str = "convnext_tiny"
    embedder: str = "swin_tiny_patch4_window7_224"
    latent_dims: int = _DEFAULT_LATENT
    # Q1 (SURVEY.md §8): the reference's HybridEmbed/Swin params never run in the
    # forward graph of a timm ConvNeXt. Off by default; opt-in research path.
    use_hybrid_embed: bool = False
    # 'original' | 'updated' — the updated VAE variant has the fixed
    # reparameterization, Tanh decoder, and dropout classifier
    # (ref model/genconvit_vae_updated.py, used by train_updated.py).
    vae_variant: str = "original"
    # Carry the (dead) embedder/hybrid-embed parameter groups in *randomly
    # initialized* trees so native checkpoints mirror converted reference ones
    # (SURVEY.md §8 B9). The converter always carries them (its own flag);
    # random init skips them by default for speed.
    carry_dead_params: bool = False

    @property
    def size(self) -> str:
        # 'tiny' | 'large' etc., parsed from the backbone name
        return self.backbone.split("_")[-1]


@dataclasses.dataclass
class Config:
    model: ModelConfig = dataclasses.field(default_factory=ModelConfig)
    batch_size: int = 32
    epoch: int = 1
    learning_rate: float = 1e-4
    weight_decay: float = 1e-4
    num_classes: int = 2
    img_size: int = _DEFAULT_IMG_SIZE
    min_val_loss: float = 10000.0

    # --- new-framework knobs (not in the reference) ---
    # Compute dtype for the jitted forward/backward path. 'bfloat16' on TPU,
    # 'float32' elsewhere. The reference's --fp16 flag maps to bfloat16.
    compute_dtype: str = "float32"
    # Face-detection backend: 'hybrid' (staged scored cascades fused with
    # the jax detector — quality leader on real frames and the closest
    # stand-in for the reference's dlib-HOG crops) | 'jax' (on-device
    # detector, committed checkpoint in genconvit_tpu/assets/) | 'haar'
    # (pretrained system cascades via the native shim) | 'skin' |
    # 'fullframe' | 'recorded' | 'none'. When a detector-family backend's
    # artifacts are missing the engine walks a hybrid -> jax -> haar ->
    # fullframe fallback ladder (with a warning); other explicit choices
    # fall straight to fullframe.
    face_backend: str = "hybrid"
    # Where weights live (ref hardcodes 'weight/' CWD-relative).
    weight_dir: str = "weight"

    def derived_latent_dims(self) -> int:
        """latent_dims consistent with the VAE decoder's (256, s, s) unflatten
        where s = img_size // 32 (ref: model/genconvit_vae.py:83 uses (256,7,7)
        for 224). Used when img_size != 224 (e.g. tiny dry-run shapes)."""
        s = self.img_size // 32
        return 256 * s * s

    def to_dict(self) -> Dict[str, Any]:
        return dataclasses.asdict(self)

    @staticmethod
    def from_dict(d: Dict[str, Any]) -> "Config":
        d = dict(d)
        md = d.pop("model", {}) or {}
        known_m = {f.name for f in dataclasses.fields(ModelConfig)}
        model = ModelConfig(**{k: v for k, v in md.items() if k in known_m})
        known = {f.name for f in dataclasses.fields(Config)}
        return Config(model=model, **{k: v for k, v in d.items() if k in known})


def load_config(path: Optional[str] = None) -> Config:
    """Load config from YAML, falling back to built-in defaults.

    Search order: explicit path, $GENCONVIT_CONFIG, ./model/config.yaml
    (reference layout), ./config.yaml. Missing file -> defaults (the defaults
    reproduce the reference's model/config.yaml values).
    """
    candidates = [
        path,
        os.environ.get("GENCONVIT_CONFIG"),
        os.path.join("model", "config.yaml"),
        "config.yaml",
    ]
    for c in candidates:
        if c and os.path.isfile(c):
            with open(c) as f:
                raw = yaml.safe_load(f) or {}
            return Config.from_dict(raw)
    return Config()


def apply_size(config: Config, size: str) -> Config:
    """Reproduce the --s tiny|large backbone rewrite (ref: prediction.py:314-318)."""
    if size in ("tiny", "large"):
        config.model.backbone = f"convnext_{size}"
        config.model.embedder = f"swin_{size}_patch4_window7_224"
    return config
