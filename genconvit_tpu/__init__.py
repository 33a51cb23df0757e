"""genconvit_tpu — TPU-native deepfake video detection framework.

A from-scratch JAX/XLA/Pallas/pjit rebuild of the capabilities of GenConViT
(reference: erprogs/GenConViT fork, arXiv 2307.07036; structural survey in
SURVEY.md). The compute path is designed TPU-first: NHWC layouts, functional
param pytrees, fixed shapes under jit, resize-as-matmul preprocessing, and
GSPMD sharding over a device mesh.
"""

__version__ = "0.1.0"

import os as _os

if _os.environ.get("GENCONVIT_PLATFORM"):
    # Force a JAX backend (e.g. 'cpu') even when the session's sitecustomize
    # already imported jax with a TPU plugin: the config update applies as
    # long as no backend has been initialized yet.
    import jax as _jax

    _jax.config.update("jax_platforms", _os.environ["GENCONVIT_PLATFORM"])

from genconvit_tpu.config import Config, load_config  # noqa: F401

_LAZY = {
    "Predictor": ("genconvit_tpu.infer.engine", "Predictor"),
    "train_model": ("genconvit_tpu.train.loop", "train_model"),
    "init_genconvit": ("genconvit_tpu.models.genconvit", "init_genconvit"),
    "genconvit_apply": ("genconvit_tpu.models.genconvit", "genconvit_apply"),
    "convert_checkpoint": ("genconvit_tpu.core.convert", "convert_checkpoint"),
    "save_checkpoint": ("genconvit_tpu.core.checkpoint", "save_checkpoint"),
    "load_params": ("genconvit_tpu.core.checkpoint", "load_params"),
}


def __getattr__(name):
    """Lazy top-level API (keeps `import genconvit_tpu` light)."""
    if name in _LAZY:
        import importlib

        module, attr = _LAZY[name]
        return getattr(importlib.import_module(module), attr)
    raise AttributeError(f"module 'genconvit_tpu' has no attribute {name!r}")
