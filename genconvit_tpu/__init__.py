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
