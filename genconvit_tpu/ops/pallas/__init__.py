"""Pallas TPU kernels.

Enablement policy: GENCONVIT_PALLAS env var — "1" force-on, "0" force-off,
unset/"auto" = on when the active backend is TPU. Decisions are made at trace
time from static shapes, so the flag composes with jit.
"""

from __future__ import annotations

import os


def pallas_enabled() -> bool:
    flag = os.environ.get("GENCONVIT_PALLAS", "auto")
    if flag == "1":
        return True
    if flag == "0":
        return False
    import jax

    return jax.default_backend() == "tpu"
