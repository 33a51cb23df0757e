"""Pallas TPU kernels.

Enablement policy: KernelPlan.pallas (ops/kernel_plan.py; env
GENCONVIT_PALLAS feeds the default) — "1" force-on, "0" force-off, unset =
on when the active backend is TPU. Decisions are made at trace time from
static shapes, so the flag composes with jit.
"""

from __future__ import annotations

import contextlib
import threading

_local = threading.local()


def pallas_enabled() -> bool:
    if getattr(_local, "disabled", 0):
        return False
    from genconvit_tpu.ops.kernel_plan import current_plan

    flag = current_plan().pallas
    if flag == "1":
        return True
    if flag == "0":
        return False
    import jax

    return jax.default_backend() == "tpu"


@contextlib.contextmanager
def pallas_disabled():
    """Trace-time opt-out — used by the training path, where the inference
    kernels would need custom VJPs to differentiate through."""
    _local.disabled = getattr(_local, "disabled", 0) + 1
    try:
        yield
    finally:
        _local.disabled -= 1
