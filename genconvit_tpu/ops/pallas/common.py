"""Shared in-kernel math for the Pallas TPU kernels.

The rational-erf GELU mirrors ops/act.py's two precision tiers (module
docstring there): the default deg-3/2 fit (erf max abs err 6.9e-5) and the
hp deg-5/4 fit (8.7e-7). In-kernel the division uses the VPU's approximate
reciprocal + one Newton step (relative error ~1e-7 after refinement —
invisible at bf16); interpret mode (CPU tests) uses an exact divide since
`pl.reciprocal` has no interpret lowering.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax.experimental import pallas as pl

from genconvit_tpu.ops.act import (_ERF_P, _ERF_P_LO, _ERF_Q, _ERF_Q_LO,
                                   _ERF_ZMAX, _ERF_ZMAX_LO)


def gelu_f32(h, *, exact_div: bool = False, hp: bool = False,
             newton: bool = True):
    """GELU (erf form) on an fp32 array via the rational approximation.
    newton=False skips the reciprocal's Newton refinement (raw VPU approx
    reciprocal is ~6e-5 relative — still ~60x below bf16 resolution; saves
    two ops per element on the 4C-wide hidden)."""
    pc, qc, zmax = ((_ERF_P, _ERF_Q, _ERF_ZMAX) if hp
                    else (_ERF_P_LO, _ERF_Q_LO, _ERF_ZMAX_LO))
    z = h * jnp.float32(0.7071067811865476)
    zc = jnp.clip(z, -zmax, zmax)
    t = zc * zc
    p = jnp.float32(pc[-1])
    for c in pc[-2::-1]:
        p = p * t + jnp.float32(c)
    q = jnp.float32(qc[-1])
    for c in qc[-2::-1]:
        q = q * t + jnp.float32(c)
    if exact_div:
        inv_q = 1.0 / q
    else:
        inv_q = pl.reciprocal(q, approx=True)
        if newton:
            inv_q = inv_q * (2.0 - q * inv_q)
    e = zc * p * inv_q
    # |z| beyond the fit range: erf pinned to +-1 (load-bearing — see
    # act._erf_rational; the clamped-P/Q residual would scale with |h|)
    e = jnp.where(jnp.abs(z) >= zmax, jnp.sign(z), e)
    return jnp.float32(0.5) * h * (jnp.float32(1.0) + e)
