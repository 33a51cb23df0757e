"""Activations with exact torch-default semantics.

torch nn.GELU default is the *erf* form (not tanh approx); jax.nn.gelu defaults
to the approximation — we pin approximate=False for parity.
torch nn.LeakyReLU default negative_slope=0.01 (ref VAE uses the default,
model/genconvit_vae.py:18-31).

bf16 fast path: XLA's erf lowering dominates the ConvNeXt block on TPU
(profiled at ~4.3ms for one [240,56,56,384] GELU — 3.5x the matmul that
feeds it), so bf16 inputs use a fitted rational erf. Two precision tiers:

  * default (deg 3/2 in z^2, ~11 VPU ops): erf max abs err 6.9e-5 -> GELU
    abs err <= 2.8e-4 — ~15x below bf16's rounding of O(1) activations, but
    *relative* error is visible for deep-tail |gelu| < ~4e-3 outputs. Chosen
    because the GELU pass is ~60% of the fc1-fusion VPU time at stage 1
    (tools/microbench_mlp_tail.py) and those tail values are annihilated by
    the bf16 matmuls that consume them (model-level parity unchanged, see
    tests/test_full_model_parity.py tolerances).
  * GENCONVIT_GELU=hp (deg 5/4, ~17 ops): erf max abs err 8.7e-7 —
    bit-identical to exactly-rounded bf16 GELU except |gelu| < 2e-5 values.

f32 keeps the exact erf so torch-oracle parity tests and f32 training are
bit-comparable. GENCONVIT_EXACT_GELU=1 forces exact erf on bf16 too.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# Minimax-fitted rational erf(z) ~ z * P(z^2)/Q(z^2), clamped outside.
# Fitted against scipy.special.erf with iterative weighted least squares.
# hp tier: |z| <= 3.625, max abs error 8.7e-7.
_ERF_P = (1.1283791233432234, 0.2571863689937213, 0.057255831726436376,
          0.0057354856364086396, 0.00015586043306483894,
          -1.0666330908322879e-06)
_ERF_Q = (1.0, 0.5612572789010719, 0.13783698081066592,
          0.018689943146010534, 0.0013449923247288303)
_ERF_ZMAX = 3.625
# default tier: |z| <= 3.0 (erf(3.0)=0.999978, so the clamp step error is
# below the fit error), max abs error 6.9e-5, ~6 fewer VPU ops.
_ERF_P_LO = (1.1279169492647987, 0.2362246069042269, 0.023272086736849436,
             -0.00044320715362244646)
_ERF_Q_LO = (1.0, 0.5398383027204903, 0.10605450434127411)
_ERF_ZMAX_LO = 3.0


def relu(x: jax.Array) -> jax.Array:
    return jnp.maximum(x, 0)


def _erf_rational(z: jax.Array, pc, qc, zmax: float) -> jax.Array:
    """f32 rational erf for the clamped range; pins to +-1 outside (the
    pinning selects are load-bearing: without them the residual (1 - P/Q)
    at the clamp point multiplies unboundedly into GELU's 0.5*x*(1+e) for
    deep-tail |x|)."""
    zc = jnp.clip(z, -zmax, zmax)
    t = zc * zc
    p = jnp.float32(pc[-1])
    for c in pc[-2::-1]:
        p = p * t + jnp.float32(c)
    q = jnp.float32(qc[-1])
    for c in qc[-2::-1]:
        q = q * t + jnp.float32(c)
    e = zc * (p / q)
    e = jnp.where(z <= -zmax, jnp.float32(-1.0), e)
    return jnp.where(z >= zmax, jnp.float32(1.0), e)


def _erf_rational_f32(z: jax.Array) -> jax.Array:
    return _erf_rational(z, _ERF_P, _ERF_Q, _ERF_ZMAX)


def _erf_rational_f32_lo(z: jax.Array) -> jax.Array:
    return _erf_rational(z, _ERF_P_LO, _ERF_Q_LO, _ERF_ZMAX_LO)


def _hp_gelu_forced() -> bool:
    from genconvit_tpu.ops.kernel_plan import current_plan

    return current_plan().gelu == "hp"


def gelu_fast(x: jax.Array) -> jax.Array:
    """Exact-erf-form GELU via the rational approximation (any float dtype);
    returns x's dtype. ~3-4x cheaper than XLA's erf on the TPU VPU. Default
    is the low-degree tier (module docstring); KernelPlan.gelu='hp'
    (GENCONVIT_GELU=hp at construction) selects the 8.7e-7 rational."""
    x32 = x.astype(jnp.float32)
    erf_fn = _erf_rational_f32 if _hp_gelu_forced() else _erf_rational_f32_lo
    e = erf_fn(x32 * jnp.float32(0.7071067811865476))
    return (jnp.float32(0.5) * x32 * (jnp.float32(1.0) + e)).astype(x.dtype)


def _exact_gelu_forced() -> bool:
    from genconvit_tpu.ops.kernel_plan import current_plan

    return current_plan().gelu == "exact"


def gelu(x: jax.Array) -> jax.Array:
    if x.dtype == jnp.bfloat16 and not _exact_gelu_forced():
        return gelu_fast(x)
    return jax.nn.gelu(x, approximate=False)


def leaky_relu(x: jax.Array, negative_slope: float = 0.01) -> jax.Array:
    return jnp.where(x >= 0, x, negative_slope * x)


def sigmoid(x: jax.Array) -> jax.Array:
    return jax.nn.sigmoid(x)


def swiglu(x: jax.Array) -> jax.Array:
    """SwiGLU gate: split the last axis in half, silu(a) * b.

    The reference *documents* a SwiGLU v2 head but never wires it
    (SURVEY.md §8 B12); this implements the documented intent for the
    opt-in research head (docs/genconvit_v2.md)."""
    a, b = jnp.split(x, 2, axis=-1)
    return jax.nn.silu(a) * b
