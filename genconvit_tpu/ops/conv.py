"""Convolution ops (NHWC / HWIO), matching torch Conv2d / ConvTranspose2d
semantics numerically (parity-tested against torch in tests/test_ops.py).

Behavioral spec from the reference:
  - ED encoder uses Conv2d(k=3, s=1, p=1) stacks (ref: model/genconvit_ed.py:8-36)
  - VAE encoder uses Conv2d(k=3, s=2, p=1) (ref: model/genconvit_vae.py:10-40)
  - both decoders use ConvTranspose2d(k=2, s=2) (ref: model/genconvit_ed.py:38-61,
    model/genconvit_vae.py:62-88)
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
from jax import lax

IntOr2 = Union[int, Tuple[int, int]]


def _pair(v: IntOr2) -> Tuple[int, int]:
    return (v, v) if isinstance(v, int) else tuple(v)  # type: ignore[return-value]


def conv2d(
    x: jax.Array,
    w: jax.Array,
    b: Optional[jax.Array] = None,
    *,
    stride: IntOr2 = 1,
    padding: Union[str, IntOr2] = 0,
    groups: int = 1,
    dilation: IntOr2 = 1,
) -> jax.Array:
    """2-D convolution. x: [N,H,W,Cin], w: [kH,kW,Cin//groups,Cout].

    `padding` may be an int/pair (symmetric, torch-style) or 'SAME'/'VALID'.
    """
    if isinstance(padding, str):
        pad = padding
    else:
        ph, pw = _pair(padding)
        pad = [(ph, ph), (pw, pw)]
    dn = lax.conv_dimension_numbers(x.shape, w.shape, ("NHWC", "HWIO", "NHWC"))
    out = lax.conv_general_dilated(
        x,
        w.astype(x.dtype),
        window_strides=_pair(stride),
        padding=pad,
        rhs_dilation=_pair(dilation),
        dimension_numbers=dn,
        feature_group_count=groups,
    )
    if b is not None:
        out = out + b.astype(out.dtype)
    return out


def depthwise_conv2d(
    x: jax.Array,
    w: jax.Array,
    b: Optional[jax.Array] = None,
    *,
    stride: IntOr2 = 1,
    padding: Union[str, IntOr2] = 0,
) -> jax.Array:
    """Depthwise conv. w: [kH,kW,1,C] (HWIO with groups=C)."""
    c = x.shape[-1]
    return conv2d(x, w, b, stride=stride, padding=padding, groups=c)


def conv_transpose2d(
    x: jax.Array,
    w: jax.Array,
    b: Optional[jax.Array] = None,
    *,
    stride: IntOr2 = 1,
    padding: IntOr2 = 0,
) -> jax.Array:
    """2-D transposed convolution with torch ConvTranspose2d semantics.

    x: [N,H,W,Cin]; w: [kH,kW,Cin,Cout] — the kernel as stored by our param
    tree (converter maps torch's (Cin,Cout,kH,kW) -> HWIO, see core/convert.py).
    Output spatial size: (H-1)*s - 2p + k.

    Implemented as an input-dilated forward convolution with a spatially
    flipped kernel — the gradient-of-conv identity — which XLA lowers to an
    efficient MXU conv.
    """
    kh, kw = int(w.shape[0]), int(w.shape[1])
    sh, sw = _pair(stride)
    ph, pw = _pair(padding)
    if (kh, kw) == (sh, sw) and (ph, pw) == (0, 0) and int(w.shape[3]) >= 32:
        # Non-overlapping case (every decoder in the reference: k=2, s=2,
        # ref model/genconvit_ed.py:38-61): each output pixel gets exactly ONE
        # kernel tap, so the whole op is a single channel matmul followed by a
        # depth-to-space rearrange — the MXU sees one [N*H*W, Cin]x[Cin,
        # kh*kw*Cout] GEMM instead of XLA's input-dilated conv (which scans
        # 4x the taps against interleaved zeros). Same math: the extra taps
        # in the dilated form multiply exact zeros. Gated on Cout: for tiny
        # Cout (the 16->3 / 32->16 decoder tails) the pixel-shuffle transpose
        # lowers to layout-churn copies that cost more than the dilated conv
        # (v5e profile, tools/profile_forward.py).
        n, h, ww_, cin = x.shape
        cout = int(w.shape[3])
        wmat = w.astype(x.dtype).transpose(2, 0, 1, 3).reshape(cin, kh * kw * cout)
        y = jnp.dot(x.reshape(n * h * ww_, cin), wmat,
                    preferred_element_type=jnp.float32).astype(x.dtype)
        y = y.reshape(n, h, ww_, kh, kw, cout).transpose(0, 1, 3, 2, 4, 5)
        out = y.reshape(n, h * kh, ww_ * kw, cout)
        if b is not None:
            out = out + b.astype(out.dtype)
        return out
    # Gradient-of-conv identity: conv_transpose(x, w) == conv(dilate(x), flip(w)).
    # The stored kernel is already HWIO with I=Cin/O=Cout, so only the spatial
    # flip is needed.
    w_flip = jnp.flip(w, axis=(0, 1))
    dn = lax.conv_dimension_numbers(x.shape, w_flip.shape, ("NHWC", "HWIO", "NHWC"))
    out = lax.conv_general_dilated(
        x,
        w_flip.astype(x.dtype),
        window_strides=(1, 1),
        padding=[(kh - 1 - ph, kh - 1 - ph), (kw - 1 - pw, kw - 1 - pw)],
        lhs_dilation=(sh, sw),
        dimension_numbers=dn,
    )
    if b is not None:
        out = out + b.astype(out.dtype)
    return out
