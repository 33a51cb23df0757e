"""Pallas kernel parity (interpret mode on the CPU backend)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from genconvit_tpu.models.convnext import _block, init_convnext
from genconvit_tpu.ops.pallas.convnext_block import fused_convnext_block


@pytest.mark.parametrize("h,c", [(14, 128), (7, 256)])
def test_fused_convnext_block_matches_reference(rng, h, c):
    key = jax.random.PRNGKey(0)
    # build a block param dict with the right dims
    full = init_convnext(key, "convnext_tiny")
    blk = jax.tree_util.tree_map(lambda x: x, full["stages"][0]["blocks"][0])
    # re-shape to (c): easiest is random arrays of the right shape
    r = np.random.default_rng(0)
    blk = {
        "conv_dw": {"kernel": jnp.asarray(r.standard_normal((7, 7, 1, c), np.float32) * 0.1),
                    "bias": jnp.asarray(r.standard_normal(c).astype(np.float32))},
        "norm": {"scale": jnp.asarray(1 + 0.1 * r.standard_normal(c).astype(np.float32)),
                 "bias": jnp.asarray(0.1 * r.standard_normal(c).astype(np.float32))},
        "mlp": {"fc1": {"kernel": jnp.asarray(r.standard_normal((c, 4 * c), np.float32) * 0.05),
                        "bias": jnp.asarray(0.1 * r.standard_normal(4 * c).astype(np.float32))},
                "fc2": {"kernel": jnp.asarray(r.standard_normal((4 * c, c), np.float32) * 0.05),
                        "bias": jnp.asarray(0.1 * r.standard_normal(c).astype(np.float32))}},
        "gamma": jnp.asarray(r.standard_normal(c).astype(np.float32) * 0.1),
    }
    x = jnp.asarray(r.standard_normal((2, h, h, c), np.float32))
    ref = _block(blk, x)
    out = fused_convnext_block(x, blk, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


class TestWindowAttention:
    def _ref(self, q, k, v, bias, mask, heads):
        import jax.numpy as jnp
        b, l, hd = q.shape[0] // heads, q.shape[1], q.shape[2]
        qh = q.reshape(b, heads, l, hd) * (hd ** -0.5)
        kh = k.reshape(b, heads, l, hd)
        vh = v.reshape(b, heads, l, hd)
        s = jnp.einsum("bhld,bhmd->bhlm", qh, kh) + bias[None]
        if mask is not None:
            nw = mask.shape[0]
            s = s.reshape(b // nw, nw, heads, l, l) + mask[:, None]
            s = s.reshape(b, heads, l, l)
        p = jax.nn.softmax(s, axis=-1)
        return jnp.einsum("bhlm,bhmd->bhld", p, vh).reshape(b * heads, l, hd)

    @pytest.mark.parametrize("masked", [False, True])
    def test_matches_reference(self, rng, masked):
        from genconvit_tpu.ops.pallas.window_attn import window_attention_pallas

        heads, l, hd, nw, nb = 4, 49, 32, 4, 2
        g = nb * nw * heads
        q = jnp.asarray(rng.standard_normal((g, l, hd)).astype(np.float32))
        k = jnp.asarray(rng.standard_normal((g, l, hd)).astype(np.float32))
        v = jnp.asarray(rng.standard_normal((g, l, hd)).astype(np.float32))
        bias = jnp.asarray(rng.standard_normal((heads, l, l)).astype(np.float32) * 0.1)
        mask = (jnp.asarray(
            (rng.random((nw, l, l)) > 0.8).astype(np.float32) * -100.0)
            if masked else None)
        out = window_attention_pallas(q, k, v, bias, mask, heads=heads,
                                      windows_per_mask=nw, interpret=True)
        ref = self._ref(q, k, v, bias, mask, heads)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=2e-4, atol=2e-4)
