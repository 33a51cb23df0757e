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


def test_pallas_block_grad_matches_xla(rng):
    """custom-VJP gradients through the fused block must match pure-XLA
    autodiff (interpret mode on CPU)."""
    import os

    from genconvit_tpu.models.convnext import _block_pallas_op, _block_xla

    c, h = 128, 14
    r = np.random.default_rng(1)
    blk = {
        "conv_dw": {"kernel": jnp.asarray(r.standard_normal((7, 7, 1, c), np.float32) * 0.1),
                    "bias": jnp.asarray(r.standard_normal(c).astype(np.float32))},
        "norm": {"scale": jnp.ones(c), "bias": jnp.zeros(c)},
        "mlp": {"fc1": {"kernel": jnp.asarray(r.standard_normal((c, 4 * c), np.float32) * 0.05),
                        "bias": jnp.zeros(4 * c)},
                "fc2": {"kernel": jnp.asarray(r.standard_normal((4 * c, c), np.float32) * 0.05),
                        "bias": jnp.zeros(c)}},
        "gamma": jnp.full(c, 0.1),
    }
    x = jnp.asarray(r.standard_normal((2, h, h, c)).astype(np.float32))

    def loss_pallas(p, x):
        os.environ["GENCONVIT_PALLAS"] = "0"  # kernel call is explicit here
        from genconvit_tpu.ops.pallas.convnext_block import fused_convnext_block

        return jnp.sum(jnp.square(fused_convnext_block(x, p, interpret=True)))

    def loss_ref(p, x):
        return jnp.sum(jnp.square(_block_xla(p, x)))

    # grads of the custom-vjp op: forward interpret-pallas, backward XLA
    from genconvit_tpu.models.convnext import _block_pallas_bwd

    ref_val, ref_grads = jax.value_and_grad(loss_ref, argnums=(0, 1))(blk, x)
    # custom op path: compute output via interpret kernel + bwd via vjp helper
    out = None
    from genconvit_tpu.ops.pallas.convnext_block import fused_convnext_block

    out = fused_convnext_block(x, blk, interpret=True)
    g = 2.0 * out
    gp, gx = _block_pallas_bwd((blk, x), g)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(ref_grads[1]),
                               rtol=2e-3, atol=2e-3)
    for ka, kb in [("gamma", None), ("norm", "scale")]:
        a = gp[ka] if kb is None else gp[ka][kb]
        b = ref_grads[0][ka] if kb is None else ref_grads[0][ka][kb]
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=2e-3)


STAGE_SHAPES = [(0, 56, 96), (1, 28, 192), (2, 14, 384), (3, 7, 768)]


@pytest.mark.parametrize("si,h,c", STAGE_SHAPES)
def test_fused_stage_kernel_matches_block_chain(rng, si, h, c):
    """convnext_stage kernel (whole-stage VMEM residency) vs the XLA block
    chain, interpret mode, all four stage shapes."""
    from genconvit_tpu.models.convnext import _block_xla
    from genconvit_tpu.ops.pallas.convnext_stage import fused_convnext_stage

    full = init_convnext(jax.random.PRNGKey(0))
    blocks = [dict(b) for b in full["stages"][si]["blocks"][:2]]
    for b in blocks:
        b["gamma"] = jnp.full((c,), 0.3, jnp.float32)
    x = jnp.asarray(rng.standard_normal((2, h, h, c)), jnp.bfloat16)
    ref = x
    for b in blocks:
        ref = _block_xla(b, ref)
    out = fused_convnext_stage(x, blocks, interpret=True)
    a, bv = np.asarray(ref, np.float32), np.asarray(out, np.float32)
    rel = np.abs(a - bv).max() / max(np.abs(a).max(), 1e-6)
    assert rel < 3e-2, f"stage {si}: rel {rel}"


@pytest.mark.parametrize("si,h,c", STAGE_SHAPES)
def test_fused_ln_mlp_residual_matches_block_tail(rng, si, h, c):
    """convnext_mlp kernel (LN+MLP+scale+residual) after an XLA dwconv vs the
    reference block, interpret mode."""
    from genconvit_tpu.models.convnext import _block_xla
    from genconvit_tpu.ops import conv2d
    from genconvit_tpu.ops.pallas.convnext_mlp import fused_ln_mlp_residual

    full = init_convnext(jax.random.PRNGKey(0))
    blk = dict(full["stages"][si]["blocks"][0])
    blk["gamma"] = jnp.full((c,), 0.3, jnp.float32)
    x = jnp.asarray(rng.standard_normal((2, h, h, c)), jnp.bfloat16)
    ref = _block_xla(blk, x)
    dw = conv2d(x, blk["conv_dw"]["kernel"], blk["conv_dw"]["bias"],
                padding=3, groups=c)
    out = fused_ln_mlp_residual(dw, x, blk, interpret=True)
    a, bv = np.asarray(ref, np.float32), np.asarray(out, np.float32)
    rel = np.abs(a - bv).max() / max(np.abs(a).max(), 1e-6)
    assert rel < 3e-2, f"stage {si}: rel {rel}"


@pytest.mark.parametrize("si,h,c", [(0, 56, 96), (1, 28, 192)])
def test_fused_ln_mlp_padded_channels_matches_block(rng, si, h, c):
    """The padded-stage integration (models/convnext._apply_stage_mlp_kernel):
    channels zero-padded to a lane multiple, stats masked via real_c. The
    sliced output must match the unpadded XLA block, and the pad lanes must
    stay exactly zero (they feed the next block's depthwise conv)."""
    from genconvit_tpu.models.convnext import _block_xla, _pad_block_params
    from genconvit_tpu.ops import conv2d
    from genconvit_tpu.ops.pallas.convnext_mlp import fused_ln_mlp_residual

    full = init_convnext(jax.random.PRNGKey(0))
    blk = dict(full["stages"][si]["blocks"][0])
    blk["gamma"] = jnp.full((c,), 0.3, jnp.float32)
    x = jnp.asarray(rng.standard_normal((2, h, h, c)), jnp.bfloat16)
    ref = _block_xla(blk, x)

    c_pad = -(-c // 128) * 128
    bp = _pad_block_params(blk, c, c_pad)
    xp = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, c_pad - c)))
    dw = conv2d(xp, bp["conv_dw"]["kernel"].astype(xp.dtype),
                bp["conv_dw"]["bias"], padding=3, groups=c_pad)
    out = fused_ln_mlp_residual(dw, xp, bp, real_c=c, interpret=True)
    assert not np.asarray(out[..., c:].astype(np.float32)).any()
    a = np.asarray(ref, np.float32)
    bv = np.asarray(out[..., :c], np.float32)
    rel = np.abs(a - bv).max() / max(np.abs(a).max(), 1e-6)
    assert rel < 3e-2, f"stage {si}: rel {rel}"


def test_layer_norm_rows_matches_reference(rng):
    """layer_norm_rows (the stem-LN kernel) vs ops.layer_norm, including the
    padded-channel masked-moment form."""
    from genconvit_tpu.ops import layer_norm
    from genconvit_tpu.ops.pallas.convnext_mlp import layer_norm_rows

    c = 96
    x = jnp.asarray(rng.standard_normal((4, 16, 16, c)), jnp.bfloat16)
    s = jnp.asarray(rng.standard_normal((c,)) * 0.3 + 1, jnp.float32)
    b = jnp.asarray(rng.standard_normal((c,)) * 0.1, jnp.float32)
    ref = layer_norm(x, s, b, eps=1e-6)
    got = layer_norm_rows(x, s, b, interpret=True)
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(ref, np.float32), rtol=2e-2, atol=2e-2)
    # padded form: pad lanes stay zero, real lanes match
    xp = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, 128 - c)))
    sp, bp = jnp.pad(s, (0, 128 - c)), jnp.pad(b, (0, 128 - c))
    got_p = layer_norm_rows(xp, sp, bp, real_c=c, interpret=True)
    assert not np.asarray(got_p[..., c:].astype(np.float32)).any()
    np.testing.assert_allclose(np.asarray(got_p[..., :c], np.float32),
                               np.asarray(ref, np.float32), rtol=2e-2, atol=2e-2)


def test_int8_matmul_kernel_close_to_exact(rng):
    """matmul_wint8 vs the exact fp32 matmul at quantization tolerance, with
    a non-tile-divisible N exercising the divisor-tile picker."""
    from genconvit_tpu.ops.pallas.int8_matmul import matmul_wint8, quantize_wint8

    m, k, n = 16, 512, 384  # n = 3*128, not divisible by 512
    w = rng.standard_normal((k, n)).astype(np.float32) * 0.05
    bias = rng.standard_normal((n,)).astype(np.float32) * 0.1
    x = rng.standard_normal((m, k)).astype(np.float32)
    wq, scale = quantize_wint8(w)
    ref = x @ (wq.astype(np.float32) * scale) + bias  # exact-in-scale form
    got = matmul_wint8(jnp.asarray(x), jnp.asarray(wq), jnp.asarray(scale),
                       jnp.asarray(bias), interpret=True)
    # bf16 activation cast inside the kernel dominates the tolerance
    np.testing.assert_allclose(np.asarray(got, np.float32), ref,
                               rtol=3e-2, atol=3e-2)


def test_features_mlp_kernel_matches_standard(rng):
    """The full-backbone transposed/padded kernel path
    (models/convnext._features_mlp_kernel): parity vs the standard features
    graph at bf16, including masked stem/downsample LNs and a non-square-
    stage-divisible size is covered by the 64px config (stages 16/8/4/2)."""
    from genconvit_tpu.models.convnext import (_features_mlp_kernel,
                                               convnext_features)

    params = init_convnext(jax.random.PRNGKey(0))
    for s in params["stages"]:
        for b in s["blocks"]:
            b["gamma"] = jnp.full_like(b["gamma"], 0.3)
    x = jnp.asarray(rng.standard_normal((2, 64, 64, 3)), jnp.bfloat16)
    ref = convnext_features(params, x)
    got = _features_mlp_kernel(params, x)
    a, bv = np.asarray(ref, np.float32), np.asarray(got, np.float32)
    rel = np.abs(a - bv).max() / max(np.abs(a).max(), 1e-6)
    assert got.shape == ref.shape
    assert rel < 5e-2, f"rel {rel}"


def test_fused_stage_grad_matches_xla(rng):
    """custom-vjp around the stage kernel: backward equals XLA autodiff."""
    from genconvit_tpu.models.convnext import _block_xla, _stage_pallas_bwd

    full = init_convnext(jax.random.PRNGKey(0))
    c, h = 96, 28
    blocks = [dict(full["stages"][0]["blocks"][i]) for i in range(2)]
    for b in blocks:
        b["gamma"] = jnp.full((c,), 0.3, jnp.float32)
    x = jnp.asarray(rng.standard_normal((2, h, h, c)).astype(np.float32))

    def loss_ref(bs, v):
        for b in bs:
            v = _block_xla(b, v)
        return jnp.sum(jnp.square(v))

    ref_val, ref_grads = jax.value_and_grad(loss_ref, argnums=(0, 1))(blocks, x)
    from genconvit_tpu.ops.pallas.convnext_stage import fused_convnext_stage

    out = fused_convnext_stage(x.astype(jnp.float32), blocks, interpret=True)
    g = 2.0 * out
    db, dx = _stage_pallas_bwd((blocks, x), g)
    np.testing.assert_allclose(np.asarray(dx), np.asarray(ref_grads[1]),
                               rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(db[0]["norm"]["scale"]),
                               np.asarray(ref_grads[0][0]["norm"]["scale"]),
                               rtol=2e-3, atol=2e-3)
