"""Model-graph parity: torch oracles (built from the SURVEY spec) -> weight
converter -> JAX apply, compared numerically. This validates both the model
graphs and the layout transforms in core/convert.py."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from genconvit_tpu.core import convert
from genconvit_tpu.models import convnext as cnx
from genconvit_tpu.models import ed as ed_mod
from genconvit_tpu.models import vae as vae_mod
from genconvit_tpu.models.genconvit import genconvit_apply, init_genconvit
from genconvit_tpu.config import Config

from tests.torch_oracles import (
    ConvNeXtOracle,
    EDDecoderOracle,
    EDEncoderOracle,
    SwinWindowAttentionOracle,
    VAEDecoderOracle,
    VAEEncoderOracle,
)


def _nhwc(x):
    return np.transpose(x, (0, 2, 3, 1))


def test_ed_encoder_decoder_parity(rng):
    enc_t, dec_t = EDEncoderOracle().eval(), EDDecoderOracle().eval()
    x = rng.standard_normal((2, 3, 64, 64), dtype=np.float32)
    with torch.no_grad():
        lat_ref = enc_t(torch.from_numpy(x))
        rec_ref = dec_t(lat_ref).numpy()
    sd = {**{f"encoder.{k}": v for k, v in enc_t.state_dict().items()},
          **{f"decoder.{k}": v for k, v in dec_t.state_dict().items()}}
    enc_p = [convert._conv(sd, f"encoder.features.{i}") for i in (0, 3, 6, 9, 12)]
    dec_p = [convert._convT(sd, f"decoder.features.{i}") for i in (0, 2, 4, 6, 8)]
    lat = ed_mod.ed_encode({"encoder": enc_p}, jnp.asarray(_nhwc(x)))
    rec = ed_mod.ed_decode({"decoder": dec_p}, lat)
    np.testing.assert_allclose(np.asarray(lat), _nhwc(lat_ref.numpy()), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(rec), _nhwc(rec_ref), rtol=1e-4, atol=1e-5)


def test_vae_encoder_decoder_parity(rng):
    img = 64
    enc_t = VAEEncoderOracle(img_size=img).eval()
    s = img // 32
    dec_t = VAEDecoderOracle(s=s).eval()
    x = rng.standard_normal((2, 3, img, img), dtype=np.float32)
    with torch.no_grad():
        mu_ref, logvar_ref = enc_t.forward_mu_logvar(torch.from_numpy(x))
        z_ref = mu_ref  # deterministic path
        rec_ref = dec_t(z_ref).numpy()
    sd = {**{f"encoder.{k}": v for k, v in enc_t.state_dict().items()},
          **{f"decoder.{k}": v for k, v in dec_t.state_dict().items()}}
    enc_p = {
        "convs": [convert._conv(sd, f"encoder.features.{i}") for i in (0, 3, 6, 9)],
        "bns": [convert._bn(sd, f"encoder.features.{i}") for i in (1, 4, 7, 10)],
        "mu": convert._linear(sd, "encoder.mu"),
        "var": convert._linear(sd, "encoder.var"),
    }
    dec_p = [convert._convT(sd, f"decoder.features.{i}") for i in (0, 2, 4, 6)]
    z, aux = vae_mod.vae_encode({"encoder": enc_p}, jnp.asarray(_nhwc(x)), None, sample=False)
    rec = vae_mod.vae_decode({"decoder": dec_p}, z)
    np.testing.assert_allclose(np.asarray(aux["mu"]), mu_ref.numpy(), rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(aux["logvar"]), logvar_ref.numpy(), rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(rec), _nhwc(rec_ref), rtol=1e-3, atol=1e-4)
    # KL matches the reference formula on (mu, logvar)
    kl_ref = 0.5 * torch.mean(
        -0.5 * torch.sum(1 + logvar_ref - mu_ref**2 - logvar_ref.exp(), dim=1), dim=0)
    np.testing.assert_allclose(float(aux["kl"]), float(kl_ref), rtol=1e-3, atol=1e-4)


def test_convnext_parity(rng):
    model = ConvNeXtOracle(depths=(2, 2), dims=(16, 32), num_classes=10).eval()
    x = rng.standard_normal((2, 3, 32, 32), dtype=np.float32)
    with torch.no_grad():
        ref = model(torch.from_numpy(x)).numpy()
    params = convert.convert_convnext(model.state_dict())
    out = cnx.convnext_apply(params, jnp.asarray(_nhwc(x)))
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-5)


def test_swin_window_attention_parity(rng):
    from genconvit_tpu.models.swin import _window_attention
    dim, heads, window = 32, 4, 7
    attn_t = SwinWindowAttentionOracle(dim, heads, window).eval()
    x = rng.standard_normal((8, window * window, dim), dtype=np.float32)
    with torch.no_grad():
        ref = attn_t(torch.from_numpy(x)).numpy()
    sd = attn_t.state_dict()
    p = {
        "qkv": convert._linear(sd, "qkv"),
        "proj": convert._linear(sd, "proj"),
        "relative_position_bias_table": convert._np(sd["relative_position_bias_table"]),
    }
    out = _window_attention(p, jnp.asarray(x), heads, window, None)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-5)

    # shifted-window mask path against the torch oracle given the same mask
    from genconvit_tpu.models.swin import shifted_window_mask
    mask = shifted_window_mask(14, 14, 7, 3)  # 4 windows
    x2 = rng.standard_normal((8, 49, dim), dtype=np.float32)  # batch 2 x 4 windows
    with torch.no_grad():
        ref2 = attn_t(torch.from_numpy(x2), torch.from_numpy(mask)).numpy()
    out2 = _window_attention(p, jnp.asarray(x2), heads, window, jnp.asarray(mask))
    np.testing.assert_allclose(np.asarray(out2), ref2, rtol=1e-4, atol=1e-5)


def test_swin_full_forward_shapes():
    from genconvit_tpu.models.swin import init_swin, swin_apply
    params = init_swin(jax.random.PRNGKey(0), "swin_tiny_patch4_window7_224")
    x = jnp.zeros((1, 224, 224, 3))
    out = swin_apply(params, x)
    assert out.shape == (1, 1000)


def test_swin_unsupported_sizes_raise_clearly():
    """Grids that are neither window-divisible nor <= window (or odd at a
    patch-merge) crash timm 0.6.5 inside reshapes; we fail loudly instead."""
    from genconvit_tpu.models.swin import init_swin, swin_features
    params = init_swin(jax.random.PRNGKey(0), "swin_tiny_patch4_window7_224")
    with pytest.raises(ValueError, match="not divisible"):
        swin_features(params, jnp.zeros((1, 64, 64, 3)))  # grid 16 % 7 != 0
    with pytest.raises(ValueError, match="even grid"):
        swin_features(params, jnp.zeros((1, 112, 112, 3)))  # merge at 7x7


def test_swin_clamped_window_bias_indexing():
    """relative_position_index(w, table_w) for a clamped window must pick the
    same table entries as the full-window index restricted to those coords."""
    from genconvit_tpu.models.swin import relative_position_index
    full = relative_position_index(7, 7)   # [49, 49]
    small = relative_position_index(4, 7)  # [16, 16] into the SAME 13x13 table
    # map 4x4 coords into the 7x7 flattening
    pos = [r * 7 + c for r in range(4) for c in range(4)]
    np.testing.assert_array_equal(small, full[np.ix_(pos, pos)])


@pytest.fixture(scope="module")
def small_cfg():
    cfg = Config()
    cfg.img_size = 64
    cfg.model.latent_dims = cfg.derived_latent_dims()
    return cfg


class TestGenConViTEnsemble:
    def test_ensemble_concat_on_batch_axis(self, small_cfg):
        params = init_genconvit(jax.random.PRNGKey(0), small_cfg, "genconvit")
        x = jnp.ones((3, 64, 64, 3))
        logits, aux = genconvit_apply(params, x, net="genconvit",
                                      rng=jax.random.PRNGKey(1))
        # reference semantics: [2N, 2] with ED rows first (model/genconvit.py:74)
        assert logits.shape == (6, 2)
        ed_only, _ = genconvit_apply(params, x, net="ed")
        np.testing.assert_allclose(np.asarray(logits[:3]), np.asarray(ed_only),
                                   rtol=1e-5, atol=1e-6)

    def test_vae_sampling_is_stochastic_and_seedable(self, small_cfg):
        params = init_genconvit(jax.random.PRNGKey(0), small_cfg, "vae")
        x = jnp.ones((2, 64, 64, 3))
        l1, _ = genconvit_apply(params, x, net="vae", rng=jax.random.PRNGKey(1))
        l2, _ = genconvit_apply(params, x, net="vae", rng=jax.random.PRNGKey(1))
        l3, _ = genconvit_apply(params, x, net="vae", rng=jax.random.PRNGKey(2))
        np.testing.assert_array_equal(np.asarray(l1), np.asarray(l2))
        assert np.abs(np.asarray(l1) - np.asarray(l3)).max() > 0

    def test_vae_deterministic_mode(self, small_cfg):
        params = init_genconvit(jax.random.PRNGKey(0), small_cfg, "vae")
        x = jnp.ones((2, 64, 64, 3))
        l1, _ = genconvit_apply(params, x, net="vae", sample=False)
        l2, _ = genconvit_apply(params, x, net="vae", sample=False)
        np.testing.assert_array_equal(np.asarray(l1), np.asarray(l2))

    def test_vae_updated_variant_survives_engine_folds(self, small_cfg, rng):
        """Regression: the engine's default hwc fold (and opt-in int8 quant)
        renames mu/var; the updated-variant forward must dispatch through the
        folded heads instead of crashing on enc['mu'], and stay numerically
        equivalent (deterministic path)."""
        from genconvit_tpu.models.vae import (init_vae_updated,
                                              permute_latent_heads_hwc,
                                              quantize_latent_heads_int8,
                                              vae_apply)

        params = init_vae_updated(jax.random.PRNGKey(0), img_size=64)
        x = jnp.asarray(rng.standard_normal((2, 64, 64, 3)), jnp.float32)
        ref_l, _, _ = vae_apply(params, x, sample=False)
        pv = permute_latent_heads_hwc(params)
        got_l, _, _ = vae_apply(pv, x, sample=False)
        np.testing.assert_allclose(np.asarray(ref_l), np.asarray(got_l),
                                   rtol=1e-4, atol=1e-5)
        qv = quantize_latent_heads_int8(pv)
        q_l, _, _ = vae_apply(qv, x, sample=False)
        np.testing.assert_allclose(np.asarray(ref_l), np.asarray(q_l),
                                   rtol=0.05, atol=0.02)

    def test_vae_int8_latent_heads_close(self, small_cfg, rng):
        """quantize_latent_heads_int8 (GENCONVIT_INT8_HEADS=1): deterministic
        logits from the weight-only int8 mu head must track the exact head
        within quantization tolerance, through the hwc-permuted layout (the
        engine applies both folds)."""
        from genconvit_tpu.models.vae import (permute_latent_heads_hwc,
                                              quantize_latent_heads_int8)

        params = init_genconvit(jax.random.PRNGKey(0), small_cfg, "vae")
        x = jnp.asarray(rng.standard_normal((2, 64, 64, 3)), jnp.float32)
        ref_l, ref_aux = genconvit_apply(params, x, net="vae", sample=False)
        pv = quantize_latent_heads_int8(permute_latent_heads_hwc(params["vae"]))
        assert "mu_hwc_q" in pv["encoder"]
        got_l, got_aux = genconvit_apply({"vae": pv}, x, net="vae", sample=False)
        np.testing.assert_allclose(np.asarray(ref_l), np.asarray(got_l),
                                   rtol=0.05, atol=0.02)
        # recon comes from z=mu through the decoder: same tolerance class
        r, g = np.asarray(ref_aux["vae_recon"]), np.asarray(got_aux["vae_recon"])
        assert np.abs(r - g).max() / max(np.abs(r).max(), 1e-6) < 0.05

    def test_vae_hwc_permuted_heads_equivalent(self, small_cfg, rng):
        """permute_latent_heads_hwc (the engine's load-time latent layout
        fold) must leave deterministic logits and the reconstruction equal
        to reduction-order rounding: every z element is the same dot
        product relocated (the row permutation reorders the fp32
        contraction), and the decoder unflattens the relocation away."""
        from genconvit_tpu.models.vae import permute_latent_heads_hwc

        params = init_genconvit(jax.random.PRNGKey(0), small_cfg, "vae")
        x = jnp.asarray(rng.standard_normal((2, 64, 64, 3)), jnp.float32)
        ref_l, ref_aux = genconvit_apply(params, x, net="vae", sample=False)
        pp = {"vae": permute_latent_heads_hwc(params["vae"])}
        got_l, got_aux = genconvit_apply(pp, x, net="vae", sample=False)
        np.testing.assert_allclose(np.asarray(ref_l), np.asarray(got_l),
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(ref_aux["vae_recon"]),
                                   np.asarray(got_aux["vae_recon"]),
                                   rtol=1e-5, atol=1e-6)
        # kl is elementwise-summed -> permutation invariant
        np.testing.assert_allclose(np.asarray(ref_aux["vae_kl"]),
                                   np.asarray(got_aux["vae_kl"]), rtol=1e-5)

    def test_hwc_fold_commutes_with_bf16_cast(self, small_cfg):
        """The engine casts to bf16 BEFORE the HWC fold (half the gather
        bytes); a fold is a pure permutation so fold(cast(p)) must be
        bitwise-equal to cast(fold(p)), dtypes preserved — incl. the
        updated-variant decoder-input row re-index."""
        from genconvit_tpu.core.pytree import cast_floats
        from genconvit_tpu.models.vae import (init_vae, init_vae_updated,
                                              permute_latent_heads_hwc)

        for init in (init_vae, init_vae_updated):
            params = init(jax.random.PRNGKey(1), img_size=64)
            a = permute_latent_heads_hwc(cast_floats(params, jnp.bfloat16))
            b = cast_floats(permute_latent_heads_hwc(params), jnp.bfloat16)
            la = jax.tree_util.tree_leaves_with_path(a)
            lb = jax.tree_util.tree_leaves_with_path(b)
            assert len(la) == len(lb)
            for (pa, xa), (pb, xb) in zip(la, lb):
                assert pa == pb
                assert xa.dtype == xb.dtype == jnp.bfloat16
                np.testing.assert_array_equal(np.asarray(xa), np.asarray(xb))


def test_swiglu_head_option(small_cfg):
    from genconvit_tpu.models.ed import ed_apply, init_ed

    params = init_ed(jax.random.PRNGKey(0), head_act="swiglu",
                     backbone_classes=10)
    assert params["fc"]["kernel"].shape == (20, 10)  # gate pairs
    x = jnp.ones((2, 64, 64, 3))
    logits, _ = ed_apply(params, x)
    assert logits.shape == (2, 2)
    assert np.isfinite(np.asarray(logits)).all()


@pytest.mark.slow
def test_large_variant_shapes():
    """convnext_large + swin_large configs initialize and forward (the --s
    large CLI path, ref prediction.py:314-318)."""
    from genconvit_tpu.models.convnext import convnext_apply, init_convnext
    params = init_convnext(jax.random.PRNGKey(0), "convnext_large")
    out = convnext_apply(params, jnp.zeros((1, 64, 64, 3)))
    assert out.shape == (1, 1000)
