"""Whole-model parity through the real converter entry points: torch oracles
assembled exactly like the reference models -> state dicts with reference key
names -> core.convert -> JAX forward, compared end to end."""

import numpy as np
import pytest
import torch
import torch.nn as nn

import jax
import jax.numpy as jnp

from genconvit_tpu.core import convert
from genconvit_tpu.models.ed import ed_apply
from genconvit_tpu.models.swin import SWIN_CFGS, swin_apply
from genconvit_tpu.models.vae import vae_apply

from tests.torch_oracles import (
    ConvNeXtOracle,
    EDDecoderOracle,
    EDEncoderOracle,
    SwinOracle,
    VAEDecoderOracle,
    VAEEncoderOracle,
)


def _nhwc(x):
    return np.transpose(x, (0, 2, 3, 1))


def test_full_ed_model_parity(rng):
    torch.manual_seed(0)
    enc, dec = EDEncoderOracle().eval(), EDDecoderOracle().eval()
    bb = ConvNeXtOracle(depths=(1, 1, 1, 1), dims=(8, 16, 32, 64),
                        num_classes=10).eval()
    fc, fc2 = nn.Linear(20, 5), nn.Linear(5, 2)
    gelu = nn.GELU()

    x = torch.from_numpy(rng.standard_normal((2, 3, 64, 64), dtype=np.float32))
    with torch.no_grad():
        # exact reference ED forward (ref model/genconvit_ed.py:77-88)
        d = dec(enc(x))
        cat = torch.cat([bb(d), bb(x)], dim=1)
        ref = fc2(gelu(fc(gelu(cat)))).numpy()

    sd = {}
    sd.update({f"encoder.{k}": v for k, v in enc.state_dict().items()})
    sd.update({f"decoder.{k}": v for k, v in dec.state_dict().items()})
    sd.update({f"backbone.{k}": v for k, v in bb.state_dict().items()})
    sd.update({f"fc.{k}": v for k, v in fc.state_dict().items()})
    sd.update({f"fc2.{k}": v for k, v in fc2.state_dict().items()})
    params = convert.convert_ed(sd)

    logits, _ = ed_apply(params, jnp.asarray(_nhwc(x.numpy())))
    np.testing.assert_allclose(np.asarray(logits), ref, rtol=1e-3, atol=1e-4)


def test_full_vae_model_parity(rng):
    torch.manual_seed(1)
    img = 64
    enc = VAEEncoderOracle(img_size=img).eval()
    dec = VAEDecoderOracle(s=img // 32).eval()
    bb = ConvNeXtOracle(depths=(1, 1, 1, 1), dims=(8, 16, 32, 64),
                        num_classes=10).eval()
    fc, fc2 = nn.Linear(20, 5), nn.Linear(5, 2)
    relu = nn.ReLU()

    x = torch.from_numpy(rng.standard_normal((2, 3, img, img), dtype=np.float32))
    with torch.no_grad():
        mu, _ = enc.forward_mu_logvar(x)
        x_hat = dec(mu)  # deterministic path: z = mu
        cat = torch.cat([bb(x), bb(x_hat)], dim=1)
        ref = fc2(relu(fc(relu(cat)))).numpy()

    sd = {}
    sd.update({f"encoder.{k}": v for k, v in enc.state_dict().items()})
    sd.update({f"decoder.{k}": v for k, v in dec.state_dict().items()})
    sd.update({f"convnext_backbone.{k}": v for k, v in bb.state_dict().items()})
    sd.update({f"fc.{k}": v for k, v in fc.state_dict().items()})
    sd.update({f"fc2.{k}": v for k, v in fc2.state_dict().items()})
    params = convert.convert_vae(sd, carry_dead_params=False)

    logits, recon, aux = vae_apply(params, jnp.asarray(_nhwc(x.numpy())),
                                   sample=False)
    np.testing.assert_allclose(np.asarray(logits), ref, rtol=1e-3, atol=1e-4)
    assert recon.shape == (2, img, img, 3)


def test_full_swin_model_parity(rng):
    torch.manual_seed(2)
    model = SwinOracle(img=32, dim=16, depths=(2, 2), heads=(2, 4),
                       window=4, num_classes=10).eval()
    x = torch.from_numpy(rng.standard_normal((2, 3, 32, 32), dtype=np.float32))
    with torch.no_grad():
        ref = model(x).numpy()
    params = convert.convert_swin(model.state_dict())
    SWIN_CFGS["_test_small"] = dict(embed_dim=16, depths=(2, 2),
                                    num_heads=(2, 4), window=4)
    out = swin_apply(params, jnp.asarray(_nhwc(x.numpy())), "_test_small")
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-3, atol=1e-4)
