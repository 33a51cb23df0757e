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


def test_full_vae_updated_model_parity(rng):
    """The genconvit_vae_updated variant (ref model/genconvit_vae_updated.py):
    fixed reparameterization (std from var), decoder_input Linear + BN'd
    ConvTranspose stack + Tanh, dropout classifier — torch oracle assembled
    with the reference's exact Sequential indices -> converter -> JAX."""
    torch.manual_seed(4)
    img, latent = 64, 256

    class UpdEncoder(nn.Module):  # ref :10-55
        def __init__(self):
            super().__init__()
            layers = []
            chans = (3, 16, 32, 64, 128)
            for i in range(4):
                layers += [nn.Conv2d(chans[i], chans[i + 1], 3, 2, 1),
                           nn.BatchNorm2d(chans[i + 1]), nn.LeakyReLU()]
            self.features = nn.Sequential(*layers)
            flat = 128 * (img // 16) ** 2
            self.fc1 = nn.Linear(flat, 256)
            self.fc2 = nn.Linear(256, 128)
            self.mu = nn.Linear(flat, latent)
            self.var = nn.Linear(flat, latent)

    class UpdDecoder(nn.Module):  # ref :69-107
        def __init__(self):
            super().__init__()
            s = img // 16
            self.decoder_input = nn.Linear(latent, 128 * s * s)
            self.unflatten = nn.Unflatten(1, (128, s, s))
            self.features = nn.Sequential(
                nn.ConvTranspose2d(128, 64, 2, 2), nn.BatchNorm2d(64), nn.LeakyReLU(),
                nn.ConvTranspose2d(64, 32, 2, 2), nn.BatchNorm2d(32), nn.LeakyReLU(),
                nn.ConvTranspose2d(32, 16, 2, 2), nn.BatchNorm2d(16), nn.LeakyReLU(),
                nn.ConvTranspose2d(16, 3, 2, 2), nn.Tanh())

        def forward(self, z):
            return self.features(self.unflatten(self.decoder_input(z)))

    enc, dec = UpdEncoder().eval(), UpdDecoder().eval()
    bb = ConvNeXtOracle(depths=(1, 1, 1, 1), dims=(8, 16, 32, 64),
                        num_classes=10).eval()
    fc, fc2, fc3 = nn.Linear(20, 5), nn.Linear(5, 2), nn.Linear(10, 5)
    relu = nn.ReLU()

    x = torch.from_numpy(rng.standard_normal((2, 3, img, img), dtype=np.float32))
    with torch.no_grad():
        feats = torch.flatten(enc.features(x), start_dim=1)
        mu = enc.mu(feats)
        x_hat = dec(mu)  # deterministic: z = mu
        cat = torch.cat([bb(x), bb(x_hat)], dim=1)
        # ref :192-198: relu -> dropout(eval=id) -> fc -> relu -> dropout -> fc2
        ref = fc2(relu(fc(relu(cat)))).numpy()

    sd = {}
    sd.update({f"encoder.{k}": v for k, v in enc.state_dict().items()})
    sd.update({f"decoder.{k}": v for k, v in dec.state_dict().items()})
    sd.update({f"convnext_backbone.{k}": v for k, v in bb.state_dict().items()})
    sd.update({f"fc.{k}": v for k, v in fc.state_dict().items()})
    sd.update({f"fc2.{k}": v for k, v in fc2.state_dict().items()})
    sd.update({f"fc3.{k}": v for k, v in fc3.state_dict().items()})
    assert convert.detect_branch(sd) == "vae_updated"
    params = convert.convert_checkpoint(sd, strict=True)

    from genconvit_tpu.models.vae import is_updated_vae
    assert is_updated_vae(params)
    logits, recon, aux = vae_apply(params, jnp.asarray(_nhwc(x.numpy())),
                                   sample=False)
    np.testing.assert_allclose(np.asarray(logits), ref, rtol=1e-3, atol=1e-4)
    assert recon.shape == (2, img, img, 3)
    np.testing.assert_allclose(np.asarray(aux["mu"]), mu.numpy(),
                               rtol=1e-3, atol=1e-4)


def test_strict_conversion_accounts_for_every_key(rng):
    """convert_checkpoint(strict=True) must pass when the converter consumed
    the whole state dict and fail loudly on any leftover key — the guard
    against silently misreading the timm layout (VERDICT r1 item 3a)."""
    torch.manual_seed(3)
    enc, dec = EDEncoderOracle().eval(), EDDecoderOracle().eval()
    bb = ConvNeXtOracle(depths=(1, 1, 1, 1), dims=(8, 16, 32, 64),
                        num_classes=10).eval()
    fc, fc2 = nn.Linear(20, 5), nn.Linear(5, 2)
    sd = {}
    sd.update({f"encoder.{k}": v for k, v in enc.state_dict().items()})
    sd.update({f"decoder.{k}": v for k, v in dec.state_dict().items()})
    sd.update({f"backbone.{k}": v for k, v in bb.state_dict().items()})
    sd.update({f"fc.{k}": v for k, v in fc.state_dict().items()})
    sd.update({f"fc2.{k}": v for k, v in fc2.state_dict().items()})

    convert.convert_checkpoint(sd, which="ed", strict=True)  # fully consumed

    # bookkeeping keys are expected leftovers, not errors
    sd_ok = dict(sd)
    sd_ok["backbone.stages.0.blocks.0.num_batches_tracked"] = torch.zeros(1)
    convert.convert_checkpoint(sd_ok, which="ed", strict=True)

    # a genuinely unconsumed weight must fail
    sd_bad = dict(sd)
    sd_bad["backbone.stages.0.blocks.0.mlp.fc3.weight"] = torch.zeros(4, 4)
    with pytest.raises(ValueError, match="not consumed"):
        convert.convert_checkpoint(sd_bad, which="ed", strict=True)
    # ...and non-strict keeps the permissive behavior
    convert.convert_checkpoint(sd_bad, which="ed", strict=False)


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
