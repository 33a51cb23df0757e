"""Dry-run of the weights-enabled parity runbook (docs/parity_runbook.md):
the torch-side recorder (tools/record_reference_torch.py) and the jax-side
A/B harness (tools/compare_activations.py) must round-trip each other
end-to-end — exercised here against a shim "reference repo" whose model
modules are the torch oracles, so the real run (reference repo + timm +
HF weights) is turnkey. VERDICT r2 next-round item #6.
"""

import json
import os
import sys
import types

import numpy as np
import pytest
import torch
import torch.nn as nn

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_SHIM_MODEL_INIT = ""

_SHIM_CONFIG = """
def load_config():
    return {"img_size": 64, "model": {"latent_dims": 1024}}
"""

# the shim reproduces the reference's public model API surface the recorder
# touches (class names, attribute names, state-dict key layout) on top of
# the hand-written oracles in tests/torch_oracles.py
_SHIM_ED = """
import os, sys
import torch.nn as nn
sys.path.insert(0, {tests_dir!r})
from torch_oracles import ConvNeXtOracle, EDDecoderOracle, EDEncoderOracle


class GenConViTED(nn.Module):
    def __init__(self, config, pretrained=False):
        super().__init__()
        self.encoder = EDEncoderOracle()
        self.decoder = EDDecoderOracle()
        self.backbone = ConvNeXtOracle(depths=(1, 1, 1, 1),
                                       dims=(8, 16, 32, 64), num_classes=10)
        self.fc = nn.Linear(20, 5)
        self.fc2 = nn.Linear(5, 2)
        self.relu = nn.GELU()  # the reference names its GELU "relu"
"""

_SHIM_VAE = """
import os, sys
import torch.nn as nn
sys.path.insert(0, {tests_dir!r})
from torch_oracles import ConvNeXtOracle, VAEDecoderOracle, VAEEncoderOracle


class GenConViTVAE(nn.Module):
    def __init__(self, config):
        super().__init__()
        self.encoder = VAEEncoderOracle(img_size=64)
        # dead parameter groups the reference carries (quirk B9) — the
        # converter accounts for them in checkpoints
        flat = 128 * (64 // 16) ** 2
        self.encoder.fc1 = nn.Linear(flat, 256)
        self.encoder.fc2 = nn.Linear(256, 128)
        self.decoder = VAEDecoderOracle(s=2)
        self.convnext_backbone = ConvNeXtOracle(depths=(1, 1, 1, 1),
                                                dims=(8, 16, 32, 64),
                                                num_classes=10)
        self.fc = nn.Linear(20, 5)
        self.fc2 = nn.Linear(5, 2)
        self.fc3 = nn.Linear(10, 5)
        self.relu = nn.ReLU()
"""


@pytest.fixture
def ref_shim(tmp_path):
    """A minimal on-disk 'reference repo': model/ package + weight/*.pth."""
    root = tmp_path / "refshim"
    model = root / "model"
    model.mkdir(parents=True)
    tests_dir = os.path.join(REPO, "tests")
    (model / "__init__.py").write_text(_SHIM_MODEL_INIT)
    (model / "config.py").write_text(_SHIM_CONFIG)
    (model / "genconvit_ed.py").write_text(_SHIM_ED.format(tests_dir=tests_dir))
    (model / "genconvit_vae.py").write_text(_SHIM_VAE.format(tests_dir=tests_dir))
    (root / "weight").mkdir()

    sys.path.insert(0, str(root))
    try:
        torch.manual_seed(11)
        import importlib

        for m in ("model", "model.config", "model.genconvit_ed",
                  "model.genconvit_vae"):
            sys.modules.pop(m, None)
        ged = importlib.import_module("model.genconvit_ed").GenConViTED({})
        gvae = importlib.import_module("model.genconvit_vae").GenConViTVAE({})
        torch.save(ged.state_dict(), root / "weight" / "genconvit_ed_inference.pth")
        torch.save(gvae.state_dict(),
                   root / "weight" / "genconvit_vae_inference.pth")
        yield str(root)
    finally:
        sys.path.remove(str(root))
        for m in ("model", "model.config", "model.genconvit_ed",
                  "model.genconvit_vae"):
            sys.modules.pop(m, None)


def test_runbook_round_trip(ref_shim, tmp_path, rng, monkeypatch):
    """recorder (torch side, shim reference repo) -> harness record (jax
    side, same .pth through the real converter) -> harness compare: every
    named activation must agree. This proves the runbook's two scripts
    speak the same schema, so only timm + the HF weights are missing."""
    sys.path.insert(0, os.path.join(REPO, "tools"))
    try:
        import compare_activations as ca
        import record_reference_torch as rrt
    finally:
        sys.path.remove(os.path.join(REPO, "tools"))

    x = rng.standard_normal((2, 3, 64, 64)).astype(np.float32)
    input_path = tmp_path / "input.npy"
    np.save(input_path, x)
    out_dir = tmp_path / "parity"
    out_dir.mkdir()

    cwd = os.getcwd()
    try:  # the recorder chdirs into the reference root (quirk B11)
        rrt.record_activations(ref_shim, str(input_path), str(out_dir))
    finally:
        os.chdir(cwd)
    assert (out_dir / "acts_torch_ed.npz").is_file()
    assert (out_dir / "acts_torch_vae.npz").is_file()

    for which, extra in (("ed", {}), ("vae", {"deterministic": True})):
        args = types.SimpleNamespace(
            weights=os.path.join(ref_shim, "weight",
                                 f"genconvit_{which}_inference.pth"),
            which=which, input=str(input_path),
            out=str(tmp_path / f"acts_jax_{which}.npz"),
            deterministic=extra.get("deterministic", False), seed=0)
        ca.record(args)
        cargs = types.SimpleNamespace(
            a=str(out_dir / f"acts_torch_{which}.npz"),
            b=str(tmp_path / f"acts_jax_{which}.npz"),
            rtol=1e-3, atol=1e-3)
        with pytest.raises(SystemExit) as e:
            ca.compare(cargs)
        assert e.value.code == 0, f"{which} activations diverged"

    # negative control: the comparator must actually FAIL on a perturbed dump
    bad = dict(np.load(tmp_path / "acts_jax_ed.npz"))
    bad["logits"] = bad["logits"] + 1.0
    np.savez(tmp_path / "acts_bad.npz", **bad)
    with pytest.raises(SystemExit) as e:
        ca.compare(types.SimpleNamespace(
            a=str(out_dir / "acts_torch_ed.npz"),
            b=str(tmp_path / "acts_bad.npz"), rtol=1e-3, atol=1e-3))
    assert e.value.code == 1
