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


def test_manifest_preflight_round_trip(ref_shim, tmp_path):
    """VERDICT r3 item 5: recorder --manifest -> preflight_manifest must
    round-trip OK on a consumable layout, and pinpoint (a) renamed keys with
    close-match suggestions, (b) unconsumed extra keys, (c) shape drift."""
    sys.path.insert(0, os.path.join(REPO, "tools"))
    try:
        import record_reference_torch as rrt
    finally:
        sys.path.remove(os.path.join(REPO, "tools"))
    from genconvit_tpu.core.convert import preflight_manifest

    out_dir = tmp_path / "parity"
    out_dir.mkdir()
    rrt.record_manifests(ref_shim, str(out_dir))
    for which in ("ed", "vae"):
        mf_path = out_dir / f"manifest_{which}.json"
        assert mf_path.is_file()
        manifest = json.loads(mf_path.read_text())
        assert all("shape" in v and "dtype" in v for v in manifest.values())

        report = preflight_manifest(manifest)
        assert report["ok"], f"{which}: {report}"
        assert report["branch"] == which
        assert report["keys"] == len(manifest)

    manifest = json.loads((out_dir / "manifest_ed.json").read_text())

    # (a) a renamed key (naming drift): converter misses it -> suggestion
    drifted = dict(manifest)
    val = drifted.pop("fc.weight")
    drifted["fc.linear.weight"] = val
    report = preflight_manifest(drifted, which="ed")
    assert not report["ok"]
    assert "fc.weight" in report["error"]
    assert "fc.linear.weight" in report["suggestions"].get("fc.weight", [])

    # (b) an extra key (new parameter group): strict-unused names it
    extra = dict(manifest)
    extra["backbone.novel_branch.weight"] = {"shape": [4, 4], "dtype": "float32"}
    report = preflight_manifest(extra, which="ed")
    assert not report["ok"]
    assert "backbone.novel_branch.weight" in report["unused"]

    # (c) shape drift vs an expected tree (the transposes themselves are
    # shape-agnostic, so this check needs the init-tree expectation —
    # convert_weights.py --preflight --expect-init builds it from
    # jax.eval_shape of the target config)
    from genconvit_tpu.core.convert import (convert_checkpoint,
                                            state_dict_from_manifest)

    expected_tree = convert_checkpoint(state_dict_from_manifest(manifest),
                                       which="ed")
    bad_shape = dict(manifest)
    bad_shape["fc.weight"] = {"shape": [7, 3], "dtype": "float32"}
    report = preflight_manifest(bad_shape, which="ed", expected=expected_tree)
    assert not report["ok"] and report["error"]
    assert any("fc" in m for m in report["shape_mismatches"])
    # and the clean manifest passes the same expectation
    report = preflight_manifest(manifest, which="ed", expected=expected_tree)
    assert report["ok"], report


def test_preflight_cli(ref_shim, tmp_path):
    """convert_weights.py --preflight exits 0 on a clean manifest, 1 on
    drift — the shape of the first weights-enabled run's first command."""
    import subprocess

    sys.path.insert(0, os.path.join(REPO, "tools"))
    try:
        import record_reference_torch as rrt
    finally:
        sys.path.remove(os.path.join(REPO, "tools"))
    out_dir = tmp_path / "parity"
    out_dir.mkdir()
    rrt.record_manifests(ref_shim, str(out_dir))

    env = dict(os.environ, GENCONVIT_PLATFORM="cpu")
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "convert_weights.py"),
         "--preflight", str(out_dir / "manifest_vae.json")],
        capture_output=True, text=True, env=env, timeout=300)
    assert r.returncode == 0, r.stdout + r.stderr
    assert "PREFLIGHT OK" in r.stdout

    mf = json.loads((out_dir / "manifest_vae.json").read_text())
    mf["encoder.mu.weight"], mf["encoder.mystery.weight"] = (
        None, mf.pop("encoder.mu.weight"))
    del mf["encoder.mu.weight"]
    (out_dir / "drifted.json").write_text(json.dumps(mf))
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "convert_weights.py"),
         "--preflight", str(out_dir / "drifted.json")],
        capture_output=True, text=True, env=env, timeout=300)
    assert r.returncode == 1, r.stdout + r.stderr
