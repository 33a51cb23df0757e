"""KernelPlan plumbing: env resolved once at construction, no trace-time
os.environ dependence, knobs participate in kernel jit cache keys
(VERDICT r2 weak #6 / advisor low findings)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from genconvit_tpu.ops.kernel_plan import KernelPlan, current_plan, plan_scope


def test_from_env_parses_every_knob(monkeypatch):
    monkeypatch.setenv("GENCONVIT_PALLAS", "mlp:0,1")
    monkeypatch.setenv("GENCONVIT_GELU", "hp")
    monkeypatch.setenv("GENCONVIT_MLP_PANEL", "4")
    monkeypatch.setenv("GENCONVIT_MLP_SPLIT", "2")
    p = KernelPlan.from_env()
    assert p == KernelPlan(pallas="mlp:0,1", gelu="hp", mlp_panel_mb=4,
                           mlp_split=2)
    # EXACT_GELU wins over GELU=hp (it forces the erf fallback everywhere)
    monkeypatch.setenv("GENCONVIT_EXACT_GELU", "1")
    assert KernelPlan.from_env().gelu == "exact"


def test_plan_scope_overrides_env(monkeypatch):
    monkeypatch.setenv("GENCONVIT_GELU", "hp")
    assert current_plan().gelu == "hp"  # fallback reads env fresh
    with plan_scope(KernelPlan(gelu="default")):
        assert current_plan().gelu == "default"
        # env mutations inside a scope are invisible — the bound plan wins
        monkeypatch.setenv("GENCONVIT_GELU", "")
        assert current_plan().gelu == "default"
    assert current_plan().gelu == "default"  # env now cleared


def test_plan_bound_during_trace(monkeypatch):
    """The plan a jitted function sees is the one bound when its body runs
    (= trace time), not os.environ at call time."""
    seen = []

    def f(x):
        seen.append(current_plan().gelu)
        return x * 2

    monkeypatch.setenv("GENCONVIT_GELU", "hp")
    with plan_scope(KernelPlan(gelu="default")):
        jax.jit(f)(jnp.ones(3))
    assert seen == ["default"]


def test_mlp_kernel_knobs_are_cache_keys():
    """Same shapes, different split/panel knobs -> distinct executables that
    both produce the block-tail result (the r2 bug: env-read knobs were
    invisible to the inner jit cache, so the first trace won silently)."""
    from genconvit_tpu.ops.pallas.convnext_mlp import fused_ln_mlp_residual

    rng = np.random.default_rng(0)
    c = 128
    x = jnp.asarray(rng.standard_normal((2, 8, 8, c)), jnp.float32)
    dw = jnp.asarray(rng.standard_normal((2, 8, 8, c)), jnp.float32)
    p = {
        "norm": {"scale": jnp.ones((c,)), "bias": jnp.zeros((c,))},
        "mlp": {
            "fc1": {"kernel": jnp.asarray(
                rng.standard_normal((c, 4 * c)) * 0.02, jnp.float32),
                "bias": jnp.zeros((4 * c,))},
            "fc2": {"kernel": jnp.asarray(
                rng.standard_normal((4 * c, c)) * 0.02, jnp.float32),
                "bias": jnp.zeros((c,))},
        },
        "gamma": jnp.full((c,), 0.1, jnp.float32),
    }
    a = fused_ln_mlp_residual(dw, x, p, interpret=True, split=1)
    b = fused_ln_mlp_residual(dw, x, p, interpret=True, split=2)
    d = fused_ln_mlp_residual(dw, x, p, interpret=True, panel_mb=1)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)
    np.testing.assert_allclose(np.asarray(a), np.asarray(d), atol=1e-5)


def test_int8_mlp_tail_matches_bf16_path():
    """W8A8 MLP tail (KernelPlan.int8_mlp): per-row activation x per-column
    weight int8 scales must track the f32 kernel within int8 resolution, and
    channel-pad lanes must stay exactly zero (the per-row absmax reads them)."""
    from genconvit_tpu.ops.pallas.convnext_mlp import fused_ln_mlp_residual

    rng = np.random.default_rng(1)
    c, rc = 128, 96
    live = (np.arange(c) < rc).astype(np.float32)
    x = jnp.asarray(rng.standard_normal((2, 16, 16, c)) * live, jnp.float32)
    dw = jnp.asarray(rng.standard_normal((2, 16, 16, c)) * live, jnp.float32)
    p = {
        "norm": {"scale": jnp.asarray((rng.standard_normal(c) * 0.1 + 1) * live,
                                      jnp.float32),
                 "bias": jnp.asarray(rng.standard_normal(c) * 0.1 * live,
                                     jnp.float32)},
        "mlp": {"fc1": {"kernel": jnp.asarray(
            rng.standard_normal((c, 4 * c)) * 0.05 * live[:, None], jnp.float32),
            "bias": jnp.asarray(rng.standard_normal(4 * c) * 0.02, jnp.float32)},
            "fc2": {"kernel": jnp.asarray(
                rng.standard_normal((4 * c, c)) * 0.05 * live[None, :],
                jnp.float32),
                "bias": jnp.asarray(rng.standard_normal(c) * 0.02 * live,
                                    jnp.float32)}},
        "gamma": jnp.asarray(np.full(c, 0.5) * live, jnp.float32),
    }
    for post_ln in (None, (jnp.asarray(live), jnp.zeros(c))):
        ref = np.asarray(fused_ln_mlp_residual(
            dw, x, p, interpret=True, real_c=rc, post_ln=post_ln, int8=""))
        scale = np.abs(ref).max()
        for mode, tol in (("full", 0.01), ("fc1", 0.02)):
            q = np.asarray(fused_ln_mlp_residual(
                dw, x, p, interpret=True, real_c=rc, post_ln=post_ln,
                int8=mode))
            assert np.abs(q[..., rc:]).max() == 0.0, mode
            assert np.abs(q - ref).max() < tol * scale, mode


def test_predictor_jit_cache_keyed_on_plan(monkeypatch):
    from genconvit_tpu.config import Config
    from genconvit_tpu.infer.engine import Predictor

    cfg = Config()
    cfg.img_size = 32
    cfg.model.latent_dims = cfg.derived_latent_dims()
    cfg.weight_dir = "/nonexistent"
    monkeypatch.setenv("GENCONVIT_FAST_INIT", "1")
    p = Predictor(cfg, net="ed", face_backend="fullframe")
    p._forward_fn(2, batched=True, stacked=True)
    p.kernel_plan = KernelPlan(gelu="hp")
    p._forward_fn(2, batched=True, stacked=True)
    assert len(p._jit_cache) == 2  # distinct plans -> distinct entries


def test_plan_file_roundtrip_and_env_layering(tmp_path, monkeypatch):
    """Tuned-plan files (tools/autotune.py): save -> load roundtrips every
    field, GENCONVIT_KERNEL_PLAN feeds from_env as the base, and only
    EXPLICITLY-set env knobs override tuned fields."""
    from genconvit_tpu.ops.kernel_plan import save_plan

    tuned = KernelPlan(pallas="mlp", gelu="hp", mlp_panel_mb=4, mlp_split=2,
                       int8_mlp="fc1")
    path = tmp_path / "kernel_plan.json"
    save_plan(tuned, str(path), meta={"device_kind": "test", "note": "x"})
    assert KernelPlan.load(str(path)) == tuned  # _meta ignored

    for var in ("GENCONVIT_PALLAS", "GENCONVIT_GELU", "GENCONVIT_EXACT_GELU",
                "GENCONVIT_MLP_PANEL", "GENCONVIT_MLP_SPLIT",
                "GENCONVIT_INT8_MLP"):
        monkeypatch.delenv(var, raising=False)
    monkeypatch.setenv("GENCONVIT_KERNEL_PLAN", str(path))
    assert KernelPlan.from_env() == tuned  # no env knobs -> tuned file wins

    monkeypatch.setenv("GENCONVIT_PALLAS", "0")  # explicit override
    layered = KernelPlan.from_env()
    assert layered.pallas == "0"
    assert (layered.gelu, layered.mlp_panel_mb, layered.mlp_split,
            layered.int8_mlp) == ("hp", 4, 2, "fc1")  # rest still tuned

    # "0" means unset for the integer knobs (historical contract)
    monkeypatch.setenv("GENCONVIT_MLP_PANEL", "0")
    assert KernelPlan.from_env().mlp_panel_mb == 4

    monkeypatch.delenv("GENCONVIT_KERNEL_PLAN")
    monkeypatch.delenv("GENCONVIT_PALLAS")
    monkeypatch.delenv("GENCONVIT_MLP_PANEL")
    assert KernelPlan.from_env() == KernelPlan()  # no file, no knobs


def test_fast_init_matches_torch_default_stats(monkeypatch):
    """GENCONVIT_FAST_INIT draws must follow the same distributions as the
    jax path (torch kaiming-uniform bounds / trunc-normal)."""
    monkeypatch.setenv("GENCONVIT_FAST_INIT", "1")
    from genconvit_tpu.ops.init import linear_init, trunc_normal_init

    k = jax.random.PRNGKey(7)
    li = linear_init(k, 400, 300)
    bound = 1.0 / np.sqrt(400)
    w = np.asarray(li["kernel"])
    assert w.shape == (400, 300) and w.dtype == np.float32
    assert np.abs(w).max() <= bound
    assert np.abs(w).max() > 0.9 * bound  # actually fills the range
    assert abs(w.std() - bound / np.sqrt(3)) < 0.05 * bound
    tn = np.asarray(trunc_normal_init(k, (50000,), std=0.02))
    assert np.abs(tn).max() <= 0.04 + 1e-6
    assert abs(float(np.std(tn)) - 0.02 * 0.88) < 0.002  # truncated-σ ≈ .88σ
