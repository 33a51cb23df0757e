"""Remaining surface tests: hybrid-embed research path, fp16 engine, model
summary, live-params pruning, stage timers."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from genconvit_tpu.config import Config


def test_hybrid_embed_research_path():
    from genconvit_tpu.models.hybrid_embed import hybrid_embed_tokens, init_hybrid_embed
    from genconvit_tpu.models.swin import SWIN_CFGS

    SWIN_CFGS.setdefault("_test_small", dict(embed_dim=16, depths=(2, 2),
                                             num_heads=(2, 4), window=4))
    # research proj must match the swin token width (32 = 16 * 2^(2-1))
    params = init_hybrid_embed(jax.random.PRNGKey(0), "_test_small",
                               embed_dim=24, backbone_classes=32)
    x = jnp.zeros((1, 32, 32, 3))
    tokens = hybrid_embed_tokens(params, x, "_test_small")
    assert tokens.shape == (1, 16, 24)  # 4x4 final grid, embed 24


def test_hybrid_embed_shape_mismatch_raises():
    from genconvit_tpu.models.hybrid_embed import hybrid_embed_tokens, init_hybrid_embed
    from genconvit_tpu.models.swin import SWIN_CFGS

    SWIN_CFGS.setdefault("_test_small", dict(embed_dim=16, depths=(2, 2),
                                             num_heads=(2, 4), window=4))
    # checkpoint-layout proj probes the classifier width (1000-style), which
    # mismatches the token width — the working path must refuse loudly
    params = init_hybrid_embed(jax.random.PRNGKey(0), "_test_small",
                               embed_dim=24, backbone_classes=10)
    with pytest.raises(ValueError, match="proj expects"):
        hybrid_embed_tokens(params, jnp.zeros((1, 32, 32, 3)), "_test_small")


def test_engine_fp16_flag(rng):
    from genconvit_tpu.infer.engine import Predictor

    cfg = Config()
    cfg.img_size = 64
    cfg.model.latent_dims = cfg.derived_latent_dims()
    cfg.weight_dir = "/nonexistent"
    p = Predictor(cfg, net="ed", fp16=True, face_backend="fullframe")
    assert p.dtype == jnp.bfloat16
    # params were pre-cast
    leaf = jax.tree_util.tree_leaves(p.params)[0]
    assert leaf.dtype == jnp.bfloat16
    faces = (rng.random((2, 64, 64, 3)) * 255).astype(np.uint8)
    y, y_val = p.predict_faces(faces, 3)
    assert y in (0, 1) and 0.0 <= y_val <= 1.0


def test_live_params_prunes_dead_groups():
    from genconvit_tpu.core.pytree import live_params, param_count
    from genconvit_tpu.models.vae import init_vae

    full = init_vae(jax.random.PRNGKey(0), img_size=64, carry_dead_params=True)
    live = live_params(full)
    assert "embedder" not in live and "fc3" not in live
    assert "fc1" not in live["encoder"] and "fc2" not in live["encoder"]
    assert "mu" in live["encoder"]  # live heads kept
    assert param_count(live) < param_count(full)


def test_model_summary():
    from genconvit_tpu.models.ed import init_ed
    from genconvit_tpu.utils.summary import model_summary

    params = init_ed(jax.random.PRNGKey(0), backbone_classes=10)
    s = model_summary(params)
    assert "TOTAL" in s and "backbone" in s


def test_stage_timers_threadsafe():
    import concurrent.futures as cf

    from genconvit_tpu.utils.timing import StageTimers

    t = StageTimers()

    def work():
        for _ in range(50):
            with t.stage("x"):
                pass

    with cf.ThreadPoolExecutor(4) as ex:
        list(ex.map(lambda _: work(), range(4)))
    assert t.summary()["x"]["count"] == 200  # 4 workers x 50


def test_top_level_lazy_api():
    import genconvit_tpu as g

    assert callable(g.Predictor)
    assert callable(g.train_model)
    assert callable(g.convert_checkpoint)
    with pytest.raises(AttributeError):
        g.nonexistent_symbol


def test_config_env_var(tmp_path, monkeypatch):
    p = tmp_path / "c.yaml"
    p.write_text("img_size: 96\n")
    monkeypatch.setenv("GENCONVIT_CONFIG", str(p))
    from genconvit_tpu.config import load_config

    assert load_config().img_size == 96


def test_metrics_single_class_no_crash(tmp_path):
    import json

    from genconvit_tpu.evalx.metrics import load_result, result_metrics

    result = {"video": {"name": ["a"], "pred": [0.9], "klass": ["x"],
                        "pred_label": ["FAKE"], "correct_label": ["FAKE"]}}
    p = tmp_path / "r.json"
    p.write_text(json.dumps(result))
    m = result_metrics(load_result(str(p)))
    assert m["accuracy"] == 1.0
    assert "roc_auc" not in m  # undefined with one class; no crash
