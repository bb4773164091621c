"""CLI <-> config-layer round-trip tests (SURVEY.md §5.6).

Every dataclass field must surface as a ``--flag`` on each entry command,
and parsed flags must rebuild the dataclasses — retiring the reference's
edit-the-source hyperparameters (README.md:96,110,152).
"""

import importlib
import os
import sys

import pytest

from pointreggpt_tpu import config as C

CLI_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "cli")


@pytest.fixture()
def cli(monkeypatch):
    monkeypatch.syspath_prepend(CLI_DIR)

    def load(name):
        mod = importlib.import_module(name)
        return importlib.reload(mod) if name in sys.modules else mod

    return load


def _flags(parser):
    return {a for action in parser._actions for a in action.option_strings}


class TestParserCoverage:
    @pytest.mark.parametrize("module,classes", [
        ("train_successive_ddnm_diffusion",
         [C.ModelConfig, C.DiffusionConfig, C.TrainConfig]),
        ("test_successive_ddnm_diffusion",
         [C.ModelConfig, C.DiffusionConfig]),
        ("generate_dataset",
         [C.ModelConfig, C.DiffusionConfig, C.GenerateConfig]),
        ("train_depth_correction", [C.MaskModelConfig, C.MaskTrainConfig]),
        ("test_depth_correction", [C.MaskModelConfig]),
        ("generate_gt", [C.GtLogConfig]),
    ])
    def test_every_field_is_a_flag(self, cli, module, classes):
        parser = cli(module).build_parser()
        flags = _flags(parser)
        for cls in classes:
            for f in C.fields(cls):
                assert f"--{f.name}" in flags, (module, cls.__name__, f.name)


class TestRoundTrip:
    def test_train_cli_overrides_rebuild_configs(self, cli):
        mod = cli("train_successive_ddnm_diffusion")
        args = mod.build_parser().parse_args([
            "--dim", "8", "--dim_mults", "1,2", "--bf16", "false",
            "--timesteps", "64", "--sampling_timesteps", "8",
            "--train_batch_size", "2", "--data", "/tmp/x",
            "--train_lr", "1e-4",
        ])
        m = C.from_args(args, C.ModelConfig)
        d = C.from_args(args, C.DiffusionConfig)
        t = C.from_args(args, C.TrainConfig)
        assert m.dim == 8 and m.dim_mults == (1, 2) and not m.bf16
        # train entry default: no remat (16/chip fits v5e HBM and the
        # backward skips the recompute pass — 81.1 vs 69.3 img/s measured)
        assert not m.remat
        assert d.timesteps == 64 and d.sampling_timesteps == 8
        assert d.ddim_sampling_eta == 0.0  # reference train default
        assert t.train_batch_size == 2 and t.data == "/tmp/x"
        assert t.train_lr == pytest.approx(1e-4)

    def test_dormant_unet_flags_reach_the_model(self, cli):
        """sdd:811-815 surface: the optional conditioning flags round-trip
        from CLI to a built DiffusionUNet."""
        mod = cli("train_successive_ddnm_diffusion")
        args = mod.build_parser().parse_args([
            "--learned_sinusoidal_cond", "true",
            "--learned_sinusoidal_dim", "8",
            "--learned_variance", "true",
        ])
        m = C.from_args(args, C.ModelConfig)
        assert m.learned_sinusoidal_cond and m.learned_variance
        model = C.build_diffusion_unet(
            C.ModelConfig(dim=8, dim_mults=(1, 2), bf16=False,
                          learned_sinusoidal_cond=m.learned_sinusoidal_cond,
                          learned_sinusoidal_dim=m.learned_sinusoidal_dim,
                          learned_variance=m.learned_variance))
        import jax
        import jax.numpy as jnp

        params = model.init(jax.random.PRNGKey(0),
                            jnp.zeros((1, 16, 16, 1)), jnp.zeros((1,)),
                            jnp.zeros((1, 4)))
        assert params["params"]["time_pos_emb"]["weights"].shape == (4,)
        out = model.apply(params, jnp.zeros((2, 16, 16, 1)),
                          jnp.zeros((2,)), jnp.zeros((2, 4)))
        assert out.shape == (2, 16, 16, 2)  # learned_variance: 2x channels

    def test_test_cli_has_quick_sampling_defaults(self, cli):
        mod = cli("test_successive_ddnm_diffusion")
        args = mod.build_parser().parse_args([])
        d = C.from_args(args, C.DiffusionConfig)
        # reference test_successive_ddnm_diffusion.py:25-27
        assert d.sampling_timesteps == 32
        assert d.ddim_sampling_eta == 1.0
        assert d.timesteps == 1000

    def test_test_cli_requires_resume_with_clear_error(self, cli, capsys):
        """Running without --resume must fail fast with a clear message,
        not reach load(None) -> FileNotFoundError('model-None.ckpt')."""
        import pytest

        mod = cli("test_successive_ddnm_diffusion")
        with pytest.raises(SystemExit):
            mod.main([])
        assert "--resume is required" in capsys.readouterr().err

    def test_generate_cli_defaults_match_reference(self, cli):
        mod = cli("generate_dataset")
        args = mod.build_parser().parse_args(["--resume", "official"])
        d = C.from_args(args, C.DiffusionConfig)
        g = C.from_args(args, C.GenerateConfig)
        dc = C.from_args(args, C.MaskModelConfig, prefix="dc_")
        assert d.sampling_timesteps == 250 and d.ddim_sampling_eta == 1.0
        assert not g.has_refine_step  # generate_dataset.py:57
        assert g.memory_voxel_size == pytest.approx(0.002)
        assert g.save_voxel_size == pytest.approx(0.025)
        assert dc.dim == 64

    def test_mask_train_cli_round_trip(self, cli):
        mod = cli("train_depth_correction")
        args = mod.build_parser().parse_args(
            ["--train_lr", "1e-3", "--epochs", "3", "--dim", "16"])
        cfg = C.from_args(args, C.MaskTrainConfig)
        m = C.from_args(args, C.MaskModelConfig)
        assert cfg.train_lr == pytest.approx(1e-3) and cfg.epochs == 3
        assert cfg.lr_gamma == pytest.approx(0.95)  # reference default
        assert m.dim == 16

    def test_gt_cli_constants_are_flags(self, cli):
        mod = cli("generate_gt")
        args = mod.build_parser().parse_args(
            ["--min_points", "50", "--voxel_size", "0.1"])
        cfg = C.from_args(args, C.GtLogConfig)
        assert cfg.min_points == 50
        assert cfg.voxel_size == pytest.approx(0.1)
        assert cfg.min_overlap == pytest.approx(0.1)


class TestFactories:
    def test_build_model_and_diffusion(self):
        import jax
        import jax.numpy as jnp

        model = C.build_diffusion_unet(
            C.ModelConfig(dim=8, dim_mults=(1, 2), bf16=False))
        diff = C.build_diffusion(
            C.DiffusionConfig(image_size=16, timesteps=16,
                              sampling_timesteps=4), model)
        params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 1)),
                            jnp.zeros((1,)), jnp.zeros((1, 4)))
        out = diff.sample(params, jax.random.PRNGKey(1),
                          param_cond=jnp.zeros((1, 4)))
        assert out.shape == (1, 16, 16, 1)

    def test_build_mask_unet(self):
        import jax
        import jax.numpy as jnp

        model = C.build_mask_unet(C.MaskModelConfig(dim=8, dim_mults=(1, 2)))
        params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 1)))
        out = model.apply(params, jnp.zeros((2, 16, 16, 1)))
        assert out.shape == (2, 16, 16, 1)
