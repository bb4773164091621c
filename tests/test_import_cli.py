"""cli/import_torch_checkpoint.py: reference .pt -> .ckpt conversion.

Builds real reference checkpoints (the actual ``sdd.Unet`` / ``dc.MaskUnet``
modules with the reference's on-disk layouts, sdd:1685-1699 / dc:1189-1208),
runs the converter CLI, and asserts every consumer-side loading pattern
(Generator/Tester ema target, MaskTester params target, raw Trainer keys)
recovers the exact ported weights.
"""

import importlib
import os
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from pointreggpt_tpu.models import DiffusionUNet, MaskUNet
from pointreggpt_tpu.train import checkpoint as ckpt
from pointreggpt_tpu.utils import torch_port

from _reference import load_reference

CLI_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "cli")


@pytest.fixture(scope="module")
def ref():
    sdd, dc = load_reference()
    return {"sdd": sdd, "dc": dc}


@pytest.fixture()
def import_cli(monkeypatch):
    monkeypatch.syspath_prepend(CLI_DIR)
    mod = importlib.import_module("import_torch_checkpoint")
    return importlib.reload(mod) if "import_torch_checkpoint" in sys.modules \
        else mod


def _tree_equal(a, b, path=""):
    if isinstance(a, dict):
        assert set(a) == set(b), (path, set(a) ^ set(b))
        for k in a:
            _tree_equal(a[k], b[k], f"{path}/{k}")
    else:
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                      err_msg=path)


class TestImportDiffusion:
    def _make_pt(self, ref, tmp_path):
        """Reference diffusion checkpoint: {step, model, opt, ema, scaler}
        with the Unet under ``model.`` and the EMA copy under
        ``ema_model.model.`` (ema_pytorch layout)."""
        sdd = ref["sdd"]
        torch.manual_seed(3)
        online = sdd.Unet(dim=8, param_cond_dim=4, dim_mults=(1, 2),
                          channels=1).eval()
        torch.manual_seed(4)
        ema = sdd.Unet(dim=8, param_cond_dim=4, dim_mults=(1, 2),
                       channels=1).eval()
        data = {
            "step": 4321,
            # GaussianDiffusion state dict: Unet under model., buffers top
            "model": {f"model.{k}": v for k, v in
                      online.state_dict().items()},
            "opt": {"state": {}, "param_groups": []},
            "ema": {
                "initted": torch.tensor(True),
                "step": torch.tensor(777),
                **{f"ema_model.model.{k}": v for k, v in
                   ema.state_dict().items()},
                "ema_model.betas": torch.zeros(10),
            },
            "scaler": None,
        }
        data["model"]["betas"] = torch.zeros(10)  # diffusion buffer, ignored
        path = tmp_path / "model-official.pt"
        torch.save(data, str(path))
        return online, ema, path

    def test_convert_and_load(self, ref, import_cli, tmp_path):
        online, ema, path = self._make_pt(ref, tmp_path)
        out_dir = tmp_path / "results"
        import_cli.main([
            "--diffusion", str(path), "--diffusion_out", str(out_dir),
            "--dim", "8", "--dim_mults", "1,2", "--bf16", "false",
        ])
        out = out_dir / "model-official.ckpt"
        assert out.exists()

        jmodel = DiffusionUNet(dim=8, dim_mults=(1, 2), channels=1)
        template = jax.tree_util.tree_map(
            np.asarray,
            jmodel.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 1)),
                        jnp.zeros((1,)), jnp.zeros((1, 4))))
        want_params = torch_port.port_diffusion_unet(
            online.state_dict(), template, num_stages=2)
        want_ema = torch_port.port_diffusion_unet(
            ema.state_dict(), template, num_stages=2)

        # Generator/Tester loading pattern (generator.py:124-128)
        state, meta = ckpt.load_checkpoint(
            out, {"params": template,
                  "ema": {"params": template, "step": 0, "initted": False}})
        _tree_equal(state["params"], want_params)
        _tree_equal(state["ema"]["params"], want_ema)
        assert int(state["ema"]["step"]) == 777
        assert bool(state["ema"]["initted"])
        assert meta["version"].startswith("ported:")

        # Trainer loading pattern needs all four state keys present
        raw, _ = ckpt.load_checkpoint(out)
        assert set(raw) == {"step", "params", "opt_state", "ema"}
        assert int(raw["step"]) == 4321

    def test_milestone_from_filename_and_override(self, ref, import_cli,
                                                  tmp_path):
        _, _, path = self._make_pt(ref, tmp_path)
        out_dir = tmp_path / "results2"
        import_cli.main([
            "--diffusion", str(path), "--diffusion_out", str(out_dir),
            "--milestone", "42", "--dim", "8", "--dim_mults", "1,2",
            "--bf16", "false",
        ])
        assert (out_dir / "model-42.ckpt").exists()


class TestImportDepthCorrection:
    def test_convert_and_load(self, ref, import_cli, tmp_path):
        dc = ref["dc"]
        torch.manual_seed(5)
        tmodel = dc.MaskUnet(dim=8, dim_mults=(1, 2)).eval()
        data = {
            "epoch": 17,
            "model": tmodel.state_dict(),
            "opt": {"state": {}, "param_groups": []},
            "scheduler": {"last_epoch": 17},
            "scaler": None,
            "loss_hist": [0.5, 0.25],
            "metrics": {"best": {"SAE": 0.125}, "current": {}},
        }
        path = tmp_path / "model-best.pt"
        torch.save(data, str(path))

        out_dir = tmp_path / "dc_results"
        import_cli.main([
            "--depth_correction", str(path), "--dc_out", str(out_dir),
            "--dc_dim", "8", "--dc_dim_mults", "1,2",
        ])
        out = out_dir / "model-best.ckpt"
        assert out.exists()

        jmodel = MaskUNet(dim=8, dim_mults=(1, 2))
        template = jax.tree_util.tree_map(
            np.asarray,
            jmodel.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 1))))
        want = torch_port.port_mask_unet(tmodel.state_dict(), template,
                                         num_stages=2)

        # MaskTester loading pattern (mask_trainer.py:291-299)
        state, meta = ckpt.load_checkpoint(
            out, {"epoch": 0, "params": template})
        assert int(state["epoch"]) == 17
        _tree_equal(state["params"], want)
        assert meta["loss_hist"] == [0.5, 0.25]
        assert meta["best_metrics"] == {"SAE": 0.125}

        # MaskTrainer loading pattern needs opt_state present
        raw, _ = ckpt.load_checkpoint(out)
        assert set(raw) == {"epoch", "params", "opt_state"}

    def test_requires_an_input(self, import_cli):
        with pytest.raises(SystemExit):
            import_cli.main([])


@pytest.mark.slow
class TestValidateReferenceWeightsHarness:
    """tools/validate_reference_weights.py (VERDICT r3 missing #2): the
    one-command parity verdict a user with the released .pt files runs.
    Exercised here with checkpoints produced by the REAL reference classes
    (random weights) — the same methodology as the import tests."""

    def _harness(self, monkeypatch):
        monkeypatch.syspath_prepend(os.path.join(
            os.path.dirname(CLI_DIR), "tools"))
        import validate_reference_weights as v
        return importlib.reload(v)

    def _make_pts(self, ref, tmp_path):
        sdd, dc = ref["sdd"], ref["dc"]
        torch.manual_seed(21)
        ema = sdd.Unet(dim=8, param_cond_dim=4, dim_mults=(1, 2),
                       channels=1).eval()
        dpath = tmp_path / "model-official.pt"
        torch.save({
            "step": 1,
            "model": {f"model.{k}": v for k, v in ema.state_dict().items()},
            "opt": {"state": {}, "param_groups": []},
            "ema": {f"ema_model.model.{k}": v
                    for k, v in ema.state_dict().items()},
            "scaler": None,
        }, str(dpath))
        torch.manual_seed(22)
        tmask = dc.MaskUnet(dim=8, dim_mults=(1, 2)).eval()
        dcpath = tmp_path / "model-best.pt"
        torch.save({
            "epoch": 1, "model": tmask.state_dict(),
            "opt": {"state": {}, "param_groups": []},
            "scheduler": {}, "scaler": None, "loss_hist": [],
            "metrics": {"best": {}, "current": {}},
        }, str(dcpath))
        return str(dpath), str(dcpath)

    def test_pass_verdict(self, ref, tmp_path, monkeypatch, capsys):
        v = self._harness(monkeypatch)
        dpath, dcpath = self._make_pts(ref, tmp_path)
        rc = v.main([
            "--diffusion", dpath, "--depth_correction", dcpath,
            "--dim", "8", "--dim_mults", "1,2",
            "--dc_dim", "8", "--dc_dim_mults", "1,2",
            "--image_size", "16", "--timesteps", "100",
            "--sampling_timesteps", "4",
        ])
        out = capsys.readouterr().out
        assert rc == 0, out
        assert out.count("PASS") == 2, out

    def test_graceful_skip_missing_files(self, tmp_path, monkeypatch,
                                         capsys):
        v = self._harness(monkeypatch)
        rc = v.main([
            "--diffusion", str(tmp_path / "nope.pt"),
            "--depth_correction", str(tmp_path / "nada.pt"),
        ])
        out = capsys.readouterr().out
        assert rc == 0
        assert out.count("SKIP") == 2, out

    def test_graceful_skip_missing_reference(self, ref, tmp_path,
                                             monkeypatch, capsys):
        v = self._harness(monkeypatch)
        dpath, _ = self._make_pts(ref, tmp_path)
        rc = v.main(["--diffusion", dpath,
                     "--reference_root", str(tmp_path / "absent")])
        out = capsys.readouterr().out
        assert rc == 0
        assert "SKIP: reference checkout not found" in out
