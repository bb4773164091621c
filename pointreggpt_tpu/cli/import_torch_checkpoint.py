"""Convert published reference PyTorch checkpoints (.pt) to .ckpt.

The reference's Quick Start downloads pre-trained weights
(``successive_ddnm_diffusion_results/model-official.pt`` and
``depth_correction_results/model-best.pt``, README.md:88-104) and every
entry script resumes from them. This command bridges those files so a
reference user can switch: the ported ``.ckpt`` files load in every CLI
here via the same ``--resume`` milestones.

Reference checkpoint layouts:
  diffusion (sdd:1685-1699): {step, model, opt, ema, scaler} where ``model``
    is the GaussianDiffusion state dict (Unet under ``model.``) and ``ema``
    is an ema_pytorch.EMA state dict (Unet under ``ema_model.model.``,
    plus ``initted``/``step`` buffers);
  depth correction (dc:1189-1208): {epoch, model, opt, scheduler, scaler,
    loss_hist, metrics} with a top-level MaskUnet state dict.

What is ported: model + EMA weights (exact, via utils/torch_port), step /
epoch counters, loss history and best-metrics bookkeeping. What is NOT:
torch Adam moments and the torch LR-scheduler state — the written
checkpoint carries freshly-initialized optax optimizer state, so resuming
*training* from an import restarts optimizer statistics (and the
depth-correction LR schedule restarts from its initial value). Generation
and testing — the published weights' purpose — only read the weights.

Usage:
    python cli/import_torch_checkpoint.py \
        --diffusion successive_ddnm_diffusion_results/model-official.pt \
        --depth_correction depth_correction_results/model-best.pt
"""

import argparse
import os
from pathlib import Path

from pointreggpt_tpu.cli import _env  # noqa: F401

from pointreggpt_tpu import config as C


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--diffusion", default=None, type=str,
                        help="reference diffusion .pt (e.g. model-official.pt)")
    parser.add_argument("--depth_correction", default=None, type=str,
                        help="reference depth-correction .pt (model-best.pt)")
    parser.add_argument("--diffusion_out",
                        default="./successive_ddnm_diffusion_results",
                        help="results folder receiving the diffusion .ckpt")
    parser.add_argument("--dc_out", default="./depth_correction_results",
                        help="results folder receiving the dc .ckpt")
    parser.add_argument("--milestone", default=None, type=str,
                        help="override the milestone name (default: taken "
                        "from the input file name, model-<milestone>.pt)")
    C.add_dataclass_args(parser, C.ModelConfig)
    C.add_dataclass_args(parser, C.MaskModelConfig, prefix="dc_")
    return parser


def _milestone_from(path: str, override) -> str:
    if override is not None:
        return str(override)
    stem = Path(path).stem  # model-official
    return stem[len("model-"):] if stem.startswith("model-") else stem


def convert_diffusion(path: str, out_dir: str, milestone: str,
                      model_cfg: C.ModelConfig) -> Path:
    """Port {step, model, ema} from a reference diffusion checkpoint."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from pointreggpt_tpu.train import checkpoint as ckpt
    from pointreggpt_tpu.train.ema import EMAState
    from pointreggpt_tpu.utils import torch_port

    data = torch_port.load_reference_checkpoint(path)
    model = C.build_diffusion_unet(model_cfg)
    # params are resolution-independent; init small for speed
    template = jax.tree_util.tree_map(
        np.asarray,
        model.init(jax.random.PRNGKey(0),
                   jnp.zeros((1, 64, 64, model_cfg.channels)),
                   jnp.zeros((1,)), jnp.zeros((1, model_cfg.param_cond_dim))))

    num_stages = len(model_cfg.dim_mults)
    params = torch_port.port_diffusion_unet(
        torch_port.strip_prefix(data["model"], "model."), template,
        num_stages=num_stages)
    ema_sd = data["ema"]
    ema_params = torch_port.port_diffusion_unet(
        torch_port.strip_prefix(ema_sd, "ema_model.model."), template,
        num_stages=num_stages)

    # fresh optax moments (torch Adam state is not ported, see module doc)
    train_cfg = C.TrainConfig()
    tx = optax.chain(optax.clip_by_global_norm(1.0),
                     optax.adam(train_cfg.train_lr, b1=0.9, b2=0.99))
    opt_state = tx.init(params)

    ema = EMAState(
        params=ema_params,
        step=jnp.asarray(int(ema_sd.get("step", data["step"])), jnp.int32),
        initted=jnp.asarray(bool(ema_sd.get("initted", True))),
    )
    out = Path(out_dir) / f"model-{milestone}.ckpt"
    ckpt.save_checkpoint(
        out,
        {"step": int(data["step"]), "params": params,
         "opt_state": opt_state, "ema": ema},
        meta={"milestone": str(milestone),
              "version": f"ported:{os.path.basename(path)}"})
    return out


def convert_depth_correction(path: str, out_dir: str, milestone: str,
                             model_cfg: C.MaskModelConfig) -> Path:
    """Port {epoch, model, loss_hist, metrics.best} from a dc checkpoint."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from pointreggpt_tpu.train import checkpoint as ckpt
    from pointreggpt_tpu.utils import torch_port

    data = torch_port.load_reference_checkpoint(path)
    model = C.build_mask_unet(model_cfg)
    template = jax.tree_util.tree_map(
        np.asarray,
        model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 1))))

    params = torch_port.port_mask_unet(data["model"], template,
                                       num_stages=len(model_cfg.dim_mults))

    mask_cfg = C.MaskTrainConfig()
    schedule = optax.exponential_decay(
        mask_cfg.train_lr, transition_steps=1,
        decay_rate=mask_cfg.lr_gamma, staircase=True)
    tx = optax.chain(optax.clip_by_global_norm(1.0),
                     optax.adam(schedule, b1=0.9, b2=0.99))
    opt_state = tx.init(params)

    best = {}
    metrics = data.get("metrics") or {}
    for k, v in (metrics.get("best") or {}).items():
        best[k] = float(v)
    out = Path(out_dir) / f"model-{milestone}.ckpt"
    ckpt.save_checkpoint(
        out,
        {"epoch": int(data["epoch"]), "params": params,
         "opt_state": opt_state},
        meta={"loss_hist": [float(x) for x in data.get("loss_hist") or []],
              "best_metrics": best,
              "version": f"ported:{os.path.basename(path)}"})
    return out


def main(argv=None) -> None:
    args = build_parser().parse_args(argv)
    if args.diffusion is None and args.depth_correction is None:
        raise SystemExit(
            "nothing to do: pass --diffusion and/or --depth_correction")

    if args.diffusion is not None:
        milestone = _milestone_from(args.diffusion, args.milestone)
        out = convert_diffusion(args.diffusion, args.diffusion_out, milestone,
                                C.from_args(args, C.ModelConfig))
        print(f"diffusion: {args.diffusion} -> {out}")

    if args.depth_correction is not None:
        milestone = _milestone_from(args.depth_correction, args.milestone)
        out = convert_depth_correction(
            args.depth_correction, args.dc_out, milestone,
            C.from_args(args, C.MaskModelConfig, prefix="dc_"))
        print(f"depth correction: {args.depth_correction} -> {out}")


if __name__ == "__main__":
    main()
