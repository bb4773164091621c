"""One-command parity verdict for the PUBLISHED reference weights.

The reference ships pre-trained checkpoints (README.md:88-104:
``successive_ddnm_diffusion_results/model-official.pt`` and
``depth_correction_results/model-best.pt``; loading at sdd:2307-2346). A
user holding those files runs this to get a pass/fail answer on whether
this framework reproduces the reference's outputs from them:

    python tools/validate_reference_weights.py \
        --diffusion successive_ddnm_diffusion_results/model-official.pt \
        --depth_correction depth_correction_results/model-best.pt

For each provided ``.pt`` it (1) converts through the product import path
(cli/import_torch_checkpoint), (2) loads the ``.ckpt`` exactly the way the
Generator / MaskTester load it, (3) runs the SAME fixed conditioning
through our jitted chain AND the reference's own torch code (the
tests/_reference loader executes successive_ddnm_diffusion.py /
depth_correction.py verbatim from --reference_root), and (4) prints the
per-pixel RMSE with a PASS/FAIL verdict. Missing weight files or a missing
reference checkout SKIP gracefully (exit 0); a parity failure exits 1.

Determinism: the chain runs DDIM eta=0 without the refine step, so the
only random draw either framework consumes is x_T — pre-drawn once and fed
to both. (The production 32-step eta=1.0 chain draws per-step noise from
each framework's own RNG; cross-framework RMSE is only meaningful on the
deterministic path, which exercises identical weights, schedules and DDNM
projections.)

Default --image_size is 64 to keep the torch-CPU chain tractable
(~seconds/step at 256); the U-Nets are fully convolutional, so weight
parity at 64 implies parity at the production 256.
"""

import argparse
import os
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))
sys.path.insert(0, os.path.join(REPO, "cli"))

import jax

jax.config.update("jax_platforms",
                  os.environ.get("PRGPT_PLATFORM", "cpu"))
if os.environ.get("PRGPT_COMP_CACHE", "1") != "0":
    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/pointreggpt_xla"))

import jax.numpy as jnp
import numpy as np


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--diffusion", default=None,
                   help="path to the released model-official.pt")
    p.add_argument("--depth_correction", default=None,
                   help="path to the released depth-correction model-best.pt")
    p.add_argument("--reference_root", default="/root/reference",
                   help="checkout of the reference repo (for the torch side)")
    p.add_argument("--dim", type=int, default=64)
    p.add_argument("--dim_mults", default="1,2,4,8")
    p.add_argument("--dc_dim", type=int, default=64)
    p.add_argument("--dc_dim_mults", default="1,2,4,8")
    p.add_argument("--image_size", type=int, default=64)
    p.add_argument("--timesteps", type=int, default=1000)
    p.add_argument("--sampling_timesteps", type=int, default=32)
    p.add_argument("--threshold", type=float, default=2e-3,
                   help="chain RMSE pass bar, [0,1] depth units")
    p.add_argument("--dc_threshold", type=float, default=1e-4,
                   help="MaskUNet forward RMSE pass bar (probabilities)")
    return p


def _load_reference(root: str):
    import _reference

    _reference.REFERENCE_ROOT = root
    return _reference.load_reference()


def _fixed_condition(image_size: int, batch: int = 2):
    """Deterministic DDNM conditioning: mid-depth plane + seeded mask."""
    rng = np.random.default_rng(11)
    pc = np.array([[585.0, 585.0, image_size / 2.0, image_size / 2.0]]
                  * batch, np.float32)
    cond01 = np.stack(
        [np.full((batch, image_size, image_size), 0.55, np.float32),
         (rng.uniform(size=(batch, image_size, image_size)) > 0.5)
         .astype(np.float32)], axis=-1)
    return pc, cond01 * 2.0 - 1.0  # NHWC, [-1, 1]


def validate_diffusion(args, sdd) -> float:
    import torch

    import import_torch_checkpoint as import_cli
    from pointreggpt_tpu.diffusion import GaussianDiffusion
    from pointreggpt_tpu.models import DiffusionUNet
    from pointreggpt_tpu.train import checkpoint as ckpt
    from pointreggpt_tpu.utils import torch_port

    dim_mults = tuple(int(x) for x in args.dim_mults.split(","))
    H, T, S = args.image_size, args.timesteps, args.sampling_timesteps

    # --- torch side: the reference's own code + the published EMA weights
    raw = torch_port.load_reference_checkpoint(args.diffusion)
    ema_sd = torch_port.strip_prefix(raw["ema"], "ema_model.model.")
    tmodel = sdd.Unet(dim=args.dim, param_cond_dim=4, dim_mults=dim_mults,
                      channels=1).eval()
    missing, unexpected = tmodel.load_state_dict(ema_sd, strict=False)
    if missing:
        raise SystemExit(f"EMA state dict missing Unet keys: {missing[:5]}")
    rdiff = sdd.GaussianDiffusion(
        tmodel, image_size=H, timesteps=T, sampling_timesteps=S,
        loss_type="l1", objective="pred_x0", beta_schedule="sigmoid",
        ddim_sampling_eta=0.0).eval()

    pc, cond = _fixed_condition(H)
    torch.manual_seed(101)
    x_init = torch.randn((pc.shape[0], 1, H, H))
    torch.manual_seed(101)  # the reference redraws the same x_T internally
    with torch.no_grad():
        ref_out = rdiff.sample(
            param_cond=torch.tensor(pc),
            img_cond=torch.tensor(cond).permute(0, 3, 1, 2),
            disable_tqdm=True, has_refine_step=False)
    ref_np = ref_out.permute(0, 2, 3, 1).numpy()

    # --- our side: product import path -> Generator-style EMA load -> chain
    with tempfile.TemporaryDirectory() as tmp:
        import_cli.main([
            "--diffusion", args.diffusion, "--diffusion_out", tmp,
            "--milestone", "val", "--dim", str(args.dim),
            "--dim_mults", args.dim_mults, "--bf16", "false",
        ])
        jmodel = DiffusionUNet(dim=args.dim, param_cond_dim=4,
                               dim_mults=dim_mults, channels=1)
        template = jax.tree_util.tree_map(
            np.asarray,
            jmodel.init(jax.random.PRNGKey(0), jnp.zeros((1, H, H, 1)),
                        jnp.zeros((1,)), jnp.zeros((1, 4))))
        state, _ = ckpt.load_checkpoint(
            os.path.join(tmp, "model-val.ckpt"),
            {"params": template,
             "ema": {"params": template, "step": 0, "initted": False}})
    ours = GaussianDiffusion(
        apply_fn=lambda p, x, t, pcv: jmodel.apply(p, x, t, pcv),
        image_size=H, timesteps=T, sampling_timesteps=S,
        objective="pred_x0", beta_schedule="sigmoid", ddim_sampling_eta=0.0)
    out = ours.sample(
        state["ema"]["params"], jax.random.PRNGKey(3),
        param_cond=jnp.asarray(pc), img_cond=jnp.asarray(cond),
        has_refine_step=False,
        x_init=jnp.asarray(x_init.permute(0, 2, 3, 1).numpy()))
    return float(np.sqrt(np.mean((np.asarray(out) - ref_np) ** 2)))


def validate_depth_correction(args, dc) -> float:
    import torch

    import import_torch_checkpoint as import_cli
    from pointreggpt_tpu.models import MaskUNet
    from pointreggpt_tpu.train import checkpoint as ckpt
    from pointreggpt_tpu.utils import torch_port

    dim_mults = tuple(int(x) for x in args.dc_dim_mults.split(","))
    H = args.image_size

    raw = torch_port.load_reference_checkpoint(args.depth_correction)
    tmodel = dc.MaskUnet(dim=args.dc_dim, dim_mults=dim_mults).eval()
    tmodel.load_state_dict(raw["model"])

    rng = np.random.default_rng(12)
    x = rng.uniform(0.05, 0.95, (2, H, H, 1)).astype(np.float32)
    with torch.no_grad():
        ref_out = tmodel(torch.tensor(x).permute(0, 3, 1, 2))
    ref_np = ref_out.permute(0, 2, 3, 1).numpy()

    with tempfile.TemporaryDirectory() as tmp:
        import_cli.main([
            "--depth_correction", args.depth_correction, "--dc_out", tmp,
            "--milestone", "val", "--dc_dim", str(args.dc_dim),
            "--dc_dim_mults", args.dc_dim_mults,
        ])
        jmodel = MaskUNet(dim=args.dc_dim, dim_mults=dim_mults)
        template = jax.tree_util.tree_map(
            np.asarray,
            jmodel.init(jax.random.PRNGKey(0), jnp.zeros((1, H, H, 1))))
        state, _ = ckpt.load_checkpoint(
            os.path.join(tmp, "model-val.ckpt"),
            {"epoch": 0, "params": template})
    out = jax.jit(jmodel.apply)(state["params"], jnp.asarray(x))
    return float(np.sqrt(np.mean((np.asarray(out) - ref_np) ** 2)))


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    if not args.diffusion and not args.depth_correction:
        build_parser().error(
            "provide --diffusion and/or --depth_correction .pt paths")

    sdd_path = os.path.join(args.reference_root,
                            "denoising_diffusion_pytorch")
    if not os.path.isdir(sdd_path):
        print(f"SKIP: reference checkout not found at {args.reference_root} "
              "(pass --reference_root); nothing validated")
        return 0
    sdd, dc = _load_reference(args.reference_root)

    failed = False
    for name, path, fn, ref_mod, bar in [
            ("diffusion (32-step DDNM chain, EMA weights)", args.diffusion,
             validate_diffusion, sdd, args.threshold),
            ("depth_correction (MaskUNet forward)", args.depth_correction,
             validate_depth_correction, dc, args.dc_threshold)]:
        if not path:
            continue
        if not os.path.isfile(path):
            print(f"SKIP {name}: {path} not found")
            continue
        rmse = fn(args, ref_mod)
        verdict = "PASS" if rmse <= bar else "FAIL"
        failed |= verdict == "FAIL"
        print(f"{verdict} {name}: per-pixel RMSE {rmse:.3e} "
              f"(threshold {bar:.1e}, image_size {args.image_size})")
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
