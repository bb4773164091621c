"""Depth-correction trainer/tester (MaskUNet): BCE epochs + mask metrics.

Reference: MaskTrainer dc:1073-1393 (Adam 4e-5, ExponentialLR gamma 0.95
stepped per epoch, clip 1.0, per-epoch val metrics at threshold 0.99,
best-on-SAE / latest checkpoints) and MaskTester dc:1398-1522 (qualitative
GIFs over 3DMatch test reprojections).

The train step (forward+BCE+clip+Adam) is one jitted program over the data
mesh; validation metrics run on device via ``train.metrics.mask_metrics``.
"""

from __future__ import annotations

import time
from pathlib import Path
from typing import Any, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from pointreggpt_tpu.data import PairedDepthDataset, PrefetchLoader, TestDataset
from pointreggpt_tpu.models import bake
from pointreggpt_tpu.parallel import mesh as M
from pointreggpt_tpu.train import checkpoint as ckpt
from pointreggpt_tpu.train.metrics import AverageMeter, Logger, mask_metrics

Array = jax.Array


class MaskTrainState(NamedTuple):
    epoch: Array
    step: Array
    params: Any
    opt_state: Any


def bce_loss(prob: Array, target: Array) -> Array:
    """Binary cross entropy on probabilities (torch nn.BCELoss clamps the
    log terms at -100; here fp32's min normal bounds them at ~-87.3, the
    closest reachable floor on TPU where subnormals flush to zero).

    The floor matters: probabilities are clamped at fp32-tiny, not a loose
    1e-7, so confidently-wrong pixels keep their loss scale (and a live
    gradient) all the way down to fp32-tiny probabilities instead of
    silently plateauing at loss 16.1 / grad 0. Below fp32-tiny (sigmoid
    underflow, logits under ~-88) ``jnp.maximum`` routes the subgradient
    to the constant, so the gradient there is exactly 0 — finite, and
    matching the saturated sigmoid chain whose derivative is 0 anyway.
    """
    tiny = jnp.finfo(jnp.float32).tiny
    log_p = jnp.maximum(jnp.log(jnp.maximum(prob, tiny)), -100.0)
    log_q = jnp.maximum(jnp.log(jnp.maximum(1.0 - prob, tiny)), -100.0)
    return -jnp.mean(target * log_p + (1.0 - target) * log_q)


class MaskTrainer:
    """Epoch trainer for the depth-correction MaskUNet.

    Entry-script config (train_depth_correction.py:14-23): batch 4, lr 4e-5,
    gamma 0.95, 100 epochs.
    """

    def __init__(self,
                 model,
                 folder: str,
                 *,
                 image_size: int = 256,
                 train_batch_size: int = 4,
                 train_lr: float = 1e-4,
                 epochs: int = 100,
                 adam_betas: Tuple[float, float] = (0.9, 0.99),
                 lr_gamma: float = 0.95,
                 results_folder: str = "./results",
                 samples_folder: str = "./samples",
                 grad_clip: float = 1.0,
                 num_workers: Optional[int] = None,
                 val_batch_size: int = 8,
                 seed: int = 0,
                 mesh=None):
        self.model = model
        self.epochs = epochs
        self.image_size = image_size
        self.results_folder = Path(results_folder)
        self.samples_folder = Path(samples_folder)
        self.results_folder.mkdir(parents=True, exist_ok=True)
        self.samples_folder.mkdir(parents=True, exist_ok=True)
        self.mesh = mesh if mesh is not None else M.create_mesh()

        # batch scales with device count (reference scales by process count,
        # dc:1113)
        n_dev = int(self.mesh.devices.size)
        self.batch_size = train_batch_size * n_dev
        self.val_batch_size = val_batch_size

        # num_workers=None defaults to the host core count inside
        # PrefetchLoader (dc:1132, sdd:1639-1644)
        self.train_ds = PairedDepthDataset(folder, "train", image_size)
        self.val_ds = PairedDepthDataset(folder, "val", image_size)
        self.loader = PrefetchLoader(self.train_ds, self.batch_size,
                                     shuffle=True, num_workers=num_workers,
                                     seed=seed)
        self.steps_per_epoch = max(1, len(self.loader))

        schedule = optax.exponential_decay(
            train_lr, transition_steps=self.steps_per_epoch,
            decay_rate=lr_gamma, staircase=True)
        self.tx = optax.chain(
            optax.clip_by_global_norm(grad_clip),
            optax.adam(schedule, b1=adam_betas[0], b2=adam_betas[1]),
        )

        params = model.init(
            jax.random.PRNGKey(seed),
            jnp.zeros((1, image_size, image_size, 1)))
        state = MaskTrainState(
            epoch=jnp.asarray(0, jnp.int32),
            step=jnp.asarray(0, jnp.int32),
            params=params,
            opt_state=self.tx.init(params),
        )
        self.state = M.replicate(self.mesh, state)
        self.loss_hist: list = []
        self.metrics = {"best": {}, "current": {}}
        self.logger = Logger(
            str(self.results_folder / "train.log")
            if M.is_main_process() else None,
            is_main=M.is_main_process())

        self._train_step = self._build_train_step()
        self._eval_step = jax.jit(self._eval_step_impl)

    # ------------------------------------------------------------------
    def _build_train_step(self):
        model, tx = self.model, self.tx

        def loss_fn(params, batch):
            prob = model.apply(params, batch["input_img"])
            return bce_loss(prob, batch["mask"])

        def step(state: MaskTrainState, batch):
            loss, grads = jax.value_and_grad(loss_fn)(state.params, batch)
            updates, opt_state = tx.update(grads, state.opt_state,
                                           state.params)
            params = optax.apply_updates(state.params, updates)
            return MaskTrainState(state.epoch, state.step + 1, params,
                                  opt_state), loss

        # donation disabled: XLA-CPU rendezvous deadlock + axon TPU
        # InvalidArgument (see train/trainer.py)
        return jax.jit(step)

    def _eval_step_impl(self, params, batch):
        """Per-item metric vectors for one (padded) validation batch.

        One model forward for the whole batch, then metrics vmapped per
        item so host-side meter updates can drop the padding while keeping
        batch-1 semantics exactly (the reference evaluates item-by-item,
        dc:1347-1378; a per-item ~28 ms tunnel round trip made that
        needlessly serial on TPU)."""
        prob = self.model.apply(params, batch["input_img"])
        return jax.vmap(
            lambda i, l, m, p: mask_metrics(
                i[None], l[None], m[None], p[None], mask_threshold=0.99))(
                    batch["input_img"], batch["label_img"], batch["mask"],
                    prob)

    # ------------------------------------------------------------------
    def train_one_epoch(self) -> float:
        meter = AverageMeter()
        t0 = time.time()
        # losses stay on device inside the loop: float(loss) per step is a
        # host sync that serializes the next batch's host->device upload
        # behind the step's compute (same pattern measured 45 -> 77 img/s
        # in the diffusion Trainer on a tunneled chip); ONE stacked
        # transfer at epoch end reads them all
        losses = []
        for batch in self.loader:
            sharded = M.shard_batch(self.mesh, batch)
            self.state, loss = self._train_step(self.state, sharded)
            losses.append(loss)
        if losses:
            for v in np.asarray(jnp.stack(losses)):
                meter.update(float(v))
        epoch = int(self.state.epoch)
        self.logger.info(
            f"Epoch {epoch + 1}/{self.epochs} loss {float(meter):.4e} "
            f"batch {self.batch_size} ({time.time() - t0:.1f}s)")
        self.loss_hist.append(float(meter))
        return float(meter)

    def eval_one_epoch(self) -> None:
        # EVERY process runs the (global-mesh) eval program — rank-gated
        # dispatch over a shared mesh desynchronizes multi-controller
        # SPMD (same rule as Trainer._save_and_sample); the Logger and
        # checkpoint writes are rank-0-gated on their own
        meters = {}
        outs = []
        vb = self.val_batch_size
        val_loader = PrefetchLoader(self.val_ds, vb, shuffle=False,
                                    drop_last=False, num_workers=1)
        for batch in val_loader:
            n_real = next(iter(batch.values())).shape[0]
            if n_real < vb:
                # pad the ragged last batch to the jitted shape; padding
                # items are dropped below before the meters see them
                batch = {
                    k: np.concatenate(
                        [v, np.repeat(v[-1:], vb - n_real, axis=0)], axis=0)
                    for k, v in batch.items()
                }
            out = self._eval_step(self.state.params,
                                  M.shard_batch(self.mesh, batch))
            # defer the device->host reads: syncing per batch serializes
            # the next batch's upload behind this batch's forward (see
            # train_one_epoch); metrics transfer once, stacked, at the end
            outs.append((out, n_real))
        for k in outs[0][0] if outs else ():
            stacked = np.asarray(jnp.stack([o[k] for o, _ in outs]))
            m = AverageMeter()
            for row, (_, n_real) in zip(stacked, outs):
                m.update(float(row[:n_real].mean()), num=n_real)
            meters[k] = m
        self.metrics["current"] = meters
        if meters:
            self.logger.info(
                "Epoch {}/{} mIoU {:.4e} PAcc {:.4e} FP {:.1f}".format(
                    int(self.state.epoch) + 1, self.epochs,
                    float(meters["mIoU"]), float(meters["PAcc"]),
                    float(meters["FP"])))

    def better_than_best_metrics(self, name: str = "SAE") -> bool:
        """Model selection on SAE (reference: dc:1282-1298)."""
        if not M.is_main_process() or name not in self.metrics["current"]:
            return False
        current = float(self.metrics["current"][name])
        best = self.metrics["best"].get(name)
        if best is None or current <= best:
            self.metrics["best"][name] = current
            return True
        return False

    def train_and_eval(self) -> None:
        start = int(self.state.epoch)
        for epoch in range(start, self.epochs):
            self.state = self.state._replace(
                epoch=jnp.asarray(epoch, jnp.int32))
            self.train_one_epoch()
            self.eval_one_epoch()
            if self.better_than_best_metrics():
                self.save("best")
            self.save("latest")

    def test(self) -> None:
        self.eval_one_epoch()

    # ------------------------------------------------------------------
    def save(self, milestone: str) -> None:
        if not M.is_main_process():
            return
        ckpt.save_checkpoint(
            self.results_folder / f"model-{milestone}.ckpt",
            {
                "epoch": int(self.state.epoch),
                "params": self.state.params,
                "opt_state": self.state.opt_state,
            },
            meta={
                "loss_hist": [float(x) for x in self.loss_hist],
                "best_metrics": {
                    k: float(v) for k, v in self.metrics["best"].items()
                },
            })

    def load(self, milestone: str) -> None:
        target = {
            "epoch": 0,
            "params": jax.tree_util.tree_map(np.asarray, self.state.params),
            "opt_state": jax.tree_util.tree_map(np.asarray,
                                                self.state.opt_state),
        }
        state, meta = ckpt.load_checkpoint(
            self.results_folder / f"model-{milestone}.ckpt", target)
        self.state = M.replicate(
            self.mesh,
            MaskTrainState(
                epoch=jnp.asarray(state["epoch"] + 1, jnp.int32),
                step=jnp.asarray(0, jnp.int32),
                params=state["params"],
                opt_state=state["opt_state"],
            ))
        self.loss_hist = list(meta.get("loss_hist", []))
        self.metrics["best"] = dict(meta.get("best_metrics", {}))


def make_gif(path, frames_u8, *, frame_ms: int = 1000) -> None:
    """Write a looping GIF with per-frame duration in MILLISECONDS.

    The reference's make_gif (dc:133-138) passes ``duration=1000`` to
    imageio, meaning 1000 ms per frame. imageio's ``duration`` unit flipped
    between seconds (legacy GIF-PIL plugin) and milliseconds (pillow plugin,
    imageio >= 2.28) across versions — a wrong unit silently makes
    1000-*second* frames — so write through PIL directly, whose GIF
    ``duration`` has always been milliseconds.

    PIL merges identical *consecutive* frames, summing their durations
    (same total cycle time, visually indistinguishable) — e.g. an
    input==label pair becomes one 2000 ms frame.
    """
    from PIL import Image

    imgs = [Image.fromarray(np.asarray(f)) for f in frames_u8]
    imgs[0].save(path, save_all=True, append_images=imgs[1:],
                 duration=int(frame_ms), loop=0)


class MaskTester:
    """Qualitative eval: input/output GIFs over 3DMatch test reprojections.

    Reference: MaskTester dc:1398-1522 + make_gif dc:133-138.
    """

    def __init__(self,
                 model,
                 folder: str,
                 *,
                 info=None,
                 image_size: int = 256,
                 results_folder: str = "./results",
                 samples_folder: str = "./samples",
                 mask_threshold: float = 0.99):
        self.model = model
        self.folder = folder
        self.info = info
        self.image_size = image_size
        self.mask_threshold = mask_threshold
        self.results_folder = Path(results_folder)
        self.samples_folder = Path(samples_folder)
        self.samples_folder.mkdir(parents=True, exist_ok=True)
        self.params = None
        self._apply = jax.jit(lambda p, x: self.model.apply(p, x))

    def load(self, milestone: str) -> None:
        params_target = self.model.init(
            jax.random.PRNGKey(0),
            jnp.zeros((1, self.image_size, self.image_size, 1)))
        state, _ = ckpt.load_checkpoint(
            self.results_folder / f"model-{milestone}.ckpt",
            {"epoch": 0, "params": jax.tree_util.tree_map(
                np.asarray, params_target)})
        # baked for inference (one-bf16-ulp contract, models/bake.py);
        # device_put ONCE — the bake returns a host numpy tree, and feeding
        # that to the jitted apply would re-upload every param per item
        self.params = jax.device_put(
            bake.maybe_bake(state["params"], self.model.dtype))

    def test(self, *, limit: Optional[int] = None) -> None:
        assert self.params is not None, "call load() first"
        ds = TestDataset(self.info, self.folder, self.image_size)
        n = len(ds) if limit is None else min(limit, len(ds))
        for idx in range(n):
            item = ds[idx]
            x = jnp.asarray(item["input_img"][None])
            prob = np.asarray(self._apply(self.params, x))[0]
            keep = prob > self.mask_threshold
            corrected = np.where(keep, item["input_img"], 0.0)

            def to_u8(img):
                from pointreggpt_tpu.core import imageio16

                return imageio16.to_uint8_image(img[..., 0])

            frames_in = [to_u8(item["input_img"]), to_u8(item["label_img"])]
            frames_out = [to_u8(corrected), to_u8(item["label_img"])]
            make_gif(self.samples_folder / f"{idx:06d}-input.gif", frames_in)
            make_gif(self.samples_folder / f"{idx:06d}-output.gif",
                     frames_out)
