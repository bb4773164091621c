"""Data-parallel diffusion trainer (L4/L6 of SURVEY.md §1).

The reference Trainer (sdd:1573-1826) is an Accelerate/DDP loop: grad
accumulation, clip 1.0, Adam, rank-0 EMA + checkpoint + periodic EMA
sampling. Here the whole optimizer step — gradient accumulation scan, global
allreduce (inserted by XLA from the shardings), clip, Adam update and EMA
tick — is **one jitted device program** over a ``jax.sharding.Mesh``:
params/opt/EMA replicated, the global batch split on the ``data`` axis
(Accelerate's ``split_batches=True`` semantics).
"""

from __future__ import annotations

import dataclasses
import math
import time
from contextlib import nullcontext
from functools import partial
from pathlib import Path
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from pointreggpt_tpu.core import geometry as G
from pointreggpt_tpu.core import sampling as S
from pointreggpt_tpu.data import DepthDataset, PrefetchLoader
from pointreggpt_tpu.diffusion import GaussianDiffusion
from pointreggpt_tpu.parallel import mesh as M
from pointreggpt_tpu.train import checkpoint as ckpt
from pointreggpt_tpu.train import ema as ema_lib
from pointreggpt_tpu.train.metrics import Logger

Array = jax.Array


class TrainState(NamedTuple):
    step: Array
    params: Any
    opt_state: Any
    ema: ema_lib.EMAState


def save_image_grid(images01: np.ndarray, path, nrow: int) -> None:
    """Save a (n, h, w, 1) [0,1] batch as a tiled grayscale PNG grid.

    Replaces torchvision ``utils.save_image`` (sdd:1809-1812).
    """
    from PIL import Image

    images01 = np.asarray(images01)[..., 0]
    n, h, w = images01.shape
    ncol = nrow
    nrows = -(-n // ncol)
    grid = np.zeros((nrows * h, ncol * w), np.float32)
    for i in range(n):
        r, c = divmod(i, ncol)
        grid[r * h:(r + 1) * h, c * w:(c + 1) * w] = images01[i]
    from pointreggpt_tpu.core import imageio16

    img = Image.fromarray(imageio16.to_uint8_image(grid))
    Path(path).parent.mkdir(parents=True, exist_ok=True)
    img.save(path)


class Trainer:
    """Diffusion trainer with the reference's hyperparameter surface.

    Entry-script config (train_successive_ddnm_diffusion.py:26-42): global
    batch 32, lr 8e-5, 2M steps, accum 2, h-flip, EMA 0.995, save/sample
    every 1000 steps.

    Args:
        model: the Flax DiffusionUNet (its ``apply`` must be the
            ``diffusion.apply_fn``).
        diffusion: GaussianDiffusion process.
        folder: 3DMatch-RGBD train root.
    """

    def __init__(self,
                 model,
                 diffusion: GaussianDiffusion,
                 folder: str,
                 *,
                 train_batch_size: int = 16,
                 gradient_accumulate_every: int = 1,
                 augment_horizontal_flip: bool = True,
                 train_lr: float = 1e-4,
                 train_num_steps: int = 100000,
                 ema_update_every: int = 10,
                 ema_decay: float = 0.995,
                 adam_betas: Tuple[float, float] = (0.9, 0.99),
                 save_and_sample_every: int = 1000,
                 num_samples: int = 25,
                 results_folder: str = "./results",
                 samples_folder: str = "./samples",
                 gt_log: str = "./dataset/3DMatch/metadata/gt.log",
                 sample_on_save: bool = True,
                 calculate_fid: bool = False,
                 grad_clip: float = 1.0,
                 num_workers: Optional[int] = None,
                 track_losses: bool = False,
                 seed: int = 0,
                 mesh=None):
        self.model = model
        self.diffusion = diffusion
        self.train_num_steps = train_num_steps
        self.batch_size = train_batch_size
        self.gradient_accumulate_every = gradient_accumulate_every
        self.save_and_sample_every = save_and_sample_every
        self.num_samples = num_samples
        self.ema_decay = ema_decay
        self.ema_update_every = ema_update_every
        self.sample_on_save = sample_on_save
        self.image_size = diffusion.image_size
        self.results_folder = Path(results_folder)
        self.samples_folder = Path(samples_folder)
        self.results_folder.mkdir(parents=True, exist_ok=True)
        self.samples_folder.mkdir(parents=True, exist_ok=True)
        self.seed = seed
        self.logger = Logger(is_main=M.is_main_process())
        # FID is optional and off by default, like the reference
        # (train_successive_ddnm_diffusion.py:40, sdd:1611-1619)
        self.calculate_fid = calculate_fid
        self._fid_extractor = None
        if calculate_fid and M.is_main_process():
            from pointreggpt_tpu.eval.fid import InceptionFeatures

            self._fid_extractor = InceptionFeatures()
        self._last_batch = None
        # loss tracking for learning assertions (drives/tests): losses stay
        # ON DEVICE inside the loop — a float() per step would sync the
        # host — and transfer once, stacked, when train() returns. Off by
        # default: the production 2M-step loop must not accumulate arrays.
        self.track_losses = track_losses
        self.loss_hist: list = []

        self.mesh = mesh if mesh is not None else M.create_mesh()
        n_dev = int(np.prod([self.mesh.devices.size]))
        if train_batch_size % n_dev != 0:
            raise ValueError(
                f"global batch {train_batch_size} must divide over "
                f"{n_dev} devices")

        # dataset / loader; num_workers=None defaults to the host core
        # count inside PrefetchLoader (sdd:1639-1644)
        self.ds = DepthDataset(folder, self.image_size, gt_log=gt_log,
                               augment_horizontal_flip=augment_horizontal_flip,
                               seed=seed)
        self.num_workers = num_workers
        self.dl = iter(
            PrefetchLoader(self.ds,
                           train_batch_size * gradient_accumulate_every,
                           shuffle=True, infinite=True,
                           num_workers=num_workers, seed=seed))

        # optimizer: clip 1.0 -> Adam (sdd:1651-1653, 1769)
        self.tx = optax.chain(
            optax.clip_by_global_norm(grad_clip),
            optax.adam(train_lr, b1=adam_betas[0], b2=adam_betas[1]),
        )

        # state init (replicated over the mesh)
        key = jax.random.PRNGKey(seed)
        params = model.init(
            key, jnp.zeros((1, self.image_size, self.image_size,
                            diffusion.channels)), jnp.zeros((1,)),
            jnp.zeros((1, 4)))
        opt_state = self.tx.init(params)
        state = TrainState(
            step=jnp.asarray(0, jnp.int32),
            params=params,
            opt_state=opt_state,
            ema=ema_lib.init(params),
        )
        self.state = M.replicate(self.mesh, state)
        self._train_step = self._build_train_step()
        self._sample_fn = None

    # ------------------------------------------------------------------
    def _build_train_step(self):
        diffusion = self.diffusion
        tx = self.tx
        accum = self.gradient_accumulate_every
        ema_kwargs = dict(beta=self.ema_decay,
                          update_every=self.ema_update_every)

        def loss_fn(params, key, img, intrinsic):
            return diffusion.training_loss(params, key, img, intrinsic)

        def train_step(state: TrainState, batch, key):
            # batch: {"img": (accum, B, h, w, 1), "intrinsic": (accum, B,3,3)}
            keys = jax.random.split(key, accum)

            def micro(carry, inp):
                g_acc, l_acc = carry
                k, img, intr = inp
                loss, grads = jax.value_and_grad(loss_fn)(state.params, k,
                                                          img, intr)
                g_acc = jax.tree_util.tree_map(jnp.add, g_acc, grads)
                return (g_acc, l_acc + loss), None

            zero = jax.tree_util.tree_map(jnp.zeros_like, state.params)
            (grads, loss_sum), _ = jax.lax.scan(
                micro, (zero, jnp.asarray(0.0)),
                (keys, batch["img"], batch["intrinsic"]))
            grads = jax.tree_util.tree_map(lambda g: g / accum, grads)

            updates, opt_state = tx.update(grads, state.opt_state,
                                           state.params)
            params = optax.apply_updates(state.params, updates)
            ema = ema_lib.update(state.ema, params, **ema_kwargs)
            return TrainState(state.step + 1, params, opt_state,
                              ema), loss_sum / accum

        # Buffer donation is disabled: it deadlocks the XLA-CPU collective
        # rendezvous (fake multi-device meshes) AND the axon TPU runtime
        # rejects donated-buffer programs with InvalidArgument. The state is
        # ~0.5 GB; XLA reuses buffers well enough without donation here.
        return jax.jit(train_step)

    # ------------------------------------------------------------------
    def _reshape_accum(self, batch: Dict[str, np.ndarray]):
        a = self.gradient_accumulate_every
        out = {}
        for k, v in batch.items():
            out[k] = v.reshape((a, self.batch_size) + v.shape[1:])
        # shard the per-microbatch example axis over the mesh
        from jax.sharding import NamedSharding, PartitionSpec as P

        sharding = NamedSharding(self.mesh, P(None, "data"))
        return {
            k: jax.device_put(jnp.asarray(v), sharding)
            for k, v in out.items()
        }

    def train(self, *, log_every: int = 50) -> None:
        """Run the training loop to ``train_num_steps``.

        The host never blocks on the device inside the loop: the step
        counter is tracked host-side (reading ``int(state.step)`` every
        iteration would sync per step, serializing the next batch's
        host->device transfer behind the previous step's compute — measured
        45 -> 80 img/s on a tunneled chip where the 32-image upload costs
        ~280 ms). ``float(loss)`` still syncs, but only every log_every.

        ``PRGPT_PROFILE=<dir>`` (SURVEY.md §5.1): per-stage wall-clock
        breakdown (load_batch = host decode wait / dispatch = upload +
        async step launch) printed at exit, plus a jax.profiler device
        trace of steps 3-4 written under <dir>. Stage times are dispatch
        latencies, not device busy time — the device timeline lives in
        the trace. Steps that run UNDER the open trace are excluded from
        the stage breakdown: the tracer serializes tunnel dispatch (~4x
        wall), so timing and tracing never share a window.
        """
        from pointreggpt_tpu.utils import profiling

        prof_dir = profiling.profile_dir()
        timer = profiling.StageTimer() if prof_dir else None
        capture = (profiling.StepTraceCapture(prof_dir)
                   if prof_dir else None)

        def stage(name):
            if timer is None or (capture is not None and capture.tracing):
                return nullcontext()
            return timer.stage(name)

        key = jax.random.PRNGKey(self.seed + 1)
        step = int(self.state.step)
        if step:
            # resume: fold the restored step in so the continued run draws
            # a FRESH (noise, timestep) stream instead of replaying the
            # exact pairs steps 0..step already consumed (fresh runs keep
            # the historical stream: fold_in(k, 0) != k)
            key = jax.random.fold_in(key, step)
        t0 = time.time()
        device_losses = []
        while step < self.train_num_steps:
            with stage("load_batch"):
                batch = next(self.dl)
            if self.calculate_fid:
                self._last_batch = batch
            key, sub = jax.random.split(key)
            with stage("dispatch"), profiling.annotate("train_step"):
                self.state, loss = self._train_step(
                    self.state, self._reshape_accum(batch), sub)
            if self.track_losses:
                device_losses.append(loss)
            step += 1
            if step % log_every == 0:
                with stage("loss_sync"):
                    loss_v = float(loss)
                rate = log_every * self.batch_size * \
                    self.gradient_accumulate_every / (time.time() - t0)
                self.logger.info(
                    f"step {step}/{self.train_num_steps} "
                    f"loss {loss_v:.4f} ({rate:.1f} img/s)")
                t0 = time.time()
            if step != 0 and step % self.save_and_sample_every == 0:
                with stage("save_and_sample"):
                    self._save_and_sample(step)
                # restart the img/s window: the milestone's sampling chain
                # would otherwise deflate the next logged rate
                t0 = time.time()
            if capture is not None:
                capture.tick()
        if capture is not None:
            capture.close()
        if device_losses:
            self.loss_hist.extend(
                float(v) for v in np.asarray(jnp.stack(device_losses)))
        if timer is not None:
            jax.block_until_ready(self.state.params)
            self.logger.info(
                f"profile stages (trace in {prof_dir}):\n" + timer.summary())
        self.logger.info("training complete")

    # ------------------------------------------------------------------
    def _save_and_sample(self, step: int) -> None:
        milestone = step // self.save_and_sample_every
        if self.sample_on_save:
            # EVERY process launches the sampling program: the EMA tree is
            # replicated over the (possibly multi-process) global mesh, and
            # multi-controller SPMD forbids rank-gated dispatch of a
            # program over a shared mesh — a rank-0-only launch would
            # desynchronize the processes' program sequences at the first
            # milestone. Only the host-side writes are rank-0-gated.
            images = self.sample_ema(self.num_samples,
                                     seed=self.seed + milestone)
            if M.is_main_process():
                save_image_grid(
                    images, self.results_folder / f"sample-{milestone}.png",
                    nrow=int(math.isqrt(self.num_samples)))
                if self._fid_extractor is not None and \
                        self._last_batch is not None:
                    from pointreggpt_tpu.eval.fid import fid_score

                    score = fid_score(self._last_batch["img"], images,
                                      self._fid_extractor)
                    self.logger.info(f"fid_score: {score}")
        # milestone floored to hundreds, like the reference (sdd:1813);
        # save() gates the checkpoint write on rank 0 itself
        self.save(milestone // 100 * 100)

    def sample_ema(self, num_samples: int, *, seed: int = 0) -> np.ndarray:
        """Sample a grid of unconditional images with the EMA params."""
        if self._sample_fn is None:
            self._sample_fn = jax.jit(
                lambda p, k, pc: self.diffusion.sample(p, k, param_cond=pc))
        key = jax.random.PRNGKey(seed)
        k1, k2 = jax.random.split(key)
        intrinsic = G.intrinsic_transform(
            np.asarray(S.random_sample_intrinsic(k1, num_samples)),
            resize=self.image_size, centercrop=self.image_size,
        ).astype(np.float32)
        param_cond = G.param_vector(jnp.asarray(intrinsic))
        # NOT baked: the EMA tree is device-resident and changes every
        # milestone, so the host-side bake (models/bake.py) would pay a
        # full param download + re-upload per milestone — more than the
        # per-chain standardize/cast it saves. The steady-state inference
        # drivers (Generator/Tester/MaskTester) bake at load from HOST
        # checkpoints, where it is strictly a win.
        images = self._sample_fn(self.state.ema.params, k2, param_cond)
        return np.asarray(images)

    # ------------------------------------------------------------------
    def save(self, milestone) -> None:
        """Checkpoint {step, params, opt, ema} (sdd:1681-1699)."""
        if not M.is_main_process():
            return
        ckpt.save_checkpoint(
            self.results_folder / f"model-{milestone}.ckpt",
            {
                "step": int(self.state.step),
                "params": self.state.params,
                "opt_state": self.state.opt_state,
                "ema": self.state.ema,
            },
            meta={"milestone": str(milestone), "version": "pointreggpt-tpu"},
        )

    def load(self, milestone) -> None:
        """Restore a milestone checkpoint (sdd:1701-1717)."""
        target = {
            "step": 0,
            "params": jax.tree_util.tree_map(np.asarray, self.state.params),
            "opt_state": jax.tree_util.tree_map(np.asarray,
                                                self.state.opt_state),
            "ema": jax.tree_util.tree_map(np.asarray, self.state.ema),
        }
        state, meta = ckpt.load_checkpoint(
            self.results_folder / f"model-{milestone}.ckpt", target)
        new_state = TrainState(
            step=jnp.asarray(state["step"], jnp.int32),
            params=state["params"],
            opt_state=state["opt_state"],
            ema=state["ema"],
        )
        self.state = M.replicate(self.mesh, new_state)
        # fast-forward the data stream to the epoch the restored step had
        # reached: the infinite loader's permutation is a pure function of
        # (seed, epoch), so restarting at epoch 0 would replay the
        # already-trained data order (epoch-granular; combined with the
        # step fold-in of the train() key, a resumed run never repeats a
        # (batch, noise) pairing)
        global_batch = self.batch_size * self.gradient_accumulate_every
        batches_per_epoch = max(1, len(self.ds) // global_batch)
        start_epoch = int(state["step"]) // batches_per_epoch
        self.dl = iter(
            PrefetchLoader(self.ds, global_batch, shuffle=True,
                           infinite=True, num_workers=self.num_workers,
                           seed=self.seed, start_epoch=start_epoch))
        if meta.get("version"):
            self.logger.info(f"loaded checkpoint version {meta['version']}")
