"""GaussianDiffusion: training losses and the jitted DDIM/DDNM sampler.

This is the north-star device program of the build (SURVEY.md §3.2): the
reference's 250-step Python sampling loop (sdd:1319-1392) becomes **one
``lax.scan`` over timestep pairs** — U-Net forward, DDNM null-space
projection, mask dropout and the DDIM update fused into a single compiled
program with scan-carried RNG; the ``int(t[0])`` host reads of the dropout
schedules (sdd:1213) become traced table gathers.

DDNM (null-space data consistency): after the model predicts x̂0, pixels
where the re-projected-depth condition mask is valid are overwritten with the
re-projected depth (sdd:1210-1218). The optional refine step runs one final
DDNM-banned model step and splices its prediction back inside the mask
(sdd:1375-1389).

The class is a plain (hashable) Python object closed over by ``jax.jit`` —
not a Flax module — so samplers compile once per (shape, flags).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Callable, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from pointreggpt_tpu.core.geometry import (
    mask_from_image_condition,
    normalize_to_neg_one_to_one,
    param_vector,
    unnormalize_to_zero_to_one,
)
from pointreggpt_tpu.diffusion import schedules as sched

Array = jax.Array


class ModelPrediction(NamedTuple):
    pred_noise: Array
    pred_x_start: Array


def _extract(table: Array, t: Array, ndim: int) -> Array:
    """Gather per-sample table values, broadcastable to image rank."""
    out = jnp.take(table, t, axis=0)
    return out.reshape(out.shape + (1,) * (ndim - 1))


@dataclasses.dataclass(frozen=True)
class GaussianDiffusion:
    """DDPM wrapper around a denoiser ``apply_fn``.

    Args mirror the reference constructor (sdd:1015-1151). ``apply_fn`` has
    signature ``(params, x_nhwc, t, param_cond) -> prediction`` (the Flax
    ``model.apply`` partial).

    Entry-script config (train/generate): image_size=256, timesteps=1000,
    sampling_timesteps=250 (32 quick test), loss l1, objective pred_x0,
    sigmoid schedule, DDNM on, eta 0 (train) / 1.0 (test+generate).
    """

    apply_fn: Callable[..., Array]
    image_size: int
    channels: int = 1
    timesteps: int = 1000
    sampling_timesteps: Optional[int] = None
    loss_type: str = "l1"
    objective: str = "pred_x0"
    beta_schedule: str = "sigmoid"
    ddim_sampling_eta: float = 1.0
    min_snr_loss_weight: bool = False
    min_snr_gamma: float = 5.0
    is_ddnm_sampling: bool = True
    ddnm_sampling_dropout: float = 0.0
    ddnm_dropout_schedule: str = "none"

    def __post_init__(self):
        assert self.objective in ("pred_noise", "pred_x0", "pred_v")
        tables = sched.make_tables(self.timesteps, self.beta_schedule,
                                   self.objective, self.min_snr_loss_weight,
                                   self.min_snr_gamma)
        object.__setattr__(self, "_tables", tables)
        object.__setattr__(
            self, "_ddnm_dropouts",
            sched.ddnm_dropout_table(self.timesteps, self.ddnm_sampling_dropout,
                                     self.ddnm_dropout_schedule))
        object.__setattr__(self, "_denoise_dropouts",
                           sched.denoise_dropout_table(self.timesteps))
        # `is None`, not falsy: sampling_timesteps=0 must not silently
        # become a full-T ancestral chain (the reference's S=0 "runs" an
        # empty DDIM loop and returns pure noise — a degenerate config
        # that deserves an error, not either silent behavior)
        s = (self.timesteps if self.sampling_timesteps is None
             else self.sampling_timesteps)
        assert 1 <= s <= self.timesteps, (
            f"sampling_timesteps must be in [1, {self.timesteps}], got {s}")
        object.__setattr__(self, "_num_sampling_timesteps", int(s))

    # -- static properties -------------------------------------------------

    @property
    def tables(self) -> sched.DiffusionTables:
        return self._tables

    @property
    def num_timesteps(self) -> int:
        return self.timesteps

    @property
    def is_ddim_sampling(self) -> bool:
        return self._num_sampling_timesteps < self.timesteps

    # -- q / prediction conversions (sdd:1153-1180, 1448-1453) --------------

    def q_sample(self, x_start: Array, t: Array, noise: Array) -> Array:
        tb = self.tables
        nd = x_start.ndim
        return (_extract(jnp.asarray(tb.sqrt_alphas_cumprod), t, nd) * x_start +
                _extract(jnp.asarray(tb.sqrt_one_minus_alphas_cumprod), t, nd)
                * noise)

    def predict_start_from_noise(self, x_t, t, noise):
        tb = self.tables
        nd = x_t.ndim
        return (_extract(jnp.asarray(tb.sqrt_recip_alphas_cumprod), t, nd) * x_t
                - _extract(jnp.asarray(tb.sqrt_recipm1_alphas_cumprod), t, nd)
                * noise)

    def predict_noise_from_start(self, x_t, t, x0):
        tb = self.tables
        nd = x_t.ndim
        return ((_extract(jnp.asarray(tb.sqrt_recip_alphas_cumprod), t, nd) *
                 x_t - x0) /
                _extract(jnp.asarray(tb.sqrt_recipm1_alphas_cumprod), t, nd))

    def predict_v(self, x_start, t, noise):
        tb = self.tables
        nd = x_start.ndim
        return (_extract(jnp.asarray(tb.sqrt_alphas_cumprod), t, nd) * noise -
                _extract(jnp.asarray(tb.sqrt_one_minus_alphas_cumprod), t, nd)
                * x_start)

    def predict_start_from_v(self, x_t, t, v):
        tb = self.tables
        nd = x_t.ndim
        return (_extract(jnp.asarray(tb.sqrt_alphas_cumprod), t, nd) * x_t -
                _extract(jnp.asarray(tb.sqrt_one_minus_alphas_cumprod), t, nd)
                * v)

    def q_posterior(self, x_start, x_t, t):
        tb = self.tables
        nd = x_t.ndim
        mean = (_extract(jnp.asarray(tb.posterior_mean_coef1), t, nd) * x_start
                + _extract(jnp.asarray(tb.posterior_mean_coef2), t, nd) * x_t)
        var = _extract(jnp.asarray(tb.posterior_variance), t, nd)
        log_var = _extract(
            jnp.asarray(tb.posterior_log_variance_clipped), t, nd)
        return mean, var, log_var

    # -- model predictions with DDNM projection (sdd:1182-1232) -------------

    def model_predictions(
        self,
        params,
        x: Array,
        t: Array,
        param_cond: Array,
        img_cond: Optional[Array] = None,
        *,
        key: Optional[Array] = None,
        clip_x_start: bool = False,
        is_ban_ddnm: bool = False,
        is_denoise: bool = False,
    ) -> ModelPrediction:
        """U-Net forward + objective conversion + DDNM projection.

        Args:
            x: (b, h, w, c) current noisy image, [-1, 1] space.
            t: (b,) int timesteps (all equal during sampling).
            img_cond: optional (b, h, w, 2) condition; note it is consumed
                ONLY by the DDNM projection, never fed to the network
                (reference behavior, sdd:920 + SURVEY.md §2.3).
            key: RNG for mask dropout (required only if a dropout schedule
                is active).
        """
        model_output = self.apply_fn(params, x, t, param_cond)
        if model_output.shape != x.shape:
            raise ValueError(
                f"model output {model_output.shape} != input {x.shape}; "
                f"GaussianDiffusion requires out channels == in channels "
                f"(learned_variance models are unsupported, sdd:1032-1034)")
        clip = (lambda v: jnp.clip(v, -1.0, 1.0)) if clip_x_start else (
            lambda v: v)

        if self.objective == "pred_noise":
            pred_noise = model_output
            x_start = clip(self.predict_start_from_noise(x, t, pred_noise))
        elif self.objective == "pred_x0":
            x_start = clip(model_output)
            pred_noise = self.predict_noise_from_start(x, t, x_start)
        else:  # pred_v
            x_start = clip(self.predict_start_from_v(x, t, model_output))
            pred_noise = self.predict_noise_from_start(x, t, x_start)

        # branch precedence matches the reference (sdd:1210-1227): the
        # DDNM branch (ddnm_dropouts) wins over is_denoise — with the
        # production config (is_ddnm_sampling=True, dropout 0) denoise()
        # pins masked pixels at EVERY step; the steeply-decaying
        # denoise_dropouts table applies only when DDNM is off/banned
        use_ddnm = self.is_ddnm_sampling and not is_ban_ddnm
        if img_cond is not None and (use_ddnm or is_denoise):
            img_rpj = img_cond[..., 0:1]
            mask_rpj = mask_from_image_condition(img_cond)[..., None]
            dropout_table = (self._ddnm_dropouts
                             if use_ddnm else self._denoise_dropouts)
            if key is None and np.any(np.asarray(dropout_table) > 0):
                # fail fast instead of silently skipping the keep-mask
                # draw: the reference always applies an active dropout
                # schedule (sdd:1210-1227), so a keyless call here would
                # diverge without signal. The table is host data, so this
                # check is trace-time free.
                raise ValueError(
                    "model_predictions: the active "
                    f"{'ddnm' if use_ddnm else 'denoise'} mask-dropout "
                    "schedule is nonzero but no RNG key was passed — "
                    "dropout would be silently skipped")
            p_drop = jnp.asarray(dropout_table)[t[0]]
            if key is not None:
                keep = jax.random.uniform(key, mask_rpj.shape) > p_drop
                mask_rpj = jnp.where(p_drop > 0, keep & mask_rpj, mask_rpj)
            # NOTE: pred_noise is intentionally NOT recomputed from the
            # projected x_start — the reference returns the pre-projection
            # noise estimate (sdd:1229-1232), and the DDIM update consumes
            # both. Matching this is required for pretrained-weight parity.
            x_start = jnp.where(mask_rpj, img_rpj, x_start)

        return ModelPrediction(pred_noise, x_start)

    # -- training loss (sdd:1448-1510) --------------------------------------

    def p_losses(self, params, key: Array, x_start: Array, t: Array,
                 param_cond: Array,
                 noise: Optional[Array] = None) -> Array:
        """Per-batch SNR-weighted L1/L2 denoising loss.

        ``noise`` defaults to a fresh draw from ``key``; injecting it
        explicitly mirrors the reference's ``p_losses(..., noise=)`` kwarg
        (sdd:1464-1466) and enables exact loss parity tests.
        """
        if noise is None:
            noise = jax.random.normal(key, x_start.shape, x_start.dtype)
        x = self.q_sample(x_start, t, noise)
        model_out = self.apply_fn(params, x, t, param_cond)
        if model_out.shape != x_start.shape:
            # catches e.g. a learned_variance=True Unet (2x out head)
            # wired in directly: |model_out - target| would silently
            # broadcast (b,h,w,2) against (b,h,w,1) and train a wrong
            # loss (the reference asserts at construction, sdd:1032-1034;
            # this wrapper only sees apply_fn, so the check lives here)
            raise ValueError(
                f"model output {model_out.shape} != target "
                f"{x_start.shape}; GaussianDiffusion requires out "
                f"channels == in channels")

        if self.objective == "pred_noise":
            target = noise
        elif self.objective == "pred_x0":
            target = x_start
        else:
            target = self.predict_v(x_start, t, noise)

        if self.loss_type == "l1":
            loss = jnp.abs(model_out - target)
        elif self.loss_type == "l2":
            loss = (model_out - target)**2
        else:
            raise ValueError(f"invalid loss type {self.loss_type}")

        loss = jnp.mean(loss.reshape(loss.shape[0], -1), axis=-1)
        loss = loss * jnp.take(
            jnp.asarray(self.tables.loss_weight), t, axis=0)
        return jnp.mean(loss)

    def training_loss(self, params, key: Array, img01: Array,
                      intrinsic: Array) -> Array:
        """The full forward pass of training (sdd:1499-1510).

        Args:
            img01: (b, h, w, c) depth in [0, 1] model units.
            intrinsic: (b, 3, 3).
        """
        b = img01.shape[0]
        k_t, k_noise = jax.random.split(key)
        t = jax.random.randint(k_t, (b,), 0, self.num_timesteps)
        param_cond = param_vector(intrinsic)
        img = normalize_to_neg_one_to_one(img01)
        return self.p_losses(params, k_noise, img, t, param_cond)

    # -- ancestral sampling (sdd:1234-1317) ----------------------------------

    def _p_sample_step(self, params, x, t_scalar, param_cond, img_cond, key,
                       is_ban_ddnm, is_denoise):
        b = x.shape[0]
        t = jnp.full((b,), t_scalar, jnp.int32)
        k_drop, k_noise = jax.random.split(key)
        preds = self.model_predictions(
            params, x, t, param_cond, img_cond, key=k_drop,
            is_ban_ddnm=is_ban_ddnm, is_denoise=is_denoise)
        x_start = jnp.clip(preds.pred_x_start, -1.0, 1.0)
        mean, _, log_var = self.q_posterior(x_start, x, t)
        noise = jax.random.normal(k_noise, x.shape, x.dtype)
        noise = jnp.where(t_scalar > 0, noise, 0.0)
        return mean + jnp.exp(0.5 * log_var) * noise, x_start

    def p_sample_loop(self, params, key: Array, param_cond: Array,
                      img_cond: Optional[Array], shape,
                      *, has_refine_step: bool = False,
                      is_denoise: bool = False,
                      x_init: Optional[Array] = None) -> Array:
        """Full-T ancestral sampling as one lax.scan (sdd:1283-1317)."""
        k_init, k_scan, k_refine = jax.random.split(key, 3)
        img = jax.random.normal(k_init, shape) if x_init is None else x_init

        ts = jnp.arange(self.num_timesteps - 1, -1, -1)
        keys = jax.random.split(k_scan, self.num_timesteps)

        def body(carry, inp):
            x = carry
            t_scalar, k = inp
            x, _ = self._p_sample_step(params, x, t_scalar, param_cond,
                                       img_cond, k, False, is_denoise)
            return x, None

        img, _ = jax.lax.scan(body, img, (ts, keys))

        if has_refine_step and img_cond is not None:
            refined, x_start = self._p_sample_step(
                params, img, jnp.asarray(0, jnp.int32), param_cond, img_cond,
                k_refine, True, False)
            mask_rpj = mask_from_image_condition(img_cond)[..., None]
            img = jnp.where(mask_rpj, refined, img)

        return unnormalize_to_zero_to_one(img)

    # -- DDIM sampling: the jitted hot loop (sdd:1319-1392) ------------------

    def ddim_sample(self, params, key: Array, param_cond: Array,
                    img_cond: Optional[Array], shape,
                    *, clip_denoised: bool = True,
                    has_refine_step: bool = False,
                    is_denoise: bool = False,
                    x_init: Optional[Array] = None) -> Array:
        """DDIM chain with DDNM projection as one lax.scan.

        eta parameterizes the stochasticity (0 = deterministic DDIM, 1 =
        ancestral-like; the entry scripts use 0 for training eval and 1.0
        for test/generation).
        """
        eta = self.ddim_sampling_eta
        tb = self.tables
        pairs = sched.ddim_time_pairs(self.timesteps,
                                      self._num_sampling_timesteps)
        k_init, k_scan, k_refine = jax.random.split(key, 3)
        # x_init lets tests/parity harnesses inject the x_T draw
        img = jax.random.normal(k_init, shape) if x_init is None else x_init
        keys = jax.random.split(k_scan, pairs.shape[0])

        alphas_cumprod = jnp.asarray(tb.alphas_cumprod)

        def body(x, inp):
            (t_scalar, t_next), k = inp
            k_drop, k_noise = jax.random.split(k)
            b = x.shape[0]
            t = jnp.full((b,), t_scalar, jnp.int32)
            pred_noise, x_start = self.model_predictions(
                params, x, t, param_cond, img_cond, key=k_drop,
                clip_x_start=clip_denoised, is_denoise=is_denoise)

            alpha = alphas_cumprod[t_scalar]
            alpha_next = alphas_cumprod[jnp.maximum(t_next, 0)]
            sigma = eta * jnp.sqrt(
                (1 - alpha / alpha_next) * (1 - alpha_next) / (1 - alpha))
            c = jnp.sqrt(jnp.maximum(1.0 - alpha_next - sigma**2, 0.0))
            noise = jax.random.normal(k_noise, x.shape, x.dtype)
            x_new = x_start * jnp.sqrt(alpha_next) + c * pred_noise + \
                sigma * noise
            # last step (t_next < 0): the prediction itself
            x_new = jnp.where(t_next < 0, x_start, x_new)
            return x_new, None

        img, _ = jax.lax.scan(body, img, (jnp.asarray(pairs), keys))

        if has_refine_step and img_cond is not None:
            b = shape[0]
            t = jnp.zeros((b,), jnp.int32)
            _, x_start = self.model_predictions(
                params, img, t, param_cond, img_cond, key=k_refine,
                clip_x_start=clip_denoised, is_ban_ddnm=True)
            mask_rpj = mask_from_image_condition(img_cond)[..., None]
            img = jnp.where(mask_rpj, x_start, img)

        return unnormalize_to_zero_to_one(img)

    # -- public entry points (sdd:1394-1427) ---------------------------------

    def sample(self, params, key: Array, *, param_cond: Array,
               img_cond: Optional[Array] = None,
               has_refine_step: bool = False,
               x_init: Optional[Array] = None) -> Array:
        """Sample images in [0, 1]. Dispatches DDIM vs ancestral on config."""
        b = param_cond.shape[0]
        shape = (b, self.image_size, self.image_size, self.channels)
        if self.is_ddim_sampling:
            return self.ddim_sample(params, key, param_cond, img_cond, shape,
                                    has_refine_step=has_refine_step,
                                    x_init=x_init)
        return self.p_sample_loop(params, key, param_cond, img_cond, shape,
                                  has_refine_step=has_refine_step,
                                  x_init=x_init)

    def denoise(self, params, key: Array, *, param_cond: Array,
                img_cond: Optional[Array] = None,
                has_refine_step: bool = False) -> Array:
        """Denoise mode: DDNM projection under the denoise dropout schedule."""
        b = param_cond.shape[0]
        shape = (b, self.image_size, self.image_size, self.channels)
        fn = self.ddim_sample if self.is_ddim_sampling else self.p_sample_loop
        return fn(params, key, param_cond, img_cond, shape,
                  has_refine_step=has_refine_step, is_denoise=True)

    def interpolate(self, params, key: Array, x1: Array, x2: Array,
                    param_cond: Array, *, t: Optional[int] = None,
                    lam: float = 0.5) -> Array:
        """Spherical-ish latent interpolation between two images.

        Diffuse both to step ``t``, lerp, then run the ancestral chain back
        down. The reference version (sdd:1429-1446) is dead code with a
        broken ``p_sample`` signature; this is the working equivalent,
        expressed as a single ``lax.scan``.

        Args:
            x1, x2: (b, h, w, c) images in [-1, 1] space.

        Returns:
            (b, h, w, c) interpolated images in [-1, 1] space.
        """
        assert x1.shape == x2.shape
        t = self.num_timesteps - 1 if t is None else int(t)
        if not 1 <= t <= self.num_timesteps - 1:
            # out-of-range t would silently mis-execute: the q_sample
            # table gathers clip t to T-1 (jnp.take clips) while the
            # chain below would still run `t` denoise steps on clipped
            # posterior coefficients
            raise ValueError(
                f"interpolate: t={t} outside [1, {self.num_timesteps - 1}]")
        b = x1.shape[0]
        k_n1, k_n2, k_scan = jax.random.split(key, 3)
        tb = jnp.full((b,), t, jnp.int32)
        xt1 = self.q_sample(x1, tb, jax.random.normal(k_n1, x1.shape))
        xt2 = self.q_sample(x2, tb, jax.random.normal(k_n2, x2.shape))
        img = (1 - lam) * xt1 + lam * xt2

        ts = jnp.arange(t - 1, -1, -1)
        keys = jax.random.split(k_scan, t)

        def body(x, inp):
            t_scalar, k = inp
            x, _ = self._p_sample_step(params, x, t_scalar, param_cond, None,
                                       k, False, False)
            return x, None

        img, _ = jax.lax.scan(body, img, (ts, keys))
        return img
