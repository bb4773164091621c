"""Diffusion math tests: golden schedule tables, q_sample algebra, DDIM/DDNM
sampling on tiny shapes, training loss + gradients."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pointreggpt_tpu.core.geometry import normalize_to_neg_one_to_one
from pointreggpt_tpu.diffusion import GaussianDiffusion
from pointreggpt_tpu.diffusion import schedules as sched


class TestSchedules:
    def test_sigmoid_matches_torch_reference(self):
        # golden parity vs the reference torch implementation (sdd:997-1012)
        torch = pytest.importorskip("torch")
        import math

        timesteps = 1000
        steps = timesteps + 1
        t = torch.linspace(0, timesteps, steps, dtype=torch.float64) / timesteps
        start, end, tau = -3, 3, 1
        v_start = torch.tensor(start / tau).sigmoid()
        v_end = torch.tensor(end / tau).sigmoid()
        ac = (-((t * (end - start) + start) / tau).sigmoid() + v_end) / (
            v_end - v_start)
        ac = ac / ac[0]
        ref = torch.clip(1 - (ac[1:] / ac[:-1]), 0, 0.999).numpy()

        ours = sched.sigmoid_beta_schedule(timesteps)
        np.testing.assert_allclose(ours, ref, rtol=1e-12)

    def test_cosine_matches_torch_reference(self):
        torch = pytest.importorskip("torch")
        import math

        timesteps = 100
        steps = timesteps + 1
        x = torch.linspace(0, timesteps, steps, dtype=torch.float64)
        ac = torch.cos(((x / timesteps) + 0.008) / 1.008 * math.pi * 0.5)**2
        ac = ac / ac[0]
        ref = torch.clip(1 - (ac[1:] / ac[:-1]), 0, 0.999).numpy()
        np.testing.assert_allclose(
            sched.cosine_beta_schedule(timesteps), ref, rtol=1e-12)

    def test_linear(self):
        b = sched.linear_beta_schedule(1000)
        assert np.isclose(b[0], 1e-4) and np.isclose(b[-1], 0.02)

    def test_tables_consistency(self):
        tb = sched.make_tables(100, "sigmoid", "pred_x0")
        # alphas_cumprod decreasing in (0, 1]
        assert (np.diff(tb.alphas_cumprod) < 0).all()
        assert tb.alphas_cumprod[0] < 1.0 and tb.alphas_cumprod[-1] > 0.0
        # prev shifted by one with leading 1
        assert tb.alphas_cumprod_prev[0] == 1.0
        np.testing.assert_allclose(tb.alphas_cumprod_prev[1:],
                                   tb.alphas_cumprod[:-1])
        # sqrt tables are consistent
        np.testing.assert_allclose(
            tb.sqrt_alphas_cumprod**2, tb.alphas_cumprod, rtol=1e-5)
        # loss weight for pred_x0 is snr (min-snr off: reference default)
        np.testing.assert_allclose(tb.loss_weight, tb.snr)

    def test_min_snr_clipping(self):
        tb = sched.make_tables(100, "sigmoid", "pred_x0",
                               min_snr_loss_weight=True, min_snr_gamma=5.0)
        assert tb.loss_weight.max() <= 5.0 + 1e-5

    def test_ddim_time_pairs_reference_semantics(self):
        # torch.linspace(-1, T-1, S+1).int() pairs, reversed (sdd:1331-1337)
        pairs = sched.ddim_time_pairs(1000, 4)
        times = np.linspace(-1, 999, 5).astype(int)[::-1]
        expect = list(zip(times[:-1], times[1:]))
        np.testing.assert_array_equal(pairs, expect)
        assert pairs[-1][1] == -1  # ends at the boundary marker

    def test_ddim_time_pairs_float32_grid_parity(self):
        """The reference's float32 torch.linspace DECIDES some timesteps
        (e.g. T=1000, S=26: float32 reads 498.999969 -> t=498 where exact
        arithmetic gives 499.0 -> t=499). The grid must match torch's for
        every S, including the known float64-divergent ones."""
        import torch

        for S in (26, 52, 60, 104, 250, 32, 1, 999, 1000):
            ref = torch.linspace(-1, 999, S + 1).int().tolist()
            ref = list(reversed(ref))
            expect = np.asarray(list(zip(ref[:-1], ref[1:])), np.int32)
            np.testing.assert_array_equal(
                sched.ddim_time_pairs(1000, S), expect, err_msg=f"S={S}")
        # the production grids are exact multiples: float precision is
        # irrelevant there (regression guard for the fallback path too)
        p250 = sched.ddim_time_pairs(1000, 250)
        assert p250[0][0] == 999 and p250[-1][1] == -1
        assert {int(a - b) for a, b in p250[:-1]} == {4}

    def test_dropout_tables(self):
        d = sched.ddnm_dropout_table(10, 0.3, "linear")
        assert np.isclose(d[0], 0.3) and np.isclose(d[-1], 0.0)
        dn = sched.denoise_dropout_table(1000)
        assert dn[0] == 1.0 and dn[-1] == 0.0
        assert dn[500] < 1e-20  # **100 collapses fast


def _dummy_diffusion(image_size=8, timesteps=10, sampling_timesteps=None,
                     eta=1.0, apply_fn=None, **kw):
    if apply_fn is None:
        # "perfect" denoiser that always predicts 0.42 * ones as x0
        def apply_fn(params, x, t, param_cond):
            return jnp.full_like(x, params["x0"])

    return GaussianDiffusion(
        apply_fn=apply_fn,
        image_size=image_size,
        timesteps=timesteps,
        sampling_timesteps=sampling_timesteps,
        objective="pred_x0",
        beta_schedule="sigmoid",
        ddim_sampling_eta=eta,
        **kw,
    )


class TestQSample:
    def test_t0_nearly_clean(self):
        d = _dummy_diffusion(timesteps=1000)
        x0 = jnp.ones((2, 4, 4, 1)) * 0.5
        noise = jnp.ones_like(x0)
        xt = d.q_sample(x0, jnp.zeros((2,), jnp.int32), noise)
        # at t=0 alphas_cumprod ~ 1 -> xt ~ x0
        np.testing.assert_allclose(np.asarray(xt), 0.5, atol=0.1)

    def test_roundtrip_noise_recovery(self):
        d = _dummy_diffusion(timesteps=100)
        key = jax.random.PRNGKey(0)
        x0 = jax.random.uniform(key, (2, 4, 4, 1)) * 2 - 1
        noise = jax.random.normal(jax.random.PRNGKey(1), x0.shape)
        t = jnp.array([50, 80])
        xt = d.q_sample(x0, t, noise)
        # invert: predict_noise_from_start(xt, t, x0) == noise
        rec = d.predict_noise_from_start(xt, t, x0)
        np.testing.assert_allclose(np.asarray(rec), np.asarray(noise),
                                   atol=1e-3)

    def test_predict_start_from_noise_inverse(self):
        d = _dummy_diffusion(timesteps=100)
        x0 = jax.random.normal(jax.random.PRNGKey(2), (1, 4, 4, 1))
        noise = jax.random.normal(jax.random.PRNGKey(3), x0.shape)
        t = jnp.array([30])
        xt = d.q_sample(x0, t, noise)
        rec = d.predict_start_from_noise(xt, t, noise)
        np.testing.assert_allclose(np.asarray(rec), np.asarray(x0), atol=1e-4)

    def test_v_parameterization_consistency(self):
        d = _dummy_diffusion(timesteps=100)
        x0 = jax.random.normal(jax.random.PRNGKey(4), (1, 4, 4, 1))
        noise = jax.random.normal(jax.random.PRNGKey(5), x0.shape)
        t = jnp.array([42])
        xt = d.q_sample(x0, t, noise)
        v = d.predict_v(x0, t, noise)
        rec = d.predict_start_from_v(xt, t, v)
        np.testing.assert_allclose(np.asarray(rec), np.asarray(x0), atol=1e-4)


class TestSampling:
    def test_ddim_converges_to_model_x0(self):
        # with a constant "oracle" x0 predictor and eta=0, DDIM must land
        # exactly on that x0 (in [0,1] space after unnormalize)
        d = _dummy_diffusion(timesteps=10, sampling_timesteps=4, eta=0.0)
        params = {"x0": 0.42}
        out = d.sample(params, jax.random.PRNGKey(0),
                       param_cond=jnp.zeros((2, 4)))
        np.testing.assert_allclose(
            np.asarray(out), (0.42 + 1) / 2, atol=1e-5)

    def test_ancestral_loop_converges(self):
        d = _dummy_diffusion(timesteps=8, sampling_timesteps=None)
        assert not d.is_ddim_sampling
        params = {"x0": -0.2}
        out = d.sample(params, jax.random.PRNGKey(1),
                       param_cond=jnp.zeros((1, 4)))
        np.testing.assert_allclose(np.asarray(out), 0.4, atol=0.05)

    def test_ddnm_projection_pins_masked_pixels(self):
        # condition with a fully-valid mask: output == conditioned depth
        d = _dummy_diffusion(timesteps=10, sampling_timesteps=4, eta=0.0)
        params = {"x0": 0.0}
        depth01 = 0.7
        cond01 = jnp.stack(
            [jnp.full((1, 8, 8), depth01), jnp.ones((1, 8, 8))], axis=-1)
        img_cond = normalize_to_neg_one_to_one(cond01)
        out = d.sample(params, jax.random.PRNGKey(2),
                       param_cond=jnp.zeros((1, 4)), img_cond=img_cond)
        np.testing.assert_allclose(np.asarray(out), depth01, atol=1e-5)

    def test_ddnm_unmasked_pixels_follow_model(self):
        d = _dummy_diffusion(timesteps=10, sampling_timesteps=4, eta=0.0)
        params = {"x0": 0.42}
        mask01 = jnp.zeros((1, 8, 8)).at[:, :4].set(1.0)
        cond01 = jnp.stack([jnp.full((1, 8, 8), 0.9), mask01], axis=-1)
        img_cond = normalize_to_neg_one_to_one(cond01)
        out = np.asarray(
            d.sample(params, jax.random.PRNGKey(3),
                     param_cond=jnp.zeros((1, 4)), img_cond=img_cond))
        np.testing.assert_allclose(out[0, :4], 0.9, atol=1e-5)
        np.testing.assert_allclose(out[0, 4:], 0.71, atol=1e-5)

    def test_refine_step_changes_only_masked(self):
        calls = []

        def apply_fn(params, x, t, param_cond):
            calls.append(1)
            return jnp.full_like(x, 0.1)

        d = _dummy_diffusion(timesteps=10, sampling_timesteps=4, eta=0.0,
                             apply_fn=apply_fn)
        mask01 = jnp.zeros((1, 8, 8)).at[:, :4].set(1.0)
        cond01 = jnp.stack([jnp.full((1, 8, 8), 0.5), mask01], axis=-1)
        img_cond = normalize_to_neg_one_to_one(cond01)
        out = np.asarray(
            d.sample({}, jax.random.PRNGKey(4),
                     param_cond=jnp.zeros((1, 4)), img_cond=img_cond,
                     has_refine_step=True))
        # refined (ban-DDNM) prediction 0.1 -> [0,1]: 0.55 inside the mask
        np.testing.assert_allclose(out[0, :4], 0.55, atol=1e-5)
        # outside the mask the normal chain value remains
        np.testing.assert_allclose(out[0, 4:], 0.55, atol=1e-5)

    def test_sampling_is_jittable_and_deterministic(self):
        d = _dummy_diffusion(timesteps=10, sampling_timesteps=4, eta=1.0)
        params = {"x0": 0.0}
        f = jax.jit(lambda p, k: d.sample(p, k, param_cond=jnp.zeros((1, 4))))
        a = f(params, jax.random.PRNGKey(5))
        b = f(params, jax.random.PRNGKey(5))
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_denoise_mode_runs(self):
        d = _dummy_diffusion(timesteps=10, sampling_timesteps=4)
        cond01 = jnp.stack(
            [jnp.full((1, 8, 8), 0.5), jnp.ones((1, 8, 8))], axis=-1)
        out = d.denoise({"x0": 0.0}, jax.random.PRNGKey(6),
                        param_cond=jnp.zeros((1, 4)),
                        img_cond=normalize_to_neg_one_to_one(cond01))
        assert out.shape == (1, 8, 8, 1)
        assert np.isfinite(np.asarray(out)).all()

    def test_denoise_ddnm_branch_takes_precedence(self):
        """Reference sdd:1210-1227: the DDNM branch outranks is_denoise.
        Production config (is_ddnm_sampling=True, dropout 0): denoise()
        pins masked pixels to the conditioning at EVERY step, so the
        output equals the condition inside the mask. With DDNM off, the
        steep denoise_dropouts table (==1.0 at t=0) drops the mask at the
        chain end and the pinning is lost. Uses the full-T ancestral chain
        — a DDIM subsequence's final step is t>0 where the denoise table
        is already ~0, so the two branches coincide there."""
        cond01 = jnp.stack(
            [jnp.full((1, 8, 8), 0.5), jnp.ones((1, 8, 8))], axis=-1)
        cond = normalize_to_neg_one_to_one(cond01)
        kw = dict(param_cond=jnp.zeros((1, 4)), img_cond=cond)

        d_on = _dummy_diffusion(timesteps=10)
        out = np.asarray(d_on.denoise({"x0": 0.3}, jax.random.PRNGKey(6),
                                      **kw))
        np.testing.assert_allclose(out[..., 0], 0.5, atol=1e-5)

        d_off = _dummy_diffusion(timesteps=10, is_ddnm_sampling=False)
        out2 = np.asarray(d_off.denoise({"x0": 0.3}, jax.random.PRNGKey(6),
                                        **kw))
        assert np.abs(out2[..., 0] - 0.5).max() > 0.01


class TestTrainingLoss:
    def test_loss_zero_for_oracle(self):
        # if the model predicts x_start exactly, l1 loss is 0
        def apply_fn(params, x, t, param_cond):
            return params["target"]

        d = _dummy_diffusion(timesteps=100, apply_fn=apply_fn)
        x0 = jax.random.uniform(jax.random.PRNGKey(0), (2, 8, 8, 1))
        loss = d.training_loss({"target": normalize_to_neg_one_to_one(x0)},
                               jax.random.PRNGKey(1), x0,
                               jnp.tile(jnp.eye(3), (2, 1, 1)))
        assert float(loss) < 1e-6

    def test_loss_gradient_flows(self):
        def apply_fn(params, x, t, param_cond):
            return x * params["w"]

        d = _dummy_diffusion(timesteps=100, apply_fn=apply_fn)
        x0 = jax.random.uniform(jax.random.PRNGKey(2), (2, 8, 8, 1))

        def loss_fn(p):
            return d.training_loss(p, jax.random.PRNGKey(3), x0,
                                   jnp.tile(jnp.eye(3), (2, 1, 1)))

        g = jax.grad(loss_fn)({"w": jnp.asarray(1.0)})
        assert np.isfinite(float(g["w"])) and abs(float(g["w"])) > 0

    def test_loss_weight_applied(self):
        # pred_x0 weighting = snr: loss at small t outweighs large t
        def apply_fn(params, x, t, param_cond):
            return jnp.zeros_like(x)

        d = _dummy_diffusion(timesteps=1000, apply_fn=apply_fn)
        x0 = jnp.ones((1, 4, 4, 1)) * 0.5
        l_small = d.p_losses({}, jax.random.PRNGKey(4), x0,
                             jnp.array([5]), jnp.zeros((1, 4)))
        l_large = d.p_losses({}, jax.random.PRNGKey(4), x0,
                             jnp.array([900]), jnp.zeros((1, 4)))
        assert float(l_small) > float(l_large)


class TestInterpolate:
    def test_interpolation_runs_and_blends(self):
        d = _dummy_diffusion(timesteps=8)
        params = {"x0": 0.3}
        x1 = jnp.full((1, 8, 8, 1), -0.5)
        x2 = jnp.full((1, 8, 8, 1), 0.5)
        out = d.interpolate(params, jax.random.PRNGKey(0), x1, x2,
                            jnp.zeros((1, 4)), t=4)
        assert out.shape == x1.shape
        assert np.isfinite(np.asarray(out)).all()

    def test_out_of_range_t_rejected(self):
        """t past the table range used to silently gather clipped
        coefficients while still scanning t steps — must raise instead."""
        import pytest

        d = _dummy_diffusion(timesteps=8)
        x = jnp.zeros((1, 8, 8, 1))
        for bad_t in (0, 8, 1500):
            with pytest.raises(ValueError, match="outside"):
                d.interpolate({"x0": 0.3}, jax.random.PRNGKey(0), x, x,
                              jnp.zeros((1, 4)), t=bad_t)


class TestDropoutKeyGuard:
    def test_keyless_active_schedule_raises(self):
        """A nonzero mask-dropout schedule with key=None must fail fast,
        not silently skip the keep-mask draw (the reference always
        applies it, sdd:1210-1227)."""
        import pytest

        d = _dummy_diffusion(timesteps=8)
        x = jnp.zeros((1, 8, 8, 1))
        t = jnp.zeros((1,), jnp.int32)
        cond = jnp.concatenate(
            [jnp.full((1, 8, 8, 1), 0.3), jnp.ones((1, 8, 8, 1))], -1)
        # denoise schedule is nonzero by construction -> keyless denoise
        # call must raise (ban DDNM so the denoise table governs; with
        # DDNM active the zero-dropout ddnm table wins the precedence)
        with pytest.raises(ValueError, match="no RNG key"):
            d.model_predictions({"x0": 0.3}, x, t, jnp.zeros((1, 4)), cond,
                                key=None, is_ban_ddnm=True, is_denoise=True)
        # zero ddnm dropout (production generation): keyless is fine
        preds = d.model_predictions({"x0": 0.3}, x, t, jnp.zeros((1, 4)),
                                    cond, key=None)
        assert np.isfinite(np.asarray(preds.pred_x_start)).all()


class TestOutputShapeGuard:
    """A model with out channels != in channels (e.g. learned_variance's 2x
    head wired in directly, bypassing config.build_diffusion) must fail
    fast at trace time, not silently broadcast a wrong loss (the reference
    asserts at construction, sdd:1032-1034)."""

    def _two_channel(self, params, x, t, param_cond):
        return jnp.concatenate([x, x], axis=-1)

    def test_p_losses_rejects(self):
        import pytest

        d = _dummy_diffusion(apply_fn=self._two_channel)
        x0 = jnp.zeros((1, 8, 8, 1))
        with pytest.raises(ValueError, match="out channels"):
            d.p_losses({}, jax.random.PRNGKey(0), x0, jnp.array([2]),
                       jnp.zeros((1, 4)))

    def test_sampling_rejects(self):
        import pytest

        d = _dummy_diffusion(sampling_timesteps=4,
                             apply_fn=self._two_channel)
        with pytest.raises(ValueError, match="out channels"):
            d.sample({}, jax.random.PRNGKey(0),
                     param_cond=jnp.zeros((1, 4)))
