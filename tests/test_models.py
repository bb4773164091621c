"""Shape/dtype/behavior tests for the Flax U-Nets (tiny dims for CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pointreggpt_tpu.models import DiffusionUNet, MaskUNet
from pointreggpt_tpu.models import blocks as B


class TestBlocks:
    def test_wsconv_weight_standardized(self):
        conv = B.WSConv(4, (3, 3))
        x = jnp.ones((1, 8, 8, 2))
        params = conv.init(jax.random.PRNGKey(0), x)
        y = conv.apply(params, x)
        assert y.shape == (1, 8, 8, 4)

    def test_channel_layernorm_stats(self):
        ln = B.ChannelLayerNorm()
        x = jax.random.normal(jax.random.PRNGKey(1), (2, 4, 4, 16))
        params = ln.init(jax.random.PRNGKey(0), x)
        y = ln.apply(params, x)
        m = jnp.mean(y, axis=-1)
        v = jnp.var(y, axis=-1)
        np.testing.assert_allclose(np.asarray(m), 0.0, atol=1e-5)
        np.testing.assert_allclose(np.asarray(v), 1.0, atol=1e-3)

    def test_sinusoidal_pos_emb(self):
        emb = B.SinusoidalPosEmb(16)
        y = emb.apply({}, jnp.array([0.0, 1.0, 500.0]))
        assert y.shape == (3, 16)
        # t=0 -> sin part zero, cos part one
        np.testing.assert_allclose(np.asarray(y[0, :8]), 0.0, atol=1e-7)
        np.testing.assert_allclose(np.asarray(y[0, 8:]), 1.0, atol=1e-7)

    def test_downsample_halves_upsample_doubles(self):
        x = jnp.ones((1, 8, 8, 4))
        down = B.Downsample(6)
        p = down.init(jax.random.PRNGKey(0), x)
        assert down.apply(p, x).shape == (1, 4, 4, 6)
        up = B.Upsample(3)
        p = up.init(jax.random.PRNGKey(0), x)
        assert up.apply(p, x).shape == (1, 16, 16, 3)

    def test_upsample_dilated_matches_repeat_conv(self, rng):
        """The shipped input-dilated-conv formulation must equal nearest-2x
        repeat followed by a SAME 3x3 conv with the same kernel/bias."""
        x = jnp.asarray(rng.normal(size=(2, 8, 16, 6)), jnp.float32)
        up = B.Upsample(5)
        p = up.init(jax.random.PRNGKey(1), x)
        got = up.apply(p, x)

        kernel = p["params"]["conv"]["kernel"]
        bias = p["params"]["conv"]["bias"]
        xu = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
        ref = jax.lax.conv_general_dilated(
            xu, kernel, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC")) + bias
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=1e-5, rtol=1e-5)

    def test_depth_augment_channels(self):
        aug = B.DepthAugment()
        d = jnp.array([[[1.0, 0.0], [2.0, 3.0]]])[..., None]  # (1,2,2,1)
        y = aug.apply({}, d)
        assert y.shape == (1, 2, 2, 3)
        y = np.asarray(y)
        # min over valid 3x3 neighborhood of (0,0) is 1.0
        assert y[0, 0, 0, 1] == 1.0
        # residual = min - depth
        np.testing.assert_allclose(y[..., 2], y[..., 1] - y[..., 0])

    def test_depth_augment_all_invalid_neighborhood(self):
        aug = B.DepthAugment()
        d = jnp.zeros((1, 4, 4, 1))
        y = aug.apply({}, d)
        assert np.isfinite(np.asarray(y)).all()

    def test_linear_attention_shape(self):
        attn = B.LinearAttention(heads=2, dim_head=8)
        x = jax.random.normal(jax.random.PRNGKey(0), (2, 4, 4, 16))
        p = attn.init(jax.random.PRNGKey(1), x)
        assert attn.apply(p, x).shape == x.shape

    def test_full_attention_matches_naive(self):
        from pointreggpt_tpu.ops import attention as A

        q = jax.random.normal(jax.random.PRNGKey(0), (2, 9, 2, 8))
        k = jax.random.normal(jax.random.PRNGKey(1), (2, 9, 2, 8))
        v = jax.random.normal(jax.random.PRNGKey(2), (2, 9, 2, 8))
        out = A.multihead_attention(q, k, v, scale=8**-0.5)
        # naive per-element check
        sim = np.einsum("bihd,bjhd->bhij", np.asarray(q) * 8**-0.5,
                        np.asarray(k))
        w = np.exp(sim - sim.max(-1, keepdims=True))
        w = w / w.sum(-1, keepdims=True)
        ref = np.einsum("bhij,bjhd->bihd", w, np.asarray(v))
        np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5)

    def test_full_attention_pallas_fallback_warns(self, monkeypatch):
        """A trace-time Pallas failure must warn once (not silently pass)
        and the XLA fallback must still produce the correct output."""
        import warnings

        from pointreggpt_tpu.ops import attention as A

        q = jax.random.normal(jax.random.PRNGKey(0), (1, 8, 2, 32))
        k = jax.random.normal(jax.random.PRNGKey(1), (1, 8, 2, 32))
        v = jax.random.normal(jax.random.PRNGKey(2), (1, 8, 2, 32))
        ref = A._attention_xla(q, k, v, 32**-0.5)

        def boom(*a, **kw):
            raise ValueError("forced trace-time failure")

        monkeypatch.setattr(A, "_attention_pallas", boom)
        monkeypatch.setattr(A.jax, "default_backend", lambda: "tpu")
        monkeypatch.setattr(A, "_warned_fallbacks", set())
        with pytest.warns(RuntimeWarning, match="Pallas multihead_attention"):
            out = A.multihead_attention(q, k, v, scale=32**-0.5)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=1e-6)
        # warn-once: the second call through the same site stays quiet
        with warnings.catch_warnings():
            warnings.simplefilter("error")
            A.multihead_attention(q, k, v, scale=32**-0.5)

    def test_full_attention_pallas_grad_no_fallback(self, monkeypatch):
        """Differentiating through the Pallas path must use the
        XLA-recompute custom_vjp — NOT trace-fail into the fallback (the
        pre-custom_vjp behavior warned on every training run) — and its
        gradients must equal the XLA reference's."""
        import warnings

        from pointreggpt_tpu.ops import attention as A

        q = jax.random.normal(jax.random.PRNGKey(0), (1, 8, 2, 32))
        k = jax.random.normal(jax.random.PRNGKey(1), (1, 8, 2, 32))
        v = jax.random.normal(jax.random.PRNGKey(2), (1, 8, 2, 32))

        # stand-in Pallas forward (the real kernel needs a TPU): parity
        # with the XLA reference is what the kernel tests pin, so the
        # custom_vjp wiring is what's under test here
        monkeypatch.setattr(
            A, "_attention_pallas",
            lambda q_, k_, v_, s: A._attention_xla(q_, k_, v_, s)
            .astype(q_.dtype))
        monkeypatch.setattr(A.jax, "default_backend", lambda: "tpu")
        monkeypatch.setattr(A, "_warned_fallbacks", set())

        def loss_pallas(q_):
            return jnp.sum(
                A.multihead_attention(q_, k, v, scale=32**-0.5) ** 2)

        def loss_xla(q_):
            return jnp.sum(
                A._attention_xla(q_, k, v, 32**-0.5).astype(q_.dtype) ** 2)

        with warnings.catch_warnings():
            warnings.simplefilter("error")  # any fallback warning fails
            g_pallas = jax.grad(loss_pallas)(q)
        g_xla = jax.grad(loss_xla)(q)
        np.testing.assert_allclose(np.asarray(g_pallas), np.asarray(g_xla),
                                   atol=1e-6)


class TestDiffusionUNet:
    @pytest.fixture(scope="class")
    def model_and_params(self):
        model = DiffusionUNet(dim=8, dim_mults=(1, 2), channels=1)
        x = jnp.zeros((2, 16, 16, 1))
        t = jnp.zeros((2,))
        p = jnp.zeros((2, 4))
        params = model.init(jax.random.PRNGKey(0), x, t, p)
        return model, params

    def test_output_shape(self, model_and_params):
        model, params = model_and_params
        x = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 16, 1))
        y = model.apply(params, x, jnp.array([0.0, 999.0]),
                        jnp.ones((2, 4)) * 100)
        assert y.shape == (2, 16, 16, 1)
        assert y.dtype == jnp.float32

    def test_time_conditioning_changes_output(self, model_and_params):
        model, params = model_and_params
        x = jax.random.normal(jax.random.PRNGKey(2), (1, 16, 16, 1))
        p = jnp.ones((1, 4)) * 100
        y0 = model.apply(params, x, jnp.array([0.0]), p)
        y1 = model.apply(params, x, jnp.array([900.0]), p)
        assert float(jnp.abs(y0 - y1).max()) > 1e-6

    def test_param_conditioning_changes_output(self, model_and_params):
        model, params = model_and_params
        x = jax.random.normal(jax.random.PRNGKey(3), (1, 16, 16, 1))
        t = jnp.array([10.0])
        y0 = model.apply(params, x, t, jnp.ones((1, 4)) * 100)
        y1 = model.apply(params, x, t, jnp.ones((1, 4)) * 500)
        assert float(jnp.abs(y0 - y1).max()) > 1e-6

    def test_jit_compiles(self, model_and_params):
        model, params = model_and_params
        f = jax.jit(lambda pr, x, t, p: model.apply(pr, x, t, p))
        y = f(params, jnp.zeros((2, 16, 16, 1)), jnp.zeros((2,)),
              jnp.zeros((2, 4)))
        assert y.shape == (2, 16, 16, 1)

    def test_bfloat16_compute(self):
        model = DiffusionUNet(dim=8, dim_mults=(1, 2), channels=1,
                              dtype=jnp.bfloat16)
        x = jnp.zeros((1, 16, 16, 1))
        params = model.init(jax.random.PRNGKey(0), x, jnp.zeros((1,)),
                            jnp.zeros((1, 4)))
        y = model.apply(params, x, jnp.zeros((1,)), jnp.zeros((1, 4)))
        assert y.dtype == jnp.float32  # final head in fp32
        # params stay fp32
        leaf = jax.tree_util.tree_leaves(params)[0]
        assert leaf.dtype == jnp.float32

    def test_param_count_full_size(self):
        # full config as the entry scripts build it (dim=64, mults 1,2,4,8);
        # eval_shape avoids compiling the full forward on the 1-core host
        model = DiffusionUNet(dim=64, dim_mults=(1, 2, 4, 8), channels=1)
        x = jnp.zeros((1, 64, 64, 1))  # spatial size doesn't affect params
        params = jax.eval_shape(
            lambda: model.init(jax.random.PRNGKey(0), x, jnp.zeros((1,)),
                               jnp.zeros((1, 4))))
        n = sum(int(np.prod(p.shape))
                for p in jax.tree_util.tree_leaves(params))
        # reference torch model has ~36.7M params; ours must match closely
        assert 30e6 < n < 45e6, n


class TestMaskUNet:
    def test_output_range_and_shape(self):
        model = MaskUNet(dim=8, dim_mults=(1, 2))
        x = jnp.clip(
            jax.random.normal(jax.random.PRNGKey(0), (2, 16, 16, 1)), 0, 1)
        params = model.init(jax.random.PRNGKey(1), x)
        y = model.apply(params, x)
        assert y.shape == (2, 16, 16, 1)
        assert float(y.min()) >= 0.0 and float(y.max()) <= 1.0


class TestNormDtypePlumbing:
    def test_norm_dtype_reaches_every_resblock(self, monkeypatch):
        """Regression for VERDICT r1 weak #4: up-path ResBlocks silently
        dropped ``norm_dtype``, so the flag applied to only half the net."""
        from pointreggpt_tpu.models import unet as unet_mod

        seen = {}
        real = unet_mod.ResnetBlock

        def spy(*args, **kwargs):
            seen[kwargs.get("name")] = kwargs.get("norm_dtype", "MISSING")
            return real(*args, **kwargs)

        monkeypatch.setattr(unet_mod, "ResnetBlock", spy)
        model = DiffusionUNet(dim=8, dim_mults=(1, 2), channels=1,
                              norm_dtype=jnp.bfloat16)
        model.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 1)),
                   jnp.zeros((1,)), jnp.zeros((1, 4)))

        resblocks = [k for k in seen if "block" in k]
        assert len(resblocks) == 2 * 2 + 2 + 2 * 2 + 1  # down/mid/up/final
        bad = {k: v for k, v in seen.items() if v is not jnp.bfloat16}
        assert not bad, f"ResBlocks missing norm_dtype: {bad}"


class TestBakeInferenceParams:
    """bake.bake_inference_params: same math, bf16-ulp-bounded weights.

    The baked forward is NOT bitwise-equal to the in-step path (lax.rsqrt
    is an approximate intrinsic, so isolated weights round one bf16 ulp
    differently — see models/bake.py); outputs must agree to bf16 noise."""

    def _assert_close(self, model, params, baked, *args):
        from pointreggpt_tpu.models.bake import BF16_NOISE_REL

        f = jax.jit(lambda pr, *a: model.apply(pr, *a))
        ya = f(params, *args)
        yb = f(baked, *args)
        assert ya.dtype == yb.dtype
        da = np.abs(np.asarray(ya, np.float32) - np.asarray(yb, np.float32))
        scale = max(float(np.abs(np.asarray(ya, np.float32)).max()), 1e-3)
        assert da.max() <= BF16_NOISE_REL * scale, (da.max(), scale)

    def test_diffusion_unet_bf16_close(self):
        from pointreggpt_tpu.models.bake import bake_inference_params

        # full 4-stage topology: bottleneck attention, Upsample fp32
        # kernels, the works
        model = DiffusionUNet(dim=8, dim_mults=(1, 2, 4, 8), channels=1,
                              dtype=jnp.bfloat16)
        x = jax.random.normal(jax.random.PRNGKey(1), (2, 32, 32, 1))
        t = jnp.array([17.0, 903.0])
        p = jnp.ones((2, 4)) * 250
        params = model.init(jax.random.PRNGKey(0), x, t, p)
        baked = bake_inference_params(params, jnp.bfloat16)
        self._assert_close(model, params, baked, x, t, p)

    def test_mask_unet_bf16_close(self):
        from pointreggpt_tpu.models.bake import bake_inference_params

        model = MaskUNet(dim=8, dim_mults=(1, 2), dtype=jnp.bfloat16)
        x = jnp.clip(
            jax.random.normal(jax.random.PRNGKey(2), (2, 16, 16, 1)), 0, 1)
        params = model.init(jax.random.PRNGKey(3), x)
        baked = bake_inference_params(params, jnp.bfloat16)
        self._assert_close(model, params, baked, x)

    def test_baked_weights_within_one_bf16_ulp_of_instep(self):
        """Every baked weight must be within one bf16 ulp of the value the
        in-step path (jnp standardize -> astype) would have consumed."""
        from pointreggpt_tpu.models.bake import bake_inference_params
        from pointreggpt_tpu.models.blocks import _ws_eps

        model = DiffusionUNet(dim=8, dim_mults=(1, 2, 4, 8), channels=1,
                              dtype=jnp.bfloat16)
        x = jnp.zeros((1, 32, 32, 1))
        params = model.init(jax.random.PRNGKey(0), x, jnp.zeros((1,)),
                            jnp.zeros((1, 4)))
        baked = bake_inference_params(params, jnp.bfloat16)

        def instep(kernel):
            mean = jnp.mean(kernel, axis=(0, 1, 2), keepdims=True)
            var = jnp.var(kernel, axis=(0, 1, 2), keepdims=True)
            return ((kernel - mean) * jax.lax.rsqrt(
                var + _ws_eps(jnp.bfloat16))).astype(jnp.bfloat16)

        checked = 0
        for name, sub in params["params"].items():
            for bname, leaf in sub.items() if isinstance(sub, dict) else ():
                if not (isinstance(leaf, dict) and "proj" in leaf):
                    continue
                want = np.asarray(instep(leaf["proj"]["kernel"]),
                                  np.float32)
                got = np.asarray(baked["params"][name][bname]["proj"]
                                 ["kernel"], np.float32)
                # one bf16 ulp(x) = 2^(floor(log2|x|) - 7) <= |x| * 2^-7
                tol = np.abs(want) * 2**-7 + 1e-12
                assert (np.abs(want - got) <= tol).all(), (name, bname)
                checked += 1
        assert checked > 10

    def test_baked_tree_dtypes(self):
        """Kernels go bf16 except the fp32-consumed ones; the rest is
        untouched (biases/norm scales/embeddings are consumed in fp32)."""
        from pointreggpt_tpu.models.bake import bake_inference_params

        model = DiffusionUNet(dim=8, dim_mults=(1, 2), channels=1,
                              dtype=jnp.bfloat16)
        x = jnp.zeros((1, 16, 16, 1))
        params = model.init(jax.random.PRNGKey(0), x, jnp.zeros((1,)),
                            jnp.zeros((1, 4)))
        baked = bake_inference_params(params, jnp.bfloat16)
        flat = jax.tree_util.tree_flatten_with_path(baked)[0]
        n_bf16 = n_fp32_kernel = 0
        for path, leaf in flat:
            keys = tuple(getattr(k, "key", str(k)) for k in path)
            if keys[-1] == "kernel":
                keep_fp32 = (keys[-2] == "final_conv" or
                             (keys[-2] == "conv" and "upsample" in keys[-3]))
                assert leaf.dtype == (
                    jnp.float32 if keep_fp32 else jnp.bfloat16), keys
                n_bf16 += leaf.dtype == jnp.bfloat16
                n_fp32_kernel += leaf.dtype == jnp.float32
            else:
                assert leaf.dtype == jnp.float32, keys
        assert n_bf16 > 10  # convs + attention + MLPs actually baked
        assert n_fp32_kernel >= 2  # final_conv + at least one upsample

    def test_wsconv_kernels_standardized(self):
        """A baked proj kernel equals the numpy fp32-standardize -> bf16
        cast bit-for-bit (the bake itself is deterministic)."""
        from pointreggpt_tpu.models.bake import bake_inference_params
        from pointreggpt_tpu.models.blocks import _ws_eps

        model = DiffusionUNet(dim=8, dim_mults=(1, 2), channels=1,
                              dtype=jnp.bfloat16)
        x = jnp.zeros((1, 16, 16, 1))
        params = model.init(jax.random.PRNGKey(0), x, jnp.zeros((1,)),
                            jnp.zeros((1, 4)))
        raw = np.asarray(
            params["params"]["mid_block1"]["block1"]["proj"]["kernel"])
        baked = bake_inference_params(params, jnp.bfloat16)
        got = baked["params"]["mid_block1"]["block1"]["proj"]["kernel"]
        mean = raw.mean(axis=(0, 1, 2), keepdims=True, dtype=np.float32)
        var = raw.var(axis=(0, 1, 2), keepdims=True, dtype=np.float32)
        want = ((raw - mean) / np.sqrt(var + np.float32(
            _ws_eps(jnp.bfloat16)))).astype(jnp.dtype(jnp.bfloat16))
        assert np.array_equal(np.asarray(got, np.float32),
                              np.asarray(want, np.float32))

    def test_fp32_bake_rejected(self):
        from pointreggpt_tpu.models.bake import bake_inference_params

        with pytest.raises(ValueError):
            bake_inference_params({}, jnp.float32)

    def test_standardized_count_pinned(self):
        """The bake keys WSConv kernels on the literal 'proj' name; pin the
        exact standardized-kernel count so a Block/WSConv rename fails
        loudly here instead of silently skipping standardization."""
        from pointreggpt_tpu.models.bake import bake_inference_params

        model = DiffusionUNet(dim=8, dim_mults=(1, 2), channels=1,
                              dtype=jnp.bfloat16)
        x = jnp.zeros((1, 16, 16, 1))
        params = model.init(jax.random.PRNGKey(0), x, jnp.zeros((1,)),
                            jnp.zeros((1, 4)))
        flat = jax.tree_util.tree_flatten_with_path(
            bake_inference_params(params, jnp.bfloat16))[0]
        n = sum(1 for path, leaf in flat
                if getattr(path[-1], "key", None) == "kernel"
                and getattr(path[-2], "key", None) == "proj"
                and leaf.dtype == jnp.bfloat16)
        # mults (1,2): 2 down stages x 2 ResBlocks + mid 2 + 2 up stages
        # x 2 + final_res_block = 11 ResBlocks x 2 Blocks = 22 WSConvs
        assert n == 22, n

    def test_zero_wsconv_tree_rejected(self):
        from pointreggpt_tpu.models.bake import bake_inference_params

        with pytest.raises(ValueError, match="naming contract"):
            bake_inference_params(
                {"params": {"dense": {"kernel": np.zeros((4, 4),
                                                         np.float32)}}},
                jnp.bfloat16)
