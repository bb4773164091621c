"""ops.linear_attention: XLA core vs naive reference math, Pallas kernel
(interpret mode) vs XLA core, and the custom-vjp gradient path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pointreggpt_tpu.ops import linear_attention as LA

HEADS, D = 4, 32
HIDDEN = HEADS * D


def naive(qkv):
    """Direct transcription of the reference math (sdd:750-768)."""
    b, n, _ = qkv.shape
    x = qkv.reshape(b, n, 3, HEADS, D).astype(jnp.float32)
    q, k, v = x[:, :, 0], x[:, :, 1], x[:, :, 2]
    q = jax.nn.softmax(q, axis=-1) * (D**-0.5)
    k = jax.nn.softmax(k, axis=1)
    v = v / n
    ctx = jnp.einsum("bnhd,bnhe->bhde", k, v)
    out = jnp.einsum("bhde,bnhd->bnhe", ctx, q)
    return out.reshape(b, n, HIDDEN)


@pytest.fixture
def qkv(rng):
    return jnp.asarray(rng.normal(size=(2, 64, 3 * HIDDEN)) * 2.0,
                       jnp.float32)


class TestXLACore:
    def test_matches_naive(self, qkv):
        out = LA._xla_core(qkv, HEADS, D)
        np.testing.assert_allclose(np.asarray(out), np.asarray(naive(qkv)),
                                   atol=1e-5, rtol=1e-5)

    def test_bf16_close(self, qkv):
        out = LA._xla_core(qkv.astype(jnp.bfloat16), HEADS, D)
        ref = np.asarray(naive(qkv))
        assert np.abs(np.asarray(out, np.float32) - ref).max() < 0.02


class TestPallasKernel:
    @pytest.mark.parametrize("n", [64, 256])
    def test_interpret_matches_xla(self, rng, n):
        qkv = jnp.asarray(rng.normal(size=(2, n, 3 * HIDDEN)) * 2.0,
                          jnp.float32)
        out = LA._pallas_core(qkv, HEADS, D, interpret=True)
        ref = LA._xla_core(qkv, HEADS, D)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-5, rtol=2e-5)

    def test_interpret_multichunk(self, rng):
        """n > chunk exercises the online-softmax accumulation across
        chunks (chunk=min(2048, n) so force small n with monkey chunk)."""
        qkv = jnp.asarray(rng.normal(size=(1, 4096, 3 * HIDDEN)),
                          jnp.float32)
        out = LA._pallas_core(qkv, HEADS, D, interpret=True)
        ref = LA._xla_core(qkv, HEADS, D)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-5, rtol=2e-5)

    def test_extreme_values_stable(self):
        """Large k magnitudes: online max-shift must prevent overflow."""
        qkv = jnp.full((1, 64, 3 * HIDDEN), 40.0, jnp.float32)
        out = LA._pallas_core(qkv, HEADS, D, interpret=True)
        assert np.isfinite(np.asarray(out)).all()


class TestGradient:
    def test_custom_vjp_matches_xla_grad(self, qkv):
        def loss_core(a):
            return jnp.sum(LA.linear_attention_core(a, HEADS, D)**2)

        def loss_ref(a):
            return jnp.sum(LA._xla_core(a, HEADS, D)**2)

        g1 = jax.grad(loss_core)(qkv)
        g2 = jax.grad(loss_ref)(qkv)
        np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                                   atol=1e-5, rtol=1e-5)


class TestFusedBlock:
    def _params(self, rng, c):
        w_qkv = jnp.asarray(rng.normal(size=(c, 3 * HIDDEN)) * 0.1,
                            jnp.float32)
        w_out = jnp.asarray(rng.normal(size=(HIDDEN, c)) * 0.1, jnp.float32)
        b_out = jnp.asarray(rng.normal(size=(c,)) * 0.1, jnp.float32)
        g_out = jnp.asarray(rng.uniform(0.5, 1.5, size=(c,)), jnp.float32)
        return w_qkv, w_out, b_out, g_out

    @pytest.mark.parametrize("c,n", [(64, 256), (48, 64)])
    def test_xla_fused_matches_unfused_composition(self, rng, c, n):
        w_qkv, w_out, b_out, g_out = self._params(rng, c)
        x = jnp.asarray(rng.normal(size=(2, n, c)), jnp.float32)
        fused = LA._xla_fused(x, w_qkv, w_out, b_out, g_out, HEADS, D, 1e-5)
        # unfused: dense -> core -> dense -> channel layernorm
        qkv = jnp.dot(x, w_qkv)
        core = LA._xla_core(qkv, HEADS, D)
        out = jnp.dot(core, w_out) + b_out
        mean = jnp.mean(out, axis=-1, keepdims=True)
        var = jnp.var(out, axis=-1, keepdims=True)
        ref = (out - mean) * jax.lax.rsqrt(var + 1e-5) * g_out
        np.testing.assert_allclose(np.asarray(fused), np.asarray(ref),
                                   atol=1e-6)

    @pytest.mark.parametrize("c,n", [(64, 256), (128, 4096)])
    def test_pallas_fused_interpret_matches_xla(self, rng, c, n):
        w_qkv, w_out, b_out, g_out = self._params(rng, c)
        x = jnp.asarray(rng.normal(size=(1, n, c)), jnp.float32)
        got = LA._pallas_fused(x, w_qkv, w_out, b_out, g_out, HEADS, D,
                               1e-5, interpret=True)
        ref = LA._xla_fused(x, w_qkv, w_out, b_out, g_out, HEADS, D, 1e-5)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=2e-5, rtol=2e-5)

    @pytest.mark.parametrize("c,n,b", [(64, 256, 2), (128, 4096, 1),
                                       (256, 2048, 1)])
    def test_pallas_bwd_interpret_matches_autodiff(self, rng, c, n, b):
        """Analytic Pallas backward vs jax.vjp of the XLA composition.

        fp32 everywhere so the in-kernel dtype casts are no-ops and the
        two gradients agree to float tolerance (incl. the exact
        cancellation of the running-max gradient)."""
        w_qkv, w_out, b_out, g_out = self._params(rng, c)
        x = jnp.asarray(rng.normal(size=(b, n, c)), jnp.float32)
        dy = jnp.asarray(rng.normal(size=(b, n, c)), jnp.float32)

        _, vjp = jax.vjp(
            lambda *a: LA._xla_fused(*a, HEADS, D, 1e-5),
            x, w_qkv, w_out, b_out, g_out)
        ref = vjp(dy)

        dxq, dxkv, dwqkv, dwout, dbout, dg = LA._pallas_fused_bwd(
            x, dy, w_qkv, w_out, b_out, g_out, HEADS, D, 1e-5,
            interpret=True)
        got = (dxq + dxkv, dwqkv, dwout, dbout, dg)
        for g_got, g_ref in zip(got, ref):
            np.testing.assert_allclose(np.asarray(g_got), np.asarray(g_ref),
                                       atol=5e-4, rtol=5e-4)

    def test_fused_grads_flow_to_all_params(self, rng):
        c = 64
        w_qkv, w_out, b_out, g_out = self._params(rng, c)
        x = jnp.asarray(rng.normal(size=(1, 64, c)), jnp.float32)

        def loss(x_, a, b_, c_, d_):
            return jnp.sum(LA.fused_linear_attention(
                x_, a, b_, c_, d_, HEADS, D, 1e-5)**2)

        grads = jax.grad(loss, argnums=(0, 1, 2, 3, 4))(
            x, w_qkv, w_out, b_out, g_out)
        for gr in grads:
            assert np.isfinite(np.asarray(gr)).all()
            assert np.abs(np.asarray(gr)).max() > 0
