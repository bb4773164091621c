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
