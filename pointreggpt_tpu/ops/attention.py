"""Bottleneck attention: fused Pallas TPU kernel with an XLA fallback.

The diffusion U-Net runs full softmax attention only on the bottleneck grid
(32x32 -> 1024 tokens at 256^2 input; sdd:772-796, 887). That is small enough
to fuse the whole (QK^T -> softmax -> PV) pipeline into one VMEM-resident
Pallas kernel per (batch, head), eliminating the HBM round-trips of the
unfused einsum chain.

``multihead_attention`` picks the Pallas kernel on TPU when shapes allow and
falls back to a float32 XLA einsum path (CPU tests, odd shapes).
"""

from __future__ import annotations

import functools
import warnings

import jax
import jax.numpy as jnp
from jax import lax

Array = jax.Array

_warned_fallbacks: set = set()


def _warn_fallback(site: str, exc: Exception) -> None:
    """Log a swallowed Pallas trace-time failure once per site.

    Same policy as ``ops.linear_attention._warn_fallback``: the try/except
    around the Pallas path only covers *trace-time* errors; compile-time
    failures (scoped-VMEM overflow) are prevented by the explicit ``n <=
    1024`` guard in the dispatch condition. A silent ``pass`` would mask a
    kernel regression as a quiet perf loss, so report the first occurrence
    per call site."""
    if site not in _warned_fallbacks:
        _warned_fallbacks.add(site)
        warnings.warn(
            f"pointreggpt_tpu.ops.attention: Pallas {site} failed at trace "
            f"time ({type(exc).__name__}: {exc}); using the XLA fallback. "
            "This costs performance and may indicate a kernel bug — please "
            "report.", RuntimeWarning)


def _attention_xla(q: Array, k: Array, v: Array, scale: float) -> Array:
    """Reference attention in fp32: softmax(q k^T * scale) v.

    Args:
        q, k, v: (b, n, h, d).

    Returns:
        (b, n, h, d).
    """
    q = q.astype(jnp.float32) * scale
    k = k.astype(jnp.float32)
    v = v.astype(jnp.float32)
    sim = jnp.einsum("bihd,bjhd->bhij", q, k,
                     precision=lax.Precision.HIGHEST)
    attn = jax.nn.softmax(sim, axis=-1)
    return jnp.einsum("bhij,bjhd->bihd", attn, v,
                      precision=lax.Precision.HIGHEST)


def _attention_pallas(q: Array, k: Array, v: Array, scale: float) -> Array:
    """One fused kernel per (batch, head): scores, softmax and PV in VMEM.

    Shapes here are tiny (n ~ 1024, d = 32) so the whole head fits in VMEM;
    no online-softmax tiling is needed — a single-block flash-style kernel.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, n, h, d = q.shape

    def kernel(q_ref, k_ref, v_ref, o_ref):
        qh = q_ref[0].astype(jnp.float32) * scale  # (n, d)
        kh = k_ref[0].astype(jnp.float32)
        vh = v_ref[0].astype(jnp.float32)
        sim = jnp.dot(qh, kh.T, preferred_element_type=jnp.float32)
        sim_max = jnp.max(sim, axis=-1, keepdims=True)
        p = jnp.exp(sim - sim_max)
        denom = jnp.sum(p, axis=-1, keepdims=True)
        out = jnp.dot(p, vh, preferred_element_type=jnp.float32)
        o_ref[0] = (out / denom).astype(o_ref.dtype)

    # layout: (b*h, n, d) so each grid step owns one head
    def to_heads(x):
        return x.transpose(0, 2, 1, 3).reshape(b * h, n, d)

    spec = pl.BlockSpec((1, n, d), lambda i: (i, 0, 0))
    out = pl.pallas_call(
        kernel,
        grid=(b * h,),
        in_specs=[spec, spec, spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((b * h, n, d), q.dtype),
    )(to_heads(q), to_heads(k), to_heads(v))
    return out.reshape(b, h, n, d).transpose(0, 2, 1, 3)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _attention_pallas_ad(q: Array, k: Array, v: Array, scale: float) -> Array:
    """Pallas forward with an XLA-recompute backward.

    ``pallas_call`` is opaque to reverse-mode autodiff, so without a vjp
    rule every *training* trace through the kernel would fail linearization
    and fall back to the XLA path — a spurious RuntimeWarning on each run
    and a lost Pallas forward. The backward recomputes the fp32 XLA
    reference at the same point and takes its vjp: gradients are exactly
    those of ``_attention_xla``, whose forward parity with the kernel is
    pinned by tests (the two forwards agree to fp32 noise, so this is the
    standard recompute-backward pattern, same as ``jax.checkpoint``)."""
    return _attention_pallas(q, k, v, scale)


def _attention_pallas_ad_fwd(q, k, v, scale):
    # module-global lookup of _attention_pallas at call time (tests
    # monkeypatch it to force the fallback path)
    return _attention_pallas(q, k, v, scale), (q, k, v)


def _attention_pallas_ad_bwd(scale, res, g):
    q, k, v = res
    _, vjp = jax.vjp(
        lambda q_, k_, v_: _attention_xla(q_, k_, v_, scale).astype(q_.dtype),
        q, k, v)
    return vjp(g)


_attention_pallas_ad.defvjp(_attention_pallas_ad_fwd, _attention_pallas_ad_bwd)


def multihead_attention(q: Array, k: Array, v: Array, *,
                        scale: float) -> Array:
    """softmax(q k^T * scale) v over (b, n, heads, dim_head) tensors.

    Uses the fused Pallas kernel on TPU backends (lane-aligned shapes),
    otherwise the XLA fp32 fallback. Both paths accumulate in float32.
    """
    n, d = q.shape[1], q.shape[3]
    use_pallas = (
        jax.default_backend() == "tpu"
        and n % 8 == 0
        # the single-block kernel materializes the (n, n) fp32 score matrix
        # in VMEM: 4 MB at n=1024 (the production 32x32 bottleneck), 16 MB+
        # at n >= 2048 — past the scoped-VMEM budget, which only surfaces
        # at COMPILE time (register-spill OOM), outside the try below.
        # Larger grids (e.g. a 2-stage U-Net at 256^2 -> n=16384) take the
        # XLA path, which tiles fine.
        and n <= 1024
        and d in (32, 64, 128)
    )
    if use_pallas:
        try:
            return _attention_pallas_ad(q, k, v, scale)
        except Exception as exc:  # fallback safety net — never silent
            _warn_fallback("multihead_attention", exc)
    return _attention_xla(q, k, v, scale).astype(q.dtype)
