"""Flax (linen) building blocks for the PointRegGPT U-Nets, NHWC / TPU-first.

Architectural parity with the reference blocks (sdd:583-796, duplicated at
dc:556-802), re-expressed for TPU:

- NHWC layout throughout (XLA's native conv layout on TPU).
- Compute dtype is configurable (bfloat16 for MXU throughput), params stay
  float32; normalizations and softmax accumulate in float32.
- Attention is exposed through :mod:`pointreggpt_tpu.ops.attention` so the
  bottleneck can ride a fused Pallas kernel on TPU with an XLA fallback.

Weight-standardization epsilon follows the reference rule (1e-5 for float32
compute, 1e-3 otherwise; sdd:607).
"""

from __future__ import annotations

import math
from typing import Any, Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

Array = jax.Array
Dtype = Any


def _ws_eps(dtype) -> float:
    return 1e-5 if dtype == jnp.float32 else 1e-3


class WSConv(nn.Module):
    """Weight-standardized 2D convolution (arXiv:1903.10520).

    Kernel is standardized over (kh, kw, in) per output channel before the
    conv; pairs with GroupNorm in ``Block``. Reference:
    WeightStandardizedConv2d sdd:601-616.

    A non-fp32 kernel is already baked (pre-standardized + pre-cast by
    :func:`pointreggpt_tpu.models.bake.bake_inference_params`), so
    standardization is skipped — training params are always fp32, so the
    gate never changes training behavior.
    """

    features: int
    kernel_size: Tuple[int, int] = (3, 3)
    strides: Tuple[int, int] = (1, 1)
    padding: Any = "SAME"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        in_features = x.shape[-1]
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (*self.kernel_size, in_features, self.features),
            jnp.float32,
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,),
                          jnp.float32)
        if kernel.dtype == jnp.float32:
            eps = _ws_eps(self.dtype)
            mean = jnp.mean(kernel, axis=(0, 1, 2), keepdims=True)
            var = jnp.var(kernel, axis=(0, 1, 2), keepdims=True)
            kernel = (kernel - mean) * jax.lax.rsqrt(var + eps)
        y = jax.lax.conv_general_dilated(
            x.astype(self.dtype),
            kernel.astype(self.dtype),
            window_strides=self.strides,
            padding=self.padding,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        return y + bias.astype(self.dtype)


class ChannelLayerNorm(nn.Module):
    """LayerNorm over the channel axis with scale only (no bias).

    Reference: LayerNorm sdd:619-628 (biased variance, eps by dtype).
    """

    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        dim = x.shape[-1]
        g = self.param("g", nn.initializers.ones, (dim,), jnp.float32)
        eps = _ws_eps(self.dtype)
        xf = x.astype(jnp.float32)
        mean = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.var(xf, axis=-1, keepdims=True)
        out = (xf - mean) * jax.lax.rsqrt(var + eps) * g
        return out.astype(self.dtype)


class SinusoidalPosEmb(nn.Module):
    """Transformer sinusoidal embedding of diffusion timesteps.

    Reference: sdd:645-657.
    """

    dim: int

    @nn.compact
    def __call__(self, t: Array) -> Array:
        half = self.dim // 2
        freqs = jnp.exp(
            jnp.arange(half, dtype=jnp.float32) * -(math.log(10000.0) /
                                                    (half - 1)))
        args = t.astype(jnp.float32)[:, None] * freqs[None, :]
        return jnp.concatenate([jnp.sin(args), jnp.cos(args)], axis=-1)


class RandomOrLearnedSinusoidalPosEmb(nn.Module):
    """Random (or learned) Fourier features for timesteps.

    Reference: sdd:660-675 (@crowsonkb). Wired into
    :class:`~pointreggpt_tpu.models.unet.DiffusionUNet` via
    ``learned_sinusoidal_cond`` / ``random_fourier_features`` (sdd:836-843);
    the entry scripts use the plain sinusoidal embedding. Output is
    ``[t, sin, cos]`` -> dim + 1 features.

    ``is_random=True`` freezes the frequencies: torch keeps them as an
    ``nn.Parameter(requires_grad=False)`` (still in the state dict), so we
    keep them in the params tree too and stop the gradient — the optimizer
    update is exactly zero and checkpoint porting stays uniform.
    """

    dim: int
    is_random: bool = False

    @nn.compact
    def __call__(self, t: Array) -> Array:
        assert self.dim % 2 == 0
        half = self.dim // 2
        weights = self.param("weights", nn.initializers.normal(1.0),
                             (half,), jnp.float32)
        if self.is_random:
            weights = jax.lax.stop_gradient(weights)
        t = t.astype(jnp.float32)[:, None]
        freqs = t * weights[None, :] * 2 * math.pi
        return jnp.concatenate([t, jnp.sin(freqs), jnp.cos(freqs)], axis=-1)


class Block(nn.Module):
    """WSConv3x3 -> GroupNorm(8) -> optional (scale+1, shift) -> SiLU.

    Reference: sdd:681-697. GroupNorm statistics are always computed in
    float32 (flax promotes internally); ``norm_dtype`` only controls the
    dtype the normalized activations are materialized in — bf16 halves the
    HBM traffic of the norm/scale-shift/SiLU chain on TPU.
    """

    dim_out: int
    groups: int = 8
    dtype: Dtype = jnp.float32
    norm_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array,
                 scale_shift: Optional[Tuple[Array, Array]] = None) -> Array:
        nd = self.norm_dtype
        x = WSConv(self.dim_out, (3, 3), dtype=self.dtype, name="proj")(x)
        x = nn.GroupNorm(
            num_groups=self.groups, epsilon=1e-5, dtype=nd,
            name="norm")(x.astype(nd))
        if scale_shift is not None:
            scale, shift = scale_shift
            x = x * (scale.astype(nd) + 1.0) + shift.astype(nd)
        return nn.silu(x).astype(self.dtype)


class ResnetBlock(nn.Module):
    """Two conditioned Blocks + 1x1-conv residual.

    The (time, param) embeddings are concatenated, passed through
    SiLU -> Dense(2*dim_out), and split into the scale/shift for block1.
    Reference: sdd:700-734.
    """

    dim_out: int
    groups: int = 8
    use_cond: bool = False
    dtype: Dtype = jnp.float32
    norm_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self,
                 x: Array,
                 cond_emb: Optional[Array] = None) -> Array:
        scale_shift = None
        if self.use_cond and cond_emb is not None:
            h_emb = nn.Dense(
                self.dim_out * 2, dtype=self.dtype, name="mlp")(
                    nn.silu(cond_emb))
            h_emb = h_emb[:, None, None, :]
            scale_shift = jnp.split(h_emb, 2, axis=-1)

        h = Block(self.dim_out, self.groups, self.dtype, self.norm_dtype,
                  name="block1")(x, scale_shift)
        h = Block(self.dim_out, self.groups, self.dtype, self.norm_dtype,
                  name="block2")(h)

        if x.shape[-1] != self.dim_out:
            x = nn.Dense(self.dim_out, dtype=self.dtype, name="res_conv")(x)
        return h + x


class _DenseParams(nn.Module):
    """Declare Dense-compatible params (kernel[, bias]) without the module.

    Lets a fused op consume raw weights while keeping the param tree
    identical to ``nn.Dense`` (same path, names, shapes, init)."""

    shape: Tuple[int, int]
    use_bias: bool = True

    @nn.compact
    def __call__(self):
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            self.shape, jnp.float32)
        if not self.use_bias:
            return kernel, None
        bias = self.param("bias", nn.initializers.zeros,
                          (self.shape[1],), jnp.float32)
        return kernel, bias


class _ScaleParam(nn.Module):
    """ChannelLayerNorm-compatible scale param (``g``)."""

    dim: int

    @nn.compact
    def __call__(self):
        return self.param("g", nn.initializers.ones, (self.dim,),
                          jnp.float32)


class LinearAttention(nn.Module):
    """Linear (kernelized) attention with per-head softmax-q / softmax-k.

    O(n) in sequence length; used at every resolution except the bottleneck.
    Reference: sdd:737-769. The whole block body (qkv projection ->
    softmax core -> out projection -> channel LayerNorm) runs as ONE fused
    Pallas streaming kernel on TPU (ops/linear_attention.py) — none of the
    intermediates touch HBM; XLA fallback elsewhere. Param tree matches the
    unfused Dense/ChannelLayerNorm composition exactly (torch_port
    compatible).
    """

    heads: int = 4
    dim_head: int = 32
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        from pointreggpt_tpu.ops.linear_attention import (
            fused_linear_attention)

        b, h, w, c = x.shape
        n = h * w
        hidden = self.heads * self.dim_head
        w_qkv, _ = _DenseParams((c, hidden * 3), use_bias=False,
                                name="to_qkv")()
        w_out, b_out = _DenseParams((hidden, c), name="to_out")()
        g_out = _ScaleParam(c, name="out_norm")()

        out = fused_linear_attention(
            x.reshape(b, n, c).astype(self.dtype), w_qkv, w_out, b_out,
            g_out, self.heads, self.dim_head, _ws_eps(self.dtype))
        return out.reshape(b, h, w, c)


class Attention(nn.Module):
    """Full softmax attention for the bottleneck grid.

    Reference: sdd:772-796. Dispatches to the fused Pallas kernel on TPU via
    ops.attention (XLA einsum fallback elsewhere).
    """

    heads: int = 4
    dim_head: int = 32
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        from pointreggpt_tpu.ops import attention as attn_ops

        b, h, w, c = x.shape
        n = h * w
        hidden = self.heads * self.dim_head
        qkv = nn.Dense(hidden * 3, use_bias=False, dtype=self.dtype,
                       name="to_qkv")(x)
        qkv = qkv.reshape(b, n, 3, self.heads, self.dim_head)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]  # (b, n, h, d)
        out = attn_ops.multihead_attention(
            q, k, v, scale=self.dim_head**-0.5)
        out = out.reshape(b, h, w, hidden).astype(self.dtype)
        return nn.Dense(c, dtype=self.dtype, name="to_out")(out)


class PreNormResidual(nn.Module):
    """x + fn(ChannelLayerNorm(x)). Reference: Residual/PreNorm sdd:583-639."""

    fn: Callable[[Array], Array]
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        return x + self.fn(ChannelLayerNorm(dtype=self.dtype, name="norm")(x))


class Downsample(nn.Module):
    """Conv 4x4 stride 2 pad 1 (halves spatial dims). Reference: sdd:597-598."""

    dim_out: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        return nn.Conv(
            self.dim_out, (4, 4), strides=(2, 2), padding=((1, 1), (1, 1)),
            dtype=self.dtype, name="conv")(x)


class _ConvParams(nn.Module):
    """Declare nn.Conv-compatible params (kernel, bias) without the module.

    Same path/names/shapes/init as ``nn.Conv`` so checkpoints and the torch
    weight bridge are unaffected when an op consumes the raw weights."""

    shape: Tuple[int, ...]  # (kh, kw, cin, cout)

    @nn.compact
    def __call__(self):
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            self.shape, jnp.float32)
        bias = self.param("bias", nn.initializers.zeros,
                          (self.shape[-1],), jnp.float32)
        return kernel, bias


class Upsample(nn.Module):
    """Nearest 2x upsample + conv 3x3, as ONE input-dilated conv.
    Reference: sdd:592-594.

    ``conv3x3(nearest2x(x))`` = ``conv(x, W (*) ones(2,2), lhs_dilation=2,
    pad 2)``: nearest upsampling is zero-stuffing followed by a 2x2 ones
    filter, and the two convolutions associate into a single 4x4 kernel
    K4[p,q] = sum_{a,b in {0,1}} W[p-a, q-b]. Exact same math (kernel sums
    in fp32), no upsampled intermediate in HBM, and the TPU conv emitter
    handles input dilation natively. Measured at batch 8 (the three U-Net
    upsample shapes): 1.87/1.91/2.12 ms vs 2.11/2.22/3.13 ms for
    repeat+conv, and the 4-subpixel-phase variant loses end-to-end to its
    interleave transpose (61.7 vs 62.9 pairs/min).
    """

    dim_out: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        b, h, w, c = x.shape
        kernel, bias = _ConvParams((3, 3, c, self.dim_out), name="conv")()
        k4r = jnp.pad(kernel, ((0, 1), (0, 0), (0, 0), (0, 0))) + \
            jnp.pad(kernel, ((1, 0), (0, 0), (0, 0), (0, 0)))
        k4 = jnp.pad(k4r, ((0, 0), (0, 1), (0, 0), (0, 0))) + \
            jnp.pad(k4r, ((0, 0), (1, 0), (0, 0), (0, 0)))  # (4,4,c,cout)
        y = jax.lax.conv_general_dilated(
            x.astype(self.dtype), k4.astype(self.dtype), (1, 1),
            padding=((2, 2), (2, 2)), lhs_dilation=(2, 2),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return y + bias.astype(self.dtype)


class DepthAugment(nn.Module):
    """Featurize a depth map as [depth, 3x3-valid-min, min - depth].

    Invalid pixels (== 0) are treated as +inf for the min-pool; if a full
    neighborhood is invalid the raw min-pool value is used instead (keeps the
    gradient graph in the reference; numerically identical here).
    Reference: dc:577-604.

    Input/output: (b, h, w, 1) -> (b, h, w, 3).
    """

    @nn.compact
    def __call__(self, depth: Array, invalid_number: float = 0.0) -> Array:
        from pointreggpt_tpu.core.geometry import min_pool

        d = depth[..., 0]
        d_cln = jnp.where(d == invalid_number, jnp.inf, d)
        min_neighbor = min_pool(d_cln, window=3, stride=1)
        min_neighbor_zero = min_pool(d, window=3, stride=1)
        min_neighbor = jnp.where(
            jnp.isinf(min_neighbor), min_neighbor_zero, min_neighbor)
        residual = min_neighbor - d
        return jnp.stack([d, min_neighbor, residual], axis=-1)


class DepthDownsample(nn.Module):
    """2x min-pool depth downsample preserving invalid zeros.

    Defined for parity (unused by the reference pipelines too, dc:607-624).
    """

    @nn.compact
    def __call__(self, depth: Array, invalid_number: float = 0.0) -> Array:
        from pointreggpt_tpu.core.geometry import min_pool

        d = depth[..., 0]
        d_cln = jnp.where(d == invalid_number, jnp.inf, d)
        down = min_pool(d_cln, window=2, stride=2)
        down_zero = min_pool(d, window=2, stride=2)
        down = jnp.where(jnp.isinf(down), down_zero, down)
        return down[..., None]
