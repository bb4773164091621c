"""The two PointRegGPT U-Nets as Flax modules (NHWC, dtype-polymorphic).

- :class:`DiffusionUNet`: the depth-inpainting denoiser, conditioned on the
  diffusion timestep and the 4-vector (fx, fy, cx, cy) camera intrinsics.
  Reference: Unet sdd:802-964. Note the reference's ``img_cond`` forward arg
  is *never used by the network* (conditioning happens via DDNM projection at
  sampling time, SURVEY.md §2.3) — it is omitted here.
- :class:`MaskUNet`: same topology without conditioning; input featurized by
  DepthAugment, output squashed by a sigmoid into a per-pixel keep
  probability. Reference: dc:807-906.

Default dims (entry scripts): dim=64, dim_mults=(1,2,4,8) -> channel stack
[64, 64, 128, 256, 512], attention bottleneck at 1/8 resolution.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from pointreggpt_tpu.models.blocks import (
    Attention,
    Block,
    ChannelLayerNorm,
    DepthAugment,
    Downsample,
    LinearAttention,
    PreNormResidual,
    RandomOrLearnedSinusoidalPosEmb,
    ResnetBlock,
    SinusoidalPosEmb,
    Upsample,
    WSConv,
)

Array = jax.Array
Dtype = Any


class DiffusionUNet(nn.Module):
    """Depth-inpainting diffusion denoiser.

    Args:
        dim: base channel width (64 in all entry scripts).
        param_cond_dim: length of the intrinsics conditioning vector (4).
        dim_mults: per-stage channel multipliers.
        channels: image channels (1 = depth).
        resnet_block_groups: GroupNorm groups.
        dtype: compute dtype (bfloat16 for TPU throughput; params fp32).
    """

    dim: int = 64
    param_cond_dim: int = 4
    init_dim: Optional[int] = None
    out_dim: Optional[int] = None
    dim_mults: Sequence[int] = (1, 2, 4, 8)
    channels: int = 1
    resnet_block_groups: int = 8
    # optional conditioning surface (sdd:811-815, dead in every entry
    # script but part of the reference component): 2x-channel out head for
    # a learned variance, and Fourier-feature time embeddings (learned or
    # frozen-random, sdd:836-843)
    learned_variance: bool = False
    learned_sinusoidal_cond: bool = False
    random_fourier_features: bool = False
    learned_sinusoidal_dim: int = 16
    dtype: Dtype = jnp.float32
    norm_dtype: Dtype = jnp.float32  # bf16 halves norm-chain HBM traffic
    remat: bool = False  # rematerialize ResnetBlocks (training memory)

    @nn.compact
    def __call__(self, x: Array, time: Array, param_cond: Array) -> Array:
        """Denoise.

        Args:
            x: (b, h, w, channels) noisy image in [-1, 1] space.
            time: (b,) int/float timesteps.
            param_cond: (b, param_cond_dim) intrinsics vector.

        Returns:
            (b, h, w, out_dim) prediction (x0 for the entry configs).
        """
        init_dim = self.init_dim or self.dim
        # learned_variance doubles the out head (sdd:911-912)
        out_dim = self.out_dim or self.channels * (
            2 if self.learned_variance else 1)
        dims = [init_dim] + [self.dim * m for m in self.dim_mults]
        in_out = list(zip(dims[:-1], dims[1:]))
        groups = self.resnet_block_groups
        # jax.checkpoint on every residual block trades ~30% extra FLOPs for
        # activation memory, unlocking the reference's batch-32 training at
        # 256^2 on a 16GB chip.
        ResBlock = nn.remat(ResnetBlock) if self.remat else ResnetBlock
        time_dim = self.dim * 4
        param_dim = self.dim * 4

        # time embedding: sinusoidal -> Dense -> GELU(exact) -> Dense;
        # Fourier-feature variant behind the two flags (sdd:836-843)
        if self.learned_sinusoidal_cond or self.random_fourier_features:
            t = RandomOrLearnedSinusoidalPosEmb(
                self.learned_sinusoidal_dim,
                is_random=self.random_fourier_features,
                name="time_pos_emb")(time)
        else:
            t = SinusoidalPosEmb(self.dim, name="time_pos_emb")(time)
        t = nn.Dense(time_dim, dtype=self.dtype, name="time_mlp_1")(t)
        t = nn.gelu(t, approximate=False)
        t = nn.Dense(time_dim, dtype=self.dtype, name="time_mlp_2")(t)

        # param embedding: Dense -> GELU(exact) -> Dense
        p = nn.Dense(param_dim, dtype=self.dtype, name="param_mlp_1")(
            param_cond.astype(self.dtype))
        p = nn.gelu(p, approximate=False)
        p = nn.Dense(param_dim, dtype=self.dtype, name="param_mlp_2")(p)

        cond = jnp.concatenate([t, p], axis=-1)

        x = nn.Conv(init_dim, (7, 7), padding="SAME", dtype=self.dtype,
                    name="init_conv")(x.astype(self.dtype))
        r = x

        hs = []
        num_res = len(in_out)
        for i, (dim_in, dim_out_i) in enumerate(in_out):
            is_last = i >= num_res - 1
            x = ResBlock(dim_in, groups, use_cond=True, dtype=self.dtype,
                         norm_dtype=self.norm_dtype,
                            name=f"down_{i}_block1")(x, cond)
            hs.append(x)
            x = ResBlock(dim_in, groups, use_cond=True, dtype=self.dtype,
                         norm_dtype=self.norm_dtype,
                            name=f"down_{i}_block2")(x, cond)
            x = PreNormResidual(
                LinearAttention(dtype=self.dtype, name=f"down_{i}_attn_inner"),
                dtype=self.dtype, name=f"down_{i}_attn")(x)
            hs.append(x)
            if not is_last:
                x = Downsample(dim_out_i, dtype=self.dtype,
                               name=f"down_{i}_downsample")(x)
            else:
                x = nn.Conv(dim_out_i, (3, 3), padding="SAME",
                            dtype=self.dtype, name=f"down_{i}_downsample")(x)

        mid_dim = dims[-1]
        x = ResBlock(mid_dim, groups, use_cond=True, dtype=self.dtype,
                         norm_dtype=self.norm_dtype,
                        name="mid_block1")(x, cond)
        x = PreNormResidual(
            Attention(dtype=self.dtype, name="mid_attn_inner"),
            dtype=self.dtype, name="mid_attn")(x)
        x = ResBlock(mid_dim, groups, use_cond=True, dtype=self.dtype,
                         norm_dtype=self.norm_dtype,
                        name="mid_block2")(x, cond)

        for i, (dim_in, dim_out_i) in enumerate(reversed(in_out)):
            is_last = i == len(in_out) - 1
            x = jnp.concatenate([x, hs.pop()], axis=-1)
            x = ResBlock(dim_out_i, groups, use_cond=True, dtype=self.dtype,
                         norm_dtype=self.norm_dtype,
                            name=f"up_{i}_block1")(x, cond)
            x = jnp.concatenate([x, hs.pop()], axis=-1)
            x = ResBlock(dim_out_i, groups, use_cond=True, dtype=self.dtype,
                         norm_dtype=self.norm_dtype,
                            name=f"up_{i}_block2")(x, cond)
            x = PreNormResidual(
                LinearAttention(dtype=self.dtype, name=f"up_{i}_attn_inner"),
                dtype=self.dtype, name=f"up_{i}_attn")(x)
            if not is_last:
                x = Upsample(dim_in, dtype=self.dtype,
                             name=f"up_{i}_upsample")(x)
            else:
                x = nn.Conv(dim_in, (3, 3), padding="SAME", dtype=self.dtype,
                            name=f"up_{i}_upsample")(x)

        x = jnp.concatenate([x, r], axis=-1)
        x = ResBlock(self.dim, groups, use_cond=True, dtype=self.dtype,
                         norm_dtype=self.norm_dtype,
                        name="final_res_block")(x, cond)
        x = nn.Dense(out_dim, dtype=jnp.float32, name="final_conv")(
            x.astype(jnp.float32))
        return x


class MaskUNet(nn.Module):
    """Depth-correction mask network: DepthAugment -> U-Net -> sigmoid.

    Input: (b, h, w, 1) depth in [0, 1] model units. Output: (b, h, w, 1)
    per-pixel keep probability; penetrating pixels score low and are zeroed
    by callers at threshold 0.99. Reference: MaskUnet dc:807-906.
    """

    dim: int = 64
    init_dim: Optional[int] = None
    out_dim: int = 1
    dim_mults: Sequence[int] = (1, 2, 4, 8)
    resnet_block_groups: int = 8
    dtype: Dtype = jnp.float32
    remat: bool = False

    @nn.compact
    def __call__(self, x: Array) -> Array:
        init_dim = self.init_dim or self.dim
        dims = [init_dim] + [self.dim * m for m in self.dim_mults]
        in_out = list(zip(dims[:-1], dims[1:]))
        groups = self.resnet_block_groups
        ResBlock = nn.remat(ResnetBlock) if self.remat else ResnetBlock

        x = DepthAugment(name="init_aug")(x)
        x = nn.Conv(init_dim, (7, 7), padding="SAME", dtype=self.dtype,
                    name="init_conv")(x.astype(self.dtype))
        r = x

        hs = []
        num_res = len(in_out)
        for i, (dim_in, dim_out_i) in enumerate(in_out):
            is_last = i >= num_res - 1
            x = ResBlock(dim_in, groups, dtype=self.dtype,
                            name=f"down_{i}_block1")(x)
            hs.append(x)
            x = ResBlock(dim_in, groups, dtype=self.dtype,
                            name=f"down_{i}_block2")(x)
            x = PreNormResidual(
                LinearAttention(dtype=self.dtype, name=f"down_{i}_attn_inner"),
                dtype=self.dtype, name=f"down_{i}_attn")(x)
            hs.append(x)
            if not is_last:
                x = Downsample(dim_out_i, dtype=self.dtype,
                               name=f"down_{i}_downsample")(x)
            else:
                x = nn.Conv(dim_out_i, (3, 3), padding="SAME",
                            dtype=self.dtype, name=f"down_{i}_downsample")(x)

        mid_dim = dims[-1]
        x = ResBlock(mid_dim, groups, dtype=self.dtype,
                        name="mid_block1")(x)
        x = PreNormResidual(
            Attention(dtype=self.dtype, name="mid_attn_inner"),
            dtype=self.dtype, name="mid_attn")(x)
        x = ResBlock(mid_dim, groups, dtype=self.dtype,
                        name="mid_block2")(x)

        for i, (dim_in, dim_out_i) in enumerate(reversed(in_out)):
            is_last = i == len(in_out) - 1
            x = jnp.concatenate([x, hs.pop()], axis=-1)
            x = ResBlock(dim_out_i, groups, dtype=self.dtype,
                            name=f"up_{i}_block1")(x)
            x = jnp.concatenate([x, hs.pop()], axis=-1)
            x = ResBlock(dim_out_i, groups, dtype=self.dtype,
                            name=f"up_{i}_block2")(x)
            x = PreNormResidual(
                LinearAttention(dtype=self.dtype, name=f"up_{i}_attn_inner"),
                dtype=self.dtype, name=f"up_{i}_attn")(x)
            if not is_last:
                x = Upsample(dim_in, dtype=self.dtype,
                             name=f"up_{i}_upsample")(x)
            else:
                x = nn.Conv(dim_in, (3, 3), padding="SAME", dtype=self.dtype,
                            name=f"up_{i}_upsample")(x)

        x = jnp.concatenate([x, r], axis=-1)
        x = ResBlock(self.dim, groups, dtype=self.dtype,
                        name="final_res_block")(x)
        x = nn.Dense(self.out_dim, dtype=jnp.float32, name="final_conv")(
            x.astype(jnp.float32))
        return nn.sigmoid(x)
