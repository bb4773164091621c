"""Per-component timing of the generation U-Net forward (batch 8, 256^2).

Times each distinct block shape as a chained scan and compares the sum
against the measured full forward. Components (dims [64,64,128,256,512],
resolutions 256/128/64/32):

  init_conv7   1->64 @256^2
  down ResBlocks: 64@256^2, 64@128^2, 128@64^2, 256@32^2 (x2 each)
  linear attn (PreNorm + fused block + residual) @256/128/64 + up mirror
  downsamples, mid (512@32^2 ResBlocks + full attention)
  up ResBlocks (concat inputs: 128->64@256^2 etc.), final block + Dense

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/profile_unet.py

VARIATION NOTE: inputs are varied by >=1% steps — bf16 cannot
represent 1e-6-relative changes, so smaller steps produce bit-identical
inputs that the axon tunnel memoizes (times collapse to ~0.01 ms).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/pointreggpt_xla"))

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from pointreggpt_tpu.models import DiffusionUNet
from pointreggpt_tpu.models.blocks import (Attention, Downsample,
                                           LinearAttention, PreNormResidual,
                                           ResnetBlock, Upsample)

B = 8
K = 16
DT = jnp.bfloat16


def log(m):
    print(m, file=sys.stderr, flush=True)


def bench_module(name, mod, *shapes, cond_dim=None, reps=3):
    rng = np.random.default_rng(0)
    args = [jnp.asarray(rng.normal(size=s), DT) for s in shapes]
    if cond_dim is not None:
        args.append(jnp.asarray(rng.normal(size=(B, cond_dim)), DT))
    params = mod.init(jax.random.PRNGKey(0), *args)

    @jax.jit
    def chain(eps, params, *args):
        def body(acc, i):
            a0 = (args[0] * (eps + i * 0.01)).astype(DT)
            out = mod.apply(params, a0, *args[1:])
            return acc + jnp.sum(out.astype(jnp.float32)), None
        out, _ = jax.lax.scan(body, 0.0,
                              jnp.arange(K, dtype=jnp.float32))
        return out

    float(chain(jnp.float32(1.0), params, *args))  # warm; force transfer
    ts = []
    for i in range(reps):
        t0 = time.time()
        # float() forces the device->host transfer: block_until_ready alone
        # returned early here (times collapsed to dispatch cost)
        float(chain(jnp.float32(1.0 + 0.01 * (i + 1)), params, *args))
        ts.append(time.time() - t0)
    t = min(ts) / K
    log(f"{name}: {1000*t:.3f} ms")
    return t


class InitConv(nn.Module):
    @nn.compact
    def __call__(self, x):
        return nn.Conv(64, (7, 7), padding="SAME", dtype=DT,
                       name="init_conv")(x)


class FinalDense(nn.Module):
    @nn.compact
    def __call__(self, x):
        return nn.Dense(1, dtype=jnp.float32)(x.astype(jnp.float32))


def main():
    log(f"backend={jax.default_backend()} batch={B}")
    total = 0.0

    total += bench_module("init_conv7 1->64 @256", InitConv(),
                          (B, 256, 256, 1))

    # down path: 2 ResBlocks + attn per stage, then downsample
    for (res, c) in [(256, 64), (128, 64), (64, 128), (32, 256)]:
        t = bench_module(f"down ResBlock {c}@{res} (x2)",
                         ResnetBlock(c, 8, use_cond=True, dtype=DT),
                         (B, res, res, c), cond_dim=512)
        total += 2 * t
        total += bench_module(
            f"down attn {c}@{res}",
            PreNormResidual(LinearAttention(dtype=DT), dtype=DT),
            (B, res, res, c))
    for (res, cin, cout) in [(256, 64, 128), (128, 64, 256), (64, 128, 512)]:
        total += bench_module(f"downsample {cin}->{cout} @{res}",
                              Downsample(cout, dtype=DT), (B, res, res, cin))
    total += bench_module("down3 conv3 256->512 @32",
                          InitConv3x3(512), (B, 32, 32, 256))

    # mid
    t = bench_module("mid ResBlock 512@32 (x2)",
                     ResnetBlock(512, 8, use_cond=True, dtype=DT),
                     (B, 32, 32, 512), cond_dim=512)
    total += 2 * t
    total += bench_module("mid full attn 512@32",
                          PreNormResidual(Attention(dtype=DT), dtype=DT),
                          (B, 32, 32, 512))

    # up path: ResBlocks take concat inputs
    for (res, c_out, c_skip) in [(32, 512, 256), (64, 256, 128),
                                 (128, 128, 64), (256, 64, 64)]:
        t = bench_module(
            f"up ResBlock {c_out + c_skip}->{c_out} @{res} (x2)",
            ResnetBlock(c_out, 8, use_cond=True, dtype=DT),
            (B, res, res, c_out + c_skip), cond_dim=512)
        total += 2 * t
        total += bench_module(
            f"up attn {c_out}@{res}",
            PreNormResidual(LinearAttention(dtype=DT), dtype=DT),
            (B, res, res, c_out))
    for (res, cin, cout) in [(32, 512, 256), (64, 256, 128),
                             (128, 128, 64)]:
        total += bench_module(f"upsample {cin}->{cout} @{res}",
                              Upsample(cout, dtype=DT), (B, res, res, cin))
    total += bench_module("up3 conv3 64->64 @256",
                          InitConv3x3(64), (B, 256, 256, 64))

    total += bench_module("final ResBlock 128->64 @256",
                          ResnetBlock(64, 8, use_cond=True, dtype=DT),
                          (B, 256, 256, 128), cond_dim=512)
    total += bench_module("final Dense 64->1 @256", FinalDense(),
                          (B, 256, 256, 64))

    log(f"component sum: {1000*total:.2f} ms")

    # full forward for comparison
    model = DiffusionUNet(dim=64, param_cond_dim=4, dim_mults=(1, 2, 4, 8),
                          channels=1, dtype=DT)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(B, 256, 256, 1)), jnp.float32)
    tt = jnp.zeros((B,), jnp.float32)
    pc = jnp.zeros((B, 4), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x, tt, pc)

    @jax.jit
    def full_chain(eps, params, x):
        def body(acc, i):
            out = model.apply(params, x * (eps + i * 0.01), tt, pc)
            return acc + jnp.sum(out.astype(jnp.float32)), None
        out, _ = jax.lax.scan(body, 0.0, jnp.arange(K, dtype=jnp.float32))
        return out

    float(full_chain(jnp.float32(1.0), params, x))
    ts = []
    for i in range(3):
        t0 = time.time()
        float(full_chain(jnp.float32(1.0 + 0.01 * (i + 1)), params, x))
        ts.append(time.time() - t0)
    log(f"full U-Net forward: {1000*min(ts)/K:.2f} ms")


class InitConv3x3(nn.Module):
    features: int = 64

    @nn.compact
    def __call__(self, x):
        return nn.Conv(self.features, (3, 3), padding="SAME", dtype=DT)(x)


if __name__ == "__main__":
    main()
