"""Bake inference params: pre-standardize WSConv kernels, pre-cast to bf16.

Inside the 250-step DDIM sampling scan every U-Net step re-reads the fp32
params, re-standardizes each WSConv kernel (sdd:601-616) and casts the
matmul/conv weights to the compute dtype — all loop-invariant work that
XLA's while-loop LICM does not reliably hoist out of the scan, and fp32
weight reads cost 2x the HBM bytes of the bf16 copies actually consumed.
``bake_inference_params`` performs that work ONCE, on host in numpy (fully
deterministic — no XLA fusion in the loop; also halves the param upload);
``WSConv`` skips standardization for non-fp32 kernels (a baked kernel is
already standardized).

Numerical contract: each baked weight equals the fp32 standardization
rounded to bf16, and differs from the weight the per-step path would have
used by AT MOST ONE bf16 ulp — the same quantization-noise class as the
bf16 cast both paths already apply. Bitwise equality with the in-step
path is not achievable even in principle: ``lax.rsqrt`` is an approximate
intrinsic whose last fp32 bits depend on backend and fusion (two
differently-jitted XLA bakes already disagree on isolated elements), so
the bake uses correctly-rounded numpy ``/sqrt`` instead. Forward outputs
agree to bf16 noise (tests pin the bound); DDNM-pinned pixels are exact
regardless (the projection overwrites them with the conditioning).

Per-leaf rules:

- WSConv kernels (``Block``'s ``proj``): fp32 standardize -> bf16 cast
  (round-to-nearest-even, same as XLA ConvertElementType).
- Kernels consumed through ``kernel.astype(compute_dtype)`` (Dense, Conv,
  the attention projections): pre-cast — ``astype`` of a pre-cast array is
  the identity.
- Kernels consumed in fp32 stay fp32: ``final_conv`` (the model's fp32
  output head) and ``Upsample``'s ``conv`` (its 4x4 kernel is *summed* in
  fp32 before the cast — bf16 partial sums would differ).
- Biases, norm scales and embedding tables are untouched (consumed in
  fp32).

Baked trees are INFERENCE-ONLY: gradients through the standardization are
gone and ``astype(bf16)`` loses mantissa, so never feed one to a Trainer.
Applies to both ``DiffusionUNet`` and ``MaskUNet`` (same Block/Upsample
vocabulary).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from pointreggpt_tpu.models.blocks import _ws_eps


def maybe_bake(params: Any, dtype: Any) -> Any:
    """``bake_inference_params`` for non-fp32 ``dtype``; identity for fp32.

    The gate inference drivers use: bake exactly when the model computes in
    a low-precision dtype (where baking preserves outputs AND saves work).
    The bake is numpy: kernel leaves of a device-resident tree transfer to
    host (one D2H per kernel); non-kernel leaves pass through unchanged.
    """
    if dtype == jnp.float32:
        return params
    return bake_inference_params(params, dtype)


def bake_inference_params(params: Any, dtype: Any = jnp.bfloat16) -> Any:
    """Return a baked host copy of ``params`` for inference at ``dtype``.

    ``params`` is the variable dict from ``model.init`` / a checkpoint
    (with or without the top-level ``"params"`` wrapper); leaves may be
    numpy or device arrays (device leaves transfer to host once). ``dtype``
    must be the model's compute dtype and must not be fp32: ``WSConv``'s
    skip-standardization gate keys on the kernel dtype, so a pre-standardized
    fp32 kernel would be standardized twice at apply time. Callers running
    fp32 models should skip baking (there is nothing to save).
    """
    if dtype == jnp.float32:
        raise ValueError(
            "bake_inference_params requires a non-fp32 compute dtype "
            "(a baked fp32 WSConv kernel would be re-standardized at "
            "apply); skip baking for fp32 models")
    eps = np.float32(_ws_eps(dtype))
    np_dtype = jnp.dtype(dtype)  # numpy dtype instance (bf16 via ml_dtypes)
    n_std = [0]

    def walk(tree, path):
        out = {}
        for key, val in tree.items():
            p = path + (key,)
            if isinstance(val, dict):
                out[key] = walk(val, p)
                continue
            if key == "kernel":
                parent = p[-2]
                v = np.asarray(val)
                if parent == "proj":  # WSConv inside Block
                    n_std[0] += 1
                    mean = v.mean(axis=(0, 1, 2), keepdims=True,
                                  dtype=np.float32)
                    var = v.var(axis=(0, 1, 2), keepdims=True,
                                dtype=np.float32)
                    std = (v - mean) / np.sqrt(var + eps)
                    out[key] = std.astype(np_dtype)
                    continue
                if parent == "final_conv":  # fp32 output head
                    out[key] = val
                    continue
                if parent == "conv" and len(p) >= 3 and \
                        "upsample" in p[-3]:  # Upsample sums its kernel fp32
                    out[key] = val
                    continue
                out[key] = v.astype(np_dtype)
            else:
                out[key] = val
        return out

    out = walk(params, ())
    if n_std[0] == 0:
        # the bake keys WSConv kernels on their Flax name ("proj" inside
        # Block) with nothing else enforcing the contract; a rename in
        # blocks.py would otherwise cast WSConv kernels to bf16
        # UNSTANDARDIZED and the dtype-gate in WSConv would silently skip
        # standardization at apply time. Both U-Nets are full of Blocks,
        # so zero standardized kernels always means naming drift.
        raise ValueError(
            "bake_inference_params standardized 0 kernels — no 'proj' "
            "(WSConv) entries found; the Block/WSConv naming contract "
            "has drifted (see models/blocks.py)")
    return out


# Relative bound for baked-vs-unbaked forward agreement used by tests and
# the drive/probe tools: one bf16 ulp per weight accumulates to well under
# this across both U-Nets (measured ~1% worst-case at dim=8; real dim=64
# models average lower).
BF16_NOISE_REL = 0.05
