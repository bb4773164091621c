"""Bake inference params: pre-standardize WSConv kernels, pre-cast to bf16.

Inside the 250-step DDIM sampling scan every U-Net step re-reads the fp32
params, re-standardizes each WSConv kernel (sdd:601-616) and casts the
matmul/conv weights to the compute dtype — all loop-invariant work that
XLA's while-loop LICM does not reliably hoist out of the scan, and fp32
weight reads cost 2x the HBM bytes of the bf16 copies actually consumed.
``bake_inference_params`` performs that work ONCE on the host-side param
tree; ``WSConv`` skips standardization for non-fp32 kernels (a baked kernel
is already standardized), so ``model.apply(baked, ...)`` is bit-identical
to ``model.apply(params, ...)`` by construction:

- WSConv kernels (``Block``'s ``proj``): fp32 standardize -> cast, exactly
  the per-step computation.
- Kernels consumed through ``kernel.astype(compute_dtype)`` (Dense, Conv,
  the attention projections): ``astype`` of a pre-cast array is the
  identity.
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

from pointreggpt_tpu.models.blocks import _ws_eps


def maybe_bake(params: Any, dtype: Any) -> Any:
    """``bake_inference_params`` for non-fp32 ``dtype``; identity for fp32.

    The gate inference drivers use: bake exactly when the model computes in
    a low-precision dtype (where baking is bit-identical AND saves work).
    Runs as one jitted program (eager op-by-op dispatch would cost a
    round-trip per param leaf through the TPU tunnel).
    """
    if dtype == jnp.float32:
        return params
    return _bake_jit(params, dtype)


def bake_inference_params(params: Any, dtype: Any = jnp.bfloat16) -> Any:
    """Return a baked copy of ``params`` for inference at ``dtype``.

    ``params`` is the variable dict from ``model.init`` / a checkpoint
    (with or without the top-level ``"params"`` wrapper). ``dtype`` must be
    the model's compute dtype and must not be fp32: ``WSConv``'s
    skip-standardization gate keys on the kernel dtype, so a pre-standardized
    fp32 kernel would be standardized twice at apply time. Callers running
    fp32 models should skip baking (there is nothing to save).
    """
    if dtype == jnp.float32:
        raise ValueError(
            "bake_inference_params requires a non-fp32 compute dtype "
            "(a baked fp32 WSConv kernel would be re-standardized at "
            "apply); skip baking for fp32 models")
    eps = _ws_eps(dtype)

    def walk(tree, path):
        out = {}
        for key, val in tree.items():
            p = path + (key,)
            if isinstance(val, dict):
                out[key] = walk(val, p)
                continue
            if key == "kernel":
                parent = p[-2]
                if parent == "proj":  # WSConv inside Block
                    mean = jnp.mean(val, axis=(0, 1, 2), keepdims=True)
                    var = jnp.var(val, axis=(0, 1, 2), keepdims=True)
                    out[key] = ((val - mean) *
                                jax.lax.rsqrt(var + eps)).astype(dtype)
                    continue
                if parent == "final_conv":  # fp32 output head
                    out[key] = val
                    continue
                if parent == "conv" and len(p) >= 3 and \
                        "upsample" in p[-3]:  # Upsample sums its kernel fp32
                    out[key] = val
                    continue
                out[key] = val.astype(dtype)
            else:
                out[key] = val
        return out

    return walk(params, ())

_bake_jit = jax.jit(bake_inference_params, static_argnums=1)
