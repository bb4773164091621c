"""FID InceptionV3 feature extractor as a native JAX/XLA program.

Reference: sdd:37-38, 1719-1745 — the reference computes FID activations
with ``pytorch_fid.inception.InceptionV3`` (the TF-ported FID variant of
torchvision's ``inception_v3``) on CUDA. Here the entire feature forward is
a jitted XLA program (NHWC fp32), so FID evaluation runs on the TPU next to
sampling; PyTorch is only (optionally) used to *load* a published weight
file, never to compute.

Architecture (public, Szegedy et al. 2015 as released in torchvision, with
pytorch_fid's three FID modifications):

- ``BasicConv2d`` = bias-free conv + BatchNorm(eps=1e-3, eval mode) + ReLU;
- stem ``Conv2d_1a..4a`` + two 3x3/s2 max-pools;
- ``Mixed_5b/5c/5d`` (InceptionA), ``Mixed_6a`` (B), ``Mixed_6b..6e`` (C),
  ``Mixed_7a`` (D), ``Mixed_7b/7c`` (E), global average pool -> 2048-d;
- FID variants: the 3x3/s1/p1 average pools in A/C and in ``Mixed_7b``
  exclude the zero padding from the divisor (torch
  ``count_include_pad=False``); ``Mixed_7c``'s pool branch is a max-pool.

Parameters are a flat ``{torch_module_name: {kernel, scale, bias, mean,
var}}`` dict keyed exactly like the pytorch_fid / torchvision state dicts
(``Conv2d_1a_3x3``, ``Mixed_5b.branch1x1``, ...), which makes
:func:`port_inception` a mechanical walk over ``*.conv.weight`` entries.
"""

from __future__ import annotations

from typing import Dict, Mapping, Tuple

import jax
import jax.numpy as jnp
import numpy as np

# ---------------------------------------------------------------------------
# Conv spec: name -> (c_in, c_out, (kh, kw)). Stride/padding are structural
# and live at the call sites in `features`. Used for random init (tests)
# and for validating ported weight shapes.

_A = lambda p, cin, pool: {  # noqa: E731 - table builder
    f"{p}.branch1x1": (cin, 64, (1, 1)),
    f"{p}.branch5x5_1": (cin, 48, (1, 1)),
    f"{p}.branch5x5_2": (48, 64, (5, 5)),
    f"{p}.branch3x3dbl_1": (cin, 64, (1, 1)),
    f"{p}.branch3x3dbl_2": (64, 96, (3, 3)),
    f"{p}.branch3x3dbl_3": (96, 96, (3, 3)),
    f"{p}.branch_pool": (cin, pool, (1, 1)),
}
_B = lambda p, cin: {  # noqa: E731
    f"{p}.branch3x3": (cin, 384, (3, 3)),
    f"{p}.branch3x3dbl_1": (cin, 64, (1, 1)),
    f"{p}.branch3x3dbl_2": (64, 96, (3, 3)),
    f"{p}.branch3x3dbl_3": (96, 96, (3, 3)),
}
_C = lambda p, cin, c7: {  # noqa: E731
    f"{p}.branch1x1": (cin, 192, (1, 1)),
    f"{p}.branch7x7_1": (cin, c7, (1, 1)),
    f"{p}.branch7x7_2": (c7, c7, (1, 7)),
    f"{p}.branch7x7_3": (c7, 192, (7, 1)),
    f"{p}.branch7x7dbl_1": (cin, c7, (1, 1)),
    f"{p}.branch7x7dbl_2": (c7, c7, (7, 1)),
    f"{p}.branch7x7dbl_3": (c7, c7, (1, 7)),
    f"{p}.branch7x7dbl_4": (c7, c7, (7, 1)),
    f"{p}.branch7x7dbl_5": (c7, 192, (1, 7)),
    f"{p}.branch_pool": (cin, 192, (1, 1)),
}
_D = lambda p, cin: {  # noqa: E731
    f"{p}.branch3x3_1": (cin, 192, (1, 1)),
    f"{p}.branch3x3_2": (192, 320, (3, 3)),
    f"{p}.branch7x7x3_1": (cin, 192, (1, 1)),
    f"{p}.branch7x7x3_2": (192, 192, (1, 7)),
    f"{p}.branch7x7x3_3": (192, 192, (7, 1)),
    f"{p}.branch7x7x3_4": (192, 192, (3, 3)),
}
_E = lambda p, cin: {  # noqa: E731
    f"{p}.branch1x1": (cin, 320, (1, 1)),
    f"{p}.branch3x3_1": (cin, 384, (1, 1)),
    f"{p}.branch3x3_2a": (384, 384, (1, 3)),
    f"{p}.branch3x3_2b": (384, 384, (3, 1)),
    f"{p}.branch3x3dbl_1": (cin, 448, (1, 1)),
    f"{p}.branch3x3dbl_2": (448, 384, (3, 3)),
    f"{p}.branch3x3dbl_3a": (384, 384, (1, 3)),
    f"{p}.branch3x3dbl_3b": (384, 384, (3, 1)),
    f"{p}.branch_pool": (cin, 192, (1, 1)),
}

CONV_SPECS: Dict[str, Tuple[int, int, Tuple[int, int]]] = {
    "Conv2d_1a_3x3": (3, 32, (3, 3)),
    "Conv2d_2a_3x3": (32, 32, (3, 3)),
    "Conv2d_2b_3x3": (32, 64, (3, 3)),
    "Conv2d_3b_1x1": (64, 80, (1, 1)),
    "Conv2d_4a_3x3": (80, 192, (3, 3)),
    **_A("Mixed_5b", 192, 32), **_A("Mixed_5c", 256, 64),
    **_A("Mixed_5d", 288, 64),
    **_B("Mixed_6a", 288),
    **_C("Mixed_6b", 768, 128), **_C("Mixed_6c", 768, 160),
    **_C("Mixed_6d", 768, 160), **_C("Mixed_6e", 768, 192),
    **_D("Mixed_7a", 768),
    **_E("Mixed_7b", 1280), **_E("Mixed_7c", 2048),
}

FEATURE_DIM = 2048
_BN_EPS = 1e-3


# ---------------------------------------------------------------------------
# Parameter construction


def _np32(t) -> np.ndarray:
    if hasattr(t, "detach"):
        t = t.detach().cpu().numpy()
    return np.asarray(t, dtype=np.float32)


def port_inception(state_dict: Mapping) -> Dict[str, Dict[str, np.ndarray]]:
    """torch state dict (pytorch_fid / torchvision ``inception_v3``) ->
    params.

    Walks every ``<name>.conv.weight`` entry (OIHW -> HWIO) plus its
    sibling BatchNorm stats; ``AuxLogits``/``fc`` entries are ignored (the
    FID feature path never reaches them). Validates the result against
    :data:`CONV_SPECS`.
    """
    params: Dict[str, Dict[str, np.ndarray]] = {}
    for key in state_dict:
        if not key.endswith(".conv.weight") or key.startswith("AuxLogits"):
            continue
        name = key[:-len(".conv.weight")]
        params[name] = {
            "kernel": _np32(state_dict[key]).transpose(2, 3, 1, 0),
            "scale": _np32(state_dict[f"{name}.bn.weight"]),
            "bias": _np32(state_dict[f"{name}.bn.bias"]),
            "mean": _np32(state_dict[f"{name}.bn.running_mean"]),
            "var": _np32(state_dict[f"{name}.bn.running_var"]),
        }
    missing = sorted(set(CONV_SPECS) - set(params))
    if missing:
        raise ValueError(f"state dict missing inception convs: {missing}")
    for name, (cin, cout, k) in CONV_SPECS.items():
        got = params[name]["kernel"].shape
        want = (*k, cin, cout)
        if got != want:
            raise ValueError(
                f"inception conv {name}: kernel {got}, expected {want}")
    return params


def init_random_params(seed: int = 0) -> Dict[str, Dict[str, np.ndarray]]:
    """Random fp32 params with the exact production shapes (for tests)."""
    rng = np.random.default_rng(seed)
    params = {}
    for name, (cin, cout, k) in CONV_SPECS.items():
        fan_in = cin * k[0] * k[1]
        params[name] = {
            "kernel": rng.normal(
                0, fan_in ** -0.5, (*k, cin, cout)).astype(np.float32),
            "scale": rng.uniform(0.5, 1.5, cout).astype(np.float32),
            "bias": rng.normal(0, 0.1, cout).astype(np.float32),
            "mean": rng.normal(0, 0.1, cout).astype(np.float32),
            "var": rng.uniform(0.5, 1.5, cout).astype(np.float32),
        }
    return params


# ---------------------------------------------------------------------------
# Forward


def _bconv(params, name: str, x, stride=(1, 1), padding=(0, 0)):
    """BasicConv2d: bias-free conv -> eval-mode BatchNorm -> ReLU.

    Precision is pinned fp32: TPU convs default to bf16 inputs and 94
    stacked convs would drift FID features away from the fp32 torch
    reference (same rule as the geometry matmuls, CLAUDE.md).
    """
    p = params[name]
    pad = [(padding[0], padding[0]), (padding[1], padding[1])]
    y = jax.lax.conv_general_dilated(
        x, jnp.asarray(p["kernel"]), stride, pad,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=jax.lax.Precision.HIGHEST)
    # jnp math (not np) so params can be traced jit ARGUMENTS — closing
    # over the ~24M-param tree would bake ~95 MB of HLO constants into the
    # compile payload (the CLAUDE.md HTTP-413 tunnel hazard)
    inv = p["scale"] * jax.lax.rsqrt(jnp.asarray(p["var"]) + _BN_EPS)
    return jax.nn.relu(y * inv + (p["bias"] - p["mean"] * inv))


def _max_pool3(x, stride: int):
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, stride, stride, 1),
        "VALID" if stride == 2 else [(0, 0), (1, 1), (1, 1), (0, 0)])


def _avg_pool3(x, exclude_pad: bool):
    """3x3/s1/p1 average pool. ``exclude_pad=True`` divides by the number
    of in-bounds taps (torch ``count_include_pad=False`` — the pytorch_fid
    FID modification in InceptionA/C/E_1); False divides by 9 (torchvision
    ``inception_v3`` semantics)."""
    window = (1, 3, 3, 1)
    pad = [(0, 0), (1, 1), (1, 1), (0, 0)]
    total = jax.lax.reduce_window(x, 0.0, jax.lax.add, window, (1,) * 4, pad)
    if not exclude_pad:
        return total / 9.0
    ones = jnp.ones((1, x.shape[1], x.shape[2], 1), x.dtype)
    count = jax.lax.reduce_window(ones, 0.0, jax.lax.add, window, (1,) * 4,
                                  pad)
    return total / count


def _inception_a(params, pfx: str, x, fid_pools: bool):
    b1 = _bconv(params, f"{pfx}.branch1x1", x)
    b5 = _bconv(params, f"{pfx}.branch5x5_1", x)
    b5 = _bconv(params, f"{pfx}.branch5x5_2", b5, padding=(2, 2))
    b3 = _bconv(params, f"{pfx}.branch3x3dbl_1", x)
    b3 = _bconv(params, f"{pfx}.branch3x3dbl_2", b3, padding=(1, 1))
    b3 = _bconv(params, f"{pfx}.branch3x3dbl_3", b3, padding=(1, 1))
    bp = _bconv(params, f"{pfx}.branch_pool", _avg_pool3(x, fid_pools))
    return jnp.concatenate([b1, b5, b3, bp], axis=-1)


def _inception_b(params, pfx: str, x):
    b3 = _bconv(params, f"{pfx}.branch3x3", x, stride=(2, 2))
    bd = _bconv(params, f"{pfx}.branch3x3dbl_1", x)
    bd = _bconv(params, f"{pfx}.branch3x3dbl_2", bd, padding=(1, 1))
    bd = _bconv(params, f"{pfx}.branch3x3dbl_3", bd, stride=(2, 2))
    return jnp.concatenate([b3, bd, _max_pool3(x, 2)], axis=-1)


def _inception_c(params, pfx: str, x, fid_pools: bool):
    b1 = _bconv(params, f"{pfx}.branch1x1", x)
    b7 = _bconv(params, f"{pfx}.branch7x7_1", x)
    b7 = _bconv(params, f"{pfx}.branch7x7_2", b7, padding=(0, 3))
    b7 = _bconv(params, f"{pfx}.branch7x7_3", b7, padding=(3, 0))
    bd = _bconv(params, f"{pfx}.branch7x7dbl_1", x)
    bd = _bconv(params, f"{pfx}.branch7x7dbl_2", bd, padding=(3, 0))
    bd = _bconv(params, f"{pfx}.branch7x7dbl_3", bd, padding=(0, 3))
    bd = _bconv(params, f"{pfx}.branch7x7dbl_4", bd, padding=(3, 0))
    bd = _bconv(params, f"{pfx}.branch7x7dbl_5", bd, padding=(0, 3))
    bp = _bconv(params, f"{pfx}.branch_pool", _avg_pool3(x, fid_pools))
    return jnp.concatenate([b1, b7, bd, bp], axis=-1)


def _inception_d(params, pfx: str, x):
    b3 = _bconv(params, f"{pfx}.branch3x3_1", x)
    b3 = _bconv(params, f"{pfx}.branch3x3_2", b3, stride=(2, 2))
    b7 = _bconv(params, f"{pfx}.branch7x7x3_1", x)
    b7 = _bconv(params, f"{pfx}.branch7x7x3_2", b7, padding=(0, 3))
    b7 = _bconv(params, f"{pfx}.branch7x7x3_3", b7, padding=(3, 0))
    b7 = _bconv(params, f"{pfx}.branch7x7x3_4", b7, stride=(2, 2))
    return jnp.concatenate([b3, b7, _max_pool3(x, 2)], axis=-1)


def _inception_e(params, pfx: str, x, pool: str, fid_pools: bool):
    b1 = _bconv(params, f"{pfx}.branch1x1", x)
    b3 = _bconv(params, f"{pfx}.branch3x3_1", x)
    b3 = jnp.concatenate([
        _bconv(params, f"{pfx}.branch3x3_2a", b3, padding=(0, 1)),
        _bconv(params, f"{pfx}.branch3x3_2b", b3, padding=(1, 0)),
    ], axis=-1)
    bd = _bconv(params, f"{pfx}.branch3x3dbl_1", x)
    bd = _bconv(params, f"{pfx}.branch3x3dbl_2", bd, padding=(1, 1))
    bd = jnp.concatenate([
        _bconv(params, f"{pfx}.branch3x3dbl_3a", bd, padding=(0, 1)),
        _bconv(params, f"{pfx}.branch3x3dbl_3b", bd, padding=(1, 0)),
    ], axis=-1)
    pooled = _avg_pool3(x, fid_pools) if pool == "avg" \
        else _max_pool3(x, 1)
    bp = _bconv(params, f"{pfx}.branch_pool", pooled)
    return jnp.concatenate([b1, b3, bd, bp], axis=-1)


def features(params, images01, resize_to: int = 299,
             fid_pools: bool = True):
    """(n, h, w, 1|3) images in [0, 1] -> (n, 2048) pool3 activations.

    Matches pytorch_fid's preprocessing: bilinear resize (half-pixel
    centers, no antialias — torch ``F.interpolate(align_corners=False)``)
    to 299x299 then scale to [-1, 1] (sdd: pytorch_fid resize_input /
    normalize_input defaults).

    ``fid_pools=True`` uses pytorch_fid's modified pools (for its
    TF-ported FID weights); ``False`` uses plain torchvision
    ``inception_v3`` pool semantics (count_include_pad avg everywhere,
    avg in Mixed_7c) so torchvision-sourced weights run through the
    architecture they were trained in.
    """
    x = jnp.asarray(images01, jnp.float32)
    if x.shape[-1] == 1:
        x = jnp.repeat(x, 3, axis=-1)
    if x.shape[1:3] != (resize_to, resize_to):
        x = jax.image.resize(
            x, (x.shape[0], resize_to, resize_to, x.shape[-1]),
            method="bilinear", antialias=False)
    x = x * 2.0 - 1.0

    x = _bconv(params, "Conv2d_1a_3x3", x, stride=(2, 2))
    x = _bconv(params, "Conv2d_2a_3x3", x)
    x = _bconv(params, "Conv2d_2b_3x3", x, padding=(1, 1))
    x = _max_pool3(x, 2)
    x = _bconv(params, "Conv2d_3b_1x1", x)
    x = _bconv(params, "Conv2d_4a_3x3", x)
    x = _max_pool3(x, 2)
    for pfx in ("Mixed_5b", "Mixed_5c", "Mixed_5d"):
        x = _inception_a(params, pfx, x, fid_pools)
    x = _inception_b(params, "Mixed_6a", x)
    for pfx in ("Mixed_6b", "Mixed_6c", "Mixed_6d", "Mixed_6e"):
        x = _inception_c(params, pfx, x, fid_pools)
    x = _inception_d(params, "Mixed_7a", x)
    x = _inception_e(params, "Mixed_7b", x, pool="avg",
                     fid_pools=fid_pools)
    x = _inception_e(params, "Mixed_7c", x,
                     pool="max" if fid_pools else "avg",
                     fid_pools=fid_pools)
    return jnp.mean(x, axis=(1, 2))
