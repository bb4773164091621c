"""Bridge published PyTorch checkpoints into our Flax parameter trees.

The reference releases ``model-*.pt`` torch checkpoints ({step, model, opt,
ema, scaler}, sdd:1685-1699) and ``depth_correction_results/model-best.pt``
({epoch, model, ...}, dc:1189-1207). This module converts those state dicts
into ``DiffusionUNet`` / ``MaskUNet`` parameter trees so generated outputs
can be validated against the reference within RMSE tolerance (SURVEY.md §7
"weight-format bridge").

Layout conversions:
- torch Conv2d OIHW  -> flax HWIO (transpose 2,3,1,0)
- torch Linear (o,i) -> flax Dense (i,o)
- torch 1x1 Conv2d   -> flax Dense (squeeze spatial, transpose)
Name mapping follows the reference module tree (Unet sdd:802-918, MaskUnet
dc:807-869) onto our explicit flax module names (models/unet.py).
"""

from __future__ import annotations

from typing import Any, Dict, Mapping, Sequence

import numpy as np


def _np(t) -> np.ndarray:
    if hasattr(t, "detach"):
        t = t.detach().cpu().numpy()
    return np.asarray(t, dtype=np.float32)


def _conv(sd: Mapping, name: str) -> Dict[str, np.ndarray]:
    out = {"kernel": _np(sd[f"{name}.weight"]).transpose(2, 3, 1, 0)}
    if f"{name}.bias" in sd:
        out["bias"] = _np(sd[f"{name}.bias"])
    return out


def _dense_from_linear(sd: Mapping, name: str) -> Dict[str, np.ndarray]:
    out = {"kernel": _np(sd[f"{name}.weight"]).T}
    if f"{name}.bias" in sd:
        out["bias"] = _np(sd[f"{name}.bias"])
    return out


def _dense_from_1x1(sd: Mapping, name: str) -> Dict[str, np.ndarray]:
    w = _np(sd[f"{name}.weight"])  # (o, i, 1, 1)
    if w.ndim != 4 or w.shape[2:] != (1, 1):
        # a reference-version drift to e.g. a 3x3 conv here would
        # otherwise silently port one corner tap (the (i, o) Dense
        # template shape still matches, so _check_structure passes)
        raise ValueError(
            f"{name}.weight: expected a 1x1 conv kernel, got {w.shape}")
    out = {"kernel": w[:, :, 0, 0].T}
    if f"{name}.bias" in sd:
        out["bias"] = _np(sd[f"{name}.bias"])
    return out


def _groupnorm(sd: Mapping, name: str) -> Dict[str, np.ndarray]:
    return {"scale": _np(sd[f"{name}.weight"]),
            "bias": _np(sd[f"{name}.bias"])}


def _resnet_block(sd: Mapping, t_name: str, target: Dict) -> Dict:
    """Map a reference ResnetBlock (sdd:700-734) onto ours."""
    out = {}
    if "mlp" in target:
        out["mlp"] = _dense_from_linear(sd, f"{t_name}.mlp.1")
    for blk in ("block1", "block2"):
        out[blk] = {
            "proj": _conv(sd, f"{t_name}.{blk}.proj"),
            "norm": _groupnorm(sd, f"{t_name}.{blk}.norm"),
        }
    if "res_conv" in target:
        out["res_conv"] = _dense_from_1x1(sd, f"{t_name}.res_conv")
    return out


def _attention(sd: Mapping, t_name: str, linear: bool):
    """Residual(PreNorm(Attention)) (sdd:737-796) -> (wrapper, inner) trees.

    Flax binds the inner attention module where it was constructed (the
    U-Net scope), so it is a top-level sibling of the PreNormResidual
    wrapper, not nested inside it.
    """
    inner: Dict[str, Any] = {
        "to_qkv": _dense_from_1x1(sd, f"{t_name}.fn.fn.to_qkv"),
    }
    if linear:
        inner["to_out"] = _dense_from_1x1(sd, f"{t_name}.fn.fn.to_out.0")
        inner["out_norm"] = {
            "g": _np(sd[f"{t_name}.fn.fn.to_out.1.g"]).reshape(-1)
        }
    else:
        inner["to_out"] = _dense_from_1x1(sd, f"{t_name}.fn.fn.to_out")
    wrapper = {"norm": {"g": _np(sd[f"{t_name}.fn.norm.g"]).reshape(-1)}}
    return wrapper, inner


def port_diffusion_unet(state_dict: Mapping,
                        params: Dict,
                        *,
                        num_stages: int = 4) -> Dict:
    """Convert a reference Unet state dict into our DiffusionUNet tree.

    Args:
        state_dict: torch ``model`` (or stripped ``ema_model.``) state dict.
        params: a freshly-initialized params tree (``model.init(...)``) used
            as the structural template.

    Returns:
        a new params dict (same structure, ported values).
    """
    sd = state_dict
    p = params["params"] if "params" in params else params
    out: Dict[str, Any] = {}

    out["init_conv"] = _conv(sd, "init_conv")
    # Fourier-feature time embedding (learned_sinusoidal_cond /
    # random_fourier_features, sdd:836-843): the RandomOrLearnedSinusoidal
    # PosEmb frequencies live at time_mlp.0.weights (in the state dict even
    # when frozen-random); the plain SinusoidalPosEmb has no params and the
    # template tree then lacks the module.
    if "time_pos_emb" in p:
        out["time_pos_emb"] = {"weights": _np(sd["time_mlp.0.weights"])}
    out["time_mlp_1"] = _dense_from_linear(sd, "time_mlp.1")
    out["time_mlp_2"] = _dense_from_linear(sd, "time_mlp.3")
    out["param_mlp_1"] = _dense_from_linear(sd, "param_mlp.0")
    out["param_mlp_2"] = _dense_from_linear(sd, "param_mlp.2")

    for i in range(num_stages):
        out[f"down_{i}_block1"] = _resnet_block(
            sd, f"downs.{i}.0", p[f"down_{i}_block1"])
        out[f"down_{i}_block2"] = _resnet_block(
            sd, f"downs.{i}.1", p[f"down_{i}_block2"])
        (out[f"down_{i}_attn"],
         out[f"down_{i}_attn_inner"]) = _attention(
            sd, f"downs.{i}.2", linear=True)
        is_last = i == num_stages - 1
        if is_last:
            out[f"down_{i}_downsample"] = _conv(sd, f"downs.{i}.3")
        else:
            out[f"down_{i}_downsample"] = {
                "conv": _conv(sd, f"downs.{i}.3")}

    out["mid_block1"] = _resnet_block(sd, "mid_block1", p["mid_block1"])
    out["mid_attn"], out["mid_attn_inner"] = _attention(
        sd, "mid_attn", linear=False)
    out["mid_block2"] = _resnet_block(sd, "mid_block2", p["mid_block2"])

    for i in range(num_stages):
        out[f"up_{i}_block1"] = _resnet_block(
            sd, f"ups.{i}.0", p[f"up_{i}_block1"])
        out[f"up_{i}_block2"] = _resnet_block(
            sd, f"ups.{i}.1", p[f"up_{i}_block2"])
        (out[f"up_{i}_attn"],
         out[f"up_{i}_attn_inner"]) = _attention(
            sd, f"ups.{i}.2", linear=True)
        is_last = i == num_stages - 1
        if is_last:
            out[f"up_{i}_upsample"] = _conv(sd, f"ups.{i}.3")
        else:
            # Sequential(Upsample, Conv2d) -> index 1 holds the conv
            out[f"up_{i}_upsample"] = {"conv": _conv(sd, f"ups.{i}.3.1")}

    out["final_res_block"] = _resnet_block(sd, "final_res_block",
                                           p["final_res_block"])
    out["final_conv"] = _dense_from_1x1(sd, "final_conv")

    _check_structure(p, out)
    return {"params": out} if "params" in params else out


def port_mask_unet(state_dict: Mapping, params: Dict,
                   *, num_stages: int = 4) -> Dict:
    """Convert a reference MaskUnet state dict (dc:807-869) into our tree."""
    sd = state_dict
    p = params["params"] if "params" in params else params
    out: Dict[str, Any] = {}

    out["init_conv"] = _conv(sd, "init_conv")
    for i in range(num_stages):
        out[f"down_{i}_block1"] = _resnet_block(
            sd, f"downs.{i}.0", p[f"down_{i}_block1"])
        out[f"down_{i}_block2"] = _resnet_block(
            sd, f"downs.{i}.1", p[f"down_{i}_block2"])
        (out[f"down_{i}_attn"],
         out[f"down_{i}_attn_inner"]) = _attention(
            sd, f"downs.{i}.2", linear=True)
        if i == num_stages - 1:
            out[f"down_{i}_downsample"] = _conv(sd, f"downs.{i}.3")
        else:
            out[f"down_{i}_downsample"] = {
                "conv": _conv(sd, f"downs.{i}.3")}

    out["mid_block1"] = _resnet_block(sd, "mid_block1", p["mid_block1"])
    out["mid_attn"], out["mid_attn_inner"] = _attention(
        sd, "mid_attn", linear=False)
    out["mid_block2"] = _resnet_block(sd, "mid_block2", p["mid_block2"])

    for i in range(num_stages):
        out[f"up_{i}_block1"] = _resnet_block(
            sd, f"ups.{i}.0", p[f"up_{i}_block1"])
        out[f"up_{i}_block2"] = _resnet_block(
            sd, f"ups.{i}.1", p[f"up_{i}_block2"])
        (out[f"up_{i}_attn"],
         out[f"up_{i}_attn_inner"]) = _attention(
            sd, f"ups.{i}.2", linear=True)
        if i == num_stages - 1:
            out[f"up_{i}_upsample"] = _conv(sd, f"ups.{i}.3")
        else:
            out[f"up_{i}_upsample"] = {"conv": _conv(sd, f"ups.{i}.3.1")}

    out["final_res_block"] = _resnet_block(sd, "final_res_block",
                                           p["final_res_block"])
    # final_conv is Sequential(Conv2d 1x1, Sigmoid) -> index 0
    out["final_conv"] = _dense_from_1x1(sd, "final_conv.0")

    _check_structure(p, out)
    return {"params": out} if "params" in params else out


def strip_prefix(state_dict: Mapping, prefix: str) -> Dict:
    """Select keys under ``prefix`` (e.g. 'ema_model.') and strip it."""
    n = len(prefix)
    return {k[n:]: v for k, v in state_dict.items() if k.startswith(prefix)}


def load_reference_checkpoint(path: str) -> Dict:
    """torch.load a reference ``.pt`` checkpoint on CPU."""
    import torch

    return torch.load(path, map_location="cpu", weights_only=False)


def _check_structure(template: Dict, ported: Dict, path: str = "") -> None:
    """Raise if the ported tree's keys/shapes diverge from the template."""
    t_keys = set(template.keys())
    p_keys = set(ported.keys())
    if t_keys != p_keys:
        raise ValueError(
            f"structure mismatch at '{path}': template has "
            f"{sorted(t_keys - p_keys)} extra, ported has "
            f"{sorted(p_keys - t_keys)} extra")
    for k in t_keys:
        tv, pv = template[k], ported[k]
        if isinstance(tv, dict):
            _check_structure(tv, pv, f"{path}/{k}")
        else:
            if tuple(np.shape(tv)) != tuple(np.shape(pv)):
                raise ValueError(
                    f"shape mismatch at '{path}/{k}': "
                    f"{np.shape(tv)} vs {np.shape(pv)}")
