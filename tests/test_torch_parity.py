"""Numerical parity: torch reference-architecture U-Net vs our Flax model
with weights ported through utils.torch_port.

A compact torch mirror of the reference architecture (Unet sdd:802-964,
MaskUnet dc:807-906) is built here; random weights are ported via the bridge
and both models are fed identical inputs. Agreement validates (a) the Flax
architecture matches the reference and (b) the published-checkpoint bridge
is layout-correct.
"""

import math
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as nn
import torch.nn.functional as F

from pointreggpt_tpu.models import DiffusionUNet, MaskUNet
from pointreggpt_tpu.utils import torch_port


# --- torch mirror of the reference blocks (architecture per SURVEY.md §2.3,
# --- independent implementation) -------------------------------------------


class TResidual(nn.Module):
    def __init__(self, fn):
        super().__init__()
        self.fn = fn

    def forward(self, x):
        return self.fn(x) + x


class TLayerNorm(nn.Module):
    def __init__(self, dim):
        super().__init__()
        self.g = nn.Parameter(torch.ones(1, dim, 1, 1))

    def forward(self, x):
        eps = 1e-5
        var = torch.var(x, dim=1, unbiased=False, keepdim=True)
        mean = torch.mean(x, dim=1, keepdim=True)
        return (x - mean) * (var + eps).rsqrt() * self.g


class TPreNorm(nn.Module):
    def __init__(self, dim, fn):
        super().__init__()
        self.fn = fn
        self.norm = TLayerNorm(dim)

    def forward(self, x):
        return self.fn(self.norm(x))


class TWSConv(nn.Conv2d):
    def forward(self, x):
        eps = 1e-5
        w = self.weight
        mean = w.mean(dim=(1, 2, 3), keepdim=True)
        var = w.var(dim=(1, 2, 3), unbiased=False, keepdim=True)
        w = (w - mean) * (var + eps).rsqrt()
        return F.conv2d(x, w, self.bias, self.stride, self.padding,
                        self.dilation, self.groups)


class TBlock(nn.Module):
    def __init__(self, dim, dim_out, groups=8):
        super().__init__()
        self.proj = TWSConv(dim, dim_out, 3, padding=1)
        self.norm = nn.GroupNorm(groups, dim_out)
        self.act = nn.SiLU()

    def forward(self, x, scale_shift=None):
        x = self.norm(self.proj(x))
        if scale_shift is not None:
            scale, shift = scale_shift
            x = x * (scale + 1) + shift
        return self.act(x)


class TResnetBlock(nn.Module):
    def __init__(self, dim, dim_out, cond_dim=None, groups=8):
        super().__init__()
        self.mlp = (nn.Sequential(nn.SiLU(), nn.Linear(cond_dim, dim_out * 2))
                    if cond_dim else None)
        self.block1 = TBlock(dim, dim_out, groups)
        self.block2 = TBlock(dim_out, dim_out, groups)
        self.res_conv = (nn.Conv2d(dim, dim_out, 1)
                         if dim != dim_out else nn.Identity())

    def forward(self, x, cond=None):
        scale_shift = None
        if self.mlp is not None and cond is not None:
            c = self.mlp(cond)[:, :, None, None]
            scale_shift = c.chunk(2, dim=1)
        h = self.block1(x, scale_shift)
        h = self.block2(h)
        return h + self.res_conv(x)


class TLinearAttention(nn.Module):
    def __init__(self, dim, heads=4, dim_head=32):
        super().__init__()
        self.scale = dim_head**-0.5
        self.heads = heads
        hidden = heads * dim_head
        self.to_qkv = nn.Conv2d(dim, hidden * 3, 1, bias=False)
        self.to_out = nn.Sequential(nn.Conv2d(hidden, dim, 1),
                                    TLayerNorm(dim))

    def forward(self, x):
        b, c, h, w = x.shape
        qkv = self.to_qkv(x).chunk(3, dim=1)
        q, k, v = (t.reshape(b, self.heads, -1, h * w) for t in qkv)
        q = q.softmax(dim=-2) * self.scale
        k = k.softmax(dim=-1)
        v = v / (h * w)
        ctx = torch.einsum("bhdn,bhen->bhde", k, v)
        out = torch.einsum("bhde,bhdn->bhen", ctx, q)
        out = out.reshape(b, -1, h, w)
        return self.to_out(out)


class TAttention(nn.Module):
    def __init__(self, dim, heads=4, dim_head=32):
        super().__init__()
        self.scale = dim_head**-0.5
        self.heads = heads
        hidden = heads * dim_head
        self.to_qkv = nn.Conv2d(dim, hidden * 3, 1, bias=False)
        self.to_out = nn.Conv2d(hidden, dim, 1)

    def forward(self, x):
        b, c, h, w = x.shape
        qkv = self.to_qkv(x).chunk(3, dim=1)
        q, k, v = (t.reshape(b, self.heads, -1, h * w) for t in qkv)
        q = q * self.scale
        sim = torch.einsum("bhdi,bhdj->bhij", q, k)
        attn = sim.softmax(dim=-1)
        out = torch.einsum("bhij,bhdj->bhid", attn, v)
        out = out.permute(0, 1, 3, 2).reshape(b, -1, h, w)
        return self.to_out(out)


class TSinusoidalPosEmb(nn.Module):
    def __init__(self, dim):
        super().__init__()
        self.dim = dim

    def forward(self, x):
        half = self.dim // 2
        emb = math.log(10000) / (half - 1)
        emb = torch.exp(torch.arange(half) * -emb)
        emb = x[:, None] * emb[None, :]
        return torch.cat((emb.sin(), emb.cos()), dim=-1)


def t_upsample(dim, dim_out):
    return nn.Sequential(nn.Upsample(scale_factor=2, mode="nearest"),
                         nn.Conv2d(dim, dim_out, 3, padding=1))


def t_downsample(dim, dim_out):
    return nn.Conv2d(dim, dim_out, 4, 2, 1)


class TUnet(nn.Module):
    """Reference-architecture diffusion U-Net (torch)."""

    def __init__(self, dim=8, param_cond_dim=4, dim_mults=(1, 2), channels=1,
                 groups=8):
        super().__init__()
        init_dim = dim
        self.init_conv = nn.Conv2d(channels, init_dim, 7, padding=3)
        dims = [init_dim] + [dim * m for m in dim_mults]
        in_out = list(zip(dims[:-1], dims[1:]))
        time_dim = dim * 4
        cond_dim = time_dim + dim * 4

        self.time_mlp = nn.Sequential(
            TSinusoidalPosEmb(dim), nn.Linear(dim, time_dim), nn.GELU(),
            nn.Linear(time_dim, time_dim))
        self.param_mlp = nn.Sequential(
            nn.Linear(param_cond_dim, dim * 4), nn.GELU(),
            nn.Linear(dim * 4, dim * 4))

        self.downs = nn.ModuleList()
        for i, (d_in, d_out) in enumerate(in_out):
            is_last = i >= len(in_out) - 1
            self.downs.append(
                nn.ModuleList([
                    TResnetBlock(d_in, d_in, cond_dim, groups),
                    TResnetBlock(d_in, d_in, cond_dim, groups),
                    TResidual(TPreNorm(d_in, TLinearAttention(d_in))),
                    t_downsample(d_in, d_out)
                    if not is_last else nn.Conv2d(d_in, d_out, 3, padding=1),
                ]))

        mid = dims[-1]
        self.mid_block1 = TResnetBlock(mid, mid, cond_dim, groups)
        self.mid_attn = TResidual(TPreNorm(mid, TAttention(mid)))
        self.mid_block2 = TResnetBlock(mid, mid, cond_dim, groups)

        self.ups = nn.ModuleList()
        for i, (d_in, d_out) in enumerate(reversed(in_out)):
            is_last = i == len(in_out) - 1
            self.ups.append(
                nn.ModuleList([
                    TResnetBlock(d_out + d_in, d_out, cond_dim, groups),
                    TResnetBlock(d_out + d_in, d_out, cond_dim, groups),
                    TResidual(TPreNorm(d_out, TLinearAttention(d_out))),
                    t_upsample(d_out, d_in)
                    if not is_last else nn.Conv2d(d_out, d_in, 3, padding=1),
                ]))

        self.final_res_block = TResnetBlock(dim * 2, dim, cond_dim, groups)
        self.final_conv = nn.Conv2d(dim, channels, 1)

    def forward(self, x, time, param_cond):
        p = self.param_mlp(param_cond)
        x = self.init_conv(x)
        r = x.clone()
        t = self.time_mlp(time)
        cond = torch.cat([t, p], dim=-1)

        h = []
        for b1, b2, attn, down in self.downs:
            x = b1(x, cond)
            h.append(x)
            x = b2(x, cond)
            x = attn(x)
            h.append(x)
            x = down(x)

        x = self.mid_block1(x, cond)
        x = self.mid_attn(x)
        x = self.mid_block2(x, cond)

        for b1, b2, attn, up in self.ups:
            x = torch.cat((x, h.pop()), dim=1)
            x = b1(x, cond)
            x = torch.cat((x, h.pop()), dim=1)
            x = b2(x, cond)
            x = attn(x)
            x = up(x)

        x = torch.cat((x, r), dim=1)
        x = self.final_res_block(x, cond)
        return self.final_conv(x)


def torch_style_state_dict(model):
    """Rename mirror's cond-MLP key path to the reference's ('mlp.1')."""
    return model.state_dict()


class TestDiffusionUNetParity:
    @pytest.fixture(scope="class")
    def models(self):
        torch.manual_seed(0)
        tmodel = TUnet(dim=8, dim_mults=(1, 2), channels=1).eval()
        jmodel = DiffusionUNet(dim=8, dim_mults=(1, 2), channels=1)
        params = jmodel.init(jax.random.PRNGKey(0),
                             jnp.zeros((1, 16, 16, 1)), jnp.zeros((1,)),
                             jnp.zeros((1, 4)))
        ported = torch_port.port_diffusion_unet(
            torch_style_state_dict(tmodel), params, num_stages=2)
        return tmodel, jmodel, ported

    def test_forward_parity(self, models):
        tmodel, jmodel, ported = models
        rng = np.random.default_rng(0)
        x = rng.normal(size=(2, 16, 16, 1)).astype(np.float32)
        t = np.array([3.0, 11.0], np.float32)
        pc = rng.uniform(100, 600, size=(2, 4)).astype(np.float32)

        with torch.no_grad():
            ref = tmodel(torch.tensor(x).permute(0, 3, 1, 2),
                         torch.tensor(t), torch.tensor(pc))
        ref = ref.permute(0, 2, 3, 1).numpy()

        ours = np.asarray(
            jmodel.apply(ported, jnp.asarray(x), jnp.asarray(t),
                         jnp.asarray(pc)))
        np.testing.assert_allclose(ours, ref, atol=2e-4, rtol=1e-3)

    def test_parity_across_timesteps(self, models):
        tmodel, jmodel, ported = models
        rng = np.random.default_rng(1)
        x = rng.normal(size=(1, 16, 16, 1)).astype(np.float32)
        pc = np.array([[300.0, 300.0, 128.0, 128.0]], np.float32)
        for tv in [0.0, 500.0, 999.0]:
            t = np.array([tv], np.float32)
            with torch.no_grad():
                ref = tmodel(torch.tensor(x).permute(0, 3, 1, 2),
                             torch.tensor(t), torch.tensor(pc))
            ref = ref.permute(0, 2, 3, 1).numpy()
            ours = np.asarray(
                jmodel.apply(ported, jnp.asarray(x), jnp.asarray(t),
                             jnp.asarray(pc)))
            np.testing.assert_allclose(ours, ref, atol=2e-4, rtol=1e-3)


class TMaskUnet(nn.Module):
    """Reference-architecture mask U-Net (torch): DepthAugment + U-Net +
    sigmoid head."""

    def __init__(self, dim=8, dim_mults=(1, 2), groups=8):
        super().__init__()
        init_dim = dim
        self.init_conv = nn.Conv2d(3, init_dim, 7, padding=3)
        dims = [init_dim] + [dim * m for m in dim_mults]
        in_out = list(zip(dims[:-1], dims[1:]))

        self.downs = nn.ModuleList()
        for i, (d_in, d_out) in enumerate(in_out):
            is_last = i >= len(in_out) - 1
            self.downs.append(
                nn.ModuleList([
                    TResnetBlock(d_in, d_in, None, groups),
                    TResnetBlock(d_in, d_in, None, groups),
                    TResidual(TPreNorm(d_in, TLinearAttention(d_in))),
                    t_downsample(d_in, d_out)
                    if not is_last else nn.Conv2d(d_in, d_out, 3, padding=1),
                ]))

        mid = dims[-1]
        self.mid_block1 = TResnetBlock(mid, mid, None, groups)
        self.mid_attn = TResidual(TPreNorm(mid, TAttention(mid)))
        self.mid_block2 = TResnetBlock(mid, mid, None, groups)

        self.ups = nn.ModuleList()
        for i, (d_in, d_out) in enumerate(reversed(in_out)):
            is_last = i == len(in_out) - 1
            self.ups.append(
                nn.ModuleList([
                    TResnetBlock(d_out + d_in, d_out, None, groups),
                    TResnetBlock(d_out + d_in, d_out, None, groups),
                    TResidual(TPreNorm(d_out, TLinearAttention(d_out))),
                    t_upsample(d_out, d_in)
                    if not is_last else nn.Conv2d(d_out, d_in, 3, padding=1),
                ]))

        self.final_res_block = TResnetBlock(dim * 2, dim, None, groups)
        self.final_conv = nn.Sequential(nn.Conv2d(dim, 1, 1), nn.Sigmoid())

    def augment(self, depth):
        d = depth.clone()
        d[d == 0] = torch.inf
        mn = -F.max_pool2d(-d, 3, 1, 1)
        mn0 = -F.max_pool2d(-depth, 3, 1, 1)
        mn = torch.where(mn.isinf(), mn0, mn)
        return torch.cat([depth, mn, mn - depth], dim=1)

    def forward(self, x):
        x = self.augment(x)
        x = self.init_conv(x)
        r = x.clone()
        h = []
        for b1, b2, attn, down in self.downs:
            x = b1(x)
            h.append(x)
            x = b2(x)
            x = attn(x)
            h.append(x)
            x = down(x)
        x = self.mid_block1(x)
        x = self.mid_attn(x)
        x = self.mid_block2(x)
        for b1, b2, attn, up in self.ups:
            x = torch.cat((x, h.pop()), dim=1)
            x = b1(x)
            x = torch.cat((x, h.pop()), dim=1)
            x = b2(x)
            x = attn(x)
            x = up(x)
        x = torch.cat((x, r), dim=1)
        x = self.final_res_block(x)
        return self.final_conv(x)


class TestMaskUNetParity:
    def test_forward_parity(self):
        torch.manual_seed(1)
        tmodel = TMaskUnet(dim=8, dim_mults=(1, 2)).eval()
        jmodel = MaskUNet(dim=8, dim_mults=(1, 2))
        params = jmodel.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 1)))
        ported = torch_port.port_mask_unet(tmodel.state_dict(), params,
                                           num_stages=2)

        rng = np.random.default_rng(2)
        x = rng.uniform(0, 1, size=(2, 16, 16, 1)).astype(np.float32)
        x[0, :4, :4, 0] = 0.0  # invalid region exercises DepthAugment

        with torch.no_grad():
            ref = tmodel(torch.tensor(x).permute(0, 3, 1, 2))
        ref = ref.permute(0, 2, 3, 1).numpy()
        ours = np.asarray(jmodel.apply(ported, jnp.asarray(x)))
        np.testing.assert_allclose(ours, ref, atol=2e-4, rtol=1e-3)


class TestEndToEndSamplingParity:
    """Full DDIM+DDNM chain parity: our jitted scan vs a torch mirror of the
    reference sampling loop (sdd:1319-1392), identical weights, identical
    x_T, eta=0 (deterministic)."""

    def _torch_ddim(self, tmodel, tables, pairs, x_init, param_cond,
                    img_cond01):
        import numpy as _np

        img = torch.tensor(x_init).permute(0, 3, 1, 2).clone()
        pc = torch.tensor(param_cond)
        img_rpj = torch.tensor(img_cond01[..., 0:1]).permute(0, 3, 1, 2)
        mask = torch.tensor(img_cond01[..., 1] > 0.5)[:, None]
        ac = torch.tensor(tables.alphas_cumprod)
        for time, time_next in pairs:
            tt = torch.full((img.shape[0],), float(time))
            with torch.no_grad():
                out = tmodel(img, tt, pc)
            x_start = out.clamp(-1.0, 1.0)
            # DDNM projection in [-1,1] space (img_rpj already normalized)
            sqrt_recip = (1.0 / ac[time]).sqrt()
            sqrt_recipm1 = (1.0 / ac[time] - 1).sqrt()
            pred_noise = (sqrt_recip * img - x_start) / sqrt_recipm1
            x_start = torch.where(mask, img_rpj, x_start)
            if time_next < 0:
                img = x_start
                continue
            alpha_next = ac[time_next]
            c = (1 - alpha_next).sqrt()  # eta = 0
            img = x_start * alpha_next.sqrt() + c * pred_noise
        return ((img + 1) * 0.5).permute(0, 2, 3, 1).numpy()

    def test_chain_parity_with_ddnm(self):
        import numpy as _np

        from pointreggpt_tpu.core.geometry import (
            normalize_to_neg_one_to_one)
        from pointreggpt_tpu.diffusion import GaussianDiffusion
        from pointreggpt_tpu.diffusion import schedules as sched

        torch.manual_seed(5)
        tmodel = TUnet(dim=8, dim_mults=(1, 2), channels=1).eval()
        jmodel = DiffusionUNet(dim=8, dim_mults=(1, 2), channels=1)
        params = jmodel.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 1)),
                             jnp.zeros((1,)), jnp.zeros((1, 4)))
        ported = torch_port.port_diffusion_unet(tmodel.state_dict(), params,
                                                num_stages=2)

        T, S = 100, 8
        diff = GaussianDiffusion(
            apply_fn=lambda p, x, t, pc: jmodel.apply(p, x, t, pc),
            image_size=16, timesteps=T, sampling_timesteps=S,
            objective="pred_x0", beta_schedule="sigmoid",
            ddim_sampling_eta=0.0)

        rng = np.random.default_rng(7)
        x_init = rng.normal(size=(2, 16, 16, 1)).astype(np.float32)
        pc = np.array([[300.0, 300.0, 128.0, 128.0]] * 2, np.float32)
        mask01 = np.zeros((2, 16, 16), np.float32)
        mask01[:, :8] = 1.0
        cond01 = np.stack(
            [np.full((2, 16, 16), 0.6, np.float32), mask01], axis=-1)
        img_cond = np.asarray(
            normalize_to_neg_one_to_one(jnp.asarray(cond01)))

        ours = np.asarray(
            diff.sample({"params": ported["params"]}
                        if "params" in ported else ported,
                        jax.random.PRNGKey(1), param_cond=jnp.asarray(pc),
                        img_cond=jnp.asarray(img_cond),
                        x_init=jnp.asarray(x_init)))

        pairs = sched.ddim_time_pairs(T, S)
        ref = self._torch_ddim(tmodel, diff.tables, pairs, x_init, pc,
                               img_cond)

        np.testing.assert_allclose(ours, ref, atol=5e-4, rtol=1e-3)
        # sanity: masked half pinned to the conditioned depth
        np.testing.assert_allclose(ours[:, :8], 0.6, atol=5e-4)
