"""JAX FID-InceptionV3 vs an independent torch mirror.

The mirror below is hand-built from the published torchvision
``inception_v3`` architecture with pytorch_fid's FID modifications
(count_include_pad=False average pools in A/C/7b, max-pool branch in 7c),
using the torchvision module names so its ``state_dict()`` exercises the
real :func:`port_inception` mapping. Reference: sdd:37-38, 1719-1745.

Parity runs at ``resize_to=75`` — the architecture is resolution-agnostic
past the stem, so a 75x75 trace checks every conv/pool/BN against torch at
1/16th the 299² FLOPs.
"""

import numpy as np
import pytest
import torch
import torch.nn as nn
import torch.nn.functional as F

from pointreggpt_tpu.eval import fid, inception


class _Basic(nn.Module):
    def __init__(self, cin, cout, **kw):
        super().__init__()
        self.conv = nn.Conv2d(cin, cout, bias=False, **kw)
        self.bn = nn.BatchNorm2d(cout, eps=1e-3)

    def forward(self, x):
        return F.relu(self.bn(self.conv(x)))


def _avg3(x, fid_pools=True):
    return F.avg_pool2d(x, 3, 1, 1, count_include_pad=not fid_pools)


class _IncA(nn.Module):
    def __init__(self, cin, pool, fid_pools=True):
        super().__init__()
        self._fid_pools = fid_pools
        self.branch1x1 = _Basic(cin, 64, kernel_size=1)
        self.branch5x5_1 = _Basic(cin, 48, kernel_size=1)
        self.branch5x5_2 = _Basic(48, 64, kernel_size=5, padding=2)
        self.branch3x3dbl_1 = _Basic(cin, 64, kernel_size=1)
        self.branch3x3dbl_2 = _Basic(64, 96, kernel_size=3, padding=1)
        self.branch3x3dbl_3 = _Basic(96, 96, kernel_size=3, padding=1)
        self.branch_pool = _Basic(cin, pool, kernel_size=1)

    def forward(self, x):
        return torch.cat([
            self.branch1x1(x),
            self.branch5x5_2(self.branch5x5_1(x)),
            self.branch3x3dbl_3(
                self.branch3x3dbl_2(self.branch3x3dbl_1(x))),
            self.branch_pool(_avg3(x, self._fid_pools))], 1)


class _IncB(nn.Module):
    def __init__(self, cin):
        super().__init__()
        self.branch3x3 = _Basic(cin, 384, kernel_size=3, stride=2)
        self.branch3x3dbl_1 = _Basic(cin, 64, kernel_size=1)
        self.branch3x3dbl_2 = _Basic(64, 96, kernel_size=3, padding=1)
        self.branch3x3dbl_3 = _Basic(96, 96, kernel_size=3, stride=2)

    def forward(self, x):
        return torch.cat([
            self.branch3x3(x),
            self.branch3x3dbl_3(
                self.branch3x3dbl_2(self.branch3x3dbl_1(x))),
            F.max_pool2d(x, 3, 2)], 1)


class _IncC(nn.Module):
    def __init__(self, cin, c7, fid_pools=True):
        super().__init__()
        self._fid_pools = fid_pools
        self.branch1x1 = _Basic(cin, 192, kernel_size=1)
        self.branch7x7_1 = _Basic(cin, c7, kernel_size=1)
        self.branch7x7_2 = _Basic(c7, c7, kernel_size=(1, 7),
                                  padding=(0, 3))
        self.branch7x7_3 = _Basic(c7, 192, kernel_size=(7, 1),
                                  padding=(3, 0))
        self.branch7x7dbl_1 = _Basic(cin, c7, kernel_size=1)
        self.branch7x7dbl_2 = _Basic(c7, c7, kernel_size=(7, 1),
                                     padding=(3, 0))
        self.branch7x7dbl_3 = _Basic(c7, c7, kernel_size=(1, 7),
                                     padding=(0, 3))
        self.branch7x7dbl_4 = _Basic(c7, c7, kernel_size=(7, 1),
                                     padding=(3, 0))
        self.branch7x7dbl_5 = _Basic(c7, 192, kernel_size=(1, 7),
                                     padding=(0, 3))
        self.branch_pool = _Basic(cin, 192, kernel_size=1)

    def forward(self, x):
        b7 = self.branch7x7_3(self.branch7x7_2(self.branch7x7_1(x)))
        bd = self.branch7x7dbl_5(self.branch7x7dbl_4(self.branch7x7dbl_3(
            self.branch7x7dbl_2(self.branch7x7dbl_1(x)))))
        return torch.cat([self.branch1x1(x), b7, bd,
                          self.branch_pool(_avg3(x, self._fid_pools))], 1)


class _IncD(nn.Module):
    def __init__(self, cin):
        super().__init__()
        self.branch3x3_1 = _Basic(cin, 192, kernel_size=1)
        self.branch3x3_2 = _Basic(192, 320, kernel_size=3, stride=2)
        self.branch7x7x3_1 = _Basic(cin, 192, kernel_size=1)
        self.branch7x7x3_2 = _Basic(192, 192, kernel_size=(1, 7),
                                    padding=(0, 3))
        self.branch7x7x3_3 = _Basic(192, 192, kernel_size=(7, 1),
                                    padding=(3, 0))
        self.branch7x7x3_4 = _Basic(192, 192, kernel_size=3, stride=2)

    def forward(self, x):
        return torch.cat([
            self.branch3x3_2(self.branch3x3_1(x)),
            self.branch7x7x3_4(self.branch7x7x3_3(
                self.branch7x7x3_2(self.branch7x7x3_1(x)))),
            F.max_pool2d(x, 3, 2)], 1)


class _IncE(nn.Module):
    def __init__(self, cin, pool, fid_pools=True):
        super().__init__()
        self._pool = pool
        self._fid_pools = fid_pools
        self.branch1x1 = _Basic(cin, 320, kernel_size=1)
        self.branch3x3_1 = _Basic(cin, 384, kernel_size=1)
        self.branch3x3_2a = _Basic(384, 384, kernel_size=(1, 3),
                                   padding=(0, 1))
        self.branch3x3_2b = _Basic(384, 384, kernel_size=(3, 1),
                                   padding=(1, 0))
        self.branch3x3dbl_1 = _Basic(cin, 448, kernel_size=1)
        self.branch3x3dbl_2 = _Basic(448, 384, kernel_size=3, padding=1)
        self.branch3x3dbl_3a = _Basic(384, 384, kernel_size=(1, 3),
                                      padding=(0, 1))
        self.branch3x3dbl_3b = _Basic(384, 384, kernel_size=(3, 1),
                                      padding=(1, 0))
        self.branch_pool = _Basic(cin, 192, kernel_size=1)

    def forward(self, x):
        b3 = self.branch3x3_1(x)
        b3 = torch.cat([self.branch3x3_2a(b3), self.branch3x3_2b(b3)], 1)
        bd = self.branch3x3dbl_2(self.branch3x3dbl_1(x))
        bd = torch.cat([self.branch3x3dbl_3a(bd),
                        self.branch3x3dbl_3b(bd)], 1)
        pooled = _avg3(x, self._fid_pools) if self._pool == "avg" \
            else F.max_pool2d(x, 3, 1, 1)
        return torch.cat([self.branch1x1(x), b3, bd,
                          self.branch_pool(pooled)], 1)


class _TorchFidInception(nn.Module):
    def __init__(self, fid_pools=True):
        super().__init__()
        self.Conv2d_1a_3x3 = _Basic(3, 32, kernel_size=3, stride=2)
        self.Conv2d_2a_3x3 = _Basic(32, 32, kernel_size=3)
        self.Conv2d_2b_3x3 = _Basic(32, 64, kernel_size=3, padding=1)
        self.Conv2d_3b_1x1 = _Basic(64, 80, kernel_size=1)
        self.Conv2d_4a_3x3 = _Basic(80, 192, kernel_size=3)
        self.Mixed_5b = _IncA(192, 32, fid_pools)
        self.Mixed_5c = _IncA(256, 64, fid_pools)
        self.Mixed_5d = _IncA(288, 64, fid_pools)
        self.Mixed_6a = _IncB(288)
        self.Mixed_6b = _IncC(768, 128, fid_pools)
        self.Mixed_6c = _IncC(768, 160, fid_pools)
        self.Mixed_6d = _IncC(768, 160, fid_pools)
        self.Mixed_6e = _IncC(768, 192, fid_pools)
        self.Mixed_7a = _IncD(768)
        self.Mixed_7b = _IncE(1280, pool="avg", fid_pools=fid_pools)
        self.Mixed_7c = _IncE(
            2048, pool="max" if fid_pools else "avg",
            fid_pools=fid_pools)

    def forward(self, x01, resize_to):
        x = F.interpolate(x01, (resize_to, resize_to), mode="bilinear",
                          align_corners=False)
        x = x * 2 - 1
        x = self.Conv2d_2b_3x3(self.Conv2d_2a_3x3(self.Conv2d_1a_3x3(x)))
        x = F.max_pool2d(x, 3, 2)
        x = self.Conv2d_4a_3x3(self.Conv2d_3b_1x1(x))
        x = F.max_pool2d(x, 3, 2)
        for name in ("Mixed_5b", "Mixed_5c", "Mixed_5d", "Mixed_6a",
                     "Mixed_6b", "Mixed_6c", "Mixed_6d", "Mixed_6e",
                     "Mixed_7a", "Mixed_7b", "Mixed_7c"):
            x = getattr(self, name)(x)
        return x.mean(dim=(2, 3))


def _randomize(model: nn.Module, seed: int = 7) -> None:
    rng = np.random.default_rng(seed)
    sd = model.state_dict()
    for key, tensor in sd.items():
        shape = tuple(tensor.shape)
        if key.endswith("conv.weight"):
            fan_in = int(np.prod(shape[1:]))
            val = rng.normal(0, fan_in ** -0.5, shape)
        elif key.endswith("bn.weight") or key.endswith("running_var"):
            val = rng.uniform(0.5, 1.5, shape)
        elif key.endswith("bn.bias") or key.endswith("running_mean"):
            val = rng.normal(0, 0.1, shape)
        else:  # num_batches_tracked
            continue
        sd[key] = torch.from_numpy(val.astype(np.float32))
    model.load_state_dict(sd)


class TestInceptionParity:
    @pytest.mark.parametrize("fid_pools", [True, False])
    def test_port_matches_torch_mirror(self, rng, fid_pools):
        """fid_pools=True: pytorch_fid pool semantics; False: plain
        torchvision (used when weights come from torchvision)."""
        torch_model = _TorchFidInception(fid_pools).eval()
        _randomize(torch_model)
        params = inception.port_inception(torch_model.state_dict())

        imgs = rng.uniform(0, 1, (2, 64, 64, 3)).astype(np.float32)
        with torch.no_grad():
            want = torch_model(
                torch.from_numpy(imgs).permute(0, 3, 1, 2),
                resize_to=75).numpy()
        got = np.asarray(inception.features(params, imgs, resize_to=75,
                                            fid_pools=fid_pools))
        assert got.shape == (2, inception.FEATURE_DIM)
        np.testing.assert_allclose(got, want, rtol=5e-3, atol=5e-4)

    def test_port_rejects_wrong_shapes(self):
        torch_model = _TorchFidInception()
        sd = dict(torch_model.state_dict())
        sd["Conv2d_1a_3x3.conv.weight"] = torch.zeros(32, 3, 5, 5)
        with pytest.raises(ValueError, match="Conv2d_1a_3x3"):
            inception.port_inception(sd)
        sd.pop("Conv2d_1a_3x3.conv.weight")
        with pytest.raises(ValueError, match="missing"):
            inception.port_inception(sd)

    def test_grayscale_and_chunking(self, rng):
        params = inception.init_random_params(0)
        ext = fid.InceptionFeatures(params=params, chunk=2)
        # patch the jitted fn to a cheap resolution for CPU test speed
        import jax

        ext._fn = jax.jit(
            lambda p, im: inception.features(p, im, resize_to=75))
        imgs = rng.uniform(0, 1, (5, 32, 32, 1)).astype(np.float32)
        feats = ext(imgs)
        assert feats.shape == (5, 2048)
        # chunked (2,2,1-padded) equals unchunked
        ext1 = fid.InceptionFeatures(params=params, chunk=8)
        ext1._fn = ext._fn
        np.testing.assert_allclose(feats, ext1(imgs), rtol=1e-5, atol=1e-6)

    def test_fid_score_zero_for_identical(self, rng):
        params = inception.init_random_params(1)
        ext = fid.InceptionFeatures(params=params, chunk=8)
        import jax

        ext._fn = jax.jit(
            lambda p, im: inception.features(p, im, resize_to=75))
        a = rng.uniform(0, 1, (6, 32, 32, 1)).astype(np.float32)
        b = rng.uniform(0, 1, (6, 32, 32, 1)).astype(np.float32)
        assert fid.fid_score(a, a, extractor=ext) == pytest.approx(
            0.0, abs=1e-3)
        assert fid.fid_score(a, b, extractor=ext) > 0.0
