"""FID machinery: Fréchet distance + InceptionV3 activation statistics.

Reference: sdd:1719-1745 (InceptionV3 block-2048 activations +
``calculate_frechet_distance``). FID is off by default in the entry scripts
(train_successive_ddnm_diffusion.py:40), so the feature extractor is a
gated optional dependency: exact Fréchet math is always available (numpy/
scipy); Inception features use torch-cpu ``pytorch_fid`` or ``torchvision``
when importable and raise a clear error otherwise.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np


def calculate_frechet_distance(mu1: np.ndarray, sigma1: np.ndarray,
                               mu2: np.ndarray, sigma2: np.ndarray,
                               eps: float = 1e-6) -> float:
    """Exact FID between two Gaussians (Heusel et al. 2017).

    Matches pytorch_fid's implementation semantics (trace-sqrtm form with
    the eps-jitter fallback for singular covariances).
    """
    import warnings

    from scipy import linalg

    mu1, mu2 = np.atleast_1d(mu1), np.atleast_1d(mu2)
    sigma1, sigma2 = np.atleast_2d(sigma1), np.atleast_2d(sigma2)
    diff = mu1 - mu2

    with warnings.catch_warnings():
        # singular products are expected and handled by the eps fallback
        warnings.simplefilter("ignore")
        covmean = linalg.sqrtm(sigma1.dot(sigma2))
    if not np.isfinite(covmean).all():
        offset = np.eye(sigma1.shape[0]) * eps
        covmean = linalg.sqrtm((sigma1 + offset).dot(sigma2 + offset))
    if np.iscomplexobj(covmean):
        # pytorch_fid's sanity check: a numerically failed sqrtm can
        # return finite entries with a LARGE imaginary diagonal — silently
        # taking .real there would report a meaningless FID as valid
        if not np.allclose(np.diagonal(covmean).imag, 0, atol=1e-3):
            m = np.max(np.abs(covmean.imag))
            raise ValueError(f"Imaginary component {m} in matrix sqrt — "
                             "FID is not numerically valid for these "
                             "activation statistics")
        covmean = covmean.real

    return float(
        diff.dot(diff) + np.trace(sigma1) + np.trace(sigma2) -
        2 * np.trace(covmean))


def activation_statistics(
        features: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """(n, d) activations -> (mu, sigma). Reference: sdd:1726-1728."""
    mu = np.mean(features, axis=0)
    sigma = np.cov(features, rowvar=False)
    return mu, sigma


def _load_inception_state_dict(weights_path: Optional[str]):
    """Resolve an InceptionV3 state dict from the first available source:
    an explicit ``weights_path`` (or ``$PRGPT_INCEPTION_WEIGHTS``) loaded
    with torch, the installed ``pytorch_fid`` package's FID weights, or
    torchvision's pretrained ``inception_v3``. Raises ImportError with
    guidance when none is available (FID is optional — the reference
    defaults ``calculate_fid=False``, train script:40).

    Returns ``(state_dict, fid_pools)``: explicit/pytorch_fid weights are
    the TF-ported FID variant (modified pools); torchvision weights were
    trained under plain torchvision pool semantics and are run that way.
    """
    import os

    path = weights_path or os.environ.get("PRGPT_INCEPTION_WEIGHTS")
    if path:
        import torch

        sd = torch.load(path, map_location="cpu", weights_only=True)
        if isinstance(sd, dict) and "state_dict" in sd:
            sd = sd["state_dict"]
        return sd, True
    try:
        from pytorch_fid.inception import InceptionV3  # type: ignore

        model = InceptionV3([InceptionV3.BLOCK_INDEX_BY_DIM[2048]]).eval()
        # the FID variant stores modules in Sequential blocks, so its keys
        # are "blocks.<i>.<j>.…"; rename them back to the torchvision
        # module names (pooling layers hold no params and shift j)
        names = {
            (0, 0): "Conv2d_1a_3x3", (0, 1): "Conv2d_2a_3x3",
            (0, 2): "Conv2d_2b_3x3",
            (1, 0): "Conv2d_3b_1x1", (1, 1): "Conv2d_4a_3x3",
            (2, 0): "Mixed_5b", (2, 1): "Mixed_5c", (2, 2): "Mixed_5d",
            (2, 3): "Mixed_6a", (2, 4): "Mixed_6b", (2, 5): "Mixed_6c",
            (2, 6): "Mixed_6d", (2, 7): "Mixed_6e",
            (3, 0): "Mixed_7a", (3, 1): "Mixed_7b", (3, 2): "Mixed_7c",
        }
        sd = {}
        for key, tensor in model.state_dict().items():
            parts = key.split(".")
            if parts[0] != "blocks":
                continue
            name = names.get((int(parts[1]), int(parts[2])))
            if name is not None:
                sd[".".join([name] + parts[3:])] = tensor
        return sd, True
    except ImportError:
        pass
    except Exception as e:
        # pytorch_fid IS installed but unusable (its constructor DOWNLOADS
        # the FID weights, so an offline host raises URLError/RuntimeError).
        # Fall through to torchvision — but LOUDLY: torchvision weights use
        # different pool semantics, so FID scores change scale
        import warnings

        warnings.warn(
            f"pytorch_fid present but unusable ({type(e).__name__}: {e}); "
            "falling back to torchvision inception weights — FID values "
            "are NOT comparable with pytorch_fid-based runs",
            RuntimeWarning)
    try:
        import torchvision  # type: ignore

        return torchvision.models.inception_v3(
            weights="DEFAULT", aux_logits=True).state_dict(), False
    except Exception as e:
        raise ImportError(
            "FID needs InceptionV3 weights: pass weights_path / set "
            "PRGPT_INCEPTION_WEIGHTS to a .pth state dict (e.g. "
            "pytorch_fid's pt_inception-2015-12-05), or install "
            "pytorch_fid / torchvision. FID is optional (the reference "
            "defaults calculate_fid=False).") from e


class InceptionFeatures:
    """InceptionV3 pool3 (2048-d) activations as a jitted XLA program.

    The forward runs on the default JAX device (`eval/inception.py` — the
    TPU-native replacement for the reference's CUDA pytorch_fid extractor,
    sdd:1719-1745); torch is only used to load a weight file. Pass
    ``params`` directly (e.g. from ``inception.init_random_params``) to
    skip weight resolution.
    """

    def __init__(self, block_dim: int = 2048,
                 weights_path: Optional[str] = None,
                 params=None, chunk: int = 32,
                 fid_pools: Optional[bool] = None):
        from pointreggpt_tpu.eval import inception

        if block_dim != inception.FEATURE_DIM:
            raise ValueError(
                f"only the {inception.FEATURE_DIM}-d pool3 block is "
                f"supported (got {block_dim})")
        self.block_dim = block_dim
        self.chunk = chunk
        if params is None:
            sd, source_fid_pools = _load_inception_state_dict(weights_path)
            params = inception.port_inception(sd)
            if fid_pools is None:
                fid_pools = source_fid_pools
        self.fid_pools = True if fid_pools is None else fid_pools
        import jax

        # params ride as jit ARGUMENTS (device_put once) — closing over
        # the ~24M-param tree would bake ~95 MB of constants into the
        # compile payload (CLAUDE.md's HTTP-413 tunnel hazard) and
        # recompile per instance
        self.params = jax.device_put(params)
        self._fn = jax.jit(
            lambda p, imgs: inception.features(
                p, imgs, fid_pools=self.fid_pools))

    def __call__(self, images01: np.ndarray) -> np.ndarray:
        """(n, h, w, 1|3) [0,1] images -> (n, 2048) activations."""
        x = np.asarray(images01, np.float32)
        n = x.shape[0]
        if x.ndim != 4:
            raise ValueError(f"expected (n, h, w, c) images, got {x.shape}")
        out = np.empty((n, self.block_dim), np.float32)
        # ALWAYS pad to the fixed chunk size: every distinct batch shape
        # would otherwise compile its own 94-conv executable (1-6 min each
        # on the tunneled host)
        for lo in range(0, n, self.chunk):
            count = min(self.chunk, n - lo)
            part = x[lo:lo + count]
            if count < self.chunk:
                part = np.concatenate(
                    [part,
                     np.zeros((self.chunk - count, *x.shape[1:]),
                              np.float32)])
            out[lo:lo + count] = np.asarray(
                self._fn(self.params, part))[:count]
        return out


def fid_score(real_images01: np.ndarray,
              fake_images01: np.ndarray,
              extractor: Optional[InceptionFeatures] = None) -> float:
    """End-to-end FID between two [0,1] image batches (sdd:1730-1745)."""
    if extractor is None:
        extractor = InceptionFeatures()
    n = min(real_images01.shape[0], fake_images01.shape[0])
    m1, s1 = activation_statistics(extractor(real_images01[:n]))
    m2, s2 = activation_statistics(extractor(fake_images01[:n]))
    return calculate_frechet_distance(m1, s1, m2, s2)
