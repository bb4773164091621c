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


class InceptionFeatures:
    """InceptionV3 pool3 (2048-d) activations on host torch-cpu.

    Gated: instantiating raises ImportError with guidance when neither
    ``pytorch_fid`` nor ``torchvision`` is installed.
    """

    def __init__(self, block_dim: int = 2048):
        self.block_dim = block_dim
        self._model = None
        try:
            from pytorch_fid.inception import InceptionV3  # type: ignore

            idx = InceptionV3.BLOCK_INDEX_BY_DIM[block_dim]
            self._model = InceptionV3([idx]).eval()
            self._mode = "pytorch_fid"
        except ImportError:
            try:
                import torchvision  # type: ignore

                self._model = torchvision.models.inception_v3(
                    weights="DEFAULT", aux_logits=True).eval()
                self._model.fc = __import__("torch").nn.Identity()
                self._mode = "torchvision"
            except Exception as e:  # pragma: no cover
                raise ImportError(
                    "FID requires pytorch_fid or torchvision for "
                    "InceptionV3 features; both are unavailable. FID is "
                    "optional (the reference defaults calculate_fid=False)."
                ) from e

    def __call__(self, images01: np.ndarray) -> np.ndarray:
        """(n, h, w, 1|3) [0,1] images -> (n, 2048) activations."""
        import torch

        x = np.asarray(images01, np.float32)
        if x.shape[-1] == 1:
            x = np.repeat(x, 3, axis=-1)
        t = torch.from_numpy(x).permute(0, 3, 1, 2)
        with torch.no_grad():
            if self._mode == "pytorch_fid":
                feats = self._model(t)[0]
                return feats.reshape(feats.shape[0], -1).numpy()
            t = torch.nn.functional.interpolate(
                t, size=(299, 299), mode="bilinear", align_corners=False)
            t = t * 2 - 1
            return self._model(t).numpy()


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
