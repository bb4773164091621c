"""FID math tests (exact Fréchet distance; extractor is optional/gated)."""

import numpy as np
import pytest

from pointreggpt_tpu.eval import activation_statistics, calculate_frechet_distance


class TestFrechetDistance:
    def test_identical_distributions_zero(self):
        rng = np.random.default_rng(0)
        feats = rng.normal(size=(500, 16))
        mu, sigma = activation_statistics(feats)
        assert abs(calculate_frechet_distance(mu, sigma, mu, sigma)) < 1e-6

    def test_mean_shift_analytic(self):
        # equal covariances: FID == ||mu1 - mu2||^2
        rng = np.random.default_rng(1)
        sigma = np.eye(8)
        mu1 = np.zeros(8)
        mu2 = np.ones(8) * 0.5
        d = calculate_frechet_distance(mu1, sigma, mu2, sigma)
        np.testing.assert_allclose(d, 8 * 0.25, atol=1e-8)

    def test_covariance_term_analytic(self):
        # same mean, isotropic covs a*I and b*I:
        # FID = d * (a + b - 2 sqrt(ab))
        mu = np.zeros(4)
        a, b = 2.0, 0.5
        d = calculate_frechet_distance(mu, a * np.eye(4), mu, b * np.eye(4))
        np.testing.assert_allclose(d, 4 * (a + b - 2 * np.sqrt(a * b)),
                                   atol=1e-8)

    def test_singular_covariance_jitter(self):
        # rank-deficient covariance must not produce NaN (eps fallback)
        mu = np.zeros(4)
        sigma1 = np.zeros((4, 4))
        sigma2 = np.eye(4)
        d = calculate_frechet_distance(mu, sigma1, mu, sigma2)
        assert np.isfinite(d) and d > 0

    def test_large_imaginary_sqrtm_raises(self):
        """pytorch_fid's numeric sanity check: a sqrtm with a large
        imaginary diagonal must raise, not be silently .real'd into a
        finite-but-meaningless FID."""
        import pytest

        mu = np.zeros(2)
        sigma1 = np.eye(2)
        sigma2 = np.diag([-1.0, 1.0])  # sqrtm(product) = diag(i, 1)
        with pytest.raises(ValueError, match="Imaginary"):
            calculate_frechet_distance(mu, sigma1, mu, sigma2)

    def test_statistics_shapes(self):
        feats = np.random.default_rng(2).normal(size=(100, 32))
        mu, sigma = activation_statistics(feats)
        assert mu.shape == (32,) and sigma.shape == (32, 32)
        # sigma is symmetric PSD-ish
        np.testing.assert_allclose(sigma, sigma.T, atol=1e-12)
