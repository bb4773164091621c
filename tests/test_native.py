"""Native C++ host library tests: build, parity with the Python paths."""

import numpy as np
import pytest

from pointreggpt_tpu import native
from pointreggpt_tpu.core import imageio16, plyio

pytestmark = pytest.mark.skipif(not native.is_available(),
                                reason="native toolchain unavailable")


class TestDepthPreprocess:
    def test_matches_python_pipeline(self, tmp_path):
        import cv2

        rng = np.random.default_rng(0)
        raw = rng.integers(0, 12000, (480, 640)).astype(np.uint16)
        p = tmp_path / "f.png"
        cv2.imwrite(str(p), raw)
        ref = imageio16.load_depth_model_space(p, 256)
        got = native.depth_preprocess(raw, 256)
        # identical pixel selection + scaling
        np.testing.assert_allclose(got, ref, atol=1e-7)

    def test_flip(self):
        raw = np.arange(480 * 640, dtype=np.uint16).reshape(480, 640) % 9999
        a = native.depth_preprocess(raw, 64, flip=False)
        b = native.depth_preprocess(raw, 64, flip=True)
        np.testing.assert_allclose(a, b[:, ::-1])

    def test_clip(self):
        raw = np.full((480, 640), 60000, np.uint16)  # 6.0 > 1 -> 0
        out = native.depth_preprocess(raw, 32)
        np.testing.assert_allclose(out, 0.0)


class TestHostPointOps:
    def test_voxel_matches_device(self):
        import jax.numpy as jnp

        from pointreggpt_tpu.core import pointops as P

        rng = np.random.default_rng(1)
        pts = rng.uniform(0, 1, (500, 3)).astype(np.float32)
        host = native.voxel_downsample_host(pts, 0.2)
        dev_p, dev_v = P.voxel_downsample(
            jnp.asarray(pts), jnp.ones((500,), bool), 0.2)
        dev = np.asarray(dev_p)[np.asarray(dev_v)]
        assert host.shape[0] == dev.shape[0]
        # same centroid sets (order-insensitive)
        host_sorted = host[np.lexsort(host.T)]
        dev_sorted = dev[np.lexsort(dev.T)]
        np.testing.assert_allclose(host_sorted, dev_sorted, atol=1e-5)

    def test_radius_hits(self):
        src = np.array([[0, 0, 0], [1, 0, 0], [5, 5, 5]], np.float32)
        tgt = np.array([[0.05, 0, 0], [1.2, 0, 0]], np.float32)
        hits = native.radius_hits_host(src, tgt, 0.1)
        np.testing.assert_array_equal(hits, [True, False, False])

    def test_radius_hits_matches_device(self):
        import jax.numpy as jnp

        from pointreggpt_tpu.core import pointops as P

        rng = np.random.default_rng(2)
        src = rng.uniform(0, 1, (300, 3)).astype(np.float32)
        tgt = rng.uniform(0, 1, (200, 3)).astype(np.float32)
        host = native.radius_hits_host(src, tgt, 0.07)
        dev = np.asarray(
            P.any_within_radius(
                jnp.asarray(src), jnp.ones((300,), bool), jnp.asarray(tgt),
                jnp.ones((200,), bool), 0.07))
        np.testing.assert_array_equal(host, dev)


class TestPlyPack:
    def test_roundtrip_via_reader(self, tmp_path):
        rng = np.random.default_rng(3)
        pts = rng.normal(size=(50, 3)).astype(np.float32)
        blob = native.ply_pack(pts)
        p = tmp_path / "n.ply"
        p.write_bytes(blob)
        back = plyio.read_ply(p)
        np.testing.assert_allclose(back, pts, atol=1e-6)
