"""Unit tests for core.geometry against hand-computed cases and the
reference PyTorch semantics (reimplemented locally in numpy/torch)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pointreggpt_tpu.core import geometry as G


def make_intrinsic(fx=100.0, fy=100.0, cx=32.0, cy=24.0):
    k = np.zeros((3, 3), np.float32)
    k[0, 0], k[1, 1], k[0, 2], k[1, 2], k[2, 2] = fx, fy, cx, cy, 1.0
    return k


class TestIntrinsicTransform:
    def test_resize_and_centercrop_640x480_to_256(self):
        # The production path: 640x480 -> short-side 256 -> center crop 256.
        k = make_intrinsic(fx=585.0, fy=585.0, cx=320.0, cy=240.0)
        out = G.intrinsic_transform(k, resize=256, centercrop=256)
        # short side h=480 -> 256; w = floor(256*640/480) = 341
        assert np.isclose(out[0, 0], 585.0 * 341 / 640)
        assert np.isclose(out[1, 1], 585.0 * 256 / 480)
        # cx = 341/2 - round((341-256)/2) = 170.5 - 42 = 128.5
        assert np.isclose(out[0, 2], 341 / 2 - round((341 - 256) / 2))
        assert np.isclose(out[1, 2], 128.0)
        assert out[2, 2] == 1.0

    def test_tuple_resize(self):
        k = make_intrinsic(fx=500.0, fy=500.0, cx=320.0, cy=240.0)
        out = G.intrinsic_transform(k, resize=(240, 320))
        assert np.isclose(out[0, 0], 500.0 * 320 / 640)
        assert np.isclose(out[1, 1], 500.0 * 240 / 480)
        assert np.isclose(out[0, 2], 160.0)
        assert np.isclose(out[1, 2], 120.0)

    def test_batched(self):
        k = np.stack([make_intrinsic(), make_intrinsic(fx=200.0)])
        out = G.intrinsic_transform(k, resize=32, centercrop=32)
        assert out.shape == (2, 3, 3)


class TestDepthPointsRoundTrip:
    def test_backproject_plane(self):
        # A constant-depth plane at z=2: x,y from pinhole model exactly.
        k = make_intrinsic()[None]
        depth = np.full((1, 4, 6), 2.0, np.float32)
        pts, valid = G.depth_to_points(jnp.asarray(depth), jnp.asarray(k))
        assert bool(valid.all())
        pts = np.asarray(pts).reshape(4, 6, 3)
        # pixel (r=1, c=3): x=(3-32)*2/100, y=(1-24)*2/100
        np.testing.assert_allclose(pts[1, 3], [(3 - 32) * 2 / 100,
                                               (1 - 24) * 2 / 100, 2.0],
                                   rtol=1e-6)

    def test_clip_invalidates(self):
        k = make_intrinsic()[None]
        depth = np.array([[[0.0, 5.0], [11.0, 1.0]]], np.float32)
        pts, valid = G.depth_to_points(
            jnp.asarray(depth), jnp.asarray(k), clip=(0.0, 10.0))
        np.testing.assert_array_equal(
            np.asarray(valid).reshape(2, 2), [[False, True], [False, True]])
        # invalid points zeroed, not NaN
        assert np.isfinite(np.asarray(pts)).all()

    def test_roundtrip_identity(self):
        # depth -> points -> depth with identity pose reproduces the image.
        k = make_intrinsic(fx=80.0, fy=80.0, cx=16.0, cy=12.0)[None]
        rng = np.random.default_rng(1)
        depth = rng.uniform(1.0, 3.0, size=(1, 24, 32)).astype(np.float32)
        pts, valid = G.depth_to_points(jnp.asarray(depth), jnp.asarray(k))
        out, mask = G.points_to_depth(
            pts, valid, jnp.asarray(k), image_size=(24, 32))
        assert bool(jnp.all(mask))
        np.testing.assert_allclose(np.asarray(out), depth, rtol=1e-5)


class TestZBuffer:
    def test_scatter_min_tie(self):
        # Two points projecting onto the same pixel: nearest (smallest z) wins.
        k = make_intrinsic(fx=1.0, fy=1.0, cx=0.0, cy=0.0)[None]
        pts = jnp.array([[[0.0, 0.0, 3.0], [0.0, 0.0, 1.5]]])
        valid = jnp.ones((1, 2), bool)
        depth, mask = G.points_to_depth(pts, valid, jnp.asarray(k),
                                        image_size=(2, 2))
        assert float(depth[0, 0, 0]) == 1.5
        assert bool(mask[0, 0, 0])
        assert float(depth[0, 1, 1]) == 0.0
        assert not bool(mask[0, 1, 1])

    def test_out_of_frame_and_negative_z_dropped(self):
        k = make_intrinsic(fx=1.0, fy=1.0, cx=0.0, cy=0.0)[None]
        pts = jnp.array([[[100.0, 0.0, 1.0],  # projects far out of frame
                          [0.0, 0.0, -2.0],   # behind camera
                          [0.0, 0.0, 0.0]]])  # z == 0 guard
        valid = jnp.ones((1, 3), bool)
        depth, mask = G.points_to_depth(pts, valid, jnp.asarray(k),
                                        image_size=(4, 4))
        assert float(jnp.sum(mask)) == 0.0
        assert float(jnp.sum(depth)) == 0.0

    def test_matches_torch_scatter_amin(self):
        # Randomized parity vs the reference's scatter_reduce(amin) z-buffer.
        torch = pytest.importorskip("torch")
        rng = np.random.default_rng(7)
        b, n, h, w = 2, 500, 16, 20
        pts = rng.normal(0, 1, size=(b, n, 3)).astype(np.float32)
        pts[..., 2] = rng.uniform(0.5, 4.0, size=(b, n))
        k = np.stack([make_intrinsic(10.0, 10.0, 10.0, 8.0)] * b)
        valid = rng.random((b, n)) > 0.1

        ours, ours_mask = G.points_to_depth(
            jnp.asarray(pts), jnp.asarray(valid), jnp.asarray(k),
            image_size=(h, w))

        # reference semantics (sdd:212-265), reimplemented:
        t = torch.tensor(pts)
        fx, fy, cx, cy = 10.0, 10.0, 10.0, 8.0
        c = torch.round(t[..., 0] * fx / t[..., 2] + cx).long()
        r = torch.round(t[..., 1] * fy / t[..., 2] + cy).long()
        bi = torch.arange(b)[:, None].repeat(1, n)
        ok = ((c >= 0) & (c < w) & (r >= 0) & (r < h)
              & torch.tensor(valid) & (t[..., 2] > 0))
        lin = (bi * h * w + r * w + c)[ok]
        z = t[..., 2][ok]
        ref = torch.zeros(b * h * w).scatter_reduce(
            0, lin, z, reduce="amin", include_self=False)
        ref = ref.reshape(b, h, w).numpy()
        ref_mask = np.zeros((b * h * w), bool)
        ref_mask[lin.numpy()] = True
        ref_mask = ref_mask.reshape(b, h, w)

        np.testing.assert_array_equal(np.asarray(ours_mask), ref_mask)
        np.testing.assert_allclose(np.asarray(ours), ref, rtol=1e-6)


class TestReproject:
    def test_identity_pose(self):
        k = make_intrinsic(fx=50.0, fy=50.0, cx=8.0, cy=8.0)[None]
        rng = np.random.default_rng(2)
        depth = rng.uniform(1.0, 2.0, size=(1, 16, 16)).astype(np.float32)
        pose = jnp.eye(4)[None]
        out, mask = G.reproject(jnp.asarray(depth), jnp.asarray(k), pose)
        np.testing.assert_allclose(np.asarray(out), depth, rtol=1e-5)
        assert bool(jnp.all(mask))

    def test_translation_shifts_depth(self):
        # Moving the camera forward (points move toward camera): depth drops.
        k = make_intrinsic(fx=50.0, fy=50.0, cx=8.0, cy=8.0)[None]
        depth = np.full((1, 16, 16), 2.0, np.float32)
        pose = np.eye(4, dtype=np.float32)[None].copy()
        pose[0, 2, 3] = -0.5
        out, mask = G.reproject(jnp.asarray(depth), jnp.asarray(k),
                                jnp.asarray(pose))
        got = np.asarray(out)[np.asarray(mask)]
        np.testing.assert_allclose(got, 1.5, rtol=1e-6)


class TestOcclusionFilter:
    def test_speckle_replaced_by_local_min(self):
        depth = np.full((1, 5, 5), 1.0, np.float32)
        depth[0, 2, 2] = 2.0  # punch-through speckle
        mask = np.ones((1, 5, 5), bool)
        out, m = G.occlusion_filter(jnp.asarray(depth), jnp.asarray(mask))
        assert float(out[0, 2, 2]) == 1.0
        np.testing.assert_array_equal(np.asarray(m), mask)

    def test_below_threshold_kept(self):
        depth = np.full((1, 5, 5), 1.0, np.float32)
        depth[0, 2, 2] = 1.03  # within 0.0375 of local min
        mask = np.ones((1, 5, 5), bool)
        out, _ = G.occlusion_filter(jnp.asarray(depth), jnp.asarray(mask))
        assert np.isclose(float(out[0, 2, 2]), 1.03)

    def test_invalid_pixels_treated_as_inf(self):
        depth = np.zeros((1, 3, 3), np.float32)
        depth[0, 1, 1] = 1.0
        mask = np.zeros((1, 3, 3), bool)
        mask[0, 1, 1] = True
        out, _ = G.occlusion_filter(jnp.asarray(depth), jnp.asarray(mask))
        # center keeps own value (it is the neighborhood min among valid)
        assert float(out[0, 1, 1]) == 1.0


class TestImageCondition:
    def test_shapes_and_range(self):
        k = jnp.asarray(make_intrinsic(50.0, 50.0, 8.0, 8.0)[None])
        depth01 = jnp.full((1, 16, 16), 0.2)
        pose = jnp.eye(4)[None]
        cond = G.image_condition(depth01, k, pose)
        assert cond.shape == (1, 16, 16, 2)
        assert float(cond.min()) >= -1.0 and float(cond.max()) <= 1.0
        # identity pose: mask channel fully valid -> +1, depth ch = 2*d01-1
        np.testing.assert_allclose(np.asarray(cond[..., 1]), 1.0)
        np.testing.assert_allclose(np.asarray(cond[..., 0]), -0.6, rtol=1e-6)

    def test_mask_recovery(self):
        k = jnp.asarray(make_intrinsic(50.0, 50.0, 8.0, 8.0)[None])
        cond = G.null_image_condition(2, 8)
        mask = G.mask_from_image_condition(cond)
        assert mask.shape == (2, 8, 8)
        assert not bool(mask.any())


class TestParamVector:
    def test_values(self):
        k = jnp.asarray(make_intrinsic(1.0, 2.0, 3.0, 4.0)[None])
        np.testing.assert_allclose(
            np.asarray(G.param_vector(k)), [[1.0, 2.0, 3.0, 4.0]])


def test_point_cloud_np_matches_device_path():
    k = make_intrinsic(fx=80.0, fy=80.0, cx=16.0, cy=12.0)
    rng = np.random.default_rng(3)
    depth = rng.uniform(0.5, 3.0, size=(24, 32)).astype(np.float32)
    depth[0, 0] = 0.0
    host = G.point_cloud_np(depth, k)
    pts, valid = G.depth_to_points(jnp.asarray(depth)[None],
                                   jnp.asarray(k)[None])
    dev = np.asarray(pts)[0][np.asarray(valid)[0]]
    np.testing.assert_allclose(host, dev, rtol=1e-5)
