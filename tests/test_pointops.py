"""Unit tests for core.pointops: voxel downsampling, radius search, overlap."""

import jax.numpy as jnp
import numpy as np

from pointreggpt_tpu.core import pointops as P
from pointreggpt_tpu.core import sampling as S


def pad_cloud(points, capacity):
    n = points.shape[0]
    out = np.zeros((capacity, 3), np.float32)
    out[:n] = points
    valid = np.zeros((capacity,), bool)
    valid[:n] = True
    return jnp.asarray(out), jnp.asarray(valid)


class TestVoxelDownsample:
    def test_merges_points_in_same_voxel(self):
        pts = np.array(
            [[0.01, 0.01, 0.01], [0.02, 0.02, 0.02],  # same 0.1-voxel
             [0.55, 0.55, 0.55]], np.float32)
        p, v = pad_cloud(pts, 8)
        out, out_v = P.voxel_downsample(p, v, 0.1)
        out, out_v = np.asarray(out), np.asarray(out_v)
        assert out_v.sum() == 2
        got = sorted(out[out_v].tolist())
        np.testing.assert_allclose(got[0], [0.015, 0.015, 0.015], atol=1e-6)
        np.testing.assert_allclose(got[1], [0.55, 0.55, 0.55], atol=1e-6)

    def test_open3d_half_cell_origin(self):
        """Open3D's VoxelDownSample quantizes from min_bound - voxel/2:
        1-D points [0, .09, .11, .19] at voxel 0.1 group
        {0},{.09,.11},{.19} (origin -0.05) — NOT {0,.09},{.11,.19} as a
        plain min-bound origin would."""
        pts = np.array([[0.0, 0, 0], [0.09, 0, 0], [0.11, 0, 0],
                        [0.19, 0, 0]], np.float32)
        p, v = pad_cloud(pts, 8)
        out, out_v = P.voxel_downsample(p, v, 0.1)
        out, out_v = np.asarray(out), np.asarray(out_v)
        assert out_v.sum() == 3
        got = sorted(x[0] for x in out[out_v].tolist())
        np.testing.assert_allclose(got, [0.0, 0.10, 0.19], atol=1e-6)

    def test_valid_entries_lead(self):
        rng = np.random.default_rng(0)
        pts = rng.uniform(0, 1, (50, 3)).astype(np.float32)
        p, v = pad_cloud(pts, 64)
        out, out_v = P.voxel_downsample(p, v, 0.25)
        out_v = np.asarray(out_v)
        k = out_v.sum()
        assert out_v[:k].all() and not out_v[k:].any()

    def test_voxel_floor_semantics(self):
        # points straddling a voxel boundary must not merge
        pts = np.array([[0.09, 0.0, 0.0], [0.11, 0.0, 0.0]], np.float32)
        p, v = pad_cloud(pts, 4)
        _, out_v = P.voxel_downsample(p, v, 0.1, origin=jnp.zeros(3))
        assert np.asarray(out_v).sum() == 2

    def test_all_invalid(self):
        p, v = pad_cloud(np.zeros((0, 3), np.float32), 4)
        out, out_v = P.voxel_downsample(p, v, 0.1)
        assert not np.asarray(out_v).any()

    def test_centroid_count_matches_grid(self):
        # 1000 random points in unit cube, voxel 0.5 -> at most 8 voxels,
        # each centroid inside its voxel.
        rng = np.random.default_rng(1)
        pts = rng.uniform(0, 1, (1000, 3)).astype(np.float32)
        p, v = pad_cloud(pts, 1024)
        out, out_v = P.voxel_downsample(p, v, 0.5, origin=jnp.zeros(3))
        out, out_v = np.asarray(out), np.asarray(out_v)
        assert out_v.sum() == 8
        cells = np.floor(out[out_v] / 0.5).astype(int)
        assert np.unique(cells, axis=0).shape[0] == 8


class TestVoxelDownsamplePacked:
    """The round-5 scatter-free voxel_downsample path vs its scatter
    anchor: identical output order (voxel order, valid prefix), centroids
    to fp re-association noise, exact fallback past the packed range."""

    def _rand(self, seed, n=1024, frac=0.8, span=2.0):
        rng = np.random.default_rng(seed)
        pts = jnp.asarray(rng.uniform(-span, span, (n, 3)), jnp.float32)
        valid = jnp.asarray(rng.uniform(size=n) < frac)
        return pts, valid

    def test_packed_matches_scatter_order_and_values(self):
        for seed in range(3):
            pts, valid = self._rand(seed)
            q, in_range = P._quantize(pts[None], valid[None], 0.1, None)
            assert bool(in_range)
            ref_p, ref_v = P._voxel_downsample_scatter(pts, valid, q[0])
            out_p, out_v = P.voxel_downsample(pts, valid, 0.1)
            np.testing.assert_array_equal(np.asarray(ref_v),
                                          np.asarray(out_v))
            np.testing.assert_allclose(np.asarray(ref_p), np.asarray(out_p),
                                       atol=1e-5)

    def test_out_of_range_falls_back_exactly(self):
        pts, valid = self._rand(7, span=2000.0)  # 40k cells at voxel 0.1
        q, in_range = P._quantize(pts[None], valid[None], 0.1, None)
        assert not bool(in_range)
        ref_p, ref_v = P._voxel_downsample_scatter(pts, valid, q[0])
        out_p, out_v = P.voxel_downsample(pts, valid, 0.1)
        np.testing.assert_array_equal(np.asarray(ref_v), np.asarray(out_v))
        np.testing.assert_allclose(np.asarray(ref_p), np.asarray(out_p),
                                   atol=1e-4)

    def test_negative_origin_override_falls_back(self):
        # origin=0 with negative coordinates -> q < 0 -> scatter path
        pts = jnp.asarray([[-0.25, 0.1, 0.1], [0.15, 0.1, 0.1]], jnp.float32)
        valid = jnp.ones((2,), bool)
        _, in_range = P._quantize(pts[None], valid[None], 0.1,
                                  jnp.zeros(3))
        assert not bool(in_range)
        out_p, out_v = P.voxel_downsample(pts, valid, 0.1,
                                          origin=jnp.zeros(3))
        assert np.asarray(out_v).sum() == 2

    def test_batched_matches_unbatched(self):
        pts0, val0 = self._rand(1)
        pts1, val1 = self._rand(2, frac=0.3)
        b_pts = jnp.stack([pts0, pts1])
        b_val = jnp.stack([val0, val1])
        out_p, out_v = P.voxel_downsample_batched(b_pts, b_val, 0.1)
        for i in range(2):
            ref_p, ref_v = P.voxel_downsample(b_pts[i], b_val[i], 0.1)
            np.testing.assert_array_equal(np.asarray(ref_v),
                                          np.asarray(out_v[i]))
            np.testing.assert_allclose(np.asarray(ref_p),
                                       np.asarray(out_p[i]), atol=1e-5)

    def test_batched_whole_batch_fallback_matches(self):
        # ONE row out of range sends the WHOLE batch down the scatter path
        pts0, val0 = self._rand(3)
        pts1, val1 = self._rand(4, span=2000.0)
        b_pts = jnp.stack([pts0, pts1])
        b_val = jnp.stack([val0, val1])
        out_p, out_v = P.voxel_downsample_batched(b_pts, b_val, 0.1)
        for i in range(2):
            ref_p, ref_v = P.voxel_downsample(b_pts[i], b_val[i], 0.1)
            np.testing.assert_array_equal(np.asarray(ref_v),
                                          np.asarray(out_v[i]))
            np.testing.assert_allclose(np.asarray(ref_p),
                                       np.asarray(out_p[i]), atol=1e-4)


class TestRadiusSearch:
    def test_any_within_radius(self):
        src = np.array([[0, 0, 0], [1, 0, 0], [5, 5, 5]], np.float32)
        tgt = np.array([[0.05, 0, 0], [1.2, 0, 0]], np.float32)
        s, sv = pad_cloud(src, 4)
        t, tv = pad_cloud(tgt, 4)
        hits = np.asarray(P.any_within_radius(s, sv, t, tv, 0.1))
        np.testing.assert_array_equal(hits[:3], [True, False, False])
        assert not hits[3]  # padding never hits

    def test_padding_target_never_matches(self):
        # tgt padding rows are at the origin; a src point at the origin must
        # not match them.
        src = np.array([[0.0, 0.0, 0.0]], np.float32)
        s, sv = pad_cloud(src, 2)
        t, tv = pad_cloud(np.zeros((0, 3), np.float32), 4)
        hits = np.asarray(P.any_within_radius(s, sv, t, tv, 10.0))
        assert not hits.any()

    def test_min_dist_sq(self):
        src = np.array([[0, 0, 0], [3, 0, 0]], np.float32)
        tgt = np.array([[1, 0, 0]], np.float32)
        s, sv = pad_cloud(src, 2)
        t, tv = pad_cloud(tgt, 2)
        d = np.asarray(P.min_dist_sq(s, sv, t, tv))
        np.testing.assert_allclose(d, [1.0, 4.0], rtol=1e-6)

    def test_blocking_invariance(self):
        rng = np.random.default_rng(2)
        src = rng.normal(size=(37, 3)).astype(np.float32)
        tgt = rng.normal(size=(53, 3)).astype(np.float32)
        s, sv = pad_cloud(src, 40)
        t, tv = pad_cloud(tgt, 60)
        a = np.asarray(P.any_within_radius(s, sv, t, tv, 0.5, block=8))
        b = np.asarray(P.any_within_radius(s, sv, t, tv, 0.5, block=64))
        np.testing.assert_array_equal(a, b)


class TestOverlap:
    def test_identical_clouds_full_overlap(self):
        rng = np.random.default_rng(3)
        pts = rng.uniform(0, 1, (200, 3)).astype(np.float32)
        p, v = pad_cloud(pts, 256)
        ov1, ov2 = P.overlap_ratio(p, v, p, v, voxel_size=0.05)
        assert float(ov1) == 1.0 and float(ov2) == 1.0

    def test_disjoint_clouds_zero_overlap(self):
        rng = np.random.default_rng(4)
        a = rng.uniform(0, 1, (100, 3)).astype(np.float32)
        b = a + 100.0
        pa, va = pad_cloud(a, 128)
        pb, vb = pad_cloud(b, 128)
        ov1, ov2 = P.overlap_ratio(pa, va, pb, vb, voxel_size=0.05)
        assert float(ov1) == 0.0 and float(ov2) == 0.0

    def test_empty_cloud_gives_nan(self):
        # matches the reference's 0/0 -> NaN, filtered by generate_gt
        pa, va = pad_cloud(np.zeros((0, 3), np.float32), 8)
        pb, vb = pad_cloud(np.ones((5, 3), np.float32), 8)
        ov1, _ = P.overlap_ratio(pa, va, pb, vb)
        assert np.isnan(float(ov1))

    def test_half_overlap(self):
        # two unit segments sharing half their extent
        xs = np.linspace(0, 1.0, 101, dtype=np.float32)
        a = np.stack([xs, np.zeros_like(xs), np.zeros_like(xs)], -1)
        b = a.copy()
        b[:, 0] += 0.5
        pa, va = pad_cloud(a, 128)
        pb, vb = pad_cloud(b, 128)
        ov1, ov2 = P.overlap_ratio(
            pa, va, pb, vb, voxel_size=0.025, downsample=True)
        assert 0.4 < float(ov1) < 0.65
        assert 0.4 < float(ov2) < 0.65


class TestCropBbox:
    def test_mask(self):
        pts = jnp.asarray(
            np.array([[0, 0, 1], [5, 0, 1], [0, 0, 9]], np.float32))
        valid = jnp.ones((3,), bool)
        m = P.crop_bbox(pts, valid, (-1.5, -1.5, 0.5), (1.5, 1.5, 3.5))
        np.testing.assert_array_equal(np.asarray(m), [True, False, False])


class TestCorrespondences:
    def test_pairs_within_radius(self):
        src = np.array([[0, 0, 0], [1, 0, 0]], np.float64)
        tgt = np.array([[0.02, 0, 0], [1.01, 0, 0], [9, 9, 9]], np.float64)
        pairs = P.correspondences_np(src, tgt, np.eye(4), 0.05)
        got = set(map(tuple, pairs.tolist()))
        assert got == {(0, 0), (1, 1)}

    def test_transform_applied_to_src(self):
        src = np.array([[1.0, 0, 0]])
        tgt = np.array([[0.0, 1.0, 0]])
        rot = np.eye(4)
        rot[:3, :3] = S.euler_xyz_intrinsic_to_matrix(
            jnp.asarray([0.0, 0.0, np.pi / 2]))
        pairs = P.correspondences_np(src, tgt, rot, 1e-3)
        assert pairs.shape[0] == 1

    def test_ragged_sizes_match_bruteforce(self):
        rng = np.random.default_rng(11)
        for n, m in ((37, 100), (513, 700), (2049, 3)):
            src = rng.uniform(-1, 1, size=(n, 3))
            tgt = rng.uniform(-1, 1, size=(m, 3))
            pairs = P.correspondences_np(src, tgt, np.eye(4), 0.2)
            d = np.linalg.norm(src[:, None] - tgt[None], axis=-1)
            want = set(zip(*np.nonzero(d <= 0.2)))
            assert set(map(tuple, pairs.tolist())) == want

    def test_shared_compile_cache_across_items(self):
        """Per-item dataloader calls must reuse the jitted program: clouds
        of different sizes within one pad bucket share a single compile
        (the old per-call closure rebuilt + re-shipped tgt every item)."""
        rng = np.random.default_rng(0)
        base = P._corr_block_mask._cache_size()
        for m in (100, 200, 300):
            src = rng.normal(size=(50, 3)).astype(np.float32)
            tgt = rng.normal(size=(m, 3)).astype(np.float32)
            P.correspondences_np(src, tgt, np.eye(4), 0.1)
        assert P._corr_block_mask._cache_size() <= base + 1


class TestSampling:
    def test_euler_matches_scipy(self):
        from scipy.spatial.transform import Rotation

        rng = np.random.default_rng(5)
        ang = rng.uniform(-np.pi, np.pi, size=(10, 3))
        ours = np.asarray(S.euler_xyz_intrinsic_to_matrix(jnp.asarray(ang)))
        ref = Rotation.from_euler("XYZ", ang).as_matrix()
        np.testing.assert_allclose(ours, ref, atol=1e-6)

    def test_random_pose_properties(self):
        import jax

        key = jax.random.PRNGKey(0)
        pose = np.asarray(S.random_sample_pose(key, 16))
        assert pose.shape == (16, 4, 4)
        # rotations orthonormal
        rr = pose[:, :3, :3] @ np.transpose(pose[:, :3, :3], (0, 2, 1))
        np.testing.assert_allclose(rr, np.tile(np.eye(3), (16, 1, 1)),
                                   atol=1e-5)
        # pivot invariant: R @ c + t has z == 3 when random z-trans is 0.
        c = np.array([0.0, 0.0, 3.0])
        moved = pose[:, :3, :3] @ c + pose[:, :3, 3]
        np.testing.assert_allclose(moved[:, 2], 3.0, atol=0.5)

    def test_random_transform_zero_translation(self):
        import jax

        key = jax.random.PRNGKey(1)
        intr = S.random_sample_intrinsic(key, 8)
        pose = np.asarray(S.random_sample_transform(key, intr))
        np.testing.assert_allclose(pose[:, :3, 3], 0.0)

    def test_haar_rotation_uniformity_basic(self):
        import jax

        rot = np.asarray(S.haar_uniform_rotation(jax.random.PRNGKey(2), 32))
        dets = np.linalg.det(rot)
        np.testing.assert_allclose(dets, 1.0, atol=1e-5)

    def test_intrinsic_candidates(self):
        import jax

        k = np.asarray(S.random_sample_intrinsic(jax.random.PRNGKey(3), 64))
        # every sample is one of the 6 candidates
        cands = S.INTRINSIC_CANDIDATES
        for ki in k:
            assert any(np.allclose(ki, c) for c in cands)


class TestKeepNearest:
    def test_overflow_drops_farthest_deterministically(self):
        from pointreggpt_tpu.core.pointops import keep_nearest

        pts = jnp.asarray(
            np.array([[0.1, 0, 0], [3.0, 0, 0], [0, 0.2, 0], [0, 0, 2.0],
                      [0.3, 0.3, 0.3], [9.0, 9.0, 9.0]], np.float32))
        valid = jnp.asarray([True, True, True, True, True, False])
        out, ov, overflow = keep_nearest(pts, valid, 3)
        assert out.shape == (3, 3) and ov.shape == (3,)
        assert int(overflow) == 2  # 5 valid - 3 kept
        kept = np.asarray(out)[np.asarray(ov)]
        # the three nearest-to-origin survive (sorted by distance)
        expect = np.array([[0.1, 0, 0], [0, 0.2, 0], [0.3, 0.3, 0.3]],
                          np.float32)
        order = np.argsort(np.sum(kept**2, axis=-1))
        np.testing.assert_allclose(kept[order], expect, atol=1e-6)
        # pure function: same inputs, same result
        out2, ov2, overflow2 = keep_nearest(pts, valid, 3)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(out2))

    def test_underflow_pads_and_reports_zero(self):
        from pointreggpt_tpu.core.pointops import keep_nearest

        pts = jnp.asarray(np.array([[1, 0, 0], [0, 2, 0]], np.float32))
        valid = jnp.asarray([True, False])
        out, ov, overflow = keep_nearest(pts, valid, 5)
        assert out.shape == (5, 3)
        assert int(overflow) == 0
        assert int(ov.sum()) == 1

    def test_batched_with_capacity_smaller_than_n(self):
        from pointreggpt_tpu.core.pointops import keep_nearest

        rng = np.random.default_rng(0)
        pts = jnp.asarray(rng.normal(size=(2, 32, 3)).astype(np.float32))
        valid = jnp.asarray(rng.uniform(size=(2, 32)) > 0.3)
        out, ov, overflow = keep_nearest(pts, valid, 8)
        assert out.shape == (2, 8, 3) and ov.shape == (2, 8)
        occ = np.asarray(valid).sum(axis=1)
        np.testing.assert_array_equal(np.asarray(overflow),
                                      np.maximum(occ - 8, 0))
        # kept distances are the smallest valid distances per batch
        d2 = np.sum(np.asarray(pts) ** 2, axis=-1)
        for b in range(2):
            vd = np.sort(d2[b][np.asarray(valid)[b]])
            kd = np.sort(np.sum(np.asarray(out)[b][np.asarray(ov)[b]]**2,
                                axis=-1))
            np.testing.assert_allclose(kd, vd[:len(kd)], rtol=1e-6)


class TestMemoryVoxelUpdate:
    """The fused scene-memory update must match the round-4 composition
    (concat -> vmap(voxel_downsample) -> keep_nearest) set-wise."""

    @staticmethod
    def _compose(mp, mv, np_, nv, voxel, cap):
        import jax

        merged = jnp.concatenate([mp, np_], axis=1)
        merged_valid = jnp.concatenate([mv, nv], axis=1)
        down, down_valid = jax.vmap(
            lambda p, v: P.voxel_downsample(p, v, voxel))(
                merged, merged_valid)
        return P.keep_nearest(down, down_valid, cap, valid_is_prefix=True)

    @staticmethod
    def _clouds(seed, b=2, m=256, k=96, span=1.0):
        rng = np.random.default_rng(seed)
        mp = rng.uniform(-span, span, (b, m, 3)).astype(np.float32)
        mv = rng.uniform(size=(b, m)) < 0.95
        np_ = rng.uniform(-span, span, (b, k, 3)).astype(np.float32)
        nv = rng.uniform(size=(b, k)) < 0.9
        return (jnp.asarray(mp), jnp.asarray(mv),
                jnp.asarray(np_), jnp.asarray(nv))

    def _assert_set_parity(self, got, want):
        gp, gv, gof = map(np.asarray, got)
        wp, wv, wof = map(np.asarray, want)
        np.testing.assert_array_equal(gof, wof)
        np.testing.assert_array_equal(gv.sum(axis=1), wv.sum(axis=1))
        for b in range(gp.shape[0]):
            a = gp[b][gv[b]]
            c = wp[b][wv[b]]
            a = a[np.lexsort(a.T)]
            c = c[np.lexsort(c.T)]
            np.testing.assert_allclose(a, c, atol=1e-5)

    def test_matches_composition_with_overflow(self):
        mp, mv, np_, nv = self._clouds(0)
        # tiny voxel: nearly every point its own centroid -> overflow at 128
        got = P.memory_voxel_update(mp, mv, np_, nv, 0.01, 128)
        want = self._compose(mp, mv, np_, nv, 0.01, 128)
        assert np.asarray(got[2]).min() > 0  # the capacity bound engaged
        self._assert_set_parity(got, want)

    def test_matches_composition_no_overflow(self):
        mp, mv, np_, nv = self._clouds(1)
        # coarse voxel: few centroids, no overflow
        got = P.memory_voxel_update(mp, mv, np_, nv, 0.5, 128)
        want = self._compose(mp, mv, np_, nv, 0.5, 128)
        assert np.asarray(got[2]).max() == 0
        self._assert_set_parity(got, want)

    def test_span_overflow_falls_back_to_composition(self):
        mp, mv, np_, nv = self._clouds(2)
        # one far-away VALID point blows the 2^15-cell packed range at
        # voxel 0.01 (span 655 m >> 327 m) -> the lax.cond fallback runs
        mp = mp.at[0, 0].set(jnp.asarray([655.0, 0.0, 0.0]))
        mv = mv.at[0, 0].set(True)
        got = P.memory_voxel_update(mp, mv, np_, nv, 0.01, 128)
        want = self._compose(mp, mv, np_, nv, 0.01, 128)
        # the fallback IS the composition: exact, order included
        for g, w in zip(got, want):
            np.testing.assert_array_equal(np.asarray(g), np.asarray(w))

    def test_all_invalid(self):
        mp, mv, np_, nv = self._clouds(3)
        mv = jnp.zeros_like(mv)
        nv = jnp.zeros_like(nv)
        out, ov, of = P.memory_voxel_update(mp, mv, np_, nv, 0.05, 64)
        assert not np.asarray(ov).any()
        np.testing.assert_array_equal(np.asarray(of), 0)

    def test_capacity_at_least_n_pads(self):
        mp, mv, np_, nv = self._clouds(4, m=32, k=16)
        out, ov, of = P.memory_voxel_update(mp, mv, np_, nv, 0.05, 64)
        assert out.shape == (2, 64, 3) and ov.shape == (2, 64)
        np.testing.assert_array_equal(np.asarray(of), 0)

    def test_overflow_keeps_nearest_origin_set(self):
        mp, mv, np_, nv = self._clouds(5, span=2.0)
        out, ov, of = map(np.asarray,
                          P.memory_voxel_update(mp, mv, np_, nv, 0.01, 64))
        want = self._compose(mp, mv, np_, nv, 0.01, 64)
        # kept distance multiset equals the composition's keep_nearest pick
        for b in range(2):
            kd = np.sort(np.sum(out[b][ov[b]] ** 2, axis=-1))
            wd = np.sort(np.sum(np.asarray(want[0])[b][
                np.asarray(want[1])[b]] ** 2, axis=-1))
            np.testing.assert_allclose(kd, wd, rtol=1e-5)

    def test_jit_deterministic(self):
        import jax

        mp, mv, np_, nv = self._clouds(6)
        f = jax.jit(lambda a, b, c, d: P.memory_voxel_update(
            a, b, c, d, 0.02, 128))
        a = jax.tree_util.tree_map(np.asarray, f(mp, mv, np_, nv))
        b = jax.tree_util.tree_map(np.asarray, f(mp, mv, np_, nv))
        for x, y in zip(a, b):
            np.testing.assert_array_equal(x, y)
