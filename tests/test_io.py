"""PLY / 16-bit PNG I/O round-trip tests (output-contract checks)."""

import numpy as np
import pytest

from pointreggpt_tpu.core import imageio16, plyio


class TestPly:
    def test_roundtrip_binary(self, tmp_path):
        rng = np.random.default_rng(0)
        pts = rng.normal(size=(100, 3))
        path = tmp_path / "a.ply"
        plyio.write_ply(path, pts)
        got = plyio.read_ply(path)
        np.testing.assert_allclose(got, pts.astype(np.float32), rtol=1e-6)

    def test_roundtrip_double(self, tmp_path):
        pts = np.array([[1.000000001, 2.0, 3.0]])
        path = tmp_path / "b.ply"
        plyio.write_ply(path, pts, dtype="double")
        got = plyio.read_ply(path)
        np.testing.assert_allclose(got, pts, rtol=0, atol=0)

    def test_drops_nonfinite(self, tmp_path):
        pts = np.array([[1.0, 2.0, 3.0], [np.nan, 0, 0], [np.inf, 0, 0]])
        path = tmp_path / "c.ply"
        plyio.write_ply(path, pts)
        got = plyio.read_ply(path)
        assert got.shape == (1, 3)

    def test_reads_ascii(self, tmp_path):
        path = tmp_path / "d.ply"
        path.write_text(
            "ply\nformat ascii 1.0\nelement vertex 2\n"
            "property float x\nproperty float y\nproperty float z\n"
            "end_header\n1 2 3\n4 5 6\n")
        got = plyio.read_ply(path)
        np.testing.assert_allclose(got, [[1, 2, 3], [4, 5, 6]])

    def test_reads_ascii_mesh_with_faces(self, tmp_path):
        """The standard MeshLab/Open3D mesh layout (vertex element first,
        face element after) must yield the vertices, ignoring faces —
        and a CRLF header (Windows writers) must parse."""
        path = tmp_path / "mesh.ply"
        path.write_bytes(
            ("ply\r\nformat ascii 1.0\r\nelement vertex 3\r\n"
             "property float x\r\nproperty float y\r\nproperty float z\r\n"
             "element face 1\r\nproperty list uchar int vertex_indices\r\n"
             "end_header\r\n"
             "0 0 0\r\n1 0 0\r\n0 1 0\r\n3 0 1 2\r\n").encode())
        got = plyio.read_ply(path)
        np.testing.assert_allclose(got, [[0, 0, 0], [1, 0, 0], [0, 1, 0]])

    def test_vertex_not_first_element_rejected(self, tmp_path):
        """A preceding element shifts the body offset — reading on would
        silently return garbage, so the layout must be rejected loudly."""
        import pytest

        path = tmp_path / "weird.ply"
        path.write_text(
            "ply\nformat ascii 1.0\n"
            "element edge 1\nproperty float w\n"
            "element vertex 1\n"
            "property float x\nproperty float y\nproperty float z\n"
            "end_header\n9.0\n1 2 3\n")
        with pytest.raises(ValueError, match="not the first element"):
            plyio.read_ply(path)

    def test_reads_extra_properties(self, tmp_path):
        # binary PLY with normals interleaved — x/y/z still extracted
        header = (
            "ply\nformat binary_little_endian 1.0\nelement vertex 2\n"
            "property float x\nproperty float y\nproperty float z\n"
            "property float nx\nproperty float ny\nproperty float nz\n"
            "end_header\n")
        body = np.arange(12, dtype="<f4").tobytes()
        path = tmp_path / "e.ply"
        path.write_bytes(header.encode() + body)
        got = plyio.read_ply(path)
        np.testing.assert_allclose(got, [[0, 1, 2], [6, 7, 8]])

    def test_open3d_compatible_header(self, tmp_path):
        # the downstream mixture dataloaders read these with Open3D; check
        # the header is fully standard.
        path = tmp_path / "f.ply"
        plyio.write_ply(path, np.zeros((3, 3)))
        head = path.read_bytes()[:200].decode("ascii", "replace")
        assert head.startswith("ply\nformat binary_little_endian 1.0\n")
        assert "element vertex 3" in head


class TestDepthPng:
    def test_roundtrip(self, tmp_path):
        rng = np.random.default_rng(1)
        depth01 = rng.uniform(0, 1, size=(32, 48)).astype(np.float32)
        path = tmp_path / "d.png"
        imageio16.write_depth_png(path, depth01)
        raw = imageio16.read_depth_png(path)
        assert raw.dtype == np.uint16
        np.testing.assert_allclose(raw * 1e-4, depth01, atol=1e-4)

    def test_load_model_space_pipeline(self, tmp_path):
        # uint16 mm depth, 480x640, constant 2.5 m -> 0.25 model units
        depth_mm = np.full((480, 640), 2500, np.uint16)
        import cv2
        path = tmp_path / "frame.png"
        cv2.imwrite(str(path), depth_mm)
        out = imageio16.load_depth_model_space(path, 256)
        assert out.shape == (256, 256)
        np.testing.assert_allclose(out, 0.25, atol=1e-4)

    def test_clip_above_10m_to_zero(self, tmp_path):
        depth_mm = np.full((480, 640), 60000, np.uint16)  # 60 m
        import cv2
        path = tmp_path / "far.png"
        cv2.imwrite(str(path), depth_mm)
        out = imageio16.load_depth_model_space(path, 64)
        np.testing.assert_allclose(out, 0.0)

    def test_resize_crop_geometry(self):
        img = np.zeros((480, 640), np.uint16)
        r = imageio16.resize_nearest_short_side(img, 256)
        assert r.shape == (256, 341)
        c = imageio16.center_crop(r, 256)
        assert c.shape == (256, 256)

    def test_resize_rounding_truncates_long_side(self):
        """torchvision T.Resize computes the long side as
        int(size * long / short) — truncation. 300x500 is rounding-
        sensitive (426.67: trunc 426 vs round 427); 640x480 is not
        (341.33 floors and rounds alike). The truncation must also agree
        with geometry.intrinsic_transform's floor so the pixel grid and
        the adjusted intrinsics stay aligned."""
        from pointreggpt_tpu.core import geometry as G

        img = np.zeros((300, 500), np.uint16)
        r = imageio16.resize_nearest_short_side(img, 256)
        assert r.shape == (256, 426)
        # portrait orientation too
        r2 = imageio16.resize_nearest_short_side(img.T.copy(), 256)
        assert r2.shape == (426, 256)

        # intrinsic_transform infers (w, h) = (2*cx, 2*cy); it must derive
        # the same resized long side (426) -> cx = 426/2 - crop_left
        intr = np.array([[400.0, 0, 250.0], [0, 400.0, 150.0], [0, 0, 1]])
        out = G.intrinsic_transform(intr, resize=256, centercrop=256)
        crop_left = round((426 - 256) / 2.0)
        assert out[0, 2] == 426 / 2 - crop_left

    def test_native_matches_python_at_rounding_sensitive_size(self, tmp_path):
        from pointreggpt_tpu import native

        if not native.is_available():
            import pytest
            pytest.skip("native library unavailable")
        rng = np.random.default_rng(7)
        raw = rng.integers(0, 12000, size=(300, 500)).astype(np.uint16)
        import cv2
        path = tmp_path / "odd.png"
        cv2.imwrite(str(path), raw)
        ref = imageio16.load_depth_model_space(path, 64, use_native=False)
        got = native.depth_preprocess(raw, 64)
        np.testing.assert_array_equal(ref, got)
