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

    def test_flip_matches_reference_transform_order(self):
        """Flip applies BETWEEN resize and crop (reference order Resize ->
        RandomHorizontalFlip -> CenterCrop, sdd:1535-1542). 480x640 -> 64
        gives width 85, crop margin 21 (odd): the result is NOT the mirror
        of the unflipped crop — it is the crop of the mirrored image."""
        raw = np.arange(480 * 640, dtype=np.uint16).reshape(480, 640) % 9999
        b = native.depth_preprocess(raw, 64, flip=True)
        resized = imageio16.resize_nearest_short_side(raw, 64)
        ref = imageio16.center_crop(
            resized[:, ::-1], 64).astype(np.float32) * 1e-4
        ref = np.where(ref > 1.0, 0.0, ref)
        np.testing.assert_allclose(b, ref, atol=1e-7)
        # odd margin: flip-then-crop differs from crop-then-flip by one col
        a = native.depth_preprocess(raw, 64, flip=False)
        assert not np.array_equal(a, b[:, ::-1])

    def test_clip(self):
        raw = np.full((480, 640), 60000, np.uint16)  # 6.0 > 1 -> 0
        out = native.depth_preprocess(raw, 32)
        np.testing.assert_allclose(out, 0.0)


class TestStaleBinaryCleanup:
    def test_load_removes_superseded_hashes(self):
        """Superseded builds (other hash tags, the legacy unhashed name)
        must be unlinked on load, not accumulate one .so per revision."""
        assert native._load() is not None  # current build exists
        parent = native._LIB_PATH.parent
        stale = [parent / "_pointreggpt_native.so",
                 parent / "_pointreggpt_native-deadbeef0000.so"]
        for p in stale:
            p.write_bytes(b"stale")
        # force a re-load pass (the lib object itself is process-cached)
        native._lib = None
        assert native._load() is not None
        for p in stale:
            assert not p.exists(), f"stale binary survived: {p}"
        assert native._LIB_PATH.exists()


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


class TestPng16Decode:
    """Native zlib PNG decoder vs PIL on the production 16-bit grayscale
    format (every writer in the pipeline: cv2, PIL)."""

    def _skip_if_unavailable(self):
        import pytest

        if not native.is_available():
            pytest.skip("native library unavailable")

    def test_matches_pil_cv2_written(self, tmp_path):
        self._skip_if_unavailable()
        import cv2
        from PIL import Image

        rng = np.random.default_rng(5)
        for shape in [(480, 640), (37, 61), (1, 1), (300, 500)]:
            raw = rng.integers(0, 65536, shape).astype(np.uint16)
            p = tmp_path / f"{shape[0]}x{shape[1]}.png"
            cv2.imwrite(str(p), raw)
            data = p.read_bytes()
            got = native.png16_decode(data)
            ref = np.asarray(Image.open(p))
            np.testing.assert_array_equal(got, ref)
            np.testing.assert_array_equal(got, raw)

    def test_matches_pil_pil_written(self, tmp_path):
        self._skip_if_unavailable()
        from PIL import Image

        rng = np.random.default_rng(6)
        raw = rng.integers(0, 65536, (128, 96)).astype(np.uint16)
        p = tmp_path / "pil.png"
        Image.fromarray(raw).save(p)
        got = native.png16_decode(p.read_bytes())
        np.testing.assert_array_equal(got, raw)

    def test_smooth_image_exercises_filters(self, tmp_path):
        # gradients make PNG encoders pick sub/up/avg/paeth filters
        self._skip_if_unavailable()
        import cv2

        yy, xx = np.meshgrid(np.arange(240), np.arange(320), indexing="ij")
        raw = (yy * 37 + xx * 13 + (yy * xx) % 251).astype(np.uint16)
        p = tmp_path / "smooth.png"
        cv2.imwrite(str(p), raw)
        got = native.png16_decode(p.read_bytes())
        np.testing.assert_array_equal(got, raw)

    def test_unsupported_format_returns_none(self, tmp_path):
        self._skip_if_unavailable()
        from PIL import Image

        rgb = Image.new("RGB", (8, 8), (255, 0, 0))
        p = tmp_path / "rgb.png"
        rgb.save(p)
        assert native.png16_decode(p.read_bytes()) is None
        assert native.png16_depth_preprocess(p.read_bytes(), 8) is None
        # the imageio16 wrapper falls back to PIL transparently
        out = imageio16.read_depth_png(p)
        assert out.shape == (8, 8, 3)

    def test_fused_preprocess_matches_python(self, tmp_path):
        self._skip_if_unavailable()
        import cv2

        rng = np.random.default_rng(7)
        raw = rng.integers(0, 12000, (480, 640)).astype(np.uint16)
        p = tmp_path / "f.png"
        cv2.imwrite(str(p), raw)
        for flip in (False, True):
            ref = imageio16.load_depth_model_space(p, 256, flip=flip,
                                                   use_native=False)
            got = native.png16_depth_preprocess(p.read_bytes(), 256,
                                                flip=flip)
            np.testing.assert_array_equal(ref, got)
            via_loader = imageio16.load_depth_model_space(p, 256, flip=flip)
            np.testing.assert_array_equal(ref, via_loader)

    def test_corrupt_header_rejected_not_fatal(self):
        """An IHDR claiming huge dimensions must not reach the decode
        buffers (a std::bad_alloc cannot cross the C ABI and would
        std::terminate the whole training process). Over-cap dims return
        None — a LEGITIMATE huge 16-bit PNG then decodes via the PIL
        fallback (which has its own decompression-bomb guard) instead of
        crashing the loader."""
        self._skip_if_unavailable()
        import struct

        def ihdr(w, h):
            sig = bytes([137, 80, 78, 71, 13, 10, 26, 10])
            body = struct.pack(">II", w, h) + bytes([16, 0, 0, 0, 0])
            return sig + struct.pack(">I", 13) + b"IHDR" + body + b"\0" * 4

        for w, h in ((1 << 24, 1 << 24),   # per-dim over the cap
                     (60000, 60000)):      # dims ok, product over 64 Mpix
            assert native.png16_decode(ihdr(w, h)) is None
            assert native.png16_depth_preprocess(ihdr(w, h), 256) is None
        # non-PNG bytes (bad signature) return None — a TIFF/JPEG
        # mislabeled *.png must reach the PIL fallback, which decodes by
        # content like the reference pipeline, not kill the dataloader
        assert native.png16_decode(b"\x00" * 64) is None
        assert native.png16_depth_preprocess(b"\x00" * 64, 256) is None
        # the real production size still parses
        import cv2

        raw = np.zeros((480, 640), np.uint16)
        ok, buf = cv2.imencode(".png", raw)
        assert ok
        assert native.png16_decode(buf.tobytes()).shape == (480, 640)

    def test_fallback_decodes_bytes_once(self, tmp_path, monkeypatch):
        """When the fused native call rejects a non-16-bit-gray PNG, the
        loader decodes the already-read bytes with PIL instead of
        re-reading the file and re-attempting native decode."""
        self._skip_if_unavailable()
        from PIL import Image

        gray8 = Image.fromarray(np.full((300, 400), 120, np.uint8))
        p = tmp_path / "gray8.png"
        gray8.save(p)

        calls = {"decode": 0}
        orig = native.png16_decode

        def counting(data):
            calls["decode"] += 1
            return orig(data)

        monkeypatch.setattr(native, "png16_decode", counting)
        out = imageio16.load_depth_model_space(p, 256)
        assert out.shape == (256, 256)
        assert calls["decode"] == 0, "fallback must not retry native decode"

    def test_every_filter_type_hand_crafted(self):
        """Encoders pick filters adaptively, so force each PNG filter type
        (0=None,1=Sub,2=Up,3=Average,4=Paeth) on every scanline of a
        hand-assembled PNG and check the native unfilter against PIL."""
        self._skip_if_unavailable()
        import io
        import struct
        import zlib

        from PIL import Image

        def chunk(tag, body):
            return (struct.pack(">I", len(body)) + tag + body +
                    struct.pack(">I", zlib.crc32(tag + body)))

        rng = np.random.default_rng(11)
        h, w = 23, 17
        raw = rng.integers(0, 65536, (h, w)).astype(np.uint16)
        big = raw.astype(">u2").tobytes()  # PNG is big-endian
        rows = [big[r * w * 2:(r + 1) * w * 2] for r in range(h)]

        def paeth(a, b, c):
            pp = a + b - c
            pa, pb, pc = abs(pp - a), abs(pp - b), abs(pp - c)
            return a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)

        for ftype in range(5):
            scan = bytearray()
            prev = bytes(w * 2)
            for row in rows:
                scan.append(ftype)
                for i, x in enumerate(row):
                    a = row[i - 2] if i >= 2 else 0
                    b = prev[i]
                    c = prev[i - 2] if i >= 2 else 0
                    if ftype == 0:
                        f = x
                    elif ftype == 1:
                        f = (x - a) & 0xFF
                    elif ftype == 2:
                        f = (x - b) & 0xFF
                    elif ftype == 3:
                        f = (x - (a + b) // 2) & 0xFF
                    else:
                        f = (x - paeth(a, b, c)) & 0xFF
                    scan.append(f)
                prev = row
            ihdr = struct.pack(">IIBBBBB", w, h, 16, 0, 0, 0, 0)
            png = (bytes([137, 80, 78, 71, 13, 10, 26, 10]) +
                   chunk(b"IHDR", ihdr) +
                   chunk(b"IDAT", zlib.compress(bytes(scan))) +
                   chunk(b"IEND", b""))
            ref = np.asarray(Image.open(io.BytesIO(png)))
            np.testing.assert_array_equal(ref, raw,
                                          err_msg=f"filter {ftype} (PIL)")
            got = native.png16_decode(png)
            np.testing.assert_array_equal(got, raw,
                                          err_msg=f"filter {ftype}")
