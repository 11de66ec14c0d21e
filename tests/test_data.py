"""Data-layer tests on a synthetic on-disk AMD-layout fixture."""

import numpy as np
import pytest

from comet_tpu.data import (
    AMDDataset,
    filter_and_pad,
    generate_amd_fixture,
    grid_points,
    mask_bbox,
    sample_evenly,
    sample_with_max_gap,
    seed_query_points,
)


@pytest.fixture(scope="module")
def amd_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("amd") / "AMD_eval"
    generate_amd_fixture(str(root), n_models=1, n_seqs=2, n_frames=12, img_hw=(120, 160))
    return str(root)


class TestSampling:
    def test_max_gap_constraints(self, rng):
        for _ in range(20):
            idx = sample_with_max_gap(100, 16, rng)
            assert len(idx) == 16
            steps = np.diff(idx)
            assert (steps >= 1).all() and (steps <= 8).all()
            assert idx[-1] < 100

    def test_too_few_frames_falls_back(self):
        idx = sample_with_max_gap(5, 8)
        assert len(idx) == 8

    def test_evenly_deterministic(self):
        assert sample_evenly(50, 8) == sample_evenly(50, 8)


class TestDataset:
    def test_listing_and_shapes(self, amd_root):
        ds = AMDDataset(amd_root, crop_size=64, seq_len=4)
        assert len(ds) == 2
        sample = ds[0]
        assert sample.images.shape == (4, 64, 64, 3)
        assert sample.q_wxyz.shape == (4, 4)
        assert sample.t_xyz.shape == (4, 3)
        assert sample.t_uvz.shape == (4, 3)
        assert sample.first_mask.shape == (64, 64)
        assert sample.ratio > 0
        # quaternions unit-norm
        np.testing.assert_allclose(
            np.linalg.norm(sample.q_wxyz, axis=-1), 1.0, atol=1e-5
        )

    def test_uvz_is_projection_of_t(self, amd_root):
        ds = AMDDataset(amd_root, crop_size=64, seq_len=4)
        s = ds[0]
        fx = fy = 268.44444444
        cx, cy = 320.0, 240.0
        u = (fx * s.t_xyz[:, 0] + cx * s.t_xyz[:, 2]) / s.t_xyz[:, 2]
        np.testing.assert_allclose(s.t_uvz[:, 0], u, rtol=1e-4)
        np.testing.assert_allclose(s.t_uvz[:, 2], s.t_xyz[:, 2], rtol=1e-6)

    def test_images_normalized(self, amd_root):
        ds = AMDDataset(amd_root, crop_size=64, seq_len=4)
        s = ds[0]
        # black background maps to the ImageNet-normalized zero pixel
        expected_min = (0.0 - 0.485) / 0.229
        assert s.images.min() == pytest.approx(expected_min, abs=0.05)


class TestKeypoints:
    def test_mask_bbox(self):
        m = np.zeros((10, 10), np.uint8)
        m[2:5, 3:8] = 1
        assert mask_bbox(m) == [3.0, 2.0, 8.0, 5.0]

    def test_filter_and_pad_static_shape(self, rng):
        mask = np.zeros((50, 50), bool)
        mask[10:40, 10:40] = True
        pts = rng.random((30, 2)) * 50
        out = filter_and_pad(pts, mask, min_pts=16, max_pts=32, rng=rng)
        assert out.shape == (32, 2)

    def test_filter_respects_mask_when_enough(self, rng):
        mask = np.zeros((50, 50), bool)
        mask[10:40, 10:40] = True
        inside = rng.random((40, 2)) * 25 + 12  # all inside
        out = filter_and_pad(inside, mask, min_pts=8, max_pts=16, rng=rng)
        xi = np.round(out[:, 0]).astype(int)
        yi = np.round(out[:, 1]).astype(int)
        assert mask[yi, xi].all()

    def test_empty_mask_fallback(self, rng):
        mask = np.zeros((20, 20), bool)
        out = filter_and_pad(np.zeros((0, 2)), mask, 8, 16, rng=rng)
        assert out.shape == (16, 2)

    def test_seed_query_points_backends(self, amd_root, rng):
        ds = AMDDataset(amd_root, crop_size=64, seq_len=4)
        s = ds[0]
        for backend in ("grid", "corners"):
            pts = seed_query_points(
                s.images[0], s.first_mask, track_num=32, min_pts=16,
                backend=backend, rng=rng,
            )
            assert pts.shape == (32, 2)
            assert (pts >= 0).all() and (pts < 64).all()

    def test_grid_points_inside_mask(self):
        mask = np.zeros((30, 30), bool)
        mask[5:25, 5:25] = True
        pts = grid_points(mask, 16)
        xi = pts[:, 0].astype(int)
        yi = pts[:, 1].astype(int)
        assert mask[yi, xi].all()


class TestDevicePipeline:
    def test_bilinear_reproduces_linear_images_exactly(self):
        # bilinear resampling preserves linear functions: a ramp image must
        # come back as the exact ramp evaluated at the sample positions
        import jax.numpy as jnp
        from comet_tpu.data.device_pipeline import preprocess_frames

        h, w, crop = 40, 48, 16
        ys, xs = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
        ramp = (2.0 * xs + 3.0 * ys)[None, ..., None].repeat(3, axis=-1)
        frames = np.clip(ramp, 0, 255).astype(np.uint8)
        # interior crop so no taps leave the image
        square = jnp.asarray([8.0, 6.0, 8.0 + 24.0, 6.0 + 24.0])
        out = np.asarray(preprocess_frames(jnp.asarray(frames), square, crop))
        # undo the normalization
        mean = np.array([0.485, 0.456, 0.406])
        std = np.array([0.229, 0.224, 0.225])
        vals = (out[0, :, :, 0] * std[0] + mean[0]) * 255.0
        pos_x = 8.0 + (np.arange(crop) + 0.5) * 24.0 / crop - 0.5
        pos_y = 6.0 + (np.arange(crop) + 0.5) * 24.0 / crop - 0.5
        want = 2.0 * pos_x[None, :] + 3.0 * pos_y[:, None]
        np.testing.assert_allclose(vals, want, atol=1e-3)

    def test_out_of_image_crop_pads_zero(self):
        import jax.numpy as jnp
        from comet_tpu.data.device_pipeline import preprocess_frames

        frames = np.full((1, 20, 20, 3), 255, np.uint8)
        square = jnp.asarray([-10.0, -10.0, 10.0, 10.0])
        out = np.asarray(preprocess_frames(jnp.asarray(frames), square, 8))
        mean = np.array([0.485, 0.456, 0.406])
        std = np.array([0.229, 0.224, 0.225])
        raw = out * std + mean
        # top-left quadrant of the crop lies outside the image -> zeros
        assert abs(raw[0, 0, 0, 0]) < 1e-5
        assert abs(raw[0, 7, 7, 0] - 1.0) < 1e-5

    def test_wrapper_matches_host_schema_and_geometry(self, amd_root):
        from comet_tpu.data.datasets import AMDDataset
        from comet_tpu.data.device_pipeline import DevicePreprocessDataset

        host = AMDDataset(amd_root, crop_size=64, seq_len=4)
        dev = DevicePreprocessDataset(
            AMDDataset(amd_root, crop_size=64, seq_len=4)
        )
        a = host[0]
        b = dev[0]
        assert b.images.shape == a.images.shape
        assert b.first_mask.shape == a.first_mask.shape
        assert b.ratio == a.ratio
        np.testing.assert_array_equal(b.q_wxyz, a.q_wxyz)
        # resampling kernels differ (LANCZOS vs bilinear) but the images
        # must agree closely in the smooth interior
        diff = np.abs(a.images - b.images)
        assert float(np.median(diff)) < 0.2
        # masks: nearest vs nearest with slightly different convention —
        # overwhelming agreement required
        agree = (a.first_mask == b.first_mask).mean()
        assert agree > 0.95


class TestDeviceLanczos:
    def test_matches_pil_lanczos(self):
        # the lanczos sampling matrices must reproduce PIL's LANCZOS
        # crop-resize (the host parity path). The float matrices match
        # PIL's float algorithm to ~6e-7; the remaining gap vs real PIL is
        # its fixed-point pipeline clipping the filter's overshoot to
        # uint8 after each separable pass — a few LSB on smooth images,
        # larger only on pure noise.
        import jax
        import jax.numpy as jnp
        from PIL import Image

        from comet_tpu.data.device_pipeline import preprocess_frames

        rng = np.random.default_rng(0)
        h, w, crop = 48, 56, 20
        # smooth texture (low-frequency noise upsampled) — representative
        # of real frames, minimal overshoot clipping
        low = rng.random((6, 7, 3))
        img = np.asarray(
            jax.image.resize(jnp.asarray(low), (h, w, 3), "cubic")
        )
        img = (np.clip(img, 0, 1) * 255).astype(np.uint8)
        # interior crop: pure per-pass rounding (~1 LSB). Out-of-image
        # crops: the zero-pad edge makes the filter overshoot, which PIL
        # clips to uint8 between passes (~4 LSB there).
        for box, tol in [
            ((6, 4, 38, 36), 2.0),
            ((-8, -8, 24, 24), 5.0),
            ((20, 10, 60, 50), 5.0),
        ]:
            x0, y0, x1, y1 = box
            host = np.asarray(
                Image.fromarray(img).crop(box).resize(
                    (crop, crop), Image.Resampling.LANCZOS
                ),
                np.float32,
            ) / 255.0
            square = jnp.asarray([x0, y0, x1, y1], jnp.float32)
            dev = np.asarray(
                preprocess_frames(
                    jnp.asarray(img[None]), square, crop, "lanczos"
                )
            )[0]
            mean = np.array([0.485, 0.456, 0.406])
            std = np.array([0.229, 0.224, 0.225])
            dev_raw = dev * std + mean
            assert np.abs(dev_raw - host).max() < tol / 255.0, box

    def test_wrapper_lanczos_mode(self, amd_root):
        from comet_tpu.data.datasets import AMDDataset
        from comet_tpu.data.device_pipeline import DevicePreprocessDataset

        base = AMDDataset(amd_root, crop_size=32, seq_len=2, use_augs=False)
        dev = DevicePreprocessDataset(base, resample="lanczos")
        a = base[0]
        b = dev[0]
        assert b.images.shape == a.images.shape
        # lanczos device path tracks the host LANCZOS path closely
        assert np.abs(b.images - a.images).max() < 4.0 / 255.0 / 0.22
