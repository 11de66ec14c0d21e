"""Grid + mixed extractors (matching/extractors.py).

Parity targets: gluefactory grid_extractor.py:21-56 (cell-center
keypoints with the +0.5 offset) and mixed.py:10-57 (detector keypoints +
descriptors bilinearly interpolated from a dense map with
grid_sample(align_corners=False) semantics).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from comet_tpu.matching.registry import get_model


@pytest.fixture
def image(rng):
    return jnp.asarray(rng.uniform(size=(64, 80, 3)).astype(np.float32))


class TestGridExtractor:
    def test_cell_centers(self, image):
        ex = get_model("extractor_grid", cell_size=16)
        out = ex(image)
        kp = np.asarray(out["keypoints"])
        # 64x80 at cell 16 -> 4x5 grid
        assert kp.shape == (20, 2)
        # reference: idx*cell + cell/2 + 0.5 (grid_extractor.py:30-53)
        assert kp[0].tolist() == [8.5, 8.5]
        assert kp[-1].tolist() == [16 * 4 + 8.5, 16 * 3 + 8.5]
        assert out["valid"].all()

    def test_full_coverage_no_descriptors(self, image):
        out = get_model("extractor_grid", cell_size=14)(image)
        assert "descriptors" not in out
        kp = np.asarray(out["keypoints"])
        assert (kp[:, 0] < 80).all() and (kp[:, 1] < 64).all()


class TestMixedExtractor:
    def test_grid_plus_dense_disk(self, image):
        ex = get_model(
            "extractor_mixed",
            detector="extractor_grid",
            detector_conf={"cell_size": 16},
        )
        out = ex(image)
        desc = np.asarray(out["descriptors"])
        assert desc.shape == (20, 128)
        # L2-normalized
        np.testing.assert_allclose(
            np.linalg.norm(desc, axis=-1), 1.0, atol=1e-5
        )

    def test_interpolation_matches_grid_sample_convention(self, image):
        """Sampling at kpts - 0.5 == grid_sample(align_corners=False) on
        kpts/[w,h]*2-1: verify against torch on the same dense map."""
        torch = pytest.importorskip("torch")
        from comet_tpu.ops.bilinear import bilinear_sample

        rng = np.random.default_rng(5)
        fmap = rng.normal(size=(16, 20, 8)).astype(np.float32)
        kpts = rng.uniform(1.0, 15.0, size=(31, 2)).astype(np.float32)
        h, w = fmap.shape[:2]

        ours = np.asarray(
            bilinear_sample(
                jnp.asarray(fmap), jnp.asarray(kpts) - 0.5,
                padding_mode="zeros",
            )
        )
        pts = torch.from_numpy(kpts / np.array([[w, h]], np.float32) * 2 - 1)
        ref = (
            torch.nn.functional.grid_sample(
                torch.from_numpy(fmap).permute(2, 0, 1)[None],
                pts[None, None],
                align_corners=False,
                mode="bilinear",
            )[0, :, 0]
            .T.numpy()
        )
        np.testing.assert_allclose(ours, ref, atol=1e-5)

    def test_detector_fields_pass_through(self, image):
        ex = get_model("extractor_mixed", detector_conf={"cell_size": 16})
        out = ex(image)
        assert out["scores"].shape == out["keypoints"].shape[:1]
        assert out["valid"].all()
