"""CacheLoader model + TripletPipeline (matching/cache_loader.py)."""

import os

import numpy as np
import pytest

from comet_tpu.matching.cache_loader import (
    CacheLoader,
    TripletPipeline,
    pad_local_features,
    pad_to_length,
)


class TestPadToLength:
    def test_zeros_and_ones(self):
        x = np.ones((3, 2))
        out = pad_to_length(x, 5, -2, "zeros")
        assert out.shape == (5, 2) and out[3:].sum() == 0
        out = pad_to_length(x, 5, -2, "ones")
        assert (out == 1).all()

    def test_random_c_stays_in_bbox(self):
        kp = np.array([[10.0, 20.0], [30.0, 25.0], [12.0, 40.0]])
        out = pad_to_length(kp, 64, -2, "random_c")
        assert out.shape == (64, 2)
        assert (out[:, 0] >= 10).all() and (out[:, 0] <= 30).all()
        assert (out[:, 1] >= 20).all() and (out[:, 1] <= 40).all()

    def test_noop_and_overflow(self):
        x = np.zeros((4, 2))
        assert pad_to_length(x, 4).shape == (4, 2)
        with pytest.raises(ValueError):
            pad_to_length(x, 2)

    def test_pad_local_features(self):
        pred = {
            "keypoints": np.zeros((3, 2)),
            "keypoint_scores": np.ones(3),
            "descriptors": np.ones((3, 8)),
            "matches0": np.array([1, 2, 0]),  # untouched field
        }
        out = pad_local_features(pred, 6)
        assert out["keypoints"].shape == (6, 2)
        assert out["keypoint_scores"].shape == (6,)
        assert (out["keypoint_scores"][3:] == 0).all()
        assert out["descriptors"].shape == (6, 8)
        assert out["matches0"].shape == (3,)


class TestCacheLoader:
    def _make_cache(self, tmp_path):
        import h5py

        path = os.path.join(tmp_path, "preds.h5")
        with h5py.File(path, "w") as f:
            g = f.create_group("pair_000")
            g.create_dataset("keypoints", data=np.arange(8.0).reshape(4, 2))
            g.create_dataset("keypoint_scores", data=np.linspace(1, 0.4, 4))
            g.create_dataset("matches0", data=np.array([0, 1, -1, 2]))
        return path

    def test_roundtrip_with_scale_and_pad(self, tmp_path):
        path = self._make_cache(tmp_path)
        loader = CacheLoader(path, padding_length=16)
        pred = loader({"name": "pair_000", "scales": 2.0})
        assert pred["keypoints"].shape == (16, 2)
        # scaled by "scales" before padding-derived entries are appended
        np.testing.assert_allclose(
            pred["keypoints"][:4], np.arange(8.0).reshape(4, 2) * 2.0
        )
        assert pred["keypoints"].dtype == np.float32
        assert pred["matches0"].dtype.kind == "i"  # ints not cast

    def test_format_string_path(self, tmp_path):
        path = self._make_cache(tmp_path)
        loader = CacheLoader(
            os.path.join(str(tmp_path), "{split}.h5"), numeric_type="float64"
        )
        pred = loader({"name": "pair_000", "split": "preds"})
        assert pred["keypoints"].dtype == np.float64
        assert pred["keypoints"].shape == (4, 2)

    def test_registry(self, tmp_path):
        from comet_tpu.matching.registry import get_model

        path = self._make_cache(tmp_path)
        loader = get_model("cache_loader", path=path)
        assert loader({"name": "pair_000"})["keypoints"].shape == (4, 2)


class TestTripletPipeline:
    @staticmethod
    def _extractor(image):
        return {"keypoints": np.asarray(image), "id": float(np.sum(image))}

    @staticmethod
    def _matcher(f0, f1):
        return {"pair": (f0["id"], f1["id"])}

    def test_three_pairs(self):
        pipe = TripletPipeline(self._extractor, self._matcher)
        out = pipe(np.ones(1), np.ones(1) * 2, np.ones(1) * 3)
        assert out["0to1"]["pair"] == (1.0, 2.0)
        assert out["0to2"]["pair"] == (1.0, 3.0)
        assert out["1to2"]["pair"] == (2.0, 3.0)
        assert set(out) >= {"feats0", "feats1", "feats2"}

    def test_two_view_fallback(self):
        pipe = TripletPipeline(self._extractor, self._matcher)
        out = pipe(np.ones(1), np.ones(1) * 2)
        assert out["pair"] == (1.0, 2.0)
        assert "0to2" not in out


class TestEmptyKeypoints:
    def test_pad_empty_arrays(self):
        # regression: extractors can return zero keypoints (textureless
        # frame) — padding must not crash on empty min/max
        out = pad_local_features(
            {
                "keypoints": np.zeros((0, 2)),
                "keypoint_scores": np.zeros((0,)),
                "descriptors": np.zeros((0, 8)),
            },
            16,
        )
        assert out["keypoints"].shape == (16, 2)
        assert out["descriptors"].shape == (16, 8)
        assert (out["keypoint_scores"] == 0).all()

    def test_pad_empty_with_bounds(self):
        out = pad_to_length(
            np.zeros((0, 2)), 4, -2, "random_c", bounds=(5.0, 6.0)
        )
        assert ((out >= 5.0) & (out <= 6.0)).all()
