"""SuperPoint detector + keypoint seeding + prefetch tests.

Parity targets: gluefactory_nonfree/superpoint.py semantics (NMS,
threshold, top-k, descriptor sampling) and the harness seeding path
(train_eval_func_new_cp5.py:527-592).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from comet_tpu.models.superpoint import (
    SuperPoint,
    extract_keypoints,
    sample_descriptors,
    simple_nms,
)
from comet_tpu.ops.bilinear import bilinear_sample


class TestNms:
    def test_idempotent(self, rng):
        s = jnp.asarray(rng.random((1, 24, 24)).astype(np.float32))
        once = simple_nms(s, 4)
        twice = simple_nms(once, 4)
        np.testing.assert_allclose(np.asarray(once), np.asarray(twice))

    def test_keeps_local_maxima(self):
        s = np.zeros((1, 16, 16), np.float32)
        s[0, 4, 4] = 1.0
        s[0, 4, 6] = 0.5  # within radius of the stronger peak -> suppressed
        s[0, 12, 12] = 0.8
        out = np.asarray(simple_nms(jnp.asarray(s), 4))
        assert out[0, 4, 4] == 1.0
        assert out[0, 12, 12] == 0.8
        assert out[0, 4, 6] == 0.0


class TestExtract:
    def test_planted_peak_and_shapes(self):
        h = np.zeros((32, 32), np.float32)
        h[10, 20] = 0.9
        h[2, 2] = 0.8  # inside the 4px border -> must be zeroed
        kps, scores = extract_keypoints(jnp.asarray(h), max_keypoints=8)
        assert kps.shape == (8, 2) and scores.shape == (8,)
        assert tuple(np.asarray(kps[0]).astype(int)) == (20, 10)
        assert float(scores[0]) == pytest.approx(0.9)
        # border point suppressed; only one real keypoint
        assert float(scores[1]) == 0.0

    def test_descriptor_sampling_matches_bilinear(self, rng):
        dmap = jnp.asarray(rng.normal(size=(8, 8, 16)).astype(np.float32))
        kps = jnp.asarray(
            (rng.random((5, 2)) * 50 + 5).astype(np.float32)
        )
        got = np.asarray(sample_descriptors(dmap, kps, stride=8))
        pts = (kps - 4.0 + 0.5) / 8.0
        raw = np.asarray(bilinear_sample(dmap, pts))
        want = raw / np.maximum(
            np.linalg.norm(raw, axis=-1, keepdims=True), 1e-8
        )
        np.testing.assert_allclose(got, want, atol=1e-6)
        np.testing.assert_allclose(
            np.linalg.norm(got, axis=-1), 1.0, atol=1e-5
        )


class TestEndToEnd:
    def test_superpoint_module_shapes(self, rng):
        model = SuperPoint(max_keypoints=32)
        img = jnp.asarray(rng.random((40, 48)).astype(np.float32))
        params = model.init(jax.random.PRNGKey(0), img)
        out = model.apply(params, img)
        assert out.keypoints.shape == (32, 2)
        assert out.scores.shape == (32,)
        assert out.descriptors.shape == (32, 256)
        assert np.isfinite(np.asarray(out.descriptors)).all()

    def test_seed_query_points_superpoint_backend(self, rng):
        from comet_tpu.data.keypoints import seed_query_points

        img = rng.random((64, 64, 3)).astype(np.float32)
        mask = np.zeros((64, 64), bool)
        mask[16:48, 16:48] = True
        pts = seed_query_points(
            img, mask, track_num=32, min_pts=16, backend="superpoint",
            rng=np.random.default_rng(0),
        )
        assert pts.shape == (32, 2)
        assert (pts[:, 0] >= 0).all() and (pts[:, 0] < 64).all()
        assert (pts[:, 1] >= 0).all() and (pts[:, 1] < 64).all()


class TestPrefetch:
    def test_order_and_completeness(self):
        from comet_tpu.data.prefetch import prefetch

        got = list(prefetch(lambda i: i * i, 10, depth=2))
        assert got == [i * i for i in range(10)]

    def test_exception_propagates(self):
        from comet_tpu.data.prefetch import prefetch

        def bad(i):
            if i == 3:
                raise ValueError("boom")
            return i

        with pytest.raises(ValueError, match="boom"):
            list(prefetch(bad, 10, depth=2))

    def test_empty(self):
        from comet_tpu.data.prefetch import prefetch

        assert list(prefetch(lambda i: i, 0)) == []
