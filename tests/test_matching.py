"""Matching framework: extractors, matchers, GT generation, pipeline.

Capability parity targets: gluefactory registry + TwoViewPipeline
(models/two_view_pipeline.py:21), NN/LightGlue matchers, SIFT extractor,
homography/epipolar GT generation (geometry/gt_generation.py).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from comet_tpu.matching import (
    IGNORE,
    UNMATCHED,
    LightGlueMatcher,
    TwoViewPipeline,
    extract_sift,
    get_model,
    gt_matches_from_homography,
    gt_matches_from_pose,
    list_models,
    mutual_nearest_neighbor,
    warp_homography,
)


class TestNNMatcher:
    def test_recovers_permutation(self, rng):
        d = rng.normal(size=(20, 32)).astype(np.float32)
        d /= np.linalg.norm(d, axis=-1, keepdims=True)
        perm = rng.permutation(20)
        out = mutual_nearest_neighbor(jnp.asarray(d), jnp.asarray(d[perm]))
        inv = np.argsort(perm)
        np.testing.assert_array_equal(np.asarray(out["matches0"]), inv)

    def test_threshold_and_validity(self, rng):
        d = rng.normal(size=(10, 16)).astype(np.float32)
        d /= np.linalg.norm(d, axis=-1, keepdims=True)
        valid0 = np.ones(10, bool)
        valid0[3] = False
        out = mutual_nearest_neighbor(
            jnp.asarray(d), jnp.asarray(d), threshold=0.5,
            valid0=jnp.asarray(valid0), valid1=jnp.asarray(valid0),
        )
        m = np.asarray(out["matches0"])
        assert m[3] == -1  # invalid query never matches
        ok = m >= 0
        np.testing.assert_array_equal(m[ok], np.arange(10)[ok])


class TestSift:
    def test_detects_blob_and_shifts(self, rng):
        # blobs must be far apart: at coarse DoG scales nearby blobs merge
        # into one extremum between them (correct scale-space behavior)
        img = np.zeros((96, 96), np.float32)
        yy, xx = np.mgrid[:96, :96]
        for cx, cy in [(24, 24), (72, 60)]:
            img += np.exp(-((xx - cx) ** 2 + (yy - cy) ** 2) / 8.0)
        feats = extract_sift(jnp.asarray(img), max_keypoints=8)
        kps = np.asarray(feats["keypoints"])[np.asarray(feats["valid"])]
        assert len(kps) >= 2
        d0 = np.abs(kps - np.array([24, 24])).sum(-1).min()
        d1 = np.abs(kps - np.array([72, 60])).sum(-1).min()
        assert d0 <= 2 and d1 <= 2

    def test_descriptors_normalized_and_match_on_shift(self, rng):
        img = rng.random((80, 80)).astype(np.float32)
        import scipy.ndimage as ndi

        img = ndi.gaussian_filter(img, 1.5)
        shifted = np.roll(img, (4, 7), axis=(0, 1))
        f0 = extract_sift(jnp.asarray(img), max_keypoints=64)
        f1 = extract_sift(jnp.asarray(shifted), max_keypoints=64)
        assert np.allclose(
            np.linalg.norm(np.asarray(f0["descriptors"]), axis=-1), 1.0,
            atol=1e-4,
        )
        out = mutual_nearest_neighbor(
            f0["descriptors"], f1["descriptors"], threshold=0.5,
            valid0=f0["valid"], valid1=f1["valid"],
        )
        m = np.asarray(out["matches0"])
        k0 = np.asarray(f0["keypoints"])
        k1 = np.asarray(f1["keypoints"])
        ok = m >= 0
        assert ok.sum() >= 10
        offsets = k1[m[ok]] - k0[ok]
        med = np.median(offsets, axis=0)
        # np.roll(img, (4, 7)) shifts rows (y) by 4 and cols (x) by 7
        np.testing.assert_allclose(med, [7.0, 4.0], atol=1.0)


class TestGtGeneration:
    def test_homography_gt(self, rng):
        h = jnp.asarray(
            [[1.0, 0.0, 5.0], [0.0, 1.0, -3.0], [0.0, 0.0, 1.0]], jnp.float32
        )
        k0 = (rng.random((30, 2)) * 80 + 10).astype(np.float32)
        k1 = np.asarray(warp_homography(jnp.asarray(k0), h))
        # add unmatched distractors to both sides
        extra1 = (rng.random((5, 2)) * 80 + 200).astype(np.float32)
        k1_full = np.concatenate([k1, extra1])
        out = gt_matches_from_homography(
            jnp.asarray(k0), jnp.asarray(k1_full), h
        )
        m0 = np.asarray(out["matches0"])
        np.testing.assert_array_equal(m0, np.arange(30))
        m1 = np.asarray(out["matches1"])
        np.testing.assert_array_equal(m1[:30], np.arange(30))
        assert (m1[30:] == UNMATCHED).all()

    def test_pose_gt_epipolar(self, rng):
        from scipy.spatial.transform import Rotation

        rot = Rotation.from_euler("xyz", [4, -6, 2], degrees=True).as_matrix()
        t = np.array([0.3, 0.1, -0.2])
        pts = rng.uniform(-1, 1, size=(25, 3))
        pts[:, 2] += 5.0
        x0 = pts[:, :2] / pts[:, 2:]
        pc = pts @ rot.T + t
        x1 = pc[:, :2] / pc[:, 2:]
        tx = np.array([[0, -t[2], t[1]], [t[2], 0, -t[0]], [-t[1], t[0], 0]])
        e = (tx @ rot).astype(np.float32)
        k = jnp.eye(3)
        out = gt_matches_from_pose(
            jnp.asarray(x0, jnp.float32), jnp.asarray(x1, jnp.float32),
            jnp.asarray(e), k, k,
        )
        m0 = np.asarray(out["matches0"])
        # epipolar-only labels can be ambiguous (points on the same line);
        # require the majority to be correctly matched, none mismatched to a
        # geometrically-inconsistent point
        ok = m0 >= 0
        assert ok.mean() > 0.6
        assert (m0[ok] == np.arange(25)[ok]).mean() > 0.9


class TestPipeline:
    def test_registry_lists_models(self):
        names = list_models()
        assert "extractor_sift" in names
        assert "extractor_superpoint" in names
        assert "matcher_nn" in names
        assert "matcher_lightglue" in names

    def test_sift_nn_pipeline_end_to_end(self, rng):
        import scipy.ndimage as ndi

        img = ndi.gaussian_filter(rng.random((80, 80)).astype(np.float32), 1.5)
        shifted = np.roll(img, (4, 7), axis=(0, 1))
        pipe = TwoViewPipeline(
            extractor=get_model("extractor_sift", max_keypoints=64),
            matcher=get_model("matcher_nn", threshold=0.5),
        )
        out = pipe(jnp.asarray(img), jnp.asarray(shifted))
        m = np.asarray(out["matches0"])
        assert (m >= 0).sum() >= 10

    def test_lightglue_shapes_and_masking(self, rng):
        m = LightGlueMatcher(depth=2, dim=32, num_heads=4)
        k0 = jnp.asarray(rng.random((12, 2)).astype(np.float32) * 2 - 1)
        k1 = jnp.asarray(rng.random((15, 2)).astype(np.float32) * 2 - 1)
        d0 = jnp.asarray(rng.normal(size=(12, 16)).astype(np.float32))
        d1 = jnp.asarray(rng.normal(size=(15, 16)).astype(np.float32))
        v0 = jnp.asarray(np.array([True] * 10 + [False] * 2))
        v1 = jnp.ones(15, bool)
        params = m.init(jax.random.PRNGKey(0), k0, d0, k1, d1, v0, v1)
        out = m.apply(params, k0, d0, k1, d1, v0, v1)
        assert out["matches0"].shape == (12,)
        assert np.isfinite(np.asarray(out["scores0"])).all()
        assert (np.asarray(out["matches0"])[10:] == -1).all()  # masked


@pytest.mark.slow  # matcher training loop
class TestEvalAndTrain:
    def test_eval_matches_homography_metrics(self, rng):
        h = jnp.asarray(
            [[1.0, 0, 6.0], [0, 1.0, -2.0], [0, 0, 1.0]], jnp.float32
        )
        k0 = jnp.asarray((rng.random((20, 2)) * 60 + 10).astype(np.float32))
        k1 = jnp.asarray(np.asarray(warp_homography(k0, h)))
        from comet_tpu.matching import eval_matches_homography

        perfect = jnp.arange(20)
        m = eval_matches_homography(k0, k1, perfect, h)
        assert int(m["num_matches"]) == 20
        assert float(m["prec@3px"]) == 1.0
        assert float(m["recall"]) == 1.0
        # corrupt half the matches
        bad = np.asarray(perfect).copy()
        bad[:10] = (bad[:10] + 5) % 20
        m = eval_matches_homography(k0, k1, jnp.asarray(bad), h)
        assert float(m["prec@3px"]) == pytest.approx(0.5)
        assert float(m["recall"]) == pytest.approx(0.5)

    def test_lightglue_training_reduces_loss(self, rng):
        import optax

        from comet_tpu.matching import (
            build_matcher_train_step,
            gt_matches_from_homography,
        )

        n, d = 16, 8
        matcher = LightGlueMatcher(depth=2, dim=32, num_heads=4)

        def make_pair(seed):
            r = np.random.default_rng(seed)
            k0 = (r.random((n, 2)) * 2 - 1).astype(np.float32)
            k1 = np.roll(k0, 3, axis=0)  # known permutation, same coords
            desc = r.normal(size=(n, d)).astype(np.float32)
            gt0 = np.roll(np.arange(n), -3)  # k0[i] matches k1[gt0[i]]
            return k0, desc, k1, np.roll(desc, 3, axis=0), gt0, np.argsort(gt0)

        pairs = [make_pair(s) for s in range(4)]
        batch = {
            "kpts0": jnp.asarray(np.stack([p[0] for p in pairs])),
            "desc0": jnp.asarray(np.stack([p[1] for p in pairs])),
            "kpts1": jnp.asarray(np.stack([p[2] for p in pairs])),
            "desc1": jnp.asarray(np.stack([p[3] for p in pairs])),
            "gt0": jnp.asarray(np.stack([p[4] for p in pairs])),
            "gt1": jnp.asarray(np.stack([p[5] for p in pairs])),
        }
        params = matcher.init(
            jax.random.PRNGKey(0), batch["kpts0"][0], batch["desc0"][0],
            batch["kpts1"][0], batch["desc1"][0],
        )
        tx = optax.adam(1e-3)
        opt_state = tx.init(params)
        step = build_matcher_train_step(matcher, tx)
        losses = []
        for _ in range(25):
            params, opt_state, loss = step(params, opt_state, batch)
            losses.append(float(loss))
        assert np.isfinite(losses).all()
        assert losses[-1] < losses[0] * 0.7, losses[::6]


class TestHomographyBenchmark:
    """End-to-end eval pipeline (the glue-factory HPatches loop shape):
    extractor -> matcher -> metrics + RANSAC H with corner error.

    Thresholds mirror the reference integration test
    (glue-factory/tests/test_integration.py: num_matches, prec@3px,
    H_error_ransac) scaled to the synthetic fixture pairs."""

    def test_sift_nn_recovers_homography(self):
        from comet_tpu.matching.benchmarks import (
            make_synthetic_pairs,
            run_homography_benchmark,
        )
        from comet_tpu.matching.registry import TwoViewPipeline, get_model

        pairs = make_synthetic_pairs(2, hw=(96, 128), seed=0)
        pipe = TwoViewPipeline(
            get_model("extractor_sift", max_keypoints=256),
            get_model("matcher_nn"),
        )
        agg = run_homography_benchmark(pipe, pairs)
        assert agg["num_matches"] > 40
        assert agg["prec@3px"] > 0.8
        assert agg["H_error_ransac"] < 3.0
        assert agg["H_acc@5px"] == 1.0

    def test_warp_image_identity(self):
        import jax.numpy as jnp
        from comet_tpu.matching.benchmarks import warp_image

        img = jnp.arange(48.0).reshape(4, 4, 3)
        out = warp_image(img, jnp.eye(3))
        np.testing.assert_allclose(np.asarray(out), np.asarray(img), atol=1e-5)
