"""Photometric augmentation pipeline + difficulty-scaled homographies."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from comet_tpu.matching.augmentations import (
    LG_PRESET,
    PhotometricConfig,
    photometric_augment,
    sample_homography_difficulty,
)


class TestPhotometric:
    def _img(self, seed=0, c=3):
        rng = np.random.default_rng(seed)
        return jnp.asarray(rng.random((32, 40, c)).astype(np.float32))

    def test_output_contract(self):
        img = self._img()
        out = photometric_augment(jax.random.PRNGKey(0), img)
        assert out.shape == img.shape
        o = np.asarray(out)
        assert np.isfinite(o).all()
        assert o.min() >= 0.0 and o.max() <= 1.0

    def test_changes_pixels_and_is_deterministic(self):
        img = self._img(1)
        a = photometric_augment(jax.random.PRNGKey(7), img)
        b = photometric_augment(jax.random.PRNGKey(7), img)
        c = photometric_augment(jax.random.PRNGKey(8), img)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        assert np.abs(np.asarray(a) - np.asarray(img)).max() > 1e-3
        assert np.abs(np.asarray(a) - np.asarray(c)).max() > 1e-4

    def test_p_zero_is_identity(self):
        img = self._img(2)
        conf = PhotometricConfig(p=0.0)
        out = photometric_augment(jax.random.PRNGKey(0), img, conf)
        np.testing.assert_allclose(np.asarray(out), np.asarray(img), atol=1e-7)

    def test_grayscale_supported_and_jits(self):
        img = self._img(3, c=1)
        fn = jax.jit(photometric_augment)
        out = fn(jax.random.PRNGKey(0), img)
        assert out.shape == img.shape
        assert np.isfinite(np.asarray(out)).all()

    def test_blur_smooths(self):
        # blur-only config: high-frequency energy must drop
        rng = np.random.default_rng(4)
        img = jnp.asarray(rng.random((32, 32, 3)).astype(np.float32))
        conf = PhotometricConfig(
            p=1.0, brightness=0, contrast=0, saturation=0, gamma=0,
            noise_std=0, blur_sigma=1.2,
        )
        hf = lambda x: np.abs(np.diff(x, axis=0)).mean()
        # sigma is drawn uniformly in [0.1, blur_sigma]; average the
        # smoothing effect over several draws
        ratios = []
        for seed in range(6):
            out = np.asarray(
                photometric_augment(jax.random.PRNGKey(seed), img, conf)
            )
            ratios.append(hf(out) / hf(np.asarray(img)))
        assert np.mean(ratios) < 0.8


class TestHomographyDifficulty:
    def test_difficulty_zero_is_identity(self):
        rng = np.random.default_rng(0)
        h_mat = sample_homography_difficulty(rng, 64, 64, difficulty=0.0)
        np.testing.assert_allclose(h_mat, np.eye(3), atol=1e-6)

    def test_difficulty_scales_displacement(self):
        rng = np.random.default_rng(1)
        corners = np.array(
            [[0, 0, 1], [63, 0, 1], [0, 63, 1], [63, 63, 1]], float
        ).T

        def mean_disp(difficulty, seed):
            r = np.random.default_rng(seed)
            disps = []
            for _ in range(24):
                m = sample_homography_difficulty(r, 64, 64, difficulty)
                p = m @ corners
                p = p[:2] / p[2]
                disps.append(np.abs(p - corners[:2]).mean())
            return np.mean(disps)

        assert mean_disp(0.9, 2) > mean_disp(0.2, 2) * 1.5


@pytest.mark.slow
class TestConfigDrivenTraining:
    def test_experiment_train_block_end_to_end(self):
        """The experiment configs' train block is runnable end-to-end:
        synthetic images -> difficulty homography + photometric aug ->
        SIFT features -> GT labels -> LightGlue NLL decreasing."""
        import optax

        from comet_tpu.matching.configs import get_experiment
        from comet_tpu.matching.lightglue import LightGlueMatcher
        from comet_tpu.matching.registry import get_model
        from comet_tpu.matching.train import (
            build_matcher_train_step,
            make_homography_training_batch,
        )

        conf = get_experiment("sift+lightglue_homography")
        tb = conf["train"]
        extractor = get_model("extractor_sift", max_keypoints=48)
        matcher = LightGlueMatcher(depth=2, dim=64, num_heads=4)

        rng = np.random.default_rng(tb["seed"])
        batch = make_homography_training_batch(
            extractor, rng, batch_size=3, image_hw=(96, 96),
            difficulty=tb["homography"]["difficulty"],
            max_angle=tb["homography"]["max_angle"],
            th_positive=conf["ground_truth"]["th_positive"],
            th_negative=conf["ground_truth"]["th_negative"],
        )
        assert batch["kpts0"].shape == (3, 48, 2)
        k = np.asarray(batch["kpts0"])
        assert k.min() >= -1.001 and k.max() <= 1.001
        # at least some positive supervision must exist
        assert (np.asarray(batch["gt0"]) >= 0).sum() > 0

        params = matcher.init(
            jax.random.PRNGKey(0), batch["kpts0"][0], batch["desc0"][0],
            batch["kpts1"][0], batch["desc1"][0],
        )
        tx = optax.adam(float(tb["lr"]) * 10)  # tiny model, fixed batch
        opt_state = tx.init(params)
        step = build_matcher_train_step(matcher, tx)
        losses = []
        for _ in range(40):
            params, opt_state, loss = step(params, opt_state, batch)
            losses.append(float(loss))
        assert np.isfinite(losses).all()
        assert losses[-1] < losses[0] * 0.7, losses[::10]
