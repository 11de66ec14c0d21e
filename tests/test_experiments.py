"""Matching experiment checkpoint management (matching/experiments.py).

Parity target: gluefactory/utils/experiments.py:22-140 — numbered
checkpoint listing, last/best resolution, rotation, best-eval tracking,
and loading a trained matcher back into a built pipeline.
"""

import json
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from comet_tpu.matching.experiments import (
    delete_old_checkpoints,
    get_best_checkpoint,
    get_last_checkpoint,
    list_checkpoints,
    load_checkpoint,
    load_experiment_into_pipeline,
    save_experiment,
)


def _params(seed):
    k = jax.random.PRNGKey(seed)
    return {"params": {"w": jax.random.normal(k, (3, 2)),
                       "b": jnp.zeros((2,))}}


class TestCheckpointBookkeeping:
    def test_list_last_best(self, tmp_path):
        d = str(tmp_path)
        best = None
        for step, loss in [(1, 5.0), (2, 3.0), (3, 4.0)]:
            _, best = save_experiment(
                d, step, _params(step), loss=loss, eval_metric=loss,
                best_eval=best,
            )
        assert sorted(s for s, _ in list_checkpoints(d)) == [1, 2, 3]
        assert get_last_checkpoint(d).endswith("checkpoint_00000003.msgpack")
        # best is step 2 (loss 3.0)
        _, meta = load_checkpoint(get_best_checkpoint(d))
        assert meta["step"] == 2 and meta["loss"] == 3.0
        assert best == 3.0

    def test_rotation_keeps_newest_and_best(self, tmp_path):
        d = str(tmp_path)
        best = None
        for step in range(1, 9):
            _, best = save_experiment(
                d, step, _params(step), loss=float(step),
                eval_metric=float(step), best_eval=best, num_keep=3,
            )
        steps = sorted(s for s, _ in list_checkpoints(d))
        assert steps == [6, 7, 8]
        # best (step 1) survives rotation as the dedicated copy
        assert os.path.exists(get_best_checkpoint(d))
        _, meta = load_checkpoint(get_best_checkpoint(d))
        assert meta["step"] == 1

    def test_roundtrip_with_template_and_raw(self, tmp_path):
        d = str(tmp_path)
        p = _params(7)
        opt = {"mu": jnp.ones((3, 2)), "nu": jnp.zeros((3, 2))}
        save_experiment(d, 5, p, opt_state=opt, loss=1.0, eval_metric=1.0)
        # template restore: full typed tree
        tree, meta = load_checkpoint(d, template={"params": p, "opt": opt})
        np.testing.assert_allclose(tree["params"]["params"]["w"],
                                   p["params"]["w"])
        np.testing.assert_allclose(tree["opt"]["mu"], opt["mu"])
        assert meta["step"] == 5
        # raw restore: plain dicts, no template needed
        raw, _ = load_checkpoint(d)
        np.testing.assert_allclose(
            raw["params"]["params"]["w"], np.asarray(p["params"]["w"])
        )

    def test_dir_resolution_falls_back_to_last_without_best(self, tmp_path):
        d = str(tmp_path)
        save_experiment(d, 4, _params(0))  # no loss/eval -> no best copy
        assert not os.path.exists(get_best_checkpoint(d))
        _, meta = load_checkpoint(d)
        assert meta["step"] == 4

    def test_delete_old_explicit(self, tmp_path):
        d = str(tmp_path)
        for step in range(1, 6):
            save_experiment(d, step, _params(step), num_keep=100)
        delete_old_checkpoints(d, 2)
        assert sorted(s for s, _ in list_checkpoints(d)) == [4, 5]
        # sidecars rotate with their checkpoints
        assert len([f for f in os.listdir(d) if f.endswith(".json")]) == 2


class TestPipelineLoading:
    def test_trained_matcher_loads_into_pipeline(self, tmp_path):
        """Train the lightglue-style matcher 2 steps, save, rebuild the
        pipeline fresh, load the checkpoint, and verify the wrapper
        applies the TRAINED weights (same scores as direct apply)."""
        import optax

        from comet_tpu.matching.configs import build_pipeline, get_experiment
        from comet_tpu.matching.registry import get_model
        from comet_tpu.matching.train import (
            build_matcher_train_step,
            make_homography_training_batch,
        )

        name = "superpoint+lightglue_homography"
        conf = get_experiment(name)
        ext_conf = dict(conf["extractor"])
        ext_conf["max_keypoints"] = 32
        extractor = get_model(ext_conf.pop("name"), **ext_conf)
        mat_conf = dict(conf["matcher"])
        matcher = get_model(mat_conf.pop("name"), **mat_conf)

        rng = np.random.default_rng(0)
        tb = conf["train"]
        batch = make_homography_training_batch(
            extractor, rng, batch_size=2, image_hw=(64, 64),
            difficulty=tb["homography"]["difficulty"],
            max_angle=tb["homography"]["max_angle"],
            th_positive=conf["ground_truth"]["th_positive"],
            th_negative=conf["ground_truth"]["th_negative"],
        )
        params = matcher.init(
            jax.random.PRNGKey(0), batch["kpts0"][0], batch["desc0"][0],
            batch["kpts1"][0], batch["desc1"][0],
        )
        tx = optax.adam(1e-3)
        opt_state = tx.init(params)
        step = build_matcher_train_step(matcher, tx)
        for _ in range(2):
            params, opt_state, loss = step(params, opt_state, batch)
        d = str(tmp_path / "exp")
        save_experiment(d, 2, params, opt_state, loss=float(loss),
                        eval_metric=float(loss))

        pipeline = build_pipeline(name, image_hw=(64, 64))
        meta = load_experiment_into_pipeline(pipeline, d)
        assert meta["step"] == 2
        loaded = pipeline.matcher.holder["params"]
        np.testing.assert_allclose(
            np.asarray(
                jax.tree_util.tree_leaves(loaded)[0]
            ),
            np.asarray(jax.tree_util.tree_leaves(params)[0]),
        )

    def test_non_flax_matcher_rejects(self):
        from comet_tpu.matching.configs import build_pipeline

        pipeline = build_pipeline("sift+nn", image_hw=(64, 64))
        with pytest.raises(TypeError):
            load_experiment_into_pipeline(pipeline, "/nonexistent")
