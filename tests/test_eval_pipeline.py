"""Cached-prediction eval pipeline (matching/eval_pipeline.py).

Covers: the AUC formula against the reference definition, the artifact
round-trip (predictions.h5 / results.h5 / summaries.json), the conf-guard
overwrite semantics (eval_pipeline.py:95-109), cache reuse (second run
must NOT recompute predictions), and the HomographyEvalPipeline end-to-end
on synthetic pairs producing the reference-shaped summary row.
"""

import json
import os

import numpy as np
import pytest

from comet_tpu.matching.eval_pipeline import (
    AUCMetric,
    EvalPipeline,
    HomographyEvalPipeline,
    cal_error_auc,
    eval_poses,
    exists_eval,
    export_predictions,
    load_eval,
    load_predictions,
    save_eval,
)

pytestmark = pytest.mark.fast


class TestAucFormula:
    def test_golden_values(self):
        """Hand-checked against the reference cal_error_auc
        (gluefactory/utils/tools.py:137-149)."""
        errs = [0.5, 1.5, 2.5, 10.0]
        aucs = cal_error_auc(errs, [1.0, 3.0])
        # t=1: recall hits 0.25 at e=0.5, flat to 1.0 -> (0.25*0.5)/2 + 0.25*0.5 = 0.1875
        assert aucs[0] == pytest.approx(0.1875, abs=1e-4)
        assert 0 < aucs[1] < 1
        # perfect errors -> AUC ~ 1
        assert cal_error_auc([0.0, 0.0], [1.0])[0] == pytest.approx(1.0)
        # all beyond threshold -> 0
        assert cal_error_auc([9.0, 9.0], [1.0])[0] == pytest.approx(0.0)

    def test_auc_metric_update(self):
        m = AUCMetric([1.0])
        assert np.isnan(m.compute())
        m.update(np.asarray([0.0, 2.0]))
        assert m.compute()[0] == pytest.approx(0.5, abs=0.01)

    def test_eval_poses_picks_best_threshold(self):
        pose_results = {
            0.5: {"H_error_ransac": [5.0, 6.0], "inl": [3, 4]},
            2.0: {"H_error_ransac": [0.2, 0.4], "inl": [30, 40]},
        }
        summaries, best = eval_poses(pose_results, [1, 3], "H_error_ransac")
        assert best == 2.0
        assert summaries["H_error_ransac@1px"] > 0.5
        assert summaries["minl"] == 35.0


class TestArtifacts:
    def test_predictions_roundtrip(self, tmp_path):
        loader = [
            {"name": "a", "x": 1.0},
            {"name": "b", "x": 2.0},
        ]
        calls = []

        def model(data):
            calls.append(data["name"])
            return {"kp": np.full((4, 2), data["x"]), "extra": np.ones(3)}

        pf = export_predictions(
            loader, model, str(tmp_path / "p.h5"), keys=["kp"],
            optional_keys=["extra", "absent"],
        )
        assert calls == ["a", "b"]
        row = load_predictions(pf, "b")
        np.testing.assert_allclose(row["kp"], 2.0)
        assert "extra" in row and "absent" not in row

    def test_missing_required_key_raises(self, tmp_path):
        with pytest.raises(KeyError, match="kp"):
            export_predictions(
                [{"name": "a"}], lambda d: {}, str(tmp_path / "p.h5"),
                keys=["kp"],
            )

    def test_save_load_eval(self, tmp_path):
        d = str(tmp_path)
        summaries = {"mprec": 0.75, "bad": float("inf"), "lst": [1, 2]}
        results = {"err": [0.1, 0.2], "names": ["a", "b"]}
        save_eval(d, summaries, results)
        assert exists_eval(d)
        s, r = load_eval(d)
        assert s["mprec"] == 0.75
        assert np.isnan(s["bad"])  # inf -> null -> nan, reference behavior
        assert s["lst"] == [1, 2]
        np.testing.assert_allclose(r["err"], [0.1, 0.2])
        assert list(r["names"]) == ["a", "b"]


class _TinyPipeline(EvalPipeline):
    default_conf = {
        "data": {"n": 3},
        "model": {"scale": 1.0},
        "eval": {"th": 1.0},
    }
    export_keys = ["val"]

    def get_dataloader(self):
        return [{"name": f"i{i}"} for i in range(self.conf["data"]["n"])]

    def get_model(self):
        _TinyPipeline.model_builds += 1
        s = self.conf["model"]["scale"]
        return lambda data: {"val": np.asarray([s * float(data["name"][1:])])}

    def run_eval(self, loader, pred_file):
        vals = [
            float(load_predictions(pred_file, d["name"])["val"][0])
            for d in loader
        ]
        return {"mean_val": float(np.mean(vals))}, {"vals": vals}

    model_builds = 0


class TestDriver:
    def test_run_and_cache_reuse(self, tmp_path):
        _TinyPipeline.model_builds = 0
        p = _TinyPipeline()
        d = str(tmp_path / "exp")
        s1, r1 = p.run(d)
        assert s1["mean_val"] == 1.0
        assert _TinyPipeline.model_builds == 1
        # second run: predictions AND eval come from cache
        s2, _ = p.run(d)
        assert s2 == s1
        assert _TinyPipeline.model_builds == 1

    def test_conf_guard(self, tmp_path):
        d = str(tmp_path / "exp")
        _TinyPipeline().run(d)
        changed = _TinyPipeline({"model": {"scale": 2.0}})
        with pytest.raises(RuntimeError, match="overwrite"):
            changed.run(d)
        s, _ = changed.run(d, overwrite=True)
        assert s["mean_val"] == 2.0

    def test_eval_conf_guard(self, tmp_path):
        d = str(tmp_path / "exp")
        _TinyPipeline().run(d)
        changed = _TinyPipeline({"eval": {"th": 2.0}})
        with pytest.raises(RuntimeError, match="overwrite_eval"):
            changed.run(d)
        changed.run(d, overwrite_eval=True)  # eval-only change OK


class TestHomographyPipeline:
    def test_end_to_end(self, tmp_path):
        p = HomographyEvalPipeline(
            {"data": {"n_pairs": 3, "image_size": 64},
             "eval": {"ransac_th": [1.0, 3.0]}}
        )
        s, r = p.run(str(tmp_path / "exp"))
        # reference-shaped summary keys (hpatches.py:131-155)
        for key in ("mnum_matches", "mprec@3px", "H_error_ransac@1px",
                    "H_error_ransac@3px", "H_error_ransac@5px",
                    "H_error_ransac_mAA", "H_error_dlt@3px"):
            assert key in s, key
        assert len(r["H_error_ransac"]) == 3
        assert len(r["names"]) == 3
        # synthetic pairs are easy: the robust H should be correct
        assert s["H_error_ransac_mAA"] > 0.3
        # cached second run identical (modulo NaN placeholders)
        s2, _ = p.run(str(tmp_path / "exp"))
        assert set(s2) == set(s)
        for k, v in s.items():
            if isinstance(v, float) and np.isnan(v):
                assert np.isnan(s2[k])
            else:
                assert s2[k] == v, k

    def test_image_dir_warped_pairs(self, tmp_path):
        """REAL images from a directory (VERDICT r2 item 8): each image is
        warped by a sampled homography with exact GT (the
        gluefactory/datasets/homographies.py real-image recipe)."""
        from PIL import Image

        from comet_tpu.matching.benchmarks import synthetic_texture

        rng = np.random.default_rng(0)
        img_dir = tmp_path / "imgs"
        img_dir.mkdir()
        for i in range(2):
            tex = (synthetic_texture(rng, 64, 64)[..., 0] * 255).astype(
                np.uint8
            )
            Image.fromarray(tex).save(img_dir / f"im{i}.png")
        p = HomographyEvalPipeline(
            {"data": {"image_dir": str(img_dir), "image_size": 64,
                      "warps_per_image": 2},
             "eval": {"ransac_th": [3.0]}}
        )
        s, r = p.run(str(tmp_path / "exp"))
        assert len(r["names"]) == 4
        assert {n.split("_w")[0] for n in r["names"]} == {"im0", "im1"}
        assert s["H_error_ransac_mAA"] > 0.2, s

    def test_image_dir_pairs_file(self, tmp_path):
        """Explicit HPatches-style pair list: name0 name1 + 9 H floats."""
        from PIL import Image

        from comet_tpu.matching.benchmarks import (
            random_homography,
            synthetic_texture,
            warp_image,
        )
        import jax.numpy as jnp

        rng = np.random.default_rng(1)
        img_dir = tmp_path / "imgs"
        img_dir.mkdir()
        tex = synthetic_texture(rng, 64, 64)
        h_gt = random_homography(rng, 64, 64)
        warped = np.asarray(
            warp_image(jnp.asarray(tex), jnp.asarray(h_gt, jnp.float32))
        )
        Image.fromarray((tex[..., 0] * 255).astype(np.uint8)).save(
            img_dir / "a.png"
        )
        Image.fromarray(
            (np.clip(warped[..., 0], 0, 1) * 255).astype(np.uint8)
        ).save(img_dir / "b.png")
        pairs = tmp_path / "pairs.txt"
        pairs.write_text(
            "a.png b.png " + " ".join(f"{x:.8g}" for x in
                                      np.asarray(h_gt).ravel()) + "\n"
        )
        p = HomographyEvalPipeline(
            {"data": {"image_dir": str(img_dir),
                      "pairs_file": str(pairs)},
             "eval": {"ransac_th": [3.0]}}
        )
        s, r = p.run(str(tmp_path / "exp"))
        assert r["names"] == ["a-b"]
        assert np.isfinite(s["mnum_matches"])


class TestRelativePosePipeline:
    def test_end_to_end(self, tmp_path):
        """Oracle correspondences with 15% outliers through the full
        export -> cache -> robust-eval chain: the best-threshold summary
        must recover the pose (high AUC, low median error) and the
        reference-shaped keys must be present
        (megadepth1500.py summary surface)."""
        from comet_tpu.matching.eval_pipeline import RelativePoseEvalPipeline

        # noise 0.15 px: the reference's epi-precision gates (1e-4..1e-3
        # normalized) assume sub-pixel matches; 0.15 px at f=300 sits at
        # ~6e-4 normalized Sampson, inside the 1e-3 gate
        pipe = RelativePoseEvalPipeline(
            {"data": {"n_pairs": 4, "n_points": 80, "noise": 0.15},
             "eval": {"ransac_th": [1.0, 2.0]}}
        )
        summaries, results = pipe.run(str(tmp_path / "exp"))
        for key in ("rel_pose_error@5°", "rel_pose_error@10°",
                    "rel_pose_error@20°", "rel_pose_error_mAA",
                    "mepi_prec@1e-3", "mransac_inl%"):
            assert key in summaries, sorted(summaries)
        assert summaries["rel_pose_error_mAA"] > 0.5, summaries
        assert np.median(results["rel_pose_error"]) < 5.0
        # epipolar precision: inliers dominate at the 1e-3 gate
        assert summaries["mepi_prec@1e-3"] > 0.6

    def test_amd_folder_end_to_end(self, tmp_path):
        """REAL on-disk image pairs (VERDICT r2 item 8): an AMD-layout
        fixture tree -> GT relative poses from the w2c files -> extractor +
        NN matcher -> cached predictions -> robust-eval summaries. This is
        the real-data role of gluefactory/eval/megadepth1500.py."""
        from comet_tpu.data.fixtures import generate_amd_fixture
        from comet_tpu.matching.eval_pipeline import RelativePoseEvalPipeline

        root = str(tmp_path / "amd")
        generate_amd_fixture(root, n_models=1, n_seqs=1, n_frames=6,
                             img_hw=(120, 160))
        pipe = RelativePoseEvalPipeline(
            {"data": {"amd_dir": root, "frame_gap": 2, "max_pairs": 2},
             "eval": {"ransac_th": [2.0]}}
        )
        summaries, results = pipe.run(str(tmp_path / "exp"))
        assert len(results["names"]) == 2
        for key in ("rel_pose_error_mAA", "mnum_matches"):
            assert key in summaries, sorted(summaries)
        # the pipeline must produce finite rows end to end (the fixture's
        # flat texture gives weak matches; correctness of the estimators
        # is covered by the synthetic oracle test above)
        assert np.isfinite(summaries["mnum_matches"])

    def test_pose_error_helpers(self):
        from comet_tpu.matching.eval_pipeline import (
            relative_pose_error_deg,
            sampson_distance_normalized,
        )

        r = np.eye(3)
        t = np.asarray([1.0, 0, 0])
        t_err, r_err = relative_pose_error_deg(r, t, r, -t)
        assert r_err == pytest.approx(0.0, abs=1e-6)
        assert t_err == pytest.approx(0.0, abs=1e-3)  # sign-symmetric

        # perfect correspondences have ~zero sampson distance
        rng = np.random.default_rng(0)
        k = np.asarray([[300.0, 0, 128], [0, 300.0, 128], [0, 0, 1]])
        pts = rng.uniform(-1, 1, size=(50, 3))
        pts[:, 2] += 4.0
        p0 = (pts @ k.T)
        p0 = p0[:, :2] / p0[:, 2:]
        theta = 0.2
        rr = np.asarray(
            [[np.cos(theta), 0, np.sin(theta)], [0, 1, 0],
             [-np.sin(theta), 0, np.cos(theta)]]
        )
        tt = np.asarray([0.5, 0.1, 0.05])
        p1 = (pts @ rr.T + tt) @ k.T
        p1 = p1[:, :2] / p1[:, 2:]
        d = sampson_distance_normalized(p0, p1, k, k, rr, tt)
        assert np.max(d) < 1e-8


class TestNewExtractors:
    def test_disk_registered_and_shapes(self):
        from comet_tpu.matching.registry import get_model

        rng = np.random.default_rng(0)
        img = rng.random((48, 64, 3)).astype(np.float32)
        out = get_model("extractor_disk", max_keypoints=32)(img)
        assert out["keypoints"].shape == (32, 2)
        assert out["descriptors"].shape == (32, 128)
        # descriptors unit-normalized
        norms = np.linalg.norm(np.asarray(out["descriptors"]), axis=-1)
        np.testing.assert_allclose(norms, 1.0, atol=1e-4)
        # valid keypoints inside the (unpadded) image
        v = np.asarray(out["valid"])
        kp = np.asarray(out["keypoints"])[v]
        assert (kp[:, 0] < 64).all() and (kp[:, 1] < 48).all()

    def test_keynet_registered_and_shapes(self):
        from comet_tpu.matching.registry import get_model

        rng = np.random.default_rng(1)
        img = rng.random((48, 64)).astype(np.float32)
        out = get_model("extractor_keynet", max_keypoints=32)(img)
        assert out["keypoints"].shape == (32, 2)
        assert out["descriptors"].shape == (32, 128)
        assert out["scales"].shape == (32,)
        norms = np.linalg.norm(np.asarray(out["descriptors"]), axis=-1)
        np.testing.assert_allclose(norms, 1.0, atol=1e-4)

    def test_disk_nms_suppresses_neighbors(self):
        """heatmap_to_keypoints: two peaks inside one window collapse to
        the stronger one; peaks respect the threshold gate."""
        from comet_tpu.models.disk import heatmap_to_keypoints

        hm = np.zeros((32, 32), np.float32)
        hm[10, 10] = 2.0
        hm[10, 12] = 1.5  # within the 5-window of (10,10) -> suppressed
        hm[20, 20] = 1.0
        kpts, scores, valid = heatmap_to_keypoints(
            jnp.asarray(hm), n=8, window_size=5, score_threshold=0.5
        )
        got = {tuple(map(int, k)) for k, va in zip(np.asarray(kpts), np.asarray(valid)) if va}
        assert (10, 10) in got and (20, 20) in got
        assert (12, 10) not in got
        assert int(np.asarray(valid).sum()) == 2

    def test_keynet_handcrafted_block_derivatives(self):
        """gx responds to a vertical edge, gy to a horizontal one."""
        from comet_tpu.models.keynet import handcrafted_block

        img = np.zeros((1, 16, 16, 1), np.float32)
        img[:, :, 8:, :] = 1.0  # vertical edge at x=8
        f = np.asarray(handcrafted_block(jnp.asarray(img)))[0]
        assert np.abs(f[8, 8, 0]) > 0.1  # gx channel
        assert np.abs(f[8, 8, 1]) < 1e-6  # gy channel


import jax.numpy as jnp  # noqa: E402  (used by TestNewExtractors)


class TestInspect:
    def test_renders_worst_pairs(self, tmp_path):
        import os

        p = HomographyEvalPipeline(
            {"data": {"n_pairs": 4, "image_size": 64},
             "eval": {"ransac_th": [3.0]}}
        )
        d = str(tmp_path / "exp")
        p.run(d)
        paths = p.inspect(d, k=2)
        assert len(paths) == 2
        for path in paths:
            assert os.path.exists(path)
            from PIL import Image

            img = np.asarray(Image.open(path))
            assert img.ndim == 3 and img.shape[1] > 64 * 2  # side-by-side

    def test_missing_cache_raises(self, tmp_path):
        p = HomographyEvalPipeline({"data": {"n_pairs": 2, "image_size": 64}})
        with pytest.raises(FileNotFoundError):
            p.inspect(str(tmp_path / "nope"))
