"""Named matching experiments (gluefactory configs/*.yaml equivalent)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from comet_tpu.matching.configs import (
    EXPERIMENTS,
    build_pipeline,
    get_experiment,
    list_experiments,
)


def _image(seed, h=96, w=96):
    rng = np.random.default_rng(seed)
    img = rng.random((h, w, 3)).astype(np.float32) * 0.2
    img[30:60, 20:70] += 0.6  # a bright box: corners + edges to detect
    return jnp.asarray(np.clip(img, 0, 1))


class TestExperimentRegistry:
    def test_all_experiments_instantiate(self):
        # every named pairing must resolve through the model registry
        for name in list_experiments():
            pipe = build_pipeline(name)
            assert callable(pipe.extractor)
            assert callable(pipe.matcher) or hasattr(pipe.matcher, "apply")

    def test_config_is_copied(self):
        a = get_experiment("superpoint+nn")
        a["extractor"]["max_keypoints"] = 7
        assert EXPERIMENTS["superpoint+nn"]["extractor"]["max_keypoints"] == 512

    def test_overrides(self):
        conf = get_experiment("superpoint+lightglue_homography")
        assert conf["train"]["epochs"] == 40
        pipe = build_pipeline(
            "superpoint+nn", matcher={"threshold": 0.5}
        )
        assert pipe is not None

    def test_unknown_raises(self):
        with pytest.raises(KeyError):
            get_experiment("nope+never")


class TestPipelineExecution:
    def test_superpoint_nn_runs(self):
        pipe = build_pipeline("superpoint+nn")
        img0 = _image(0)
        out0 = pipe.extractor(img0)
        assert "keypoints" in out0 and "descriptors" in out0

    def test_deeplsd_gluestick_extractor_runs(self):
        conf = get_experiment("deeplsd+gluestick")
        from comet_tpu.matching.registry import get_model

        ext_conf = dict(conf["extractor"])
        extractor = get_model(ext_conf.pop("name"), **ext_conf)
        out = extractor(_image(1))
        assert out["lines"].shape[-2:] == (2, 2)
        assert "line_descriptors" in out
        assert np.isfinite(np.asarray(out["line_descriptors"])).all()


class TestMatchCLI:
    def test_list_and_run(self, capsys):
        from comet_tpu.cli import main

        main(["match", "--list"])
        out = capsys.readouterr().out
        assert "superpoint+nn" in out and "deeplsd+gluestick" in out

        main(["match", "--experiment", "sift+nn", "--n-pairs", "1",
              "--image-size", "80"])
        out = capsys.readouterr().out
        import json as _json

        row = _json.loads(out.strip().splitlines()[-1])
        assert row["experiment"] == "sift+nn"
        assert "H_error_ransac" in row and row["num_matches"] > 0

    def test_flax_matcher_adapter(self):
        # wrap_flax_matcher: lazy init + pixel->[-1,1] normalization +
        # masks; SuperGlue path must execute through the pipeline contract
        import numpy as np

        from comet_tpu.matching.configs import build_pipeline

        pipe = build_pipeline(
            "superpoint+superglue", image_hw=(64, 64),
            matcher={"depth": 1, "dim": 64, "sinkhorn_iters": 5},
            extractor={"max_keypoints": 64},
        )
        rng = np.random.default_rng(0)
        img = jnp.asarray(rng.random((64, 64, 3)).astype(np.float32))
        out = pipe(img, img)
        assert out["matches0"].shape[0] == 64
        assert pipe.matcher.holder["params"] is not None


@pytest.mark.slow
class TestAlikedBenchmark:
    def test_aliked_nn_homography_benchmark_runs(self):
        """VERDICT item 5 'done' criterion: registered extractor_aliked
        passing through the homography benchmark pipeline (weightless in
        this env, so the assertion is on pipeline completion + metric
        schema, not match quality)."""
        import numpy as np

        from comet_tpu.matching.benchmarks import (
            make_synthetic_pairs,
            run_homography_benchmark,
        )
        from comet_tpu.matching.configs import build_pipeline

        pipe = build_pipeline(
            "aliked+nn",
            extractor={"model_name": "aliked-t16", "max_keypoints": 64,
                       "detection_threshold": 0.0},
        )
        pairs = make_synthetic_pairs(2, hw=(96, 96), seed=0)
        row = run_homography_benchmark(pipe, pairs)
        assert set(row) >= {"num_matches", "prec@3px", "H_error_ransac",
                            "H_acc@3px"}
        assert np.isfinite(row["num_matches"])


class TestMatchPipelineCLI:
    def test_relpose_pipeline_and_cache(self, tmp_path, capsys):
        import json as _json

        from comet_tpu.cli import main

        exp = str(tmp_path / "rel")
        main(["match", "--pipeline", "relpose", "--n-pairs", "2",
              "--exp-dir", exp])
        row1 = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert "rel_pose_error_mAA" in row1
        import os

        assert os.path.exists(os.path.join(exp, "predictions.h5"))
        # rerun hits the cache and reproduces the summaries
        main(["match", "--pipeline", "relpose", "--n-pairs", "2",
              "--exp-dir", exp])
        row2 = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert row1 == row2
