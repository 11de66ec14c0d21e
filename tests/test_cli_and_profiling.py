"""CLI argument plumbing and the profiling harness (host-side units)."""

import jax.numpy as jnp
import numpy as np


class TestCliParsing:
    def _parse(self, argv):
        from comet_tpu.cli import main

        # build the parser exactly as main does, but only parse
        import argparse

        from comet_tpu import cli

        parser = argparse.ArgumentParser(prog="comet")
        sub = parser.add_subparsers(dest="command", required=True)
        for name in ("eval", "train", "demo", "bench"):
            p = sub.add_parser(name)
            cli._common(p)
            if name == "train":
                p.add_argument("--epochs", type=int, default=None)
        return parser.parse_args(argv)

    def test_common_flags_parse(self):
        a = self._parse(
            [
                "eval", "--preset", "abl_track", "--data-root", "/x",
                "--keypoints", "superpoint", "--device-preprocess",
                "--max-sequences", "3",
            ]
        )
        assert a.preset == "abl_track"
        assert a.device_preprocess is True
        assert a.max_sequences == 3

    def test_train_epochs_flag_applies(self):
        # regression: --epochs was parsed but never applied to the config
        import dataclasses

        from comet_tpu.config import get_config

        a = self._parse(["train", "--epochs", "2"])
        cfg = get_config(a.preset)
        if a.epochs:
            cfg = cfg.replace(train=dataclasses.replace(cfg.train, epochs=a.epochs))
        assert cfg.train.epochs == 2

    def test_build_overrides(self):
        from comet_tpu.cli import _build

        a = self._parse(
            ["eval", "--seqlen", "8", "--img-size", "256", "--track-num", "64"]
        )
        cfg = _build(a)
        assert (cfg.seqlen, cfg.img_size, cfg.track_num) == (8, 256, 64)


class TestCompileCache:
    def test_opt_in_knob(self, monkeypatch, tmp_path):
        """COMET_COMPILE_CACHE=dir enables jax's persistent compilation
        cache; unset leaves the config untouched (opt-in only)."""
        import jax

        from comet_tpu.cli import _maybe_enable_compile_cache

        monkeypatch.delenv("COMET_COMPILE_CACHE", raising=False)
        before = jax.config.jax_compilation_cache_dir
        _maybe_enable_compile_cache()
        assert jax.config.jax_compilation_cache_dir == before

        cache = str(tmp_path / "xla_cache")
        monkeypatch.setenv("COMET_COMPILE_CACHE", cache)
        try:
            _maybe_enable_compile_cache()
            assert jax.config.jax_compilation_cache_dir == cache
            assert (
                jax.config.jax_persistent_cache_min_compile_time_secs == 1.0
            )
        finally:
            jax.config.update("jax_compilation_cache_dir", before)


class TestProfilingHarness:
    def test_benchmark_fn_reports_sane_timing(self):
        from comet_tpu.utils.profiling import benchmark_fn

        x = jnp.ones((64, 64))
        stats = benchmark_fn(lambda a: a @ a, x, reps=4)
        assert stats["ms_per_call"] >= 0.0
        assert stats["calls_per_sec"] > 0.0

    def test_measure_host_rtt_positive(self):
        from comet_tpu.utils.profiling import measure_host_rtt

        assert measure_host_rtt(reps=2) > 0.0


class TestBestCheckpoint:
    def _params(self):
        return {"params": {"w": np.ones((2, 2), np.float32)}}

    def test_tracks_maximizing_key(self, tmp_path):
        import json
        import os

        from comet_tpu.cli import _maybe_save_best

        ckpt = str(tmp_path / "ckpt")
        _maybe_save_best(ckpt, self._params(), {"Auc_30": 0.4}, 0)
        assert os.path.exists(os.path.join(ckpt, "best.msgpack"))
        t0 = os.path.getmtime(os.path.join(ckpt, "best.msgpack"))
        # worse metric: not overwritten
        _maybe_save_best(ckpt, self._params(), {"Auc_30": 0.3}, 1)
        with open(os.path.join(ckpt, "best.json")) as f:
            assert json.load(f)["epoch"] == 0
        # better metric: overwritten
        _maybe_save_best(ckpt, self._params(), {"Auc_30": 0.5}, 2)
        with open(os.path.join(ckpt, "best.json")) as f:
            side = json.load(f)
        assert side["epoch"] == 2 and side["value"] == 0.5
        assert os.path.getmtime(os.path.join(ckpt, "best.msgpack")) >= t0

    def test_minimizing_key_and_missing_key(self, tmp_path):
        import json
        import os

        from comet_tpu.cli import _maybe_save_best

        ckpt = str(tmp_path / "ckpt")
        _maybe_save_best(ckpt, self._params(), {"R_avg": 9.0}, 0, key="R_avg")
        _maybe_save_best(ckpt, self._params(), {"R_avg": 5.0}, 1, key="R_avg")
        _maybe_save_best(ckpt, self._params(), {"R_avg": 7.0}, 2, key="R_avg")
        with open(os.path.join(ckpt, "best.json")) as f:
            assert json.load(f)["epoch"] == 1
        # unknown key: warn, never write
        _maybe_save_best(ckpt, self._params(), {"R_avg": 1.0}, 3, key="nope")
        with open(os.path.join(ckpt, "best.json")) as f:
            assert json.load(f)["epoch"] == 1

    def test_roundtrips_through_loader(self, tmp_path):
        import os

        from comet_tpu.cli import _maybe_save_best
        from comet_tpu.utils.serialization import load_params_msgpack

        ckpt = str(tmp_path / "ckpt")
        params = {"params": {"w": np.full((2, 2), 3.0, np.float32)}}
        _maybe_save_best(ckpt, params, {"Auc_30": 1.0}, 0)
        tmpl = {"params": {"w": np.zeros((2, 2), np.float32)}}
        loaded = load_params_msgpack(os.path.join(ckpt, "best.msgpack"), tmpl)
        np.testing.assert_array_equal(loaded["params"]["w"], 3.0)
