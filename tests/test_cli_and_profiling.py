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
