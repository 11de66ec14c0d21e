"""End-to-end train + eval CLI on the AMD fixture (slow).

Locks in the production cmd_train path the reference's (dead) training
loop intended (train_e2epose2.py:133-186): epoch loop, CSV logging,
full-state checkpointing, best-checkpoint tracking by eval metric,
auto-resume, and cmd_eval consuming the resulting best.msgpack.
"""

import csv
import os

import pytest

pytestmark = pytest.mark.slow

_TINY = ["--seqlen", "4", "--img-size", "256", "--track-num", "64"]


@pytest.fixture(scope="module")
def amd_root(tmp_path_factory):
    from comet_tpu.data.fixtures import generate_amd_fixture

    root = str(tmp_path_factory.mktemp("amd"))
    generate_amd_fixture(
        os.path.join(root, "AMD_train"), n_models=1, n_seqs=1, n_frames=4
    )
    generate_amd_fixture(
        os.path.join(root, "AMD_eval"), n_models=1, n_seqs=1, n_frames=4
    )
    return root


class TestTrainEndToEnd:
    def test_train_checkpoints_resume_and_eval(self, amd_root, tmp_path):
        from comet_tpu import cli

        out = str(tmp_path / "out")
        base = [
            "train", "--data-root", amd_root, "--output-dir", out,
            *_TINY, "--ckpt-interval", "1", "--eval-interval", "1",
            "--max-sequences", "1",
        ]
        cli.main(base + ["--epochs", "1"])

        ckpt_dir = os.path.join(out, "ckpt")
        # full-state checkpoint for epoch 0 + best weights from the eval
        assert any(d.startswith("ckpt_") for d in os.listdir(ckpt_dir))
        assert os.path.exists(os.path.join(ckpt_dir, "best.msgpack"))
        assert os.path.exists(os.path.join(ckpt_dir, "best.json"))

        csv_path = os.path.join(out, "train_results.csv")
        with open(csv_path) as f:
            rows = list(csv.DictReader(f))
        assert len(rows) == 1
        assert "loss" in rows[0] and float(rows[0]["loss"]) > 0

        # auto-resume: asking for 2 epochs continues from epoch 1
        cli.main(base + ["--epochs", "2"])
        with open(csv_path) as f:
            rows = list(csv.DictReader(f))
        assert len(rows) == 2  # exactly ONE new epoch ran

        # eval consumes the best checkpoint
        cli.main([
            "eval", "--data-root", os.path.join(amd_root, "AMD_eval"),
            "--output-dir", str(tmp_path / "eval"), *_TINY,
            "--checkpoint", os.path.join(ckpt_dir, "best.msgpack"),
            "--max-sequences", "1",
        ])
        with open(str(tmp_path / "eval" / "test_results.csv")) as f:
            erows = list(csv.DictReader(f))
        assert len(erows) == 1
        assert "Auc_30" in erows[0]


class TestWindowedTrainCLI:
    def test_windowed_train_runs_and_logs_tf_ratio(self, amd_root, tmp_path):
        """cmd_train --windowed (VERDICT r3 item 7): teacher-forced
        long-sequence training end to end — sequences of --train-seq-len
        frames run in windows of seqlen through one differentiable scan,
        the tf ratio anneals into the CSV, and artifacts land."""
        from comet_tpu import cli

        out = str(tmp_path / "win")
        cli.main([
            "train", "--data-root", amd_root, "--output-dir", out,
            *_TINY, "--epochs", "2", "--ckpt-interval", "1",
            "--eval-interval", "2", "--max-sequences", "1",
            "--windowed", "--train-seq-len", "6",
            "--tf-start", "1.0", "--tf-end", "0.2", "--tf-epochs", "2",
        ])
        csv_path = os.path.join(out, "train_results.csv")
        with open(csv_path) as f:
            rows = list(csv.DictReader(f))
        assert len(rows) == 2
        assert float(rows[0]["loss"]) > 0
        # the annealing schedule: epoch-0 ratio 1.0, epoch-1 ratio 0.6
        assert float(rows[0]["tf_ratio"]) == 1.0
        assert abs(float(rows[1]["tf_ratio"]) - 0.6) < 1e-6
        assert os.path.exists(os.path.join(out, "ckpt", "best.msgpack"))
