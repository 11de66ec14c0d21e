"""Teacher-forced windowed TRAINING (VERDICT r3 item 7).

The reference intends long-sequence training through sliding windows with
scheduled teacher forcing (E2Epose2.forward_window:269-612 +
TeacherForcingScheduler:40-56 — dead code with attribute bugs as shipped).
This suite proves the TPU-native implementation actually trains: gradients
flow through the whole in-graph window chain (including the pose
composition of late windows), teacher forcing switches the chain anchors,
and the loss decreases.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def setup():
    from test_models import tiny_config

    from comet_tpu.models import COMET
    from comet_tpu.geometry.cameras import make_camera_set

    cfg = tiny_config()
    wlen = cfg.seqlen
    t = 2 * wlen
    model = COMET(cfg)
    rng = np.random.default_rng(0)
    images = jnp.asarray(
        rng.random((1, t, cfg.img_size, cfg.img_size, 3)).astype(np.float32)
    )
    queries = jnp.asarray(
        8.0 + rng.random((1, cfg.track_num, 2)).astype(np.float32)
        * (cfg.img_size - 16)
    )
    q = rng.normal(size=(t, 4)).astype(np.float32)
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    t_uvz = rng.normal(size=(t, 3)).astype(np.float32)
    t_uvz[:, 2] = np.abs(t_uvz[:, 2]) + 2.0
    gt = make_camera_set(
        q=q, t_xyz=rng.normal(size=(t, 3)).astype(np.float32),
        t_uvz=t_uvz, focal=np.full((t, 2), 2.0, np.float32),
        pp=None, ratio=np.float32(0.5),
    )
    params = model.init(jax.random.PRNGKey(0), images[:, :wlen], queries)
    return cfg, model, params, images, queries, gt


class TestWindowedTraining:
    def test_gradients_flow_through_window_chain(self, setup):
        """Camera-predictor grads from the FULL stitched loss are nonzero,
        and a loss restricted to LATE frames (covered only by windows > 0,
        whose anchors chain through earlier windows) still reaches the
        camera params — the chain is differentiable end to end."""
        from comet_tpu.models.comet import encode_gt
        from comet_tpu.models.windowed import windowed_forward_scan

        cfg, model, params, images, queries, gt = setup
        wlen = cfg.seqlen
        gt_enc = encode_gt(cfg, gt)

        def loss_late(p):
            enc, _ = windowed_forward_scan(
                lambda im, q: model.apply(p, im, q),
                images, queries, wlen, gt.ratio,
            )
            # frames wlen.. are produced by window 1+ only
            return jnp.mean((enc[:, wlen:, :] - gt_enc[None, wlen:, :7]) ** 2)

        grads = jax.grad(loss_late)(params)
        cam = grads["params"]["camera_predictor"]
        norms = [float(jnp.abs(g).max()) for g in jax.tree_util.tree_leaves(cam)]
        assert np.isfinite(norms).all()
        assert max(norms) > 0.0
        # frozen tracker: zero grads
        for k in ("coarse_fnet", "fine_fnet"):
            for g in jax.tree_util.tree_leaves(grads["params"][k]):
                assert float(jnp.abs(g).max()) == 0.0

    def test_teacher_forcing_switches_anchors(self, setup):
        """With random (wrong) predictions, GT-anchored chaining must
        produce different stitched encodings than self-anchored chaining.
        Frame 0 is anchored to itself in both modes (identity) and must
        be identical; with the tiny config's stride-1 window schedule
        every later frame is refined by a window whose anchor differs
        between the modes, so the rest must diverge."""
        from comet_tpu.models.comet import encode_gt
        from comet_tpu.models.windowed import windowed_forward_scan

        cfg, model, params, images, queries, gt = setup
        wlen = cfg.seqlen
        gt_enc = encode_gt(cfg, gt)
        apply_fn = jax.jit(lambda im, q: model.apply(params, im, q))

        enc_self, _ = windowed_forward_scan(
            apply_fn, images, queries, wlen, gt.ratio,
        )
        enc_tf, _ = windowed_forward_scan(
            apply_fn, images, queries, wlen, gt.ratio,
            gt_enc=gt_enc, teacher_force=True,
        )
        frame0 = np.asarray(enc_self[0, 0]) - np.asarray(enc_tf[0, 0])
        later = np.asarray(enc_self[0, 1:]) - np.asarray(enc_tf[0, 1:])
        assert np.abs(frame0).max() < 1e-5
        assert np.abs(later).max() > 1e-3

    def test_windowed_step_trains(self, setup):
        """~25 jitted windowed train steps halve the stitched pose loss."""
        from comet_tpu.training.loop import build_windowed_train_step
        from comet_tpu.training.optim import build_optimizer

        cfg, model, params, images, queries, gt = setup
        tx, _ = build_optimizer(
            params, base_lr=3e-3, steps_per_epoch=10, restart_epochs=1,
            warmup_ratio=0.05,
        )
        opt_state = tx.init(params)
        step = build_windowed_train_step(model, cfg, tx, cfg.seqlen)
        p = params
        losses = []
        for i in range(25):
            # alternate anchors like the annealing scheduler would
            p, opt_state, aux = step(
                p, opt_state, images, queries, gt, teacher_force=(i % 2 == 0)
            )
            losses.append(float(aux["loss"]))
        assert np.isfinite(losses).all()
        assert losses[-1] < 0.5 * losses[0], losses[::5]

    def test_scheduler_anneals(self):
        from comet_tpu.models.windowed import TeacherForcingScheduler

        s = TeacherForcingScheduler(1.0, 0.2, 10)
        ratios = [s.ratio(e) for e in range(12)]
        assert ratios[0] == 1.0
        assert all(a >= b for a, b in zip(ratios, ratios[1:]))
        assert ratios[10] == ratios[11] == 0.2
        # stochastic decision follows the ratio
        rng = np.random.default_rng(0)
        picks = [s.use_teacher_forcing(0, rng) for _ in range(50)]
        assert all(picks)  # ratio 1.0 -> always
        picks = [s.use_teacher_forcing(100, rng) for _ in range(500)]
        assert 0.05 < np.mean(picks) < 0.4  # ratio 0.2
