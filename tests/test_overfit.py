"""Proof that the COMET training path LEARNS (VERDICT r3 weak #3 / item 4).

The 499-test round-3 suite proved optimizer formulas, artifact plumbing and
`loss > 0` — but nothing asserted the jitted train step actually DECREASES
the pose loss or improves a metric. A wrong stop_gradient, a mis-masked
head, or an lr bug would have passed everything. This suite overfits the
fixture: ~120 jitted steps on 2 sequences must cut the loss by >=50% and
improve R_avg and Auc_30 versus step 0.

Reference counterpart: the live train branch of
train_eval_func_new_cp5.py:790-818 (backward/clip/step/scheduler).
"""

import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp

pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def fixture_batch(tmp_path_factory):
    """2 fixture sequences -> batched (images, queries, gt_cams)."""
    from test_models import tiny_config

    from comet_tpu.data.datasets import AMDDataset
    from comet_tpu.data.fixtures import generate_amd_fixture
    from comet_tpu.data.keypoints import seed_query_points
    from comet_tpu.geometry.cameras import CameraSet
    from comet_tpu.training.loop import make_gt_cameras

    cfg = tiny_config()
    root = str(tmp_path_factory.mktemp("overfit"))
    generate_amd_fixture(
        os.path.join(root, "AMD_train"), n_models=1, n_seqs=2,
        n_frames=cfg.seqlen + 2, img_hw=(96, 128),
    )
    ds = AMDDataset(
        os.path.join(root, "AMD_train"), crop_size=cfg.img_size,
        seq_len=cfg.seqlen, use_augs=False,
    )
    rng = np.random.default_rng(0)
    samples = [ds[i] for i in range(2)]
    queries = np.stack([
        seed_query_points(
            s.images[0], s.first_mask, cfg.track_num, cfg.min_track_num,
            backend="grid", rng=rng,
        )
        for s in samples
    ])
    images = np.stack([s.images for s in samples])
    gts = [make_gt_cameras(s) for s in samples]
    gt_b = CameraSet(
        q=jnp.stack([g.q for g in gts]),
        t_xyz=jnp.stack([g.t_xyz for g in gts]),
        t_uvz=jnp.stack([g.t_uvz for g in gts]),
        focal=jnp.stack([g.focal for g in gts]),
        pp=jnp.stack([g.pp for g in gts]),
        ratio=jnp.stack([jnp.asarray(g.ratio) for g in gts]),
    )
    return cfg, jnp.asarray(images), jnp.asarray(queries), gt_b, gts


class TestOverfit:
    def test_loss_halves_and_metrics_improve(self, fixture_batch):
        import optax

        from comet_tpu.models import COMET
        from comet_tpu.training.loop import build_train_step, metric_block
        from comet_tpu.training.optim import build_optimizer

        cfg, images, queries, gt_b, gts = fixture_batch
        model = COMET(cfg)
        params = jax.jit(model.init)(jax.random.PRNGKey(0), images, queries)

        # the PRODUCTION optimizer construction (camera-only mask +
        # warmup-cosine schedule), only the lr raised for overfitting speed
        tx, _ = build_optimizer(
            params, base_lr=3e-3, steps_per_epoch=20, restart_epochs=1,
            warmup_ratio=0.05,
        )
        opt_state = tx.init(params)
        step = build_train_step(model, cfg, tx)

        losses = []
        first_aux = last_aux = None
        for i in range(120):
            params, opt_state, aux = step(
                params, opt_state, images, queries, gt_b
            )
            losses.append(float(aux["loss"]))
            if i == 0:
                first_aux = {k: np.asarray(v) for k, v in aux.items()}
            last_aux = aux
        last_aux = {k: np.asarray(v) for k, v in last_aux.items()}

        assert np.isfinite(losses).all()
        assert losses[-1] < 0.5 * losses[0], (
            f"train step does not learn: {losses[::24]}"
        )

        # metric improvement per sequence: R_avg down, Auc_30 up
        def rows(aux):
            out = []
            for b, gt in enumerate(gts):
                sub = {
                    k: v[b : b + 1]
                    for k, v in aux.items()
                    if hasattr(v, "ndim") and v.ndim >= 1
                }
                out.append(metric_block(sub, gt))
            return out

        r0, r1 = rows(first_aux), rows(last_aux)
        mean0 = {k: np.mean([r[k] for r in r0]) for k in r0[0]}
        mean1 = {k: np.mean([r[k] for r in r1]) for k in r1[0]}
        assert mean1["R_avg"] < mean0["R_avg"], (mean0["R_avg"], mean1["R_avg"])
        assert mean1["Auc_30"] >= mean0["Auc_30"], (
            mean0["Auc_30"], mean1["Auc_30"],
        )

    def test_frozen_tracker_params_do_not_move(self, fixture_batch):
        """freeze_track + the camera-only optimizer mask: after real update
        steps the tracker subtree is bit-identical, the camera subtree is
        not (E2Epose2.py:93-107 + train_util.py:311-319 semantics)."""
        from comet_tpu.models import COMET
        from comet_tpu.training.loop import build_train_step
        from comet_tpu.training.optim import build_optimizer

        cfg, images, queries, gt_b, _ = fixture_batch
        model = COMET(cfg)
        params = jax.jit(model.init)(jax.random.PRNGKey(1), images, queries)
        tx, _ = build_optimizer(
            params, base_lr=3e-3, steps_per_epoch=20, restart_epochs=1,
            warmup_ratio=0.05,
        )
        opt_state = tx.init(params)
        step = build_train_step(model, cfg, tx)
        p1 = params
        for _ in range(3):
            p1, opt_state, _ = step(p1, opt_state, images, queries, gt_b)

        def leaves(tree, key):
            return jax.tree_util.tree_leaves(tree["params"][key])

        for k in ("coarse_fnet", "coarse_tracker", "fine_fnet", "fine_tracker"):
            for a, b in zip(leaves(params, k), leaves(p1, k)):
                np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        moved = any(
            not np.array_equal(np.asarray(a), np.asarray(b))
            for a, b in zip(
                leaves(params, "camera_predictor"),
                leaves(p1, "camera_predictor"),
            )
        )
        assert moved
