"""SuperGlue-style matcher: Sinkhorn properties, match recovery, masking.

Parity target: gluefactory_nonfree/superglue.py behavior (keypoint encoder
+ attentional GNN + dustbin optimal transport); algorithm-level tests, no
torch weights exist for this module in-env.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from comet_tpu.matching.registry import get_model
from comet_tpu.matching.superglue import (
    SuperGlueMatcher,
    log_sinkhorn,
    superglue_nll_loss,
)

class TestLogSinkhorn:
    def test_marginals(self):
        # transport rows/cols must hit the SuperGlue marginals: each real
        # keypoint carries mass 1/(m+n) (pre-rescale), dustbins carry the
        # opposite count
        key = jax.random.PRNGKey(0)
        s = jax.random.normal(key, (6, 9))
        log_p = log_sinkhorn(s, jnp.asarray(0.3), iters=200)
        p = np.exp(np.asarray(log_p, np.float64)) / (6 + 9)  # undo -norm
        np.testing.assert_allclose(p.sum(), 1.0, atol=1e-4)
        np.testing.assert_allclose(p[:6].sum(axis=1), 1 / 15, atol=1e-5)
        np.testing.assert_allclose(p[:, :9].sum(axis=0), 1 / 15, atol=1e-5)
        # the dustbin ROW absorbs unmatched set-1 columns (mass n/(m+n));
        # the dustbin COLUMN absorbs unmatched set-0 rows (m/(m+n))
        np.testing.assert_allclose(p[6].sum(), 9 / 15, atol=1e-4)
        np.testing.assert_allclose(p[:, 9].sum(), 6 / 15, atol=1e-4)

    def test_padding_masks_zero_mass(self):
        key = jax.random.PRNGKey(1)
        s = jax.random.normal(key, (8, 8))
        v0 = jnp.arange(8) < 5
        v1 = jnp.arange(8) < 6
        log_p = log_sinkhorn(s, jnp.asarray(0.0), iters=100, valid0=v0, valid1=v1)
        p = np.exp(np.asarray(log_p, np.float64)) / 11.0
        assert p[5:8].sum() < 1e-6  # padded rows carry no mass
        assert p[:, 6:8].sum() < 1e-6
        np.testing.assert_allclose(p.sum(), 1.0, atol=1e-4)

    def test_strong_diagonal_assigns_diagonal(self):
        s = jnp.eye(5) * 10.0
        log_p = log_sinkhorn(s, jnp.asarray(0.0), iters=100)
        p = np.asarray(jnp.exp(log_p))[:5, :5]
        assert (p.argmax(axis=1) == np.arange(5)).all()


class TestSuperGlueMatcher:
    def _feats(self, n, d=64, seed=0):
        k1, k2 = jax.random.split(jax.random.PRNGKey(seed))
        kpts = jax.random.uniform(k1, (n, 2)) * 2 - 1
        desc = jax.random.normal(k2, (n, d))
        desc = desc / jnp.linalg.norm(desc, axis=-1, keepdims=True)
        return kpts, desc

    def test_shapes_and_score_range(self):
        kpts, desc = self._feats(24)
        m = SuperGlueMatcher(depth=2, dim=64, sinkhorn_iters=30,
                             filter_threshold=0.0)
        params = m.init(jax.random.PRNGKey(0), kpts, desc, kpts, desc)
        out = m.apply(params, kpts, desc, kpts, desc)
        assert out["matches0"].shape == (24,)
        assert out["log_assignment"].shape == (25, 25)
        p = np.asarray(out["assignment"])
        assert np.isfinite(p).all()
        assert (p >= 0).all() and (p <= 1.0 + 1e-4).all()
        mm = np.asarray(out["matches0"])
        assert ((mm >= -1) & (mm < 24)).all()

    def test_padding_invariance(self):
        # adding padded (masked) keypoints must not change real matches
        kpts, desc = self._feats(16, seed=3)
        k2, d2 = self._feats(16, seed=4)
        m = SuperGlueMatcher(depth=2, dim=64, sinkhorn_iters=30)
        params = m.init(jax.random.PRNGKey(0), kpts, desc, k2, d2)
        out_a = m.apply(params, kpts, desc, k2, d2)

        pad = lambda x: jnp.concatenate([x, jnp.zeros((8,) + x.shape[1:], x.dtype)])
        v = jnp.arange(24) < 16
        out_b = m.apply(
            params, pad(kpts), pad(desc), pad(k2), pad(d2),
            valid0=v, valid1=v,
        )
        np.testing.assert_allclose(
            np.asarray(out_a["assignment"]),
            np.asarray(out_b["assignment"])[:16, :16],
            atol=1e-4,
        )
        assert (np.asarray(out_b["matches0"])[16:] == -1).all()

    def test_registry_and_jit(self):
        m = get_model("matcher_superglue", depth=1, dim=64, sinkhorn_iters=10)
        kpts, desc = self._feats(12, seed=5)
        params = m.init(jax.random.PRNGKey(0), kpts, desc, kpts, desc)
        out = jax.jit(lambda p, a, b, c, d: m.apply(p, a, b, c, d))(
            params, kpts, desc, kpts, desc
        )
        assert np.isfinite(np.asarray(out["assignment"])).all()


class TestSuperGlueLoss:
    def test_perfect_assignment_has_low_loss(self):
        n = 10
        # log-assignment concentrated on the diagonal (plus tiny dustbins)
        log_p = jnp.full((n + 1, n + 1), -20.0)
        log_p = log_p.at[jnp.arange(n), jnp.arange(n)].set(0.0)
        gt = jnp.arange(n)
        loss_good = superglue_nll_loss(log_p, gt, gt)
        # same assignment scored against a shuffled GT must be much worse
        perm = jnp.roll(gt, 1)
        loss_bad = superglue_nll_loss(log_p, perm, perm)
        assert float(loss_good) < 1e-3
        assert float(loss_bad) > 5.0

    def test_unmatched_points_hit_dustbin(self):
        n = 6
        log_p = jnp.full((n + 1, n + 1), -20.0)
        # everything unmatched, all mass on dustbins
        log_p = log_p.at[:n, n].set(0.0)
        log_p = log_p.at[n, :n].set(0.0)
        gt = jnp.full((n,), -1)
        assert float(superglue_nll_loss(log_p, gt, gt)) < 1e-3

    def test_gradient_flows(self):
        kpts = jax.random.uniform(jax.random.PRNGKey(0), (12, 2))
        desc = jax.random.normal(jax.random.PRNGKey(1), (12, 64))
        m = SuperGlueMatcher(depth=1, dim=64, sinkhorn_iters=10)
        params = m.init(jax.random.PRNGKey(2), kpts, desc, kpts, desc)
        gt = jnp.arange(12)

        def loss(p):
            out = m.apply(p, kpts, desc, kpts, desc)
            return superglue_nll_loss(out["log_assignment"], gt, gt)

        g = jax.grad(loss)(params)
        norms = [float(jnp.abs(x).sum()) for x in jax.tree_util.tree_leaves(g)]
        assert all(np.isfinite(norms))
        assert sum(norms) > 0


@pytest.mark.slow
class TestSuperGlueTraining:
    def test_training_recovers_permutation(self):
        """A tiny SuperGlue trained with the OT NLL on a fixed permuted
        descriptor set must learn to assign the permutation."""
        import optax

        n, d = 16, 64
        k1, k2, k3 = jax.random.split(jax.random.PRNGKey(7), 3)
        kpts0 = jax.random.uniform(k1, (n, 2)) * 2 - 1
        desc = jax.random.normal(k2, (n, d))
        desc = desc / jnp.linalg.norm(desc, axis=-1, keepdims=True)
        perm = jax.random.permutation(k3, n)
        kpts1, desc1 = kpts0[perm], desc[perm]
        gt0 = jnp.argsort(perm)  # point i in set0 -> position of i in set1
        gt1 = perm

        from comet_tpu.matching.train import build_superglue_train_step

        m = SuperGlueMatcher(depth=2, dim=64, sinkhorn_iters=20,
                             filter_threshold=0.0)
        params = m.init(jax.random.PRNGKey(0), kpts0, desc, kpts1, desc1)
        tx = optax.adam(3e-4)
        opt = tx.init(params)
        step = build_superglue_train_step(m, tx)
        batch = {
            "kpts0": kpts0[None], "desc0": desc[None],
            "kpts1": kpts1[None], "desc1": desc1[None],
            "gt0": gt0[None], "gt1": gt1[None],
        }

        first = None
        for i in range(150):
            params, opt, loss = step(params, opt, batch)
            if first is None:
                first = float(loss)
        assert float(loss) < first * 0.5

        out = m.apply(params, kpts0, desc, kpts1, desc1)
        acc = (np.asarray(out["matches0"]) == np.asarray(gt0)).mean()
        assert acc > 0.8
