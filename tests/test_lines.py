"""Line stack (matching/lines.py): LSD-equivalent detector, wireframe
extractor, line descriptor sampling, NN line matching, GlueStick-style
joint point+line matcher.

Parity intent: gluefactory/models/lines/{lsd,wireframe}.py +
models/matchers/gluestick.py capability surface, on synthetic images with
analytically known line segments.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from comet_tpu.matching.gluestick import GlueStickMatcher
from comet_tpu.matching.lines import (
    detect_line_segments,
    match_lines_nn,
    sample_line_descriptors,
    sample_line_points,
)

# no module-level fast mark: conftest auto-marks non-slow tests as fast,
# and a module-level mark would ALSO attach to the slow training class
# (both markers -> selected by -m fast, defeating the slow gate)


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def draw_line(img, p0, p1, value=1.0, thickness=1):
    """Rasterize a thick anti-alias-free segment into img (h, w)."""
    n = int(np.hypot(p1[0] - p0[0], p1[1] - p0[1]) * 2) + 1
    for t in np.linspace(0, 1, n):
        x = p0[0] * (1 - t) + p1[0] * t
        y = p0[1] * (1 - t) + p1[1] * t
        xi, yi = int(round(x)), int(round(y))
        img[max(yi - thickness + 1, 0): yi + thickness,
            max(xi - thickness + 1, 0): xi + thickness] = value
    return img


def seg_endpoint_error(seg, gt0, gt1):
    """Endpoint distance of an undirected segment to GT endpoints."""
    a = np.linalg.norm(seg[0] - gt0) + np.linalg.norm(seg[1] - gt1)
    b = np.linalg.norm(seg[0] - gt1) + np.linalg.norm(seg[1] - gt0)
    return min(a, b) / 2.0


class TestDetector:
    def test_finds_synthetic_lines(self):
        img = np.zeros((96, 96), np.float32)
        gt = [((15.0, 20.0), (75.0, 20.0)),   # horizontal
              ((30.0, 40.0), (30.0, 85.0)),   # vertical
              ((50.0, 50.0), (80.0, 80.0))]   # diagonal
        for p0, p1 in gt:
            draw_line(img, p0, p1, 1.0, 2)
        out = detect_line_segments(jnp.asarray(img), max_lines=32)
        segs = np.asarray(out.segments)[np.asarray(out.valid)]
        assert len(segs) >= 3
        # every GT line matched by some detection with small endpoint error
        for p0, p1 in gt:
            errs = [seg_endpoint_error(s, np.asarray(p0), np.asarray(p1))
                    for s in segs]
            assert min(errs) < 6.0, (p0, p1, min(errs))

    def test_blank_image_no_lines(self):
        out = detect_line_segments(jnp.zeros((64, 64)), max_lines=16)
        assert not bool(np.asarray(out.valid).any())

    def test_jits(self):
        img = jnp.zeros((64, 64)).at[32, 10:50].set(1.0)
        f = jax.jit(lambda im: detect_line_segments(im, max_lines=8))
        out = f(img)
        assert out.segments.shape == (8, 2, 2)


class TestLineDescriptors:
    def test_sample_points_even_spacing(self):
        segs = jnp.asarray([[[0.0, 0.0], [8.0, 0.0]]])
        pts = np.asarray(sample_line_points(segs, 5))[0]
        np.testing.assert_allclose(pts[:, 0], [0, 2, 4, 6, 8], atol=1e-6)

    def test_descriptors_normalized(self, rng):
        desc_map = jnp.asarray(rng.normal(size=(32, 32, 8)), jnp.float32)
        segs = jnp.asarray(rng.uniform(2, 29, size=(4, 2, 2)), jnp.float32)
        d = np.asarray(sample_line_descriptors(desc_map, segs, 5))
        assert d.shape == (4, 5, 8)
        np.testing.assert_allclose(np.linalg.norm(d, axis=-1), 1.0, atol=1e-5)

    def test_nn_line_matching_recovers_identity(self, rng):
        d0 = rng.normal(size=(6, 5, 8)).astype(np.float32)
        perm = rng.permutation(6)
        d1 = d0[perm] + rng.normal(size=(6, 5, 8)).astype(np.float32) * 0.01
        out = match_lines_nn(jnp.asarray(d0), jnp.asarray(d1))
        m = np.asarray(out["matches0"])
        # d1[j] = d0[perm[j]] -> line i of set 0 matches the j with
        # perm[j] == i, i.e. matches0 = argsort-style inverse of perm
        want = np.empty(6, int)
        want[perm] = np.arange(6)
        np.testing.assert_array_equal(m, want)


class TestGlueStick:
    def test_joint_matcher_shapes_and_recovery(self, rng):
        n, k, dp, s, dl = 10, 6, 16, 5, 8
        kp0 = rng.uniform(-1, 1, size=(n, 2)).astype(np.float32)
        d0 = rng.normal(size=(n, dp)).astype(np.float32)
        ln0 = rng.uniform(-1, 1, size=(k, 2, 2)).astype(np.float32)
        ld0 = rng.normal(size=(k, s, dl)).astype(np.float32)

        model = GlueStickMatcher(depth=2, dim=32, num_heads=2,
                                 filter_threshold=0.0)
        params = model.init(
            jax.random.PRNGKey(0),
            jnp.asarray(kp0), jnp.asarray(d0),
            jnp.asarray(kp0), jnp.asarray(d0),
            jnp.asarray(ln0), jnp.asarray(ld0),
            jnp.asarray(ln0), jnp.asarray(ld0),
        )
        out = model.apply(
            params,
            jnp.asarray(kp0), jnp.asarray(d0),
            jnp.asarray(kp0), jnp.asarray(d0),
            jnp.asarray(ln0), jnp.asarray(ld0),
            jnp.asarray(ln0), jnp.asarray(ld0),
        )
        assert out["matches0"].shape == (n,)
        assert out["line_matches0"].shape == (k,)
        assert out["assignment"].shape == (n, n)
        assert out["line_assignment"].shape == (k, k)
        # soft assignments are proper sub-distributions
        p = np.asarray(out["assignment"])
        assert np.isfinite(p).all() and (p >= 0).all() and (p <= 1).all()

    def test_joint_training_reduces_loss(self, rng):
        """A few Adam steps on a fixed permutation must shrink the joint
        point+line NLL — the matcher is trainable end to end (the
        gluestick.py training capability)."""
        import optax

        def nll(p, gt):
            picked = jnp.take_along_axis(p, gt[:, None], axis=1)[:, 0]
            return -jnp.mean(jnp.log(picked + 1e-8))

        n, k, dp, s, dl = 12, 6, 8, 5, 8
        kp0 = (rng.random((n, 2)) * 2 - 1).astype(np.float32)
        d0 = rng.normal(size=(n, dp)).astype(np.float32)
        ln0 = (rng.random((k, 2, 2)) * 2 - 1).astype(np.float32)
        ld0 = rng.normal(size=(k, s, dl)).astype(np.float32)
        kp1 = np.roll(kp0, 3, axis=0)
        d1 = np.roll(d0, 3, axis=0)
        ln1 = np.roll(ln0, 2, axis=0)
        ld1 = np.roll(ld0, 2, axis=0)
        gt_pt = jnp.asarray(np.roll(np.arange(n), -3))
        gt_ln = jnp.asarray(np.roll(np.arange(k), -2))

        model = GlueStickMatcher(depth=2, dim=32, num_heads=2)
        args = tuple(
            jnp.asarray(a)
            for a in (kp0, d0, kp1, d1, ln0, ld0, ln1, ld1)
        )
        params = model.init(jax.random.PRNGKey(0), *args)

        def loss_fn(p):
            out = model.apply(p, *args)
            return nll(out["assignment"], gt_pt) + nll(
                out["line_assignment"], gt_ln
            )

        tx = optax.adam(3e-3)
        opt_state = tx.init(params)
        losses = []
        val_grad = jax.jit(jax.value_and_grad(loss_fn))
        for _ in range(20):
            loss, g = val_grad(params)
            updates, opt_state = tx.update(g, opt_state, params)
            params = optax.apply_updates(params, updates)
            losses.append(float(loss))
        assert np.isfinite(losses).all()
        assert losses[-1] < losses[0] * 0.7, losses[::5]

    def test_line_attention_variant(self, rng):
        """line_attention=True (gluestick.py:609-686): per-junction
        softmax-weighted scatter-SUM instead of scatter-mean. Same output
        contract; padded lines still excluded."""
        n, k = 8, 4
        kp = jnp.asarray(rng.uniform(-1, 1, size=(n, 2)), jnp.float32)
        d = jnp.asarray(rng.normal(size=(n, 16)), jnp.float32)
        ln = jnp.asarray(rng.uniform(-1, 1, size=(k, 2, 2)), jnp.float32)
        ld = jnp.asarray(rng.normal(size=(k, 5, 8)), jnp.float32)
        lv = jnp.asarray([True, True, True, False])
        model = GlueStickMatcher(depth=1, dim=32, num_heads=2,
                                 encoder_layers=(16,), line_attention=True)
        params = model.init(jax.random.PRNGKey(0), kp, d, kp, d,
                            ln, ld, ln, ld)
        out = model.apply(params, kp, d, kp, d, ln, ld, ln, ld,
                          lvalid0=lv, lvalid1=lv)
        assert np.isfinite(np.asarray(out["line_log_assignment"])).all()
        assert int(np.asarray(out["line_matches0"])[3]) == -1
        # the attention branch has its own projections
        flat = jax.tree_util.tree_flatten_with_path(params)[0]
        names = {"/".join(str(getattr(p, "key", p)) for p in path)
                 for path, _ in flat}
        assert any("proj_node" in s for s in names)
        assert any("proj_neigh" in s for s in names)

    def test_validity_masks_exclude_padding(self, rng):
        n, k = 8, 4
        kp = jnp.asarray(rng.uniform(-1, 1, size=(n, 2)), jnp.float32)
        d = jnp.asarray(rng.normal(size=(n, 16)), jnp.float32)
        ln = jnp.asarray(rng.uniform(-1, 1, size=(k, 2, 2)), jnp.float32)
        ld = jnp.asarray(rng.normal(size=(k, 5, 8)), jnp.float32)
        v = jnp.asarray([True] * 4 + [False] * 4)
        lv = jnp.asarray([True, True, False, False])
        model = GlueStickMatcher(depth=1, dim=32, num_heads=2)
        params = model.init(jax.random.PRNGKey(1), kp, d, kp, d,
                            ln, ld, ln, ld)
        out = model.apply(params, kp, d, kp, d, ln, ld, ln, ld,
                          valid0=v, valid1=v, lvalid0=lv, lvalid1=lv)
        assert (np.asarray(out["matches0"])[~np.asarray(v)] == -1).all()
        assert (np.asarray(out["line_matches0"])[2:] == -1).all()


@pytest.mark.slow
class TestGlueStickLearning:
    """VERDICT r2 item 5 'Done' criterion: the full joint matcher LEARNS on
    synthetic line pairs — loss decreases and line-assignment recall beats
    the NN-descriptor baseline. Descriptors are pure independent noise, so
    NN matching is chance (~1/K); the geometry (jittered endpoints) is the
    only learnable signal, reachable only through the keypoint/endpoint
    position encoders + GNN — exactly the capability the reference trains
    (gluestick.py loss:371-431)."""

    def _pair(self, seed, n=8, k=8, dp=8, s=5, dl=8, jitter=0.02):
        r = np.random.default_rng(seed)
        kp0 = r.uniform(-1, 1, (n, 2)).astype(np.float32)
        ln0 = r.uniform(-1, 1, (k, 2, 2)).astype(np.float32)
        pp = r.permutation(n)
        pl = r.permutation(k)
        kp1 = (kp0[pp] + r.normal(0, jitter, (n, 2))).astype(np.float32)
        ln1 = (ln0[pl] + r.normal(0, jitter, (k, 2, 2))).astype(np.float32)
        # descriptors: independent noise in both images (NN = chance)
        d0 = r.normal(size=(n, dp)).astype(np.float32)
        d1 = r.normal(size=(n, dp)).astype(np.float32)
        ld0 = r.normal(size=(k, s, dl)).astype(np.float32)
        ld1 = r.normal(size=(k, s, dl)).astype(np.float32)
        gt_p = np.empty(n, np.int64)
        gt_p[pp] = np.arange(n)  # matches0: index into image-1 arrays
        gt_l = np.empty(k, np.int64)
        gt_l[pl] = np.arange(k)
        return (
            tuple(jnp.asarray(a)
                  for a in (kp0, d0, kp1, d1, ln0, ld0, ln1, ld1)),
            jnp.asarray(gt_p), jnp.asarray(gt_l),
            jnp.asarray(np.argsort(gt_p)), jnp.asarray(np.argsort(gt_l)),
        )

    def test_learns_and_beats_nn_baseline(self):
        import optax

        from comet_tpu.matching.gluestick import gluestick_nll_loss

        model = GlueStickMatcher(depth=2, dim=32, num_heads=2,
                                 encoder_layers=(16, 32),
                                 filter_threshold=0.0)
        args0, gt_p0, gt_l0, _, _ = self._pair(0)
        params = model.init(jax.random.PRNGKey(0), *args0)

        def loss_fn(p, args, gt_p, gt_l, gt_p1, gt_l1):
            out = model.apply(p, *args)
            return (
                gluestick_nll_loss(out["log_assignment"], gt_p, gt_p1)
                + gluestick_nll_loss(out["line_log_assignment"], gt_l, gt_l1)
            )

        tx = optax.adam(3e-3)
        opt = tx.init(params)
        step = jax.jit(jax.value_and_grad(loss_fn))
        losses = []
        for it in range(300):
            args, gt_p, gt_l, gt_p1, gt_l1 = self._pair(it % 16)
            loss, g = step(params, args, gt_p, gt_l, gt_p1, gt_l1)
            upd, opt = tx.update(g, opt, params)
            params = optax.apply_updates(params, upd)
            losses.append(float(loss))
        assert np.isfinite(losses).all()
        assert losses[-1] < losses[0] * 0.5, losses[::10]

        # held-out pairs: trained line recall must beat the NN baseline
        hits_gs = hits_nn = total = 0
        for seed in (100, 101, 102):
            args, gt_p, gt_l, _, _ = self._pair(seed)
            out = model.apply(params, *args)
            hits_gs += int((np.asarray(out["line_matches0"])
                            == np.asarray(gt_l)).sum())
            nn_out = match_lines_nn(args[5], args[7])
            hits_nn += int((np.asarray(nn_out["matches0"])
                            == np.asarray(gt_l)).sum())
            total += gt_l.shape[0]
        recall_gs = hits_gs / total
        recall_nn = hits_nn / total
        # measured: ~0.92 held-out recall after 300 steps; NN on the
        # noise descriptors is chance (~1/8)
        assert recall_gs > recall_nn + 0.2, (recall_gs, recall_nn)
        assert recall_gs > 0.6, recall_gs


class TestWireframeExtractor:
    def test_registered_end_to_end(self):
        from comet_tpu.matching.registry import get_model

        img = np.zeros((96, 96), np.float32)
        draw_line(img, (10, 48), (86, 48), 1.0, 2)
        ext = get_model("extractor_wireframe", max_lines=16)
        out = ext(jnp.asarray(img))
        for key in ("keypoints", "descriptors", "lines", "line_scores",
                    "line_valid", "line_descriptors"):
            assert key in out, sorted(out)
        assert out["lines"].shape == (16, 2, 2)
        assert bool(np.asarray(out["line_valid"]).any())
