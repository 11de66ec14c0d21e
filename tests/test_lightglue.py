"""Full LightGlue: architecture parity vs the reference torch code,
checkpoint conversion, adaptive inference, and learning.

The strongest evidence is weight-for-weight parity: the reference's OWN
LightGlue (gluefactory/models/matchers/lightglue.py, imported read-only
with an omegaconf stub) is initialized in torch, its state_dict converted
through tools/convert_torch_weights.convert_lightglue, and both models run
on identical inputs — outputs must agree to f32 tolerance. This certifies
the architecture (packed Wqkv layout, rotary pairing, shared cross qk, ffn
structure, sigmoid_log_double_softmax) AND the public-checkpoint converter
map in one shot.
"""

import sys
import types

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from comet_tpu.matching.lightglue import (
    LightGlueMatcher,
    confidence_threshold,
    lightglue_loss,
    normalize_keypoints,
)

sys.path.insert(0, "/root/repo/tools") if "/root/repo/tools" not in sys.path else None


def _omegaconf_stub():
    """Minimal OmegaConf.merge with nested attribute access, enough for
    the reference lightglue.py + utils/losses.py to import."""
    oc = types.ModuleType("omegaconf")

    class _NS(dict):
        def __getattr__(self, k):
            try:
                return self[k]
            except KeyError as e:  # pragma: no cover
                raise AttributeError(k) from e

    def _wrap(d):
        if isinstance(d, dict):
            return _NS({k: _wrap(v) for k, v in d.items()})
        return d

    class OmegaConf:
        @staticmethod
        def merge(*confs):
            out = {}

            def deep(dst, src):
                for k, v in dict(src).items():
                    if isinstance(v, dict) and isinstance(dst.get(k), dict):
                        deep(dst[k], v)
                    else:
                        dst[k] = v

            for c in confs:
                deep(out, c)
            return _wrap(out)

        @staticmethod
        def create(d=None):
            return _wrap(dict(d or {}))

        @staticmethod
        def set_struct(cfg, flag):
            pass

    oc.OmegaConf = OmegaConf
    oc.DictConfig = _NS
    return oc


@pytest.fixture(scope="module")
def torch_lightglue():
    """Reference LightGlue (2 layers, dim 32) + its module, imported
    read-only from /root/reference with scoped stubs."""
    torch = pytest.importorskip("torch")
    from _stubs import ModuleOverlay

    overlay = ModuleOverlay()
    # Overlay not just when omegaconf is absent but also when an earlier
    # test left a LESSER stub resident (test_harness_parity's _torch_ref
    # stub has no OmegaConf.create, which the gluefactory BaseModel import
    # needs — running the full suite in one process skipped both parity
    # tests here until this check looked at adequacy, not presence).
    resident = sys.modules.get("omegaconf")
    if resident is None or not hasattr(
        getattr(resident, "OmegaConf", None), "create"
    ):
        overlay.set("omegaconf", _omegaconf_stub())
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    try:
        from gluefactory.models.matchers.lightglue import LightGlue
    except Exception as e:  # pragma: no cover
        overlay.restore()
        pytest.skip(f"reference LightGlue not importable: {e}")
    torch.manual_seed(0)
    model = LightGlue(
        {
            "n_layers": 2,
            "descriptor_dim": 32,
            "num_heads": 4,
            "input_dim": 16,
            "flash": False,
            "filter_threshold": 0.1,
        }
    )
    model.eval()
    yield model
    overlay.restore()


def _convert(torch_model, flax_model, example):
    from convert_torch_weights import convert_lightglue

    template = flax_model.init(jax.random.PRNGKey(0), *example)
    params, missing, unmapped = convert_lightglue(
        torch_model.state_dict(), template, depth=flax_model.depth
    )
    assert not missing and not unmapped
    return params


class TestTorchParity:
    def _data(self, rng, m=24, n=20, d_in=16, size=64.0):
        k0 = (rng.random((m, 2)) * size).astype(np.float32)
        k1 = (rng.random((n, 2)) * size).astype(np.float32)
        d0 = rng.normal(size=(m, d_in)).astype(np.float32)
        d1 = rng.normal(size=(n, d_in)).astype(np.float32)
        return k0, k1, d0, d1, size

    def test_forward_matches_reference(self, rng, torch_lightglue):
        import torch

        k0, k1, d0, d1, size = self._data(rng)
        data = {
            "keypoints0": torch.tensor(k0)[None],
            "keypoints1": torch.tensor(k1)[None],
            "descriptors0": torch.tensor(d0)[None],
            "descriptors1": torch.tensor(d1)[None],
            "view0": {"image_size": torch.tensor([[size, size]])},
            "view1": {"image_size": torch.tensor([[size, size]])},
        }
        with torch.no_grad():
            ref = torch_lightglue(data)

        flax_model = LightGlueMatcher(
            depth=2, dim=32, num_heads=4, filter_threshold=0.1
        )
        nk0 = normalize_keypoints(jnp.asarray(k0), (size, size))
        nk1 = normalize_keypoints(jnp.asarray(k1), (size, size))
        example = (nk0, jnp.asarray(d0), nk1, jnp.asarray(d1))
        params = _convert(torch_lightglue, flax_model, example)
        out = flax_model.apply(params, *example)

        np.testing.assert_allclose(
            np.asarray(out["log_assignment"]),
            ref["log_assignment"][0].numpy(),
            rtol=1e-4, atol=5e-4,
        )
        np.testing.assert_array_equal(
            np.asarray(out["matches0"]), ref["matches0"][0].numpy()
        )
        np.testing.assert_array_equal(
            np.asarray(out["matches1"]), ref["matches1"][0].numpy()
        )
        np.testing.assert_allclose(
            np.asarray(out["scores0"]),
            ref["matching_scores0"][0].numpy(), atol=2e-4,
        )

    def test_loss_matches_reference(self, rng, torch_lightglue):
        import torch

        k0, k1, d0, d1, size = self._data(rng, m=16, n=16)
        # GT: first 10 points match identity; rest unmatched
        gt0 = np.concatenate([np.arange(10), np.full(6, -1)]).astype(np.int64)
        gt1 = gt0.copy()
        gt_assign = np.zeros((16, 16), np.float32)
        gt_assign[np.arange(10), np.arange(10)] = 1.0

        data = {
            "keypoints0": torch.tensor(k0)[None],
            "keypoints1": torch.tensor(k1)[None],
            "descriptors0": torch.tensor(d0)[None],
            "descriptors1": torch.tensor(d1)[None],
            "view0": {"image_size": torch.tensor([[size, size]])},
            "view1": {"image_size": torch.tensor([[size, size]])},
            "gt_assignment": torch.tensor(gt_assign)[None],
            "gt_matches0": torch.tensor(gt0)[None],
            "gt_matches1": torch.tensor(gt1)[None],
        }
        torch_lightglue.train()
        try:
            pred = torch_lightglue(data)
            losses, _ = torch_lightglue.loss(pred, data)
        finally:
            torch_lightglue.eval()

        flax_model = LightGlueMatcher(
            depth=2, dim=32, num_heads=4, filter_threshold=0.1
        )
        nk0 = normalize_keypoints(jnp.asarray(k0), (size, size))
        nk1 = normalize_keypoints(jnp.asarray(k1), (size, size))
        example = (nk0, jnp.asarray(d0), nk1, jnp.asarray(d1))
        params = _convert(torch_lightglue, flax_model, example)
        out = flax_model.apply(params, *example, training=True)
        ours = lightglue_loss(
            out, jnp.asarray(gt0), jnp.asarray(gt1), gamma=1.0,
            nll_balancing=0.5,
        )
        np.testing.assert_allclose(
            float(ours["total"]), float(losses["total"]), rtol=1e-4
        )
        np.testing.assert_allclose(
            float(ours["last"]), float(losses["last"]), rtol=1e-4
        )


class TestAdaptive:
    def _model_and_params(self, rng, **kw):
        m = LightGlueMatcher(depth=3, dim=32, num_heads=4, **kw)
        k0 = jnp.asarray(rng.random((10, 2)).astype(np.float32) * 2 - 1)
        k1 = jnp.asarray(rng.random((10, 2)).astype(np.float32) * 2 - 1)
        d0 = jnp.asarray(rng.normal(size=(10, 16)).astype(np.float32))
        d1 = jnp.asarray(rng.normal(size=(10, 16)).astype(np.float32))
        params = m.init(jax.random.PRNGKey(0), k0, d0, k1, d1)
        return m, params, (k0, d0, k1, d1)

    def test_early_exit_engages_and_selects_stop_layer(self, rng):
        """Bias every TokenConfidence head to 'confident' -> the model must
        stop after layer 1 and answer with log_assignment_0 computed on the
        layer-0 descriptors (== the training forward's all_la[0])."""
        m, params, args = self._model_and_params(rng, depth_confidence=0.9)
        p = jax.tree_util.tree_map(lambda x: x, params)  # shallow copy
        for i in range(2):
            tc = p["params"][f"token_confidence_{i}"]["token"]
            tc["bias"] = jnp.full_like(tc["bias"], 10.0)
        out = m.apply(p, *args)
        assert int(out["stop_layer"]) == 1

        plain = LightGlueMatcher(depth=3, dim=32, num_heads=4)
        ref = plain.apply(p, *args, training=True)
        np.testing.assert_allclose(
            np.asarray(out["log_assignment"]),
            np.asarray(ref["all_log_assignment"][0]),
            atol=1e-6,
        )

    def test_no_exit_when_unconfident(self, rng):
        m, params, args = self._model_and_params(rng, depth_confidence=0.9)
        p = jax.tree_util.tree_map(lambda x: x, params)
        for i in range(2):
            tc = p["params"][f"token_confidence_{i}"]["token"]
            tc["bias"] = jnp.full_like(tc["bias"], -10.0)
        out = m.apply(p, *args)
        assert int(out["stop_layer"]) == 3  # never stopped
        plain = LightGlueMatcher(depth=3, dim=32, num_heads=4)
        ref = plain.apply(p, *args)
        np.testing.assert_allclose(
            np.asarray(out["log_assignment"]),
            np.asarray(ref["log_assignment"]), atol=1e-6,
        )

    def test_width_pruning_reports_and_masks(self, rng):
        """Bias matchability strongly negative and confidence high: points
        are pruned after layer 1 (keep = matchable | unconfident = False),
        the prune counters freeze, and pruned points cannot match."""
        m, params, args = self._model_and_params(rng, width_confidence=0.5)
        p = jax.tree_util.tree_map(lambda x: x, params)
        for i in range(3):
            la = p["params"][f"log_assignment_{i}"]["matchability"]
            la["bias"] = jnp.full_like(la["bias"], -20.0)
        for i in range(2):
            tc = p["params"][f"token_confidence_{i}"]["token"]
            tc["bias"] = jnp.full_like(tc["bias"], 10.0)
        out = m.apply(p, *args)
        # reference semantics (lightglue.py:475-495): prune counters start
        # at 1 and only SURVIVORS of each pruning layer increment — points
        # pruned at the first check keep count 1
        assert (np.asarray(out["prune0"]) == 1).all()
        assert (np.asarray(out["matches0"]) == -1).all()

    def test_confidence_threshold_formula(self):
        # lightglue.py:527-530
        assert confidence_threshold(0, 9) == pytest.approx(0.9)
        v = confidence_threshold(8, 9)
        assert 0.8 < v < 0.9


@pytest.mark.slow
class TestLearning:
    def test_trains_on_noisy_pairs_and_beats_nn(self, rng):
        """The full per-layer loss trains and GENERALIZES: every step sees
        freshly-sampled pairs (descriptors = shared signal + strong noise,
        so mutual-NN is weak), and held-out recall beats the NN baseline
        by a clear margin (VERDICT r3 item 3 'Done' criterion).

        Design note: a pure position-matching task (noise-only
        descriptors, like the GlueStick learning test) is unlearnable for
        LightGlue by architecture — its keypoint encoding is rotary
        (RELATIVE position inside self-attention only; cross-attention
        carries no positional term, lightglue.py:160-217), unlike
        GlueStick's absolute KeypointEncoder. Noisy-descriptor matching is
        the task the architecture is built for: context from the GNN
        disambiguates what per-descriptor NN cannot."""
        import optax

        from comet_tpu.matching.matchers import mutual_nearest_neighbor

        n, d, noise = 12, 8, 1.0

        def make_pair(seed):
            r = np.random.default_rng(seed)
            k0 = r.uniform(-1, 1, (n, 2)).astype(np.float32)
            perm = r.permutation(n)
            k1 = (k0[perm] + r.normal(0, 0.01, (n, 2))).astype(np.float32)
            s = r.normal(size=(n, d)).astype(np.float32)
            d0 = (s + noise * r.normal(size=(n, d))).astype(np.float32)
            d1 = (s[perm] + noise * r.normal(size=(n, d))).astype(
                np.float32
            )
            inv = np.empty(n, np.int64)
            inv[perm] = np.arange(n)  # gt0[i] = match of point i in image 1
            return k0, d0, k1, d1, inv, perm

        def make_batch(seeds):
            pairs = [make_pair(s) for s in seeds]
            keys = ("kpts0", "desc0", "kpts1", "desc1", "gt0", "gt1")
            return {
                k: jnp.asarray(np.stack(v))
                for k, v in zip(keys, zip(*pairs))
            }

        model = LightGlueMatcher(depth=2, dim=32, num_heads=2)
        b0 = make_batch(range(6))
        params = model.init(
            jax.random.PRNGKey(0), b0["kpts0"][0], b0["desc0"][0],
            b0["kpts1"][0], b0["desc1"][0],
        )

        def loss_fn(p, batch):
            def one(k0, d0, k1, d1, g0, g1):
                out = model.apply(p, k0, d0, k1, d1, training=True)
                return lightglue_loss(out, g0, g1)["total"]

            return jax.vmap(one)(
                batch["kpts0"], batch["desc0"], batch["kpts1"],
                batch["desc1"], batch["gt0"], batch["gt1"],
            ).mean()

        tx = optax.adam(5e-3)
        opt_state = tx.init(params)
        val_grad = jax.jit(jax.value_and_grad(loss_fn))
        losses = []
        for i in range(300):
            batch = make_batch(range(i * 6, i * 6 + 6))
            loss, g = val_grad(params, batch)
            updates, opt_state = tx.update(g, opt_state, params)
            params = optax.apply_updates(params, updates)
            losses.append(float(loss))
        assert np.isfinite(losses).all()
        assert losses[-1] < losses[0] * 0.5, losses[::60]

        # held-out recall, LightGlue vs mutual-NN, 30 fresh pairs
        lg_recs, nn_recs = [], []
        for s in range(100000, 100030):
            k0, d0, k1, d1, gt0, _ = make_pair(s)
            out = model.apply(
                params, jnp.asarray(k0), jnp.asarray(d0), jnp.asarray(k1),
                jnp.asarray(d1),
            )
            lg_recs.append(float(np.mean(np.asarray(out["matches0"]) == gt0)))
            nn_out = mutual_nearest_neighbor(
                jnp.asarray(d0 / np.linalg.norm(d0, axis=-1, keepdims=True)),
                jnp.asarray(d1 / np.linalg.norm(d1, axis=-1, keepdims=True)),
            )
            nn_recs.append(
                float(np.mean(np.asarray(nn_out["matches0"]) == gt0))
            )
        lg_recall = float(np.mean(lg_recs))
        nn_recall = float(np.mean(nn_recs))
        # measured on this fixture: NN ~0.35, trained LightGlue ~0.54
        assert lg_recall > nn_recall + 0.05, (lg_recall, nn_recall)
        assert lg_recall > 0.45, lg_recall
