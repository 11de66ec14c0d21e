"""matcher_metrics (matching/eval.py) vs the reference's own
gluefactory/models/utils/metrics.py, loaded read-only."""

import importlib.util

import numpy as np
import pytest

import jax.numpy as jnp

from comet_tpu.matching.eval import matcher_metrics


def _ref_metrics():
    spec = importlib.util.spec_from_file_location(
        "gf_metrics", "/root/reference/gluefactory/models/utils/metrics.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_simple_case():
    m = jnp.asarray([[0, 1, -1, 3]])
    gt = jnp.asarray([[0, 2, -1, -2]])
    sc = jnp.asarray([[0.9, 0.8, 0.1, 0.5]])
    out = matcher_metrics(m, gt, sc)
    # gt positives: {0, 1}; correct among them: {0} -> recall 0.5
    np.testing.assert_allclose(out["match_recall"], [0.5], atol=1e-6)
    # predicted>-1 with gt>=-1: {0, 1} (index 3 is ignore) -> precision 0.5
    np.testing.assert_allclose(out["match_precision"], [0.5], atol=1e-6)
    # gt>=-1: {0, 1, 2}; correct: {0, 2} -> accuracy 2/3
    np.testing.assert_allclose(out["accuracy"], [2 / 3], atol=1e-5)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_torch_parity_random(seed):
    torch = pytest.importorskip("torch")
    ref = _ref_metrics()
    rng = np.random.default_rng(seed)
    b, n = 3, 32
    gt = rng.integers(-2, n, (b, n))
    m = np.where(rng.random((b, n)) < 0.5, gt, rng.integers(-1, n, (b, n)))
    sc = rng.random((b, n))

    want = ref.matcher_metrics(
        {"matches0": torch.tensor(m), "matching_scores0": torch.tensor(sc)},
        {"gt_matches0": torch.tensor(gt)},
    )
    got = matcher_metrics(jnp.asarray(m), jnp.asarray(gt), jnp.asarray(sc))
    for k in ("match_recall", "match_precision", "accuracy", "average_precision"):
        np.testing.assert_allclose(
            np.asarray(got[k]), want[k].numpy(), atol=1e-5, err_msg=k
        )


class TestPRAggregation:
    """get_tp_fp_pts / average_precision / aggregate_pr_results
    (gluefactory/eval/utils.py:227-272 parity)."""

    def test_tp_fp_and_ignore(self):
        from comet_tpu.matching.eval import get_tp_fp_pts

        pred = np.array([0, 1, 2, 3, -1, 5])
        gt = np.array([0, 9, -2, 3, 4, -1])  # idx2 ignored
        sc = np.linspace(1, 0.5, 6)
        tp, fp, scores, num_pos = get_tp_fp_pts(pred, gt, sc)
        # kept predictions: idx 0 (tp), 1 (fp), 3 (tp), 5 (fp vs gt -1)
        assert tp.tolist() == [True, False, True, False]
        assert fp.tolist() == [False, True, False, True]
        assert num_pos == 4  # gt != -1 among kept (0, 9, 3, 4)
        assert len(scores) == 4

    def test_perfect_ranking_ap_100(self):
        from comet_tpu.matching.eval import aggregate_pr_results

        results = {
            "tp": [np.array([True] * 10)],
            "fp": [np.array([False] * 10)],
            "scores": [np.linspace(1, 0.1, 10)],
            "num_pos": 10,
        }
        out = aggregate_pr_results(results)
        assert out["AP"] > 99.0
        assert out["curve_recall"][-1] == 1.0
        np.testing.assert_allclose(out["curve_precision"], 1.0)

    def test_reference_numeric_parity(self):
        """Same random TP/FP stream through the reference's own numpy code
        (inlined formulas) and ours."""
        from comet_tpu.matching.eval import aggregate_pr_results

        rng = np.random.default_rng(0)
        tp = rng.uniform(size=40) > 0.4
        scores = rng.uniform(size=40)
        results = {
            "tp": [tp], "fp": [~tp], "scores": [scores],
            "num_pos": int(tp.sum()) + 3,
        }
        out = aggregate_pr_results(results)

        # reference computation (eval/utils.py:247-272) verbatim in numpy
        idx = np.argsort(scores)[::-1]
        n_gt = int(tp.sum()) + 3
        tpv = np.cumsum(tp[idx]) / n_gt
        fpv = np.cumsum((~tp)[idx]) / n_gt
        recall = np.concatenate(([0.0], tpv, [1.0]))
        precision = tpv / np.maximum(tpv + fpv, 1e-9)
        precision = np.concatenate(([0.0], precision, [0.0]))
        for i in range(precision.size - 1, 0, -1):
            precision[i - 1] = max(precision[i - 1], precision[i])
        i = np.where(recall[1:] != recall[:-1])[0]
        ap_ref = np.sum((recall[i + 1] - recall[i]) * precision[i + 1]) * 100
        np.testing.assert_allclose(out["AP"], ap_ref, rtol=1e-12)
        np.testing.assert_allclose(out["curve_recall"], tpv)
