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
