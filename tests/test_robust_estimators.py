"""Robust-estimator plugin layer (twoview/robust_estimators.py).

Covers the dispatch/config contract (gluefactory's load_estimator +
BaseEstimator surface, robust_estimators/base_estimator.py:1-40) and one
recovery check per backend — the solver numerics themselves are already
certified by tests/test_twoview.py; here the subject is the plugin layer.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from comet_tpu.twoview.robust_estimators import (
    get_estimator,
    list_estimators,
    load_estimator,
)

pytestmark = pytest.mark.fast


@pytest.fixture
def rng():
    return np.random.default_rng(3)


def _homography_scene(rng, n=60, n_out=10):
    h_gt = np.asarray(
        [[1.1, 0.08, 6.0], [-0.05, 0.95, -3.0], [1e-4, -2e-4, 1.0]],
        np.float64,
    )
    p0 = rng.uniform(10, 200, size=(n, 2))
    hom = np.concatenate([p0, np.ones((n, 1))], axis=1) @ h_gt.T
    p1 = hom[:, :2] / hom[:, 2:]
    p1[:n_out] += rng.uniform(30, 60, size=(n_out, 2))  # outliers
    return (
        jnp.asarray(p0, jnp.float32), jnp.asarray(p1, jnp.float32),
        h_gt, n_out,
    )


def _pose_scene(rng, n=80, f=300.0):
    """3-D points seen by two cameras with known relative pose."""
    theta = 0.15
    r = np.asarray(
        [[np.cos(theta), 0, np.sin(theta)], [0, 1, 0],
         [-np.sin(theta), 0, np.cos(theta)]]
    )
    t = np.asarray([0.4, 0.05, 0.1])
    t = t / np.linalg.norm(t)
    pts = rng.uniform(-1, 1, size=(n, 3))
    pts[:, 2] += 4.0
    k = np.asarray([[f, 0, 128], [0, f, 128], [0, 0, 1.0]])

    def project(p):
        uv = p @ k.T
        return uv[:, :2] / uv[:, 2:]

    p0 = project(pts)
    p1 = project(pts @ r.T + t)
    return (
        jnp.asarray(p0, jnp.float32), jnp.asarray(p1, jnp.float32),
        jnp.asarray(k, jnp.float32), r, t,
    )


class TestDispatch:
    def test_registry_contents(self):
        names = list_estimators()
        assert ("homography", "ransac") in names
        assert ("homography", "dlt") in names
        assert ("relative_pose", "ransac") in names
        assert ("relative_pose", "nister") in names
        assert ("fundamental", "ransac") in names

    def test_unknown_name_lists_alternatives(self):
        with pytest.raises(KeyError, match="ransac"):
            load_estimator("homography", "nope")

    def test_unknown_conf_key_rejected(self):
        with pytest.raises(KeyError, match="wrong_key"):
            get_estimator("homography", "ransac", {"wrong_key": 1})

    def test_missing_data_key_rejected(self):
        est = get_estimator("homography", "ransac")
        with pytest.raises(KeyError, match="m_kpts1"):
            est({"m_kpts0": jnp.zeros((8, 2))})

    def test_conf_merge(self):
        est = get_estimator("homography", "ransac", {"ransac_th": 7.5})
        assert est.conf["ransac_th"] == 7.5
        assert est.conf["num_hypotheses"] == 128  # base default survives


class TestHomographyBackends:
    @pytest.mark.parametrize("name", ["ransac", "dlt"])
    def test_recovers_h(self, rng, name):
        p0, p1, h_gt, n_out = _homography_scene(
            rng, n_out=10 if name == "ransac" else 0
        )
        est = get_estimator("homography", name, {"ransac_th": 2.0})
        out = est({"m_kpts0": p0, "m_kpts1": p1})
        assert out["success"]
        h = np.asarray(out["M_0to1"], np.float64)
        h /= h[2, 2]
        np.testing.assert_allclose(h, h_gt, atol=5e-2)
        inl = np.asarray(out["inliers"])
        assert inl[n_out:].mean() > 0.95
        if n_out:
            assert inl[:n_out].mean() < 0.2


class TestRelativePoseBackends:
    @pytest.mark.parametrize("name", ["ransac", "nister"])
    def test_recovers_pose(self, rng, name):
        p0, p1, k, r_gt, t_gt = _pose_scene(rng)
        est = get_estimator("relative_pose", name, {"ransac_th": 1.0})
        out = est({"m_kpts0": p0, "m_kpts1": p1, "K0": k, "K1": k})
        assert out["success"]
        r, t = out["M_0to1"]
        r = np.asarray(r, np.float64)
        t = np.asarray(t, np.float64).ravel()
        rot_err = np.degrees(
            np.arccos(np.clip((np.trace(r @ r_gt.T) - 1) / 2, -1, 1))
        )
        assert rot_err < 1.0, rot_err
        cos_t = abs(t @ t_gt) / max(np.linalg.norm(t), 1e-9)
        assert cos_t > 0.99
        assert np.asarray(out["inliers"]).mean() > 0.8


class TestFundamentalBackend:
    def test_epipolar_constraint(self, rng):
        p0, p1, k, _, _ = _pose_scene(rng)
        est = get_estimator("fundamental", "ransac", {"ransac_th": 1.0})
        out = est({"m_kpts0": p0, "m_kpts1": p1})
        assert out["success"]
        f = np.asarray(out["M_0to1"], np.float64)
        x0 = np.concatenate([np.asarray(p0), np.ones((p0.shape[0], 1))], 1)
        x1 = np.concatenate([np.asarray(p1), np.ones((p1.shape[0], 1))], 1)
        resid = np.abs(np.einsum("ni,ij,nj->n", x1, f, x0))
        denom = np.linalg.norm(f) * np.linalg.norm(x0, axis=1)
        assert np.median(resid / denom) < 1e-3
